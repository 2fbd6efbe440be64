"""Event-stream product analytics: ordered funnels and retention
cohorts (engine extensions — the reference is a single-series CLI;
these are the standard event-table analyses a warehouse user expects
next to sessionize/asof, ref tests' events fixture shape).

Scale shapes:
- ``funnel_conversion``: one cumulative-window pass per user. Step k
  reads step k-1's running min, so Catalyst stacks one Window node
  per step — but every node shares the same (user, ts) spec, so the
  events shuffle and sort exactly ONCE (plan-shape-tested), then a
  two-level aggregate. No self-joins, no per-step jobs.
- ``retention_cohorts``: groupBy user for cohort assignment, an
  equi-join back on user_id (both sides hash-partitioned on the same
  key — AQE co-locates), then one groupBy (cohort, offset). Shuffle
  volume is O(distinct (user, period)) after the distinct, not
  O(events).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstoolbox_spark.operators.aggregate import bucket_expr, parse_freq


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: a user reaches step k when events
    matching ``steps[0..k]`` occur at STRICTLY increasing timestamps
    (the same event can never satisfy two steps; simultaneous events
    don't chain).

    Per user the earliest completion time of step k is the running
    ``min(ts of a step-k event that happens after the step-(k-1)
    completion so far)`` — a chain of cumulative RANGE windows, all
    over the same (user, ts) ordering, so the plan is one shuffle +
    one sort (then k stacked Window nodes over the sorted stream).
    Returns one row per step: (step, step_name, users, conversion)
    with conversion = users / step-1 users.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    # materialize the window order key ONCE: every per-step Window node
    # then orders by the same attribute, so Spark proves the child
    # ordering is already satisfied and plans exactly one sort
    # (an inline unix_micros(ts) would get a fresh expr id per step and
    # force k redundant local sorts)
    ts = F.col(ts_col)
    df = df.withColumn("__ord", F.unix_micros(ts.cast("timestamp")))
    w = (
        Window.partitionBy(user_col)
        .orderBy("__ord")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn(
        "__m0", F.min(F.when(F.col(type_col) == steps[0], ts)).over(w)
    )
    for k in range(1, len(steps)):
        prev = F.col(f"__m{k - 1}")
        out = out.withColumn(
            f"__m{k}",
            F.min(
                F.when((F.col(type_col) == steps[k]) & (prev < ts), ts)
            ).over(w),
        )
    per_user = out.groupBy(user_col).agg(
        *[
            F.max(F.col(f"__m{k}").isNotNull().cast("int")).alias(f"__r{k}")
            for k in range(len(steps))
        ]
    )
    totals = per_user.agg(
        *[F.sum(f"__r{k}").cast("long").alias(f"__u{k}") for k in range(len(steps))]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k + 1).alias("step"),
                    F.lit(steps[k]).alias("step_name"),
                    F.col(f"__u{k}").alias("users"),
                    (
                        F.lit(1.0)
                        if k == 0
                        # floor(x*1e6+0.5)/1e6: engine-identical 6-dp
                        # rounding (Spark round is HALF_UP, DuckDB's
                        # differs at .5 boundaries)
                        else F.floor(
                            F.col(f"__u{k}")
                            / F.nullif(F.col(f"__u{k - 1}"), F.lit(0))
                            * F.lit(1e6)
                            + F.lit(0.5)
                        )
                        / F.lit(1e6)
                    ).alias("conversion"),
                )
                for k in range(len(steps))
            ]
        )
    ).alias("r")
    return totals.select(rows).select("r.step", "r.step_name", "r.users", "r.conversion")


def retention_cohorts(
    df: DataFrame,
    freq: str = "W",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: cohort = the user's first-activity period
    (epoch-anchored ``freq`` bucket), offset = whole periods since the
    cohort period; counts DISTINCT active users per (cohort, offset).

    Returns (cohort, offset, users) — offset 0 row is the cohort size.
    """
    _, secs = parse_freq(freq)
    b = bucket_expr(ts_col, freq)
    act = df.select(F.col(user_col).alias("u"), b.alias("p")).distinct()
    first = act.groupBy("u").agg(F.min("p").alias("cohort"))
    joined = act.join(first, "u")
    offset = (
        (F.unix_timestamp("p") - F.unix_timestamp("cohort")) / F.lit(secs)
    ).cast("int")
    return (
        joined.groupBy("cohort", offset.alias("offset"))
        .agg(F.count_distinct("u").alias("users"))
    )


def funnel_latency(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user time-to-convert through the ordered funnel: for every
    user who completes all ``steps`` (same strict-ordering semantics
    as :func:`funnel_conversion`), the exact BIGINT-microsecond
    latency from their earliest step-0 event to their earliest full
    completion. One row per completing user — feed to
    ``stats.exact_quantiles`` for the p50/p90 conversion-time read.

    Same plan shape as funnel_conversion: one shuffle + one sort, k
    stacked windows over the sorted stream, then a per-user aggregate.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    ts = F.col(ts_col)
    df = df.withColumn("__ord", F.unix_micros(ts.cast("timestamp")))
    w = (
        Window.partitionBy(user_col)
        .orderBy("__ord")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn(
        "__m0", F.min(F.when(F.col(type_col) == steps[0], ts)).over(w)
    )
    for k in range(1, len(steps)):
        prev = F.col(f"__m{k - 1}")
        out = out.withColumn(
            f"__m{k}",
            F.min(
                F.when((F.col(type_col) == steps[k]) & (prev < ts), ts)
            ).over(w),
        )
    last = f"__m{len(steps) - 1}"
    # the running mins are non-increasing per user, so the per-user
    # min over non-null values IS the final (earliest) chain time
    per_user = out.groupBy(user_col).agg(
        F.min("__m0").alias("__start"),
        F.min(last).alias("__done"),
    )
    return per_user.filter(F.col("__done").isNotNull()).select(
        user_col,
        (
            F.unix_micros(F.col("__done").cast("timestamp"))
            - F.unix_micros(F.col("__start").cast("timestamp"))
        ).alias("latency_us"),
    )


def interval_coverage(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    tier: str = "1d",
    key_cols: Sequence[str] = (),
    validate: bool = False,
) -> DataFrame:
    """Union length of (possibly overlapping) intervals per (key, tier
    bucket) — "seconds with at least one active session/incident", the
    classic sweep-line coverage read, as pure window expressions.

    Each interval contributes a +1 edge at start and a −1 edge at end;
    edges sort within (key, bucket) with starts before ends at the
    same instant (touching intervals merge); coverage is the sum of
    gaps to the next edge while the running active count is positive.
    Exact BIGINT microseconds. An interval is attributed WHOLLY to the
    bucket containing its start (the state_durations convention —
    telemetry sessions are short against tier widths; the rule is
    part of the contract).

    One explode (rows × 2), one window sort per (key, bucket), one
    aggregate — bucket partitions bound the sort.

    Reversed intervals (end < start) are invalid input: their −1 edge
    would sort before their +1 edge, driving the running active count
    negative and undercounting every overlapping interval's union
    length. They are excluded by a zero-cost predicate; pass
    ``validate=True`` to pay one count job and raise instead.
    """
    from ..pipeline.rollup import TIERS

    unit = TIERS[tier]
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    if validate:
        bad = df.filter(e_us < s_us).count()
        if bad:
            raise ValueError(
                f"interval_coverage: {bad} reversed intervals "
                f"({end_col} < {start_col}) — fix or drop them upstream"
            )
    df = df.filter(e_us >= s_us)
    edges = df.select(
        *key_cols,
        F.date_trunc(unit, F.col(start_col)).alias("ts"),
        F.explode(
            F.array(
                F.struct(s_us.alias("t"), F.lit(1).alias("d")),
                F.struct(e_us.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select(*key_cols, "ts", F.col("e.t").alias("t"), F.col("e.d").alias("d"))
    w = Window.partitionBy(*key_cols, "ts").orderBy(
        F.col("t"), F.col("d").desc()
    )
    active = F.sum("d").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.lead("t").over(w)
    covered = F.when(
        (active > 0) & nxt.isNotNull(), nxt - F.col("t")
    ).otherwise(F.lit(0))
    return (
        edges.select(*key_cols, "ts", covered.alias("__c"))
        .groupBy(*key_cols, "ts")
        .agg(F.sum("__c").cast("long").alias("covered_us"))
    )
