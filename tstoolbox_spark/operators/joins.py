"""Time-series joins Spark lacks natively: as-of join and
gap-based sessionization.

Neither exists in the reference (its only joins are timestamp-aligned
outer joins, read.py:160-171) — these are the operators a time-series
engine over event data needs at scale (SURVEY.md §2.9 context).

as-of join — the shuffle-friendly formulation: instead of a
per-left-row subquery ("latest right row ≤ ts"), union both sides
tagged, sort once per key, and forward-fill the right-side payload
over the combined timeline. One shuffle on (key, ts), no range
predicate explosion, no broadcast requirement on either side —
exactly the plan that survives both sides being large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_ts: str = "ts",
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' =
    earliest right row ≥ ts) within the same ``by`` key.

    tolerance: optional max staleness ('15 minutes' style interval);
    matches older than it become null.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on_ts and c not in keys]
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"right_cols {clash} collide with left columns; "
            "rename them on the right side before joining"
        )
    # The matched right row travels as ONE struct (its ts + payload),
    # so a null payload column stays the matched row's null instead of
    # being forward-filled from an older right row (pandas merge_asof
    # carries the matched row verbatim), and the tolerance check reads
    # the very row the payload came from.
    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(
        *keys,
        F.col(on_ts),
        F.struct(
            F.col(on_ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    ).withColumn("__side", F.lit(0))
    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal ts, so an exact-ts
    # match is visible to the left row (pandas merge_asof semantics)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on_ts).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on_ts).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        matched = F.first("__r", ignorenulls=True).over(w)
    out = merged.withColumn("__m", matched).filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("__m.__rts") >= F.col(on_ts) - F.expr(f"INTERVAL {tolerance}")
        else:
            fresh = F.col("__m.__rts") <= F.col(on_ts) + F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn("__m", F.when(fresh, F.col("__m")))
    keep = [c for c in left.columns]
    renames = [F.col(f"__m.{c}").alias(c) for c in right_cols]
    return out.select(*keep, *renames)


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap
    to the previous event exceeds ``gap``. session_id = running count
    of session starts per key (1-based) — one sort per key, two window
    expressions, no state store needed for batch data.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    return df.withColumn(session_col, F.sum(is_new).over(wrun))


def session_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """One row per session: bounds, event count, duration seconds,
    optional value sum (left in whatever numeric type ``value_col``
    carries)."""
    keys = list(key_cols)
    s = sessionize(df, gap, ts_col, key_cols)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"{value_col}_sum"))
    return s.groupBy(*keys, "session_id").agg(*aggs)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Sequence[str] = (),
    bucket: str = "1 hour",
) -> DataFrame:
    """Point-in-interval join: each event row joined to every interval
    row with ``start <= ts < end`` (and equal ``by`` keys).

    The naive formulation — a join whose ONLY predicate is the range —
    gives Spark nothing to hash on: the plan degenerates to
    BroadcastNestedLoopJoin (or a cartesian product when neither side
    broadcasts), O(|events| x |intervals|) at any scale. This
    bucketizes time instead: events land in one fixed-width bucket,
    intervals explode to every bucket they cover (sequence() — cheap
    for intervals spanning few buckets; pick ``bucket`` near the
    median interval length), and the join becomes a plain equi hash
    join on (by..., bucket) with the exact range predicate applied as
    a post-filter. Same shape Spark itself uses for stream-stream
    range joins with watermarked state buckets.
    """
    import re as _re

    m = _re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?",
                      bucket.strip().lower())
    if not m:
        raise ValueError(f"unsupported bucket {bucket!r} "
                         "(use '<n> second|minute|hour|day')")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    w_us = int(m.group(1)) * mult[m.group(2)] * 1_000_000
    keys = list(by)

    ev = events.withColumn(
        "__b", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(w_us))
    )
    iv = intervals.withColumn(
        "__bs", F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / F.lit(w_us))
    ).withColumn(
        # end is exclusive: the last covered bucket is the one holding
        # end - 1 microsecond
        "__be", F.floor((F.unix_micros(F.col(end_col).cast("timestamp")) - F.lit(1)) / F.lit(w_us))
    ).filter(F.col(end_col) > F.col(start_col))
    iv = iv.withColumn(
        "__b", F.explode(F.sequence(F.col("__bs"), F.col("__be")))
    ).drop("__bs", "__be")

    joined = ev.join(iv, on=keys + ["__b"], how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__b")
