"""State-duration rollups and run-length timelines for categorical series.

Engine extensions modeled on the public TimescaleDB toolkit verbs
``state_agg`` / ``duration_in`` and the classic gaps-and-islands
run-length shape — the reference (tstoolbox) has no categorical-state
verbs, but a 100 TB telemetry pipeline tracks device/job/session
states constantly. Everything is window + groupBy expressions: one
sort per key, no UDFs, no joins, no driver collection.

Semantics (documented, oracle-mirrored):

- An observation ``(ts_i, state_i)`` holds until the key's next
  observation ``ts_{i+1}``; the final observation of a key has an
  open interval and contributes **zero** duration (unknown horizon —
  the same convention Prometheus uses for the last sample).
- Durations are exact BIGINT microseconds (``epoch_us`` differences),
  so partial sums are associative and engine-exact at any
  partitioning.
- ``state_durations`` attributes each interval to the tier bucket
  containing its START (interval-start attribution; the bucket-split
  variant would explode intervals across buckets — not needed for
  telemetry cadences far below the tier width, and the attribution
  rule is part of the contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_durations(
    df: DataFrame,
    state_col: str,
    tier: str | None = "1d",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Total time spent in each state per (key, tier bucket)
    — TimescaleDB ``state_agg``/``duration_in`` analog.

    Output: key cols, ``ts`` (bucket start; omitted when tier is
    None), ``state``, ``state_us`` (BIGINT microseconds), ``n_obs``
    (observations, including the zero-duration final one when it
    lands in the bucket).

    Scale shape: one window sort per key for the lead, then one
    hash-aggregate — the same cost as any tier rollup; partial
    aggregation (map-side combine) applies because the sum is a plain
    BIGINT sum.
    """
    from ..pipeline.rollup import TIERS

    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    nxt = F.lead(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    dur = F.coalesce(nxt - F.unix_micros(F.col(ts_col).cast("timestamp")), F.lit(0)).cast("long")
    held = df.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.col(state_col).alias("state"),
        dur.alias("__dur"),
    )
    if tier is None:
        grp = [*key_cols, "state"]
        out = held.groupBy(*grp)
    else:
        unit = TIERS[tier]
        out = held.groupBy(
            *key_cols,
            F.date_trunc(unit, F.col("__ts")).alias("ts"),
            F.col("state"),
        )
    return out.agg(
        F.sum("__dur").alias("state_us"),
        F.count("*").alias("n_obs"),
    )


def state_runs(
    df: DataFrame,
    state_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Run-length encode consecutive identical states per key
    (gaps-and-islands): one row per maximal run with ``run_start``,
    ``run_end`` (start of the next run; equals the run's last
    observation for the key's final run — open interval), ``state``,
    ``n_obs`` and ``run_us`` (BIGINT microseconds, run_end −
    run_start).

    Run ids come from the running sum of change flags — a single
    window sort per key; the groupBy that follows re-uses the same
    hash partitioning on key cols.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    # null-safe change detection: a NULL state is its own run (the
    # same convention state_durations uses — NULL groups as a state),
    # and the key's first row always opens a run. A plain != would
    # return NULL against a NULL state, silently merging the NULL
    # observation into the previous run and force-splitting the next.
    first_row = F.lag(F.lit(1)).over(w).isNull()
    changed = (
        first_row
        | ~F.lag(F.col(state_col)).over(w).eqNullSafe(F.col(state_col))
    ).cast("int")
    run = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.lead(F.col(ts_col)).over(w)
    marked = df.select(
        *key_cols,
        F.col(ts_col).alias("__ts"),
        F.col(state_col).alias("state"),
        run.alias("__run"),
        F.coalesce(nxt, F.col(ts_col)).alias("__nxt"),
    )
    return (
        marked.groupBy(*key_cols, "__run")
        .agg(
            F.min("state").alias("state"),
            F.min("__ts").alias("run_start"),
            F.max("__nxt").alias("run_end"),
            F.count("*").alias("n_obs"),
        )
        .select(
            *key_cols,
            F.col("__run").alias("run_id"),
            "state",
            "run_start",
            "run_end",
            (
                F.unix_micros(F.col("run_end").cast("timestamp")) - F.unix_micros(F.col("run_start").cast("timestamp"))
            ).alias("run_us"),
            "n_obs",
        )
    )
