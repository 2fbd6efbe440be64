"""Counter semantics and gap detection for irregular telemetry.

Engine extensions modeled on public TimescaleDB toolkit verbs
(``counter_agg`` / ``rate`` / ``delta``, ``heartbeat_agg``) — the
reference (tstoolbox) has no counter-reset or gap verbs, but any
100 TB telemetry pipeline needs them. All pure window expressions:
one sort per key, no UDFs, no joins.

Counter-reset rule (the standard Prometheus/Timescale convention): a
monotone counter that DECREASES was reset; the observed value after
the reset is the increase since the reset, so

    delta_i = v_i - v_{i-1}   if v_i >= v_{i-1}
            = v_i             otherwise (reset)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_delta(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-row reset-aware counter increments (column ``delta``; the
    first row of each key has NULL — no prior observation)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    prev = F.lag(F.col(value_col)).over(w)
    diff = F.col(value_col) - prev
    delta = F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(diff < 0, F.col(value_col).cast("double")).otherwise(
            diff.cast("double")
        )
    )
    return df.withColumn("delta", delta)


def counter_agg(
    df: DataFrame,
    value_col: str,
    tier: str = "1h",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Tier rollup of counter increases (TimescaleDB ``counter_agg``
    + ``delta``): total reset-corrected increase, observation count,
    and first/last raw readings per (key, bucket). The lag window
    runs over the FULL series (so a bucket's first delta still sees
    the previous bucket's last value), then one groupBy."""
    from ..pipeline.rollup import TIERS

    unit = TIERS[tier]
    d = counter_delta(df, value_col, ts_col, key_cols, order_cols)
    return d.groupBy(
        *key_cols, F.date_trunc(unit, F.col(ts_col)).alias("ts")
    ).agg(
        F.sum("delta").alias("increase"),
        F.count(value_col).alias("n_obs"),
        F.min_by(value_col, F.col(ts_col)).alias("first_reading"),
        F.max_by(value_col, F.col(ts_col)).alias("last_reading"),
    )


def counter_rate(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Instantaneous per-second rate between consecutive observations
    (reset-aware delta / elapsed seconds; TimescaleDB ``irate``-like)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    d = counter_delta(df, value_col, ts_col, key_cols)
    gap = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(F.lag(F.col(ts_col)).over(w).cast("timestamp"))
    ).cast("double") / 1e6
    return d.withColumn(
        "rate", F.when(gap > 0, F.col("delta") / gap)
    )


def detect_gaps(
    df: DataFrame,
    threshold_seconds: float,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Heartbeat gaps: consecutive observations farther apart than the
    threshold (TimescaleDB ``heartbeat_agg`` dead-interval read).
    Returns (keys, gap_start, gap_end, gap_seconds) — one window lag,
    one narrow filter; at any scale the output is only the gaps."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_s = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        - F.unix_micros(prev.cast("timestamp"))
    ).cast("double") / 1e6
    return (
        df.select(
            *key_cols,
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            gap_s.alias("gap_seconds"),
        )
        .where(F.col("gap_seconds") > threshold_seconds)
    )


__all__ = ["counter_delta", "counter_agg", "counter_rate", "detect_gaps"]


def staleness_report(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("source",),
    threshold: str | None = None,
) -> DataFrame:
    """Per-key data freshness: last observation, exact lag in
    microseconds behind the corpus frontier (the max timestamp across
    ALL keys), and — when ``threshold`` is an interval string like
    ``'1 hour'`` — a ``stale`` flag. The standard "which sources
    stopped reporting" read over a telemetry lake.

    One map-combinable groupBy for the per-key frontier, one 1-row
    aggregate broadcast back — no window, no driver collection.
    """
    per_key = df.groupBy(*key_cols).agg(
        F.max(F.col(ts_col)).alias("last_ts"),
        F.count(ts_col).alias("n_obs"),
    )
    frontier = per_key.agg(F.max("last_ts").alias("__frontier"))
    out = per_key.join(F.broadcast(frontier))
    lag = F.unix_micros(F.col("__frontier").cast("timestamp")) - F.unix_micros(
        F.col("last_ts").cast("timestamp")
    )
    cols = [*key_cols, "last_ts", lag.alias("lag_us"), "n_obs"]
    if threshold is not None:
        bound = F.expr(f"INTERVAL {threshold}")
        cols.append(
            (
                F.col("last_ts") < F.col("__frontier") - bound
            ).alias("stale")
        )
    return out.select(*cols)
