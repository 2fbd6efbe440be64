"""Tiered continuous aggregates: 1m → 1h → 1d.

north_rule: "window-function-based continuous aggregates (sum/mean/
min/max/count of n_tok per 1m/1h/1d tiers) materialized into tiered
tables with TTL-driven retention drops."

Partial/final split (the scale-critical design): only the 1m tier
aggregates raw sequences; every coarser tier re-aggregates the finer
tier's *partials* —

    sum_1h  = sum(sum_1m)      count_1h = sum(count_1m)
    min_1h  = min(min_1m)      max_1h   = max(max_1m)
    mean    = sum / count      (derived at read, never materialized)

so the 1h/1d jobs scan minutes/hours, not the 100 TB raw table —
the classic partial-aggregation reuse Catalyst performs inside one
query, applied across materializations. Each tier groupBy shuffles on
(source, tier_ts); AQE coalesces the post-shuffle partitions.

Bit-for-bit parity with tstoolbox aggregate (functions/aggregate.py:
237-239 → pandas resample): sum/count/min/max of int64 are exact, and
mean = sum/count in float64 is exactly pandas' mean for int inputs.

Tier rows are labeled by bucket START (date_trunc), matching pandas
resample's left-closed/left-labeled default for T/H/D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIERS = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_ORDER = ["1m", "1h", "1d"]

PARTIAL_COLS = ["n_tok_sum", "n_tok_count", "n_tok_min", "n_tok_max"]


def rollup_base(df: DataFrame, tier: str = "1m", key_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Raw sequences → finest tier partials."""
    unit = TIERS[tier]
    return df.groupBy(
        *key_cols, F.date_trunc(unit, F.col("ts")).alias("ts")
    ).agg(
        F.sum("n_tok").alias("n_tok_sum"),
        F.count("n_tok").alias("n_tok_count"),
        F.min("n_tok").alias("n_tok_min"),
        F.max("n_tok").alias("n_tok_max"),
    )


def rollup_cascade(finer: DataFrame, tier: str, key_cols: tuple[str, ...] = ("source",)) -> DataFrame:
    """Finer-tier partials → coarser tier partials (partial merge)."""
    unit = TIERS[tier]
    return finer.groupBy(
        *key_cols, F.date_trunc(unit, F.col("ts")).alias("ts")
    ).agg(
        F.sum("n_tok_sum").alias("n_tok_sum"),
        F.sum("n_tok_count").alias("n_tok_count"),
        F.min("n_tok_min").alias("n_tok_min"),
        F.max("n_tok_max").alias("n_tok_max"),
    )


def with_mean(tier_df: DataFrame) -> DataFrame:
    """Read-side derived mean (never materialized — keeps partials
    losslessly composable)."""
    return tier_df.withColumn(
        "n_tok_mean", F.col("n_tok_sum") / F.col("n_tok_count")
    )


def day_partition(tier_df: DataFrame) -> DataFrame:
    """Add the day partition column tiers are stored under (TTL drops
    whole day partitions — metadata-only)."""
    return tier_df.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
