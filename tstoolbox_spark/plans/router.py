"""Tier routing: answer downsample queries from the coarsest
sufficient materialization.

SURVEY.md §4.2.6: the one Catalyst-rule candidate (rewrite
``groupBy(date_trunc('hour'))`` over raw data to a scan of the 1h
table) is better done at the API layer — this module is that layer.
A query for frequency F is served from the coarsest tier whose
granularity divides F, merging partials (sum/count/min/max compose;
mean derived last), so e.g. a 6-hour rollup scans hours instead of
raw sequences: a 3-4 order-of-magnitude scan reduction at the
10^12-sequence design point.

The partial/final split is what makes this lossless: tier tables
store composable partials, never finalized means
(pipeline/rollup.py), so re-aggregation is exact at any coarser grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.core import parse_freq
from ..tables import ParquetSnapshotCatalog

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
#: coarsest first — prefer the smallest scan
_PREFERENCE = ["1d", "1h", "1m"]


def _pick_tier(catalog: ParquetSnapshotCatalog, want_seconds: int) -> str | None:
    for tier in _PREFERENCE:
        sec = TIER_SECONDS[tier]
        if (
            sec <= want_seconds
            and want_seconds % sec == 0
            and catalog.exists(f"tier_{tier}")
        ):
            return tier
    return None


def route_tier_query(
    spark: SparkSession,
    catalog: ParquetSnapshotCatalog,
    freq: str,
    key_cols: tuple[str, ...] = ("source",),
    with_mean: bool = True,
) -> tuple[DataFrame, str]:
    """Downsample to ``freq`` from the coarsest sufficient tier.

    Returns (result, tier_used). Calendar frequencies (M/Y) route to
    the 1d tier via date_trunc; fixed frequencies require a tier whose
    seconds divide the target. Raises LookupError when no materialized
    tier can serve the query (caller falls back to raw rollup).
    """
    unit, secs = parse_freq(freq)
    if unit in ("month", "year"):
        if not catalog.exists("tier_1d"):
            raise LookupError("calendar rollup needs the 1d tier")
        tier = "1d"
        bucket = F.date_trunc(unit, F.col("ts")).alias("ts")
    else:
        tier = _pick_tier(catalog, secs)
        if tier is None:
            raise LookupError(f"no materialized tier divides {freq!r}")
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp("ts") / secs) * secs
        ).alias("ts")
    tdf = catalog.read(spark, f"tier_{tier}")
    out = tdf.groupBy(*key_cols, bucket).agg(
        F.sum("n_tok_sum").alias("n_tok_sum"),
        F.sum("n_tok_count").alias("n_tok_count"),
        F.min("n_tok_min").alias("n_tok_min"),
        F.max("n_tok_max").alias("n_tok_max"),
    )
    if with_mean:
        out = out.withColumn("n_tok_mean", F.col("n_tok_sum") / F.col("n_tok_count"))
    return out, tier
