"""Mergeable distinct-count tier partials via HyperLogLog sketches.

The histogram tiers (``rollup.hist_*``) give EXACT distincts, but a
distinct count is holistic: distinct users per day is NOT the sum of
per-hour distincts, so the exact path must keep one row per (bucket,
value) — fine for bounded domains, unbounded cost for high-cardinality
ones (user ids at 100 TB). The standard scale answer (public: Flajolet
et al. 2007 HyperLogLog; Apache DataSketches, which backs Spark's
``hll_sketch_agg`` family) is a FIXED-SIZE mergeable register array:

    hll_1h = hll_sketch_agg(user_id)       -- 2^lg_k registers
    hll_1d = hll_union_agg(hll_1h)         -- register-wise max
    estimate = hll_sketch_estimate(hll_*)  -- read at any tier

Register-wise max is associative/commutative/idempotent, so late
partials can be re-unioned safely and a tier row costs O(2^lg_k)
bytes regardless of cardinality. Note the implementation detail:
Spark's DataSketches union merges into an HLL_8 target whose
estimator can differ from the direct HLL_4 sketch by a fraction of
the sketch's own error (observed ~0.5% at lg_k=12), so cascade and
direct agree to within estimation error, not byte-for-byte — the
pytest contract. Default lg_k=12 → 4 KiB per bucket, ~1.6% relative
standard error.

No DuckDB value oracle is possible (the estimate is defined by the
DataSketches register layout, which DuckDB does not implement), so
this family is pytest-verified: cascade-vs-direct estimate equality
and error bounds against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import TIERS


def hll_base(
    df: DataFrame,
    tier: str = "1h",
    key_cols: tuple[str, ...] = ("source",),
    value_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Raw rows → finest distinct-sketch tier: one binary sketch
    column per (keys, bucket). Same single groupBy shuffle as
    ``rollup_base``; the sketch aggregate is map-side combinable
    (partial sketches union in the combiner)."""
    unit = TIERS[tier]
    return df.groupBy(
        *key_cols, F.date_trunc(unit, F.col(ts_col)).alias("ts")
    ).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("distinct_hll")
    )


def hll_cascade(
    finer: DataFrame, tier: str, key_cols: tuple[str, ...] = ("source",)
) -> DataFrame:
    """Finer sketch tier → coarser sketch tier (register-wise max via
    sketch union). Scans sketches, never raw rows."""
    unit = TIERS[tier]
    return finer.groupBy(
        *key_cols, F.date_trunc(unit, F.col("ts")).alias("ts")
    ).agg(F.hll_union_agg(F.col("distinct_hll")).alias("distinct_hll"))


def hll_estimate(
    tier_df: DataFrame, out_col: str = "approx_distinct"
) -> DataFrame:
    """Read the distinct estimate from a sketch tier (derived at read,
    never materialized — the ``with_mean`` convention)."""
    return tier_df.withColumn(
        out_col, F.hll_sketch_estimate(F.col("distinct_hll"))
    ).drop("distinct_hll")
