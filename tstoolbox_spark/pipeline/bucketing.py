"""Skew-aware salted bucketing of the sequence table.

north_rule: "Raw sequences are bucketed by (source, hash(doc_id))
with salted repartitioning for skewed sources."

Why salting is needed: the source distribution is Zipf (src0 holds
~52% of rows — datagen.SOURCE_CUMULATIVE). A plain
``groupBy(source, bucket)`` into B hash buckets gives the hot source
B partitions of B× the average size; grouped-map stages (the codec)
can't use AQE skew-splitting (that only covers joins), so a hot
bucket OOMs a worker at 100 TB. The fix: per-source *salt fan-out
proportional to source size*, so every (source, bucket, salt) cell
holds ≈ rows_total / (B · Σsalts) rows regardless of skew.

Determinism for resume: salt = xxhash64(doc_id, SALT_SEED) mod
n_salts(source). Both the per-source counts snapshot and the hash are
deterministic, so a restarted job reproduces the same cells — lineage
rows keyed by (source, bucket, salt) stay valid across restarts.

Cost: one map-side-combinable count aggregate over the input (tiny
result, broadcast back as a literal mapping — no join), then one
repartition (the single shuffle the compress stage needs anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_SEED = 0x5A17
DEFAULT_BUCKETS = 64


def source_salt_plan(
    df: DataFrame, target_rows_per_cell: int, n_buckets: int = DEFAULT_BUCKETS
) -> dict[str, int]:
    """salts(source) = ceil(rows / buckets / target_rows_per_cell),
    computed from one count-by-source aggregate (collected: result has
    |sources| rows — bounded, low-cardinality by schema contract)."""
    counts = df.groupBy("source").count().collect()
    return {
        r["source"]: max(1, -(-r["count"] // (n_buckets * target_rows_per_cell)))
        for r in counts
    }


def with_bucket_salt(
    df: DataFrame,
    salt_plan: dict[str, int],
    n_buckets: int = DEFAULT_BUCKETS,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Append deterministic ``bucket`` and ``salt`` columns."""
    bucket = F.pmod(F.abs(F.xxhash64(F.col(doc_col))), F.lit(n_buckets)).cast("int")
    salt_count = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(n)).otherwise(F.lit(None))
            for s, n in salt_plan.items()
        ],
        F.lit(1),
    ) if salt_plan else F.lit(1)
    salt = F.pmod(
        F.abs(F.xxhash64(F.col(doc_col), F.lit(SALT_SEED))), salt_count
    ).cast("int")
    return df.withColumn("bucket", bucket).withColumn("salt", salt)


def bucketed(
    df: DataFrame,
    target_rows_per_cell: int = 250_000,
    n_buckets: int = DEFAULT_BUCKETS,
    repartition: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bucket + salt columns (narrow). No repartition by default: the
    codec stage's ``groupBy(source, bucket, salt)`` performs the hash
    shuffle itself, so an explicit repartition here would double-shuffle
    the token payload. Pass ``repartition=True`` only when the caller
    needs physically co-located cells *without* a later grouped-map
    (e.g. sorted bucket files for bucketed joins)."""
    plan = source_salt_plan(df, target_rows_per_cell, n_buckets)
    out = with_bucket_salt(df, plan, n_buckets)
    if repartition:
        if num_partitions:
            return out.repartition(num_partitions, "source", "bucket", "salt")
        return out.repartition("source", "bucket", "salt")
    return out
