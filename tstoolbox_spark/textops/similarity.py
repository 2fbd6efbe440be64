"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via built-in zip_with/aggregate (JVM-side; no UDF).
- ``ivf_topk``: the scale path — IVF coarse quantizer with
  deterministic centroids; search probes only the closest ``nprobe``
  inverted lists, cutting scanned vectors by ~nlist/nprobe. Centroid
  assignment is a broadcast join + argmin over a small array.
- ``embedding_near_dup_pairs``: all-pairs cosine ≥ threshold dedup
  (block-joined at scale via the same IVF cells).

At 100 TB the pattern is: centroids broadcast (they are tiny), the
corpus partitioned by cell id, each query probing a bounded number of
cells — no all-pairs shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float] | Column,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector (brute force:
    one narrow scan + a k-row ordered take)."""
    q = (
        F.array(*[F.lit(float(x)) for x in query_vec])
        if isinstance(query_vec, list)
        else query_vec
    )
    scored = df.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim")
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: argmax cosine over the (broadcast) centroid
    array — a per-row array expression, no shuffle."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    sims = F.transform(cents, lambda c: cosine(F.col(vec_col), c))
    best = F.array_position(sims, F.array_max(sims)) - 1
    return df.withColumn("cell", best.cast("int"))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` cells whose centroids
    are closest to the query, brute-force inside them only."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    sims = (cents @ q) / (np.linalg.norm(cents, axis=1) * np.linalg.norm(q) + 1e-30)
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]
    assigned = assign_cells(df, centroids, vec_col)
    pruned = assigned.filter(F.col("cell").isin(probe))
    return cosine_topk(pruned, list(map(float, q)), k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold.

    With ``centroids`` the join is blocked by IVF cell (near-dups land
    in the same cell with high probability); without, an all-pairs
    join — only for oracle-scale data.
    """
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if centroids is not None:
        left = assign_cells(
            df, centroids, vec_col
        ).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cell")
        right = assign_cells(
            df, centroids, vec_col
        ).select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cell")
        pairs = left.join(right, "cell")
    else:
        pairs = left.crossJoin(right)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
