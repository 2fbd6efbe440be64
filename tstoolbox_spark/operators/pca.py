"""PCA over an embedding column, Spark-first.

Reference surface: ``tstoolbox pca`` (ref
/root/reference/tstoolbox/functions/pca.py) runs sklearn PCA over the
wide frame. sklearn is absent and would not distribute anyway; the
scalable decomposition is:

  1. covariance: one pass of per-batch partial Gram matrices
     (``mapInPandas`` — Arrow batches, vectorized ``Q.T @ Q``, never
     per-row Python) reduced by a groupBy over (i, j) cells. Executor
     traffic is d(d+1)/2 cells per batch — metadata scale, independent
     of row count.
  2. eigendecomposition: ``numpy.linalg.eigh`` on the d x d covariance
     collected to the driver (d is the embedding width, e.g. 64 — a
     4 KB matrix, same driver-residency budget as IVF centroids,
     similarity.py:159).
  3. projection: broadcast the k eigenvectors back and take per-row
     dot products with ``F.aggregate`` over ``zip_with`` — JVM-side,
     deterministic fold order, no UDF.

Determinism: ``quantized_covariance`` fixes components to integers
(``floor(x * scale)``) before any cross-row sum, so every partial sum
is EXACT integer arithmetic — the result is bit-identical under any
partitioning, executor count, or aggregation order (the property the
DuckDB value-hash oracle checks, and the property a 1000-executor
re-run needs to reproduce a checkpointed run). float64 batch Grams
stay exact because |q| <= scale and Arrow batches are <= 2^20 rows:
q_i*q_j*batch < 2^52 ulp-headroom of int64 accumulation.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F

_PARTIAL_SCHEMA = "i int, j int, g long"


def quantized_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: float = 1e6,
) -> DataFrame:
    """Sample covariance of ``floor(x*scale)/scale``-quantized vectors;
    returns (i, j, cov) for i <= j (0-based component indices).

    Exact integer partial sums -> order-independent, hash-stable."""
    import numpy as np

    isc = float(scale)

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.floor(X * isc).astype(np.int64)
            d = Q.shape[1]
            G = Q.T @ Q
            S = Q.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame({
                "i": np.concatenate([iu, np.full(d, -1), [-2]]).astype("int32"),
                "j": np.concatenate([ju, np.arange(d), [-2]]).astype("int32"),
                "g": np.concatenate([G[iu, ju], S, [len(Q)]]),
            })

    parts = df.select(vec_col).mapInPandas(gram, schema=_PARTIAL_SCHEMA)
    # exact cross-partition reduce: decimal(38,0) never wraps
    agg = parts.groupBy("i", "j").agg(
        F.sum(F.col("g").cast("decimal(38,0)")).alias("g")
    )
    n = agg.filter(F.col("i") == -2).select(
        F.col("g").cast("double").alias("n"))
    s = agg.filter(F.col("i") == -1).select(
        F.col("j").alias("k"), F.col("g").cast("double").alias("s"))
    g = agg.filter(F.col("i") >= 0)
    out = (g.crossJoin(F.broadcast(n))
           .join(F.broadcast(s).withColumnRenamed("k", "i")
                 .withColumnRenamed("s", "si"), on="i")
           .join(F.broadcast(s).withColumnRenamed("k", "j")
                 .withColumnRenamed("s", "sj"), on="j"))
    cov = ((F.col("g").cast("double")
            - F.col("si") * F.col("sj") / F.col("n"))
           / (F.col("n") - F.lit(1.0))) / F.lit(isc * isc)
    return out.select("i", "j", cov.alias("cov"))


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    scale: float = 1e6,
) -> tuple["object", "object"]:
    """Fit PCA: distributed covariance (one pass) + driver-side
    ``eigh`` of the d x d matrix (metadata scale). Returns
    (components, explained_variance): components is a (k, d) ndarray
    of unit eigenvectors sorted by descending eigenvalue with a
    deterministic sign convention (largest-|coord| entry positive)."""
    import numpy as np

    rows = quantized_covariance(df, vec_col, scale=scale).collect()
    d = max(r["j"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # sign convention so the fit is reproducible run to run
    for c in comps:
        a = np.argmax(np.abs(c))
        if c[a] < 0:
            c *= -1
    return comps, w[order]


def pca_transform(
    df: DataFrame,
    components,
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Project each vector onto the fitted components — per-row
    ``zip_with`` dot products against literal eigenvector arrays
    (broadcast in the plan), JVM-side, no shuffle, no UDF."""
    out = df
    for idx, comp in enumerate(components):
        lit_vec = F.array(*[F.lit(float(c)) for c in comp])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), lit_vec,
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{out_prefix}{idx}", dot)
    return out
