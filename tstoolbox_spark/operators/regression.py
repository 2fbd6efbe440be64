"""Multiple linear regression (OLS / ridge) as distributed normal
equations.

Reference surface: ``tstoolbox regression`` (ref
/root/reference/tstoolbox/functions/regression.py) exposes sklearn's
linear family over a wide frame. sklearn is absent here — and
irrelevant at scale: fitting y ~ X for p regressors only needs the
(p+1)x(p+1) moment matrix X'X and the vector X'y, both plain SUM
aggregates. So the Spark shape is:

  one groupBy(*keys).agg(<(p+1)(p+4)/2 sums>)   -- map-side combinable
  -> coefficients, per key

with NO second pass over the data. For p <= 2 the solve itself is
Cramer's rule written as column expressions on the (tiny) aggregated
frame — zero driver involvement, and the identical algebra is
expressible in ANSI SQL for the correctness oracle. For larger p the
aggregated frame (keys x moments — metadata scale, independent of row
count) is collected and solved with numpy.linalg, then rejoined as a
broadcast. Either way the big table is touched exactly once.

Exactness: with ``exact_decimal`` set (and integral regressors), every
sum routes through DECIMAL so aggregation order cannot perturb the
result — bit-identical across any cluster size or partitioning, which
is what lets a DuckDB oracle hash-match the distributed run.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _moment_aggs(y, xs, exact_decimal: str | None):
    """SUM aggregates for the normal equations: n, S_i = sum x_i,
    Sy, S_ij = sum x_i x_j (i<=j), S_iy = sum x_i y, Syy = sum y^2."""
    if exact_decimal:
        ydec = y.cast(exact_decimal)
        ysum = lambda e: F.sum(e).cast("double")  # noqa: E731
        yv = ydec
    else:
        ysum = lambda e: F.sum(e)  # noqa: E731
        yv = y.cast("double")
    aggs = [F.count(F.lit(1)).cast("double").alias("__n"),
            ysum(yv).alias("__sy"),
            ysum(yv * yv).alias("__syy")]
    p = len(xs)
    for i in range(p):
        aggs.append(F.sum(xs[i]).cast("double").alias(f"__s{i}"))
        aggs.append(ysum(xs[i] * yv).alias(f"__s{i}y"))
        for j in range(i, p):
            aggs.append(
                F.sum(xs[i] * xs[j]).cast("double").alias(f"__s{i}{j}")
            )
    return aggs


def ols_fit(
    df: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    ridge: float = 0.0,
    exact_decimal: str | None = None,
) -> DataFrame:
    """Per-key OLS (ridge when ``ridge`` > 0) of ``y_col`` on
    ``x_cols``; returns one row per key with ``intercept``,
    ``b_<x>`` per regressor, and ``r2``.

    ``exact_decimal`` (e.g. ``"decimal(28,2)"``): route y-sums through
    that decimal type for order-independent exact aggregation — valid
    when y is fixed-precision at that scale and every regressor is
    integral (their products with y then stay exact in decimal).
    p <= 2 solves by Cramer's rule in column expressions; larger p
    collects the per-key moment rows (metadata scale) and solves with
    numpy, never re-reading the input.
    """
    xs = [F.col(c).cast("double") if exact_decimal is None else F.col(c)
          for c in x_cols]
    keys = list(key_cols)
    p = len(xs)
    if p == 0:
        raise ValueError("x_cols must name at least one regressor")
    mom = df.groupBy(*keys).agg(
        *_moment_aggs(F.col(y_col), xs, exact_decimal)
    )
    lam = float(ridge)
    if p == 1:
        return _solve1(mom, x_cols, lam)
    if p == 2:
        return _solve2(mom, x_cols, lam)
    return _solve_np(mom, x_cols, keys, lam, df.sparkSession)


def _r2(sse, c):
    sst = c("__syy") - c("__sy") * c("__sy") / c("__n")
    return F.lit(1.0) - sse / sst


def _solve1(mom: DataFrame, x_cols, lam: float) -> DataFrame:
    c = F.col
    n, sx, sy = c("__n"), c("__s0"), c("__sy")
    sxx, sxy = c("__s00") + F.lit(lam), c("__s0y")
    det = n * sxx - sx * sx
    b1 = (n * sxy - sx * sy) / det
    b0 = (sy - b1 * sx) / n
    sse = c("__syy") - b0 * sy - b1 * sxy
    drop = [f for f in mom.columns if f.startswith("__")]
    return (mom.withColumn("intercept", b0)
            .withColumn(f"b_{x_cols[0]}", b1)
            .withColumn("r2", _r2(sse, c)).drop(*drop))


def _solve2(mom: DataFrame, x_cols, lam: float) -> DataFrame:
    """Cramer's rule on the 3x3 normal matrix
    [[n,S1,S2],[S1,S11+lam,S12],[S2,S12,S22+lam]] b = [Sy,S1y,S2y].
    Pure column expressions — the SQL oracle mirrors them term by
    term, so doubles agree exactly."""
    c = F.col
    n, s1, s2 = c("__n"), c("__s0"), c("__s1")
    s11, s12, s22 = c("__s00") + F.lit(lam), c("__s01"), c("__s11") + F.lit(lam)
    sy, s1y, s2y = c("__sy"), c("__s0y"), c("__s1y")
    det = (n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    d0 = (sy * (s11 * s22 - s12 * s12)
          - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y))
    d1 = (n * (s1y * s22 - s12 * s2y)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2))
    d2 = (n * (s11 * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2))
    b0, b1, b2 = d0 / det, d1 / det, d2 / det
    sse = c("__syy") - b0 * sy - b1 * s1y - b2 * s2y
    drop = [f for f in mom.columns if f.startswith("__")]
    return (mom.withColumn("intercept", b0)
            .withColumn(f"b_{x_cols[0]}", b1)
            .withColumn(f"b_{x_cols[1]}", b2)
            .withColumn("r2", _r2(sse, c)).drop(*drop))


def _solve_np(mom: DataFrame, x_cols, keys, lam: float, spark) -> DataFrame:
    """General p: collect keys x moments (metadata scale — independent
    of input rows) and solve each (p+1)x(p+1) system with numpy."""
    import numpy as np

    p = len(x_cols)
    rows = mom.collect()
    out_rows = []
    for r in rows:
        d = r.asDict()
        A = np.zeros((p + 1, p + 1))
        b = np.zeros(p + 1)
        A[0, 0] = d["__n"]
        b[0] = d["__sy"]
        for i in range(p):
            A[0, i + 1] = A[i + 1, 0] = d[f"__s{i}"]
            b[i + 1] = d[f"__s{i}y"]
            for j in range(i, p):
                A[i + 1, j + 1] = A[j + 1, i + 1] = d[f"__s{i}{j}"]
        A[1:, 1:] += lam * np.eye(p)
        beta = np.linalg.solve(A, b)
        sse = d["__syy"] - float(beta @ b)
        sst = d["__syy"] - d["__sy"] ** 2 / d["__n"]
        rec = {k: d[k] for k in keys}
        rec["intercept"] = float(beta[0])
        for i, xc in enumerate(x_cols):
            rec[f"b_{xc}"] = float(beta[i + 1])
        rec["r2"] = 1.0 - sse / sst if sst else float("nan")
        out_rows.append(rec)
    schema = ", ".join(
        [f"`{k}` {dict(mom.dtypes)[k]}" for k in keys]
        + ["intercept double"]
        + [f"`b_{xc}` double" for xc in x_cols]
        + ["r2 double"]
    )
    return spark.createDataFrame(out_rows, schema=schema)


def ols_predict(
    df: DataFrame,
    coef: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Append ``<y>_pred`` and ``<y>_resid`` by broadcasting the
    per-key coefficient frame (tiny) back over the input — same
    broadcast-back shape as linear_fit (stats.py:381), never a key
    window (which would single-task each key at scale)."""
    keys = list(key_cols)
    joined = (df.join(F.broadcast(coef), on=keys, how="left")
              if keys else df.crossJoin(F.broadcast(coef)))
    pred = F.col("intercept")
    for xc in x_cols:
        pred = pred + F.col(f"b_{xc}") * F.col(xc).cast("double")
    return (joined.withColumn(f"{y_col}_pred", pred)
            .withColumn(f"{y_col}_resid",
                        F.col(y_col).cast("double") - pred)
            .drop("intercept", "r2", *[f"b_{xc}" for xc in x_cols]))
