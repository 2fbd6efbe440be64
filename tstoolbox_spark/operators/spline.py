"""Natural cubic spline gap-fill — scipy-free.

Closes the reference's scipy interpolation gap (ref
functions/fill.py:279-298 routes method='spline'/'cubic' through
pandas→scipy; this container has no scipy, and ``fill_pandas`` now
refuses those methods rather than silently degrading). The natural
cubic spline is the classical textbook construction (e.g. Burden &
Faires, Numerical Analysis §3.5 — public):

    S''(x_0) = S''(x_{n-1}) = 0, C² at interior knots →
    tridiagonal system  h_{j}M_j + 2(h_j+h_{j+1})M_{j+1} + h_{j+1}M_{j+2}
        = 6((y_{j+2}-y_{j+1})/h_{j+1} - (y_{j+1}-y_j)/h_j)
    solved by the Thomas algorithm, then each gap row evaluates

    S(x) = M_i(x_{i+1}-x)³/(6h) + M_{i+1}(x-x_i)³/(6h)
         + (y_i/h - M_i h/6)(x_{i+1}-x) + (y_{i+1}/h - M_{i+1} h/6)(x-x_i)

Scale shape: the KNOTS (non-null observations) are the only sequential
part — the Thomas solve runs as a grouped-map pandas UDF over the knot
subset (the dtw/holt-exact convention: keys parallelize, within-key is
honest-sequential and O(knots)). The row volume never enters Python:
gap rows get their bracketing knot (x, y, M) via the same two
single-sort ignorenulls windows ``fill('linear')`` uses, and the cubic
is one JVM column expression. Rows outside the knot range stay null
(no extrapolation — the natural BC makes extrapolation linear and
misleading; compose with ffill/bfill if edges must fill).

Every arithmetic step (d/b/a/c construction, Thomas sweeps, the
evaluation polynomial with explicit cubed differences) is written in
the exact form the DuckDB recursive-CTE oracle mirrors, so driver
value-hash parity holds without quantization tricks.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _solve_second_derivatives(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Natural-BC second derivatives at each knot (Thomas algorithm,
    float64, ascending index — the fold order the SQL oracle runs)."""
    n = len(x)
    M = np.zeros(n, dtype=np.float64)
    if n < 3:
        return M  # n==2 degenerates to linear via the evaluation form
    h = np.diff(x)
    m = n - 2
    d = 6.0 * ((y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1])
    b = 2.0 * (h[:-1] + h[1:])
    a = h[:-1]   # coeff of u_{j-1} (vanishes at j=0: M_0 = 0)
    c = h[1:]    # coeff of u_{j+1} (vanishes at j=m-1: M_{n-1} = 0)
    cp = np.empty(m)
    dp = np.empty(m)
    cp[0] = c[0] / b[0]
    dp[0] = d[0] / b[0]
    for j in range(1, m):
        den = b[j] - a[j] * cp[j - 1]
        cp[j] = c[j] / den
        dp[j] = (d[j] - a[j] * dp[j - 1]) / den
    u = np.empty(m)
    u[m - 1] = dp[m - 1]
    for j in range(m - 2, -1, -1):
        u[j] = dp[j] - cp[j] * u[j + 1]
    M[1:n - 1] = u
    return M


def spline_fill(
    df: DataFrame,
    value_cols: Sequence[str],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Fill null gaps in ``value_cols`` with a natural cubic spline
    through each key's observed points. Appends ``<col>_spline`` (the
    observed value at knots, the spline value in gaps, null outside
    the knot range).

    ``(key, ts[, order_cols])`` must be unique (the fill contract).
    Knot count per key is the per-key series length — fine for tier
    keys; do not key by doc_id-cardinality columns (theil_sen-style
    contract).
    """
    keys = list(key_cols)
    order = [ts_col, *order_cols]
    x_expr = (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6))
    out = df.withColumn("__x", x_expr)
    w_prev = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in value_cols:
        knots = out.filter(F.col(c).isNotNull()).select(
            *keys, F.col("__x").alias("__kx"),
            F.col(c).cast("double").alias("__ky"),
        )
        if not keys:
            knots = knots.withColumn("__g", F.lit(1))
        schema = ", ".join(
            [f"`{k}` {knots.schema[k].dataType.simpleString()}"
             for k in (keys or ["__g"])]
            + ["__kx double", "__ky double", "__m double"]
        )

        def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("__kx")
            M = _solve_second_derivatives(
                pdf["__kx"].to_numpy(np.float64),
                pdf["__ky"].to_numpy(np.float64),
            )
            pdf = pdf.copy()
            pdf["__m"] = M
            return pdf

        solved = (
            knots.groupBy(*(keys or ["__g"]))
            .applyInPandas(_solve, schema=schema)
            .drop("__g")
        )
        j = out.join(
            solved.withColumnRenamed("__kx", "__x"),
            [*keys, "__x"], "left",
        )
        knot = F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.col("__x").alias("x"),
                F.col(c).cast("double").alias("y"),
                F.col("__m").alias("m"),
            ),
        )
        p = F.last(knot, ignorenulls=True).over(w_prev)
        q = F.first(knot, ignorenulls=True).over(w_next)
        h = q["x"] - p["x"]
        dr = q["x"] - F.col("__x")   # distance to right knot
        dl = F.col("__x") - p["x"]   # distance to left knot
        s = (
            p["m"] * (dr * dr * dr) / (F.lit(6.0) * h)
            + q["m"] * (dl * dl * dl) / (F.lit(6.0) * h)
            + (p["y"] / h - p["m"] * h / F.lit(6.0)) * dr
            + (q["y"] / h - q["m"] * h / F.lit(6.0)) * dl
        )
        filled = (
            F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
            .when(p.isNotNull() & q.isNotNull(), s)
        )
        out = j.withColumn(f"{c}_spline", filled).drop("__ky", "__m")
    return out.drop("__x")
