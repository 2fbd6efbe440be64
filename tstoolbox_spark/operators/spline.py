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


def pchip_fill(
    df: DataFrame,
    value_cols: Sequence[str],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Fill null gaps with PCHIP — the Fritsch-Carlson monotone cubic
    (Fritsch & Carlson, SIAM J. Numer. Anal. 1980; the algorithm behind
    scipy.interpolate.PchipInterpolator / pandas method='pchip').
    Appends ``<col>_pchip``. Overshoot-free: the interpolant preserves
    the data's local monotonicity, the property that makes it the
    default gap-filler for physical sensor series.

    100-TB shape: unlike the natural spline (a global tridiagonal
    solve), every PCHIP derivative is LOCAL — a function of the two
    neighboring slopes — so the whole operator is window expressions
    over the knot sequence plus the same bracketing windows
    ``fill('linear')`` uses. No grouped map, no Python, nothing
    sequential: one (key)-sort for the knot lag/leads, one for the
    bracket carry.

    Derivative rules (the exact scipy formulation, public):
      interior: d_i = 0 when slopes change sign or either is 0, else
        the weighted harmonic mean (w1+w2)/(w1/Δ_{i-1} + w2/Δ_i) with
        w1 = 2h_i + h_{i-1}, w2 = h_i + 2h_{i-1};
      ends (three-point one-sided): d = ((2h0+h1)Δ0 − h0Δ1)/(h0+h1),
        clamped to 0 on sign disagreement with Δ0 and to 3Δ0 when Δ0,
        Δ1 disagree and |d| > 3|Δ0|;
      n == 2 → linear, n == 1 → nothing fillable.

    Evaluation is the cubic Hermite basis on each bracket. Rows
    outside the knot range stay null (compose with ffill/bfill).
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
        kw = Window.partitionBy(*keys).orderBy("__kx")
        xk, yk = F.col("__kx"), F.col("__ky")
        xp, yp = F.lag("__kx").over(kw), F.lag("__ky").over(kw)
        xn, yn = F.lead("__kx").over(kw), F.lead("__ky").over(kw)
        x2n, y2n = F.lag("__kx", -2).over(kw), F.lag("__ky", -2).over(kw)
        x2p, y2p = F.lag("__kx", 2).over(kw), F.lag("__ky", 2).over(kw)
        h0, h1 = xk - xp, xn - xk            # h_{i-1}, h_i
        d0 = (yk - yp) / h0                  # Δ_{i-1}
        d1 = (yn - yk) / h1                  # Δ_i
        w1 = F.lit(2.0) * h1 + h0
        w2 = h1 + F.lit(2.0) * h0
        interior = F.when(
            (d0 * d1 <= F.lit(0.0)), F.lit(0.0)
        ).otherwise((w1 + w2) / (w1 / d0 + w2 / d1))

        def _edge(ha, hb, da, db):
            """Three-point one-sided derivative with FC clamping."""
            d = ((F.lit(2.0) * ha + hb) * da - ha * db) / (ha + hb)
            return (
                F.when(d * da <= F.lit(0.0), F.lit(0.0))
                .when(
                    (da * db < F.lit(0.0))
                    & (F.abs(d) > F.lit(3.0) * F.abs(da)),
                    F.lit(3.0) * da,
                )
                .otherwise(d)
            )

        hn2 = x2n - xn                        # h_{i+1} (for left edge)
        dn2 = (y2n - yn) / hn2                # Δ_{i+1}
        hp2 = xp - x2p                        # h_{i-2} (for right edge)
        dp2 = (yp - y2p) / hp2                # Δ_{i-2}
        left_edge = _edge(h1, hn2, d1, dn2)   # first knot: uses Δ0, Δ1
        right_edge = _edge(h0, hp2, d0, dp2)  # last knot: mirrored
        two_point = F.when(xp.isNull(), d1).otherwise(d0)  # n == 2
        deriv = (
            F.when(xp.isNotNull() & xn.isNotNull(), interior)
            .when(xp.isNull() & xn.isNotNull() & x2n.isNotNull(), left_edge)
            .when(xn.isNull() & xp.isNotNull() & x2p.isNotNull(), right_edge)
            .when(xp.isNull() & xn.isNull(), F.lit(0.0))  # single knot
            .otherwise(two_point)
        )
        solved = knots.withColumn("__d", deriv).select(
            *keys, F.col("__kx").alias("__x"), F.col("__d"),
        )
        j = out.join(solved, [*keys, "__x"], "left")
        knot = F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.col("__x").alias("x"),
                F.col(c).cast("double").alias("y"),
                F.col("__d").alias("d"),
            ),
        )
        p = F.last(knot, ignorenulls=True).over(w_prev)
        q = F.first(knot, ignorenulls=True).over(w_next)
        h = q["x"] - p["x"]
        t = (F.col("__x") - p["x"]) / h
        t2, t3 = None, None
        t2 = t * t
        t3 = t2 * t
        h00 = F.lit(2.0) * t3 - F.lit(3.0) * t2 + F.lit(1.0)
        h10 = t3 - F.lit(2.0) * t2 + t
        h01 = F.lit(-2.0) * t3 + F.lit(3.0) * t2
        h11 = t3 - t2
        s = (
            p["y"] * h00 + h * p["d"] * h10
            + q["y"] * h01 + h * q["d"] * h11
        )
        filled = (
            F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
            .when(p.isNotNull() & q.isNotNull(), s)
        )
        out = j.withColumn(f"{c}_pchip", filled).drop("__d")
    return out.drop("__x")


def akima_fill(
    df: DataFrame,
    value_cols: Sequence[str],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Fill null gaps with Akima's 1970 spline (J. ACM 17(4) — the
    scipy.interpolate.Akima1DInterpolator / pandas method='akima'
    algorithm). Appends ``<col>_akima``. Akima derivatives weigh the
    two adjacent segment slopes by how non-linear the OTHER side is —
    wiggle-resistant like PCHIP but C¹-smooth through inflections.

    Same 100-TB shape as :func:`pchip_fill`: derivatives are LOCAL
    (four segment slopes around each knot, the edge slopes synthesized
    by Akima's quadratic extrapolation m₋₁ = 2m₀ − m₁), so the whole
    operator is knot lag/lead window expressions + the bracketing
    carry + a Hermite projection. No Python anywhere.

    Weight rule (ties per the paper): with segment slopes
    s1=m_{i-2}, s2=m_{i-1}, s3=m_i, s4=m_{i+1},
    w1=|s4−s3|, w2=|s2−s1| → d_i = (w1·s2 + w2·s3)/(w1+w2),
    falling back to (s2+s3)/2 when w1+w2 == 0. n==2 → linear,
    n==1 → nothing fillable; outside the knot range stays null.
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
        kw = Window.partitionBy(*keys).orderBy("__kx")
        xk, yk = F.col("__kx"), F.col("__ky")
        xn, yn = F.lead("__kx").over(kw), F.lead("__ky").over(kw)
        slope = (yn - yk) / (xn - xk)       # m_i: slope RIGHT of knot i
        k2 = knots.withColumn("__s3r", slope)
        s3r = F.col("__s3r")
        s2r = F.lag("__s3r").over(kw)       # m_{i-1}
        s1r = F.lag("__s3r", 2).over(kw)    # m_{i-2}
        s4r = F.lag("__s3r", -1).over(kw)   # m_{i+1}
        # resolve virtual edge slopes (Akima: m_{-1} = 2m0 - m1, and
        # mirrored on the right); order matters — s3, then s2/s4/s1
        s3 = F.coalesce(s3r, F.lit(2.0) * s2r - s1r)
        s2 = F.coalesce(s2r, F.lit(2.0) * s3 - s4r)
        s4 = F.coalesce(s4r, F.lit(2.0) * s3 - s2)
        s1 = F.coalesce(s1r, F.lit(2.0) * s2 - s3)
        w1 = F.abs(s4 - s3)
        w2 = F.abs(s2 - s1)
        akima = F.when(
            w1 + w2 == F.lit(0.0), (s2 + s3) / F.lit(2.0)
        ).otherwise((w1 * s2 + w2 * s3) / (w1 + w2))
        # n <= 2: the lone slope on whichever side exists (linear)
        deriv = F.when(
            s1r.isNull() & s4r.isNull()
            & (s3r.isNull() | s2r.isNull()),
            F.coalesce(s3r, s2r),
        ).otherwise(akima)
        solved = k2.withColumn("__d", deriv).select(
            *keys, F.col("__kx").alias("__x"), F.col("__d"),
        )
        j = out.join(solved, [*keys, "__x"], "left")
        knot = F.when(
            F.col(c).isNotNull(),
            F.struct(
                F.col("__x").alias("x"),
                F.col(c).cast("double").alias("y"),
                F.col("__d").alias("d"),
            ),
        )
        p = F.last(knot, ignorenulls=True).over(w_prev)
        q = F.first(knot, ignorenulls=True).over(w_next)
        h = q["x"] - p["x"]
        t = (F.col("__x") - p["x"]) / h
        t2 = t * t
        t3 = t2 * t
        h00 = F.lit(2.0) * t3 - F.lit(3.0) * t2 + F.lit(1.0)
        h10 = t3 - F.lit(2.0) * t2 + t
        h01 = F.lit(-2.0) * t3 + F.lit(3.0) * t2
        h11 = t3 - t2
        s = (
            p["y"] * h00 + h * p["d"] * h10
            + q["y"] * h01 + h * q["d"] * h11
        )
        filled = (
            F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
            .when(p.isNotNull() & q.isNotNull(), s)
        )
        out = j.withColumn(f"{c}_akima", filled).drop("__d")
    return out.drop("__x")
