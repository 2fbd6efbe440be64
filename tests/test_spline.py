"""Natural cubic spline gap-fill (operators/spline.py) — verified
against an INDEPENDENT dense solve of the defining linear system (not
the Thomas implementation under test)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.operators.spline import spline_fill


def _dense_natural_spline(xk, yk, xq):
    """Reference: build the FULL (n x n) natural-spline system and
    solve densely with np.linalg.solve, then evaluate piecewise."""
    n = len(xk)
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    A[0, 0] = 1.0
    A[n - 1, n - 1] = 1.0
    h = np.diff(xk)
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 6 * ((yk[i + 1] - yk[i]) / h[i] - (yk[i] - yk[i - 1]) / h[i - 1])
    M = np.linalg.solve(A, rhs)
    out = []
    for x in xq:
        i = np.searchsorted(xk, x) - 1
        i = min(max(i, 0), n - 2)
        hi = xk[i + 1] - xk[i]
        s = (
            M[i] * (xk[i + 1] - x) ** 3 / (6 * hi)
            + M[i + 1] * (x - xk[i]) ** 3 / (6 * hi)
            + (yk[i] / hi - M[i] * hi / 6) * (xk[i + 1] - x)
            + (yk[i + 1] / hi - M[i + 1] * hi / 6) * (x - xk[i])
        )
        out.append(s)
    return np.array(out)


def _frame(spark, ts, vals, key=None):
    rows = []
    for t, v in zip(ts, vals):
        r = (t, v) if key is None else (key, t, v)
        rows.append(r)
    schema = ("ts timestamp, value double" if key is None
              else "key string, ts timestamp, value double")
    return spark.createDataFrame(rows, schema)


def test_spline_matches_dense_solve(spark):
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(12)]
    rng = np.random.default_rng(3)
    full = rng.normal(10, 3, 12)
    vals = [None if i in (2, 3, 5, 8, 9) else float(full[i])
            for i in range(12)]
    out = spline_fill(_frame(spark, ts, vals), ["value"]).orderBy("ts")
    got = [r.value_spline for r in out.collect()]
    xk = np.array([i * 3600.0 for i in range(12) if vals[i] is not None])
    # absolute epoch offsets must not matter beyond conditioning; the
    # operator uses raw epoch seconds, the reference uses the same axis
    epoch0 = ts[0].replace(tzinfo=dt.timezone.utc).timestamp()
    xk = xk + epoch0
    yk = np.array([v for v in vals if v is not None])
    xq = np.array([epoch0 + i * 3600.0 for i in range(12)])
    want = _dense_natural_spline(xk, yk, xq)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


def test_spline_reproduces_line_and_keeps_knots(spark):
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(8)]
    vals = [float(2 * i + 1) if i % 3 == 0 else None for i in range(8)]
    out = {r.ts: r.value_spline
           for r in spline_fill(_frame(spark, ts, vals), ["value"]).collect()}
    for i, t in enumerate(ts):
        if i <= 6:  # inside knot range (knots at 0, 3, 6)
            assert out[t] == pytest.approx(2 * i + 1, abs=1e-9)
        else:       # beyond the last knot: stays null
            assert out[t] is None


def test_spline_two_knots_is_linear_and_one_knot_null(spark):
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(5)]
    vals = [1.0, None, None, None, 9.0]
    out = [r.value_spline
           for r in spline_fill(_frame(spark, ts, vals), ["value"])
           .orderBy("ts").collect()]
    assert out == [1.0, 3.0, 5.0, 7.0, 9.0]
    vals1 = [None, None, 4.0, None, None]
    out1 = [r.value_spline
            for r in spline_fill(_frame(spark, ts, vals1), ["value"])
            .orderBy("ts").collect()]
    assert out1 == [None, None, 4.0, None, None]


def test_spline_per_key_independent(spark):
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(6)]
    a = _frame(spark, ts, [0.0, None, 4.0, None, 16.0, None], key="a")
    b = _frame(spark, ts, [100.0, None, None, 100.0, None, 100.0], key="b")
    out = spline_fill(a.unionByName(b), ["value"], key_cols=["key"])
    got = {(r.key, r.ts): r.value_spline for r in out.collect()}
    # key b: constant series → spline is constant where bracketed
    for i in range(6):
        assert got[("b", ts[i])] == pytest.approx(100.0)
    # key a: last row beyond final knot stays null; knots preserved
    assert got[("a", ts[5])] is None
    assert got[("a", ts[0])] == 0.0 and got[("a", ts[4])] == 16.0


def test_spline_no_python_row_path(spark):
    """Only the knot solve is a pandas stage; the fill itself must be
    window + projection (one FlatMapGroupsInPandas in the plan, over
    the filtered knot subset)."""
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(10)]
    vals = [float(i) if i % 2 == 0 else None for i in range(10)]
    df = spline_fill(_frame(spark, ts, vals), ["value"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1


# ---------------------------------------------------------------------------
# PCHIP (Fritsch-Carlson monotone cubic) — independent numpy reference
# ---------------------------------------------------------------------------


def _pchip_derivs_ref(x, y):
    """Independent FC-1980 derivative computation (numpy)."""
    n = len(x)
    h = np.diff(x)
    delta = np.diff(y) / h
    d = np.zeros(n)
    if n == 1:
        return d
    if n == 2:
        d[:] = delta[0]
        return d
    for i in range(1, n - 1):
        if delta[i - 1] * delta[i] <= 0:
            d[i] = 0.0
        else:
            w1 = 2 * h[i] + h[i - 1]
            w2 = h[i] + 2 * h[i - 1]
            d[i] = (w1 + w2) / (w1 / delta[i - 1] + w2 / delta[i])

    def edge(h0, h1, d0, d1):
        e = ((2 * h0 + h1) * d0 - h0 * d1) / (h0 + h1)
        if e * d0 <= 0:
            return 0.0
        if d0 * d1 < 0 and abs(e) > 3 * abs(d0):
            return 3 * d0
        return e

    d[0] = edge(h[0], h[1], delta[0], delta[1])
    d[-1] = edge(h[-1], h[-2], delta[-1], delta[-2])
    return d


def _pchip_eval_ref(xk, yk, xq):
    d = _pchip_derivs_ref(xk, yk)
    out = []
    for x in xq:
        i = min(max(np.searchsorted(xk, x) - 1, 0), len(xk) - 2)
        h = xk[i + 1] - xk[i]
        t = (x - xk[i]) / h
        h00 = 2 * t**3 - 3 * t**2 + 1
        h10 = t**3 - 2 * t**2 + t
        h01 = -2 * t**3 + 3 * t**2
        h11 = t**3 - t**2
        out.append(yk[i] * h00 + h * d[i] * h10
                   + yk[i + 1] * h01 + h * d[i + 1] * h11)
    return np.array(out)


def test_pchip_matches_independent_reference(spark):
    from tstoolbox_spark.operators.spline import pchip_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(14)]
    rng = np.random.default_rng(11)
    full = np.cumsum(rng.normal(0, 2, 14))  # wandering series
    gaps = {1, 4, 5, 6, 9, 12}
    vals = [None if i in gaps else float(full[i]) for i in range(14)]
    out = pchip_fill(_frame(spark, ts, vals), ["value"]).orderBy("ts")
    got = np.array([r.value_pchip for r in out.collect()], dtype=float)
    epoch0 = ts[0].replace(tzinfo=dt.timezone.utc).timestamp()
    xk = np.array([epoch0 + i * 3600.0 for i in range(14) if i not in gaps])
    yk = np.array([full[i] for i in range(14) if i not in gaps])
    xq = np.array([epoch0 + i * 3600.0 for i in range(14)])
    want = _pchip_eval_ref(xk, yk, xq)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pchip_monotone_no_overshoot(spark):
    """The FC property the natural spline lacks: between two knots the
    interpolant stays inside [y_left, y_right] for monotone data."""
    from tstoolbox_spark.operators.spline import pchip_fill, spline_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(9)]
    # step-like monotone data: natural splines overshoot the riser
    # (dense solve gives -1.004 at h3 and 11.27 at h7 for these knots)
    y = [0.0, None, 0.0, None, 0.0, None, 10.0, None, 10.0]
    df = _frame(spark, ts, y)
    pch = {r.ts: r.value_pchip for r in pchip_fill(df, ["value"]).collect()}
    assert all(v is not None and -1e-12 <= v <= 10.0 + 1e-12
               for v in pch.values())
    nat = {r.ts: r.value_spline
           for r in spline_fill(df, ["value"]).collect()}
    assert any(v < -1e-9 or v > 10.0 + 1e-9 for v in nat.values()), (
        "sanity: the natural spline should overshoot this step"
    )


def test_pchip_line_knots_edges_and_small_n(spark):
    from tstoolbox_spark.operators.spline import pchip_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(8)]
    lin = [float(3 * i + 2) if i % 3 == 0 else None for i in range(8)]
    out = {r.ts: r.value_pchip
           for r in pchip_fill(_frame(spark, ts, lin), ["value"]).collect()}
    for i in range(7):
        assert out[ts[i]] == pytest.approx(3 * i + 2, abs=1e-9)
    assert out[ts[7]] is None  # beyond last knot
    two = [5.0, None, None, 11.0, None]
    got = [r.value_pchip
           for r in pchip_fill(_frame(spark, ts[:5], two), ["value"])
           .orderBy("ts").collect()]
    assert got[:4] == pytest.approx([5.0, 7.0, 9.0, 11.0], abs=1e-9)
    assert got[4] is None


def test_pchip_is_pure_jvm(spark):
    """No Python stage anywhere: derivatives are knot-window
    expressions, evaluation is a projection."""
    from tstoolbox_spark.operators.spline import pchip_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(10)]
    vals = [float(i) if i % 2 == 0 else None for i in range(10)]
    df = pchip_fill(_frame(spark, ts, vals), ["value"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Akima 1970 — independent numpy reference
# ---------------------------------------------------------------------------


def _akima_derivs_ref(x, y):
    n = len(x)
    m = np.diff(y) / np.diff(x)
    if n == 2:
        return np.array([m[0], m[0]])
    # extended slopes with Akima's quadratic extrapolation
    ext = np.empty(n + 3)
    ext[2:n + 1] = m
    ext[1] = 2 * ext[2] - ext[3]
    ext[0] = 2 * ext[1] - ext[2]
    ext[n + 1] = 2 * ext[n] - ext[n - 1]
    ext[n + 2] = 2 * ext[n + 1] - ext[n]
    d = np.empty(n)
    for i in range(n):
        s1, s2, s3, s4 = ext[i], ext[i + 1], ext[i + 2], ext[i + 3]
        w1, w2 = abs(s4 - s3), abs(s2 - s1)
        d[i] = ((s2 + s3) / 2 if w1 + w2 == 0
                else (w1 * s2 + w2 * s3) / (w1 + w2))
    return d


def _akima_eval_ref(xk, yk, xq):
    d = _akima_derivs_ref(xk, yk)
    out = []
    for x in xq:
        i = min(max(np.searchsorted(xk, x) - 1, 0), len(xk) - 2)
        h = xk[i + 1] - xk[i]
        t = (x - xk[i]) / h
        h00 = 2 * t**3 - 3 * t**2 + 1
        h10 = t**3 - 2 * t**2 + t
        h01 = -2 * t**3 + 3 * t**2
        h11 = t**3 - t**2
        out.append(yk[i] * h00 + h * d[i] * h10
                   + yk[i + 1] * h01 + h * d[i + 1] * h11)
    return np.array(out)


def test_akima_matches_independent_reference(spark):
    from tstoolbox_spark.operators.spline import akima_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(16)]
    rng = np.random.default_rng(23)
    full = np.cumsum(rng.normal(0, 3, 16))
    gaps = {1, 2, 5, 8, 11, 13, 14}
    vals = [None if i in gaps else float(full[i]) for i in range(16)]
    out = akima_fill(_frame(spark, ts, vals), ["value"]).orderBy("ts")
    got = np.array([r.value_akima for r in out.collect()], dtype=float)
    epoch0 = ts[0].replace(tzinfo=dt.timezone.utc).timestamp()
    xk = np.array([epoch0 + i * 3600.0 for i in range(16) if i not in gaps])
    yk = np.array([full[i] for i in range(16) if i not in gaps])
    xq = np.array([epoch0 + i * 3600.0 for i in range(16)])
    want = _akima_eval_ref(xk, yk, xq)
    assert np.allclose(got, want, rtol=1e-11, atol=1e-11)


def test_akima_flat_region_stays_flat(spark):
    """Akima's signature property (the 1970 paper's motivating
    example): a locally flat stretch stays exactly flat — natural
    splines ring there."""
    from tstoolbox_spark.operators.spline import akima_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(11)]
    y = [1.0, None, 1.0, None, 1.0, None, 1.0, 4.0, None, 9.0, 10.0]
    out = {r.ts: r.value_akima
           for r in akima_fill(_frame(spark, ts, y), ["value"]).collect()}
    for i in (1, 3, 5):  # gaps inside the flat run
        assert out[ts[i]] == pytest.approx(1.0, abs=1e-12)


def test_akima_line_small_n_and_pure_jvm(spark):
    from tstoolbox_spark.operators.spline import akima_fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(6)]
    lin = [4.0, None, None, 10.0, None, 14.0]
    df = akima_fill(_frame(spark, ts, lin), ["value"])
    got = [r.value_akima for r in df.orderBy("ts").collect()]
    assert got == pytest.approx([4.0, 6.0, 8.0, 10.0, 12.0, 14.0], abs=1e-9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Pandas" not in plan and "Python" not in plan
    two = [5.0, None, None, None, 13.0, None]
    got2 = [r.value_akima
            for r in akima_fill(_frame(spark, ts, two), ["value"])
            .orderBy("ts").collect()]
    assert got2[:5] == pytest.approx([5.0, 7.0, 9.0, 11.0, 13.0], abs=1e-9)
    assert got2[5] is None
