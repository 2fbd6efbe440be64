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
