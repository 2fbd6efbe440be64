"""affine_scan (distributed linear-recurrence) + Holt smoothing.

affine_scan oracle: literal numpy sequential scan. Holt oracle: an
independent numpy re-derivation of the FPP §8.2 recurrences. The
distributed path is checked against the exact path at tight rtol (FP
recomposition across partition boundaries is the only divergence).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.scan import affine_scan, holt


def _series(seed=4, n=600, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2022, 1, 1)
    rows = []
    for k in keys:
        vals = np.cumsum(rng.normal(0.3, 1.0, n)) + 50
        for i in range(n):
            rows.append((k, t0 + dt.timedelta(hours=i), float(round(vals[i], 3))))
    return pd.DataFrame(rows, columns=["key", "ts", "value"])


def _holt_numpy(y, a, b):
    lvl, trd, fit = [float(y[0])], [0.0], [float(y[0])]
    for t in range(1, len(y)):
        fit.append(lvl[-1] + trd[-1])
        l_new = a * float(y[t]) + (1 - a) * (lvl[-1] + trd[-1])
        trd.append(b * (l_new - lvl[-1]) + (1 - b) * trd[-1])
        lvl.append(l_new)
    return np.array(lvl), np.array(trd), np.array(fit)


def test_holt_exact_matches_numpy(spark):
    pdf = _series()
    out = (
        holt(spark.createDataFrame(pdf), 0.4, 0.1, key_cols=["key"])
        .toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    for k, g in out.groupby("key"):
        y = pdf[pdf["key"] == k].sort_values("ts")["value"].to_numpy()
        lvl, trd, fit = _holt_numpy(y, 0.4, 0.1)
        np.testing.assert_allclose(g["level"], lvl, rtol=1e-12)
        np.testing.assert_allclose(g["trend"], trd, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(g["fitted"], fit, rtol=1e-12)


def test_holt_fitted_is_one_step_ahead(spark):
    out = (
        holt(spark.createDataFrame(_series(n=100)), 0.5, 0.2, key_cols=["key"])
        .toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    for _, g in out.groupby("key"):
        g = g.reset_index(drop=True)
        pred = (g["level"] + g["trend"]).shift(1).iloc[1:]
        np.testing.assert_allclose(g["fitted"].iloc[1:], pred, rtol=1e-12)


def test_affine_scan_matches_sequential(spark):
    rng = np.random.default_rng(7)
    A = [[0.9, 0.05], [-0.1, 0.8]]
    pdf = _series(n=500)
    pdf["u0"] = rng.normal(size=len(pdf))
    pdf["u1"] = rng.normal(size=len(pdf))
    got = (
        affine_scan(
            spark.createDataFrame(pdf), ["u0", "u1"], A,
            key_cols=["key"], order_cols=["ts"], num_partitions=8,
        )
        .toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    An = np.array(A)
    for k, g in got.groupby("key"):
        src = pdf[pdf["key"] == k].sort_values("ts")
        s = np.zeros(2)
        exp = []
        for u in src[["u0", "u1"]].to_numpy():
            s = An @ s + u
            exp.append(s.copy())
        exp = np.array(exp)
        np.testing.assert_allclose(g[["s0", "s1"]].to_numpy(), exp, rtol=1e-9,
                                   atol=1e-9)


def test_holt_scan_path_matches_exact(spark):
    pdf = _series(n=800, keys=("a",))
    df = spark.createDataFrame(pdf)
    e = (holt(df, 0.3, 0.15, key_cols=["key"])
         .toPandas().sort_values("ts").reset_index(drop=True))
    d = (holt(df, 0.3, 0.15, key_cols=["key"], exact=False, num_partitions=8)
         .toPandas().sort_values("ts").reset_index(drop=True))
    np.testing.assert_allclose(d["level"], e["level"], rtol=1e-10)
    np.testing.assert_allclose(d["trend"], e["trend"], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(d["fitted"], e["fitted"], rtol=1e-10)


def test_holt_validates_params(spark):
    df = spark.createDataFrame(_series(n=10))
    with pytest.raises(ValueError):
        holt(df, 1.5, 0.1)
    with pytest.raises(ValueError):
        affine_scan(df, ["value"], [[1.0, 0.0], [0.0, 1.0]])
