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

from tstoolbox_spark.operators.scan import (
    affine_scan,
    holt,
    holt_forecast,
    holt_winters,
)


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


def _hw_numpy(y, a, b_, g_, m):
    y6 = np.floor(np.asarray(y) * 1e6 + 0.5).astype(np.int64)
    l = float(int(y6[:m].sum())) / m / 1e6
    b = (float(int(y6[m : 2 * m].sum())) / m / 1e6 - l) / m
    s = [y[j] - l for j in range(m)]
    lvl, trd, sea, fit = [], [], [], []
    for t in range(len(y)):
        s_old = s[0]
        fit.append(l + b + s_old)
        l_new = a * (y[t] - s_old) + (1 - a) * (l + b)
        b = b_ * (l_new - l) + (1 - b_) * b
        s_new = g_ * (y[t] - l_new) + (1 - g_) * s_old
        l = l_new
        s = s[1:] + [s_new]
        lvl.append(l); trd.append(b); sea.append(s_new)
    return map(np.array, (lvl, trd, sea, fit))


def test_holt_winters_matches_numpy(spark):
    rng = np.random.default_rng(11)
    t0 = dt.datetime(2022, 1, 1)
    rows = []
    for k in ("a", "b"):
        n = 200
        season = 10 * np.sin(2 * np.pi * np.arange(n) / 24)
        vals = 50 + 0.05 * np.arange(n) + season + rng.normal(0, 0.5, n)
        rows += [(k, t0 + dt.timedelta(hours=i), float(round(vals[i], 3)))
                 for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    out = (
        holt_winters(spark.createDataFrame(pdf), 0.3, 0.1, 0.2, 24,
                     key_cols=["key"])
        .toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    for k, g in out.groupby("key"):
        y = pdf[pdf["key"] == k].sort_values("ts")["value"].to_numpy()
        lvl, trd, sea, fit = _hw_numpy(list(y), 0.3, 0.1, 0.2, 24)
        np.testing.assert_allclose(g["level"], lvl, rtol=1e-12)
        np.testing.assert_allclose(g["trend"], trd, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(g["seasonal"], sea, rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(g["fitted"], fit, rtol=1e-12)


def test_holt_winters_drops_short_keys(spark):
    pdf = _series(n=100, keys=("long",))
    short = _series(n=30, keys=("short",))
    df = spark.createDataFrame(pd.concat([pdf, short]))
    out = holt_winters(df, 0.3, 0.1, 0.2, 24, key_cols=["key"]).toPandas()
    assert set(out["key"]) == {"long"}
    assert len(out) == 100


def test_holt_forecast_linear_extrapolation(spark):
    pdf = _series(n=120)
    df = spark.createDataFrame(pdf)
    sm = (
        holt(df, 0.4, 0.1, key_cols=["key"])
        .toPandas().sort_values(["key", "ts"])
    )
    fc = (
        holt_forecast(df, 0.4, 0.1, horizon=6, step_seconds=3600,
                      key_cols=["key"])
        .toPandas().sort_values(["key", "h"]).reset_index(drop=True)
    )
    assert len(fc) == 2 * 6
    for k, g in fc.groupby("key"):
        last = sm[sm["key"] == k].iloc[-1]
        exp = last["level"] + g["h"].to_numpy() * last["trend"]
        np.testing.assert_allclose(g["yhat"], exp, rtol=1e-12)
        ts = pd.to_datetime(g["ts"])
        assert (ts.diff().iloc[1:] == pd.Timedelta(hours=1)).all()
        assert ts.iloc[0] == sm[sm["key"] == k]["ts"].max() + pd.Timedelta(hours=1)


def test_holt_validates_params(spark):
    df = spark.createDataFrame(_series(n=10))
    with pytest.raises(ValueError):
        holt(df, 1.5, 0.1)
    with pytest.raises(ValueError):
        affine_scan(df, ["value"], [[1.0, 0.0], [0.0, 1.0]])


def test_holt_winters_forecast_with_seasonal_wrap(spark):
    from tstoolbox_spark.operators.scan import holt_winters_forecast

    rng = np.random.default_rng(13)
    t0 = dt.datetime(2022, 1, 1)
    n, m = 150, 24
    rows = []
    for k in ("a", "b"):
        season = 8 * np.sin(2 * np.pi * np.arange(n) / m)
        vals = 40 + 0.1 * np.arange(n) + season + rng.normal(0, 0.4, n)
        rows += [(k, t0 + dt.timedelta(hours=i), float(round(vals[i], 3)))
                 for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    fc = (
        holt_winters_forecast(spark.createDataFrame(pdf), 0.3, 0.1, 0.2, m,
                              horizon=36, step_seconds=3600, key_cols=["key"])
        .toPandas().sort_values(["key", "h"]).reset_index(drop=True)
    )
    assert len(fc) == 2 * 36
    for k, g in fc.groupby("key"):
        y = pdf[pdf["key"] == k].sort_values("ts")["value"].to_list()
        # replay the recurrence to get the final state + queue
        y6 = np.floor(np.asarray(y) * 1e6 + 0.5).astype(np.int64)
        l = float(int(y6[:m].sum())) / m / 1e6
        b = (float(int(y6[m:2 * m].sum())) / m / 1e6 - l) / m
        s = [y[j] - l for j in range(m)]
        for t in range(n):
            s_old = s[0]
            l_new = 0.3 * (y[t] - s_old) + 0.7 * (l + b)
            b = 0.1 * (l_new - l) + 0.9 * b
            s = s[1:] + [0.2 * (y[t] - l_new) + 0.8 * s_old]
            l = l_new
        exp = [l + h * b + s[(h - 1) % m] for h in range(1, 37)]
        np.testing.assert_allclose(g["yhat"], exp, rtol=1e-10)
        ts = pd.to_datetime(g["ts"])
        assert ts.iloc[0] == t0 + dt.timedelta(hours=n)
        assert (ts.diff().iloc[1:] == pd.Timedelta(hours=1)).all()


def test_holt_winters_multiplicative_matches_numpy(spark):
    rng = np.random.default_rng(17)
    t0 = dt.datetime(2022, 1, 1)
    n, m = 180, 24
    rows = []
    for k in ("a", "b"):
        season = 1.0 + 0.3 * np.sin(2 * np.pi * np.arange(n) / m)
        vals = (30 + 0.2 * np.arange(n)) * season + rng.normal(0, 0.3, n)
        rows += [(k, t0 + dt.timedelta(hours=i), float(round(vals[i], 3)))
                 for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    out = (
        holt_winters(spark.createDataFrame(pdf), 0.3, 0.1, 0.2, m,
                     key_cols=["key"], multiplicative=True)
        .toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    for k, g in out.groupby("key"):
        y = pdf[pdf["key"] == k].sort_values("ts")["value"].to_list()
        y6 = np.floor(np.asarray(y) * 1e6 + 0.5).astype(np.int64)
        l = float(int(y6[:m].sum())) / m / 1e6
        b = (float(int(y6[m:2 * m].sum())) / m / 1e6 - l) / m
        s = [y[j] / l for j in range(m)]
        lvl, trd, sea, fit = [], [], [], []
        for t in range(n):
            s_old = s[0]
            fit.append((l + b) * s_old)
            l_new = 0.3 * (y[t] / s_old) + 0.7 * (l + b)
            b = 0.1 * (l_new - l) + 0.9 * b
            s_new = 0.2 * (y[t] / l_new) + 0.8 * s_old
            l = l_new
            s = s[1:] + [s_new]
            lvl.append(l); trd.append(b); sea.append(s_new)
        np.testing.assert_allclose(g["level"], lvl, rtol=1e-12)
        np.testing.assert_allclose(g["trend"], trd, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(g["seasonal"], sea, rtol=1e-10)
        np.testing.assert_allclose(g["fitted"], fit, rtol=1e-12)
        # multiplicative seasonal factors hover around 1
        assert 0.5 < g["seasonal"].mean() < 1.5


def _kalman_numpy(y, q, r):
    m, p = float(y[0]), r
    lvl, pv, kn = [m], [p], [1.0]
    for t in range(1, len(y)):
        p_pred = p + q
        k = p_pred / (p_pred + r)
        m = m + k * (float(y[t]) - m)
        p = (1.0 - k) * p_pred
        lvl.append(m); pv.append(p); kn.append(k)
    return np.array(lvl), np.array(pv), np.array(kn)


def test_kalman_level_matches_numpy_and_tracks(spark):
    from tstoolbox_spark.operators.scan import kalman_level

    pdf = _series(seed=8, n=400, keys=("a",)).drop(columns=["key"])
    sdf = spark.createDataFrame(pdf)
    out = (
        kalman_level(sdf, q=0.5, r=4.0)
        .orderBy("ts")
        .toPandas()
    )
    lvl, pv, kn = _kalman_numpy(pdf["value"].to_numpy(), 0.5, 4.0)
    assert np.allclose(out["level"], lvl, rtol=0, atol=0)  # bit-equal
    assert np.allclose(out["p_var"], pv, rtol=0, atol=0)
    assert np.allclose(out["gain"], kn, rtol=0, atol=0)
    # gain converges to the closed-form steady state
    p_inf = (0.5 + np.sqrt(0.25 + 4 * 0.5 * 4.0)) / 2
    k_inf = p_inf / (p_inf + 4.0)
    assert abs(out["gain"].iloc[-1] - k_inf) < 1e-12
    # the filtered level tracks the random walk: residual variance of
    # (level - value) well below raw noise scale
    assert np.std(out["level"].to_numpy() - pdf["value"].to_numpy()) < 4.0


def test_kalman_level_keyed_and_validates(spark):
    from tstoolbox_spark.operators.scan import kalman_level

    pdf = _series(seed=2, n=150)
    sdf = spark.createDataFrame(pdf)
    rows = kalman_level(sdf, q=1.0, r=2.0, key_cols=["key"]).toPandas()
    for k, g in pdf.groupby("key"):
        got = rows[rows["key"] == k].sort_values("ts")
        lvl, _, _ = _kalman_numpy(g.sort_values("ts")["value"].to_numpy(), 1.0, 2.0)
        assert np.allclose(got["level"].to_numpy(), lvl, rtol=0, atol=0)
    with pytest.raises(ValueError, match="need q > 0"):
        kalman_level(sdf, q=0.0, r=1.0)
