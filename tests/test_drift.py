"""Drift / stationarity diagnostics (operators/drift.py) vs
hand-rolled numpy references — PSI, two-sample KS, chi-square
homogeneity, Dickey-Fuller t-stat."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.drift import (
    adf_test,
    chi2_homogeneity,
    ks_2sample,
    psi,
    psi_buckets,
)

from .conftest import hourly, to_sdf


def _np_psi(a, b, lo, hi, nb, eps=1e-6):
    w = (hi - lo) / nb
    ba = np.clip(np.floor((np.asarray(a) - lo) / w), 0, nb - 1).astype(int)
    bb = np.clip(np.floor((np.asarray(b) - lo) / w), 0, nb - 1).astype(int)
    pa = np.maximum(np.bincount(ba, minlength=nb) / len(a), eps)
    pb = np.maximum(np.bincount(bb, minlength=nb) / len(b), eps)
    return float(np.sum((pb - pa) * np.log(pb / pa)))


def _np_ks(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    vs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), vs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), vs, side="right") / len(b)
    d = np.abs(fa - fb)
    i = int(np.argmax(d))  # first max = smallest value attaining D
    return float(d[i]), float(vs[i])


def _np_chi2(a_cats, b_cats):
    cats = sorted(set(a_cats) | set(b_cats))
    oa = np.array([a_cats.count(c) for c in cats], float)
    ob = np.array([b_cats.count(c) for c in cats], float)
    na, nb = oa.sum(), ob.sum()
    rowtot = oa + ob
    ea = rowtot * na / (na + nb)
    eb = rowtot * nb / (na + nb)
    return float((((oa - ea) ** 2) / ea + ((ob - eb) ** 2) / eb).sum()), len(cats) - 1


def _np_adf(x):
    x = np.asarray(x, float)
    z = x[:-1]
    y = np.diff(x)
    n = len(y)
    X = np.column_stack([np.ones(n), z])
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ coef
    sigma2 = (resid @ resid) / (n - 2)
    szz = ((z - z.mean()) ** 2).sum()
    se = np.sqrt(sigma2 / szz)
    return float(coef[1]), float(coef[1] / se), n


def _vals_frame(vals):
    return pd.DataFrame({"ts": hourly(len(vals)), "value": [float(v) for v in vals]})


def test_psi_matches_numpy(spark):
    rng = np.random.RandomState(7)
    a = rng.uniform(0, 100, 400)
    b = rng.uniform(20, 100, 300)  # shifted → nonzero psi
    ra = to_sdf(spark, _vals_frame(a))
    rb = to_sdf(spark, _vals_frame(b))
    got = psi(ra, rb, "value", 0.0, 100.0, 10).collect()[0]
    want = _np_psi(a, b, 0.0, 100.0, 10)
    assert got["n_ref"] == 400 and got["n_cur"] == 300
    assert got["psi"] == pytest.approx(want, rel=1e-9)
    # identical distributions → psi ~ 0
    same = psi(ra, ra, "value", 0.0, 100.0, 10).collect()[0]
    assert abs(same["psi"]) < 1e-9


def test_psi_buckets_detail_and_empty_buckets(spark):
    a = [5.0, 15.0, 25.0]  # buckets 0,1,2
    b = [5.0, 5.0, 95.0]  # buckets 0,0,9
    ra, rb = to_sdf(spark, _vals_frame(a)), to_sdf(spark, _vals_frame(b))
    rows = psi_buckets(ra, rb, "value", 0.0, 100.0, 10).orderBy("bucket").collect()
    assert [r["bucket"] for r in rows] == list(range(10))  # full spine
    assert rows[0]["cnt_ref"] == 1 and rows[0]["cnt_cur"] == 2
    assert rows[9]["cnt_ref"] == 0 and rows[9]["cnt_cur"] == 1
    # empty-in-ref bucket uses the eps floor, finite term
    assert np.isfinite(rows[9]["psi_term"]) and rows[9]["psi_term"] > 0


def test_ks_2sample_matches_numpy(spark):
    rng = np.random.RandomState(11)
    a = np.round(rng.normal(50, 10, 500), 2)
    b = np.round(rng.normal(55, 12, 400), 2)  # ties guaranteed by rounding
    got = ks_2sample(
        to_sdf(spark, _vals_frame(a)), to_sdf(spark, _vals_frame(b)), "value"
    ).collect()[0]
    want_d, want_at = _np_ks(a, b)
    assert got["n_ref"] == 500 and got["n_cur"] == 400
    assert got["d_stat"] == pytest.approx(want_d, abs=1e-11)
    assert got["at_value"] == pytest.approx(want_at)
    # identical samples → D = 0
    same = ks_2sample(
        to_sdf(spark, _vals_frame(a)), to_sdf(spark, _vals_frame(a)), "value"
    ).collect()[0]
    assert same["d_stat"] == 0.0


def test_ks_keyed(spark):
    rng = np.random.RandomState(3)
    pa = _vals_frame(rng.uniform(0, 1, 200))
    pb = _vals_frame(rng.uniform(0.3, 1.3, 200))
    pa["k"], pb["k"] = "x", "x"
    pa2, pb2 = pa.copy(), pa.copy()
    pa2["k"], pb2["k"] = "y", "y"  # key y: identical → D=0
    ra = to_sdf(spark, pd.concat([pa, pa2], ignore_index=True))
    rb = to_sdf(spark, pd.concat([pb, pb2], ignore_index=True))
    rows = {r["k"]: r for r in ks_2sample(ra, rb, "value", ["k"]).collect()}
    want_d, _ = _np_ks(pa["value"], pb["value"])
    assert rows["x"]["d_stat"] == pytest.approx(want_d, abs=1e-11)
    assert rows["y"]["d_stat"] == 0.0


def test_chi2_matches_numpy(spark):
    a = ["click"] * 50 + ["view"] * 30 + ["error"] * 20
    b = ["click"] * 30 + ["view"] * 45 + ["error"] * 25
    t0 = dt.datetime(2024, 1, 1)
    fa = pd.DataFrame({"ts": hourly(len(a)), "cat": a})
    fb = pd.DataFrame({"ts": hourly(len(b)), "cat": b})
    got = chi2_homogeneity(to_sdf(spark, fa), to_sdf(spark, fb), "cat").collect()[0]
    want, dof = _np_chi2(a, b)
    assert got["dof"] == dof
    assert got["n_ref"] == 100 and got["n_cur"] == 100
    assert got["chi2"] == pytest.approx(want, abs=1e-8)


def test_adf_matches_numpy_ols(spark):
    rng = np.random.RandomState(5)
    # stationary AR(1): strongly negative t expected
    x = [0.0]
    for _ in range(299):
        x.append(0.5 * x[-1] + rng.normal())
    got = adf_test(to_sdf(spark, _vals_frame(x)), "value").collect()[0]
    beta, t, n = _np_adf(x)
    assert got["n"] == n
    assert got["beta"] == pytest.approx(beta, abs=2e-6)
    assert got["t_stat"] == pytest.approx(t, abs=2e-6)
    assert got["t_stat"] < -5  # clearly rejects the unit root

    # random walk: t near 0 territory (fails to reject)
    rw = np.cumsum(rng.normal(size=300))
    got2 = adf_test(to_sdf(spark, _vals_frame(rw)), "value").collect()[0]
    _, t2, _ = _np_adf(rw)
    assert got2["t_stat"] == pytest.approx(t2, abs=2e-6)


def test_adf_keyed(spark):
    rng = np.random.RandomState(9)
    f1 = _vals_frame(rng.normal(size=120))
    f2 = _vals_frame(np.cumsum(rng.normal(size=120)))
    f1["k"], f2["k"] = "stat", "walk"
    df = to_sdf(spark, pd.concat([f1, f2], ignore_index=True))
    rows = {r["k"]: r for r in adf_test(df, "value", key_cols=["k"]).collect()}
    b1, t1, _ = _np_adf(f1["value"])
    b2, t2, _ = _np_adf(f2["value"])
    assert rows["stat"]["t_stat"] == pytest.approx(t1, abs=2e-6)
    assert rows["walk"]["t_stat"] == pytest.approx(t2, abs=2e-6)


def _np_granger(x, y):
    w = np.asarray(y, float)[1:]
    u = np.asarray(y, float)[:-1]
    v = np.asarray(x, float)[:-1]
    n = len(w)
    Xr = np.column_stack([np.ones(n), u])
    Xu = np.column_stack([np.ones(n), u, v])
    br, *_ = np.linalg.lstsq(Xr, w, rcond=None)
    bu, *_ = np.linalg.lstsq(Xu, w, rcond=None)
    rss_r = float(((w - Xr @ br) ** 2).sum())
    rss_u = float(((w - Xu @ bu) ** 2).sum())
    return float(bu[2]), rss_r, rss_u, (rss_r - rss_u) / (rss_u / (n - 3)), n


def test_granger_matches_numpy_and_detects_causality(spark):
    from tstoolbox_spark.operators.stats import granger_causality

    rng = np.random.RandomState(21)
    # y driven by lagged x → x Granger-causes y
    x = rng.normal(size=240)
    y = np.zeros(240)
    for t in range(1, 240):
        y[t] = 0.3 * y[t - 1] + 0.8 * x[t - 1] + 0.2 * rng.normal()
    pdf = _vals_frame(y).rename(columns={"value": "y"})
    pdf["x"] = x
    got = granger_causality(to_sdf(spark, pdf), "x", "y").collect()[0]
    coef, _, _, f, n = _np_granger(x, y)
    assert got["n"] == n
    assert got["coef_x"] == pytest.approx(coef, abs=2e-6)
    assert got["f_stat"] == pytest.approx(f, rel=1e-4)
    assert got["f_stat"] > 50  # strong causality detected

    # independent series → parity with numpy, small F
    y2 = rng.normal(size=240)
    pdf2 = _vals_frame(y2).rename(columns={"value": "y"})
    pdf2["x"] = rng.normal(size=240)
    got2 = granger_causality(to_sdf(spark, pdf2), "x", "y").collect()[0]
    _, _, _, f2, _ = _np_granger(pdf2["x"], y2)
    assert got2["f_stat"] == pytest.approx(f2, rel=1e-3, abs=1e-4)


def test_granger_keyed(spark):
    from tstoolbox_spark.operators.stats import granger_causality

    rng = np.random.RandomState(2)
    frames = {}
    for k in ("a", "b"):
        x = rng.normal(size=150)
        y = np.zeros(150)
        gain = 0.9 if k == "a" else 0.0
        for t in range(1, 150):
            y[t] = 0.2 * y[t - 1] + gain * x[t - 1] + 0.5 * rng.normal()
        f = _vals_frame(y).rename(columns={"value": "y"})
        f["x"], f["k"] = x, k
        frames[k] = f
    df = to_sdf(spark, pd.concat(frames.values(), ignore_index=True))
    from tstoolbox_spark.operators.stats import granger_causality as gc
    rows = {r["k"]: r for r in gc(df, "x", "y", key_cols=["k"]).collect()}
    for k, f in frames.items():
        _, _, _, want_f, _ = _np_granger(f["x"], f["y"])
        assert rows[k]["f_stat"] == pytest.approx(want_f, rel=1e-3, abs=1e-4)
    assert rows["a"]["f_stat"] > 100 and rows["b"]["f_stat"] < 10


def _np_mk(t, v):
    t = np.asarray(t)
    v = np.asarray(v, float)
    n = len(v)
    s = 0
    for i in range(n):
        for j in range(n):
            if t[i] < t[j]:
                s += int(np.sign(v[j] - v[i]))
    _, counts = np.unique(v, return_counts=True)
    ties = float((counts * (counts - 1) * (2 * counts + 5)).sum())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    z = 0.0 if s == 0 or var <= 0 else (s - np.sign(s)) / np.sqrt(var)
    return s, var, float(z), n


def test_mann_kendall_matches_numpy_with_ties(spark):
    from tstoolbox_spark.operators.drift import mann_kendall

    rng = np.random.RandomState(11)
    # rounded to 1 dp → plenty of value ties exercising the correction
    v = np.round(rng.normal(size=300) + np.linspace(0, 2, 300), 1)
    got = mann_kendall(
        to_sdf(spark, _vals_frame(v)), "value", n_buckets=7
    ).collect()[0]
    s, var, z, n = _np_mk(range(300), v)
    assert got["n"] == n and got["s_stat"] == s
    assert got["var_s"] == pytest.approx(var, rel=1e-9)
    assert got["z_stat"] == pytest.approx(z, abs=2e-6)
    assert got["z_stat"] > 1.96  # upward trend detected


def test_mann_kendall_bucket_invariance_and_keys(spark):
    from tstoolbox_spark.operators.drift import mann_kendall

    rng = np.random.RandomState(3)
    frames = []
    for k, drift in (("up", 0.02), ("flat", 0.0)):
        f = _vals_frame(rng.normal(size=200) + drift * np.arange(200))
        f["k"] = k
        frames.append(f)
    df = to_sdf(spark, pd.concat(frames, ignore_index=True))
    r1 = {r["k"]: r for r in mann_kendall(df, "value", key_cols=["k"], n_buckets=1).collect()}
    r9 = {r["k"]: r for r in mann_kendall(df, "value", key_cols=["k"], n_buckets=9).collect()}
    for k, f in zip(("up", "flat"), frames):
        s, var, z, n = _np_mk(range(200), f["value"])
        for res in (r1, r9):
            assert res[k]["s_stat"] == s and res[k]["n"] == n
            assert res[k]["z_stat"] == pytest.approx(z, abs=2e-6)
    # "flat" is pure noise: its |z| happens to land at 2.58 for this
    # seed — the point is the ordering, not a significance cutoff
    assert r9["up"]["z_stat"] > 5.0 > abs(r9["flat"]["z_stat"])


def test_mann_kendall_duplicate_timestamps_excluded(spark):
    from tstoolbox_spark.operators.drift import mann_kendall

    ts = hourly(6)
    # two observations share each timestamp → those pairs excluded
    pdf = pd.DataFrame(
        {"ts": list(ts[:3]) * 2, "value": [1.0, 2.0, 3.0, 4.0, 0.5, 2.5]}
    )
    got = mann_kendall(to_sdf(spark, pdf), "value", n_buckets=4).collect()[0]
    t = [0, 1, 2, 0, 1, 2]
    s, _, _, _ = _np_mk(t, pdf["value"])
    assert got["s_stat"] == s


def test_mann_kendall_bucket_guard(spark):
    from tstoolbox_spark.operators.drift import mann_kendall

    df = to_sdf(spark, _vals_frame(np.arange(50.0)))
    with pytest.raises(Exception, match="raise n_buckets"):
        mann_kendall(df, "value", n_buckets=1, max_bucket_rows=10).collect()


def _np_eg(x, y):
    x, y = np.asarray(x, float), np.asarray(y, float)
    n = len(x)
    b = ((x * y).sum() * n - x.sum() * y.sum()) / (
        (x * x).sum() * n - x.sum() ** 2
    )
    a = (y.sum() - b * x.sum()) / n
    e = y - a - b * x
    z, d = e[:-1], np.diff(e)
    beta = (z * d).sum() / (z * z).sum()
    rss = (d * d).sum() - beta * (z * d).sum()
    se = np.sqrt(rss / (len(z) - 1) / (z * z).sum())
    return b, a, beta, float(beta / se)


def test_engle_granger_cointegrated_pair(spark):
    from tstoolbox_spark.operators.drift import engle_granger

    rng = np.random.RandomState(5)
    x = np.cumsum(rng.normal(size=400))  # random walk
    y = 2.0 * x + 1.0 + rng.normal(scale=0.5, size=400)  # cointegrated
    pdf = _vals_frame(y).rename(columns={"value": "y"})
    pdf["x"] = x
    got = engle_granger(to_sdf(spark, pdf), "x", "y").collect()[0]
    b, a, beta, t = _np_eg(x, y)
    assert got["n"] == 400
    assert got["slope"] == pytest.approx(b, abs=2e-6)
    assert got["intercept"] == pytest.approx(a, abs=2e-6)
    assert got["adf_t"] == pytest.approx(t, abs=2e-5)
    assert got["adf_t"] < -3.34  # rejects no-cointegration at 5%

    # independent random walks → fails to reject
    y2 = np.cumsum(rng.normal(size=400))
    pdf2 = _vals_frame(y2).rename(columns={"value": "y"})
    pdf2["x"] = np.cumsum(rng.normal(size=400))
    got2 = engle_granger(to_sdf(spark, pdf2), "x", "y").collect()[0]
    _, _, _, t2 = _np_eg(pdf2["x"], y2)
    assert got2["adf_t"] == pytest.approx(t2, abs=2e-5)
    assert got2["adf_t"] > -3.34


def test_engle_granger_keyed(spark):
    from tstoolbox_spark.operators.drift import engle_granger

    rng = np.random.RandomState(9)
    frames = []
    for k, noise in (("tight", 0.2), ("loose", 5.0)):
        x = np.cumsum(rng.normal(size=250))
        y = 0.5 * x - 2.0 + rng.normal(scale=noise, size=250)
        f = _vals_frame(y).rename(columns={"value": "y"})
        f["x"], f["k"] = x, k
        frames.append((k, f))
    df = to_sdf(spark, pd.concat([f for _, f in frames], ignore_index=True))
    rows = {
        r["k"]: r
        for r in engle_granger(df, "x", "y", key_cols=["k"]).collect()
    }
    for k, f in frames:
        b, a, beta, t = _np_eg(f["x"], f["y"])
        assert rows[k]["slope"] == pytest.approx(b, abs=2e-6)
        assert rows[k]["adf_t"] == pytest.approx(t, abs=2e-5)
