"""ljung_box vs a full-precision numpy re-derivation of the textbook
Box-Jenkins estimator (quantized partials cost ~1e-9 relative)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.stats import ljung_box


def _lb_numpy(y, h):
    y = np.asarray(y, dtype=float)
    n = len(y)
    d = y - y.mean()
    den = (d * d).sum()
    rho = np.array([(d[k:] * d[:-k]).sum() / den for k in range(1, h + 1)])
    q = n * (n + 2) * np.cumsum(rho**2 / (n - np.arange(1, h + 1)))
    return rho, q


def _frame(seed=21, n=400, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2023, 1, 1)
    rows = []
    for k in keys:
        # AR(1)-ish so the autocorrelation is real
        e = rng.normal(0, 1, n)
        v = np.empty(n)
        v[0] = e[0]
        for i in range(1, n):
            v[i] = 0.6 * v[i - 1] + e[i]
        rows += [(k, t0 + dt.timedelta(hours=i), float(round(v[i] + 50, 4)))
                 for i in range(n)]
    return pd.DataFrame(rows, columns=["key", "ts", "value"])


def test_ljung_box_matches_numpy(spark):
    pdf = _frame()
    out = (
        ljung_box(spark.createDataFrame(pdf), "value", 10, key_cols=["key"])
        .toPandas().sort_values(["key", "lag"]).reset_index(drop=True)
    )
    assert list(out.columns) == ["key", "lag", "rho", "q_stat"]
    for k, g in out.groupby("key"):
        y = pdf[pdf["key"] == k].sort_values("ts")["value"].to_numpy()
        rho, q = _lb_numpy(y, 10)
        np.testing.assert_allclose(g["rho"], rho, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(g["q_stat"], q, rtol=1e-5, atol=1e-6)
        # AR(1) data: Q must grow with h and be far from white noise
        assert g["q_stat"].is_monotonic_increasing
        assert g["q_stat"].iloc[0] > 50


def test_ljung_box_white_noise_small_q(spark):
    rng = np.random.default_rng(9)
    n = 500
    t0 = dt.datetime(2023, 1, 1)
    pdf = pd.DataFrame({
        "ts": [t0 + dt.timedelta(hours=i) for i in range(n)],
        "value": rng.normal(0, 1, n).round(4),
    })
    out = (
        ljung_box(spark.createDataFrame(pdf), "value", 5)
        .toPandas().sort_values("lag")
    )
    # white noise: Q(5) ~ chi2(5); far below the AR case
    assert out["q_stat"].iloc[-1] < 20


def test_ljung_box_partitioning_independent(spark):
    pdf = _frame(n=200)
    a = ljung_box(spark.createDataFrame(pdf), "value", 4, key_cols=["key"]).toPandas()
    b = ljung_box(spark.createDataFrame(pdf).repartition(17), "value", 4,
                  key_cols=["key"]).toPandas()
    m = a.merge(b, on=["key", "lag"], suffixes=("", "_b"))
    assert (m["rho"] == m["rho_b"]).all()
    assert (m["q_stat"] == m["q_stat_b"]).all()


def test_ljung_box_validates(spark):
    pdf = _frame(n=10)
    with pytest.raises(ValueError):
        ljung_box(spark.createDataFrame(pdf), "value", 0)


def test_ar2_yule_walker_matches_numpy(spark):
    from tstoolbox_spark.operators.stats import ar2_yule_walker

    pdf = _frame(seed=31, n=600)
    out = (
        ar2_yule_walker(spark.createDataFrame(pdf), "value", key_cols=["key"])
        .toPandas().sort_values("key").reset_index(drop=True)
    )
    for _, row in out.iterrows():
        y = pdf[pdf["key"] == row["key"]].sort_values("ts")["value"].to_numpy()
        rho, _ = _lb_numpy(y, 2)
        r1, r2 = rho
        disc = 1 - r1 * r1
        phi1 = r1 * (1 - r2) / disc
        phi2 = (r2 - r1 * r1) / disc
        d = y - y.mean()
        c0 = (d * d).sum() / len(y)
        sigma2 = c0 * (1 - phi1 * r1 - phi2 * r2)
        np.testing.assert_allclose(
            [row["rho1"], row["rho2"], row["phi1"], row["phi2"], row["sigma2"]],
            [r1, r2, phi1, phi2, sigma2], rtol=1e-5, atol=1e-6,
        )
        # AR(1) source with coef 0.6: phi1 near 0.6, phi2 near 0
        assert 0.4 < row["phi1"] < 0.8
        assert abs(row["phi2"]) < 0.2


def test_forecast_accuracy_matches_numpy(spark):
    from tstoolbox_spark.operators.stats import forecast_accuracy

    pdf = _frame(seed=41, n=300)
    rng = np.random.default_rng(42)
    pdf["pred"] = pdf["value"] + rng.normal(0, 2, len(pdf)).round(4)
    out = (
        forecast_accuracy(spark.createDataFrame(pdf), "value", "pred",
                          key_cols=["key"], season_length=24)
        .toPandas().set_index("key")
    )
    for k, g in pdf.groupby("key"):
        g = g.sort_values("ts")
        y, p = g["value"].to_numpy(), g["pred"].to_numpy()
        e = y - p
        mae = np.abs(e).mean()
        rmse = np.sqrt((e * e).mean())
        smape = 100 * (2 * np.abs(e) / (np.abs(y) + np.abs(p))).mean()
        naive = np.abs(y[24:] - y[:-24]).mean()
        row = out.loc[k]
        np.testing.assert_allclose(
            [row["mae"], row["rmse"], row["smape"], row["mase"]],
            [mae, rmse, smape, mae / naive], rtol=1e-5, atol=1e-6,
        )
        assert row["n"] == 300


def test_forecast_accuracy_validates_and_short(spark):
    import pytest as _pytest

    from tstoolbox_spark.operators.stats import forecast_accuracy

    pdf = _frame(seed=43, n=10)
    pdf["pred"] = pdf["value"]
    df = spark.createDataFrame(pdf)
    with _pytest.raises(ValueError):
        forecast_accuracy(df, "value", "pred", season_length=0)
    # m > n: every naive lag is null -> mase is null, others fine
    out = forecast_accuracy(df, "value", "pred", key_cols=["key"],
                            season_length=50).toPandas()
    assert out["mase"].isna().all()
    assert (out["mae"] == 0).all()
