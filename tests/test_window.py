"""rolling/expanding/ewm/lag/pct_change/rank parity vs pandas (the
reference verbs dispatch straight to pandas —
functions/rolling_window.py:283-294, expanding_window.py:171-180,
ewm_window.py:222-230, lag.py:134, pct_change.py:152-154,
rank.py:190-195 — so pandas is the oracle, as in the reference's own
tests/test_rolling_window.py:17-60).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.window import (
    ewm_window,
    expanding_window,
    lag,
    pct_change,
    rank,
    rolling_window,
)

from .conftest import to_sdf


@pytest.mark.parametrize("stat", ["sum", "mean", "min", "max", "std", "var", "median", "count"])
def test_rolling_row_window(spark, twocol_pdf, stat):
    got = (
        rolling_window(to_sdf(spark, twocol_pdf), stat, window=5, value_cols=["a"])
        .orderBy("ts")
        .toPandas()[f"a_rolling_5_{stat}"]
    )
    exp = getattr(twocol_pdf["a"].rolling(5), stat)()
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_rolling_reference_headline(spark):
    """Reference oracle: 2-row series 4.5/4.6, window 2 → sum 9.1,
    mean 4.55, first row NaN (tests/test_rolling_window.py:17-53)."""
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2000-01-01", "2000-01-02"]), "value": [4.5, 4.6]}
    )
    out = (
        rolling_window(to_sdf(spark, pdf), ["sum", "mean"], window=2)
        .orderBy("ts")
        .toPandas()
    )
    assert np.isnan(out.loc[0, "value_rolling_2_sum"])
    assert np.isclose(out.loc[1, "value_rolling_2_sum"], 9.1)
    assert np.isclose(out.loc[1, "value_rolling_2_mean"], 4.55)


def test_rolling_center_and_min_periods(spark, twocol_pdf):
    got = (
        rolling_window(
            to_sdf(spark, twocol_pdf), "mean", window=4, value_cols=["a"],
            center=True, min_periods=2,
        )
        .orderBy("ts")
        .toPandas()["a_rolling_4_mean"]
    )
    exp = twocol_pdf["a"].rolling(4, center=True, min_periods=2).mean()
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_rolling_time_window(spark, missing_pdf):
    got = (
        rolling_window(to_sdf(spark, missing_pdf), "sum", window="3H")
        .orderBy("ts")
        .toPandas()["value_rolling_3H_sum"]
    )
    exp = (
        missing_pdf.set_index("ts")["value"].rolling("3h").sum().reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got, exp, check_names=False)


@pytest.mark.parametrize("stat", ["sum", "mean", "std"])
def test_expanding(spark, twocol_pdf, stat):
    got = (
        expanding_window(to_sdf(spark, twocol_pdf), stat, value_cols=["a"], min_periods=3)
        .orderBy("ts")
        .toPandas()[f"a_expanding_{stat}"]
    )
    exp = getattr(twocol_pdf["a"].expanding(min_periods=3), stat)()
    pd.testing.assert_series_equal(got, exp, check_names=False)


@pytest.mark.parametrize("kw", [{"span": 5}, {"com": 2.0}, {"alpha": 0.3}])
def test_ewm(spark, twocol_pdf, kw):
    got = (
        ewm_window(to_sdf(spark, twocol_pdf), "mean", value_cols=["a"], **kw)
        .orderBy("ts")
        .toPandas()["a_ewm_mean"]
    )
    exp = twocol_pdf["a"].ewm(**kw).mean()
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_lag_and_lead(spark, twocol_pdf):
    out = lag(to_sdf(spark, twocol_pdf), [1, 3], value_cols=["a"]).orderBy("ts").toPandas()
    pd.testing.assert_series_equal(
        out["a_1"], twocol_pdf["a"].shift(1), check_names=False
    )
    pd.testing.assert_series_equal(
        out["a_3"], twocol_pdf["a"].shift(3), check_names=False
    )


def test_pct_change(spark, missing_pdf):
    got = (
        pct_change(to_sdf(spark, missing_pdf), periods=1)
        .orderBy("ts")
        .toPandas()["value_pct_change"]
    )
    exp = missing_pdf["value"].ffill().pct_change(periods=1)
    # pandas leaves leading NaN; engine identical
    pd.testing.assert_series_equal(got, exp, check_names=False)


@pytest.mark.parametrize("method", ["average", "min", "max", "dense", "first"])
def test_rank(spark, twocol_pdf, method):
    pdf = twocol_pdf.copy()
    pdf.loc[5, "a"] = pdf.loc[10, "a"]  # force a tie
    pdf.loc[7, "a"] = np.nan
    got = (
        rank(to_sdf(spark, pdf), method=method, value_cols=["a"])
        .orderBy("ts")
        .toPandas()["a_rank"]
    )
    exp = pdf["a"].rank(method=method)
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_rank_pct(spark, twocol_pdf):
    got = (
        rank(to_sdf(spark, twocol_pdf), method="average", value_cols=["a"], pct=True)
        .orderBy("ts")
        .toPandas()["a_rank"]
    )
    exp = twocol_pdf["a"].rank(pct=True)
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_rolling_per_key_partitioning(spark):
    """Window ops must stay within each series key."""
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 5,
            "ts": list(pd.date_range("2020-01-01", periods=5, freq="D")) * 2,
            "value": [1.0, 2, 3, 4, 5, 10, 20, 30, 40, 50],
        }
    )
    out = (
        rolling_window(to_sdf(spark, pdf), "sum", window=2, key_cols=["k"])
        .orderBy("k", "ts")
        .toPandas()
    )
    exp = pdf.groupby("k")["value"].rolling(2).sum().reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["value_rolling_2_sum"], exp, check_names=False
    )


def test_rolling_corr_cov_match_pandas(spark):
    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.window import rolling_corr

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=60, freq="h"),
            "a": rng.normal(10, 3, 60).round(2),
            "b": rng.normal(5, 2, 60).round(2),
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        rolling_corr(sdf, "a", "b", window=12)
        .orderBy("ts")
        .toPandas()["a_b_rolling_12_corr"]
        .to_numpy()
    )
    want = pdf["a"].rolling(12).corr(pdf["b"]).to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)

    got_cov = (
        rolling_corr(sdf, "a", "b", window=12, stat="cov")
        .orderBy("ts")
        .toPandas()["a_b_rolling_12_cov"]
        .to_numpy()
    )
    want_cov = pdf["a"].rolling(12).cov(pdf["b"]).to_numpy()
    np.testing.assert_allclose(got_cov, want_cov, rtol=1e-9, equal_nan=True)


def test_ewm_pairwise_corr_cov(spark, twocol_pdf):
    from tstoolbox_spark.operators.window import ewm_pairwise

    sdf = to_sdf(spark, twocol_pdf)
    out_c = ewm_pairwise(sdf, "a", "b", "corr", span=10).toPandas().sort_values("ts")
    out_v = ewm_pairwise(sdf, "a", "b", "cov", span=10).toPandas().sort_values("ts")
    exp_c = twocol_pdf.sort_values("ts")["a"].ewm(span=10).corr(
        twocol_pdf.sort_values("ts")["b"]
    )
    exp_v = twocol_pdf.sort_values("ts")["a"].ewm(span=10).cov(
        twocol_pdf.sort_values("ts")["b"]
    )
    np.testing.assert_allclose(
        out_c["a_b_ewm_corr"].to_numpy()[1:], exp_c.to_numpy()[1:], rtol=1e-12
    )
    np.testing.assert_allclose(
        out_v["a_b_ewm_cov"].to_numpy()[1:], exp_v.to_numpy()[1:], rtol=1e-12
    )


def test_rolling_mad_outliers(spark):
    """Centered rolling median/MAD vs a numpy oracle; a spike inside a
    calm stretch flags, the calm rows do not, edges stay null."""
    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.window import rolling_mad_outliers

    vals = np.sin(np.arange(60) / 5.0) * 2.0
    vals[30] += 50.0  # spike
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=60, freq="h"),
         "value": vals}
    )
    out = (rolling_mad_outliers(
        spark.createDataFrame(pdf), "value", window=11, k=3.0)
        .orderBy("ts").toPandas())
    assert out["med"].isna().sum() == 10  # 5 rows each edge
    for i in range(5, 55):
        frame = np.sort(vals[i - 5: i + 6])
        med = frame[5]
        mad = np.sort(np.abs(vals[i - 5: i + 6] - med))[5]
        assert out["med"][i] == med
        assert out["mad"][i] == mad
        exp = bool(abs(vals[i] - med) > 3.0 * mad)
        assert bool(out["is_outlier"][i]) == exp
    assert bool(out["is_outlier"][30])
    assert not out["is_outlier"][5:25].any()


def test_cusum_changepoints_matches_recursion(spark):
    """The window-expression CUSUM equals the textbook recursion
    s_i = max(0, s_{i-1} + dev_i) computed in numpy, and flags a mean
    shift only after it happens."""
    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.window import cusum_changepoints

    rng = np.random.RandomState(21)
    vals = np.concatenate([rng.randn(80), rng.randn(80) + 4.0])
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=160, freq="h"),
         "value": vals}
    )
    out = (cusum_changepoints(spark.createDataFrame(pdf), "value",
                              drift_k=0.5, threshold_h=5.0)
           .orderBy("ts").toPandas())
    mu, sigma = vals.mean(), vals.std(ddof=1)
    s_p = s_n = 0.0
    for i, x in enumerate(vals):
        s_p = max(0.0, s_p + (x - mu - 0.5 * sigma))
        s_n = max(0.0, s_n + ((mu - x) - 0.5 * sigma))
        assert abs(out["cusum_pos"][i] - s_p) < 1e-9
        assert abs(out["cusum_neg"][i] - s_n) < 1e-9
    # the baseline is the GLOBAL mean, so the low first regime drives
    # the negative side and the high second regime the positive side
    up = out.index[out["shift_up"]].tolist()
    down = out.index[out["shift_down"]].tolist()
    assert up and min(up) >= 80  # upward flags only after the shift
    assert down and max(down) < 100  # downward flags are regime-1 driven
    assert not out["shift_up"][:80].any()


def test_seasonal_decompose_matches_classical(spark):
    """Classical additive decomposition vs a hand-rolled numpy
    implementation of the same algorithm (statsmodels semantics:
    2xMA trend for even periods, centered phase-mean seasonal)."""
    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.stats import seasonal_decompose

    rng = np.random.RandomState(8)
    n, period = 240, 24
    t = np.arange(n)
    vals = (10 + 0.05 * t + 3 * np.sin(2 * np.pi * t / period)
            + 0.2 * rng.randn(n))
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=n, freq="h"),
         "value": vals}
    )
    out = (seasonal_decompose(spark.createDataFrame(pdf), "value",
                              period=period)
           .orderBy("ts").toPandas())
    # numpy reference: 2x24-MA trend
    trend = np.full(n, np.nan)
    for i in range(12, n - 12):
        trend[i] = (vals[i - 12:i + 12].mean()
                    + vals[i - 11:i + 13].mean()) / 2
    detr = vals - trend
    pm = np.array([np.nanmean(detr[p::period]) for p in range(period)])
    seasonal = pm - pm.mean()
    np.testing.assert_allclose(out["trend"].to_numpy(), trend, atol=1e-9)
    np.testing.assert_allclose(
        out["seasonal"].to_numpy(), seasonal[t % period], atol=1e-9
    )
    resid = vals - trend - seasonal[t % period]
    np.testing.assert_allclose(out["resid"].to_numpy(), resid, atol=1e-9)
    # the recovered seasonal tracks the injected sine
    assert np.corrcoef(seasonal,
                       3 * np.sin(2 * np.pi * np.arange(period) / period)
                       )[0, 1] > 0.99


def test_integrate_trapezoid_matches_numpy(spark):
    import datetime as dt
    import math
    import random

    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.accumulate import integrate

    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1)
    # irregular axis: cumulative random gaps
    ts, t = [], base
    for _ in range(50):
        t += dt.timedelta(minutes=rng.randint(10, 300))
        ts.append(t)
    vals = [rng.uniform(-3, 7) for _ in ts]
    pdf = pd.DataFrame({"ts": ts, "value": vals})
    out = integrate(spark.createDataFrame(pdf), "value", unit_seconds=3600.0)
    got = {r["ts"]: r["value_integral"] for r in out.collect()}
    # reference with the same 1e-6 term quantization
    acc, exp = 0, {}
    for i in range(len(ts)):
        if i > 0:
            dts = (ts[i] - ts[i - 1]).total_seconds()
            acc += math.floor((vals[i] + vals[i - 1]) / 2.0 * dts / 3600.0 * 1e6 + 0.5)
        exp[ts[i]] = acc / 1e6
    for k in exp:
        assert got[k] == exp[k], k
    # sanity vs numpy trapz at the last point (quantization ≤ n·1e-6)
    assert abs(got[ts[-1]] - getattr(np, 'trapezoid', np.trapz)(np.array(vals), np.array([(x - base).total_seconds() / 3600 for x in ts]))) < 1e-4


def test_integrate_null_breaks_trapezoid(spark):
    import datetime as dt

    import pandas as pd

    from tstoolbox_spark.operators.accumulate import integrate

    ts = [dt.datetime(2024, 1, 1, h) for h in range(4)]
    pdf = pd.DataFrame({"ts": ts, "value": [2.0, None, 4.0, 4.0]})
    out = {r["ts"]: r["value_integral"] for r in integrate(spark.createDataFrame(pdf), "value").collect()}
    # intervals touching the null contribute 0; last interval = (4+4)/2*1h = 4
    assert out[ts[0]] == 0.0 and out[ts[1]] == 0.0 and out[ts[2]] == 0.0
    assert out[ts[3]] == 4.0
