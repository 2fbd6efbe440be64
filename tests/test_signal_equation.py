"""equation compiler + signal verbs parity tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.equation import equation
from tstoolbox_spark.operators.signal import (
    butterworth_filter,
    dtw_distance,
    fft_filter,
    gaussian_kde,
    kernel_filter,
    moving_average,
)

from .conftest import to_sdf


def test_equation_arithmetic(spark, twocol_pdf):
    out = (
        equation(to_sdf(spark, twocol_pdf), "x1 * 2 + x2 - 1", value_cols=["a", "b"])
        .orderBy("ts")
        .toPandas()
    )
    exp = twocol_pdf["a"] * 2 + twocol_pdf["b"] - 1
    pd.testing.assert_series_equal(out["equation"], exp, check_names=False)


def test_equation_functions_and_compare(spark, twocol_pdf):
    out = (
        equation(to_sdf(spark, twocol_pdf), "abs(x1) + sqrt(abs(x2)) * (x1 > 0)",
                 value_cols=["a", "b"])
        .orderBy("ts")
        .toPandas()
    )
    a, b = twocol_pdf["a"], twocol_pdf["b"]
    exp = a.abs() + np.sqrt(b.abs()) * (a > 0)
    pd.testing.assert_series_equal(out["equation"], exp, check_names=False)


def test_equation_time_shift(spark, twocol_pdf):
    out = (
        equation(to_sdf(spark, twocol_pdf), "x1[t-1] + x1[t+1]", value_cols=["a"])
        .orderBy("ts")
        .toPandas()
    )
    exp = twocol_pdf["a"].shift(1) + twocol_pdf["a"].shift(-1)
    pd.testing.assert_series_equal(out["equation"], exp, check_names=False)


def test_equation_t_ordinal(spark, flat_pdf):
    out = equation(to_sdf(spark, flat_pdf), "x1 * t", value_cols=["value"]).orderBy("ts").toPandas()
    exp = flat_pdf["value"] * np.arange(len(flat_pdf))
    np.testing.assert_allclose(out["equation"].values, exp.values)


def test_equation_rejects_unsafe(spark, flat_pdf):
    sdf = to_sdf(spark, flat_pdf)
    for bad in ["__import__('os')", "x1.attr", "open('f')", "x9 + 1", "lambda: 1"]:
        with pytest.raises(ValueError):
            equation(sdf, bad, value_cols=["value"])


def test_kernel_filter_matches_numpy_reference(spark, twocol_pdf):
    """Oracle = the reference's own recipe (reflect pad + convolve)."""
    wlen = 7
    out = (
        kernel_filter(to_sdf(spark, twocol_pdf), wlen, "hanning", ["a"])
        .orderBy("ts")
        .toPandas()["a_filter"]
        .to_numpy()
    )
    x = twocol_pdf["a"].to_numpy()
    w = np.hanning(wlen)
    w = w / w.sum()
    s = np.r_[x[wlen - 1 : 0 : -1], x, x[-2 : -wlen - 1 : -1]]
    y = np.convolve(w, s, mode="valid")
    start = (len(y) - len(x)) // 2
    np.testing.assert_allclose(out, y[start : start + len(x)], atol=1e-12)


def test_moving_average_flat(spark, twocol_pdf):
    out = (
        moving_average(to_sdf(spark, twocol_pdf), 5, ["a"]).orderBy("ts").toPandas()["a_ma"]
    )
    exp = twocol_pdf["a"].rolling(5, center=True, min_periods=1).mean()
    pd.testing.assert_series_equal(out, exp, check_names=False)


def test_fft_filter_lowpass(spark):
    t = np.arange(256, dtype=float)
    slow = np.sin(2 * np.pi * t / 64)
    fast = 0.5 * np.sin(2 * np.pi * t / 4)
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=256, freq="h"), "value": slow + fast}
    )
    out = (
        fft_filter(to_sdf(spark, pdf), cutoff_period=16, lowpass=True)
        .orderBy("ts")
        .toPandas()["value_fft"]
        .to_numpy()
    )
    # low-pass keeps the slow component, kills the 4-sample wave
    np.testing.assert_allclose(out, slow, atol=1e-8)


def test_butterworth_rejects_bad_args():
    # the old scipy-absent stub is gone: the closed-form design is in;
    # argument validation still raises loudly
    with pytest.raises(ValueError):
        from tstoolbox_spark.operators.signal import butter_coeffs

        butter_coeffs(0, 0.5)


def test_dtw(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [1.0, 2.0, 2.0, 3.0, 4.0]
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=5, freq="D"),
            "a": a + [np.nan],
            "b": b,
        }
    )
    out = dtw_distance(to_sdf(spark, pdf), "a", "b").toPandas()
    assert out["dtw"].iloc[0] == 0.0  # b is a with one repeat → free under DTW

    pdf2 = pdf.assign(b=[10.0, 20.0, 20.0, 30.0, 40.0])
    out2 = dtw_distance(to_sdf(spark, pdf2), "a", "b").toPandas()
    # classic DP oracle
    def dtw_ref(x, y):
        m, n = len(x), len(y)
        D = np.full((m + 1, n + 1), np.inf)
        D[0, 0] = 0
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                D[i, j] = abs(x[i - 1] - y[j - 1]) + min(
                    D[i - 1, j], D[i - 1, j - 1], D[i, j - 1]
                )
        return D[m, n]

    assert np.isclose(out2["dtw"].iloc[0], dtw_ref(a, [10.0, 20, 20, 30, 40]))


def test_gaussian_kde(spark, twocol_pdf):
    out = gaussian_kde(to_sdf(spark, twocol_pdf), "a", points=50).orderBy("x").toPandas()
    assert len(out) == 50
    x = twocol_pdf["a"].to_numpy()
    n = len(x)
    bw = n ** (-0.2) * x.std(ddof=1)
    grid = np.linspace(x.min(), x.max(), 50)
    z = (grid[:, None] - x[None, :]) / bw
    exp = np.exp(-0.5 * z * z).sum(axis=1) / (n * bw * np.sqrt(2 * np.pi))
    np.testing.assert_allclose(out["density"].to_numpy(), exp, rtol=1e-10)
    # density integrates to ~1 over the grid span
    assert 0.8 < np.trapz(out["density"], out["x"]) < 1.05


def test_butter_coeffs_golden_values():
    """Closed-form design vs scipy.signal.butter's published golden
    values (transcribed, not computed here — scipy is absent)."""
    import numpy as np

    from tstoolbox_spark.operators.signal import butter_coeffs

    b, a = butter_coeffs(2, 0.25, "lowpass")
    assert np.allclose(b, [0.09763107, 0.19526215, 0.09763107], atol=1e-8)
    assert np.allclose(a, [1.0, -0.94280904, 0.33333333], atol=1e-8)
    b, a = butter_coeffs(2, 0.25, "highpass")
    assert np.allclose(b, [0.56903559, -1.13807119, 0.56903559], atol=1e-8)
    assert np.allclose(a, [1.0, -0.94280904, 0.33333333], atol=1e-8)
    b, a = butter_coeffs(4, 0.1, "lowpass")
    assert abs(b[0] - 0.0004165992044065786) < 1e-12
    with pytest.raises(ValueError):
        butter_coeffs(2, 1.5)
    with pytest.raises(ValueError):
        butter_coeffs(2, 0.25, "bandstop")


def test_butterworth_filter_steady_state(spark):
    """DC gain: an order-2 lowpass passes a constant through to ~1.0
    gain once the transient decays; a highpass kills it to ~0."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.signal import butterworth_filter

    n = 200
    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {"ts": [t0 + dt.timedelta(hours=i) for i in range(n)], "value": 5.0}
    )
    df = spark.createDataFrame(pdf)
    low = butterworth_filter(df, ["value"], order=2, cutoff=0.25).toPandas()
    tail = low.sort_values("ts")["value_butterworth"].to_numpy()[-20:]
    assert np.allclose(tail, 5.0, atol=1e-6)
    hi = butterworth_filter(
        df, ["value"], order=2, cutoff=0.25, btype="highpass"
    ).toPandas()
    tail_h = hi.sort_values("ts")["value_butterworth"].to_numpy()[-20:]
    assert np.allclose(tail_h, 0.0, atol=1e-6)


def test_butterworth_lfilter_recursion():
    """Hand-rolled lfilter vs the direct difference equation."""
    import numpy as np

    from tstoolbox_spark.operators.signal import _lfilter, butter_coeffs

    rng = np.random.RandomState(7)
    x = rng.randn(50)
    b, a = butter_coeffs(2, 0.3)
    y = _lfilter(np.array(b), np.array(a), x)
    # direct form: y[n] = b0 x[n]+b1 x[n-1]+b2 x[n-2]-a1 y[n-1]-a2 y[n-2]
    yd = np.zeros_like(x)
    for i in range(len(x)):
        acc = b[0] * x[i]
        if i >= 1:
            acc += b[1] * x[i - 1] - a[1] * yd[i - 1]
        if i >= 2:
            acc += b[2] * x[i - 2] - a[2] * yd[i - 2]
        yd[i] = acc
    assert np.allclose(y, yd, atol=1e-12)


def test_butterworth_reverse_second_stage(spark):
    """filtfilt-style forward+backward pass: output is (near) zero
    phase — a symmetric input stays symmetric."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from tstoolbox_spark.operators.signal import butterworth_filter

    n = 101
    x = np.exp(-0.5 * ((np.arange(n) - 50) / 8.0) ** 2)  # symmetric bump
    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {"ts": [t0 + dt.timedelta(hours=i) for i in range(n)], "value": x}
    )
    out = butterworth_filter(
        spark.createDataFrame(pdf), ["value"], order=2, cutoff=0.2,
        reverse_second_stage=True,
    ).toPandas().sort_values("ts")["value_butterworth"].to_numpy()
    # symmetric around the center (transients confined to the edges)
    mid = out[20:-20]
    assert np.allclose(mid, mid[::-1], atol=1e-3)


def _np_lomb(t, x, periods):
    t = np.asarray(t, float) - np.min(t)
    x = np.asarray(x, float)
    y = x - x.mean()
    var = x.var(ddof=1)
    out = []
    for p in periods:
        w = 2 * np.pi / p
        theta = 0.5 * np.arctan2(np.sum(np.sin(2 * w * t)), np.sum(np.cos(2 * w * t)))
        ct, st = np.cos(w * t - theta), np.sin(w * t - theta)
        out.append(
            0.5 * ((y @ ct) ** 2 / (ct @ ct) + (y @ st) ** 2 / (st @ st)) / var
        )
    return np.array(out)


def test_lomb_scargle_finds_period_on_irregular_samples(spark):
    from tstoolbox_spark.operators.signal import lomb_scargle

    rng = np.random.RandomState(17)
    # irregular sampling: random times over 30 days, 24 h sine + noise
    t = np.sort(rng.uniform(0, 30 * 86400, 500))
    x = 3.0 * np.sin(2 * np.pi * t / 86400.0) + rng.normal(size=500)
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(t, unit="s"), "value": x}
    )
    periods = [6 * 3600.0, 12 * 3600.0, 86400.0, 2 * 86400.0, 7 * 86400.0]
    got = (
        lomb_scargle(to_sdf(spark, pdf), "value", periods)
        .orderBy("period_s")
        .toPandas()
    )
    want = _np_lomb(t, x, sorted(periods))
    assert np.allclose(got["power"].to_numpy(), want, rtol=1e-6)
    # the 24 h trial period dominates by an order of magnitude
    p = dict(zip(got["period_s"], got["power"]))
    assert p[86400.0] > 10 * max(v for k, v in p.items() if k != 86400.0)


def test_lomb_scargle_keyed(spark):
    from tstoolbox_spark.operators.signal import lomb_scargle

    rng = np.random.RandomState(2)
    frames = []
    for k, period in (("daily", 86400.0), ("weekly", 7 * 86400.0)):
        t = np.sort(rng.uniform(0, 60 * 86400, 400))
        x = 2.0 * np.sin(2 * np.pi * t / period) + rng.normal(size=400)
        f = pd.DataFrame({"ts": pd.to_datetime(t, unit="s"), "value": x})
        f["k"] = k
        frames.append((k, period, f))
    df = to_sdf(spark, pd.concat([f for *_, f in frames], ignore_index=True))
    periods = [86400.0, 7 * 86400.0]
    got = lomb_scargle(df, "value", periods, key_cols=["k"]).collect()
    by = {(r["k"], r["period_s"]): r["power"] for r in got}
    assert by[("daily", 86400.0)] > 5 * by[("daily", 7 * 86400.0)]
    assert by[("weekly", 7 * 86400.0)] > 5 * by[("weekly", 86400.0)]
