"""Parity tests for accumulate, clip/replace/convert, normalization,
converttz/date_offset/convert_index, stack/unstack/merge, core pipeline
stages, stats verbs and peak detection — each vs the pandas/numpy
oracle the reference verb wraps (citations in the operator modules).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.accumulate import accumulate
from tstoolbox_spark.operators.core import clean, date_slice, round_index
from tstoolbox_spark.operators.peaks import peak_detection
from tstoolbox_spark.operators.reshape import (
    createts,
    merge_columns,
    merge_combine,
    merge_rows,
    stack,
    unstack,
)
from tstoolbox_spark.operators.stats import (
    add_trend,
    autocorrelation,
    correlation_matrix,
    fdc,
    gof,
    linear_fit,
)
from tstoolbox_spark.operators.transform import (
    clip,
    convert,
    convert_index_to_datetime,
    convert_index_to_number,
    converttz,
    date_offset,
    normalization,
    replace,
)

from .conftest import to_sdf


@pytest.mark.parametrize("stat", ["sum", "max", "min", "prod"])
def test_accumulate(spark, missing_pdf, stat):
    pdf = missing_pdf.copy()
    pdf["value"] = pdf["value"] / 10.0 + 0.5  # keep cumprod finite
    got = (
        accumulate(to_sdf(spark, pdf), stat).orderBy("ts").toPandas()[f"value_cum{stat}"]
    )
    exp = getattr(pdf["value"], f"cum{stat}")()
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_clip_replace_convert(spark, twocol_pdf):
    sdf = to_sdf(spark, twocol_pdf)
    out = clip(sdf, a_min=-50, a_max=50, value_cols=["a"]).orderBy("ts").toPandas()
    pd.testing.assert_series_equal(
        out["a_clip"], twocol_pdf["a"].clip(-50, 50), check_names=False
    )
    out = convert(sdf, factor=2.5, offset=-1.0, value_cols=["a"]).orderBy("ts").toPandas()
    pd.testing.assert_series_equal(
        out["a_convert"], twocol_pdf["a"] * 2.5 - 1.0, check_names=False
    )
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=4), "value": [1.0, 2.0, 3.0, 2.0]}
    )
    out = replace(to_sdf(spark, pdf), [2.0], [99.0]).orderBy("ts").toPandas()
    assert out["value"].tolist() == [1.0, 99.0, 3.0, 99.0]


@pytest.mark.parametrize("mode", ["minmax", "zscore", "pct_rank", "maxabs", "robust"])
def test_normalization(spark, twocol_pdf, mode):
    got = (
        normalization(to_sdf(spark, twocol_pdf), mode, value_cols=["a"])
        .orderBy("ts")
        .toPandas()[f"a_{mode}"]
    )
    a = twocol_pdf["a"]
    if mode == "minmax":
        exp = (a - a.min()) / (a.max() - a.min())
    elif mode == "zscore":
        exp = (a - a.mean()) / a.std()
    elif mode == "pct_rank":
        # percent_rank = (rank-1)/(n-1), pandas analog via rank
        exp = (a.rank(method="min") - 1) / (len(a) - 1)
    elif mode == "maxabs":
        exp = a / a.abs().max()
    else:
        q1, q2, q3 = a.quantile(0.25), a.quantile(0.5), a.quantile(0.75)
        exp = (a - q2) / (q3 - q1)
    pd.testing.assert_series_equal(got, exp, check_names=False, atol=1e-12)


def test_time_transforms(spark):
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-06-01", periods=3, freq="h"), "value": [1.0, 2, 3]}
    )
    sdf = to_sdf(spark, pdf)
    out = converttz(sdf, "UTC", "America/New_York").orderBy("ts").toPandas()
    exp = (
        pdf["ts"].dt.tz_localize("UTC").dt.tz_convert("America/New_York").dt.tz_localize(None)
    )
    pd.testing.assert_series_equal(out["ts"], exp, check_names=False)

    out = date_offset(sdf, 3, "HOUR").orderBy("ts").toPandas()
    pd.testing.assert_series_equal(
        out["ts"], pdf["ts"] + pd.Timedelta(hours=3), check_names=False
    )

    out = convert_index_to_number(sdf, "julian").orderBy("ts").toPandas()
    exp_julian = pdf["ts"].apply(lambda t: t.to_julian_date())
    np.testing.assert_allclose(out["idx"].values, exp_julian.values)

    back = convert_index_to_datetime(
        convert_index_to_number(sdf, "unix"), "unix", ts_col="ts2"
    ).orderBy("ts").toPandas()
    # float64 julian-day arithmetic carries ~µs rounding (same limit as
    # the reference's to_julian_date path) — allow 100µs.
    drift = (back["ts2"] - pdf["ts"]).dt.total_seconds().abs()
    assert (drift < 1e-4).all()


def test_round_index_and_clean_and_slice(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2020-01-01 00:10", "2020-01-01 00:40", "2020-01-01 00:40", "2020-01-01 01:20"]
            ),
            "value": [1.0, 2.0, 2.5, 4.0],
        }
    )
    sdf = to_sdf(spark, pdf)
    out = round_index(sdf, "H", mode="round").orderBy("ts", "value").toPandas()
    assert out["ts"].dt.strftime("%H:%M").tolist() == ["00:00", "01:00", "01:00", "01:00"]
    out = clean(sdf).orderBy("ts").toPandas()
    assert len(out) == 3
    assert out["value"].tolist() == [1.0, 2.0, 4.0]
    out = date_slice(sdf, "2020-01-01 00:20", "2020-01-01 01:00").orderBy("ts").toPandas()
    assert out["value"].tolist() == [2.0, 2.5]


def test_stack_unstack_roundtrip(spark, twocol_pdf):
    sdf = to_sdf(spark, twocol_pdf)
    long = stack(sdf)
    assert long.columns == ["ts", "Columns", "Values"]
    assert long.count() == 2 * len(twocol_pdf)
    wide = unstack(long).orderBy("ts").toPandas()
    pd.testing.assert_frame_equal(
        wide[["ts", "a", "b"]], twocol_pdf, check_names=False
    )


def test_merges(spark):
    f1 = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=3), "x": [1.0, None, 3.0]}
    )
    f2 = pd.DataFrame(
        {"ts": pd.date_range("2020-01-02", periods=3), "x": [20.0, 30.0, 40.0]}
    )
    s1, s2 = to_sdf(spark, f1), to_sdf(spark, f2)
    assert merge_rows([s1, s2]).count() == 6
    cols = merge_columns([s1, s2.withColumnRenamed("x", "y")]).orderBy("ts").toPandas()
    assert len(cols) == 4 and "x" in cols and "y" in cols
    comb = merge_combine([s1, s2]).orderBy("ts").toPandas()
    # combine_first: f1 wins, f2 fills nulls/new rows
    assert comb["x"].tolist() == [1.0, 20.0, 3.0, 40.0]


def test_createts(spark):
    out = createts(spark, "2020-01-01", "2020-01-02", "6H").orderBy("ts").toPandas()
    exp = pd.date_range("2020-01-01", "2020-01-02", freq="6h")
    assert out["ts"].tolist() == list(exp)


def test_gof_metrics(spark, twocol_pdf):
    pdf = twocol_pdf.copy()
    pdf["sim"] = pdf["a"] * 1.1 + 5.0
    out = gof(to_sdf(spark, pdf), "a", "sim").toPandas().iloc[0]
    o, s = pdf["a"].to_numpy(), pdf["sim"].to_numpy()
    assert np.isclose(out["bias"], (s - o).mean())
    assert np.isclose(out["rmsd"], np.sqrt(((s - o) ** 2).mean()))
    assert np.isclose(out["corrcoef"], np.corrcoef(o, s)[0, 1])
    assert np.isclose(out["nse"], 1 - ((s - o) ** 2).sum() / ((o - o.mean()) ** 2).sum())
    cc = np.corrcoef(o, s)[0, 1]
    alpha = s.std(ddof=1) / o.std(ddof=1)
    beta = s.mean() / o.mean()
    kge09 = 1 - np.sqrt((cc - 1) ** 2 + (alpha - 1) ** 2 + (beta - 1) ** 2)
    assert np.isclose(out["kge09"], kge09)
    assert np.isclose(out["mae"], np.abs(s - o).mean())
    d = 1 - ((s - o) ** 2).sum() / ((np.abs(s - o.mean()) + np.abs(o - o.mean())) ** 2).sum()
    assert np.isclose(out["index_agreement"], d)
    # reference gof.py:342 — "Brier's Score" is np.sum(pred-ref)**2 / n
    # (square of the sum; the quirk is the tested behavior)
    assert np.isclose(out["brierss"], np.sum(s - o) ** 2 / len(o))


def test_autocorrelation_and_corr_matrix(spark, twocol_pdf):
    out = autocorrelation(to_sdf(spark, twocol_pdf), "a", [1, 2]).toPandas().iloc[0]
    exp1 = twocol_pdf["a"].autocorr(1)
    # pandas autocorr uses pearson on overlapping slices = engine's corr(v, lag(v))
    assert np.isclose(out["acf_1"], exp1, atol=1e-9)
    m = correlation_matrix(to_sdf(spark, twocol_pdf), ["a", "b"]).toPandas().iloc[0]
    assert np.isclose(m["corr_a_b"], twocol_pdf["a"].corr(twocol_pdf["b"]))
    ms = (
        correlation_matrix(to_sdf(spark, twocol_pdf), ["a", "b"], method="spearman")
        .toPandas()
        .iloc[0]
    )
    # scipy-free spearman oracle: pearson of average ranks
    exp_sp = twocol_pdf["a"].rank().corr(twocol_pdf["b"].rank())
    assert np.isclose(ms["corr_a_b"], exp_sp)


def test_fdc_plotting_positions(spark, twocol_pdf):
    out = fdc(to_sdf(spark, twocol_pdf), "a", plotting_position="weibull").toPandas()
    out = out.sort_values("exceedance").reset_index(drop=True)
    n = len(twocol_pdf)
    exp_probs = (np.arange(1, n + 1)) / (n + 1)
    np.testing.assert_allclose(out["exceedance"].values, exp_probs)
    np.testing.assert_allclose(out["a"].values, np.sort(twocol_pdf["a"].values))


def test_linear_fit_and_detrend(spark, twocol_pdf):
    out = linear_fit(to_sdf(spark, twocol_pdf), ["a"], remove=True).orderBy("ts").toPandas()
    x = twocol_pdf["ts"].astype("int64").to_numpy() / 1e9
    y = twocol_pdf["a"].to_numpy()
    slope, intercept = np.polyfit(x, y, 1)
    exp = y - (slope * x + intercept)
    np.testing.assert_allclose(out["a_detrend"].values, exp, atol=1e-8)


def test_add_trend(spark, flat_pdf):
    out = add_trend(to_sdf(spark, flat_pdf), 0.0, 5.0).orderBy("ts").toPandas()
    exp = np.linspace(0, 5, len(flat_pdf))
    np.testing.assert_allclose(out["value_trend"].values, exp)


def test_peak_detection_rel(spark):
    vals = [0.0, 2.0, 1.0, 3.0, 0.5, 0.2, 4.0, 1.0]
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=len(vals), freq="h"), "value": vals}
    )
    out = (
        peak_detection(to_sdf(spark, pdf), window=1, peaks=True, valleys=True)
        .orderBy("ts")
        .toPandas()
    )
    peaks = out["value_peak"].dropna().tolist()
    valleys = out["value_valley"].dropna().tolist()
    assert peaks == [2.0, 3.0, 4.0]
    assert valleys == [1.0, 0.2]


def test_peak_parabola_matches_polyfit(spark):
    """peak_parabola's closed-form quadratic LSQ must agree with
    numpy.polyfit over the same ``points`` samples at each raw peak
    (ref _peakdetect_parabola fits the same model via curve_fit)."""
    from tstoolbox_spark.operators.peaks import peak_parabola

    rng = np.random.RandomState(7)
    vals = np.cumsum(rng.randn(200))
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=200, freq="h"),
         "value": vals}
    )
    h, pts = 3, 7
    out = (
        peak_parabola(to_sdf(spark, pdf), "value", window=2, points=pts)
        .orderBy("ts")
        .toPandas()
    )
    assert len(out) > 0
    ts_to_i = {t: i for i, t in enumerate(pdf["ts"])}
    for _, row in out.iterrows():
        i = ts_to_i[row["ts"]]
        # raw extremum: strict max of the 2 rows either side
        assert vals[i] == max(vals[i - 2: i + 3])
        assert h <= i < 200 - h
        u = np.arange(-h, h + 1, dtype=float)
        coef = np.polyfit(u, vals[i - h: i + h + 1], 2)  # a, b, c
        a, b, c = coef
        tau = pdf["ts"][i].timestamp() + (-b / (2 * a)) * 3600.0
        m = c - b * b / (4 * a)
        np.testing.assert_allclose(row["tau_epoch_s"], tau, rtol=1e-9)
        np.testing.assert_allclose(row["peak_fitted"], m, rtol=1e-9)
        assert row["peak_raw"] == vals[i]


def test_peak_sine_recovers_pure_sinusoid(spark):
    """On data that IS a sampled sinusoid the closed-form Prony +
    linear-phase estimator recovers the exact apex time and value
    (the property scipy curve_fit converges to in the reference)."""
    import math

    from tstoolbox_spark.operators.peaks import peak_sine

    n = 240
    t = np.arange(n) * 3600.0
    w = 2 * math.pi / (24 * 3600)
    vals = 5.0 + 2.0 * np.sin(w * t + 0.7)
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=n, freq="h"),
         "value": vals}
    )
    out = (peak_sine(to_sdf(spark, pdf), "value", window=2, points=9)
           .orderBy("ts").toPandas())
    assert len(out) >= 8
    epoch0 = pdf["ts"][0].timestamp()
    t0 = (math.pi / 2 - 0.7) / w  # first true apex offset
    period = 24 * 3600.0
    for _, row in out.iterrows():
        k = round(((row["tau_epoch_s"] - epoch0) - t0) / period)
        true_tau = epoch0 + t0 + k * period
        assert abs(row["tau_epoch_s"] - true_tau) < 1e-6
        assert abs(row["peak_fitted"] - 7.0) < 1e-9


def test_peak_sine_drops_unfittable_windows(spark):
    """A window with no sinusoidal structure (|cos estimate| >= 1,
    e.g. monotone ramp with one spike) is dropped, not NaN-emitted."""
    from tstoolbox_spark.operators.peaks import peak_sine

    vals = np.arange(20.0)
    vals[10] = 100.0  # raw peak whose neighborhood is a ramp
    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=20, freq="h"),
         "value": vals}
    )
    out = peak_sine(to_sdf(spark, pdf), "value", window=2, points=7).toPandas()
    assert not out[["tau_epoch_s", "peak_fitted"]].isna().any().any()


def test_distributed_rank_matches_window_rank(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tstoolbox_spark.operators.stats import distributed_rank

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = distributed_rank(
        ev, "value", ["event_type"], tiebreak_cols=["event_id"], num_partitions=8
    ).select("event_id", "rank")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    want = ev.select("event_id", F.row_number().over(w).alias("rank"))
    diff = got.join(want, "event_id").filter(got["rank"] != want["rank"]).count()
    assert diff == 0


def test_fdc_scalable_matches_fdc(spark):
    from tstoolbox_spark.operators.stats import fdc, fdc_scalable

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "event_id", "value"
    )
    base = fdc(ev, "value", key_cols=["event_type"]).toPandas()
    scal = fdc_scalable(
        ev, "value", key_cols=["event_type"], tiebreak_cols=["event_id"]
    ).toPandas()
    key = lambda df: df.sort_values(  # noqa: E731
        ["event_type", "exceedance"]
    ).reset_index(drop=True)
    a, b = key(base), key(scal[["event_type", "exceedance", "value"]])
    assert (a["value"].to_numpy() == b["value"].to_numpy()).all()
    assert abs(a["exceedance"].to_numpy() - b["exceedance"].to_numpy()).max() < 1e-12


def test_infer_freq_gcd(spark):
    import datetime as dt

    from tstoolbox_spark.operators.core import infer_freq, regularize

    base = dt.datetime(2024, 1, 1)
    # 15-minute grid with gaps and unordered input
    ts = [base + dt.timedelta(minutes=15 * k) for k in [0, 1, 2, 5, 9, 4, 40]]
    df = spark.createDataFrame([(t, 1.0) for t in ts], "ts timestamp, value double")
    assert infer_freq(df) == "15T"
    # freq=None routes regularize through inference
    out = regularize(df, None)
    assert out.count() == 41  # 0..40 grid slots
    # hourly multiples normalize to H-codes
    ts2 = [base + dt.timedelta(hours=2 * k) for k in (0, 1, 3, 7)]
    df2 = spark.createDataFrame([(t, 1.0) for t in ts2], "ts timestamp, value double")
    assert infer_freq(df2) == "2H"


def test_describe_approximate_mode(spark, twocol_pdf):
    from tstoolbox_spark.operators.aggregate import describe

    sdf = to_sdf(spark, twocol_pdf)
    exact = describe(sdf, value_cols=["a"]).toPandas().iloc[0]
    approx = describe(sdf, value_cols=["a"], exact_quartiles=False).toPandas().iloc[0]
    assert exact["a_count"] == approx["a_count"]
    assert exact["a_mean"] == approx["a_mean"]
    # GK with accuracy=10k on a small series: quartiles land on actual
    # data values near the exact interpolated ones
    for q in ("a_25", "a_50", "a_75"):
        assert abs(exact[q] - approx[q]) <= (exact["a_max"] - exact["a_min"]) * 0.05


def test_convert_units(spark):
    """Curated affine unit registry (ref tsutils._normalize_units
    surface): known conversions, name:unit rename, and the reference's
    embedded-vs-explicit conflict error."""
    import pytest

    from tstoolbox_spark.operators.units import (
        conversion_coeffs,
        convert_units,
    )

    pdf = pd.DataFrame({
        "ts": pd.date_range("2020-01-01", periods=3, freq="h"),
        "flow:cfs": [1.0, 10.0, 100.0],
        "temp": [32.0, 212.0, -40.0],
    })
    out = (convert_units(spark.createDataFrame(pdf),
                         ["cfs", "degf"], ["cms", "degc"])
           .orderBy("ts").toPandas())
    assert "flow:cms" in out.columns
    np.testing.assert_allclose(out["flow:cms"],
                               [0.028316846592, 0.28316846592, 2.8316846592])
    np.testing.assert_allclose(out["temp"], [0.0, 100.0, -40.0], atol=1e-12)

    # roundtrip identity
    a, b = conversion_coeffs("cfs", "cms")
    a2, b2 = conversion_coeffs("cms", "cfs")
    assert abs(a * a2 - 1.0) < 1e-15 and abs(b) == 0.0 and abs(b2) == 0.0

    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="embeds unit"):
        convert_units(sdf, ["m", "degf"], ["ft", "degc"])
    with pytest.raises(ValueError, match="unknown unit"):
        conversion_coeffs("furlong", "m")
    with pytest.raises(ValueError, match="cannot convert"):
        conversion_coeffs("m", "degc")
