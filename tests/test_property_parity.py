"""Property-based parity: engine operators vs pandas on randomized
series (hypothesis). The reference IS pandas under the hood
(SURVEY.md §3), so pandas parity on arbitrary inputs subsumes any
fixed fixture.

Example counts are small (each example round-trips through Spark);
the generators bias toward the nasty cases: nulls, ties, constant
runs, single-row series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tstoolbox_spark.operators.aggregate import aggregate
from tstoolbox_spark.operators.fill import fill
from tstoolbox_spark.operators.window import rolling_window

from .conftest import to_sdf

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.one_of(
        st.none(),
        st.floats(-1e6, 1e6, allow_nan=False).map(lambda v: round(v, 3)),
        st.sampled_from([0.0, 1.0, 1.0, 2.5]),  # force ties/constants
    ),
    min_size=1,
    max_size=48,
)


def _frame(vals: list) -> pd.DataFrame:
    t0 = pd.Timestamp("2024-03-01")
    return pd.DataFrame(
        {
            "ts": [t0 + pd.Timedelta(hours=h) for h in range(len(vals))],
            "value": pd.array(vals, dtype="float64"),
        }
    )


def _with_sentinels(s: pd.Series) -> pd.Series:
    """Reference fill quirk (fill.py:269-331): a column-mean row is
    prepended and appended before any fill method, so edge NaNs fill
    against the mean; rows stripped afterwards."""
    m = s.mean()
    return pd.concat([pd.Series([m]), s, pd.Series([m])], ignore_index=True)


@given(values)
@SET
def test_ffill_bfill_match_pandas(spark, vals):
    pdf = _frame(vals)
    for method in ("ffill", "bfill"):
        got = (
            fill(to_sdf(spark, pdf), method, ["value"])
            .orderBy("ts")
            .toPandas()["value"]
            .to_numpy()
        )
        want = getattr(_with_sentinels(pdf["value"]), method)().to_numpy()[1:-1]
        # edge NaNs fill against the column MEAN sentinel; Spark's
        # partial-aggregated avg and pandas' pairwise sum can differ by
        # 1 ulp, so the sentinel path needs the same tolerance as the
        # linear test below (non-edge values still match exactly).
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@given(values)
@SET
def test_linear_fill_matches_pandas_interpolate(spark, vals):
    pdf = _frame(vals)
    got = (
        fill(to_sdf(spark, pdf), "linear", ["value"])
        .orderBy("ts")
        .toPandas()["value"]
        .to_numpy()
    )
    # reference fill: mean-sentinel rows outside the series, then
    # interpolate, then ffill/bfill residual edges (fill.py:269-331)
    s = pdf["value"]
    m = s.mean()
    if np.isnan(m):
        want = s.to_numpy()
    else:
        ext = pd.concat([pd.Series([m]), s, pd.Series([m])], ignore_index=True)
        want = ext.interpolate(method="linear").to_numpy()[1:-1]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@given(values, st.integers(2, 6))
@SET
def test_rolling_stats_match_pandas(spark, vals, window):
    pdf = _frame(vals)
    out = (
        rolling_window(to_sdf(spark, pdf), ["sum", "mean", "min", "max"], window=window)
        .orderBy("ts")
        .toPandas()
    )
    roll = pdf["value"].rolling(window)
    for stat, pd_stat in (("sum", "sum"), ("mean", "mean"), ("min", "min"), ("max", "max")):
        got = out[f"value_rolling_{window}_{stat}"].to_numpy()
        want = getattr(roll, pd_stat)().to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@given(values)
@SET
def test_daily_aggregate_matches_pandas_resample(spark, vals):
    pdf = _frame(vals)
    out = (
        aggregate(to_sdf(spark, pdf), "D", ["sum", "mean", "count"])
        .orderBy("ts")
        .toPandas()
        .set_index("ts")
    )
    res = pdf.set_index("ts")["value"].resample("D")
    want_sum = res.sum(min_count=1)
    want_mean = res.mean()
    want_count = res.count()
    # pandas emits empty-bucket rows for interior gaps; hourly input
    # has none, so indexes align 1:1
    np.testing.assert_allclose(
        out["value_sum"].to_numpy(), want_sum.to_numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        out["value_mean"].to_numpy(), want_mean.to_numpy(), rtol=1e-12
    )
    np.testing.assert_array_equal(
        out["value_count"].to_numpy(), want_count.to_numpy()
    )


@given(values, st.sampled_from(["average", "min", "max", "dense", "first"]),
       st.booleans(), st.booleans())
@SET
def test_rank_matches_pandas(spark, vals, method, ascending, pct):
    """The distributed rank path (rank_components + join-back) must
    reproduce pandas .rank for every method under ties, nulls,
    descending order, and pct."""
    from tstoolbox_spark.operators.window import rank

    pdf = pd.DataFrame(
        {"ts": pd.date_range("2020-01-01", periods=len(vals), freq="h"),
         "value": pd.array(vals, dtype="float64")}
    )
    got = (
        rank(to_sdf(spark, pdf), method=method, value_cols=["value"],
             ascending=ascending, pct=pct)
        .orderBy("ts")
        .toPandas()["value_rank"]
    )
    exp = pdf["value"].rank(method=method, ascending=ascending, pct=pct)
    pd.testing.assert_series_equal(got, exp, check_names=False)


@given(st.lists(st.lists(st.integers(0, 999), max_size=30), min_size=1, max_size=40),
       st.integers(1, 17))
@SET
def test_chunk_pack_property(spark, docs, max_len):
    """Packing invariants on arbitrary corpora: order-exact stream
    reconstruction, dense chunk ids, fixed sizes except the tail."""
    from tstoolbox_spark.textops.packing import chunk_pack_tokens

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, tokens array<int>"
    )
    p = chunk_pack_tokens(df, max_len).orderBy("chunk_id").toPandas()
    stream = [t for d in docs for t in d]
    flat = [t for chunk in p["tokens"] for t in chunk]
    assert flat == stream
    assert p["chunk_id"].tolist() == list(range(len(p)))
    if len(p):
        assert all(s == max_len for s in p["n_tok"].tolist()[:-1])
        assert 0 < p["n_tok"].iloc[-1] <= max_len


# ---- round-3 continuation family: states / winsorized / quantiles ----

states_lists = st.lists(
    st.one_of(st.sampled_from(["a", "b", "c"]), st.none()),
    min_size=1,
    max_size=30,
)


@SET
@given(states_lists)
def test_state_durations_and_runs_match_pandas(spark, states):
    import datetime as dt

    from tstoolbox_spark.operators.states import state_durations, state_runs

    t0 = dt.datetime(2024, 1, 1)
    # irregular spacing exercises real durations
    ts = [t0 + dt.timedelta(minutes=7 * i + (i % 3)) for i in range(len(states))]
    pdf = pd.DataFrame({"ts": ts, "state": states})
    sdf = spark.createDataFrame(pdf)

    # pandas oracle: duration of obs i = ts[i+1]-ts[i] (0 for last)
    durs = {}
    nobs = {}
    for i, s in enumerate(states):
        d = (ts[i + 1] - ts[i]).total_seconds() * 1e6 if i + 1 < len(ts) else 0
        durs[s] = durs.get(s, 0) + int(d)
        nobs[s] = nobs.get(s, 0) + 1
    got = {
        r["state"]: (r["state_us"], r["n_obs"])
        for r in state_durations(sdf, "state", tier=None).collect()
    }
    assert got == {s: (durs[s], nobs[s]) for s in durs}

    # run-length: pandas groupby on change points (null-safe)
    marks = [0] * len(states)
    for i in range(1, len(states)):
        if states[i] != states[i - 1] or (
            (states[i] is None) != (states[i - 1] is None)
        ):
            marks[i] = 1
    expected_runs = 1 + sum(marks)
    assert state_runs(sdf, "state").count() == expected_runs


@SET
@given(st.lists(st.integers(1, 40), min_size=1, max_size=60),
       st.sampled_from([0.0, 0.05, 0.1, 0.25]))
def test_winsorized_mean_matches_numpy(spark, vals, alpha):
    import datetime as dt

    from tstoolbox_spark.pipeline.rollup import hist_base, hist_winsorized_mean

    t0 = dt.datetime(2024, 3, 1)
    pdf = pd.DataFrame(
        {
            "source": ["s"] * len(vals),
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(len(vals))],
            "n_tok": vals,
        }
    )
    out = hist_winsorized_mean(
        hist_base(spark.createDataFrame(pdf), "1mo"), alpha=alpha
    ).collect()[0]
    arr = np.sort(np.array(vals, dtype=np.int64))
    k = int(np.floor(alpha * len(arr)))
    if k:
        arr[:k] = arr[k]
        arr[len(arr) - k:] = arr[len(arr) - k - 1]
    assert out["winsorized_mean"] == round(float(arr.mean()), 6)
    assert out["n"] == len(vals)


@SET
@given(st.lists(st.integers(0, 10**7), min_size=1, max_size=60),
       st.sampled_from([0.01, 0.5, 0.9, 0.99]))
def test_exact_quantiles_matches_numpy_disc(spark, vals, q):
    import datetime as dt
    import math

    from tstoolbox_spark.operators.stats import exact_quantiles

    pdf = pd.DataFrame({"v": vals})
    out = exact_quantiles(
        spark.createDataFrame(pdf), "v", qs=(q,)
    ).collect()[0]
    srt = sorted(vals)
    expect = srt[max(math.ceil(q * len(vals)), 1) - 1]
    col = f"p{str(q).replace('0.', '').ljust(2, '0')}"
    assert out[col] == expect and out["n"] == len(vals)


def test_robust_anomaly_flags_hand_case(spark):
    """Hampel identifier on a hand-checkable series: median/MAD from
    exact percentile_disc, |x − med| > 3·MAD flags only the spike."""
    import datetime as dt

    import pandas as pd

    from tstoolbox_spark.operators.stats import robust_anomaly_flags

    vals = [10, 11, 9, 10, 12, 10, 9, 11, 10, 100]  # med=10, MAD=1
    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "k": "a",
            "ts": [t0 + dt.timedelta(hours=i) for i in range(len(vals))],
            "x": vals,
        }
    )
    out = robust_anomaly_flags(
        spark.createDataFrame(pdf), "x", key_cols=("k",), k=3.0
    )
    rows = {r["x"]: r for r in out.collect()}
    assert rows[100]["is_anomaly"] == 1
    assert sum(r["is_anomaly"] for r in rows.values()) == 1
    assert rows[100]["median"] == 10 and rows[100]["mad"] == 1


def test_robust_anomaly_flags_zero_mad(spark):
    """A constant series (MAD=0) flags exactly the deviating values."""
    import datetime as dt

    import pandas as pd

    from tstoolbox_spark.operators.stats import robust_anomaly_flags

    t0 = dt.datetime(2024, 1, 1)
    vals = [5, 5, 5, 5, 5, 5, 7]
    pdf = pd.DataFrame(
        {
            "k": "a",
            "ts": [t0 + dt.timedelta(hours=i) for i in range(len(vals))],
            "x": vals,
        }
    )
    out = robust_anomaly_flags(
        spark.createDataFrame(pdf), "x", key_cols=("k",), k=3.0
    ).collect()
    flagged = [r["x"] for r in out if r["is_anomaly"] == 1]
    assert flagged == [7]
