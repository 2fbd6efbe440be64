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
