"""aggregate parity vs the pandas resample oracle (the reference's
aggregate verb is a thin wrapper over pandas resample —
/root/reference/tstoolbox/functions/aggregate.py:237-239 — so pandas
IS the oracle, matching tests/test_aggregate.py:16-73 expectations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.aggregate import aggregate, describe

from .conftest import to_sdf


def _oracle(pdf, freq, stat):
    r = pdf.set_index("ts")[["value"]].resample(freq)
    return getattr(r, stat)()["value"]


@pytest.mark.parametrize("stat", ["mean", "sum", "min", "max", "median", "std", "first", "last"])
def test_daily_stats_match_pandas(spark, missing_pdf, stat):
    got = (
        aggregate(to_sdf(spark, missing_pdf), "D", stat)
        .orderBy("ts")
        .toPandas()
        .set_index("ts")[f"value_{stat}"]
    )
    exp = _oracle(missing_pdf, "D", stat)
    pd.testing.assert_series_equal(got, exp, check_names=False, check_freq=False)


def test_flat_daily_mean_sum(spark, flat_pdf):
    """The reference's own headline oracle: hourly constant 2 →
    daily mean 2, daily sum 48 for the full day
    (reference tests/test_aggregate.py:16-51)."""
    out = (
        aggregate(to_sdf(spark, flat_pdf), "D", ["mean", "sum"])
        .orderBy("ts")
        .toPandas()
    )
    assert out.loc[0, "value_mean"] == 2.0
    assert out.loc[0, "value_sum"] == 48.0  # 24 hourly rows × 2


def test_groupby_all(spark, missing_pdf):
    out = aggregate(to_sdf(spark, missing_pdf), "all", ["mean", "count"]).toPandas()
    assert len(out) == 1
    assert out.loc[0, "ts"] == missing_pdf["ts"].max()
    exp = missing_pdf["value"].mean()
    assert np.isclose(out.loc[0, "value_mean"], exp)


def test_months_across_years(spark, twocol_pdf):
    out = aggregate(to_sdf(spark, twocol_pdf), "months_across_years", "mean", ["a"]).toPandas()
    exp = twocol_pdf.groupby(twocol_pdf["ts"].dt.month)["a"].mean()
    got = out.set_index("month")["a_mean"].sort_index()
    pd.testing.assert_series_equal(got, exp, check_names=False)


def test_ohlc(spark, twocol_pdf):
    out = aggregate(to_sdf(spark, twocol_pdf), "M", "ohlc", ["a"]).orderBy("ts").toPandas()
    o = twocol_pdf.set_index("ts")[["a"]].resample("ME").ohlc()["a"].reset_index(drop=True)
    for c in ["open", "high", "low", "close"]:
        np.testing.assert_allclose(out[f"a_{c}"].values, o[c].values)


def test_multiple_hours_bucket(spark, flat_pdf):
    out = aggregate(to_sdf(spark, flat_pdf), "4H" if False else "4h", "count").orderBy("ts").toPandas()
    # 26 hourly rows → 7 four-hour buckets (epoch-aligned == day-aligned here)
    assert len(out) == 7
    assert out["value_count"].tolist() == [4, 4, 4, 4, 4, 4, 2]


def test_describe_exact_quartiles(spark, twocol_pdf):
    out = describe(to_sdf(spark, twocol_pdf), ["a"]).toPandas()
    d = twocol_pdf["a"].describe()
    assert np.isclose(out.loc[0, "a_25"], d["25%"])
    assert np.isclose(out.loc[0, "a_50"], d["50%"])
    assert np.isclose(out.loc[0, "a_75"], d["75%"])
    assert np.isclose(out.loc[0, "a_std"], d["std"])
