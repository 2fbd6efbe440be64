"""fill parity vs the reference algorithm reproduced in pandas.

The reference's fill (functions/fill.py:228-335) = regularize to the
grid, add mean-sentinel rows one step outside both edges
(fill.py:269-276), apply the pandas fill, strip sentinels (:331).
The oracle below reproduces exactly that in pandas, mirroring what
reference tests/test_fill.py:19-284 assert.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.core import regularize
from tstoolbox_spark.operators.fill import fill

from .conftest import to_sdf


def _pandas_fill_oracle(pdf, method, freq="h", limit=None):
    """Reference algorithm in pandas: asfreq → mean sentinels → fill →
    strip."""
    s = pdf.set_index("ts")["value"].asfreq(freq)
    step = pd.tseries.frequencies.to_offset(freq)
    mean = s.mean()
    pre = pd.Series([mean], index=[s.index[0] - step])
    post = pd.Series([mean], index=[s.index[-1] + step])
    s2 = pd.concat([pre, s, post])
    if method == "ffill":
        s2 = s2.ffill(limit=limit)
    elif method == "bfill":
        s2 = s2.bfill(limit=limit)
    elif method == "linear":
        s2 = s2.interpolate(method="linear")
    elif method == "nearest":
        # scipy-free nearest oracle (scipy not in this container):
        # value of the closest non-null neighbor, ties → previous
        # (same midpoint rule as scipy interp1d kind='nearest').
        idx = s2.index.view("int64")
        vals = s2.to_numpy()
        nn = ~np.isnan(vals)
        nn_idx = idx[nn]
        nn_vals = vals[nn]
        out = vals.copy()
        for i, (t, v) in enumerate(zip(idx, vals)):
            if np.isnan(v):
                pos = np.searchsorted(nn_idx, t)
                lo, hi = nn_idx[pos - 1], nn_idx[pos]
                out[i] = nn_vals[pos - 1] if t - lo <= hi - t else nn_vals[pos]
        s2 = pd.Series(out, index=s2.index)
    return s2.iloc[1:-1]


def _engine_fill(spark, pdf, method, limit=None):
    sdf = regularize(to_sdf(spark, pdf), "H")
    out = fill(sdf, method, ["value"], limit=limit)
    return out.orderBy("ts").toPandas().set_index("ts")["value"]


@pytest.mark.parametrize("method", ["ffill", "bfill", "linear", "nearest"])
def test_fill_methods_match_reference(spark, missing_pdf, method):
    got = _engine_fill(spark, missing_pdf, method)
    exp = _pandas_fill_oracle(missing_pdf, method)
    pd.testing.assert_series_equal(got, exp, check_names=False, check_freq=False)


@pytest.mark.parametrize("limit", [1, 2])
def test_fill_limit(spark, missing_pdf, limit):
    got = _engine_fill(spark, missing_pdf, "ffill", limit=limit)
    exp = _pandas_fill_oracle(missing_pdf, "ffill", limit=limit)
    pd.testing.assert_series_equal(got, exp, check_names=False, check_freq=False)


def test_fill_mean_value(spark, missing_pdf):
    sdf = regularize(to_sdf(spark, missing_pdf), "H")
    got = (
        fill(sdf, "mean", ["value"]).orderBy("ts").toPandas().set_index("ts")["value"]
    )
    s = missing_pdf.set_index("ts")["value"].asfreq("h")
    exp = s.fillna(s.mean())
    pd.testing.assert_series_equal(got, exp, check_names=False, check_freq=False)

    got_v = (
        fill(sdf, "value", ["value"], fill_value=-9.0)
        .orderBy("ts")
        .toPandas()["value"]
    )
    exp_v = s.fillna(-9.0).reset_index(drop=True)
    pd.testing.assert_series_equal(got_v, exp_v, check_names=False)


def test_fill_from_donor(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2020-01-01", periods=5, freq="D"),
            "value": [1.0, None, None, 4.0, None],
            "donor1": [9.0, 2.0, None, 9.0, 9.0],
            "donor2": [8.0, 8.0, 3.0, 8.0, None],
        }
    )
    out = (
        fill(to_sdf(spark, pdf), "from", ["value"], from_cols=["donor1", "donor2"])
        .orderBy("ts")
        .toPandas()
    )
    assert out["value"].tolist() == [1.0, 2.0, 3.0, 4.0, 9.0]


def test_regularize_inserts_gap_rows(spark, missing_pdf):
    out = regularize(to_sdf(spark, missing_pdf), "H").orderBy("ts").toPandas()
    assert len(out) == 26  # rows 10-12 restored as nulls
    assert out["value"].isna().sum() == missing_pdf["value"].isna().sum() + 3


def test_regularize_per_key(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 3 + ["b"] * 2,
            "ts": list(pd.to_datetime(["2020-01-01", "2020-01-03", "2020-01-04"]))
            + list(pd.to_datetime(["2020-02-01", "2020-02-04"])),
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = regularize(to_sdf(spark, pdf), "D", key_cols=["k"]).orderBy("k", "ts").toPandas()
    assert len(out[out.k == "a"]) == 4
    assert len(out[out.k == "b"]) == 4
    assert out["value"].isna().sum() == 3
