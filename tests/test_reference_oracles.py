"""Bit-for-bit parity against the reference's own pytest expectations.

Fixture = tests/data_missing.csv from the reference repo (26-slot
hourly grid, missing ROWS at 01,10,11,12,16,22,23h; values 2 except
09:00→3 and 13:00→9). Expected values are transcribed from
/root/reference/tests/test_fill.py:29-152 (ffill/bfill/linear/nearest/
mean/median/max/min/constant), the aggregate oracle from
tests/test_aggregate.py:16-51, and the rolling oracle from
tests/test_rolling_window.py:17-53.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.core import regularize
from tstoolbox_spark.operators.fill import fill

from .conftest import to_sdf

MEAN = 2.4210526315789473


def _fixture() -> pd.DataFrame:
    rows = {h: 2.0 for h in range(26)}
    for h in (1, 10, 11, 12, 16, 22, 23):
        del rows[h]
    rows[9] = 3.0
    rows[13] = 9.0
    t0 = pd.Timestamp("2011-01-01")
    return pd.DataFrame(
        {
            "ts": [t0 + pd.Timedelta(hours=h) for h in sorted(rows)],
            "value": [rows[h] for h in sorted(rows)],
        }
    )


def _expected(overrides: dict[int, float]) -> list[float]:
    base = {h: 2.0 for h in range(26)}
    base[9] = 3.0
    base[13] = 9.0
    base.update(overrides)
    return [base[h] for h in range(26)]


CASES = {
    # reference test_fill.py:32-36 (ffill_compare)
    "ffill": {10: 3.0, 11: 3.0, 12: 3.0},
    # :39-44 (bfill_compare)
    "bfill": {10: 9.0, 11: 9.0, 12: 9.0},
    # :47-53 (linear_compare)
    "linear": {10: 4.5, 11: 6.0, 12: 7.5},
    # :59-66 (nearest_compare): ties → previous
    "nearest": {10: 3.0, 11: 3.0, 12: 9.0},
    # :73-95 (mean_compare)
    "mean": {h: MEAN for h in (1, 10, 11, 12, 16, 22, 23)},
    # :100-111 (median_compare)
    "median": {h: 2.0 for h in (1, 10, 11, 12, 16, 22, 23)},
    # :119-124 (max_compare)
    "max": {h: 9.0 for h in (1, 10, 11, 12, 16, 22, 23)},
    # :128-137 (min_compare)
    "min": {h: 2.0 for h in (1, 10, 11, 12, 16, 22, 23)},
}


@pytest.mark.parametrize("method", list(CASES))
def test_fill_reference_values(spark, method):
    sdf = regularize(to_sdf(spark, _fixture()), "H")
    out = fill(sdf, method, ["value"]).orderBy("ts").toPandas()
    assert len(out) == 26
    np.testing.assert_allclose(
        out["value"].to_numpy(), _expected(CASES[method]), rtol=0, atol=0
    )


def test_fill_constant_reference_values(spark):
    """reference test_fill.py:142-152 (con_compare, value=2.42)."""
    sdf = regularize(to_sdf(spark, _fixture()), "H")
    out = fill(sdf, "value", ["value"], fill_value=2.42).orderBy("ts").toPandas()
    np.testing.assert_allclose(
        out["value"].to_numpy(),
        _expected({h: 2.42 for h in (1, 10, 11, 12, 16, 22, 23)}),
    )


def test_mean_is_reference_mean():
    pdf = _fixture()
    assert pdf["value"].mean() == MEAN


def test_aggregate_daily_reference_values(spark):
    """reference tests/test_aggregate.py:16-51 — hourly constant 2 over
    two days: daily mean = [2, 2], daily sum = [48, 48]."""
    from tstoolbox_spark.operators.aggregate import aggregate

    t0 = pd.Timestamp("2011-01-01")
    pdf = pd.DataFrame(
        {"ts": [t0 + pd.Timedelta(hours=h) for h in range(48)], "value": 2.0}
    )
    out = (
        aggregate(to_sdf(spark, pdf), "D", ["mean", "sum"])
        .orderBy("ts")
        .toPandas()
    )
    assert list(out["value_mean"]) == [2.0, 2.0]
    assert list(out["value_sum"]) == [48.0, 48.0]
    assert [t.strftime("%Y-%m-%d") for t in out["ts"]] == ["2011-01-01", "2011-01-02"]


def test_rolling_window_reference_values(spark):
    """reference tests/test_rolling_window.py:17-53 — data_simple.csv
    [4.5, 4.6]: window-2 sum = [NaN, 9.1], mean = [NaN, 4.55]."""
    from tstoolbox_spark.operators.window import rolling_window

    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2000-01-01", "2000-01-02"]), "value": [4.5, 4.6]}
    )
    out = (
        rolling_window(to_sdf(spark, pdf), ["sum", "mean"], window=2)
        .orderBy("ts")
        .toPandas()
    )
    assert pd.isna(out["value_rolling_2_sum"][0])
    assert out["value_rolling_2_sum"][1] == 9.1
    assert pd.isna(out["value_rolling_2_mean"][0])
    assert out["value_rolling_2_mean"][1] == 4.55


def test_date_slice_reference_values(spark):
    """reference tests/test_date_slice.py:15-44 — 3-row inclusive slice
    of a flat hourly series."""
    from tstoolbox_spark.operators.core import date_slice

    t0 = pd.Timestamp("2011-01-01")
    pdf = pd.DataFrame(
        {"ts": [t0 + pd.Timedelta(hours=h) for h in range(24)], "value": 2.0}
    )
    out = (
        date_slice(to_sdf(spark, pdf), "2011-01-01T12:00:00", "2011-01-01T14:00:00")
        .orderBy("ts")
        .toPandas()
    )
    assert len(out) == 3
    assert list(out["value"]) == [2.0, 2.0, 2.0]
    assert out["ts"].iloc[0].hour == 12 and out["ts"].iloc[-1].hour == 14
