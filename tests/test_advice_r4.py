"""Regression tests for the round-3 ADVICE items and VERDICT weak
fixes: loud scipy fallback, pearson null handling, reversed-interval
validation, string-derived Benford digits, weighted_mean null-weight
counting, and the CLI pearson_matrix key_cols injection."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _has_scipy() -> bool:
    try:
        import scipy  # noqa: F401
        return True
    except ImportError:
        return False


def test_fill_pandas_raises_without_scipy(spark):
    """VERDICT r3 #2: asking for pchip must not silently return linear
    values. Without scipy the call raises up front; the explicit
    fallback flag is the only degraded path."""
    from tstoolbox_spark.operators.fill import fill_pandas

    pdf = pd.DataFrame({
        "ts": [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)
               for i in range(6)],
        "value": [1.0, None, None, 4.0, None, 6.0],
    })
    df = spark.createDataFrame(pdf)
    if _has_scipy():
        pytest.skip("scipy present in this container")
    with pytest.raises(ImportError, match="pchip.*requires scipy"):
        fill_pandas(df, "pchip", ["value"])
    out = fill_pandas(df, "pchip", ["value"], fallback_linear=True)
    vals = [r.value for r in out.orderBy("ts").collect()]
    assert vals == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]  # linear, by opt-in


def test_fill_pandas_linear_never_gated(spark):
    from tstoolbox_spark.operators.fill import fill_pandas

    pdf = pd.DataFrame({
        "ts": [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)
               for i in range(3)],
        "value": [1.0, None, 3.0],
    })
    out = fill_pandas(spark.createDataFrame(pdf), "linear", ["value"])
    assert [r.value for r in out.orderBy("ts").collect()] == [1.0, 2.0, 3.0]


def test_pearson_matrix_ignores_null_values(spark):
    """Null values must not inflate n while dropping out of the moment
    sums (ADVICE r3). With nulls excluded, r over the remaining points
    equals r computed on the dense series."""
    from tstoolbox_spark.operators.stats import pearson_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):
        rows.append(("a", t0 + dt.timedelta(hours=i), float(i)))
        rows.append((
            "b", t0 + dt.timedelta(hours=i),
            None if i == 5 else float(2 * i + 1),
        ))
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = pearson_matrix(df, "key", "value").collect()
    assert len(out) == 1
    # only the 9 aligned non-null instants count
    assert out[0].n == 9
    assert out[0].r == 1.0  # exactly linear on the surviving points


def test_interval_coverage_drops_reversed_and_validates(spark):
    from tstoolbox_spark.operators.events import interval_coverage

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", t0, t0 + dt.timedelta(minutes=10)),            # valid
        ("k", t0 + dt.timedelta(minutes=20),
         t0 + dt.timedelta(minutes=5)),                       # reversed
    ]
    df = spark.createDataFrame(rows, "key string, start timestamp, end timestamp")
    out = interval_coverage(df, "start", "end", tier="1d",
                            key_cols=["key"]).collect()
    # reversed interval excluded: coverage is exactly the valid 10 min
    assert len(out) == 1
    [r] = out
    assert r.covered_us == 10 * 60 * 1_000_000
    with pytest.raises(ValueError, match="1 reversed"):
        interval_coverage(df, "start", "end", tier="1d",
                          key_cols=["key"], validate=True)


def test_benford_digit_from_string_repr(spark):
    """Digits come from the value's string form — exact at
    power-of-ten magnitudes where floor(log10)/pow doubles can slip a
    ulp — and scientific notation still leads with the first
    significant digit."""
    from tstoolbox_spark.operators.drift import benford_digits

    vals = [1000.0, 0.00098, 123.45, 9.99, 1e15, 2.5e-7]
    df = spark.createDataFrame(
        [(v,) for v in vals], "value double"
    )
    out = benford_digits(df, "value")
    got = {r.digit: r.obs for r in out.collect()}
    assert got[1] == 3  # 1000.0, 123.45, 1e15
    assert got[9] == 2  # 0.00098, 9.99
    assert got[2] == 1  # 2.5e-7
    assert sum(got.values()) == len(vals)
    assert all(1 <= d <= 9 for d in got)


def test_weighted_mean_counts_only_fully_observed_rows(spark):
    from tstoolbox_spark.operators.aggregate import weighted_mean

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, 10.0, 1.0),
        (t0, 20.0, 3.0),
        (t0, 99.0, None),   # null weight: excluded from sums AND n
        (t0, None, 5.0),    # null value: excluded from sums AND n
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double, w double")
    [r] = weighted_mean(df, "value", "w", tier="1d").collect()
    assert r.n == 2
    assert r.weight_sum == 4.0
    assert abs(r.weighted_mean - (10.0 * 1 + 20.0 * 3) / 4.0) < 1e-12


def test_cli_pearson_matrix_accepts_key_cols_flag(spark, tmp_path):
    """ADVICE r3: the old **kw wrapper made run_verb inject key_cols,
    which pearson_matrix (key_col, singular) rejects with TypeError.
    The CLI call must now run."""
    from tstoolbox_spark.cli import run_verb

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame({
        "ts": [t0 + dt.timedelta(hours=i) for i in range(8)] * 2,
        "key": ["a"] * 8 + ["b"] * 8,
        "value": [float(i) for i in range(8)]
        + [float(3 * i + 2) for i in range(8)],
    })
    p = str(tmp_path / "panel.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    out = run_verb(
        spark,
        "pearson_matrix",
        {"input_ts": p, "key_col": "key", "value_col": "value",
         "key_cols": "key"},
    ).collect()
    assert len(out) == 1 and out[0].r == 1.0


def test_lomb_scargle_no_driver_collect(spark):
    """VERDICT r3 #4: t0 centering must not materialize per-key rows
    on the driver — the plan carries a window min instead, and values
    are unchanged."""
    import numpy as np

    from tstoolbox_spark.operators.signal import lomb_scargle

    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(7)
    ts = sorted(rng.uniform(0, 86400 * 14, 600))
    rows = [
        (t0 + dt.timedelta(seconds=float(s)),
         float(np.sin(2 * np.pi * s / 86400.0) + 0.1 * rng.standard_normal()))
        for s in ts
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = lomb_scargle(df, "value", periods_seconds=[43200.0, 86400.0,
                                                     172800.0])
    rowsout = {r.period_s: r.power for r in out.collect()}
    assert rowsout[86400.0] > 10 * rowsout[43200.0]  # daily cycle dominates
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "window" in plan.lower()


def test_fill_verb_routes_pchip_and_spline(spark):
    """fill(method='pchip'/'spline') serves the reference's scipy
    methods natively — knots kept, gaps filled, edges left null."""
    from tstoolbox_spark.operators.fill import fill

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(hours=i) for i in range(9)]
    vals = [0.0, None, 0.0, None, 0.0, None, 10.0, None, 10.0]
    df = spark.createDataFrame(list(zip(ts, vals)),
                               "ts timestamp, value double")
    for method in ("pchip", "spline", "cubicspline"):
        out = {r.ts: r.value
               for r in fill(df, method, ["value"]).collect()}
        assert out[ts[0]] == 0.0 and out[ts[8]] == 10.0
        assert out[ts[3]] is not None  # gap filled
    # pchip stays in [0, 10] on this step; natural spline does not
    pch = {r.ts: r.value for r in fill(df, "pchip", ["value"]).collect()}
    assert all(-1e-12 <= v <= 10 + 1e-12 for v in pch.values())
