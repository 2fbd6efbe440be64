"""Counter semantics (reset-aware delta/rate/tier agg), heartbeat gap
detection, and exact heavy hitters from histogram partials.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tstoolbox_spark.operators.counters import (
    counter_agg,
    counter_delta,
    counter_rate,
    detect_gaps,
)
from tstoolbox_spark.pipeline.rollup import hist_base, hist_topk


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_counter_delta_handles_resets(spark):
    df = spark.createDataFrame(
        [(_ts(0), 0.0), (_ts(1), 5.0), (_ts(2), 3.0), (_ts(3), 10.0)],
        ["ts", "v"],
    )
    got = [r["delta"] for r in counter_delta(df, "v").orderBy("ts").collect()]
    # 5-0=5; 3<5 -> reset, increase = 3; 10-3=7
    assert got == [None, 5.0, 3.0, 7.0]


def test_counter_agg_sees_across_bucket_boundary(spark):
    rows = [
        ("a", _ts(0), 10.0),
        ("a", _ts(30), 20.0),
        ("a", _ts(70), 35.0),   # next hour: delta vs 20, not restart
        ("a", _ts(90), 5.0),    # reset inside hour 2: +5
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {
        r["ts"]: (r["increase"], r["n_obs"], r["first_reading"], r["last_reading"])
        for r in counter_agg(df, "v", "1h", key_cols=["k"]).collect()
    }
    assert got[dt.datetime(2024, 1, 1, 0)] == (10.0, 2, 10.0, 20.0)
    assert got[dt.datetime(2024, 1, 1, 1)] == (20.0, 2, 35.0, 5.0)


def test_counter_rate_per_second(spark):
    df = spark.createDataFrame(
        [(_ts(0), 0.0), (_ts(1), 120.0)], ["ts", "v"]
    )
    r = counter_rate(df, "v").orderBy("ts").collect()
    assert r[0]["rate"] is None
    assert r[1]["rate"] == 2.0  # 120 over 60 s


def test_detect_gaps(spark):
    df = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(1)), ("a", _ts(31)), ("b", _ts(0))],
        ["k", "ts"],
    )
    gaps = detect_gaps(df, 600, key_cols=["k"]).collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert g["k"] == "a" and g["gap_seconds"] == 1800.0
    assert g["gap_start"] == _ts(1) and g["gap_end"] == _ts(31)


def test_hist_topk_deterministic(spark):
    rows = [
        ("a", _ts(0), v) for v in [3, 3, 3, 7, 7, 1, 2, 2]
    ]
    df = spark.createDataFrame(rows, ["source", "ts", "n_tok"])
    hist = hist_base(df, "1d")
    top = hist_topk(hist, k=3).orderBy("rank").collect()
    # counts: 3->3, 7->2, 2->2, 1->1; tie (7 vs 2) -> smaller value first
    assert [(r["rank"], r["v"], r["cnt"]) for r in top] == [
        (1, 3, 3),
        (2, 2, 2),
        (3, 7, 2),
    ]
