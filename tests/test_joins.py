"""as-of join + sessionization correctness (vs pandas merge_asof and
hand-computed sessions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tstoolbox_spark.operators.joins import asof_join, session_stats, sessionize


def _quotes_trades():
    rng = np.random.default_rng(11)
    quotes = pd.DataFrame(
        {
            "sym": ["a"] * 30 + ["b"] * 30,
            "ts": list(pd.date_range("2024-01-01", periods=30, freq="7min")) * 2,
            "px": rng.normal(100, 5, 60).round(2),
        }
    )
    trades = pd.DataFrame(
        {
            "sym": ["a", "b"] * 40,
            "ts": list(
                pd.date_range("2024-01-01 00:03", periods=40, freq="5min")
            )
            + list(pd.date_range("2023-12-31 23:50", periods=40, freq="5min")),
            "qty": rng.integers(1, 100, 80),
        }
    )
    return quotes, trades


def test_asof_backward_matches_pandas(spark):
    quotes, trades = _quotes_trades()
    got = (
        asof_join(
            spark.createDataFrame(trades),
            spark.createDataFrame(quotes),
            by=["sym"],
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    want = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts"),
        on="ts",
        by="sym",
        direction="backward",
    ).sort_values(["sym", "ts"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got["px"].to_numpy(float), want["px"].to_numpy(float), equal_nan=True
    )


def test_asof_forward_and_tolerance(spark):
    quotes, trades = _quotes_trades()
    got = (
        asof_join(
            spark.createDataFrame(trades),
            spark.createDataFrame(quotes),
            by=["sym"],
            direction="forward",
            tolerance="10 minutes",
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    want = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts"),
        on="ts",
        by="sym",
        direction="forward",
        tolerance=pd.Timedelta("10 minutes"),
    ).sort_values(["sym", "ts"]).reset_index(drop=True)
    np.testing.assert_allclose(
        got["px"].to_numpy(float), want["px"].to_numpy(float), equal_nan=True
    )


def test_sessionize_known_gaps(spark):
    pdf = pd.DataFrame(
        {
            "user": ["u"] * 6,
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00",
                    "2024-01-01 00:10",   # same session (gap 10m)
                    "2024-01-01 01:00",   # new (gap 50m)
                    "2024-01-01 01:20",   # same
                    "2024-01-01 03:00",   # new
                    "2024-01-01 03:29",   # same (29m < 30m)
                ]
            ),
            "v": [1.0] * 6,
        }
    )
    out = (
        sessionize(spark.createDataFrame(pdf), "30 minutes", key_cols=["user"])
        .orderBy("ts")
        .toPandas()["session_id"]
        .tolist()
    )
    assert out == [1, 1, 2, 2, 3, 3]
    stats = session_stats(
        spark.createDataFrame(pdf), "30 minutes", key_cols=["user"], value_col="v"
    ).orderBy("session_id").toPandas()
    assert stats["n_events"].tolist() == [2, 2, 2]
    assert stats["duration_s"].tolist() == [600, 1200, 1740]
    assert stats["v_sum"].tolist() == [2.0, 2.0, 2.0]


def test_asof_join_null_payload_not_backfilled(spark):
    """ADVICE r1: a matched right row with a NULL payload column must
    carry that null (pandas merge_asof semantics), not forward-fill
    from an older right row; and the tolerance check must read the
    matched row's ts."""
    import datetime as dt

    import pandas as pd

    from tstoolbox_spark.operators.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(t(5), 1), (t(20), 2), (t(40), 3)], "ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [(t(0), 10.0, "a"), (t(15), None, "b"), (t(30), 30.0, None)],
        "ts timestamp, x double, tag string",
    )
    out = (
        asof_join(left, right, right_cols=["x", "tag"])
        .orderBy("lid")
        .toPandas()
    )
    # lid=2 matches the t(15) row: x must be the matched row's NULL,
    # tag the matched row's 'b' — no mixing with the t(0) row
    assert pd.isna(out.loc[1, "x"]) and out.loc[1, "tag"] == "b"
    assert out.loc[0, "x"] == 10.0 and out.loc[0, "tag"] == "a"
    assert out.loc[2, "x"] == 30.0 and pd.isna(out.loc[2, "tag"])

    # tolerance uses the matched row's ts: at lid=3 (t40), the match is
    # t30 → within 15 minutes; at lid=2 (t20) the match t15 is within;
    # with a 4-minute tolerance every match is stale → all null
    tight = (
        asof_join(left, right, right_cols=["x", "tag"], tolerance="4 minutes")
        .orderBy("lid")
        .toPandas()
    )
    assert tight["x"].isna().all() and tight["tag"].isna().all()

    # right_cols colliding with left columns are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("x", "lid"), right_cols=["lid"])


def test_interval_join_matches_bruteforce(spark):
    """Bucketized interval join == brute-force range join: overlapping
    intervals, multi-bucket spans, end exclusivity, per-key scoping."""
    import numpy as np

    from tstoolbox_spark.operators.joins import interval_join

    rng = np.random.RandomState(13)
    n = 300
    ev = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 72 * 3600, n), unit="s"),
        "event_id": np.arange(n),
    })
    iv_rows = []
    for i in range(40):
        s = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            int(rng.randint(0, 70 * 3600)), unit="s")
        dur = int(rng.randint(300, 8 * 3600))  # 5 min .. 8 h (multi-bucket)
        iv_rows.append((rng.choice(["a", "b"]), s,
                        s + pd.to_timedelta(dur, unit="s"), i))
    iv = pd.DataFrame(iv_rows, columns=["k", "start", "end", "iv_id"])

    got = (interval_join(
        spark.createDataFrame(ev), spark.createDataFrame(iv),
        by=["k"], bucket="1 hour")
        .select("event_id", "iv_id").toPandas())
    got_pairs = set(zip(got.event_id, got.iv_id))
    exp_pairs = set()
    for _, e in ev.iterrows():
        for _, r in iv.iterrows():
            if e.k == r.k and r.start <= e.ts < r.end:
                exp_pairs.add((e.event_id, r.iv_id))
    assert got_pairs == exp_pairs
    assert exp_pairs  # non-vacuous


def test_interval_join_is_equi_hash_join(spark):
    """The scale claim: the plan is a hash join on (key, bucket) —
    never BroadcastNestedLoopJoin / CartesianProduct, even though the
    semantic predicate is a range."""
    from tstoolbox_spark.operators.joins import interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    iv = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("start"),
        (F.date_trunc("day", "ts") + F.expr("INTERVAL 12 HOURS")).alias("end"),
    ).distinct()
    plan = (interval_join(ev, iv, by=["event_type"], bucket="1 hour")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
