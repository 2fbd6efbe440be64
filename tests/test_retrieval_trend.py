"""Unit tests: BM25 retrieval, Theil-Sen trend, dominant period,
linear upsampling — each checked against an independent Python/numpy
computation of the published formula.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.operators.core import upsample_linear
from tstoolbox_spark.operators.stats import dominant_period, theil_sen
from tstoolbox_spark.textops.retrieval import bm25_topk


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)


def test_bm25_matches_reference_formula(spark):
    docs = [
        ("d1", "spark rollup tier rollup"),
        ("d2", "tier tier tier storage"),
        ("d3", "unrelated words entirely here"),
        ("d4", "rollup"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, ["rollup", "tier"], k=4).collect()
    }

    # independent computation (Okapi BM25, k1=1.2, b=0.75)
    texts = {d: t.split() for d, t in docs}
    N, avgdl = len(docs), sum(len(w) for w in texts.values()) / len(docs)
    dfreq = {
        q: sum(1 for w in texts.values() if q in w) for q in ("rollup", "tier")
    }
    k1, b = 1.2, 0.75
    for d, ws in texts.items():
        exp = 0.0
        for q in ("rollup", "tier"):
            tf = ws.count(q)
            if not tf:
                continue
            idf = math.log(1 + (N - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            exp += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if exp > 0:
            assert got[d] == pytest.approx(exp, abs=2e-6)
        else:
            assert d not in got


def test_bm25_topk_cut_is_deterministic(spark):
    df = spark.createDataFrame(
        [(f"d{i}", "common word") for i in range(10)], ["doc_id", "text"]
    )
    top = bm25_topk(df, ["common"], k=3).collect()
    # identical scores → doc_id ascending decides the cut
    assert [r["doc_id"] for r in top] == ["d0", "d1", "d2"]


def test_theil_sen_matches_numpy(spark):
    rng = np.random.RandomState(7)
    xs = np.arange(40, dtype=float)
    ys = 0.5 * xs + 3.0 + rng.normal(0, 0.3, 40)
    ys[5] += 50  # outlier the robust estimator must shrug off
    rows = [(_ts(int(x)), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, ["ts", "v"])
    got = theil_sen(df, "v").collect()[0]

    slopes = [
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    m = float(np.median(slopes))
    # intercept is in the operator's x units (epoch hours) — read the
    # same x values back so the check is timezone-robust
    xs_epoch = np.array(
        [
            r[0]
            for r in df.select(F.unix_timestamp("ts") / 3600.0)
            .orderBy("ts")
            .collect()
        ]
    )
    icept = float(np.median(ys - m * xs_epoch))
    assert got["slope"] == pytest.approx(m, abs=1e-9)
    assert got["intercept"] == pytest.approx(icept, abs=1e-6)
    assert abs(got["slope"] - 0.5) < 0.05  # outlier did not drag the fit


def test_theil_sen_guard(spark):
    df = spark.createDataFrame(
        [(_ts(0, i), float(i)) for i in range(30)], ["ts", "v"]
    )
    with pytest.raises(ValueError, match="coarser tier"):
        theil_sen(df, "v", max_points=10)


def test_dominant_period_finds_sinusoid(spark):
    rows = [
        ("a", _ts(h), math.sin(2 * math.pi * h / 12.0))
        for h in range(240)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = dominant_period(df, "v", max_lag=30, key_cols=["k"]).collect()[0]
    assert got["period_lag"] == 12
    assert got["acf"] > 0.99


def test_upsample_linear_quarters(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 0.0), ("a", _ts(1), 4.0), ("a", _ts(2), 8.0)],
        ["k", "ts", "v"],
    )
    out = upsample_linear(df, 900, ["v"], key_cols=["k"]).orderBy("ts")
    rows = out.collect()
    assert [r["v"] for r in rows] == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    assert rows[1]["ts"] == _ts(0, 15)
    assert rows[-1]["ts"] == _ts(2)  # final observation passes through


def test_upsample_linear_irregular_gap(spark):
    # 90-minute gap: subdivided by elapsed time, not assumed uniform
    df = spark.createDataFrame(
        [(_ts(0), 0.0), (_ts(1, 30), 3.0)], ["ts", "v"]
    )
    out = upsample_linear(df, 1800, ["v"]).orderBy("ts").collect()
    assert [(r["ts"], r["v"]) for r in out] == [
        (_ts(0), 0.0),
        (_ts(0, 30), 1.0),
        (_ts(1, 0), 2.0),
        (_ts(1, 30), 3.0),
    ]
