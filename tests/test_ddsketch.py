"""DDSketch tier partials: the alpha relative-error guarantee against
exact numpy quantiles, lossless cascade composition, and the
order-preserving signed bucket encoding.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.pipeline import ddsketch

TESTDATA = "/root/testdata/sf0.001"
ALPHA = 0.01


def _disc(vals, q):
    s = sorted(vals)
    r = max(math.ceil(q * len(s)), 1)
    return s[r - 1]


def test_ddsketch_relative_error_guarantee(spark):
    ev = spark.read.parquet(f"{TESTDATA}/events.parquet").select(
        F.col("event_type").alias("source"), "ts", F.col("value").alias("n_tok")
    )
    sk = ddsketch.ddsketch_base(ev, "1d", alpha=ALPHA)
    got = {
        (r["source"], r["ts"]): (r["p50"], r["p90"], r["p99"])
        for r in ddsketch.ddsketch_quantiles(sk, alpha=ALPHA).collect()
    }
    pdf = ev.toPandas()
    pdf["day"] = pdf["ts"].dt.floor("D")
    checked = 0
    for (src, day), grp in pdf.groupby(["source", "day"]):
        vals = grp["n_tok"].to_numpy()
        for est, q in zip(got[(src, day)], (0.5, 0.9, 0.99)):
            true = _disc(vals, q)
            if true != 0:
                assert abs(est - true) / abs(true) <= ALPHA, (src, day, q)
            else:
                assert est == 0.0
            checked += 1
    assert checked > 50


def test_ddsketch_cascade_composes(spark):
    ev = spark.read.parquet(f"{TESTDATA}/events.parquet").select(
        F.col("event_type").alias("source"), "ts", F.col("value").alias("n_tok")
    )
    daily = ddsketch.ddsketch_base(ev, "1d", alpha=ALPHA)
    via_daily = ddsketch.ddsketch_cascade(daily, "1mo")
    direct = ddsketch.ddsketch_base(ev, "1mo", alpha=ALPHA)
    assert via_daily.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_daily).count() == 0


def test_dd_bucket_is_monotone_and_sign_safe(spark):
    vals = [-100.0, -1.5, -0.01, 0.0, 0.007, 0.5, 1.0, 1.01, 2.0, 1e6]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    rows = (
        df.select("x", ddsketch.dd_bucket(F.col("x"), ALPHA).alias("b"))
        .orderBy("x")
        .collect()
    )
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)  # bucket keys order like values
    assert bs[3] == 0  # zero gets the reserved key
    # decode stays within alpha of every nonzero input
    dec = (
        df.where("x != 0")
        .select(
            "x",
            ddsketch.dd_value(
                ddsketch.dd_bucket(F.col("x"), ALPHA), ALPHA
            ).alias("e"),
        )
        .collect()
    )
    for r in dec:
        assert abs(r["e"] - r["x"]) / abs(r["x"]) <= ALPHA + 1e-12
