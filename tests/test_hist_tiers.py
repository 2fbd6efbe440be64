"""Histogram tier partials: exact quantiles from materialized
value-count histograms, composition across tiers, parity vs numpy's
discrete-percentile convention.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tstoolbox_spark.datagen import generate_sequences
from tstoolbox_spark.pipeline import rollup
from tstoolbox_spark.timeaxis import with_time_axis

N = 4000


@pytest.fixture(scope="module")
def seq(spark):
    df = with_time_axis(generate_sequences(spark, N, partitions=4))
    df.persist().count()
    return df


def _disc(vals, q):
    """percentile_disc: smallest value with cumulative count >= ceil(q*n)."""
    s = sorted(vals)
    r = max(math.ceil(q * len(s)), 1)
    return s[r - 1]


def test_hist_quantiles_match_percentile_disc(spark, seq):
    hist = rollup.hist_base(seq, "1d")
    got = {
        (r["source"], r["ts"]): (r["p50"], r["p90"], r["p99"])
        for r in rollup.hist_quantiles(hist, (0.5, 0.9, 0.99)).collect()
    }
    pdf = seq.toPandas()
    pdf["day"] = pdf["ts"].dt.floor("D")
    for (src, day), grp in pdf.groupby(["source", "day"]):
        vals = grp["n_tok"].to_numpy()
        exp = tuple(_disc(vals, q) for q in (0.5, 0.9, 0.99))
        assert got[(src, day)] == exp, (src, day)


def test_hist_cascade_composes_losslessly(spark, seq):
    # day-from-hour must equal day-direct, bit for bit
    via_hour = rollup.hist_cascade(rollup.hist_base(seq, "1h"), "1d")
    direct = rollup.hist_base(seq, "1d")
    assert via_hour.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_hour).count() == 0
    # and so must the quantiles read from them
    a = rollup.hist_quantiles(via_hour).orderBy("source", "ts").collect()
    b = rollup.hist_quantiles(direct).orderBy("source", "ts").collect()
    assert a == b


def test_hist_partial_is_domain_bounded(spark, seq):
    # the scale property: rows per (key, bucket) <= |value domain|
    hist = rollup.hist_base(seq, "1d")
    per_bucket = hist.groupBy("source", "ts").count()
    assert per_bucket.agg({"count": "max"}).collect()[0][0] <= 512


def test_hist_monthly_cascade(spark, seq):
    monthly = rollup.hist_cascade(rollup.hist_base(seq, "1d"), "1mo")
    q = rollup.hist_quantiles(monthly, (0.5,)).collect()
    pdf = seq.toPandas()
    vals = pdf["n_tok"].to_numpy()
    # January-only axis in the generator: one month bucket per source
    assert {r["ts"].month for r in q} == {1}
    allv = np.concatenate(
        [pdf[pdf["source"] == r["source"]]["n_tok"].to_numpy() for r in q]
    )
    assert len(allv) == N
    for r in q:
        src_vals = pdf[pdf["source"] == r["source"]]["n_tok"].to_numpy()
        assert r["p50"] == _disc(src_vals, 0.5)
