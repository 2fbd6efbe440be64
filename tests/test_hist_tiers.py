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


def test_hist_trimmed_mean_matches_sorted_drop(spark):
    import datetime as dt
    import random

    import pyspark.sql.functions as F

    from tstoolbox_spark.pipeline import rollup

    rng = random.Random(11)
    rows = []
    for keyi in range(3):
        for i in range(200):
            rows.append(
                (f"k{keyi}", dt.datetime(2024, 1, 1 + i % 5), rng.randint(1, 50))
            )
    df = spark.createDataFrame(rows, "source string, ts timestamp, n_tok int")
    hist = rollup.hist_base(df, "1d")
    out = {
        (r["source"], r["ts"]): r
        for r in rollup.hist_trimmed_mean(hist, trim=0.1).collect()
    }
    # reference: sort, drop floor(0.1*n) from each end
    from collections import defaultdict

    groups = defaultdict(list)
    for srcv, ts, v in rows:
        groups[(srcv, ts)].append(v)
    for k, vals in groups.items():
        vals.sort()
        lo = int(0.1 * len(vals))
        kept = vals[lo:len(vals) - lo]
        got = out[k]
        assert got["n_kept"] == len(kept)
        assert got["trimmed_mean"] == round(sum(kept) / len(kept), 6), k


def test_hist_trimmed_mean_validation_and_degenerate(spark):
    import datetime as dt

    import pytest

    from tstoolbox_spark.pipeline import rollup

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 5)], "source string, ts timestamp, n_tok int"
    )
    hist = rollup.hist_base(df, "1d")
    with pytest.raises(ValueError):
        rollup.hist_trimmed_mean(hist, trim=0.5)
    # trim=0 → plain mean
    r = rollup.hist_trimmed_mean(hist, trim=0.0).collect()[0]
    assert r["trimmed_mean"] == 5.0 and r["n_kept"] == 1


def test_hist_rebin_counts_add_and_reads_quantize(spark):
    import datetime as dt
    import pandas as pd
    from pyspark.sql import functions as F
    from tstoolbox_spark.pipeline.rollup import (
        hist_base,
        hist_quantiles,
        hist_rebin,
    )

    t0 = dt.datetime(2024, 3, 1)
    vals = list(range(1, 101))
    pdf = pd.DataFrame(
        {
            "source": ["s"] * 100,
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(100)],
            "n_tok": vals,
        }
    )
    h = hist_base(spark.createDataFrame(pdf), "1d")
    r = hist_rebin(h, 16)
    rows = {x["v"]: x["cnt"] for x in r.collect()}
    # totals preserved; bins are floor(v/16)*16
    assert sum(rows.values()) == 100
    assert rows[0] == 15 and rows[16] == 16 and rows[96] == 5
    # quantile read on the rebinned frame lands on a bin lower bound
    q = hist_quantiles(r, (0.5,)).collect()[0]
    assert q["p50"] % 16 == 0
