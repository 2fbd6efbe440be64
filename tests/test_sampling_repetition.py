"""Tests for deterministic sampling / mixture weighting and the
Gopher repetition rules (hand-built oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.textops.quality import repetition_flags, vocab_topk
from tstoolbox_spark.textops.sampling import (
    SAMPLE_MOD,
    hash_sample,
    mixture_rates,
    mixture_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
    )


def test_hash_sample_deterministic_and_partitioning_independent(corpus):
    a = sorted(r.doc_id for r in hash_sample(corpus, 0.3).collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(corpus.repartition(13), 0.3).collect()
    )
    assert a == b
    # ~30% with hash-uniform tolerance
    assert 0.25 * 2000 < len(a) < 0.35 * 2000


def test_hash_sample_subset_property(corpus):
    """A smaller fraction is a strict subset of a larger one (same
    salt) — the property that makes sampled corpora shrinkable
    without re-drawing."""
    small = {r.doc_id for r in hash_sample(corpus, 0.1).collect()}
    large = {r.doc_id for r in hash_sample(corpus, 0.4).collect()}
    assert small <= large


def test_hash_sample_salt_decorrelates(corpus):
    a = {r.doc_id for r in hash_sample(corpus, 0.5, salt="a").collect()}
    b = {r.doc_id for r in hash_sample(corpus, 0.5, salt="b").collect()}
    inter = len(a & b) / min(len(a), len(b))
    assert 0.3 < inter < 0.7  # independent draws overlap ~fraction


def test_hash_sample_bounds(corpus):
    assert hash_sample(corpus, 0.0).count() == 0
    assert hash_sample(corpus, 1.0).count() == 2000
    with pytest.raises(ValueError):
        hash_sample(corpus, 1.5)


def test_stratified_sample_per_stratum(corpus):
    out = (
        stratified_sample(corpus, {"0": 1.0, "1": 0.2}, default_fraction=0.0)
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r.source: r["count"] for r in out}
    assert got["0"] == 500
    assert 60 < got.get("1", 0) < 140
    assert "2" not in got and "3" not in got


def test_mixture_rates_and_sample(corpus):
    # equal strata of 500; target 3:1 over sources 0/1 → source 0 is
    # binding (rate 1.0), source 1 downsampled to ~1/3
    rates = mixture_rates(corpus, {"0": 3, "1": 1})
    assert rates["0"] == 1.0
    assert abs(rates["1"] - 1 / 3) < 1e-9
    out = mixture_sample(corpus, {"0": 3, "1": 1})
    got = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert got["0"] == 500
    assert abs(got["1"] - 500 / 3) < 40
    with pytest.raises(ValueError):
        mixture_rates(corpus, {"0": 1, "nope": 1})


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict() for r in repetition_flags(df).collect()
    }


def test_repetition_flags_oracle(spark):
    got = _rep(
        spark,
        [
            # 4 lines, "same line" twice → dup mass 2/4; grams span lines
            (1, "alpha beta\nsame line\nsame line\ngamma delta"),
            # all-distinct words → no duplicate mass anywhere
            (2, "one two three four five six seven eight nine ten"),
            # pure repetition → every fraction 1.0
            (3, "spam spam spam spam spam spam spam spam"),
            (4, ""),  # empty doc stays present, keep=True
        ],
    )
    assert got[1]["dup_line_frac"] == 0.5
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["dup5gram_char_frac"] == 0.0
    # top 2-gram of doc 2: every bigram count 1, tie → lexicographically
    # greatest ("two three", 9 chars); total bigram chars = 81
    assert got[2]["top2gram_char_frac"] == round(9 / 81, 6)
    assert got[3]["top2gram_char_frac"] == 1.0
    assert got[3]["dup5gram_char_frac"] == 1.0
    assert got[3]["keep"] is False
    assert got[4]["keep"] is True and got[4]["dup_line_frac"] == 0.0


def test_repetition_flags_thresholds(spark):
    # a clean longish document passes every Gopher repetition rule
    text = " ".join(f"word{i} filler{i * 7 % 13}" for i in range(60))
    got = _rep(spark, [(1, text)])
    assert got[1]["keep"] is True


def test_vocab_topk(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b d")], "doc_id long, text string"
    )
    rows = vocab_topk(df, 3).collect()
    assert [(r.w, r.c) for r in rows] == [("a", 3), ("b", 3), ("c", 1)]
    assert rows[0].coverage == round(3 / 8, 6)


def test_sample_mod_granularity():
    assert SAMPLE_MOD == 1 << 20


def test_bigram_logprob(spark):
    """Hand oracle on a 2-doc corpus with add-1 smoothing."""
    import math

    from tstoolbox_spark.textops.quality import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1 ; left counts: a->3, b->2
    # vocab = {a,b,c,x} = 4
    rows = {r.doc_id: r.asDict() for r in bigram_logprob(df).collect()}
    p_ab = math.log((3 + 1.0) / (3 + 4.0))
    p_ba = math.log((1 + 1.0) / (2 + 4.0))
    p_bc = math.log((1 + 1.0) / (2 + 4.0))
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["mean_bigram_logprob"] == round((2 * p_ab + p_ba) / 3, 6)
    assert rows[2]["n_bigrams"] == 2
    assert rows[2]["mean_bigram_logprob"] == round((p_ab + p_bc) / 2, 6)
    assert rows[3]["n_bigrams"] == 0 and rows[3]["mean_bigram_logprob"] is None


def test_assign_split_deterministic_and_stable(spark):
    import pyspark.sql.functions as F

    from tstoolbox_spark.textops.sampling import assign_split

    df = spark.createDataFrame([("d%04d" % i,) for i in range(2000)], "doc_id string")
    out = assign_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # roughly proportional (md5 uniformity at n=2000)
    assert abs(counts["train"] - 1600) < 120 and abs(counts["val"] - 200) < 70
    # subset stability: splitting a subset never moves a doc
    sub = assign_split(df.limit(500), {"train": 0.8, "val": 0.1, "test": 0.1})
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        assign_split(df, {"a": 0.9, "b": 0.2})
