"""Curation pipeline: the funnel removes what each stage should
remove, every stage commits with lineage, a re-run resumes from the
committed tables, and packed sequences reconstruct per split."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.pipeline.curate import (
    CurationSpec,
    curate_corpus,
    funnel_report,
    hash_tokenize,
)
from tstoolbox_spark.tables import ParquetSnapshotCatalog

EVAL_PASSAGE = ("held out evaluation passage appears verbatim in this "
                "document text tonight")


def _make_doc(i: int) -> str:
    """~60 words, Gopher-compliant (>=50 words, mean word length in
    band, >=2 stopwords, alphabetic), with a per-doc vocabulary so
    distinct docs are NOT near-dups of each other (only the 5-word
    stopword scaffold is shared)."""
    scaffold = ["the", "tale", "and", "journey", "of"]
    uniq = [f"item{i}{chr(97 + j)}" for j in range(55)]
    return " ".join(scaffold + uniq)


@pytest.fixture()
def docs(spark):
    rows = []
    # 8 good distinct docs from two sources
    for i in range(8):
        rows.append((f"g{i}", _make_doc(i), "web" if i % 2 else "books"))
    # exact duplicate of g0 (different id, same text)
    rows.append(("dup_exact", _make_doc(0), "web"))
    # near duplicate of g1 (one word changed -> jaccard ~ 0.95)
    rows.append(("dup_near", _make_doc(1).replace("item1c", "changed"),
                 "web"))
    # junk that fails the Gopher word-count floor
    rows.append(("junk_short", "tiny", "web"))
    # contaminated: a distinct good doc carrying the eval passage
    rows.append(("leak", _make_doc(8) + " " + EVAL_PASSAGE, "books"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )


@pytest.fixture()
def eval_df(spark):
    return spark.createDataFrame(pd.DataFrame(
        [("e1", EVAL_PASSAGE)], columns=["doc_id", "text"]))


def test_curation_funnel(spark, tmp_path, docs, eval_df):
    cat = ParquetSnapshotCatalog(str(tmp_path / "curate"))
    spec = CurationSpec(seq_len=32, vocab_size=1000,
                        splits={"train": 0.8, "val": 0.2})
    report = curate_corpus(spark, docs, cat, spec, eval_df=eval_df)

    assert report["input"]["rows"] == 12
    # exact dedup removes dup_exact
    assert report["exact_dedup"]["rows"] == 11
    # near dedup removes one of (g1, dup_near) — keep-best by length,
    # tie -> smaller id
    assert report["near_dedup"]["rows"] == 10
    kept = {r["doc_id"] for r in
            cat.read(spark, "curate_near_dedup").collect()}
    assert ("g1" in kept) != ("dup_near" in kept)
    # gopher filter removes junk_short
    assert report["quality"]["rows"] == 9
    assert "junk_short" not in {
        r["doc_id"] for r in cat.read(spark, "curate_quality").collect()}
    # decontamination removes leak, keeps everything else
    assert report["decontam"]["rows"] == 8
    assert "leak" not in {
        r["doc_id"] for r in cat.read(spark, "curate_decontam").collect()}

    # split is total and deterministic
    toks = cat.read(spark, "curate_tokens")
    assert toks.filter(F.col("split").isNull()).count() == 0
    assert set(r["split"] for r in toks.select("split").distinct().collect()) \
        <= {"train", "val"}

    # packed sequences reconstruct the token stream per split
    seqs = cat.read(spark, "curate_sequences")
    for split in [r["split"] for r in seqs.select("split").distinct().collect()]:
        flat_in = [
            t for r in toks.filter(F.col("split") == split)
            .orderBy("doc_id").collect() for t in r["tokens"]
        ]
        flat_out = [
            t for r in seqs.filter(F.col("split") == split)
            .orderBy("chunk_id").collect() for t in r["tokens"]
        ]
        assert flat_out == flat_in
        ntoks = [r["n_tok"] for r in seqs.filter(F.col("split") == split)
                 .orderBy("chunk_id").collect()]
        assert all(n <= 32 for n in ntoks)

    # funnel report reads from lineage
    fr = {r["stage"]: r["rows_out"] for r in funnel_report(spark, cat).collect()}
    assert fr["exact_dedup"] == 11 and fr["decontam"] == 8

    # resume: a second run recomputes nothing and reports identically
    # (pass-through stages — here mixture, with no target mixture —
    # are skipped, not materialized, on every run)
    report2 = curate_corpus(spark, docs, cat, spec, eval_df=eval_df)
    for stage, info in report2.items():
        if stage == "input":
            continue
        assert info.get("resumed") or info.get("skipped"), stage
        assert info["rows"] == report[stage]["rows"]
    assert report2["mixture"]["skipped"]
    import os as _os
    assert not _os.path.exists(str(tmp_path / "curate" / "curate_mixture"))


def test_mixture_stage(spark, tmp_path, docs):
    cat = ParquetSnapshotCatalog(str(tmp_path / "curate_mix"))
    spec = CurationSpec(mixture={"web": 0.5, "books": 0.5},
                        seq_len=64, vocab_size=500)
    report = curate_corpus(spark, docs, cat, spec)
    mixed = cat.read(spark, "curate_mixture")
    by_src = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # the scarcer source is kept whole; the other is downsampled toward
    # a 50/50 mixture (deterministic tickets — exact counts are fixed)
    assert set(by_src) == {"web", "books"}
    assert report["mixture"]["rows"] == sum(by_src.values())
    # deterministic tickets: both stage tables agree exactly on re-read
    assert report["mixture"]["rows"] <= report["quality"]["rows"]


def test_hash_tokenize_deterministic(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [("a", "Hello world 123!"), ("b", "")],
        columns=["doc_id", "text"]))
    out = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
           for r in hash_tokenize(df, 100).collect()}
    toks, n = out["a"]
    assert n == 4 and all(0 <= t < 100 for t in toks)  # Hello, world, 123, !
    again = {r["doc_id"]: list(r["tokens"])
             for r in hash_tokenize(df, 100).collect()}
    assert again["a"] == toks
    assert out["b"] == ([], 0)
