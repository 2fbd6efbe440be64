"""Exact-substring dedup (Lee et al. 2022 shape) and PII redaction
against hand-built oracles."""

from __future__ import annotations

import pandas as pd
import pytest

from tstoolbox_spark.textops import pii, substring

# doc 1 and 2 share a 10-word boilerplate header; doc 3 repeats a
# 4-word phrase internally (below k=4? exactly k=4 twice); doc 4 is
# clean; doc 5 is shorter than k.
BOILER = "this software is provided as is without warranty of any"
DOCS = [
    (1, BOILER + " kind original research text one two three four five six"),
    (2, BOILER + " kind totally different body with unique words here now then"),
    (3, "alpha beta gamma delta padding words alpha beta gamma delta trailing"),
    (4, "completely unique document content nothing repeated anywhere at all today"),
    (5, "too short"),
]


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_substring_dedup_cross_doc(spark, docs_sdf):
    out = (
        substring.substring_dedup(docs_sdf, k=8, drop_threshold=0.5)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # docs 1/2 share an 11-word prefix -> windows at pos 1..4 duplicated
    # -> merged coverage pos 1..11 = 11 tokens
    for d in (1, 2):
        assert out.loc[d, "dup_spans"] == 4
        assert out.loc[d, "dup_tokens"] == 11
        assert out.loc[d, "max_dup_run"] == 11
    # clean doc & short doc
    assert out.loc[4, "dup_spans"] == 0
    assert out.loc[4, "dup_tokens"] == 0
    assert out.loc[5, "n_spans"] == 0
    assert out.loc[5, "dup_tokens"] == 0
    # ratio sanity: doc 1 has 20 words -> 11/20
    assert abs(out.loc[1, "dup_token_ratio"] - 11 / 20) < 1e-6
    assert bool(out.loc[1, "flag_exact_substring"]) is True
    assert bool(out.loc[4, "flag_exact_substring"]) is False


def test_substring_dedup_within_doc_repeat(spark, docs_sdf):
    # k=4: doc 3 repeats "alpha beta gamma delta" at pos 1 and 7 ->
    # two disjoint islands of 4 tokens each
    out = (
        substring.substring_dedup(docs_sdf, k=4)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[3, "dup_spans"] == 2
    assert out.loc[3, "dup_tokens"] == 8
    assert out.loc[3, "max_dup_run"] == 4


def test_remove_duplicate_spans(spark, docs_sdf):
    out = (
        substring.remove_duplicate_spans(docs_sdf, k=8)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: 11-token shared prefix removed, 8 unique tokens stay
    assert out.loc[1, "n_dropped_tokens"] == 11
    assert out.loc[1, "text"] == "original research text one two three four five six"
    assert out.loc[4, "n_dropped_tokens"] == 0
    assert out.loc[4, "text"].startswith("completely unique")
    # overlap merge: tokens dropped once, never double-counted
    assert (out["n_dropped_tokens"] >= 0).all()


PII_ROWS = [
    (1, "reach me at john.doe+spam@example.co.uk or call +1 (555) 010-4477 now"),
    (2, "server at 192.168.10.254 timed out, then 10.0.0.1 responded"),
    (3, "no sensitive data here, just the year 2024 and number 7"),
    (4, "a@b.io and 8.8.8.8 and 555-123-4567"),
]


@pytest.fixture(scope="module")
def pii_sdf(spark):
    return spark.createDataFrame(pd.DataFrame(PII_ROWS, columns=["doc_id", "text"]))


def test_pii_flags(spark, pii_sdf):
    out = pii.pii_flags(pii_sdf).toPandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_phone"] == 1
    assert out.loc[2, "n_ipv4"] == 2
    assert out.loc[3, "n_email"] == 0 and out.loc[3, "n_ipv4"] == 0
    assert not out.loc[3, "has_pii"]
    assert out.loc[4, "n_email"] == 1 and out.loc[4, "n_ipv4"] == 1
    assert out.loc[4, "n_phone"] == 1
    assert out.loc[4, "has_pii"]


def test_redact_pii(spark, pii_sdf):
    out = pii.redact_pii(pii_sdf).toPandas().set_index("doc_id").sort_index()
    assert "<EMAIL>" in out.loc[1, "text"] and "john.doe" not in out.loc[1, "text"]
    assert "<PHONE>" in out.loc[1, "text"] and "555" not in out.loc[1, "text"]
    assert out.loc[2, "text"].count("<IPV4>") == 2
    assert out.loc[3, "text"] == PII_ROWS[2][1]  # untouched
    assert "<EMAIL>" in out.loc[4, "text"] and "<IPV4>" in out.loc[4, "text"]
