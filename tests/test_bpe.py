"""BPE merge learning (textops/bpe.py) vs a pure-Python reference
implementation of Sennrich et al. 2016 semantics (left-to-right
non-overlapping greedy merge, ties by count DESC then pair ASC)."""

from __future__ import annotations

import random

import pyspark.sql.types as T

from tstoolbox_spark.textops.bpe import apply_merge, learn_bpe, pair_counts

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]
)


def py_apply_merge(seq, a, b, new_id):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def py_learn(corpus, n_merges, new_id_start):
    corpus = [list(s) for s in corpus]
    merges = []
    for rnd in range(1, n_merges + 1):
        counts = {}
        for s in corpus:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        new_id = new_id_start + rnd - 1
        merges.append((rnd, a, b, new_id, cnt))
        corpus = [py_apply_merge(s, a, b, new_id) for s in corpus]
    return merges, corpus


def test_apply_merge_overlap_and_edges(spark):
    rows = [
        ("d1", [7, 7, 7]),
        ("d2", [7, 7, 7, 7]),
        ("d3", [7]),
        ("d4", []),
        ("d5", [1, 7, 7, 2, 7, 7, 7]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["tokens"] for r in apply_merge(df, 7, 7, 99).collect()}
    for doc_id, seq in rows:
        assert got[doc_id] == py_apply_merge(seq, 7, 7, 99), doc_id


def test_apply_merge_distinct_pair(spark):
    rows = [("d%d" % i, [random.Random(i).randint(0, 4) for _ in range(30)]) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["tokens"] for r in apply_merge(df, 1, 2, 99).collect()}
    for doc_id, seq in rows:
        assert got[doc_id] == py_apply_merge(seq, 1, 2, 99), doc_id


def test_learn_bpe_matches_python_reference(spark):
    rng = random.Random(42)
    corpus = [[rng.randint(0, 7) for _ in range(rng.randint(0, 40))] for _ in range(60)]
    rows = [("d%03d" % i, s) for i, s in enumerate(corpus)]
    df = spark.createDataFrame(rows, SCHEMA)
    merges, out = learn_bpe(df, 5, new_id_start=100)
    exp_merges, exp_corpus = py_learn(corpus, 5, 100)
    assert [(m["rnd"], m["a"], m["b"], m["new_id"], m["pair_count"]) for m in merges] == exp_merges
    got = {r["doc_id"]: r["tokens"] for r in out.collect()}
    for (doc_id, _), exp in zip(rows, exp_corpus):
        assert got[doc_id] == exp, doc_id
    out.unpersist()


def test_pair_counts_empty_and_short(spark):
    df = spark.createDataFrame([("a", []), ("b", [5])], SCHEMA)
    assert pair_counts(df).count() == 0


def test_vocab_remap_order_oov_and_empty(spark):
    from tstoolbox_spark.textops.bpe import vocab_remap

    rows = [
        ("d1", [1, 2, 3, 1, 1, 2]),   # 1 x3, 2 x2, 3 x1
        ("d2", [3, 3]),               # ties: 3 now x3 total
        ("d3", []),
        ("d4", [9]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    # corpus counts: 1→3, 3→3, 2→2, 9→1; V=2 keeps {1, 3} (tie → id asc)
    out = {r["doc_id"]: r for r in vocab_remap(df, 2, unk_id=0).collect()}
    assert out["d1"]["tokens"] == [1, 0, 3, 1, 1, 0]
    assert out["d1"]["n_oov"] == 2 and out["d1"]["n_tok"] == 6
    assert out["d2"]["tokens"] == [3, 3] and out["d2"]["n_oov"] == 0
    assert out["d3"]["tokens"] == [] and out["d3"]["n_tok"] == 0
    assert out["d4"]["tokens"] == [0] and out["d4"]["n_oov"] == 1


def test_dsir_logweights_prefers_target_like_docs(spark):
    import pyspark.sql.types as T

    from tstoolbox_spark.textops.sampling import dsir_logweights

    sch = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("text", T.StringType())]
    )
    raw = spark.createDataFrame(
        [("t%d" % i, "alpha beta gamma") for i in range(5)]
        + [("r%d" % i, "delta epsilon zeta") for i in range(5)],
        sch,
    )
    target = raw.where("doc_id like 't%'")
    w = {r["doc_id"]: r["logw_q6"] for r in dsir_logweights(raw, target, n_buckets=64).collect()}
    # target-like docs must outscore non-target docs, and each group is uniform
    assert min(w[k] for k in w if k.startswith("t")) > max(w[k] for k in w if k.startswith("r"))
    assert len({w[k] for k in w if k.startswith("t")}) == 1


def test_span_corrupt_matches_python_reference(spark):
    import hashlib
    import math

    from tstoolbox_spark.textops.bpe import span_corrupt

    rows = [("d1", list(range(1, 14))), ("d2", [5, 6]), ("d3", [])]
    out = {
        r["doc_id"]: r
        for r in span_corrupt(
            spark.createDataFrame(rows, SCHEMA), span_len=3, rate=0.4, seed="s"
        ).collect()
    }

    def md5int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(doc_id, toks, span_len=3, rate=0.4, seed="s", base=60000):
        ns = math.ceil(len(toks) / span_len)
        flags = [
            md5int(f"{doc_id}-{g}-{seed}") % 1_000_000 < int(rate * 1_000_000)
            for g in range(ns)
        ]
        inp, tgt, k = [], [], 0
        for g in range(ns):
            sp = toks[g * span_len:(g + 1) * span_len]
            if flags[g]:
                inp.append(base + k)
                tgt += [base + k] + sp
                k += 1
            else:
                inp += sp
        return inp, tgt, ns, k

    for doc_id, toks in rows:
        ei, et, ens, ek = ref(doc_id, toks)
        r = out[doc_id]
        assert r["input_tokens"] == ei and r["target_tokens"] == et
        assert r["n_spans"] == ens and r["n_masked_spans"] == ek


def test_span_corrupt_rate_bounds_and_reconstruction(spark):
    import pytest as _pytest

    from tstoolbox_spark.textops.bpe import span_corrupt

    df = spark.createDataFrame([("d", [1, 2, 3])], SCHEMA)
    with _pytest.raises(ValueError):
        span_corrupt(df, span_len=0)
    with _pytest.raises(ValueError):
        span_corrupt(df, rate=1.5)
    # rate=0 → input == tokens, empty target; rate=1 → all spans masked,
    # target reconstructs the full token stream in order
    r0 = span_corrupt(df, span_len=2, rate=0.0).collect()[0]
    assert r0["input_tokens"] == [1, 2, 3] and r0["target_tokens"] == []
    r1 = span_corrupt(df, span_len=2, rate=1.0, sentinel_base=90).collect()[0]
    assert r1["input_tokens"] == [90, 91]
    assert r1["target_tokens"] == [90, 1, 2, 91, 3]
