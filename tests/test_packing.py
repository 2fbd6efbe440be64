"""chunk_pack_tokens: concat-and-chunk training-sequence packing."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tstoolbox_spark.operators.stats import distributed_prefix_sum
from tstoolbox_spark.textops.packing import chunk_pack_tokens


def test_distributed_prefix_sum_matches_window(spark):
    rows = [(f"k{i % 3}", i, (i * 7) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, ord int, v long")
    got = (
        distributed_prefix_sum(df, "v", ["key"], ["ord"], out_col="ps")
        .orderBy("key", "ord")
        .toPandas()
    )
    for key, grp in got.groupby("key"):
        grp = grp.sort_values("ord")
        exp = np.concatenate([[0], np.cumsum(grp["v"].to_numpy())[:-1]])
        np.testing.assert_array_equal(grp["ps"].to_numpy(), exp)


def test_chunk_pack_reconstructs_stream(spark):
    rng = np.random.RandomState(3)
    rows = []
    for src in ("a", "b"):
        for d in range(60):
            n = int(rng.randint(0, 40))  # includes empty docs
            rows.append((src, d, [int(x) for x in rng.randint(0, 1000, n)]))
    df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<int>")
    L = 16
    packed = chunk_pack_tokens(df, L, key_cols=["source"]).toPandas()
    for src in ("a", "b"):
        stream = [
            t
            for _, d, toks in sorted(r for r in rows if r[0] == src)
            for t in toks
        ]
        p = packed[packed.source == src].sort_values("chunk_id")
        # chunk ids are dense 0..m-1
        assert p["chunk_id"].tolist() == list(range(len(p)))
        # every chunk is exactly L tokens except the last
        sizes = p["n_tok"].tolist()
        assert all(s == L for s in sizes[:-1])
        assert 0 < sizes[-1] <= L
        # concatenating chunks reproduces the token stream exactly
        flat = [t for chunk in p["tokens"] for t in chunk]
        assert flat == stream


def test_chunk_pack_doc_larger_than_max_len(spark):
    df = spark.createDataFrame(
        [(0, list(range(50))), (1, [99, 98])], "doc_id long, tokens array<int>"
    )
    p = chunk_pack_tokens(df, 8).orderBy("chunk_id").toPandas()
    flat = [t for chunk in p["tokens"] for t in chunk]
    assert flat == list(range(50)) + [99, 98]
    assert p["n_tok"].tolist()[:-1] == [8] * (len(p) - 1)
