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


def test_shard_assign_balance_and_determinism(spark):
    """Serpentine assignment: every shard total within one max-doc of
    the mean; output identical under different input partitioning."""
    import pandas as pd

    from tstoolbox_spark.textops.packing import shard_assign

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "doc_id": np.arange(1000),
        "n_tok": rng.integers(10, 5000, 1000),
    })
    df = spark.createDataFrame(pdf)
    out = shard_assign(df, 16).toPandas()
    assert sorted(out.columns) == ["doc_id", "n_tok", "shard"]
    assert out["shard"].between(0, 15).all()
    totals = out.groupby("shard")["n_tok"].sum()
    assert len(totals) == 16
    assert totals.max() - totals.min() <= pdf["n_tok"].max()

    again = shard_assign(df.repartition(13), 16).toPandas()
    merged = out.merge(again, on="doc_id", suffixes=("", "_b"))
    assert (merged["shard"] == merged["shard_b"]).all()


def test_shard_assign_matches_rownumber_serpentine(spark):
    import pandas as pd

    from tstoolbox_spark.textops.packing import shard_assign

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "doc_id": np.arange(200),
        "n_tok": rng.integers(1, 50, 200),  # heavy ties
    })
    out = shard_assign(spark.createDataFrame(pdf), 7).toPandas()
    ref = pdf.sort_values(["n_tok", "doc_id"]).reset_index(drop=True)
    i = np.arange(len(ref))
    pos, block = i % 7, i // 7
    ref["shard"] = np.where(block % 2 == 0, pos, 6 - pos)
    merged = out.merge(ref, on="doc_id", suffixes=("", "_ref"))
    assert (merged["shard"] == merged["shard_ref"]).all()


def test_shard_assign_validates(spark):
    import pandas as pd
    import pytest

    from tstoolbox_spark.textops.packing import shard_assign

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "n_tok": [5]}))
    with pytest.raises(ValueError):
        shard_assign(df, 0)
