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


def _nfd_reference(pdf, cap):
    """Same NFD rule in plain pandas, per shard."""
    out = {}
    for shard, g in pdf.groupby("shard"):
        g = g.sort_values(["n_tok", "doc_id"], ascending=[False, True])
        b, fill, first = 0, 0, True
        for _, row in g.iterrows():
            sz = int(row["n_tok"])
            if not first and fill + sz > cap:
                b, fill = b + 1, 0
            first = False
            fill += sz
            out[row["doc_id"]] = (shard, b)
    return out


def test_pack_bins_invariants_and_reference_parity(spark):
    from tstoolbox_spark.textops.packing import pack_bins

    rng = np.random.RandomState(7)
    rows = [(int(i), int(rng.randint(10, 400))) for i in range(300)]
    # a couple of oversize docs
    rows += [(1000, 900), (1001, 2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = pack_bins(df, capacity=512, n_shards=4).toPandas()
    assert len(got) == len(rows)  # every doc assigned exactly once
    assert set(got["doc_id"]) == {r[0] for r in rows}
    # bin totals respect capacity except single-doc oversize bins
    for (shard, b), g in got.groupby(["shard", "bin"]):
        tot = g["n_tok"].sum()
        if tot > 512:
            assert len(g) == 1 and bool(g["oversize"].iloc[0])
    assert got["oversize"].sum() == 2
    # parity with the plain-pandas NFD reference on identical shards
    want = _nfd_reference(got[["doc_id", "n_tok", "shard"]], 512)
    for _, row in got.iterrows():
        assert want[row["doc_id"]] == (row["shard"], row["bin"])


def test_pack_bins_partitioning_independent(spark):
    from tstoolbox_spark.textops.packing import pack_bins

    rows = [(int(i), int((i * 37) % 300 + 20)) for i in range(200)]
    df1 = spark.createDataFrame(rows, "doc_id long, n_tok long")
    df2 = df1.repartition(13)
    a = pack_bins(df1, 256, n_shards=4).orderBy("doc_id").toPandas()
    b = pack_bins(df2, 256, n_shards=4).orderBy("doc_id").toPandas()
    assert (a[["doc_id", "shard", "bin"]].values == b[["doc_id", "shard", "bin"]].values).all()


def test_sliding_chunks_reconstruction_and_edges(spark):
    import pyspark.sql.types as T

    from tstoolbox_spark.textops.packing import sliding_chunks

    sch = T.StructType(
        [T.StructField("doc_id", T.StringType()),
         T.StructField("tokens", T.ArrayType(T.IntegerType()))]
    )
    rows = [
        ("d1", list(range(10))),   # 10 tokens, chunk 4 stride 2
        ("d2", [7]),               # single token
        ("d3", []),                # empty doc survives as one empty chunk
    ]
    df = spark.createDataFrame(rows, sch)
    out = sliding_chunks(df, 4, 2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc["d1"], key=lambda r: r["chunk_idx"])
    # python reference
    exp = []
    for start in range(0, 10, 2):
        exp.append((start // 2, start, list(range(10))[start:start + 4]))
    assert [(r["chunk_idx"], r["start"], r["tokens"]) for r in d1] == exp
    # every token position is covered by ≥1 chunk and overlap = chunk-stride
    assert by_doc["d2"][0]["tokens"] == [7] and by_doc["d2"][0]["n_chunk"] == 1
    assert by_doc["d3"][0]["tokens"] == [] and by_doc["d3"][0]["chunk_idx"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_chunks(df, 0, 2)


def test_sliding_chunks_min_tail_drop(spark):
    import pyspark.sql.types as T

    from tstoolbox_spark.textops.packing import sliding_chunks

    sch = T.StructType(
        [T.StructField("doc_id", T.StringType()),
         T.StructField("tokens", T.ArrayType(T.IntegerType()))]
    )
    df = spark.createDataFrame([("d1", list(range(9)))], sch)
    # stride 4, chunk 8: starts 0,4,8; tail at 8 has 1 token < min_tail=2 → dropped
    out = sliding_chunks(df, 8, 4, min_tail=2).collect()
    assert sorted(r["start"] for r in out) == [0, 4]
