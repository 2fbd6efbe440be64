"""Training-sequence packing: concat-and-chunk tokenized documents
into fixed-length examples.

The standard LM data-prep step (concatenate every document's tokens in
a deterministic order, slice the stream into ``max_len``-token
training examples) re-expressed for Spark scale:

1. global token offset per doc = distributed EXCLUSIVE prefix sum of
   token counts over (key, order) — range-partitioned parallel cumsum
   (stats.distributed_prefix_sum), never a single-task key sort;
2. each doc explodes into the chunk ids its token span [off, off+n)
   overlaps (``sequence(floor(off/L), floor((off+n-1)/L))`` — at most
   n/L + 1 fragments, proportional work);
3. fragments regroup by (key, chunk_id); ``array_sort`` on the
   in-chunk offset restores stream order and ``flatten`` emits the
   packed example.

Everything is built-in column functions — no UDF, no driver data path;
the two shuffles (range partition, chunk regroup) move each token
once. A doc larger than max_len simply spans several chunks (no
truncation loss); every chunk is exactly max_len tokens except each
key's last.

No reference twin — tstoolbox has no token/packing surface; this is
part of the training-data extension (task brief), with the ``tokens``
payload axis of BASELINE.json.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.stats import distributed_prefix_sum


def chunk_pack_tokens(
    df: DataFrame,
    max_len: int,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Pack per-doc token arrays into fixed ``max_len`` examples.

    Returns (key_cols..., chunk_id, ``tokens_col`` packed array,
    n_tok). Deterministic given unique (key, order_col).
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    keys = list(key_cols)
    L = F.lit(int(max_len)).cast("long")
    base = df.select(*keys, order_col, F.col(tokens_col)).withColumn(
        "__n", F.size(tokens_col).cast("long")
    )
    base = distributed_prefix_sum(
        base, "__n", keys, [order_col], out_col="__off"
    ).filter(F.col("__n") > 0)
    off, n = F.col("__off"), F.col("__n")
    c0 = F.floor(off / L)
    c1 = F.floor((off + n - 1) / L)
    frags = base.select(
        *keys, off, n, F.col(tokens_col),
        F.explode(F.sequence(c0, c1)).alias("chunk_id"),
    )
    k = F.col("chunk_id")
    gstart = F.greatest(off, k * L)
    gend = F.least(off + n, (k + 1) * L)
    frag = F.slice(
        F.col(tokens_col),
        (gstart - off + 1).cast("int"),
        (gend - gstart).cast("int"),
    )
    packed = (
        frags.groupBy(*keys, "chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (gstart - k * L).cast("int").alias("o"),
                                frag.alias("f"),
                            )
                        )
                    ),
                    lambda s: s["f"],
                )
            ).alias(tokens_col)
        )
        .withColumn("n_tok", F.size(tokens_col))
    )
    return packed


def shard_assign(
    df: DataFrame,
    n_shards: int,
    size_col: str = "n_tok",
    id_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Assign documents to ``n_shards`` size-balanced training shards.

    Serpentine (boustrophedon) assignment over the global size rank:
    rank all docs by (size, id), walk shards 0..N-1 on even rank
    blocks and N-1..0 on odd blocks — the classic LPT-flavored
    balancing that keeps every shard's total within one max-doc of
    optimal, while staying fully declarative (no greedy driver loop).

    The global rank comes from stats.distributed_rank — quantile-
    bucketed parallel ranking, NO single-task global sort — so the
    assignment is deterministic, partitioning-independent, and scales
    to corpus sizes where ``row_number() OVER (ORDER BY ...)`` would
    straggle. Output: input columns + ``out_col`` (int in [0, N)).

    No reference twin (training-data extension, tokens axis); the
    DuckDB oracle is ``row_number() OVER (ORDER BY size, id)`` plus
    the same serpentine arithmetic.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from ..operators.stats import distributed_rank

    ranked = distributed_rank(
        df, size_col, tiebreak_cols=[id_col], out_col="__r"
    )
    i = F.col("__r") - F.lit(1)
    block = (i / F.lit(n_shards)).cast("long")  # i >= 0: trunc == floor
    pos = i % F.lit(n_shards)
    serp = F.when(block % 2 == 0, pos).otherwise(F.lit(n_shards - 1) - pos)
    return ranked.withColumn(out_col, serp.cast("int")).drop("__r")


def pack_bins(
    df: DataFrame,
    capacity: int,
    size_col: str = "n_tok",
    id_col: str = "doc_id",
    n_shards: int | None = None,
    shard_col: str = "shard",
    bin_col: str = "bin",
) -> DataFrame:
    """Whole-document training-example packing: assign docs to bins of
    at most ``capacity`` total size WITHOUT splitting any document —
    the no-truncation complement of :func:`chunk_pack_tokens` (which
    concatenates and slices). The packing rule is next-fit decreasing
    (NFD): within a shard, walk docs by (size desc, id) and open a new
    bin whenever the current doc no longer fits; decreasing order
    keeps per-bin waste ≤ the smallest doc seen so far (classic
    bin-packing bound, Johnson 1973 — public).

    Scale shape: bins never cross shards. Docs hash-shard by
    ``md5int(id) % n_shards`` (content-addressed — deterministic,
    partitioning-independent, subset-stable like
    ``sampling.hash_sample``), each shard packs independently in one
    grouped-map pandas pass (integer-only state → exact), and shards
    parallelize. Bin ids are (shard, local bin) pairs. Oversize docs
    (size > capacity) get a bin of their own and ``oversize=true`` —
    flag, don't drop (the caller decides truncate-vs-skip).

    Output: input columns + (shard int, bin long, oversize boolean).
    No reference twin (training-data extension, tokens axis)."""
    import pandas as pd

    from .dedup import md5int

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    spark = df.sparkSession
    ns = int(n_shards or spark.sparkContext.defaultParallelism)
    sharded = df.withColumn(
        shard_col,
        (md5int(F.col(id_col).cast("string")) % F.lit(ns)).cast("int"),
    )
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in sharded.schema.fields]
        + [f"{bin_col} long", "oversize boolean"]
    )
    cap = int(capacity)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(
            [size_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bins, fills, b, fill = [], [], 0, 0
        first = True
        for sz in g[size_col].astype("int64"):
            if not first and fill + sz > cap:
                b += 1
                fill = 0
            first = False
            fill += int(sz)
            bins.append(b)
            fills.append(fill)
        g[bin_col] = pd.Series(bins, dtype="int64")
        g["oversize"] = g[size_col].astype("int64") > cap
        return g

    return sharded.groupBy(shard_col).applyInPandas(_pack, out_schema)


def sliding_chunks(
    df: DataFrame,
    chunk_len: int,
    stride: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_tail: int = 1,
) -> DataFrame:
    """Overlapping sliding-window chunks per document — the RAG /
    long-context prep step (split each doc into ``chunk_len``-token
    windows every ``stride`` tokens, windows overlapping by
    ``chunk_len - stride``).

    Window starts are 0, stride, 2·stride, … while they cut NEW tokens
    (start < n); a final short tail shorter than ``min_tail`` tokens is
    dropped unless it is the document's only chunk.  Empty docs yield
    one empty chunk (chunk_idx 0) so no document disappears.

    Scale shape: a pure narrow explode (``sequence`` of starts +
    ``slice``) — no shuffle, no UDF, whole-stage codegen; output size
    is the standard overlap blow-up factor ≈ chunk_len/stride.

    Output: (id_col, chunk_idx, start, n_chunk, tokens).
    """
    if chunk_len < 1 or stride < 1:
        raise ValueError(f"chunk_len and stride must be ≥ 1, got {chunk_len}, {stride}")
    t = F.col(tokens_col)
    n = F.size(t)
    starts = F.when(n == 0, F.array(F.lit(0))).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(int(stride)))
    )
    ex = df.select(
        id_col, t.alias("__t"), F.explode(starts).alias("start")
    ).select(
        id_col,
        "start",
        F.slice(F.col("__t"), F.col("start") + 1, F.lit(int(chunk_len))).alias(
            tokens_col
        ),
    )
    out = ex.withColumn("n_chunk", F.size(tokens_col).cast("int")).where(
        (F.col("n_chunk") >= int(min_tail)) | (F.col("start") == 0)
    )
    return out.select(
        id_col,
        (F.col("start") / F.lit(int(stride))).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        "n_chunk",
        tokens_col,
    )
