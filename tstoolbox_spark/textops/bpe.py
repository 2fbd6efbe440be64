"""Distributed byte-pair-encoding (BPE) merge learning over token arrays.

Public methodology: Sennrich, Haddow & Birch 2016 ("Neural Machine
Translation of Rare Words with Subword Units") — iteratively replace the
most frequent adjacent token pair with a fresh token id.  This is the
inner loop of training a subword tokenizer, and at 100 TB it is the one
tokenizer stage that genuinely needs the cluster: the pair histogram is
a full-corpus aggregate.

Spark-first shape (per merge round):

* **pair counts** — explode adjacent pairs, one map-side-combined
  ``groupBy(a, b).count()``; the only shuffle of the round, and the
  combiner reduces it to (distinct pairs × partitions) rows.
* **top-1 selection** — a 1-row collect (metadata scale; ties broken by
  count DESC, a ASC, b ASC so the result is partitioning-independent).
* **merge apply** — a narrow whole-stage-codegen pass, no shuffle:

  - ``a != b``: matches can never overlap (a match at *i* and *i+1*
    would force ``b == a``), so the apply is a pure O(n)
    ``transform``+``filter`` over the token array.
  - ``a == b``: left-to-right non-overlap is genuinely sequential
    (``[a,a,a]`` merges the FIRST pair only), so the apply is a
    Catalyst ``aggregate`` fold carrying (out, pending) state.  Still
    JVM-side; O(n²) array-append per row, which is fine for document
    tokens and rare (same-token merges are the exception).

Rounds chain narrow plans; ``learn_bpe`` persists each round's frame
and unpersists the previous one so lineage stays one round deep (at
petabyte scale you would localCheckpoint every few rounds instead).

Reference scope note: the reference engine (the-real-werd/tstoolbox)
has no tokenizer-training verb — this is part of the training-data
pipeline extension family (like packing/dedup/contamination).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def adjacent_pairs(tokens: Column) -> Column:
    """array<struct<a,b>> of adjacent token pairs (empty for len<2)."""
    return F.transform(
        F.slice(tokens, F.lit(1), F.greatest(F.size(tokens) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("a"), F.element_at(tokens, i + 2).alias("b")
        ),
    )


def pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Adjacent-pair frequency table: (a, b, cnt).

    One explode + one groupBy with map-side partial aggregation —
    the canonical BPE statistics pass.
    """
    pairs = F.explode(adjacent_pairs(F.col(tokens_col))).alias("p")
    return (
        df.select(pairs)
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def apply_merge(
    df: DataFrame, a: int, b: int, new_id: int, tokens_col: str = "tokens"
) -> DataFrame:
    """Replace left-to-right non-overlapping occurrences of the
    adjacent pair (a, b) with new_id inside ``tokens_col``.

    Narrow (no shuffle); stays inside whole-stage codegen.
    """
    t = F.col(tokens_col)
    n = F.size(t)
    la, lb, ln = F.lit(int(a)), F.lit(int(b)), F.lit(int(new_id)).cast("int")
    if a != b:
        # non-overlapping by construction → vectorized O(n) path
        idx = F.sequence(F.lit(0), n - 1)

        def start(i: Column) -> Column:
            return (F.element_at(t, i + 1) == la) & (
                (i + 1 < n) & (F.element_at(t, i + 2) == lb)
            )

        mapped = F.transform(
            idx,
            lambda i: F.when(start(i), ln)
            .when((i > 0) & start(i - 1), F.lit(None).cast("int"))
            .otherwise(F.element_at(t, i + 1)),
        )
        merged = F.filter(mapped, lambda x: x.isNotNull())
        out = F.when(n < 2, t).otherwise(merged)
    else:
        # a == b: sequential left-to-right semantics ([a,a,a] → [new,a])
        # via a Catalyst fold with (out, pending) state — still JVM-side.
        def step(acc: Column, x: Column) -> Column:
            hit = acc["prev"].isNotNull() & (acc["prev"] == la) & (x == lb)
            return F.when(
                hit,
                F.struct(
                    F.concat(acc["out"], F.array(ln)).alias("out"),
                    F.lit(None).cast("int").alias("prev"),
                ),
            ).otherwise(
                F.struct(
                    F.when(
                        acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
                    )
                    .otherwise(acc["out"])
                    .alias("out"),
                    x.alias("prev"),
                )
            )

        zero = F.struct(
            F.array().cast("array<int>").alias("out"),
            F.lit(None).cast("int").alias("prev"),
        )
        out = F.aggregate(
            t,
            zero,
            step,
            lambda acc: F.when(
                acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
            ).otherwise(acc["out"]),
        )
    return df.withColumn(tokens_col, out)


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    tokens_col: str = "tokens",
    new_id_start: int = 50000,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns (merges, merged_df) where merges is a list of
    {rnd, a, b, new_id, pair_count} dicts (1-based rounds) and
    merged_df carries the token arrays after all merges.

    Each round costs one shuffle (the pair histogram) and a 1-row
    collect; the merge apply is narrow.  Stops early if no pair
    occurs at least twice.
    """
    cur = df.persist()
    merges: list[dict] = []
    try:
        for rnd in range(1, n_merges + 1):
            top = (
                pair_counts(cur, tokens_col)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < 2:
                break
            a, b, cnt = int(top[0]["a"]), int(top[0]["b"]), int(top[0]["cnt"])
            new_id = new_id_start + rnd - 1
            merges.append(
                {"rnd": rnd, "a": a, "b": b, "new_id": new_id, "pair_count": cnt}
            )
            nxt = apply_merge(cur, a, b, new_id, tokens_col).persist()
            nxt.count()  # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
    finally:
        pass
    return merges, cur


def token_vocab(
    df: DataFrame, vocab_size: int, tokens_col: str = "tokens"
) -> DataFrame:
    """Top-``vocab_size`` token ids by corpus frequency (ties broken by
    token id ASC).  One map-side-combined groupBy + a distributed
    takeOrdered — never a single-task global sort."""
    return (
        df.select(F.explode(tokens_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(vocab_size)
    )


def vocab_remap(
    df: DataFrame,
    vocab_size: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    unk_id: int = 0,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Remap every token outside the top-``vocab_size`` vocabulary to
    ``unk_id`` — the vocabulary-truncation stage of tokenizer training.

    Shape: posexplode → broadcast anti-membership against the (tiny)
    vocab frame → ordered re-collect per document.  The vocab side is
    ``vocab_size`` rows (metadata scale, explicitly broadcast); the
    corpus pays one explode + one groupBy(doc) shuffle, with each token
    moving exactly once.  Returns (id_col, tokens, n_tok, n_oov).

    Docs whose token array is empty survive with an empty array (the
    explode side uses posexplode_outer).
    """
    v = vocab if vocab is not None else token_vocab(df, vocab_size, tokens_col)
    v = v.select(F.col("tok").alias("__vtok"), F.lit(True).alias("__inv"))
    ex = df.select(
        id_col, F.posexplode_outer(tokens_col).alias("__pos", "__tok")
    )
    joined = ex.join(
        F.broadcast(v), ex["__tok"] == F.col("__vtok"), "left"
    ).select(
        id_col,
        "__pos",
        F.when(F.col("__pos").isNull(), F.lit(None).cast("int"))
        .when(F.col("__inv").isNotNull(), F.col("__tok"))
        .otherwise(F.lit(int(unk_id)).cast("int"))
        .alias("__mapped"),
        (F.col("__pos").isNotNull() & F.col("__inv").isNull()).cast("int").alias("__oov"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__pos").isNotNull(),
                            F.struct(F.col("__pos"), F.col("__mapped")),
                        )
                    )
                ),
                lambda s: s["__mapped"],
            ).alias(tokens_col),
            F.sum("__oov").cast("int").alias("n_oov"),
        )
        .withColumn("n_tok", F.size(tokens_col).cast("int"))
    )


def span_corrupt(
    df: DataFrame,
    span_len: int = 3,
    rate: float = 0.15,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    sentinel_base: int = 60000,
    seed: str = "",
) -> DataFrame:
    """T5-style span-corruption batch prep (Raffel et al. 2020 §3.1.4),
    fixed-grid deterministic variant: the token array is cut into
    ``span_len``-token grid spans; span g of a document is masked iff
    ``md5(doc_id-g-seed) mod 10⁶ < rate·10⁶``.  The encoder input
    replaces each masked span with one sentinel id (sentinel_base + k,
    k = masked-span ordinal within the doc); the decoder target is the
    concatenation of ``sentinel_k ++ span_tokens`` for every masked
    span — exactly the T5 objective, with hash tickets instead of RNG
    so the corruption is reproducible, partitioning-independent, and
    resumable (the same properties as ``sampling.hash_sample``).

    Pure column expressions, one narrow pass, no shuffle/UDF; per-span
    ordinals cost O(spans²) list work per doc (spans = n/span_len —
    cheap next to the token copy itself).

    Output: (id_col, input_tokens, target_tokens, n_spans,
    n_masked_spans).
    """
    if span_len < 1:
        raise ValueError(f"span_len must be ≥ 1, got {span_len}")
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    from .dedup import let, md5int

    thresh = int(rate * 1_000_000)
    t = F.col(tokens_col)
    did = F.col(id_col).cast("string")
    n_spans = F.ceil(F.size(t) / F.lit(int(span_len))).cast("int")

    def mask_flag(g: Column) -> Column:
        return (
            md5int(F.concat_ws("-", did, g.cast("string"), F.lit(seed)))
            % 1_000_000
            < thresh
        )

    # flags[g] for g in 0..n_spans-1 (empty docs → empty flags)
    flags = F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1), lambda g: mask_flag(g)
        ),
    ).otherwise(F.array().cast("array<boolean>"))

    def build(out_struct):
        # bind flags + tokens once; k(g) = masked spans before g
        return let(
            F.struct(flags.alias("f"), t.alias("tk")),
            lambda b: out_struct(
                b["f"],
                b["tk"],
            ),
        )

    def span_of(tk: Column, g: Column) -> Column:
        return F.slice(tk, g * span_len + 1, span_len)

    def k_before(f: Column, g: Column) -> Column:
        return F.size(F.filter(F.slice(f, 1, g), lambda x: x))

    def input_expr(f: Column, tk: Column) -> Column:
        return F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.size(f) - 1),
                lambda g: F.when(
                    F.element_at(f, g + 1),
                    F.array(
                        (F.lit(int(sentinel_base)) + k_before(f, g)).cast("int")
                    ),
                ).otherwise(span_of(tk, g)),
            )
        )

    def target_expr(f: Column, tk: Column) -> Column:
        return F.flatten(
            F.transform(
                F.filter(
                    F.sequence(F.lit(0), F.size(f) - 1),
                    lambda g: F.element_at(f, g + 1),
                ),
                lambda g: F.concat(
                    F.array(
                        (F.lit(int(sentinel_base)) + k_before(f, g)).cast("int")
                    ),
                    span_of(tk, g),
                ),
            )
        )

    empty = F.array().cast("array<int>")
    return df.select(
        id_col,
        F.when(n_spans > 0, build(input_expr)).otherwise(empty).alias(
            "input_tokens"
        ),
        F.when(n_spans > 0, build(target_expr)).otherwise(empty).alias(
            "target_tokens"
        ),
        F.coalesce(n_spans, F.lit(0)).alias("n_spans"),
        F.size(F.filter(flags, lambda x: x)).cast("int").alias("n_masked_spans"),
    )
