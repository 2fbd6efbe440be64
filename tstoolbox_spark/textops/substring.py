"""Exact-substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — public methodology).

Doc-level exact/fuzzy dedup (dedup.py) misses *repeated long spans
across otherwise-distinct documents* (boilerplate, licenses, quoted
chunks). The paper's ExactSubstr pass drops any substring of >= k
tokens that occurs more than once in the corpus; its suffix-array
construction is single-node, so here the same semantics are reached
with a distributed rolling-window shape:

1. every k-word window (positional, NOT distinct) becomes a
   (doc, pos, span_hash) row — one explode, linear in corpus tokens;
2. span hashes with corpus occurrence count >= 2 are "duplicated
   spans" — one map-side-combinable groupBy on a 60-bit hash;
3. per document, duplicated positions merge into maximal covered
   intervals (interval union via a running-max window partitioned by
   doc), yielding exact duplicated-token coverage, the longest
   duplicated run, and a drop flag.

Scale shape: explode + groupBy + equi-join + per-doc window — the
same skeleton as dedup._exploded_shingles; no self-join, no all-pairs
product, every window partitioned by doc_id. Span hashing is md5 of
the joined word window (portable to the DuckDB oracle); a 60-bit
space holds ~10^12 spans with collision odds far below the dedup
decision noise floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5int, words


def _positional_spans(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(doc, pos, span, n_words): every k-word window with its 1-based
    start position. Docs shorter than k words emit no span rows."""
    w = words(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc"), w.alias("__w"))
    arr = F.col("__w")
    spans = F.when(
        F.size(arr) >= k,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(arr) - k + 1, F.lit(1))),
            lambda i: F.struct(
                i.alias("pos"),
                md5int(F.concat_ws(" ", F.slice(arr, i, k))).alias("span"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,span:bigint>>"))
    return base.select(
        "doc",
        F.size(arr).alias("n_words"),
        F.explode(spans).alias("s"),
    ).select("doc", "n_words", F.col("s.pos").alias("pos"), F.col("s.span").alias("span"))


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_occurrences: int = 2,
    drop_threshold: float = 0.5,
) -> DataFrame:
    """Per-document duplicated-span metrics, one row per input doc:

    - n_words, n_spans: word count and k-window count;
    - dup_spans: windows whose hash occurs >= min_occurrences times in
      the whole corpus (within-doc repeats count, per the paper);
    - dup_tokens: EXACT merged coverage — tokens inside the union of
      duplicated [pos, pos+k-1] intervals (running-max interval merge,
      so overlapping windows are not double-counted);
    - max_dup_run: the longest single merged duplicated run in tokens;
    - dup_token_ratio = dup_tokens / n_words;
    - flag_exact_substring: ratio >= drop_threshold.
    """
    sp = _positional_spans(df, text_col, id_col, k)
    dup = (
        sp.groupBy("span")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
        .select("span", F.lit(1).alias("__dup"))
    )
    marked = sp.join(dup, "span", "left")

    counts = marked.groupBy("doc").agg(
        F.first("n_words").alias("n_words"),
        F.count("*").alias("n_spans"),
        F.count("__dup").alias("dup_spans"),
    )

    # interval union over duplicated positions: a new island starts
    # when pos leaves the running-max covered end (+1 keeps touching
    # intervals merged); islands then aggregate to exact coverage.
    d = marked.filter(F.col("__dup").isNotNull()).select("doc", "pos")
    wspec = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "brk",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + k - 1).over(wspec), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    )
    d = d.withColumn(
        "island", F.sum("brk").over(Window.partitionBy("doc").orderBy("pos"))
    )
    isl = d.groupBy("doc", "island").agg(
        (F.max(F.col("pos") + k - 1) - F.min("pos") + 1).alias("run_tokens")
    )
    cov = isl.groupBy("doc").agg(
        F.sum("run_tokens").alias("dup_tokens"),
        F.max("run_tokens").alias("max_dup_run"),
    )

    # every input doc appears, including those with < k words
    all_docs = df.select(
        F.col(id_col).alias("doc"), F.size(words(F.col(text_col))).alias("nw_all")
    )
    out = (
        all_docs.join(counts, "doc", "left")
        .join(cov, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("nw_all").alias("n_words"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("max_dup_run", F.lit(0)).cast("long").alias("max_dup_run"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("nw_all"), F.lit(1)),
                6,
            ).alias("dup_token_ratio"),
            (
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("nw_all"), F.lit(1))
                >= drop_threshold
            ).alias("flag_exact_substring"),
        )
    )
    return out


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Rewrite each document with duplicated spans REMOVED (the
    paper's ExactSubstr-cut): tokens inside any duplicated >= k-window
    interval are dropped, survivors re-join with single spaces. Output
    (id_col, text, n_dropped_tokens); text is the normalized word
    stream (the op is defined on normalized tokens).

    Shape: the spans/dup/interval stages of substring_dedup plus one
    posexplode of words and a range-join-free anti filter — the word
    table joins islands on doc_id (co-partitioned) and a token is kept
    when no island covers its position; islands per doc are few, so
    the per-doc array intersect stays cheap.
    """
    sp = _positional_spans(df, text_col, id_col, k)
    dup = (
        sp.groupBy("span")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
        .select("span", F.lit(1).alias("__dup"))
    )
    d = sp.join(dup, "span", "left").filter(F.col("__dup").isNotNull()).select("doc", "pos")
    wspec = (
        Window.partitionBy("doc").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "brk",
        F.when(
            F.col("pos") > F.coalesce(F.max(F.col("pos") + k - 1).over(wspec), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    ).withColumn("island", F.sum("brk").over(Window.partitionBy("doc").orderBy("pos")))
    isl = (
        d.groupBy("doc", "island")
        .agg(F.min("pos").alias("lo"), F.max(F.col("pos") + k - 1).alias("hi"))
        .groupBy("doc")
        .agg(F.collect_list(F.struct("lo", "hi")).alias("cuts"))
    )
    base = df.select(F.col(id_col).alias("doc"), words(F.col(text_col)).alias("__w"))
    joined = base.join(isl, "doc", "left")
    covered = F.coalesce(F.col("cuts"), F.array().cast("array<struct<lo:int,hi:long>>"))
    kept = F.filter(
        F.transform(F.col("__w"), lambda x, i: F.struct((i + 1).alias("p"), x.alias("x"))),
        lambda s: ~F.exists(
            covered, lambda c: (s["p"] >= c["lo"]) & (s["p"] <= c["hi"])
        ),
    )
    return joined.select(
        F.col("doc").alias(id_col),
        F.concat_ws(" ", F.transform(kept, lambda s: s["x"])).alias("text"),
        (F.size(F.col("__w")) - F.size(kept)).cast("long").alias("n_dropped_tokens"),
    )
