"""Eval-set decontamination: flag training documents sharing word
n-grams with a (much smaller) evaluation set.

The standard LM data-prep hygiene step (GPT-3 App. C / PaLM-style
13-gram decontamination; public methodology): build the eval side's
distinct n-gram set, broadcast it (eval sets are tiny next to the
corpus), and count per training document how many of its distinct
n-grams appear in it. One narrow pass over the corpus + one broadcast
semi-structure — the 100 TB shape: no corpus self-join, the corpus
shuffles only for its own per-doc aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_threshold: int = 1,
) -> DataFrame:
    """Per train doc: distinct n-grams, how many occur in the eval
    set, and the contaminated flag (hits >= flag_threshold).

    Exact string n-grams (normalized words) — collision-free; the eval
    gram set is broadcast, so the join is map-side.
    """
    ev = (
        eval_df.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tr = train.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    )
    joined = tr.join(F.broadcast(ev), "gram", "left")
    out = joined.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__hit").alias("eval_hits"),
    )
    return out.select(
        F.col("doc").alias(id_col),
        "n_grams",
        "eval_hits",
        (F.col("eval_hits") >= flag_threshold).alias("contaminated"),
    )
