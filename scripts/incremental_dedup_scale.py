#!/usr/bin/env python
"""Scale evidence for pipeline/incremental_dedup: per-batch fold cost
vs a from-scratch rebuild as the committed corpus grows.

The module's claim is per-batch cost O(batch + candidates + affected
clusters), not O(corpus). This script synthesizes a document corpus
with a planted near-dup rate, folds it in equal batches, and times
(a) each incremental fold and (b) a full rebuild over the cumulative
corpus after each batch. If the claim holds, fold time stays ~flat as
the corpus grows while rebuild time grows with it.

Synthetic text is deterministic (hash-vocab words keyed by doc index);
every 20th doc is a near-dup (one word changed) of the previous doc,
so cluster structure exists at every size.

Usage: python scripts/incremental_dedup_scale.py [n_docs] [n_batches]
Appends one JSON line to BENCH/incremental_dedup_scale.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tstoolbox_spark.pipeline.incremental_dedup import (  # noqa: E402
    incremental_near_dup_update,
)
from tstoolbox_spark.session import get_spark  # noqa: E402
from tstoolbox_spark.textops.dedup import near_dup_clusters  # noqa: E402


def synth_docs(spark, n: int, words_per_doc: int = 40):
    """Deterministic corpus: hash-vocab words per doc; every 20th
    doc is a near-dup of its predecessor (first word swapped)."""
    base = spark.range(0, n)
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(
                    # near-dups: doc 20k+1 copies doc 20k's word stream
                    (F.col("id") - F.when(F.col("id") % 20 == 1, 1)
                     .otherwise(0)).cast("string"),
                    i,
                ),
                F.lit(50_000),
            ).cast("string"),
        ),
    )
    first = F.when(F.col("id") % 20 == 1, F.lit("changed")).otherwise(
        F.element_at(words, 1)
    )
    text = F.concat_ws(
        " ", F.array_union(F.array(first), F.slice(words, 2, words_per_doc - 1))
    )
    return base.select(
        F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 10, "0")
                 ).alias("doc_id"),
        text.alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    wpd = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    spark = get_spark("inc_dedup_scale", parallelism=8, driver_memory="16g")
    docs = synth_docs(spark, n_docs, wpd).persist()
    docs.count()

    per = n_docs // n_batches
    old_docs = old_bands = old_clusters = None
    folds, rebuilds = [], []
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per if b < n_batches - 1 else n_docs
        batch = docs.filter(
            (F.col("doc_id") >= f"d{lo:010d}") & (F.col("doc_id") < f"d{hi:010d}")
        ).persist()
        batch.count()
        t0 = time.time()
        nb, cl = incremental_near_dup_update(
            batch, old_docs=old_docs, old_bands=old_bands,
            old_clusters=old_clusters,
        )
        nb = nb.localCheckpoint()
        cl = cl.localCheckpoint()
        folds.append(round(time.time() - t0, 2))
        old_bands = nb if old_bands is None else old_bands.unionByName(nb).localCheckpoint()
        old_docs = batch if old_docs is None else old_docs.unionByName(batch)
        old_clusters = cl

        cum = docs.filter(F.col("doc_id") < f"d{hi:010d}")
        t0 = time.time()
        near_dup_clusters(cum).count()
        rebuilds.append(round(time.time() - t0, 2))
        print(f"batch {b}: corpus={hi} fold={folds[-1]}s "
              f"rebuild={rebuilds[-1]}s", flush=True)

    final_inc = old_clusters.orderBy("doc_id").toPandas()
    final_full = near_dup_clusters(docs).orderBy("doc_id").toPandas()
    match = bool(final_inc.equals(final_full))
    dup_rate = float((~final_full["keeper"]).mean())
    rec = {
        "ts": time.time(), "n_docs": n_docs, "n_batches": n_batches, "words_per_doc": wpd,
        "fold_s": folds, "rebuild_s": rebuilds,
        "final_matches_full_rebuild": match,
        "dup_rate": round(dup_rate, 4),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "incremental_dedup_scale.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
