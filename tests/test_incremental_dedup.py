"""Incremental near-dup cluster maintenance: batched updates must be
IDENTICAL to a from-scratch rebuild over the union corpus (same band
geometry, same verify, order-independent min-label CC), touched-only
recompute must actually carry untouched rows through, and the
two-table state commit must be atomic."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.pipeline.incremental_dedup import (
    BANDS_TABLE,
    CLUSTERS_TABLE,
    commit_dedup_state,
    incremental_near_dup_update,
)
from tstoolbox_spark.tables import ParquetSnapshotCatalog
from tstoolbox_spark.textops.dedup import minhash_lsh_dedup, near_dup_clusters


def _family(tag: str, base: str, n: int) -> list[tuple[str, str]]:
    """n near-dup variants of one base sentence (high bigram overlap)."""
    out = [(f"{tag}0", base)]
    words = base.split()
    for i in range(1, n):
        w = list(words)
        w[3 + (i % 3)] = f"tok{i}"
        out.append((f"{tag}{i}", " ".join(w)))
    return out


BASE_A = "the quick brown fox jumps over the lazy dog near the river bank today"
BASE_B = "a completely different story about spark engines shuffling data across wide clusters"
BASE_C = "numerical weather prediction models assimilate satellite observations every six hours routinely"


def _mk(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _clusters_pdf(df):
    return (
        df.select("doc_id", "cluster", "keeper")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus():
    fam_a = _family("a", BASE_A, 5)
    fam_b = _family("b", BASE_B, 4)
    fam_c = _family("c", BASE_C, 4)
    lone = [("z1", "one tiny unique document"), ("z2", "another singleton entirely")]
    return fam_a + fam_b + fam_c + lone


def _run_batches(spark, batches, **kw):
    old_docs = old_bands = old_clusters = None
    for batch in batches:
        nb, clusters = incremental_near_dup_update(
            batch, old_docs=old_docs, old_bands=old_bands,
            old_clusters=old_clusters, **kw,
        )
        nb = nb.localCheckpoint()
        clusters = clusters.localCheckpoint()
        old_bands = nb if old_bands is None else old_bands.unionByName(nb)
        old_docs = batch if old_docs is None else old_docs.unionByName(batch)
        old_clusters = clusters
    return old_clusters


def test_batches_equal_full_rebuild(spark, corpus):
    full_df = _mk(spark, corpus)
    # batches deliberately split every family across arrival order
    b1 = _mk(spark, corpus[0:3] + corpus[5:7] + [corpus[13]])
    b2 = _mk(spark, corpus[3:5] + corpus[7:9] + corpus[9:11])
    b3 = _mk(spark, [corpus[11], corpus[12], corpus[14]])
    assert b1.count() + b2.count() + b3.count() == len(corpus)

    inc = _clusters_pdf(_run_batches(spark, [b1, b2, b3]))
    full = _clusters_pdf(near_dup_clusters(full_df))
    pd.testing.assert_frame_equal(inc, full)


def test_bridge_merges_two_committed_clusters(spark):
    """A batch doc similar to members of two separate committed
    clusters must merge them into one component labeled by the global
    min id — including members not incident to any new edge. The
    bridge is the concatenation of the two (bigram-disjoint) family
    backbones: J(bridge, a0) = J(bridge, m0) = 13/27 ≈ 0.48, while
    J(a*, m*) = 0 — so at threshold 0.4 only the bridge connects
    them (Jaccard is not transitive; this is the canonical case).
    Band geometry (16,1) makes candidate recall at J~0.42 effectively
    certain (1-(1-J)^16), so the merge is structural, not luck."""
    thr, geo = 0.4, {"bands": 16, "rows": 1}
    left = _family("a", BASE_A, 3)           # cluster a0
    right = _family("m", BASE_C, 3)          # cluster m0 (disjoint words)
    b1 = _mk(spark, left + right)
    bridge = [("k_bridge", BASE_A + " " + BASE_C)]
    b2 = _mk(spark, bridge)

    nb1, c1 = incremental_near_dup_update(b1, threshold=thr, **geo)
    nb1, c1 = nb1.localCheckpoint(), c1.localCheckpoint()
    pre = _clusters_pdf(c1)
    pre_clusters = set(pre["cluster"])
    assert {"a0", "m0"} <= pre_clusters  # two separate components

    _, c2 = incremental_near_dup_update(
        b2, old_docs=b1, old_bands=nb1, old_clusters=c1, threshold=thr,
        **geo,
    )
    post = _clusters_pdf(c2)
    # full-rebuild oracle on the union
    union = b1.unionByName(b2)
    from tstoolbox_spark.textops.dedup import minhash_lsh_dedup
    full_pairs = minhash_lsh_dedup(union, threshold=thr, **geo)
    oracle = _clusters_pdf(near_dup_clusters(union, pairs=full_pairs))
    pd.testing.assert_frame_equal(post, oracle)
    # and the two families actually merged through the bridge
    merged = set(
        post.loc[post["doc_id"].isin(["a0", "m0", "k_bridge"]), "cluster"]
    )
    assert merged == {"a0"}


def test_no_edge_batch_is_pure_append(spark):
    """A batch with no near-dups against anything keeps every
    committed row byte-identical and appends singletons."""
    b1 = _mk(spark, _family("a", BASE_A, 3))
    nb1, c1 = incremental_near_dup_update(b1)
    nb1, c1 = nb1.localCheckpoint(), c1.localCheckpoint()
    b2 = _mk(spark, [("q1", "entirely novel content nothing shared"),
                     ("q2", "second novel doc with fresh words only")])
    _, c2 = incremental_near_dup_update(
        b2, old_docs=b1, old_bands=nb1, old_clusters=c1
    )
    post = _clusters_pdf(c2)
    pre = _clusters_pdf(c1)
    pd.testing.assert_frame_equal(
        post[post["doc_id"].str.startswith("a")].reset_index(drop=True), pre
    )
    newrows = post[post["doc_id"].str.startswith("q")]
    assert (newrows["cluster"] == newrows["doc_id"]).all()
    assert newrows["keeper"].all()


def test_state_validation_errors(spark):
    b = _mk(spark, [("x", "hello world text")])
    with pytest.raises(ValueError, match="both"):
        incremental_near_dup_update(b, old_bands=b.select(
            F.col("doc_id").alias("doc"), F.lit(0).alias("band"),
            F.lit("h").alias("bh")))
    with pytest.raises(ValueError, match="old_docs"):
        incremental_near_dup_update(
            b,
            old_bands=b.select(F.col("doc_id").alias("doc"),
                               F.lit(0).alias("band"), F.lit("h").alias("bh")),
            old_clusters=b.select("doc_id", F.col("doc_id").alias("cluster"),
                                  F.lit(True).alias("keeper")),
        )


def test_commit_group_state_and_lineage(spark, tmp_path, corpus):
    cat = ParquetSnapshotCatalog(str(tmp_path / "dedup_state"))
    b1 = _mk(spark, corpus[0:8])
    b2 = _mk(spark, corpus[8:])
    nb1, c1 = incremental_near_dup_update(b1)
    commit_dedup_state(spark, cat, nb1, c1, batch_unit="batch-1")
    ob = cat.read(spark, BANDS_TABLE)
    oc = cat.read(spark, CLUSTERS_TABLE)
    nb2, c2 = incremental_near_dup_update(
        b2, old_docs=b1, old_bands=ob, old_clusters=oc
    )
    commit_dedup_state(spark, cat, nb2, c2, batch_unit="batch-2")

    clusters = cat.read(spark, CLUSTERS_TABLE)
    oracle = _clusters_pdf(near_dup_clusters(_mk(spark, corpus)))
    pd.testing.assert_frame_equal(_clusters_pdf(clusters), oracle)
    # band table holds every doc's band rows exactly once per band
    per_doc = (cat.read(spark, BANDS_TABLE)
               .groupBy("doc").count().select("count").distinct().collect())
    assert len(per_doc) == 1
    # two lineage rows, distinct units, rows_out = corpus size at commit
    lin = cat.read(spark, "lineage").filter(
        F.col("stage") == f"dedup:{CLUSTERS_TABLE}")
    rows = {r["unit"]: r["rows_out"] for r in lin.collect()}
    assert set(rows) == {"batch-1", "batch-2"}
    assert rows["batch-2"] == len(corpus)


def test_continuous_near_dup_clusters(spark, tmp_path, corpus):
    """Streaming twin: micro-batches (maxFilesPerTrigger=1) fold into
    the committed state; final clusters == full rebuild; a restart
    with the same checkpoint processes only newly-arrived files; a
    full replay under a fresh checkpoint is a lineage-keyed no-op."""
    import os

    from tstoolbox_spark.pipeline.incremental_dedup import (
        CORPUS_TABLE,
        continuous_near_dup_clusters,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    cat = ParquetSnapshotCatalog(str(tmp_path / "state"))
    ck = str(tmp_path / "ck")

    first, second, third = corpus[0:6], corpus[6:12], corpus[12:]
    _mk(spark, first).coalesce(1).write.parquet(in_dir + "/f1")
    _mk(spark, second).coalesce(1).write.parquet(in_dir + "/f2")

    # streaming file source wants a flat dir of parquet files
    # (subdirs per batch keep the writes atomic); publish = copy in
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)

    def publish(sub):
        for f in glob.glob(in_dir + f"/{sub}/*.parquet"):
            shutil.copy(f, flat)

    publish("f1")
    publish("f2")
    q = continuous_near_dup_clusters(
        spark, flat, cat, ck, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    got = _clusters_pdf(cat.read(spark, CLUSTERS_TABLE))
    oracle = _clusters_pdf(near_dup_clusters(_mk(spark, first + second)))
    pd.testing.assert_frame_equal(got, oracle)

    # resume with the SAME checkpoint: only the new file is processed
    _mk(spark, third).coalesce(1).write.parquet(in_dir + "/f3")
    publish("f3")
    lineage_before = cat.read(spark, "lineage").count()
    q = continuous_near_dup_clusters(spark, flat, cat, ck,
                                     max_files_per_trigger=1)
    q.awaitTermination(180)
    got = _clusters_pdf(cat.read(spark, CLUSTERS_TABLE))
    oracle = _clusters_pdf(near_dup_clusters(_mk(spark, corpus)))
    pd.testing.assert_frame_equal(got, oracle)
    assert cat.read(spark, CORPUS_TABLE).count() == len(corpus)
    lineage_after = cat.read(spark, "lineage").count()
    assert lineage_after > lineage_before

    # full replay under a LOST (fresh) checkpoint: every micro-batch
    # unit already has a lineage row, so the fold is a no-op and the
    # state snapshots do not advance
    snap_c = cat.current_snapshot("dedup_clusters")["id"]
    q = continuous_near_dup_clusters(spark, flat, cat, str(tmp_path / "ck2"),
                                     max_files_per_trigger=1)
    q.awaitTermination(180)
    assert cat.current_snapshot("dedup_clusters")["id"] == snap_c
