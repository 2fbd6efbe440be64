"""Incremental continuous-aggregate refresh (late-arriving data).

Semantics anchor: the refreshed tier must equal a FULL recompute of
tstoolbox ``aggregate`` over raw ∪ late
(/root/reference/tstoolbox/functions/aggregate.py:237-239) — here
asserted bit-for-bit against rollup_base over the unioned raw input.

Scale property under test: the catalog-level refresh rewrites ONLY the
day partitions the late batch touches; every untouched day directory of
the previous snapshot is carried by reference (Iceberg
``overwritePartitions`` semantics) — checked on the manifest itself.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.datagen import generate_sequences
from tstoolbox_spark.pipeline import incremental, rollup
from tstoolbox_spark.tables import ParquetSnapshotCatalog
from tstoolbox_spark.timeaxis import with_time_axis

N = 3000


@pytest.fixture(scope="module")
def seq(spark):
    df = with_time_axis(generate_sequences(spark, N, partitions=4))
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def split(seq):
    """On-time rows vs a 'late' slice (two specific days' worth)."""
    late_days = ("2024-01-05", "2024-01-06")
    is_late = F.date_format("ts", "yyyy-MM-dd").isin(*late_days)
    on_time = seq.where(~is_late)
    late = seq.where(is_late)
    assert late.count() > 0
    return on_time, late, late_days


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_incremental_refresh_equals_full_recompute(spark, seq, split):
    on_time, late, _ = split
    existing = rollup.rollup_base(on_time, "1m")
    refreshed = incremental.incremental_tier_refresh(existing, late, "1m")
    full = rollup.rollup_base(seq, "1m")
    assert _sorted_rows(refreshed) == _sorted_rows(full)


def test_merge_partials_idempotent(spark, seq):
    tier = rollup.rollup_base(seq, "1m")
    merged = incremental.merge_partials(tier, "1m")
    assert _sorted_rows(merged) == _sorted_rows(tier)


def test_catalog_refresh_overwrites_only_touched_days(spark, seq, split, tmp_path):
    on_time, late, late_days = split
    cat = ParquetSnapshotCatalog(str(tmp_path / "cat"))
    base_parts = rollup.day_partition(rollup.rollup_base(on_time, "1m"))
    base_sid = cat.write_snapshot(base_parts, "tier_1m", partition_by=["day"])
    base_dir = cat.current_snapshot("tier_1m")["path"]

    sid = incremental.refresh_tier_snapshot(cat, spark, "tier_1m", late, "1m")
    snap = cat.current_snapshot("tier_1m")
    assert snap["id"] == sid and snap.get("refs")

    # value parity with a full recompute over raw ∪ late
    got = cat.read(spark, "tier_1m").drop("day")
    full = rollup.rollup_base(seq, "1m")
    assert _sorted_rows(got) == _sorted_rows(full)

    # manifest shape: untouched days carried by reference into the OLD
    # snapshot dir; the touched days live ONLY in the new snapshot dir
    by_base = {g["basePath"]: g["paths"] for g in snap["refs"]}
    assert base_dir in by_base
    old_days = {os.path.basename(p).split("=", 1)[1] for p in by_base[base_dir]}
    assert not old_days & set(late_days)
    new_base = snap["path"]
    assert new_base != base_dir and new_base in by_base
    new_days = {os.path.basename(p).split("=", 1)[1] for p in by_base[new_base]}
    assert set(late_days) <= new_days
    # time travel to the pre-refresh snapshot still works
    assert cat.read(spark, "tier_1m", snapshot_id=base_sid).count() == (
        base_parts.count()
    )


def test_refresh_empty_late_batch_is_noop(spark, seq, tmp_path):
    cat = ParquetSnapshotCatalog(str(tmp_path / "cat"))
    parts = rollup.day_partition(rollup.rollup_base(seq, "1m"))
    sid = cat.write_snapshot(parts, "tier_1m", partition_by=["day"])
    got = incremental.refresh_tier_snapshot(
        cat, spark, "tier_1m", seq.limit(0), "1m"
    )
    assert got == sid


def test_ttl_and_expire_on_overwrite_snapshot(spark, seq, split, tmp_path):
    on_time, late, late_days = split
    cat = ParquetSnapshotCatalog(str(tmp_path / "cat"))
    base_parts = rollup.day_partition(rollup.rollup_base(on_time, "1m"))
    cat.write_snapshot(base_parts, "tier_1m", partition_by=["day"])
    incremental.refresh_tier_snapshot(cat, spark, "tier_1m", late, "1m")

    # TTL drop on a refs snapshot: metadata-only, filters every group
    cat.drop_partitions_before(spark, "tier_1m", "day", "2024-01-06")
    days = {
        str(r["day"])
        for r in cat.read(spark, "tier_1m").select("day").distinct().collect()
    }
    assert min(days) >= "2024-01-06" and "2024-01-06" in days

    # expire everything but the TTL'd snapshot: partition dirs still
    # referenced (old + new bases) survive; dropped days are reclaimed
    cat.expire_snapshots("tier_1m", keep_last=1)
    got_days = {
        str(r["day"])
        for r in cat.read(spark, "tier_1m").select("day").distinct().collect()
    }
    assert got_days == days
    # parity for the retained span vs full recompute
    full = rollup.day_partition(rollup.rollup_base(seq, "1m")).where(
        F.col("day") >= "2024-01-06"
    )
    got = cat.read(spark, "tier_1m").withColumn(
        "day", F.col("day").cast("string")
    )  # partition-dir day reads back as DATE; normalize for compare
    assert _sorted_rows(got) == _sorted_rows(full)


def test_schema_evolution_over_overwrite_snapshot(spark, seq, split, tmp_path):
    on_time, late, _ = split
    cat = ParquetSnapshotCatalog(str(tmp_path / "cat"))
    cat.write_snapshot(
        rollup.day_partition(rollup.rollup_base(on_time, "1m")),
        "tier_1m",
        partition_by=["day"],
    )
    incremental.refresh_tier_snapshot(cat, spark, "tier_1m", late, "1m")
    cat.rename_column("tier_1m", "n_tok_sum", "tok_sum")
    df = cat.read(spark, "tier_1m")
    assert "tok_sum" in df.columns and "n_tok_sum" not in df.columns
    assert df.count() == rollup.rollup_base(seq, "1m").count()
