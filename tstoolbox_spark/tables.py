"""Table layer: snapshot-versioned parquet tables.

The engine's design target is Iceberg (`BASELINE.json` north_rule) —
tiered tables partitioned by days(ts), snapshot commits, TTL via
metadata-only partition drops, resume from snapshot checkpoints. This
sandbox has no Iceberg runtime jar (offline), so the same contract is
implemented over partitioned parquet + an atomically-swapped JSON
manifest. The API is a drop-in: on a cluster with Iceberg configured,
``IcebergCatalog`` (same surface) maps write_snapshot →
``writeTo(...).overwritePartitions()``, expire → ``expire_snapshots``,
drop_before → partition DELETE. Divergence documented here, nowhere
else — pipeline code only sees this module.

Manifest layout per table dir::

    <root>/<table>/manifest.json     {"snapshots": [...], "current": id}
    <root>/<table>/snap-<id>/        parquet data (one dir per snapshot)

Commits are atomic: data lands in a new snap dir, manifest is replaced
via os.replace (POSIX atomic rename), so readers always see a complete
snapshot and a killed writer leaves the previous snapshot current —
the property the resume test (§5.3.4) relies on.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetSnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ----------------------------------------------------------- manifest
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "manifest.json")

    def _read_manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"snapshots": [], "current": None}
        with open(path) as f:
            return json.load(f)

    def _write_manifest(self, table: str, manifest: dict) -> None:
        path = self._manifest_path(table)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, path)  # atomic commit point

    # ------------------------------------------------------------- writes
    def write_snapshot(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
        compression: str | None = None,
    ) -> str:
        """Write df as a new snapshot of ``table``; returns snapshot id.
        The snapshot becomes current only when the manifest swap lands.

        ``compression`` overrides the session parquet codec — pass
        'uncompressed' for tables whose payload is already
        entropy-coded (the Gorilla blob table), where zstd burns CPU on
        every write AND every read for ~0 size gain.
        """
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self.root, table, f"snap-{snap_id}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if compression:
            writer = writer.option("compression", compression)
        writer.parquet(data_dir)
        manifest = self._read_manifest(table)
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "ts": time.time(),
                "path": data_dir,
                "partition_by": partition_by or [],
                "properties": properties or {},
            }
        )
        manifest["current"] = snap_id
        self._write_manifest(table, manifest)
        return snap_id

    # -------------------------------------------------------------- reads
    def current_snapshot(self, table: str) -> dict | None:
        m = self._read_manifest(table)
        if m["current"] is None:
            return None
        return next(s for s in m["snapshots"] if s["id"] == m["current"])

    def snapshots(self, table: str) -> list[dict]:
        return self._read_manifest(table)["snapshots"]

    def read(self, spark: SparkSession, table: str, snapshot_id: str | None = None) -> DataFrame:
        m = self._read_manifest(table)
        sid = snapshot_id or m["current"]
        if sid is None:
            raise FileNotFoundError(f"table {table!r} has no current snapshot")
        snap = next(s for s in m["snapshots"] if s["id"] == sid)
        if "paths" in snap:
            # metadata-only snapshot (retention drop): a list of
            # partition directories referencing an owner snapshot's
            # data; basePath recovers the partition column from the
            # day=... directory names.
            if not snap["paths"]:
                # every partition TTL'd away: reproduce the empty result
                # (with the right schema) from the owner + cutoff filter
                cutoff = snap["properties"]["retention_cutoff"]
                col = snap["partition_by"][0]
                return (
                    spark.read.parquet(snap["basePath"]).filter(f"{col} >= '{cutoff}'")
                )
            return (
                spark.read.option("basePath", snap["basePath"]).parquet(*snap["paths"])
            )
        return spark.read.parquet(snap["path"])

    def exists(self, table: str) -> bool:
        return self._read_manifest(table)["current"] is not None

    # --------------------------------------------------------- maintenance
    def expire_snapshots(self, table: str, keep_last: int = 2) -> int:
        """Drop all but the newest ``keep_last`` snapshots (metadata +
        data). Iceberg analog: expire_snapshots.

        Reference-aware: metadata-only retention snapshots point into
        an older snapshot's data dir, so an expired owner dir is only
        removed wholesale when nothing kept references it; otherwise
        just its UNREFERENCED partition subdirs are reclaimed (this is
        where TTL-dropped days are physically deleted)."""
        import shutil

        m = self._read_manifest(table)
        snaps = m["snapshots"]
        if len(snaps) <= keep_last:
            return 0
        drop, keep = snaps[:-keep_last], snaps[-keep_last:]
        m["snapshots"] = keep
        self._write_manifest(table, m)
        kept_refs = set()
        schema_anchors = set()
        for s in keep:
            for p in s.get("paths", []) or ([s["path"]] if "path" in s else []):
                kept_refs.add(os.path.normpath(p))
            if "paths" in s and not s["paths"]:
                # fully-TTL'd metadata-only snapshot: read() still opens
                # the owner basePath (+ cutoff filter) for schema
                # recovery — keep the owner dir and spare ONE partition
                # subdir as a schema anchor (all its rows predate the
                # cutoff, so the filtered read stays correctly empty).
                owner = os.path.normpath(s["basePath"])
                kept_refs.add(owner)
                schema_anchors.add(owner)
        for s in drop:
            owned = s.get("path")
            if owned is None:
                continue  # metadata-only snapshot: nothing owned
            owned = os.path.normpath(owned)
            referenced = any(
                r == owned or r.startswith(owned + os.sep) for r in kept_refs
            )
            if not referenced:
                shutil.rmtree(owned, ignore_errors=True)
                continue
            part_dirs = sorted(
                e for e in os.listdir(owned)
                if "=" in e and os.path.isdir(os.path.join(owned, e))
            )
            spared = (
                {os.path.normpath(os.path.join(owned, part_dirs[-1]))}
                if owned in schema_anchors and part_dirs
                and not any(r.startswith(owned + os.sep) for r in kept_refs)
                else set()
            )
            for entry in part_dirs:
                sub = os.path.normpath(os.path.join(owned, entry))
                if sub not in kept_refs and sub not in spared:
                    shutil.rmtree(sub, ignore_errors=True)
        return len(drop)

    def drop_partitions_before(
        self, spark: SparkSession, table: str, partition_col: str, cutoff: str
    ) -> str:
        """TTL retention: drop whole partitions older than cutoff —
        METADATA-ONLY (Iceberg analog: DROP PARTITION / DELETE WHERE on
        partition bounds).

        The table must be partitioned by ``partition_col`` (tiers are
        written partitionBy('day'), runner.py). The new snapshot is a
        manifest entry listing the RETAINED ``day=...`` directories of
        the current snapshot — no Spark job, no row rewrite; at 100 TB
        the nightly TTL pass costs one directory listing. Values are
        compared as their encoded directory strings, which is
        order-correct for ISO dates. Returns the new snapshot id.
        """
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(table)
        part_by = cur.get("partition_by") or []
        if partition_col not in part_by:
            raise ValueError(
                f"{table!r} snapshot is not partitioned by {partition_col!r} "
                f"(partition_by={part_by}); metadata-only drop needs the "
                "TTL column to be the partition column"
            )
        base = cur.get("basePath", cur.get("path"))
        if "paths" in cur:
            candidates = list(cur["paths"])
        else:
            candidates = [
                os.path.join(cur["path"], d)
                for d in os.listdir(cur["path"])
                if d.startswith(f"{partition_col}=")
            ]
        prefix = f"{partition_col}="
        retained = [
            p
            for p in candidates
            if os.path.basename(p.rstrip("/"))[len(prefix):] >= cutoff
        ]
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        manifest = self._read_manifest(table)
        manifest["snapshots"].append(
            {
                "id": snap_id,
                "ts": time.time(),
                "paths": sorted(retained),
                "basePath": base,
                "partition_by": part_by,
                "properties": {"retention_cutoff": cutoff, "metadata_only": True},
            }
        )
        manifest["current"] = snap_id
        self._write_manifest(table, manifest)
        return snap_id


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a hash-bucketed (optionally sorted) table so later
    equi-joins and aggregations on ``bucket_cols`` are SHUFFLE-FREE:
    two tables bucketed the same way sort-merge-join with zero
    Exchange on either side — at 100 TB that deletes the single most
    expensive stage of a repeated big-big join (fact x fact co-located
    on entity id). Iceberg analog: ``bucket(n, col)`` partition
    transform + storage-partitioned joins.

    Uses Spark's native ``bucketBy``; bucket metadata lives in the
    session catalog (in-memory here, a real metastore/Iceberg catalog
    on a cluster — tables.py module docstring documents that mapping).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so joins on the bucket columns skip the shuffle)."""
    return spark.table(table)
