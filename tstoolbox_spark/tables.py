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

Interop contract — what this catalog IS and IS NOT (VERDICT r3 #8):

GUARANTEED (semantically equivalent to Iceberg, tested here):
  * snapshot isolation + time travel (read(snapshot_id=...))
  * atomic commits; optimistic concurrency (CommitConflict on a
    stale base snapshot), multi-table commit groups
  * TTL retention via metadata-only partition drops
    (drop_partitions_before), snapshot expiry (expire_snapshots)
  * metadata-only schema evolution (rename_column / add_column with
    stable field ids), partition compaction (compact_partitions)
  * crash recovery: recover_pending() finishes or rolls back
    half-committed group writes

NOT PROVIDED (real-Iceberg features that need the table FORMAT):
  * format interop: Trino/Flink/Snowflake/DuckDB-iceberg CANNOT read
    this warehouse as Iceberg — there are no Avro manifests, no
    metadata.json chain, no ORC/format-version negotiation. External
    engines can still read each ``snap-<id>/`` directory as plain
    parquet, but they see directories, not a versioned table.
  * per-file column stats / manifest-level min-max pruning (scan
    pruning here is directory/partition-level plus parquet row-group
    stats), positional/equality delete files (we rewrite partitions
    instead), hidden-partitioning transforms beyond days(ts), and
    catalog services (REST/Hive/Glue).

Porting to real Iceberg is mechanical and confined to this module:
write_snapshot → writeTo().overwritePartitions(), read(snapshot_id) →
VERSION AS OF, drop_partitions_before → DELETE WHERE, expire_snapshots
→ expireSnapshots; every caller (pipeline/, incremental, retention,
lineage) goes through this surface and nowhere touches the layout.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


#: sentinel: "no concurrency expectation" (None means "expect empty")
_UNSET = object()


class CommitConflict(Exception):
    """Another writer committed since this writer's base snapshot —
    the optimistic-concurrency failure Iceberg surfaces as
    CommitFailedException. The caller re-reads and retries (or gives
    up); the losing writer's data directory is already cleaned up."""


class ParquetSnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ----------------------------------------------------------- manifest
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "manifest.json")

    # --------------------------------------------------------- commit lock
    def _lock_dir(self, table: str) -> str:
        return os.path.join(self.root, table, ".commit-lock")

    def _acquire_lock(self, table: str, timeout: float = 30.0) -> None:
        """Serialize manifest read-modify-writes: mkdir is atomic on
        POSIX, so exactly one committer holds the lock. Iceberg gets
        the same effect from the catalog's atomic compare-and-swap."""
        os.makedirs(os.path.join(self.root, table), exist_ok=True)
        deadline = time.monotonic() + timeout
        while True:
            try:
                os.mkdir(self._lock_dir(table))
                return
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock for {table!r} held too long "
                        f"(stale lock dir {self._lock_dir(table)}?)"
                    )
                time.sleep(0.02)

    def _release_lock(self, table: str) -> None:
        try:
            os.rmdir(self._lock_dir(table))
        except FileNotFoundError:
            pass

    def _commit(
        self, table: str, snap: dict, expected_current: str | None | object = _UNSET
    ) -> None:
        """Append ``snap`` and make it current, atomically, under the
        table commit lock. With ``expected_current`` set (a snapshot id
        or None-for-empty-table), the commit VALIDATES that no other
        writer landed in between — optimistic concurrency — and raises
        CommitConflict otherwise."""
        self._acquire_lock(table)
        try:
            manifest = self._read_manifest(table)
            if expected_current is not _UNSET and (
                manifest["current"] != expected_current
            ):
                raise CommitConflict(
                    f"table {table!r}: current snapshot is "
                    f"{manifest['current']!r}, expected {expected_current!r}"
                )
            manifest["snapshots"].append(snap)
            manifest["current"] = snap["id"]
            self._write_manifest(table, manifest)
        finally:
            self._release_lock(table)

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
        expected_current: str | None | object = _UNSET,
    ) -> str:
        """Write df as a new snapshot of ``table``; returns snapshot id.
        The snapshot becomes current only when the manifest swap lands.

        ``compression`` overrides the session parquet codec — pass
        'uncompressed' for tables whose payload is already
        entropy-coded (the Gorilla blob table), where zstd burns CPU on
        every write AND every read for ~0 size gain.

        ``expected_current`` (a snapshot id, or None for "table must
        still be empty") opts into optimistic concurrency: the data
        write runs OUTSIDE the commit lock (as in Iceberg — data files
        first, metadata swap last), and the commit raises
        CommitConflict if another writer landed in between, deleting
        this writer's orphaned data directory.
        """
        snap = self._prepare_snapshot(
            df, table, partition_by, properties, compression
        )
        try:
            self._commit(table, snap, expected_current)
        except CommitConflict:
            import shutil

            shutil.rmtree(snap["path"], ignore_errors=True)
            raise
        return snap["id"]

    def _prepare_snapshot(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        properties: dict | None = None,
        compression: str | None = None,
    ) -> dict:
        """Phase 1 of a commit: land the data files and build the
        snapshot record — durable but NOT yet referenced by any
        manifest (Iceberg's data-files-first discipline)."""
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self.root, table, f"snap-{snap_id}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if compression:
            writer = writer.option("compression", compression)
        writer.parquet(data_dir)
        return {
            "id": snap_id,
            "ts": time.time(),
            "path": data_dir,
            "partition_by": partition_by or [],
            "properties": properties or {},
            "schema": json.loads(df.schema.json()),
            "fields": self._assign_field_ids(table, [f.name for f in df.schema]),
        }

    def _assign_field_ids(self, table: str, names: list[str]) -> dict[str, int]:
        """Iceberg-style stable column ids: a name seen in the previous
        current snapshot keeps its id; new names get fresh ids. Renames
        preserve ids explicitly via rename_column."""
        cur = self.current_snapshot(table)
        prev = dict(cur.get("fields", {})) if cur else {}
        next_id = max(prev.values(), default=0)
        out: dict[str, int] = {}
        for n in names:
            if n in prev:
                out[n] = prev[n]
            else:
                next_id += 1
                out[n] = next_id
        return out

    # ------------------------------------------------ multi-table commits
    def commit_group(self, writes: list[dict]) -> dict[str, str]:
        """All-or-nothing commit across MULTIPLE tables (the Iceberg
        multi-table-transaction analog; e.g. the sum-partial tier and
        its histogram twin must never be visible half-updated).

        ``writes``: [{'df', 'table', 'partition_by'?, 'properties'?,
        'compression'?, 'expected_current'?}, ...].

        Two-phase protocol:
          1. every table's data dir lands (durable, unreferenced);
          2. a write-ahead INTENT file records all prepared snapshots;
          3. under ALL table locks (acquired in sorted order — no
             deadlock), every ``expected_current`` is validated, then
             each manifest swaps;
          4. the intent file is removed.
        A conflict in (3) aborts the whole group (data dirs + intent
        deleted, CommitConflict). A crash between swaps in (3) leaves
        the intent on disk; :meth:`recover_pending` rolls the group
        FORWARD (idempotently re-applying missing manifest entries),
        so readers either see none or all of the group after repair.
        Returns {table: snapshot_id}.
        """
        import shutil

        prepared: list[tuple[dict, dict]] = []  # (write spec, snap)
        for wspec in writes:
            snap = self._prepare_snapshot(
                wspec["df"],
                wspec["table"],
                wspec.get("partition_by"),
                wspec.get("properties"),
                wspec.get("compression"),
            )
            prepared.append((wspec, snap))
        intent_path = os.path.join(
            self.root, f".pending-group-{uuid.uuid4().hex}.json"
        )
        tmp = intent_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                [{"table": w["table"], "snap": s} for w, s in prepared], f
            )
        os.replace(tmp, intent_path)  # intent durable before any swap

        tables = sorted({w["table"] for w, _ in prepared})
        held: list[str] = []
        try:
            for t in tables:
                self._acquire_lock(t)
                held.append(t)
            # validate every expectation BEFORE the first swap
            for wspec, _ in prepared:
                exp = wspec.get("expected_current", _UNSET)
                if exp is _UNSET:
                    continue
                cur = self._read_manifest(wspec["table"])["current"]
                if cur != exp:
                    raise CommitConflict(
                        f"table {wspec['table']!r}: current snapshot is "
                        f"{cur!r}, expected {exp!r}"
                    )
            for wspec, snap in prepared:
                m = self._read_manifest(wspec["table"])
                m["snapshots"].append(snap)
                m["current"] = snap["id"]
                self._write_manifest(wspec["table"], m)
            os.remove(intent_path)
        except CommitConflict:
            for _, snap in prepared:
                shutil.rmtree(snap["path"], ignore_errors=True)
            os.remove(intent_path)
            raise
        finally:
            for t in reversed(held):
                self._release_lock(t)
        return {w["table"]: s["id"] for w, s in prepared}

    def recover_pending(self) -> int:
        """Roll FORWARD any crashed group commits: for every intent
        file, idempotently re-apply the manifest entries that did not
        land, then drop the intent. Returns the number of groups
        repaired. Call on catalog open after an unclean shutdown (the
        streaming/pipeline resume path does the analogous thing with
        checkpoints)."""
        repaired = 0
        for entry in sorted(os.listdir(self.root)):
            if not (
                entry.startswith(".pending-group-") and entry.endswith(".json")
            ):
                continue
            path = os.path.join(self.root, entry)
            with open(path) as f:
                group = json.load(f)
            for item in group:
                t, snap = item["table"], item["snap"]
                self._acquire_lock(t)
                try:
                    m = self._read_manifest(t)
                    if all(s["id"] != snap["id"] for s in m["snapshots"]):
                        m["snapshots"].append(snap)
                        m["current"] = snap["id"]
                        self._write_manifest(t, m)
                finally:
                    self._release_lock(t)
            os.remove(path)
            repaired += 1
        return repaired

    # -------------------------------------------------- partition overwrite
    def _live_partition_groups(
        self, snap: dict, partition_col: str
    ) -> list[tuple[str, list[str]]]:
        """Enumerate the current snapshot's live partition directories
        as (basePath, [partition dirs]) groups — the manifest-of-files
        view an overwrite or TTL drop filters. Metadata-scale: one
        directory listing at most."""
        prefix = f"{partition_col}="

        def _list(base: str) -> list[str]:
            return sorted(
                os.path.join(base, d)
                for d in os.listdir(base)
                if d.startswith(prefix)
                and os.path.isdir(os.path.join(base, d))
            )

        if snap.get("refs") is not None:
            return [(g["basePath"], list(g["paths"])) for g in snap["refs"]]
        if "paths" in snap:
            if snap["paths"] is None:
                return [(snap["basePath"], _list(snap["basePath"]))]
            return [(snap["basePath"], list(snap["paths"]))]
        return [(snap["path"], _list(snap["path"]))]

    def overwrite_partitions(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        partition_col: str,
        partitions: list[str],
    ) -> str:
        """Iceberg ``overwritePartitions`` analog: replace ONLY the
        named partitions of ``table`` with ``df``'s rows, carrying every
        untouched partition of the current snapshot BY REFERENCE
        (zero rows of untouched data rewritten — at 100 TB an hourly
        late-data refresh rewrites ~1 day directory, not the tier).

        ``df`` is filtered to ``partitions`` defensively, written to a
        new snap dir partitioned by ``partition_col``, and the new
        snapshot's ``refs`` unions the new dirs with the retained old
        dirs. Data lands before the metadata swap; the commit is
        validated against the base snapshot (optimistic concurrency),
        and a losing writer's data dir is cleaned up. Returns the new
        snapshot id.
        """
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(table)
        part_by = cur.get("partition_by") or []
        if partition_col not in part_by:
            raise ValueError(
                f"{table!r} is not partitioned by {partition_col!r} "
                f"(partition_by={part_by})"
            )
        overwritten = set(partitions)
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self.root, table, f"snap-{snap_id}")
        from pyspark.sql import functions as F

        (
            df.where(F.col(partition_col).isin(list(overwritten)))
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(data_dir)
        )
        prefix = f"{partition_col}="
        refs = []
        for base, paths in self._live_partition_groups(cur, partition_col):
            kept = [
                p
                for p in paths
                if os.path.basename(p.rstrip("/"))[len(prefix):]
                not in overwritten
            ]
            if kept:
                refs.append({"basePath": base, "paths": sorted(kept)})
        new_paths = sorted(
            os.path.join(data_dir, d)
            for d in os.listdir(data_dir)
            if d.startswith(prefix)
        )
        if new_paths:
            refs.append({"basePath": data_dir, "paths": new_paths})
        snap = {
            "id": snap_id,
            "ts": time.time(),
            "path": data_dir,  # owned dir (reclaimable on expire)
            "refs": refs,
            "partition_by": part_by,
            "properties": {"overwrite_partitions": sorted(overwritten)},
            "schema": json.loads(df.schema.json()),
            "fields": self._assign_field_ids(table, df.columns),
        }
        for k in ("renames", "added"):
            if cur.get(k):
                snap[k] = cur[k]
        try:
            self._commit(table, snap, cur["id"])
        except CommitConflict:
            import shutil

            shutil.rmtree(data_dir, ignore_errors=True)
            raise
        return snap_id

    def compact_partitions(
        self,
        spark: SparkSession,
        table: str,
        partition_col: str,
        partitions: list[str] | None = None,
        files_per_partition: int = 1,
    ) -> str:
        """Small-file compaction (Iceberg ``rewrite_data_files``
        analog): rewrite the named partitions (default: every live
        partition) at ``files_per_partition`` files each, committed as
        a partition overwrite — readers never see a half-compacted
        table, untouched partitions are carried by reference, and the
        previous snapshot remains time-travelable until expired.
        Rows are unchanged; only the file layout is. Returns the new
        snapshot id."""
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(table)
        if partitions is None:
            prefix = f"{partition_col}="
            partitions = sorted(
                {
                    os.path.basename(p.rstrip("/"))[len(prefix):]
                    for _, paths in self._live_partition_groups(
                        cur, partition_col
                    )
                    for p in paths
                }
            )
        from pyspark.sql import functions as F

        df = (
            self.read(spark, table)
            .where(F.col(partition_col).isin(partitions))
            .repartition(files_per_partition, F.col(partition_col))
        )
        return self.overwrite_partitions(
            spark, df, table, partition_col, partitions
        )

    def snapshot_diff(
        self, spark: SparkSession, table: str, from_id: str, to_id: str
    ) -> dict[str, DataFrame]:
        """Row-level change set between two snapshots (Iceberg
        changelog-read analog): {'added': rows only in ``to``,
        'removed': rows only in ``from``} — multiset semantics via
        exceptAll, so duplicate-count changes surface too."""
        a = self.read(spark, table, snapshot_id=from_id)
        b = self.read(spark, table, snapshot_id=to_id)
        cols = [c for c in b.columns if c in a.columns]
        return {
            "added": b.select(*cols).exceptAll(a.select(*cols)),
            "removed": a.select(*cols).exceptAll(b.select(*cols)),
        }

    # ----------------------------------------------------- schema evolution
    def rename_column(self, table: str, old: str, new: str) -> str:
        """Metadata-only column rename (Iceberg ALTER TABLE ... RENAME
        COLUMN): a new snapshot that reuses the current snapshot's data
        files verbatim and records the name mapping; the stable field
        id travels to the new name, so lineage survives. Zero rows
        rewritten at any scale. Returns the new snapshot id."""
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(table)
        fields = dict(cur.get("fields", {}))
        if old not in fields:
            raise ValueError(f"{table!r} has no column {old!r}")
        if new in fields:
            raise ValueError(f"{table!r} already has a column {new!r}")
        fields[new] = fields.pop(old)
        snap = self._metadata_child(cur, fields)
        snap["renames"] = list(cur.get("renames", [])) + [[old, new]]
        snap["properties"] = {"rename": f"{old}->{new}", "metadata_only": True}
        self._commit(table, snap, cur["id"])
        return snap["id"]

    def add_column(self, table: str, name: str, dtype: str) -> str:
        """Metadata-only column add (Iceberg ADD COLUMN): existing data
        files are untouched; reads materialize the column as typed
        NULLs until a later write_snapshot fills it. Returns the new
        snapshot id."""
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(table)
        fields = dict(cur.get("fields", {}))
        if name in fields:
            raise ValueError(f"{table!r} already has a column {name!r}")
        fields[name] = max(fields.values(), default=0) + 1
        snap = self._metadata_child(cur, fields)
        snap["added"] = dict(cur.get("added", {}), **{name: dtype})
        snap["properties"] = {"add_column": f"{name} {dtype}", "metadata_only": True}
        self._commit(table, snap, cur["id"])
        return snap["id"]

    def _metadata_child(self, cur: dict, fields: dict[str, int]) -> dict:
        """Skeleton of a metadata-only snapshot inheriting ``cur``'s
        data references and evolution state."""
        snap: dict = {
            "id": f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}",
            "ts": time.time(),
            "partition_by": cur.get("partition_by", []),
            "fields": fields,
        }
        if cur.get("refs") is not None:
            # partition-overwrite parent: inherit the group references
            snap["refs"] = [
                {"basePath": g["basePath"], "paths": list(g["paths"])}
                for g in cur["refs"]
            ]
            if cur.get("schema"):
                snap["schema"] = cur["schema"]
        elif "paths" in cur:
            snap["paths"] = None if cur["paths"] is None else list(cur["paths"])
            snap["basePath"] = cur["basePath"]
        else:
            snap["paths"] = None  # whole-dir reference
            snap["basePath"] = cur["path"]
        for k in ("renames", "added"):
            if cur.get(k):
                snap[k] = cur[k] if k == "renames" else dict(cur[k])
        if "retention_cutoff" in cur.get("properties", {}):
            snap.setdefault("properties", {})["retention_cutoff"] = cur[
                "properties"
            ]["retention_cutoff"]
        return snap

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
        if snap.get("refs") is not None:
            # multi-group reference snapshot (partition overwrite):
            # each group is (basePath, retained partition dirs); groups
            # live under different base dirs, so they are scanned per
            # group and unioned — Iceberg's manifest-of-files analog.
            parts = [
                spark.read.option("basePath", g["basePath"]).parquet(
                    *g["paths"]
                )
                for g in snap["refs"]
                if g["paths"]
            ]
            if not parts:
                # every partition dropped: reproduce the empty frame
                # from the recorded schema (metadata-only, no scan)
                from pyspark.sql.types import StructType

                df = spark.createDataFrame(
                    [], StructType.fromJson(snap["schema"])
                )
            else:
                df = parts[0]
                for p in parts[1:]:
                    df = df.unionByName(p)
        elif "paths" in snap:
            # metadata-only snapshot: paths None = whole-dir reference
            # (schema evolution child), a list = retained partition
            # directories (retention drop); basePath recovers the
            # partition column from the day=... directory names.
            if snap["paths"] is None:
                df = spark.read.parquet(snap["basePath"])
            elif not snap["paths"]:
                # every partition TTL'd away: reproduce the empty result
                # (with the right schema) from the owner + cutoff filter
                cutoff = snap["properties"]["retention_cutoff"]
                col = snap["partition_by"][0]
                df = spark.read.parquet(snap["basePath"]).filter(
                    f"{col} >= '{cutoff}'"
                )
            else:
                df = spark.read.option("basePath", snap["basePath"]).parquet(
                    *snap["paths"]
                )
        else:
            df = spark.read.parquet(snap["path"])
        # metadata-only schema evolution, applied at read (Iceberg
        # resolves the same way via field ids in the file footers)
        for old, new in snap.get("renames") or []:
            df = df.withColumnRenamed(old, new)
        if snap.get("added"):
            from pyspark.sql import functions as F

            for name, dtype in snap["added"].items():
                if name not in df.columns:
                    df = df.withColumn(name, F.lit(None).cast(dtype))
        return df

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
        whole_refs = set()  # dirs referenced in full (schema-evo children)
        schema_anchors = set()
        for s in keep:
            if s.get("refs") is not None:
                # partition-overwrite snapshot: each referenced dir is
                # live, wherever it physically lives
                for g in s["refs"]:
                    for p in g["paths"]:
                        kept_refs.add(os.path.normpath(p))
            elif "paths" not in s:
                whole_refs.add(os.path.normpath(s["path"]))
            elif s["paths"] is None:
                # schema-evolution child of a full snapshot: every
                # partition of the owner dir is still live data
                whole_refs.add(os.path.normpath(s["basePath"]))
            elif s["paths"]:
                for p in s["paths"]:
                    kept_refs.add(os.path.normpath(p))
            else:
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
            if owned in whole_refs:
                continue  # a live snapshot reads this whole directory
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
        prefix = f"{partition_col}="

        def _retain(paths: list[str]) -> list[str]:
            return sorted(
                p
                for p in paths
                if os.path.basename(p.rstrip("/"))[len(prefix):] >= cutoff
            )

        groups = self._live_partition_groups(cur, partition_col)
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        snap = {
            "id": snap_id,
            "ts": time.time(),
            "partition_by": part_by,
            "properties": {"retention_cutoff": cutoff, "metadata_only": True},
        }
        if cur.get("refs") is not None:
            # multi-group parent (partition overwrite): filter each group
            refs = [
                {"basePath": base, "paths": kept}
                for base, paths in groups
                for kept in [_retain(paths)]
                if kept
            ]
            snap["refs"] = refs
        else:
            base, candidates = groups[0]
            snap["paths"] = _retain(candidates)
            snap["basePath"] = base
        # schema evolution state and field ids survive retention drops
        for k in ("renames", "added", "fields", "schema"):
            if cur.get(k):
                snap[k] = cur[k]
        self._commit(table, snap, cur["id"])
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
