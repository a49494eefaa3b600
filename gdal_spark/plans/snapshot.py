"""Snapshot-versioned parquet tables — the Iceberg-semantics stand-in.

SURVEY §1's data model maps OGR layers to Iceberg tables (transactions =
snapshot commits, `ogrlayer.cpp:846` CreateFeature + StartTransaction/
Commit); no Iceberg runtime jar exists in this environment, so this module
supplies the same CONTRACT on plain parquet + atomic manifest files:

  * a commit writes data files into an immutable uuid-named directory and
    then publishes snapshot v<N>.json via os.rename (atomic on POSIX) —
    readers either see the whole commit or none of it;
  * every snapshot lists its data files explicitly, so reads NEVER list
    directories (the Iceberg scan-planning property that makes object-store
    listings irrelevant) and time travel is just reading an older manifest;
  * rollback publishes a NEW snapshot pointing at an old file set — history
    is append-only, like Iceberg's snapshot log.

Single-writer per table (documented; Iceberg arbitrates multi-writer via
the catalog, which is exactly the piece that needs the runtime jar). Swap
`SnapshotTable` for `df.writeTo(...)` when one is available.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)

    # -- snapshot log ------------------------------------------------------

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.path, "snapshots", f"v{version}.json")

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(os.path.join(self.path, "snapshots")):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _load_snapshot(self, version: int) -> dict:
        with open(self._snap_path(version)) as f:
            return json.load(f)

    def _publish(self, files: list[str], operation: str,
                 parent: int | None) -> int:
        version = (parent if parent is not None else -1) + 1
        snap = {"version": version, "parent": parent,
                "operation": operation, "files": sorted(files),
                "committed_at": time.time()}
        tmp = self._snap_path(version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.rename(tmp, self._snap_path(version))      # the atomic commit
        return version

    # -- commits -----------------------------------------------------------

    def _write_data(self, df: DataFrame) -> list[str]:
        d = os.path.join(self.path, "data", uuid.uuid4().hex)
        df.write.parquet(d)
        return [os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")]

    def commit_append(self, df: DataFrame) -> int:
        new_files = self._write_data(df)
        parent = self.current_version()
        prev = self._load_snapshot(parent)["files"] if parent is not None \
            else []
        return self._publish(prev + new_files, "append", parent)

    def commit_overwrite(self, df: DataFrame) -> int:
        new_files = self._write_data(df)
        return self._publish(new_files, "overwrite", self.current_version())

    def merge(self, updates: DataFrame, key: str) -> int:
        """MERGE INTO (upsert): WHEN MATCHED THEN UPDATE (whole row) /
        WHEN NOT MATCHED THEN INSERT — Iceberg copy-on-write at FILE
        granularity: only data files that contain a matched key are
        rewritten (their unmatched rows survive into replacement files);
        every untouched file carries into the new snapshot verbatim, so
        merge cost tracks the number of touched files, not table size.
        Readers on older snapshots still see the pre-merge rows."""
        from pyspark.sql import functions as F

        parent = self.current_version()
        if parent is None:
            return self.commit_append(updates)
        files = self._load_snapshot(parent)["files"]
        cols = None
        touched: list[str] = []
        if files:
            cur = self.spark.read.parquet(*files) \
                .withColumn("_f", F.input_file_name())
            cols = [c for c in cur.columns if c != "_f"]
            keys = updates.select(key).distinct()
            hit = (cur.join(F.broadcast(keys), key, "left_semi")
                   .select("_f").distinct().collect())
            hit_suffix = {r._f.removeprefix("file:") for r in hit}
            touched = [f for f in files
                       if f in hit_suffix
                       or any(h.endswith(f) for h in hit_suffix)]
        untouched = [f for f in files if f not in set(touched)]
        up = updates.select(*cols) if cols else updates
        if touched:
            tdf = self.spark.read.parquet(*touched)
            survivors = tdf.join(updates.select(key).distinct(),
                                 key, "left_anti")
            new_data = survivors.unionByName(up)
        else:
            new_data = up
        new_files = self._write_data(new_data)
        return self._publish(untouched + new_files, "merge", parent)

    def delete_where(self, condition: str) -> int:
        """DELETE FROM ... WHERE (copy-on-write): files containing any
        matching row rewrite without those rows; untouched files carry
        verbatim (same file-granular contract as merge)."""
        from pyspark.sql import functions as F

        parent = self.current_version()
        if parent is None:
            raise ValueError("table has no snapshots yet")
        files = self._load_snapshot(parent)["files"]
        cur = self.spark.read.parquet(*files) \
            .withColumn("_f", F.input_file_name())
        hit = (cur.where(condition).select("_f").distinct().collect())
        hit_suffix = {r._f.removeprefix("file:") for r in hit}
        touched = [f for f in files
                   if f in hit_suffix or any(h.endswith(f)
                                             for h in hit_suffix)]
        untouched = [f for f in files if f not in set(touched)]
        new_files: list[str] = []
        if touched:
            survivors = self.spark.read.parquet(*touched) \
                .where(f"NOT ({condition})")
            new_files = self._write_data(survivors)
        return self._publish(untouched + new_files, "delete", parent)

    def rollback(self, version: int) -> int:
        """Publish a new snapshot with an old snapshot's file set."""
        files = self._load_snapshot(version)["files"]
        return self._publish(files, f"rollback-to-{version}",
                             self.current_version())

    # -- reads -------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Read the table at a snapshot (default: latest). File-list based —
        uncommitted data directories are invisible by construction."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise ValueError("table has no snapshots yet")
        files = self._load_snapshot(v)["files"]
        if not files:
            return self.spark.createDataFrame([], schema="dummy string") \
                .limit(0)
        return self.spark.read.parquet(*files)

    def history(self) -> list[dict]:
        return [{k: s[k] for k in ("version", "parent", "operation",
                                   "committed_at")}
                for s in (self._load_snapshot(v) for v in self.versions())]

    # -- maintenance (Iceberg rewrite_data_files / changelog / expire) ------

    def compact(self, target_rows_per_file: int = 1 << 20,
                sort_cols: tuple = ()) -> int:
        """Iceberg's rewrite_data_files twin: small data files bin-pack
        into ~target_rows_per_file files (optionally re-sorted, e.g. on
        the packed cell id so the layout matches the table's declared
        sort order), and a 'compact' snapshot replaces the file set.
        Readers on older snapshots still see the old files — rewrite is
        metadata-atomic, never in place."""
        cur = self.read()
        n = cur.count()
        parts = max(1, -(-n // target_rows_per_file))
        out = (cur.repartitionByRange(parts, *sort_cols)
               .sortWithinPartitions(*sort_cols)
               if sort_cols else cur.repartition(parts))
        new_files = self._write_data(out)
        return self._publish(new_files, "compact", self.current_version())

    def incremental_read(self, from_version: int,
                         to_version: int | None = None) -> DataFrame:
        """Changelog scan between snapshots: rows in data files added
        after `from_version` (exact for append-only history, like
        Iceberg's incremental append scan). File-set difference — no
        data diffing, no full-table read."""
        to_v = to_version if to_version is not None \
            else self.current_version()
        old = set(self._load_snapshot(from_version)["files"])
        new = [f for f in self._load_snapshot(to_v)["files"]
               if f not in old]
        if not new:
            return self.read(to_v).limit(0)
        return self.spark.read.parquet(*new)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Iceberg's expire_snapshots twin: drop all but the newest
        `keep_last` snapshot manifests, then delete every data file no
        retained snapshot references. Returns counts. Time travel
        earlier than the retained window is gone — that is the
        contract's storage-reclaim trade."""
        vs = self.versions()
        keep = vs[-keep_last:]
        drop = [v for v in vs if v not in keep]
        live: set = set()
        for v in keep:
            live |= set(self._load_snapshot(v)["files"])
        removed_files = 0
        data_root = os.path.join(self.path, "data")
        for d in os.listdir(data_root):
            dd = os.path.join(data_root, d)
            for f in os.listdir(dd):
                p = os.path.join(dd, f)
                if f.endswith(".parquet") and p not in live:
                    os.unlink(p)
                    removed_files += 1
            if not any(f.endswith(".parquet") for f in os.listdir(dd)):
                import shutil
                shutil.rmtree(dd)
        for v in drop:
            os.unlink(self._snap_path(v))
        return {"expired_snapshots": len(drop),
                "removed_files": removed_files}
