"""Iceberg-style catalog adapter (SURVEY.md §1.2 — explicit emulation).

No Iceberg runtime jars exist in the sandbox, so the "Iceberg table"
contract is reproduced on partitioned Parquet with explicit snapshot
manifests, keeping the surface Iceberg-shaped so real Iceberg is a
config change:

* **Partition spec**: hive-style ``col=value`` directories →
  Catalyst partition pruning works natively (filters on partition
  columns prune directories before any file is opened).
* **Snapshot manifest**: every commit writes ``snap-<n>.json`` (file
  listing + row count + summary) and atomically swaps a
  ``version-hint.text`` pointer (tmp + rename) — readers always see a
  complete snapshot, never a partial write.
* **Time travel (lite)**: read any retained snapshot by id.

The adapter is deliberately small; it exists so the pipeline's write
path has Iceberg semantics (atomic commit, snapshot lineage, partition
pruning) that swap 1:1 for ``df.writeTo(...).append()`` on a real
catalog.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class IcebergLiteTable:
    def __init__(self, root: str):
        self.root = root
        self.meta = os.path.join(root, "metadata")
        os.makedirs(self.meta, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------

    def _hint_path(self) -> str:
        return os.path.join(self.meta, "version-hint.text")

    def current_snapshot_id(self) -> int | None:
        p = self._hint_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def snapshot(self, snap_id: int | None = None) -> dict | None:
        snap_id = snap_id if snap_id is not None else self.current_snapshot_id()
        if snap_id is None:
            return None
        p = os.path.join(self.meta, f"snap-{snap_id}.json")
        with open(p) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.meta)):
            if fn.startswith("snap-") and fn.endswith(".json"):
                with open(os.path.join(self.meta, fn)) as f:
                    out.append(json.load(f))
        return out

    def _list_data_files(self, data_dir: str) -> list[dict]:
        files = []
        for root, _dirs, fns in os.walk(data_dir):
            for fn in sorted(fns):
                if fn.endswith(".parquet"):
                    fp = os.path.join(root, fn)
                    files.append(
                        {
                            "path": os.path.relpath(fp, self.root),
                            "bytes": os.path.getsize(fp),
                        }
                    )
        return files

    # -- write (atomic snapshot commit) ---------------------------------------

    def overwrite(
        self, df: DataFrame, partition_by: tuple[str, ...] = (), row_count: int | None = None
    ) -> dict:
        """Write a new snapshot: data to ``data/v<n>/``, manifest, then
        atomic pointer swap. A crash before the swap leaves the previous
        snapshot fully intact and readable."""
        prev = self.current_snapshot_id() or 0
        snap_id = prev + 1
        data_dir = os.path.join(self.root, "data", f"v{snap_id}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        manifest = {
            "snapshot_id": snap_id,
            "parent_id": prev or None,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "partition_spec": list(partition_by),
            "data_dir": os.path.relpath(data_dir, self.root),
            "files": self._list_data_files(data_dir),
            "summary": {"row_count": row_count},
        }
        with open(os.path.join(self.meta, f"snap-{snap_id}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        tmp = self._hint_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self._hint_path())  # the atomic commit
        return manifest

    def append(
        self, df: DataFrame, partition_by: tuple[str, ...] = (), row_count: int | None = None
    ) -> dict:
        """Append commit: new data files land in their own ``data/v<n>/``
        dir; the snapshot references the parent's dirs PLUS the new one
        (Iceberg's fast-append shape — no rewrite of existing files).
        Readers of the previous snapshot are untouched."""
        prev = self.snapshot()
        # invariant: one partition spec per table lineage. read() unions
        # every commit's hive tree with unionByName and compact() reapplies
        # only the latest spec — mixing specs across appends would make the
        # union fail (or compaction silently relayout) later, so fail HERE.
        if prev is not None and list(partition_by) != list(prev.get("partition_spec") or []):
            raise ValueError(
                f"append partition_by {list(partition_by)} != table spec "
                f"{prev.get('partition_spec')} (use overwrite() to change the spec)"
            )
        prev_dirs = (prev.get("data_dirs") or [prev["data_dir"]]) if prev else []
        prev_id = prev["snapshot_id"] if prev else 0
        snap_id = prev_id + 1
        data_dir = os.path.join(self.root, "data", f"v{snap_id}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        dirs = prev_dirs + [os.path.relpath(data_dir, self.root)]
        manifest = {
            "snapshot_id": snap_id,
            "parent_id": prev_id or None,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "partition_spec": list(partition_by),
            "data_dir": dirs[0],
            "data_dirs": dirs,
            "files": [f for d in dirs for f in self._list_data_files(os.path.join(self.root, d))],
            "summary": {"row_count": row_count, "operation": "append"},
        }
        with open(os.path.join(self.meta, f"snap-{snap_id}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        tmp = self._hint_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap_id))
        os.replace(tmp, self._hint_path())
        return manifest

    def compact(self, spark: SparkSession, target_files: int = 1) -> dict:
        """Maintenance: rewrite the current snapshot's data into
        ``target_files`` files per partition (the small-files problem —
        Iceberg's ``rewrite_data_files``). Commits a NEW snapshot, so
        time travel to the pre-compaction state keeps working; the row
        set is unchanged by construction (read → repartition → write,
        no filters)."""
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        df = self.read(spark).repartition(target_files)
        m = self.overwrite(
            df, partition_by=tuple(snap.get("partition_spec") or ()),
            row_count=(snap.get("summary") or {}).get("row_count"),
        )
        m["summary"]["operation"] = "compact"
        with open(os.path.join(self.meta, f"snap-{m['snapshot_id']}.json"), "w") as f:
            json.dump(m, f, indent=1)
        return m

    def file_count(self, snapshot_id: int | None = None) -> int:
        snap = self.snapshot(snapshot_id)
        return len(snap["files"]) if snap else 0

    # -- read (current or time-travel) ----------------------------------------

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        # hive-style partition dirs → Catalyst partition pruning on the
        # partition columns; basePath keeps them as columns. Append
        # snapshots span several data dirs (one per commit); each dir is
        # its own hive tree, so read per dir and union — Catalyst still
        # prunes partitions inside every dir.
        dirs = snap.get("data_dirs") or [snap["data_dir"]]
        out = None
        for d in dirs:
            data_dir = os.path.join(self.root, d)
            part = spark.read.option("basePath", data_dir).parquet(data_dir)
            out = part if out is None else out.unionByName(part)
        return out
