"""Snapshot-versioned parquet state store — the sandbox's Iceberg.

Iceberg isn't on this classpath, so crawl state (frontier / seen /
docs / host_state / crawl_log) persists as parquet snapshot
directories plus an atomically-swapped JSON manifest:

    root/
      _manifest.json              ← current snapshot id per table + metrics
      frontier/snap=000042/*.parquet
      seen/snap=000042/*.parquet
      ...

Semantics preserved from the Iceberg design (SURVEY §4.2.4): an
iteration commits every table under ONE manifest swap (os.replace is
atomic on POSIX), a reader always sees a consistent snapshot set, and
resume = read manifest → load those snapshots → continue the loop.
Old snapshots are pruned lazily.  On a real cluster the same calls
map 1:1 onto Iceberg MERGE INTO + snapshot ids; the engine only uses
this narrow interface.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str, keep_snapshots: int = 2) -> None:
        self.root = root
        self.keep_snapshots = keep_snapshots
        os.makedirs(root, exist_ok=True)

    # ── manifest ──────────────────────────────────────────────────────
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def read_manifest(self) -> dict[str, Any] | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # ── commit: write all tables, then swap the manifest ─────────────
    def commit(
        self,
        snapshot_id: int,
        tables: dict[str, DataFrame],
        metrics: dict[str, Any] | None = None,
        state: dict[str, Any] | None = None,
    ) -> None:
        entry: dict[str, Any] = {
            "snapshot_id": snapshot_id,
            "committed_at": time.time(),
            "tables": {},
            "metrics": metrics or {},
            "state": state or {},
        }
        for name, df in tables.items():
            path = self._snap_path(name, snapshot_id)
            df.write.mode("overwrite").parquet(path)
            entry["tables"][name] = path
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point
        self._prune(snapshot_id)

    def load(self, spark: SparkSession, name: str) -> DataFrame | None:
        m = self.read_manifest()
        if not m or name not in m["tables"]:
            return None
        return spark.read.parquet(m["tables"][name])

    def _snap_path(self, name: str, snapshot_id: int) -> str:
        return os.path.join(self.root, name, f"snap={snapshot_id:06d}")

    def _prune(self, current: int) -> None:
        for name in os.listdir(self.root):
            tdir = os.path.join(self.root, name)
            if not os.path.isdir(tdir):
                continue
            snaps = sorted(d for d in os.listdir(tdir) if d.startswith("snap="))
            for d in snaps[: -self.keep_snapshots]:
                sid = int(d.split("=")[1])
                if sid != current:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
