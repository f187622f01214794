"""Snapshot-committed table store — the engine's state layer.

The north rule puts frontier / seen / host_policy / articles / fetch_log in
**Iceberg tables** so any wave is resumable from a snapshot. This sandbox has
no Iceberg runtime jar (offline), so this module provides the same contract
over parquet + an atomic JSON manifest, with a 1:1 mapping to the Iceberg
calls a cluster deployment would use:

    SnapshotStore.commit(df, table, wave)   ⇔  df.writeTo(tbl).overwritePartitions()
                                                / MERGE INTO keyed by (wave, url_hash)
    SnapshotStore.read(table)               ⇔  spark.read.format('iceberg').load(tbl)
    SnapshotStore.read(table, snapshot=k)   ⇔  ...option('snapshot-id', k)  (time travel)
    SnapshotStore.latest_wave(table)        ⇔  snapshot summary metadata

Commit protocol (crash-safe, idempotent — SURVEY.md §7 hard part #5):
1. write parquet to ``root/table/snap-<n>/`` (a re-run of a failed wave
   rewrites the same directory — keyed by wave number, so it's a no-op
   overwrite, like an idempotent MERGE);
2. atomically rename a temp manifest over ``root/table/MANIFEST.json``
   pointing at the new snapshot. Readers only ever see a fully-written
   snapshot. The reference's analogue is per-row immediate UPDATE
   (science_crawler_main.py:241-249) — same resume-anywhere property,
   commit-per-wave instead of commit-per-row.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "MANIFEST.json")

    def _load_manifest(self, table: str) -> dict:
        try:
            with open(self._manifest_path(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"snapshots": []}

    def _write_manifest(self, table: str, manifest: dict) -> None:
        path = self._manifest_path(table)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, path)  # atomic on POSIX

    # -- public API ----------------------------------------------------------
    def commit(self, df: DataFrame, table: str, wave: int,
               meta: dict | None = None) -> int:
        """Write df as the table's next snapshot; returns snapshot id.
        Re-committing the same wave overwrites its snapshot (idempotent
        re-run of a failed wave)."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        manifest = self._load_manifest(table)
        existing = [s for s in manifest["snapshots"] if s["wave"] == wave]
        # max+1, NOT len(): after expire_snapshots the manifest is shorter
        # than the id space, and len() would re-issue a LIVE snapshot's id
        # and overwrite its files under readers
        snap_id = (existing[0]["id"] if existing else
                   max((s["id"] for s in manifest["snapshots"]), default=-1) + 1)
        path = os.path.join(tdir, f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(path)
        entry = {"id": snap_id, "wave": wave, "path": path, "meta": meta or {}}
        manifest["snapshots"] = [s for s in manifest["snapshots"] if s["wave"] != wave]
        manifest["snapshots"].append(entry)
        manifest["snapshots"].sort(key=lambda s: s["id"])
        self._write_manifest(table, manifest)
        return snap_id

    def read(self, spark: SparkSession, table: str,
             snapshot: int | None = None) -> DataFrame | None:
        """Latest (or time-travel) snapshot as a DataFrame; None if the table
        has no committed snapshot yet."""
        manifest = self._load_manifest(table)
        snaps = manifest["snapshots"]
        if not snaps:
            return None
        if snapshot is None:
            entry = snaps[-1]
        else:
            entry = next(s for s in snaps if s["id"] == snapshot)
        return spark.read.parquet(entry["path"])

    def snapshots(self, table: str) -> list[dict]:
        return self._load_manifest(table)["snapshots"]

    def latest_wave(self, table: str) -> int | None:
        snaps = self.snapshots(table)
        return snaps[-1]["wave"] if snaps else None

    def tables(self) -> list[str]:
        return sorted(
            t for t in os.listdir(self.root)
            if os.path.isfile(self._manifest_path(t)))

    def expire_snapshots(self, table: str | None = None,
                         keep: int = 2) -> int:
        """Drop all but the newest ``keep`` snapshots per table — the
        Iceberg ``expireSnapshots(olderThan)`` analogue. Resume needs only
        the latest snapshot; ``keep >= 2`` retains one time-travel step.

        At a 10^10-URL frontier each snapshot is the full state table, so
        an unexpired 50-wave crawl stores 50× the live bytes — expiry
        between waves (or from a janitor job) bounds storage at
        ``keep × table size``. Crash-safe ordering: the manifest is
        atomically rewritten FIRST (readers never see an expired entry),
        then the orphaned snapshot directories are deleted — a crash in
        between leaves unreachable dirs that the next expiry removes.
        Returns the number of snapshots expired.
        """
        import shutil

        keep = max(1, keep)
        n = 0
        for t in ([table] if table is not None else self.tables()):
            manifest = self._load_manifest(t)
            snaps = manifest["snapshots"]
            if len(snaps) <= keep:
                continue
            kept, dropped = snaps[-keep:], snaps[:-keep]
            manifest["snapshots"] = kept
            self._write_manifest(t, manifest)
            # compare by snapshot BASENAME, not full path: a store opened
            # via a differently-spelled root ("./data" vs "data") must not
            # mistake live snapshots for orphans
            live = {f"snap-{s['id']}" for s in kept}
            tdir = os.path.join(self.root, t)
            for d in os.listdir(tdir):  # includes prior-crash orphans
                if d.startswith("snap-") and d not in live:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
            n += len(dropped)
        return n
