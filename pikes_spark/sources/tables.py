"""Snapshot-committed partitioned parquet tables with lineage manifests.

At deployment the triple store is Iceberg (``df.writeTo(...).append()``
with spo/pos sort orders and snapshot metadata); the Iceberg runtime
jar is not in this sandbox, so this module provides the same
*semantics* on plain parquet:

- every commit writes data files under ``data/<snapshot_id>/`` and then
  atomically publishes a ``snapshot-<n>.json`` manifest (rename is the
  commit point, like Iceberg's metadata swap);
- manifests carry lineage: input snapshot, per-partition row counts,
  committed urls digest, wall time;
- readers resolve the latest manifest and read exactly its files —
  uncommitted data is invisible (snapshot isolation);
- resume = anti-join new work against the committed ``url`` set of the
  latest snapshot (skip-done semantics of FolderOrchestrator.java:166-176
  and RDFGenerator.java:372-393).

Swap-in note: every call site uses TripleTable.append/read; replacing
with Iceberg is a one-line change per call.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotTable:
    def __init__(self, root: str, sort_cols: Optional[List[str]] = None,
                 name: str = "table"):
        self.root = root
        self.name = name
        self.sort_cols = sort_cols or []
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "meta"), exist_ok=True)

    # ------------------------------------------------------------------
    def _manifests(self) -> List[str]:
        meta = os.path.join(self.root, "meta")
        return sorted(f for f in os.listdir(meta) if f.startswith("snapshot-"))

    def latest_snapshot(self) -> Optional[dict]:
        ms = self._manifests()
        if not ms:
            return None
        with open(os.path.join(self.root, "meta", ms[-1])) as fh:
            return json.load(fh)

    # ------------------------------------------------------------------
    def append(self, df: DataFrame, spark: SparkSession,
               lineage: Optional[dict] = None) -> dict:
        """Write df as a new snapshot (previous snapshot's files + the
        new data dir). Sort-within-partitions by the table sort order
        (spo/pos layout) before writing."""
        from pyspark.sql import Observation

        snap_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.root, "data", snap_id)
        out = df
        if self.sort_cols:
            out = out.sortWithinPartitions(*self.sort_cols)
        t0 = time.time()
        # row count via observe(): piggybacks on the write job, no
        # read-back scan (the reference's Tracker -> observe() mapping)
        obs = Observation(f"append_{snap_id}")
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        # zstd: ~30-50% smaller than snappy on IRI-heavy triple data at
        # comparable write cost — at 10^12 triples the scan economics
        # dominate, and the sorted layout compresses especially well
        out.write.mode("errorifexists").option("compression", "zstd")            .parquet(data_dir)
        stats = {"rows": obs.get["rows"]}
        prev = self.latest_snapshot()
        manifest = {
            "table": self.name,
            "snapshot_id": snap_id,
            "parent": prev["snapshot_id"] if prev else None,
            "sequence": (prev["sequence"] + 1) if prev else 0,
            "data_dirs": (prev["data_dirs"] if prev else []) + [data_dir],
            "added_rows": stats["rows"],
            "total_rows": (prev["total_rows"] if prev else 0) + stats["rows"],
            "write_seconds": round(time.time() - t0, 3),
            "lineage": lineage or {},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = os.path.join(self.root, "meta", f".tmp-{snap_id}.json")
        final = os.path.join(self.root, "meta",
                             f"snapshot-{manifest['sequence']:06d}-{snap_id}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.rename(tmp, final)  # atomic commit point
        return manifest

    def overwrite(self, df: DataFrame, spark: SparkSession,
                  lineage: Optional[dict] = None) -> dict:
        """Commit a snapshot that REPLACES the table contents (manifest
        points only at the new data dir; older snapshots stay readable
        by their own manifests — Iceberg overwrite semantics)."""
        manifest = self.append(df, spark, lineage=lineage)
        manifest["data_dirs"] = manifest["data_dirs"][-1:]
        manifest["total_rows"] = manifest["added_rows"]
        final = os.path.join(
            self.root, "meta",
            f"snapshot-{manifest['sequence']:06d}-{manifest['snapshot_id']}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.rename(tmp, final)
        return manifest

    def has_lineage(self, key: str, value) -> bool:
        """True if ANY committed snapshot's lineage carries key == value
        (the idempotency probe for at-least-once foreachBatch replays)."""
        meta = os.path.join(self.root, "meta")
        for name in self._manifests():
            with open(os.path.join(meta, name)) as fh:
                if json.load(fh).get("lineage", {}).get(key) == value:
                    return True
        return False

    def snapshot(self, sequence: int) -> Optional[dict]:
        """Manifest of a specific committed sequence number (time
        travel: every historical manifest stays readable)."""
        for name in self._manifests():
            with open(os.path.join(self.root, "meta", name)) as fh:
                m = json.load(fh)
            if m["sequence"] == sequence:
                return m
        return None

    def read(self, spark: SparkSession,
             sequence: Optional[int] = None,
             merge_schema: bool = False) -> Optional[DataFrame]:
        """Read the latest snapshot, or — time travel — a historical
        one by its sequence number (Iceberg VERSION AS OF).
        merge_schema=True unifies data files written under different
        schemas (Iceberg schema evolution: later columns read as NULL
        on older files)."""
        snap = (self.latest_snapshot() if sequence is None
                else self.snapshot(sequence))
        if snap is None or not snap["data_dirs"]:
            return None
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*snap["data_dirs"])

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Table maintenance (Iceberg expire_snapshots): drop manifests
        older than the newest ``keep_last`` and delete data dirs no
        surviving manifest references. The commit point stays atomic —
        manifests are removed before their now-orphaned data files, so
        a crash mid-expire never breaks a readable snapshot."""
        import shutil

        ms = self._manifests()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        to_drop, to_keep = ms[:-keep_last], ms[-keep_last:]
        meta = os.path.join(self.root, "meta")
        live_dirs = set()
        for name in to_keep:
            with open(os.path.join(meta, name)) as fh:
                live_dirs.update(json.load(fh)["data_dirs"])
        removed_files = 0
        for name in to_drop:
            with open(os.path.join(meta, name)) as fh:
                dead = [d for d in json.load(fh)["data_dirs"]
                        if d not in live_dirs]
            os.remove(os.path.join(meta, name))  # manifest first
            for d in dead:
                if os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)
                    removed_files += 1
        return {"expired_manifests": len(to_drop),
                "removed_data_dirs": removed_files,
                "kept": len(to_keep)}

    def rewrite_data_files(self, spark: SparkSession,
                           target_rows_per_file: int = 4_000_000) -> dict:
        """Table maintenance (Iceberg rewrite_data_files, bin-pack
        strategy): incremental appends accumulate one data dir per
        commit — small-file buildup that taxes every scan's task
        scheduling. Read the live snapshot, re-bucket into
        ceil(total / target) files hash-partitioned on the leading
        sort column (keeps the spo/pos clustering usable for pruning),
        and commit the result as an OVERWRITE snapshot whose lineage
        records the compacted parent. Older sequences stay readable
        (time travel is unaffected); a later expire_snapshots reclaims
        the small files. Crash-safe by the same atomic manifest
        rename as any other commit."""
        import math

        snap = self.latest_snapshot()
        if snap is None or not snap["data_dirs"]:
            return {"rewritten": False, "reason": "empty table"}
        if len(snap["data_dirs"]) == 1:
            return {"rewritten": False, "reason": "already compact"}
        df = self.read(spark)
        n_files = max(1, math.ceil(snap["total_rows"] / target_rows_per_file))
        df = (df.repartition(n_files, self.sort_cols[0])
              if self.sort_cols else df.repartition(n_files))
        manifest = self.overwrite(df, spark, lineage={
            "rewrite_of": snap["snapshot_id"],
            "compacted_dirs": len(snap["data_dirs"]),
            "strategy": "bin-pack",
        })
        manifest["rewritten"] = True
        return manifest

    def committed_urls(self, spark: SparkSession) -> Optional[DataFrame]:
        df = self.read(spark)
        if df is None or "url" not in df.columns:
            return None
        return df.select("url").distinct()

    def merge(self, updates: DataFrame, keys: List[str],
              spark: SparkSession,
              lineage: Optional[dict] = None) -> dict:
        """MERGE INTO semantics (Iceberg `MERGE INTO t USING u ON keys
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`):
        update rows replace matched base rows, unmatched update rows
        insert. Commits one overwrite snapshot; every earlier snapshot
        stays time-travel readable (the CDC diff reads both).

        Scale shape: the matched-row removal is a left-anti join on the
        merge keys (shuffle keyed exactly like the table's sort order,
        so an Iceberg backend turns it into a co-partitioned merge-on-
        read); no collect, no driver loop. Lineage records matched /
        inserted counts — the per-partition metrics contract."""
        base = self.read(spark)
        if base is None:
            merged, matched, inserted = updates, 0, updates.count()
        else:
            matched = base.join(updates, keys, "left_semi").count()
            inserted = updates.count() - updates.join(
                base, keys, "left_semi").count()
            keep = base.join(updates, keys, "left_anti")
            merged = keep.unionByName(updates)
        info = {"op": "merge", "matched": matched, "inserted": inserted}
        info.update(lineage or {})
        return self.overwrite(merged, spark, lineage=info)
