"""Snapshot-committed table store (the Iceberg seam).

The north rule targets Iceberg tables with one atomic snapshot per
micro-batch.  This container has no Iceberg jars, so ``JobStore``
implements the same *contract* over plain Parquet + JSON manifests:

* every micro-batch writes its new data dirs, then commits ONE
  manifest file (write-temp + ``os.replace`` → atomic), then flips the
  ``LATEST`` pointer the same way;
* a crashed batch leaves a dangling data dir but no manifest → the
  next run resumes from the last committed manifest, unreferenced dirs
  are invisible (exactly Iceberg's snapshot isolation story);
* tables are either **append** (results, metrics, seen_exact — state =
  union of all committed dirs) or **log-structured** (frontier:
  base + per-batch appends − per-batch tombstones; politeness and
  seen_segments: per-batch update rows tagged ``batch_id``, latest
  wins on read), compacted every ``compact_every`` batches.  This is
  merge-on-read, Iceberg-style: a batch writes O(new links + popped
  rows + hosts fetched), never a full state rewrite — the property
  that matters at 10^10 rows / 10^8 hosts.

On a real cluster, swap ``JobStore`` for Iceberg ``MERGE INTO`` /
snapshot commits; every caller goes through this seam
(SURVEY.md §7.0).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRONTIER_SCHEMA = (
    "job_id string, url string, host string, cost double, "
    "in_flight boolean, url_hash binary, url_hash_hex string"
)
SEEN_EXACT_SCHEMA = "url_hash binary"

APPEND_TABLES = ("results", "metrics", "lineage", "seen_exact")
LOG_TABLES = ("frontier", "politeness", "seen_segments")


class JobStore:
    def __init__(self, spark: SparkSession, root: str, job_id: str):
        self.spark = spark
        self.root = root
        self.job_id = job_id
        self.dir = os.path.join(root, job_id)
        os.makedirs(self.dir, exist_ok=True)

    # -- manifest plumbing -------------------------------------------------

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.dir, f"manifest_{batch_id:08d}.json")

    def _latest_path(self) -> str:
        return os.path.join(self.dir, "LATEST")

    def latest_manifest(self) -> dict | None:
        try:
            with open(self._latest_path()) as f:
                name = f.read().strip()
            with open(os.path.join(self.dir, name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def manifest_at(self, batch_id: int) -> dict | None:
        """Time travel: any committed snapshot stays readable (the
        Iceberg snapshot-as-of contract) because commits only ADD data
        dirs and manifests — compaction rewrites the manifest's dir
        LISTS, never deletes old dirs.  Returns None for an
        uncommitted batch id."""
        try:
            with open(self._manifest_path(batch_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def snapshots(self) -> list[int]:
        """All committed batch ids, ascending (snapshot history)."""
        ids = []
        for fn in os.listdir(self.dir):
            if fn.startswith("manifest_") and fn.endswith(".json"):
                ids.append(int(fn[len("manifest_"):-len(".json")]))
        return sorted(ids)

    def _atomic_write(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def commit(self, manifest: dict) -> None:
        bid = manifest["batch_id"]
        manifest["committed_at"] = time.time()
        mpath = self._manifest_path(bid)
        self._atomic_write(mpath, json.dumps(manifest, indent=1))
        self._atomic_write(self._latest_path(), os.path.basename(mpath))

    # -- data files ---------------------------------------------------------

    def write_dir(self, table: str, batch_id: int, df: DataFrame,
                  coalesce: int | None = None) -> str:
        """Write one batch dir.  ``coalesce`` caps output files without
        a shuffle (small state tables); pre-shuffled inputs (e.g. the
        salted frontier append) pass None to keep their partitioning."""
        rel = f"{table}/batch={batch_id:08d}"
        out = os.path.join(self.dir, rel)
        w = df if coalesce is None else df.coalesce(coalesce)
        w.write.mode("overwrite").parquet(out)
        return rel

    def read_dirs(self, rels: list[str], schema: str | None = None) -> DataFrame:
        if not rels:
            assert schema is not None, "empty table list needs a schema"
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.dir, r) for r in rels]
        return self.spark.read.parquet(*paths)

    # -- assembled views ----------------------------------------------------

    def frontier(self, manifest: dict) -> DataFrame:
        t = manifest["tables"]
        base = self.read_dirs(
            t.get("frontier_base", []) + t.get("frontier_add", []),
            FRONTIER_SCHEMA,
        )
        dels = self.read_dirs(t.get("frontier_del", []), SEEN_EXACT_SCHEMA)
        if t.get("frontier_del"):
            base = base.join(dels, "url_hash", "left_anti")
        return base

    def table(self, manifest: dict, name: str, schema: str | None = None) -> DataFrame:
        return self.read_dirs(manifest["tables"].get(name, []), schema)


def new_manifest(job_id: str, batch_id: int, prev: dict | None = None) -> dict:
    m = {
        "job_id": job_id,
        "batch_id": batch_id,
        "clock": 0.0,
        "sequence": 1,
        "run_state": "running",
        "counters": {
            "item_count": 0,
            "http_success_count": 0,
            "http_error_count": 0,
            "exception_count": 0,
            "http_status_counts": {},
        },
        "tables": {},
    }
    if prev is not None:
        # carry everything forward (incl. policy/web/settings config),
        # deep-copied so callers can mutate freely
        m = json.loads(json.dumps(prev))
        m["batch_id"] = batch_id
        m.pop("committed_at", None)
    return m
