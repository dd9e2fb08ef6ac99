"""WaveStore — atomic per-wave state commits with resume.

The north_rule requires the crawl to be "resumable from checkpoint with
per-partition lineage + metrics". The design target is an Iceberg catalog
(hidden partitioning on wave/host_bucket, snapshot-based resume); this
container has no Iceberg runtime jar and no network, so WaveStore provides the
same contract over parquet directories + a manifest JSON committed atomically
(write-tmp-then-rename). Swapping in Iceberg means replacing `_write`/`_read`
with `df.writeTo(...)` and manifest state with snapshot metadata — the crawler
loop does not change.

Checkpointing every wave also truncates the iterative plan lineage (the
classic iterative-Spark blowup): each wave reads back columnar state instead
of stacking N waves of logical plan.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


class WaveStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave_{wave:05d}")

    def commit(self, wave: int, clock: float, dfs: dict[str, DataFrame],
               metrics: dict | None = None) -> dict[str, DataFrame]:
        """Write every state table, then atomically publish the manifest.
        Returns re-read DataFrames (lineage truncated)."""
        wave_dir = self._wave_dir(wave)
        tmp_dir = wave_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        spark = None
        lineage: dict[str, dict] = {}
        for name, df in dfs.items():
            spark = df.sparkSession
            path = os.path.join(tmp_dir, name)
            df.write.mode("overwrite").parquet(path)
            lineage[name] = self._partition_lineage(path)
        manifest = {
            "wave": wave,
            "clock": clock,
            "tables": sorted(dfs.keys()),
            "committed_at": time.time(),
            "metrics": metrics or {},
            # per-partition lineage (north_rule): one entry per written
            # parquet part with its row count and bytes, read from parquet
            # footers — the manifest-level bookkeeping Iceberg snapshots
            # carry natively; lets a resume (or an auditor) account for
            # every row of every wave without rescanning data
            "lineage": lineage,
        }
        with open(os.path.join(tmp_dir, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        if os.path.exists(wave_dir):
            shutil.rmtree(wave_dir)
        os.rename(tmp_dir, wave_dir)  # atomic publish
        # update the root pointer last — a crash before this line leaves the
        # previous wave as the resume point (exactly-once wave semantics)
        with open(os.path.join(self.root, "_latest.tmp"), "w") as f:
            json.dump({"wave": wave}, f)
        os.replace(os.path.join(self.root, "_latest.tmp"),
                   os.path.join(self.root, "_latest.json"))
        assert spark is not None
        return {name: spark.read.parquet(os.path.join(wave_dir, name)) for name in dfs}

    @staticmethod
    def _partition_lineage(table_dir: str) -> dict:
        """Per-part row/byte counts from parquet footers (driver-side
        metadata pass, no Spark job)."""
        parts: dict[str, dict] = {}
        total_rows = 0
        try:
            import pyarrow.parquet as pq

            for fn in sorted(os.listdir(table_dir)):
                if not fn.endswith(".parquet"):
                    continue
                fpath = os.path.join(table_dir, fn)
                meta = pq.ParquetFile(fpath).metadata
                parts[fn] = {
                    "rows": meta.num_rows,
                    "bytes": os.path.getsize(fpath),
                }
                total_rows += meta.num_rows
        except Exception:  # lineage is advisory; never fail a commit on it
            pass
        return {"parts": parts, "rows": total_rows}

    def latest_wave(self) -> int | None:
        ptr = os.path.join(self.root, "_latest.json")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            return json.load(f)["wave"]

    def load(self, spark: SparkSession, wave: int) -> tuple[dict, dict[str, DataFrame]]:
        wave_dir = self._wave_dir(wave)
        with open(os.path.join(wave_dir, MANIFEST)) as f:
            manifest = json.load(f)
        dfs = {
            name: spark.read.parquet(os.path.join(wave_dir, name))
            for name in manifest["tables"]
        }
        return manifest, dfs
