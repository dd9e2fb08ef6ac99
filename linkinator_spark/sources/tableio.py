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

    # ---- intra-wave journal (mid-wave resume without re-fetching) ----
    #
    # The wave commit above is the durable boundary; a crash mid-wave
    # would otherwise repeat that wave's side effects (live HTTP
    # requests) on resume. Fetch stages therefore publish their output
    # here as soon as they materialize — each stage is its own atomic
    # tmp-then-rename publish with per-partition lineage in a sidecar —
    # and a resume into the same wave replays journaled rows instead of
    # re-requesting them. The wave's full commit supersedes the journal
    # (clear_partials). Pure-compute stages never journal: re-deriving
    # a table join has no side effects to avoid.

    def _partial_dir(self, wave: int) -> str:
        return self._wave_dir(wave) + ".partial"

    def commit_partial(self, wave: int, name: str,
                       df: DataFrame) -> DataFrame:
        """Atomically publish one intra-wave artifact (a fetch stage's
        output); returns the re-read DataFrame (materialized, lineage
        truncated)."""
        pdir = self._partial_dir(wave)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, name + ".tmp")
        final = os.path.join(pdir, name)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        lineage = self._partition_lineage(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic publish of the stage
        side = os.path.join(pdir, name + ".lineage.tmp")
        with open(side, "w") as f:
            json.dump({"wave": wave, "stage": name, "lineage": lineage}, f)
        os.replace(side, os.path.join(pdir, name + ".lineage.json"))
        return df.sparkSession.read.parquet(final)

    def load_partials(self, spark: SparkSession,
                      wave: int) -> dict[str, DataFrame]:
        """Every published intra-wave artifact of `wave` (stage name ->
        DataFrame); {} when the wave has no journal. Unpublished .tmp
        leftovers from a crash mid-write are ignored (and cleaned)."""
        pdir = self._partial_dir(wave)
        if not os.path.isdir(pdir):
            return {}
        out: dict[str, DataFrame] = {}
        for name in sorted(os.listdir(pdir)):
            path = os.path.join(pdir, name)
            if name.endswith(".tmp"):
                shutil.rmtree(path, ignore_errors=True)
                continue
            if name.endswith(".json") or not os.path.isdir(path):
                continue
            out[name] = spark.read.parquet(path)
        return out

    def clear_partials(self, wave: int) -> None:
        shutil.rmtree(self._partial_dir(wave), ignore_errors=True)

    def load(self, spark: SparkSession, wave: int) -> tuple[dict, dict[str, DataFrame]]:
        wave_dir = self._wave_dir(wave)
        with open(os.path.join(wave_dir, MANIFEST)) as f:
            manifest = json.load(f)
        dfs = {
            name: spark.read.parquet(os.path.join(wave_dir, name))
            for name in manifest["tables"]
        }
        return manifest, dfs

    # ---- store maintenance (the Iceberg expire_snapshots /
    # rewrite_data_files analogs) ----
    #
    # Every wave commits full state, so a long crawl accumulates one
    # directory per wave: at 10^10 URLs x hundreds of waves the history
    # dominates storage, and the newest wave's `seen` table carries one
    # small file per shuffle partition per commit — death-by-small-files
    # for the anti-join scan. Maintenance is two idempotent operations a
    # scheduler runs between waves; both preserve resume semantics
    # exactly (resume only ever reads the latest pointer).

    def expire(self, keep_last: int = 1) -> dict:
        """Free the data of waves older than the newest ``keep_last``
        (never the latest), appending each expired wave's manifest to
        ``_history.jsonl`` so per-partition lineage and metrics remain
        auditable after the data is gone — what Iceberg's
        expire_snapshots keeps in its metadata log."""
        latest = self.latest_wave()
        expired: list[int] = []
        if latest is None:
            return {"expired": expired}
        cutoff = latest - max(1, keep_last)
        hist = os.path.join(self.root, "_history.jsonl")
        for fn in sorted(os.listdir(self.root)):
            if not (fn.startswith("wave_") and not fn.endswith(".tmp")):
                continue
            w = int(fn.split("_")[1])
            if w > cutoff:
                continue
            man_path = os.path.join(self.root, fn, MANIFEST)
            if os.path.exists(man_path):
                with open(man_path) as f:
                    man = json.load(f)
                man["expired_at"] = time.time()
                with open(hist, "a") as h:
                    h.write(json.dumps(man) + "\n")
            shutil.rmtree(os.path.join(self.root, fn))
            expired.append(w)
        return {"expired": expired}

    def rewrite(self, spark: SparkSession, table: str, n_files: int,
                key: str | None = None, wave: int | None = None) -> dict:
        """Compact one table of a committed wave (default: latest) into
        ``n_files`` parts — hash-bucketed on ``key`` when given, so the
        URL-seen anti-join scans co-locatable buckets instead of the
        accumulated per-commit small files. Atomic (tmp write + two
        renames); the manifest's lineage is refreshed and the rewrite
        recorded, rows are never changed (asserted)."""
        wave = self.latest_wave() if wave is None else wave
        wave_dir = self._wave_dir(wave)
        path = os.path.join(wave_dir, table)
        before = spark.read.parquet(path)
        n_before = before.count()
        out = (before.repartition(n_files, key)
               if key else before.repartition(n_files))
        tmp = path + ".rw.tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        out.write.mode("overwrite").parquet(tmp)
        lineage = self._partition_lineage(tmp)
        if lineage["rows"] != n_before:  # paranoia: rewrite moves bytes,
            shutil.rmtree(tmp)           # never rows
            raise RuntimeError(
                f"rewrite row drift on {table}: {n_before} -> "
                f"{lineage['rows']}")
        old = path + ".rw.old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        man_path = os.path.join(wave_dir, MANIFEST)
        with open(man_path) as f:
            man = json.load(f)
        man["lineage"][table] = lineage
        man.setdefault("rewrites", []).append(
            {"table": table, "n_files": n_files, "key": key,
             "at": time.time()})
        with open(man_path + ".tmp", "w") as f:
            json.dump(man, f, indent=1)
        os.replace(man_path + ".tmp", man_path)
        return lineage


# --------------------------------------------------------------- Iceberg

def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True when the iceberg-spark runtime is on the classpath AND the
    named catalog is configured. This container ships neither (no network
    to fetch the jar — SURVEY §7.0), so the Iceberg branch is exercised
    only where a cluster provides them; contract tests skip otherwise."""
    try:
        if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
            return False
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergWaveStore:
    """Iceberg branch of the WaveStore contract (same surface: commit /
    latest_wave / load).

    Layout: one Iceberg table per state name under `{catalog}.{ns}`, plus
    a `wave_manifest` table. A wave commit overwrites each state table
    (its own atomic Iceberg snapshot, hidden-partitioned storage managed
    by the catalog) and records every table's resulting `snapshot_id` in
    ONE appended manifest row — that single-row append is the atomic
    publish point, exactly like the parquet store's manifest rename. A
    crash mid-commit leaves newer state snapshots unreferenced by any
    manifest row; resume reads each table `VERSION AS OF` the snapshot
    ids in the latest manifest row, so it can never observe a torn wave.
    Per-partition lineage comes from Iceberg's own snapshot/files
    metadata tables rather than a footer pass.
    """

    def __init__(self, spark: SparkSession, catalog: str,
                 namespace: str = "linkinator"):
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        spark.sql(f"create namespace if not exists {self.prefix}")
        spark.sql(
            f"create table if not exists {self.prefix}.wave_manifest ("
            "wave int, clock double, committed_at timestamp, "
            "metrics string, snapshots map<string, bigint>) using iceberg"
        )

    def _tbl(self, name: str) -> str:
        return f"{self.prefix}.st_{name}"

    def _snapshot_id(self, name: str) -> int:
        row = self.spark.sql(
            f"select snapshot_id from {self._tbl(name)}.snapshots "
            "order by committed_at desc limit 1"
        ).collect()
        return int(row[0][0])

    def commit(self, wave: int, clock: float, dfs: dict[str, DataFrame],
               metrics: dict | None = None) -> dict[str, DataFrame]:
        snapshots = {}
        for name, df in dfs.items():
            df.writeTo(self._tbl(name)).using("iceberg").createOrReplace()
            snapshots[name] = self._snapshot_id(name)
        manifest_row = self.spark.createDataFrame(
            [(wave, float(clock), json.dumps(metrics or {}), snapshots)],
            "wave int, clock double, metrics string, "
            "snapshots map<string, bigint>",
        ).withColumn("committed_at", F_current_timestamp())
        # the atomic publish: one Iceberg append transaction
        manifest_row.select(
            "wave", "clock", "committed_at", "metrics", "snapshots"
        ).writeTo(f"{self.prefix}.wave_manifest").append()
        return {
            name: self.spark.read.option(
                "snapshot-id", snapshots[name]
            ).table(self._tbl(name))
            for name in dfs
        }

    def latest_wave(self) -> int | None:
        rows = self.spark.sql(
            f"select max(wave) from {self.prefix}.wave_manifest"
        ).collect()
        return None if not rows or rows[0][0] is None else int(rows[0][0])

    # ---- intra-wave journal (same contract as WaveStore's) ----
    # one Iceberg table per (wave, stage); createOrReplace is the atomic
    # publish, exactly like the parquet store's dir rename. Never
    # referenced by any manifest row — the journal is superseded by the
    # wave's full commit and dropped then.

    def _partial_tbl(self, wave: int, name: str) -> str:
        return f"{self.prefix}.pw{wave:05d}_{name}"

    def commit_partial(self, wave: int, name: str,
                       df: DataFrame) -> DataFrame:
        tbl = self._partial_tbl(wave, name)
        df.writeTo(tbl).using("iceberg").createOrReplace()
        return self.spark.read.table(tbl)

    def load_partials(self, spark: SparkSession,
                      wave: int) -> dict[str, DataFrame]:
        pref = f"pw{wave:05d}_"
        out: dict[str, DataFrame] = {}
        for r in spark.sql(f"show tables in {self.prefix}").collect():
            t = r["tableName"]
            if t.startswith(pref):
                out[t[len(pref):]] = spark.read.table(f"{self.prefix}.{t}")
        return out

    def clear_partials(self, wave: int) -> None:
        pref = f"pw{wave:05d}_"
        for r in self.spark.sql(f"show tables in {self.prefix}").collect():
            t = r["tableName"]
            if t.startswith(pref):
                self.spark.sql(
                    f"drop table if exists {self.prefix}.{t}")

    def load(self, spark: SparkSession, wave: int):
        row = spark.sql(
            f"select * from {self.prefix}.wave_manifest where wave = {wave} "
            "order by committed_at desc limit 1"
        ).collect()[0]
        manifest = {
            "wave": int(row["wave"]), "clock": float(row["clock"]),
            "metrics": json.loads(row["metrics"]),
            "tables": sorted(row["snapshots"].keys()),
            # lineage: per-file rows/bytes from Iceberg's files metadata
            "lineage": {
                name: self._lineage(name, snap)
                for name, snap in row["snapshots"].items()
            },
        }
        dfs = {
            name: spark.read.option("snapshot-id", snap).table(self._tbl(name))
            for name, snap in row["snapshots"].items()
        }
        return manifest, dfs

    def _lineage(self, name: str, snapshot_id: int) -> dict:
        try:
            rows = self.spark.sql(
                f"select file_path, record_count, file_size_in_bytes "
                f"from {self._tbl(name)}.files "
                f"version as of {snapshot_id}"
            ).collect()
            return {
                "parts": {r[0]: {"rows": int(r[1]), "bytes": int(r[2])}
                          for r in rows},
                "rows": sum(int(r[1]) for r in rows),
            }
        except Exception:  # lineage is advisory; never fail a load on it
            return {"parts": {}, "rows": 0}

    # ---- store maintenance: Iceberg runs these natively ----

    def expire(self, keep_last: int = 1) -> dict:
        """Delegate to Iceberg's snapshot expiry on every state table.
        The wave_manifest table is append-only and tiny — it IS the
        history log, so it is never expired (the parquet store's
        _history.jsonl analog comes for free)."""
        latest = self.latest_wave()
        expired: list[str] = []
        if latest is None:
            return {"expired": expired}
        catalog, namespace = self.prefix.split(".", 1)
        names = [r["tableName"] for r in self.spark.sql(
            f"show tables in {self.prefix}").collect()]
        for name in names:
            if not name.startswith("st_"):
                continue  # manifest history + journals are never expired
            self.spark.sql(
                f"call {catalog}.system.expire_snapshots("
                f"table => '{namespace}.{name}', retain_last => "
                f"{max(1, keep_last)})")
            expired.append(name)
        return {"expired": expired}

    def rewrite(self, spark: SparkSession, table: str, n_files: int,
                key: str | None = None, wave: int | None = None) -> dict:
        """Delegate to Iceberg's rewrite_data_files compaction (bin-pack
        strategy); bucketing rides the table's partition spec, so `key`
        and `n_files` shape the target via the table layout, not this
        call."""
        catalog, namespace = self.prefix.split(".", 1)
        self.spark.sql(
            f"call {catalog}.system.rewrite_data_files("
            f"table => '{namespace}.st_{table}', "
            "options => map('min-input-files', '2'))")
        return self._lineage(table, self._snapshot_id(table))


def F_current_timestamp():
    from pyspark.sql import functions as F

    return F.current_timestamp()


def make_wave_store(spark: SparkSession, cfg):
    """Backend factory for the crawl loop: `checkpoint_catalog` (an
    Iceberg catalog name) selects the Iceberg branch when its runtime is
    loadable; `checkpoint_dir` selects the parquet+manifest store. The
    crawler is backend-agnostic — both satisfy the same commit/resume/
    lineage contract (tests/test_wavestore_lineage.py parameterizes over
    them)."""
    catalog = getattr(cfg, "checkpoint_catalog", None)
    if catalog:
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"checkpoint_catalog={catalog!r} requires the "
                "iceberg-spark runtime jar and a configured "
                f"spark.sql.catalog.{catalog}")
        return IcebergWaveStore(spark, catalog)
    if cfg.checkpoint_dir:
        return WaveStore(cfg.checkpoint_dir)
    return None
