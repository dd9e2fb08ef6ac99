"""WaveStore manifest contract: atomic publish, resume pointer, and
per-partition lineage + metrics (north_rule requirement)."""

import json
import os

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder
from linkinator_spark.sources.tableio import (
    MANIFEST, IcebergWaveStore, WaveStore, iceberg_available,
    make_wave_store,
)


def test_commit_writes_lineage_and_metrics(spark, tmp_path):
    store = WaveStore(str(tmp_path / "ckpt"))
    df = spark.range(0, 100, 1, 4).selectExpr("id", "id * 2 as v")
    state = store.commit(
        wave=0, clock=1.5, dfs={"frontier": df},
        metrics={"fetched_hosts": {"a.example": 7}},
    )
    # re-read frame is usable and complete
    assert state["frontier"].count() == 100

    wave_dir = store._wave_dir(0)
    manifest = json.load(open(os.path.join(wave_dir, MANIFEST)))
    assert manifest["wave"] == 0 and manifest["clock"] == 1.5
    assert manifest["metrics"]["fetched_hosts"] == {"a.example": 7}
    lin = manifest["lineage"]["frontier"]
    # every written parquet part is accounted for, rows add up
    assert lin["rows"] == 100
    assert sum(p["rows"] for p in lin["parts"].values()) == 100
    assert all(p["bytes"] > 0 for p in lin["parts"].values())
    assert len(lin["parts"]) >= 1

    # resume pointer advances with a second commit
    assert store.latest_wave() == 0
    store.commit(wave=1, clock=2.0, dfs={"frontier": df.limit(10)})
    assert store.latest_wave() == 1
    m1, tables = store.load(spark, 1)
    assert m1["lineage"]["frontier"]["rows"] == 10
    assert tables["frontier"].count() == 10


# ------------------------------------------------- backend contract tests

def _make_store(backend, spark, tmp_path):
    if backend == "parquet":
        return WaveStore(str(tmp_path / "ckpt"))
    if not iceberg_available(spark, "ckpt_cat"):
        pytest.skip("iceberg-spark runtime not on the classpath "
                    "(offline container; runs on a cluster with the jar)")
    return IcebergWaveStore(spark, "ckpt_cat")


@pytest.mark.parametrize("backend", ["parquet", "iceberg"])
def test_store_contract_commit_resume_lineage(spark, tmp_path, backend):
    """Backend-agnostic WaveStore contract: commit returns re-readable
    frames, latest_wave tracks the newest commit, load() returns the
    manifest (wave/clock/metrics/tables/lineage) plus consistent tables —
    the exact surface the crawl loop and resume path consume."""
    store = _make_store(backend, spark, tmp_path)
    df = spark.range(0, 100, 1, 4).selectExpr("id", "id * 2 as v")
    state = store.commit(wave=0, clock=1.5, dfs={"frontier": df},
                         metrics={"wave": 0, "clock": 1.5})
    assert state["frontier"].count() == 100
    assert store.latest_wave() == 0
    store.commit(wave=1, clock=2.0, dfs={"frontier": df.limit(10)})
    assert store.latest_wave() == 1
    manifest, tables = store.load(spark, 1)
    assert manifest["wave"] == 1 and manifest["clock"] == 2.0
    assert manifest["tables"] == ["frontier"]
    assert tables["frontier"].count() == 10
    assert manifest["lineage"]["frontier"]["rows"] == 10
    # wave 0 stays addressable (snapshot / directory isolation)
    m0, t0 = store.load(spark, 0)
    assert t0["frontier"].count() == 100 and m0["clock"] == 1.5


def test_make_wave_store_backend_selection(spark, tmp_path):
    cfg_parquet = CheckOptions(paths=[], checkpoint_dir=str(tmp_path / "c"))
    assert isinstance(make_wave_store(spark, cfg_parquet), WaveStore)
    assert make_wave_store(spark, CheckOptions(paths=[])) is None
    cfg_ice = CheckOptions(paths=[], checkpoint_catalog="nope_cat")
    with pytest.raises(RuntimeError, match="iceberg"):
        # catalog requested but the runtime/catalog conf is absent here
        make_wave_store(spark, cfg_ice)


def test_checkpoint_commit_no_driver_host_collect(spark, tmp_path, monkeypatch):
    """Per-wave metrics must travel as a parquet state table, never a
    host-cardinality driver collect: at 10^6+ distinct hosts that dict
    would be a multi-MB manifest entry per wave. Guard: during every
    WaveStore.commit of a checkpointed crawl, DataFrame.collect/toPandas
    are poisoned and the manifest metrics must stay O(1) scalars."""
    from pyspark.sql import DataFrame

    from linkinator_spark.sources import tableio

    real_commit = tableio.WaveStore.commit

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side row materialization during commit")

    def guarded(self, wave, clock, dfs, metrics=None):
        assert set(metrics or {}) <= {"wave", "clock"}, (
            "manifest metrics must be bounded scalars; data-shaped metrics "
            "belong in a committed table")
        with monkeypatch.context() as m:
            m.setattr(DataFrame, "collect", _boom)
            m.setattr(DataFrame, "toPandas", _boom)
            return real_commit(self, wave, clock, dfs, metrics)

    monkeypatch.setattr(tableio.WaveStore, "commit", guarded)

    site = SiteBuilder()
    site.page("http://a.local/", html=(
        '<a href="http://a.local/x">x</a><a href="http://b.local/y">y</a>'))
    site.page("http://a.local/x", html='<a href="http://b.local/z">z</a>')
    site.page("http://b.local/y", html="<p>ok</p>")
    site.page("http://b.local/z", html="<p>ok</p>")
    pages, docs = site.build(spark)
    ckpt = str(tmp_path / "ckpt")
    cfg = CheckOptions(paths=["http://a.local/"], recurse=True,
                       checkpoint_dir=ckpt)
    res = LinkChecker(spark).check(cfg, pages, docs)
    assert res.results.count() >= 4

    # per-host counts landed as a state table, accounted in lineage
    store = WaveStore(ckpt)
    manifest, tables = store.load(spark, store.latest_wave())
    assert "host_metrics" in manifest["tables"]
    assert manifest["lineage"]["host_metrics"]["rows"] >= 0
    counts = {r["host"]: r["n_fetched"]
              for r in tables["host_metrics"].collect()}
    assert all(n > 0 for n in counts.values())
