"""WaveStore maintenance (sources/tableio.py expire/rewrite — the
Iceberg expire_snapshots / rewrite_data_files analogs): history
retention, small-file compaction, bucketed layout, and resume
equivalence after maintenance.
"""

import json
import os
import tempfile

from pyspark.sql import functions as F

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder
from linkinator_spark.sources.tableio import MANIFEST, WaveStore


def _commit_waves(spark, root, n=4):
    store = WaveStore(root)
    for w in range(n):
        df = spark.range(0, 50 * (w + 1), 1, 4).selectExpr(
            "id", "id % 7 as host_bucket")
        store.commit(wave=w, clock=float(w), dfs={"seen": df},
                     metrics={"wave": w})
    return store


def test_expire_keeps_latest_and_logs_history(spark, tmp_path):
    store = _commit_waves(spark, str(tmp_path / "ckpt"), n=4)
    out = store.expire(keep_last=2)
    assert out["expired"] == [0, 1]
    # latest two waves intact, resume pointer untouched
    assert store.latest_wave() == 3
    assert not os.path.exists(store._wave_dir(0))
    assert os.path.exists(store._wave_dir(2))
    m, tables = store.load(spark, 3)
    assert tables["seen"].count() == 200
    # expired manifests preserved with lineage + metrics
    hist = [json.loads(line) for line in
            open(os.path.join(store.root, "_history.jsonl"))]
    assert [h["wave"] for h in hist] == [0, 1]
    assert all(h["lineage"]["seen"]["rows"] == 50 * (h["wave"] + 1)
               for h in hist)
    assert all("expired_at" in h for h in hist)
    # idempotent
    assert store.expire(keep_last=2)["expired"] == []


def test_expire_never_removes_latest(spark, tmp_path):
    store = _commit_waves(spark, str(tmp_path / "ckpt"), n=2)
    out = store.expire(keep_last=1)
    assert out["expired"] == [0]
    assert store.expire(keep_last=1)["expired"] == []
    assert os.path.exists(store._wave_dir(1))


def test_rewrite_compacts_preserving_rows(spark, tmp_path):
    store = _commit_waves(spark, str(tmp_path / "ckpt"), n=2)
    before = set(map(tuple, store.load(spark, 1)[1]["seen"].collect()))
    n_parts_before = len(
        [f for f in os.listdir(os.path.join(store._wave_dir(1), "seen"))
         if f.endswith(".parquet")])
    lineage = store.rewrite(spark, "seen", n_files=2)
    after = set(map(tuple, store.load(spark, 1)[1]["seen"].collect()))
    assert after == before
    assert lineage["rows"] == 100
    n_parts_after = len(lineage["parts"])
    assert n_parts_after == 2 < n_parts_before
    # manifest refreshed: lineage matches the new layout, rewrite logged
    man = json.load(open(os.path.join(store._wave_dir(1), MANIFEST)))
    assert man["lineage"]["seen"] == lineage
    assert man["rewrites"][0]["table"] == "seen"
    assert man["rewrites"][0]["n_files"] == 2


def test_rewrite_bucketed_colocates_keys(spark, tmp_path):
    store = _commit_waves(spark, str(tmp_path / "ckpt"), n=1)
    store.rewrite(spark, "seen", n_files=4, key="host_bucket")
    table_dir = os.path.join(store._wave_dir(0), "seen")
    seen_in = {}
    for fn in os.listdir(table_dir):
        if not fn.endswith(".parquet"):
            continue
        for r in spark.read.parquet(
                os.path.join(table_dir, fn)).collect():
            seen_in.setdefault(r["host_bucket"], set()).add(fn)
    # hash bucketing: every key lives in exactly one part file
    assert all(len(files) == 1 for files in seen_in.values())


def test_resume_identical_after_maintenance(spark):
    """A crawl resumed from a maintained store (old waves expired, the
    resume wave's tables compacted + bucketed) reproduces the
    uninterrupted run row-for-row — maintenance never changes
    semantics, only layout."""
    def build():
        site = SiteBuilder()
        site.page("http://fake.local/",
                  html='<a href="a.html">a</a><a href="b.html">b</a>')
        site.page("http://fake.local/a.html", html='<a href="c.html">c</a>')
        site.page("http://fake.local/b.html",
                  html='<a href="missing.html">m</a>')
        site.page("http://fake.local/c.html", html="<p>c</p>")
        site.page("http://fake.local/missing.html", status=404)
        return site

    with tempfile.TemporaryDirectory() as ckpt:
        cfg = CheckOptions(paths=["http://fake.local/"], recurse=True,
                           checkpoint_dir=ckpt)
        pages, docs = build().build(spark)
        full = LinkChecker(spark).check(cfg, pages, docs)
        full_rows = {(r["url"], r["state"], r["parent"])
                     for r in full.results.collect()}

        # crash back to wave 1, then run maintenance on what remains
        with open(os.path.join(ckpt, "_latest.json"), "w") as f:
            json.dump({"wave": 1}, f)
        store = WaveStore(ckpt)
        store.expire(keep_last=1)
        man, tables = store.load(spark, 1)
        for table in man["tables"]:
            store.rewrite(spark, table, n_files=2)

        resumed = LinkChecker(spark).check(cfg, pages, docs, resume=True)
        resumed_rows = {(r["url"], r["state"], r["parent"])
                        for r in resumed.results.collect()}
        assert resumed_rows == full_rows
