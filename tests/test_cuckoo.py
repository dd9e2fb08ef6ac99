"""Cuckoo URL-seen pre-filter (operators/cuckoo.py): the Bloom alternative
the north-star design names ("partitioned Bloom/Cuckoo URL-seen filter").

Same contract as bloom.py — NO false negatives, exactness restored by the
anti-join on the maybe-seen slice — plus deletion (which Bloom bits can't
do without a rebuild). These tests mirror test_bloom_streaming /
test_scale_wiring for the Bloom twin, and add the deletion property and a
whole-engine knob-equivalence crawl (seen_filter="cuckoo" must not change
crawl results vs "bloom" vs OFF — reference fetch-once semantics,
/root/reference/src/index.ts:813-817).
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.operators.cuckoo import (
    CuckooFilter, build_cuckoo, dedup_with_cuckoo,
)
from linkinator_spark.sources.fixtures import SiteBuilder
from linkinator_spark.sources.webgraph import synth_frontier


def _rand_keys(n, seed=7):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(-2**62, 2**62, size=n, dtype=np.int64))


def test_cuckoo_no_false_negatives_and_fpp():
    keys = _rand_keys(100_000)
    cf = CuckooFilter(expected=len(keys))
    cf.add_many(keys)
    assert cf.might_contain(keys).all()
    probe = _rand_keys(200_000, seed=11)
    probe = probe[~np.isin(probe, keys)]
    # 16-bit fingerprints in 4-slot buckets: design fpp ~2*4/2^16 ≈ 0.012%
    assert cf.might_contain(probe).mean() < 0.002


def test_cuckoo_deletion():
    """The property Bloom lacks: removing keys clears membership (modulo
    the fingerprint-collision fpp) without touching the surviving keys."""
    keys = _rand_keys(50_000)
    cf = CuckooFilter(expected=len(keys))
    cf.add_many(keys)
    gone, kept = keys[::2], keys[1::2]
    assert cf.delete_many(gone) == len(gone)
    assert cf.might_contain(kept).all()  # still no false negatives
    assert cf.might_contain(gone).mean() < 0.002  # membership cleared


def test_cuckoo_merge_roundtrip():
    """Partition-mini merge by fingerprint relocation + payload roundtrip
    keep the no-false-negative guarantee."""
    keys = _rand_keys(60_000)
    cf = CuckooFilter(expected=len(keys))
    for part in np.array_split(keys, 5):
        mini = CuckooFilter.zero(cf.m, cf.b)
        mini.add_many(part)
        cf.merge(mini)
    assert cf.might_contain(keys).all()
    clone = CuckooFilter.from_payload(cf.payload())
    assert clone.might_contain(keys).all()


def test_dedup_with_cuckoo_equals_anti_join(spark):
    frontier = synth_frontier(spark, 2000, n_hosts=50)
    seen = frontier.filter(F.col("seq") % 3 == 0).select("url")
    cf = build_cuckoo(seen, expected=1000)
    exact = frontier.join(seen, "url", "left_anti")
    via = dedup_with_cuckoo(frontier, seen, cf)
    a = {r["url"] for r in exact.select("url").collect()}
    b = {r["url"] for r in via.select("url").collect()}
    assert a == b


def test_build_cuckoo_never_materializes_rows(spark, monkeypatch):
    """Like build_bloom: the distributed build moves per-partition filter
    tables, never rows — driver-side row materialization is forbidden."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side row materialization in build_cuckoo")

    urls = spark.range(0, 1_000_000, 1, 8).select(
        F.concat(F.lit("http://h"), (F.col("id") % 997).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url")
    )
    with monkeypatch.context() as m:
        m.setattr(DataFrame, "toPandas", _boom)
        m.setattr(DataFrame, "collect", _boom)
        cf = build_cuckoo(urls, expected=1_000_000)

    sample = urls.limit(2000).select(F.xxhash64("url").alias("h")).collect()
    hashes = np.array([r["h"] for r in sample], dtype=np.int64)
    assert cf.might_contain(hashes).all()
    probe = spark.range(20_000_000, 20_005_000).select(
        F.xxhash64(F.concat(F.lit("http://other.example/"),
                            F.col("id").cast("string"))).alias("h")
    ).collect()
    fp = cf.might_contain(
        np.array([r["h"] for r in probe], dtype=np.int64)).mean()
    assert fp < 0.01


def _site(n_internal=1500, n_external=1200, n_ext_hosts=40):
    """Hot-host site with true seen-hits (children link back to the root and
    a shared page) so the maybe-seen slice is exercised."""
    site = SiteBuilder()
    links = [f"http://hot.local/child/{i}" for i in range(n_internal)]
    links += [f"http://ext{i % n_ext_hosts}.example/p/{i}"
              for i in range(n_external)]
    site.page("http://hot.local/",
              html="".join(f'<a href="{u}">x</a>' for u in links))
    back = ('<a href="http://hot.local/">root</a>'
            '<a href="http://hot.local/shared">s</a>')
    for i in range(n_internal):
        site.page(f"http://hot.local/child/{i}", html=back)
    site.page("http://hot.local/shared", html="<p>shared</p>")
    for i in range(n_external):
        site.page(f"http://ext{i % n_ext_hosts}.example/p/{i}",
                  html="<p>ok</p>")
    return site


@pytest.fixture(scope="module")
def cuckoo_site_tables(spark):
    return _site().build(spark)


def _crawl_rows(spark, tables, **knobs):
    pages, docs = tables
    cfg = CheckOptions(paths=["http://hot.local/"], recurse=True, **knobs)
    res = LinkChecker(spark).check(cfg, pages, docs)
    rows = {
        (r["url"], r["state"], r["parent"])
        for r in res.results.select("url", "state", "parent").collect()
    }
    return rows, res.passed


def test_seen_filter_knob_does_not_change_results(spark, cuckoo_site_tables):
    """Whole-engine equivalence: seen_filter="cuckoo" (build + per-wave
    incremental maintenance + prefilter split) produces the identical
    result set as the Bloom path and as the plain anti-join."""
    cuckoo_rows, cuckoo_passed = _crawl_rows(
        spark, cuckoo_site_tables, seen_filter="cuckoo",
        use_bloom=True, bloom_min_frontier=0, bloom_expected=20_000,
    )
    bloom_rows, bloom_passed = _crawl_rows(
        spark, cuckoo_site_tables, seen_filter="bloom",
        use_bloom=True, bloom_min_frontier=0, bloom_expected=20_000,
    )
    off_rows, off_passed = _crawl_rows(
        spark, cuckoo_site_tables, use_bloom=False,
    )
    assert cuckoo_passed == bloom_passed == off_passed
    assert cuckoo_rows == bloom_rows == off_rows
