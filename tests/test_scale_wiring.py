"""Scale-path wiring: distributed Bloom build, Bloom/salting knobs wired
into the crawl loop, and the join-free politeness budget split.

These guard the round-2 integration work: the Bloom pre-filter and the
skew-salted per-host budget are no longer standalone operators — the engine
uses them, and flipping the knobs must never change crawl results.
"""

import pyspark.sql.functions as F
import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.bloom import build_bloom
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.operators.politeness import politeness_budget_split
from linkinator_spark.sources.fixtures import SiteBuilder
from linkinator_spark.sources.webgraph import synth_frontier


def test_build_bloom_never_materializes_rows(spark, monkeypatch):
    """The distributed build must move bitmaps, not rows: driver-side row
    materialization (toPandas/collect) is forbidden during the build."""
    import numpy as np
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side row materialization in build_bloom")

    urls = spark.range(0, 10_000_000, 1, 8).select(
        F.concat(F.lit("http://h"), (F.col("id") % 997).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url")
    )
    with monkeypatch.context() as m:
        m.setattr(DataFrame, "toPandas", _boom)
        m.setattr(DataFrame, "collect", _boom)
        bloom = build_bloom(urls, expected=10_000_000, fpp=0.01)

    # no false negatives on a sample of the added keys
    sample = urls.limit(2000).select(F.xxhash64("url").alias("h")).collect()
    hashes = np.array([r["h"] for r in sample], dtype=np.int64)
    assert bloom.might_contain(hashes).all()
    # filter is selective on keys that were never added
    probe = spark.range(20_000_000, 20_005_000).select(
        F.xxhash64(F.concat(F.lit("http://other.example/"),
                            F.col("id").cast("string"))).alias("h")
    ).collect()
    fp = bloom.might_contain(
        np.array([r["h"] for r in probe], dtype=np.int64)).mean()
    assert fp < 0.05


def test_politeness_budget_split_equals_naive_window(spark):
    from pyspark.sql.window import Window

    frontier = synth_frontier(spark, 20_000, n_hosts=60, skew=5.0).drop("url_hash")
    budget = 7
    w = Window.partitionBy("host").orderBy("not_before", "seq")
    naive_take = (
        frontier.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= budget).drop("_rk")
    )
    take, overflow = politeness_budget_split(frontier, budget, salt_threshold=500)
    assert {r["url"] for r in take.collect()} == \
        {r["url"] for r in naive_take.collect()}
    # overflow is exactly the complement — nothing lost, nothing duplicated
    assert take.count() + overflow.count() == frontier.count()
    assert take.join(overflow, "url", "semi").count() == 0


def _skewed_site(n_internal=6000, n_external=5000, n_ext_hosts=50):
    """Root on one hot host linking to n_internal same-host pages (crawled,
    each linking back to the root and a shared page — true seen-hits for the
    Bloom maybe-path) plus n_external links spread over external hosts."""
    site = SiteBuilder()
    links = []
    for i in range(n_internal):
        links.append(f"http://hot.local/child/{i}")
    for i in range(n_external):
        links.append(f"http://ext{i % n_ext_hosts}.example/page/{i}")
    root_html = "".join(f'<a href="{u}">x</a>' for u in links)
    site.page("http://hot.local/", html=root_html)
    back = '<a href="http://hot.local/">root</a><a href="http://hot.local/shared">s</a>'
    for i in range(n_internal):
        site.page(f"http://hot.local/child/{i}", html=back)
    site.page("http://hot.local/shared", html="<p>shared</p>")
    for i in range(n_external):
        site.page(f"http://ext{i % n_ext_hosts}.example/page/{i}", html="<p>ok</p>")
    return site


@pytest.fixture(scope="module")
def skewed_site_tables(spark):
    return _skewed_site().build(spark)


def _crawl_rows(spark, tables, **knobs):
    pages, docs = tables
    cfg = CheckOptions(paths=["http://hot.local/"], recurse=True, **knobs)
    res = LinkChecker(spark).check(cfg, pages, docs)
    rows = {
        (r["url"], r["state"], r["parent"])
        for r in res.results.select("url", "state", "parent").collect()
    }
    return rows, res.passed


def test_crawl_knobs_do_not_change_results(spark, skewed_site_tables):
    """Zipf-skewed 11k-link crawl (big enough that the loop leaves the
    small-wave path): Bloom pre-filter + skew-salted per-host budget ON
    must produce the identical result set as both OFF."""
    on_rows, on_passed = _crawl_rows(
        spark, skewed_site_tables,
        use_bloom=True, bloom_min_frontier=0, bloom_expected=50_000,
        per_host_budget=4000, salt_hot_host_threshold=1000,
    )
    off_rows, off_passed = _crawl_rows(
        spark, skewed_site_tables,
        use_bloom=False, per_host_budget=4000,
        salt_hot_host_threshold=10**9,
    )
    assert on_passed == off_passed
    assert on_rows == off_rows
    # and the budget itself must not change WHAT gets crawled, only when
    nobudget_rows, _ = _crawl_rows(
        spark, skewed_site_tables, use_bloom=True, bloom_min_frontier=0,
        bloom_expected=50_000,
    )
    assert nobudget_rows == on_rows


def test_hierarchical_row_number_equals_window(spark):
    """Exactness of the bounded-partition frontier-seq rank: values must be
    IDENTICAL to row_number() over (partition by part order by coarse,
    fine), including on a hot part holding most rows."""
    from pyspark.sql.window import Window

    from linkinator_spark.operators.politeness import hierarchical_row_number

    df = spark.range(0, 30_000).select(
        # one hot part (~2/3 of rows) + many cold parts
        F.when(F.col("id") % 3 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("p"), (F.col("id") % 97).cast("string")))
        .alias("part"),
        (F.col("id") % 211).alias("coarse"),
        F.xxhash64("id").alias("fine"),
    )
    w = Window.partitionBy("part").orderBy("coarse", "fine")
    naive = df.withColumn("_rn", F.row_number().over(w).cast("long"))
    hrn = hierarchical_row_number(df, "part", "coarse", "fine")
    joined = naive.join(hrn, ["part", "coarse", "fine"])
    assert joined.filter(F.col("_rn") != F.col("_hrn")).count() == 0
    assert joined.count() == 30_000


def test_global_fifo_rank_equals_global_window(spark):
    """Exactness of the range-partitioned global discovery rank: values
    must be IDENTICAL to row_number() over (order by coarse, fine) — the
    reference queue position — without the global window's single task."""
    from pyspark.sql.window import Window

    from linkinator_spark.operators.politeness import global_fifo_rank

    df = spark.range(0, 30_000).select(
        (F.col("id") % 4001).alias("coarse"),
        F.xxhash64("id").alias("fine"),
    ).distinct()
    w = Window.orderBy("coarse", "fine")
    naive = df.withColumn("_rn", F.row_number().over(w).cast("long"))
    grn = global_fifo_rank(df, "coarse", "fine", out_col="_grn")
    joined = naive.join(grn, ["coarse", "fine"])
    assert joined.filter(F.col("_rn") != F.col("_grn")).count() == 0
    assert joined.count() == naive.count()
