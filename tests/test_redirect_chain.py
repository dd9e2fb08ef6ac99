"""The barrier-free redirect-chain resolver must be output-identical to the
iterative hop loop (operators/fetch.py follow_redirects_chain vs
follow_redirects) on every redirect shape the reference tests:
chains, caps, per-hop skips, relative Locations, 303→GET
(/root/reference/test/test.redirects.ts)."""

import pyspark.sql.functions as F
import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.fetch import (
    _resolve_location_py, build_chain_map, fetch_once, prepare_pages_dim,
    resolve_location,
)
from linkinator_spark.operators.skiprules import make_skip_match
from linkinator_spark.sources.fixtures import SiteBuilder


def _site():
    s = SiteBuilder()
    base = "http://redir.local"
    # 3-hop chain with a relative + root-relative Location
    s.redirect(base + "/chain", "hop2", status=301)
    s.redirect(base + "/hop2", "/hop3", status=302)
    s.redirect(base + "/hop3", base + "/land", status=307)
    s.page(base + "/land", html="<p>landed</p>")
    # 303 switches to GET: target only scripted for GET
    s.redirect(base + "/see-other", base + "/get-only", status=303)
    s.script(base + "/get-only", "GET", 1, 200, html="<p>get</p>")
    # over-cap loop
    for i in range(25):
        s.redirect(base + f"/loop{i}", base + f"/loop{i + 1}", status=301)
    # skip target mid-chain
    s.redirect(base + "/toskip", base + "/private/x", status=301)
    s.redirect(base + "/toskip2", base + "/mid", status=301)
    s.redirect(base + "/mid", base + "/private/deep", status=302)
    # redirect into the void (unscripted target)
    s.redirect(base + "/tovoid", base + "/nowhere", status=301)
    s.page(base + "/plain", html="<p>no redirect</p>")
    return s, base


URLS = ["/chain", "/see-other", "/loop0", "/toskip", "/toskip2",
        "/tovoid", "/plain", "/unscripted"]


@pytest.mark.parametrize("method", ["GET", "HEAD"])
def test_chain_resolver_equals_hop_loop(spark, method):
    site, base = _site()
    pages, _docs = site.build(spark)
    pages_dim = prepare_pages_dim(pages)
    cfg = CheckOptions(paths=[], links_to_skip=[r"/private/"])
    skip = make_skip_match(cfg.links_to_skip)
    df = spark.createDataFrame([(base + u, 1) for u in URLS],
                               "url string, attempt int")

    loop = fetch_once(df, pages_dim, F.lit(method), cfg, skip)
    bc = spark.sparkContext.broadcast(build_chain_map(pages))
    chain = fetch_once(df, pages_dim, F.lit(method), cfg, skip, chain_bc=bc)

    cols = ["url", "status", "has_response", "final_url", "redirect_skipped",
            "fetch_failures", "method_effective", "location"]

    def rows(d):
        return sorted(
            tuple(r[c] if c != "fetch_failures" else tuple(r[c] or [])
                  for c in cols)
            for r in d.select(*cols).collect()
        )

    assert rows(loop) == rows(chain)
    # sanity on the interesting shapes
    by = {r["url"]: r for r in chain.collect()}
    assert by[base + "/chain"]["status"] == 200
    assert by[base + "/chain"]["final_url"] == base + "/land"
    assert by[base + "/see-other"]["status"] == 200
    assert by[base + "/see-other"]["method_effective"] == "GET"
    assert by[base + "/loop0"]["status"] == 0
    assert "TypeError: redirect count exceeded" in list(
        by[base + "/loop0"]["fetch_failures"])
    assert by[base + "/toskip"]["redirect_skipped"] == base + "/private/x"
    assert by[base + "/toskip2"]["redirect_skipped"] == base + "/private/deep"
    assert by[base + "/tovoid"]["status"] == 0
    assert by[base + "/plain"]["status"] == 200


@pytest.mark.parametrize("status", [300, 304])
def test_non_redirect_3xx_with_location_not_followed(spark, status):
    """Only 301/302/303/307/308 follow; a 300/304 carrying a Location
    header is returned as-is in allow mode (reference
    isFetchRedirectStatus, src/index.ts:1288-1290; test.redirects.ts
    'does not follow non-redirect 3xx statuses')."""
    s = SiteBuilder()
    base = "http://nf.local"
    s.script(base + "/odd", "GET", 1, status,
             headers={"location": base + "/elsewhere"})
    s.page(base + "/elsewhere", html="<p>should not be fetched</p>")
    pages, _docs = s.build(spark)
    pages_dim = prepare_pages_dim(pages)
    df = spark.createDataFrame([(base + "/odd", 1)],
                               "url string, attempt int")
    bc = spark.sparkContext.broadcast(build_chain_map(pages))
    for kw in ({}, {"chain_bc": bc}):  # iterative loop and chain resolver
        out = fetch_once(df, pages_dim, F.lit("GET"),
                         CheckOptions(paths=[]), None, **kw).collect()
        assert len(out) == 1
        assert out[0]["status"] == status
        assert out[0]["final_url"] is None
        assert out[0]["redirect_skipped"] is None


def test_chain_resolver_job_count_independent_of_hop_depth(spark):
    """The scale property itself: resolving a deep chain costs the same
    number of Spark jobs as a shallow one (the old iterative loop paid ~2
    driver jobs per hop; the chain resolver is pure plan nodes)."""

    def jobs_for(depth):
        s = SiteBuilder()
        base = f"http://depth{depth}.local"
        for i in range(depth):
            s.redirect(base + f"/h{i}", base + f"/h{i + 1}", status=302)
        s.page(base + f"/h{depth}", html="<p>land</p>")
        pages, _docs = s.build(spark)
        pages_dim = prepare_pages_dim(pages)
        df = spark.createDataFrame([(base + "/h0", 1)],
                                   "url string, attempt int")
        bc = spark.sparkContext.broadcast(build_chain_map(pages))
        sc = spark.sparkContext
        group = f"chainjobs-{depth}"
        sc.setJobGroup(group, "count jobs", interruptOnCancel=False)
        try:
            out = fetch_once(df, pages_dim, F.lit("GET"),
                             CheckOptions(paths=[]), None, chain_bc=bc)
            rows = out.collect()
        finally:
            sc.setJobGroup("", "")
        assert rows[0]["status"] == 200
        assert rows[0]["final_url"] == base + f"/h{depth}"
        return len(sc.statusTracker().getJobIdsForGroup(group))

    assert jobs_for(15) == jobs_for(1)


def test_chain_map_gate_falls_back_to_hop_loop(spark):
    """chain_map_max_rows=0 disables the driver-side chain map (the
    planet-scale guard); the engine silently uses the iterative hop loop
    and produces identical results."""
    from linkinator_spark.operators.crawler import LinkChecker

    s = SiteBuilder()
    base = "http://gate.local"
    s.page(base + "/", html='<a href="/hop">h</a>')
    s.redirect(base + "/hop", base + "/land")
    s.page(base + "/land", html="<p>ok</p>")
    pages, docs = s.build(spark)

    def rows(cfg):
        res = LinkChecker(spark).check(cfg, pages, docs)
        return sorted(
            (r["url"], r["status"], r["state"])
            for r in res.results.select("url", "status", "state").collect())

    with_map = rows(CheckOptions(paths=[base + "/"], recurse=True))
    without = rows(CheckOptions(paths=[base + "/"], recurse=True,
                                chain_map_max_rows=0))
    assert with_map == without
    assert any(u.endswith("/hop") and st == 200 for u, st, _ in without)


def test_chain_map_builds_without_driver_rows(spark, monkeypatch):
    """The chain map must be assembled executor-side (treeAggregate of dict
    fragments): driver-side row materialization of the pages table is
    poisoned during the build, and the result must equal a naive
    driver-side fold."""
    from pyspark.sql import DataFrame

    site, base = _site()
    pages, _docs = site.build(spark)

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side row materialization in build_chain_map")

    with monkeypatch.context() as m:
        m.setattr(DataFrame, "collect", _boom)
        m.setattr(DataFrame, "toPandas", _boom)
        cmap = build_chain_map(pages)

    naive: dict = {}
    for r in pages.select(
            "url", "method", "attempt", "status",
            F.element_at("headers", "location").alias("location"),
            F.element_at("headers", "retry-after").alias("retry_after"),
            F.element_at("headers", "cf-mitigated").isNotNull().alias("cf"),
            F.coalesce(F.element_at("headers", "content-type"),
                       F.col("content_type"), F.lit("")).alias("ct"),
            F.coalesce(F.col("body_doc_id"), F.lit("")).alias("body_doc"),
            F.col("final_url")).collect():
        naive.setdefault((r["url"], r["method"]), []).append(
            (r["attempt"], r["status"], r["location"], r["retry_after"],
             r["cf"], r["ct"], r["body_doc"], r["final_url"]))
    for v in naive.values():
        v.sort(key=lambda t: t[0])
    assert cmap == naive


def test_resolve_location_python_twin(spark):
    cases = [
        ("http://a.example/dir/page.html", "other.html"),
        ("http://a.example/dir/page.html", "/rooted"),
        ("http://a.example/dir/page.html", "https://b.example/abs"),
        ("http://a.example/dir/sub/", "../up.html"),
        ("http://a.example/p?q=1#f", "rel"),
        ("http://a.example", "mailto:x@y.z"),
    ]
    df = spark.createDataFrame(cases, "base string, loc string")
    jvm = [r["r"] for r in df.select(
        resolve_location(F.col("base"), F.col("loc")).alias("r")).collect()]
    py = [_resolve_location_py(b, l) for b, l in cases]
    assert jvm == py


@pytest.mark.parametrize("use_chain", [True, False])
def test_converging_chains_keep_every_row(spark, use_chain):
    """Distinct links whose redirect chains land on the SAME url must each
    keep their result row (the canonical-home-page shape: many 301s to
    one target). request()'s best-attempt pick is per-row, not per-url —
    a per-url pick silently dropped all but one converging chain."""
    s = SiteBuilder()
    base = "http://conv.local"
    for i in range(4):
        s.redirect(f"{base}/r{i}", base + "/home", status=301)
    s.redirect(base + "/two-hop", base + "/r0", status=302)
    s.page(base + "/home", html="<p>home</p>")
    pages, _docs = s.build(spark)
    pages_dim = prepare_pages_dim(pages)
    cfg = CheckOptions(paths=[])

    urls = [f"{base}/r{i}" for i in range(4)] + [base + "/two-hop"]
    df = spark.createDataFrame([(u, 1) for u in urls],
                               "url string, attempt int")
    kw = {}
    if use_chain:
        kw["chain_bc"] = spark.sparkContext.broadcast(build_chain_map(pages))
    out = fetch_once(df, pages_dim, F.lit("HEAD"), cfg, None, **kw)
    rows = {r["url"]: r for r in out.collect()}
    assert sorted(rows) == sorted(urls)
    for u in urls:
        assert rows[u]["status"] == 200
        assert rows[u]["final_url"] == base + "/home"
