"""Per-host crawl-ordering invariant (north_rule): the engine's per-host
fetch order must equal the reference's FIFO serialization. The oracle is a
single-threaded reference-semantics simulator (the order linkinator itself
exhibits under concurrency:1 — cf. test/test.index.ts:1017-1023 and the FIFO
queue scan, src/queue.ts:69-97).
"""

from collections import deque

from linkinator_spark.config import CheckOptions
from linkinator_spark.functions.extract import get_links_from_spans
from linkinator_spark.functions.urls import url_host_py
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder


def fifo_reference_order(site: SiteBuilder, seed: str, recurse: bool) -> dict:
    """Concurrency-1 FIFO crawl over the scripted site; returns per-host
    fetch order."""
    pages = {}
    for (url, host, method, attempt, status, headers, ct, body_doc, final) in site._pages:
        pages.setdefault((url, method), (status, ct, body_doc))
    docs = {doc_id: spans for doc_id, spans in site._docs}

    seen = {seed}
    queue = deque([(seed, True)])
    order: dict[str, list[str]] = {}
    while queue:
        url, crawl = queue.popleft()
        host = url_host_py(url)
        order.setdefault(host, []).append(url)
        method = "GET" if crawl else "HEAD"
        page = pages.get((url, method))
        if not page or not (200 <= page[0] < 300):
            continue
        status, ct, body_doc = page
        if crawl and "text/html" in ct and body_doc:
            spans = [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in docs[body_doc]
            ]
            for parsed in get_links_from_spans(spans, url):
                child = parsed["resolved_url"]
                if not child or child in seen:
                    continue
                seen.add(child)
                child_crawl = (
                    recurse and child.startswith(seed)
                    and url_host_py(child) == url_host_py(seed)
                )
                queue.append((child, child_crawl))
    return order


def engine_order(spark, site: SiteBuilder, seed: str, recurse: bool) -> dict:
    pages, docs = site.build(spark)
    res = LinkChecker(spark).check(
        CheckOptions(paths=[seed], recurse=recurse), pages, docs
    )
    rows = (
        res.results.filter("host != '' AND state != 'SKIPPED'")
        .orderBy("wave", "seq")
        .select("host", "url")
        .collect()
    )
    order: dict[str, list[str]] = {}
    for r in rows:
        if r["url"] not in order.get(r["host"], []):
            order.setdefault(r["host"], []).append(r["url"])
    return order


def _site() -> SiteBuilder:
    site = SiteBuilder()
    site.page(
        "http://o.test/",
        html='<a href="b.html">b</a><a href="a.html">a</a><img src="z.png">'
             '<a href="http://ext1.example/x">e</a>',
    )
    site.page("http://o.test/b.html",
              html='<a href="c.html">c</a><a href="a.html">dup</a>')
    site.page("http://o.test/a.html",
              html='<a href="d.html">d</a><a href="http://ext2.example/y">e2</a>')
    site.page("http://o.test/c.html", html='<a href="d.html">d</a>')
    site.page("http://o.test/d.html", html="<p>leaf</p>")
    site.page("http://o.test/z.png", content_type="image/png")
    site.page("http://ext1.example/x")
    site.page("http://ext2.example/y")
    return site


def test_per_host_order_matches_fifo_reference(spark):
    seed = "http://o.test/"
    expected = fifo_reference_order(_site(), seed, recurse=True)
    got = engine_order(spark, _site(), seed, recurse=True)
    assert got.keys() == expected.keys()
    for host in expected:
        assert got[host] == expected[host], (
            f"host {host}: engine {got[host]} != reference {expected[host]}"
        )


def test_url_seen_set_matches_reference(spark):
    """north_rule: exact URL-seen set equality under the same seed list."""
    seed = "http://o.test/"
    ref = fifo_reference_order(_site(), seed, recurse=True)
    ref_seen = {u for urls in ref.values() for u in urls}
    pages, docs = _site().build(spark)
    res = LinkChecker(spark).check(
        CheckOptions(paths=[seed], recurse=True), pages, docs
    )
    engine_seen = {
        r["url"] for r in res.results.filter("state != 'SKIPPED'")
        .select("url").distinct().collect()
    }
    assert engine_seen == ref_seen


def _tie_site() -> SiteBuilder:
    """Two crawl subtrees on DIFFERENT hosts, converging on a third check
    host. Wave-1 parents h1/a and h2/b would TIE under a per-host seq rank
    (both rank 1 on their host) — the reference's global FIFO orders
    their h3 children by seed order, so the engine's seq must be a global
    discovery rank to reproduce it."""
    site = SiteBuilder()
    site.page("http://h1.test/", html='<a href="/a">a</a>')
    site.page("http://h2.test/", html='<a href="/b">b</a>')
    site.page("http://h1.test/a", html='<a href="http://h3.test/x">x</a>')
    site.page("http://h2.test/b", html='<a href="http://h3.test/y">y</a>')
    site.page("http://h3.test/x", html="<p>x</p>")
    site.page("http://h3.test/y", html="<p>y</p>")
    return site


def test_cross_host_tie_follows_seed_order_all_gears(spark):
    """north_rule per-host ordering on multi-host-seed crawls: reversing
    the seed list must reverse the shared host's fetch order, identically
    in every execution gear (fully-fused, wave-fused, staged)."""
    pages, docs = _tie_site().build(spark)
    gears = {"full": {}, "wave": {"per_host_budget": 10**9},
             "staged": {"chain_map_max_rows": 0}}
    for seeds, expect in (
        (["http://h1.test/", "http://h2.test/"],
         ["http://h3.test/x", "http://h3.test/y"]),
        (["http://h2.test/", "http://h1.test/"],
         ["http://h3.test/y", "http://h3.test/x"]),
    ):
        for gear, kw in gears.items():
            res = LinkChecker(spark).check(
                CheckOptions(paths=list(seeds), recurse=True, **kw),
                pages, docs)
            got = [r["url"] for r in res.results
                   .filter("host = 'h3.test'").orderBy("seq").collect()]
            assert got == expect, f"{gear} seeds={seeds}: {got}"
