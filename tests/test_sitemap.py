"""Sitemap discovery + parsing (sources/sitemap.py): robots Sitemap:
lines, sitemapindex resolution, namespace stripping, protocol defaults,
bounded depth, and unfetched-body behavior."""
import pyspark.sql.functions as F
import pytest

from linkinator_spark.sources import sitemap as SM

NS = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _bodies(spark, rows):
    return spark.createDataFrame(rows, "sitemap_url string, xml string")


def test_robots_discovery_case_and_dedup(spark):
    robots = _robots(spark, [
        ("a", "User-agent: *\nSitemap: http://a/s.xml\n"
              "  sitemap: http://a/s.xml\nSITEMAP: http://a/t.xml"),
        ("b", "User-agent: *\nDisallow: /\n"),
    ])
    got = sorted(
        (r.host, r.sitemap_url)
        for r in SM.sitemap_urls_from_robots(robots).collect())
    assert got == [("a", "http://a/s.xml"), ("a", "http://a/t.xml")]


def test_urlset_defaults_order_and_namespace(spark):
    xml = (f"<urlset{NS}>"
           "<url><loc>http://a/p1</loc><lastmod>2026-01-02</lastmod>"
           "<priority>0.8</priority></url>"
           # priority before loc; lastmod absent
           "<url><priority>0.3</priority><loc>http://a/p2</loc></url>"
           # both optional fields absent -> default 0.5 / NULL
           "<url><loc>http://a/p3</loc></url>"
           "</urlset>")
    out = {r.loc: r for r in SM.parse_urlsets(
        _bodies(spark, [("http://a/s.xml", xml)])).collect()}
    assert out["http://a/p1"].priority_micro == 800_000
    assert out["http://a/p1"].lastmod == "2026-01-02"
    assert out["http://a/p2"].priority_micro == 300_000
    assert out["http://a/p2"].lastmod is None
    assert out["http://a/p3"].priority_micro == SM.DEFAULT_PRIORITY_MICRO
    assert all(r.sitemap_url == "http://a/s.xml" for r in out.values())


def test_index_resolution_and_missing_body_drops(spark):
    robots = _robots(spark, [("a", "Sitemap: http://a/idx.xml")])
    bodies = _bodies(spark, [
        ("http://a/idx.xml",
         f"<sitemapindex{NS}><sitemap><loc>http://a/s1.xml</loc></sitemap>"
         "<sitemap><loc>http://a/s404.xml</loc></sitemap></sitemapindex>"),
        ("http://a/s1.xml",
         f"<urlset{NS}><url><loc>http://a/p1</loc></url></urlset>"),
        # s404.xml was never fetched: it must contribute nothing
    ])
    got = SM.resolve_sitemaps(robots, bodies).collect()
    assert [(r.host, r.loc, r.sitemap_url) for r in got] == [
        ("a", "http://a/p1", "http://a/s1.xml")]


def test_nested_index_bounded_depth(spark):
    robots = _robots(spark, [("a", "Sitemap: http://a/l0.xml")])

    def idx(child):
        return (f"<sitemapindex{NS}><sitemap><loc>{child}</loc>"
                "</sitemap></sitemapindex>")

    bodies = _bodies(spark, [
        ("http://a/l0.xml", idx("http://a/l1.xml")),
        ("http://a/l1.xml", idx("http://a/l2.xml")),
        ("http://a/l2.xml", idx("http://a/l3.xml")),
        ("http://a/l3.xml",
         f"<urlset{NS}><url><loc>http://a/deep</loc></url></urlset>"),
    ])
    # depth 3: l0->l1->l2 are index hops; l3's urlset is only reached if
    # the hop that FETCHES l3 happens — 3 hops end at frontier={l3},
    # which is never fetched, so the bounded walk yields nothing.
    assert SM.resolve_sitemaps(robots, bodies, max_index_depth=3).count() == 0
    got = SM.resolve_sitemaps(robots, bodies, max_index_depth=4).collect()
    assert [r.loc for r in got] == ["http://a/deep"]


def test_two_hosts_share_nothing(spark):
    robots = _robots(spark, [
        ("a", "Sitemap: http://a/s.xml"),
        ("b", "Sitemap: http://b/s.xml"),
    ])
    bodies = _bodies(spark, [
        ("http://a/s.xml",
         "<urlset><url><loc>http://a/x</loc></url></urlset>"),
        ("http://b/s.xml",
         "<urlset><url><loc>http://b/y</loc>"
         "<priority>1.0</priority></url></urlset>"),
    ])
    got = {(r.host, r.loc): r.priority_micro
           for r in SM.resolve_sitemaps(robots, bodies).collect()}
    assert got == {("a", "http://a/x"): 500_000,
                   ("b", "http://b/y"): 1_000_000}


def test_empty_loc_block_skipped(spark):
    xml = ("<urlset><url><priority>0.9</priority></url>"
           "<url><loc>http://a/ok</loc></url></urlset>")
    got = SM.parse_urlsets(_bodies(spark, [("s", xml)])).collect()
    assert [r.loc for r in got] == ["http://a/ok"]
