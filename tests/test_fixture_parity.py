"""Golden-count parity with three more reference fixtures:
picture/ (test/test.index.ts:386-390), twittercard/ (:799-805),
alternate/ (:997-1010).
"""

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder


def run(spark, cfg, site):
    pages, docs = site.build(spark)
    return LinkChecker(spark).check(cfg, pages, docs)


def test_picture_elements(spark):
    # fixture picture/: a data:-URI img (SKIPPED), a <source srcset> and an
    # <img src> inside <picture> -> exactly 4 links, passed
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<img src="data:image/png;base64,iVBORw0KGgo=">'
             '<picture>'
             '<source media="(min-width: 800px)" srcset="image.webp" type="image/webp">'
             '<img src="image.jpeg" alt="photo">'
             "</picture>",
    )
    site.page("http://fake.local/image.webp", html="", content_type="image/webp")
    site.page("http://fake.local/image.jpeg", html="", content_type="image/jpeg")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    rows = res.results.collect()
    assert len(rows) == 4
    states = {r["url"]: r["state"] for r in rows}
    assert states["http://fake.local/image.webp"] == "OK"
    assert states["http://fake.local/image.jpeg"] == "OK"
    assert any(u.startswith("data:") and s == "SKIPPED" for u, s in states.items())


def test_twittercard_meta_content(spark):
    # fixture twittercard/: only <meta content> values that parse as
    # absolute URLs are checked; og:url and og:image dedup to one URL
    # -> exactly 2 links, passed
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<meta name="twitter:card" content="summary"></meta>'
             '<meta name="twitter:creator" content="@justinbeckwith" />'
             '<meta property="og:url" content="http://ext.example/" />'
             '<meta property="og:title" content="A Twitter for My Sister" />'
             '<meta property="og:image" content="http://ext.example" />',
    )
    site.page("http://ext.example/", html="")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    assert res.results.count() == 2


def test_alternate_link_tags(spark):
    # fixture alternate/: canonical + 3 hreflang alternates over 2 unique
    # URLs -> 1 page + 2 checked URLs = 3 links, all OK
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<link rel="canonical" href="http://ext.example/">'
             '<link rel="alternate" hreflang="x-default" href="http://ext.example/">'
             '<link rel="alternate" hreflang="en" href="http://ext.example/">'
             '<link rel="alternate" hreflang="es" href="http://ext.example/es">',
    )
    site.page("http://ext.example/", html="")
    site.page("http://ext.example/es", html="")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    rows = res.results.collect()
    assert len(rows) == 3
    assert all(r["state"] == "OK" for r in rows)
