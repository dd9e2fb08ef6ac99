"""Static-server behaviors (SURVEY S3) expressed as pages-table rows:
trailing-slash directory redirect, directory listing, cleanUrls —
reference src/server.ts:100-196 and fixtures `nested/`, `local/`.
"""

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder


def run(spark, cfg, site):
    pages, docs = site.build(spark)
    return LinkChecker(spark).check(cfg, pages, docs)


def states(result):
    return {
        (r["url"], r["state"]) for r in result.results.collect()
    }


def test_directory_trailing_slash_redirect(spark):
    # src/server.ts:100-116: /sub (a directory) 301s to /sub/; the crawl
    # follows the redirect and the link resolves OK
    site = SiteBuilder()
    site.page("http://fake.local/",
              html='<a href="http://fake.local/sub">sub</a>')
    site.directory("http://fake.local/sub",
                   index_html='<a href="http://fake.local/leaf.html">l</a>')
    site.page("http://fake.local/leaf.html", html="<p>leaf</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site)
    assert res.passed
    got = states(res)
    assert ("http://fake.local/sub", "OK") in got
    # recursion continued through the redirect target's links
    assert ("http://fake.local/leaf.html", "OK") in got


def test_directory_listing_links_are_crawled(spark):
    # src/server.ts:172-184: directoryListing emits <li><a href="f">; the
    # relative hrefs resolve against the listing URL
    site = SiteBuilder()
    site.page("http://fake.local/",
              html='<a href="http://fake.local/docs/">docs</a>')
    site.directory("http://fake.local/docs",
                   entries=["a.html", "missing.html"], listing=True)
    site.page("http://fake.local/docs/a.html", html="<p>a</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site)
    got = states(res)
    assert ("http://fake.local/docs/a.html", "OK") in got
    assert ("http://fake.local/docs/missing.html", "BROKEN") in got
    assert not res.passed


def test_directory_without_listing_is_404(spark):
    # src/server.ts:191-196: no index, no listing -> 404 -> BROKEN
    site = SiteBuilder()
    site.page("http://fake.local/",
              html='<a href="http://fake.local/void">v</a>')
    site.directory("http://fake.local/void")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site)
    assert ("http://fake.local/void", "BROKEN") in states(res)


def test_clean_urls_both_forms_resolve(spark):
    # src/server.ts:118-143: /about serves about.html content directly;
    # links to either form are OK and each URL is fetched at most once
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="http://fake.local/about">a</a>'
             '<a href="http://fake.local/about.html">b</a>',
    )
    site.clean_page("http://fake.local/about", "<p>about</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site)
    assert res.passed
    got = states(res)
    assert ("http://fake.local/about", "OK") in got
    assert ("http://fake.local/about.html", "OK") in got
