"""End-to-end crawl scenarios — golden expectations from the reference's
test suite (file:line citations inline). Assertions are on result-set shape
(counts per state, (url, parent, state) membership, pass/fail) exactly like
the reference's vitest assertions.
"""

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder, recurse_site


def run(spark, cfg, site):
    pages, docs = site.build(spark)
    return LinkChecker(spark).check(cfg, pages, docs)


def rows(result):
    return {
        (r["url"], r["state"], r["parent"])
        for r in result.results.select("url", "state", "parent").collect()
    }


def test_basic_passes(spark):
    # test/test.index.ts:48-53
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://ext.example/ok">x</a>')
    site.page("http://ext.example/ok", html="<p>hi</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    got = rows(res)
    assert got == {
        ("http://fake.local/", "OK", None),
        ("http://ext.example/ok", "OK", "http://fake.local/"),
    }


def test_broken_link_fails(spark):
    # test/test.index.ts:204-213 (fixture `broke`)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://fake.local/nope.html">x</a>')
    site.page("http://fake.local/nope.html", status=404, html="")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert not res.passed
    got = {(r["url"], r["state"], r["status"]) for r in res.results.collect()}
    assert ("http://fake.local/nope.html", "BROKEN", 404) in got


def test_dedup_twice(spark):
    # fixture `twice`: 6 anchors to the same URL (one with #fragment) ->
    # 2 links total, target checked once (test/test.index.ts:55-72)
    anchors = "".join(
        ['<a href="http://fake.local/t.html">x</a>'] * 5
        + ['<a href="http://fake.local/t.html#frag">y</a>']
    )
    site = SiteBuilder()
    site.page("http://fake.local/", html=anchors)
    site.page("http://fake.local/t.html", html="<p>t</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    assert res.results.count() == 2


def test_recurse(spark):
    # test/test.index.ts:348-366: exactly 4 links with recurse
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), recurse_site())
    assert res.passed
    got = rows(res)
    assert got == {
        ("http://fake.local/", "OK", None),
        ("http://fake.local/first.html", "OK", "http://fake.local/"),
        ("http://fake.local/second.html", "OK", "http://fake.local/first.html"),
        ("http://external.example/page", "OK", "http://fake.local/second.html"),
    }


def test_non_html_content_not_recursed(spark):
    """A text/plain response whose body LOOKS like HTML must not have its
    links extracted — recursion gates on the content-type sniff (reference
    test.index.ts 'should not recurse non-html files', src/index.ts isHtml)."""
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="/notes.txt">t</a>')
    site.page("http://fake.local/notes.txt", content_type="text/plain",
              spans=[{"kind": "text",
                      "text": '<a href="/never-visited.html">trap</a>',
                      "media_ref": "", "offset": 0}])
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True),
              site)
    assert res.passed
    urls = {r["url"] for r in res.results.select("url").collect()}
    assert "http://fake.local/notes.txt" in urls
    assert not any("never-visited" in u for u in urls)


def test_no_recurse(spark):
    # test/test.index.ts:392-395: without recurse only seed + its links
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), recurse_site())
    assert res.passed
    assert res.results.count() == 2


def test_skip_pattern(spark):
    # test/test.index.ts:108-118 (fixture `skip`)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://very.bad/link">x</a>')
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], links_to_skip=["http://very.bad"]),
        site,
    )
    assert res.passed
    got = rows(res)
    assert ("http://very.bad/link", "SKIPPED", "http://fake.local/") in got


def test_skip_function(spark):
    # test/test.index.ts:190-202 (fixture `filter`, linksToSkip function)
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="http://a.example/filterme/1">x</a>'
        '<a href="http://a.example/filterme/2">y</a>'
        '<a href="http://a.example/keep">z</a>',
    )
    site.page("http://a.example/keep", html="<p>k</p>")
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"],
                     links_to_skip=lambda link: "filterme" in link),
        site,
    )
    assert res.passed
    states = {r["url"]: r["state"] for r in res.results.collect()}
    assert states["http://a.example/filterme/1"] == "SKIPPED"
    assert states["http://a.example/filterme/2"] == "SKIPPED"
    assert states["http://a.example/keep"] == "OK"


def test_protocols_skipped(spark):
    # test/test.index.ts:376-384 (fixture `protocols`): mailto/irc/data
    # -> SKIPPED, crawl passes
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="mailto:x@y.z">m</a><a href="irc://chat.example/room">i</a>'
        '<a href="data:text/plain;base64,AAAA">d</a><a href="real.html">r</a>',
    )
    site.page("http://fake.local/real.html", html="<p>r</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    skipped = res.results.filter("state = 'SKIPPED'")
    assert skipped.count() == 3
    # non-http skips carry status 0 (recordSkippedResult, src/index.ts:976-979)
    assert {r["status"] for r in skipped.collect()} == {0}


def test_malformed_link_broken(spark):
    # test/test.index.ts:255-262 (fixture `malformed`); src/index.ts:720-730
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="https://">bad</a>')
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert not res.passed
    got = {(r["url"], r["state"], r["status"]) for r in res.results.collect()}
    assert ("https://", "BROKEN", 0) in got


def test_head_405_get_fallback(spark):
    # test/test.index.ts:397-403; src/index.ts:378-388
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://ext.example/x">x</a>')
    site.script("http://ext.example/x", "HEAD", 1, 405)
    site.script("http://ext.example/x", "GET", 1, 200, html="<p>ok</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed


def test_head_failure_get_fallback(spark):
    # test/test.index.ts:434-440; last-gasp GET (src/index.ts:396-417)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://ext.example/x">x</a>')
    site.script("http://ext.example/x", "HEAD", 1, 403)
    site.script("http://ext.example/x", "GET", 1, 200, html="<p>ok</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed


def test_bot_999_skipped(spark):
    # test/test.index.ts:215-228; src/index.ts:515-516
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://bot.example/x">x</a>')
    site.script("http://bot.example/x", "HEAD", 1, 999)
    site.script("http://bot.example/x", "GET", 1, 999)
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    got = {(r["url"], r["state"], r["status"]) for r in res.results.collect()}
    assert ("http://bot.example/x", "SKIPPED", 999) in got


def test_cf_mitigated_403_skipped(spark):
    # test/test.index.ts:975-995; src/index.ts:517-523
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://cf.example/x">x</a>')
    site.script("http://cf.example/x", "HEAD", 1, 403, headers={"cf-mitigated": "challenge"})
    site.script("http://cf.example/x", "GET", 1, 403, headers={"cf-mitigated": "challenge"})
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed
    got = {(r["url"], r["state"], r["status"]) for r in res.results.collect()}
    assert ("http://cf.example/x", "SKIPPED", 403) in got


def test_plain_403_broken(spark):
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://f.example/x">x</a>')
    site.script("http://f.example/x", "HEAD", 1, 403)
    site.script("http://f.example/x", "GET", 1, 403)
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert not res.passed


def test_repeated_broken_reported_per_parent(spark):
    # test/test.index.ts:1012-1050 (fixture repeated-broken-link):
    # a BROKEN url is re-reported under every parent that links it
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="pageA.html">A</a><a href="pageB.html">B</a>',
    )
    site.page(
        "http://fake.local/pageA.html",
        html='<a href="broken123.html">1</a><a href="ok.html">ok</a>',
    )
    site.page(
        "http://fake.local/pageB.html",
        html='<a href="broken123.html">1</a><a href="ok.html">ok</a>',
    )
    site.page("http://fake.local/broken123.html", status=404)
    site.page("http://fake.local/ok.html", html="<p>ok</p>")
    res = run(
        spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site
    )
    assert not res.passed
    broken = res.results.filter("state='BROKEN'").select("url", "parent").collect()
    parents = {r["parent"] for r in broken}
    assert parents == {"http://fake.local/pageA.html", "http://fake.local/pageB.html"}
    assert len(broken) == 2
    # OK url reported only once (duplicate suppression, src/index.ts:840-875)
    assert res.results.filter("url = 'http://fake.local/ok.html'").count() == 1


def test_same_host_recursion_boundary(spark):
    # test/test.index.ts:405-424: recursion stops at other hosts
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://other.example/deep">x</a>')
    site.page(
        "http://other.example/deep",
        html='<a href="http://other.example/deeper">y</a>',
    )
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site)
    assert res.passed
    # /deeper never visited: other.example/deep is checked but not crawled
    assert res.results.count() == 2


def test_status_zero_when_unscripted(spark):
    # unscripted host = network error -> status 0 BROKEN
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://no.route/x">x</a>')
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert not res.passed
    got = {(r["url"], r["state"], r["status"]) for r in res.results.collect()}
    assert ("http://no.route/x", "BROKEN", 0) in got


def test_pagestart_and_link_events(spark):
    # reference src/index.ts:677 (pagestart) and :614,984 (link per result)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="a.html">a</a>')
    site.page("http://fake.local/a.html", html="<p>leaf</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True),
              site)
    ev = {(r["kind"], r["url"])
          for r in res.events.select("kind", "url").collect()}
    assert ("pagestart", "http://fake.local/") in ev
    assert ("pagestart", "http://fake.local/a.html") in ev
    assert ("link", "http://fake.local/") in ev
    assert ("link", "http://fake.local/a.html") in ev
    assert res.events.filter("kind='link'").count() == res.results.count()
