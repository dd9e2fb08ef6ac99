"""Advanced crawl scenarios: retry machinery, redirect modes, status-code
actions, HTTPS enforcement, URL rewrite, fragments, checkpoint/resume.
Golden expectations cited from the reference test suite.
"""

import tempfile

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder


def run(spark, cfg, site):
    pages, docs = site.build(spark)
    return LinkChecker(spark).check(cfg, pages, docs)


def states(res):
    return {r["url"]: (r["state"], r["status"]) for r in res.results.collect()}


# ---------------------------------------------------------------- retries

def test_retry_429_with_retry_after(spark):
    # test/test.retry.ts:28-57: 429 + retry-after seconds, then 200
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://busy.example/x">x</a>')
    site.script("http://busy.example/x", "HEAD", 1, 429, headers={"retry-after": "3"})
    site.script("http://busy.example/x", "GET", 1, 429, headers={"retry-after": "3"})
    site.script("http://busy.example/x", "HEAD", 2, 200)
    site.script("http://busy.example/x", "GET", 2, 200, html="<p>ok</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], retry=True), site)
    assert res.passed
    assert states(res)["http://busy.example/x"] == ("OK", 200)
    # a retry event was emitted (src/index.ts:1053-1058)
    assert res.events.filter("kind='retry'").count() >= 1
    # virtual clock advanced past the retry-after delay
    assert res.clock >= 3.0


def test_retry_applies_to_redirect_landing_response(spark):
    """A 429 reached THROUGH a redirect chain is retried like a direct 429
    (reference test.redirects.ts 'applies retry handling to the final
    redirect response'): the retry refetch re-follows the chain at the
    bumped attempt and lands on the 200."""
    site = SiteBuilder()
    site.page("http://fake.local/",
              html='<a href="http://busy.example/hop">x</a>')
    site.redirect("http://busy.example/hop", "http://busy.example/x")
    site.script("http://busy.example/x", "HEAD", 1, 429,
                headers={"retry-after": "2"})
    site.script("http://busy.example/x", "GET", 1, 429,
                headers={"retry-after": "2"})
    site.script("http://busy.example/x", "HEAD", 2, 200)
    site.script("http://busy.example/x", "GET", 2, 200, html="<p>ok</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], retry=True),
              site)
    assert res.passed
    assert states(res)["http://busy.example/hop"] == ("OK", 200)
    assert res.events.filter("kind='retry'").count() >= 1
    assert res.clock >= 2.0


def test_retry_429_duration_formats(spark):
    # src/index.ts:993-1009: '30s' / '1m30s' formats
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="http://a.example/s">s</a><a href="http://b.example/ms">ms</a>',
    )
    for url, fmt in (("http://a.example/s", "3s"), ("http://b.example/ms", "1m3s")):
        site.script(url, "HEAD", 1, 429, headers={"retry-after": fmt})
        site.script(url, "GET", 1, 429, headers={"retry-after": fmt})
        site.script(url, "HEAD", 2, 200)
        site.script(url, "GET", 2, 200)
    res = run(spark, CheckOptions(paths=["http://fake.local/"], retry=True), site)
    assert res.passed
    assert res.clock >= 63.0  # the 1m3s host gated the crawl end


def test_retry_429_invalid_header_broken(spark):
    # invalid retry-after -> not retried -> BROKEN (test/test.retry.ts:120-140)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://bad.example/x">x</a>')
    site.script("http://bad.example/x", "HEAD", 1, 429, headers={"retry-after": "nonsense"})
    site.script("http://bad.example/x", "GET", 1, 429, headers={"retry-after": "nonsense"})
    res = run(spark, CheckOptions(paths=["http://fake.local/"], retry=True), site)
    assert not res.passed


def test_retry_without_flag_is_broken(spark):
    # retry=false -> 429 is just broken
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://busy.example/x">x</a>')
    site.script("http://busy.example/x", "HEAD", 1, 429, headers={"retry-after": "1"})
    site.script("http://busy.example/x", "GET", 1, 429, headers={"retry-after": "1"})
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert not res.passed


def test_per_host_delay_gates_sibling_urls(spark):
    # test/test.retry.ts:142-221: a 429 on /1 delays /2 on the same host;
    # max-wins when /3 escalates
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="http://h.example/1">1</a><a href="http://h.example/2">2</a>',
    )
    site.script("http://h.example/1", "HEAD", 1, 429, headers={"retry-after": "5"})
    site.script("http://h.example/1", "GET", 1, 429, headers={"retry-after": "5"})
    site.script("http://h.example/1", "HEAD", 2, 200)
    site.script("http://h.example/1", "GET", 2, 200)
    site.page("http://h.example/2")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], retry=True), site)
    assert res.passed
    assert res.clock >= 5.0


def test_retry_errors_5xx_then_ok(spark):
    # test/test.retry.ts:233-412: 503 twice then 200, retryErrors on
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://flaky.example/x">x</a>')
    for m in ("HEAD", "GET"):
        site.script("http://flaky.example/x", m, 1, 503)
        site.script("http://flaky.example/x", m, 2, 503)
        site.script("http://flaky.example/x", m, 3, 200)
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], retry_errors=True),
        site,
    )
    assert res.passed
    assert states(res)["http://flaky.example/x"] == ("OK", 200)
    # two retry events; backoff 2^1 + 2^2 seconds (+jitter) on the clock
    assert res.events.filter("kind='retry'").count() == 2
    assert res.clock >= 6.0


def test_retry_errors_cap(spark):
    # cap at retry_errors_count; still broken after (src/index.ts:1081-1088)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://dead.example/x">x</a>')
    for m in ("HEAD", "GET"):
        for a in range(1, 10):
            site.script("http://dead.example/x", m, a, 503)
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], retry_errors=True,
                     retry_errors_count=2),
        site,
    )
    assert not res.passed
    assert res.events.filter("kind='retry'").count() == 2


def test_retry_errors_status_0(spark):
    # network-error (status 0) retried too (src/index.ts:1076-1077)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://ghost.example/x">x</a>')
    site.script("http://ghost.example/x", "HEAD", 3, 200)
    site.script("http://ghost.example/x", "GET", 3, 200)
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], retry_errors=True),
        site,
    )
    # attempts 1,2 unscripted -> status 0 -> retried; attempt 3 -> 200
    assert res.passed


# --------------------------------------------------------------- redirects

def _redirect_site(status=301):
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://r.example/from">x</a>')
    site.redirect("http://r.example/from", "http://r.example/to", status=status)
    site.page("http://r.example/to", html="<p>landed</p>")
    return site


def test_redirects_allow_default(spark):
    # test/test.redirects.ts:98-192: allow -> OK with final status 200
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), _redirect_site())
    assert res.passed
    assert states(res)["http://r.example/from"] == ("OK", 200)


def test_redirects_warn_emits_event(spark):
    # warn -> OK + redirect event (src/index.ts:541-567)
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], redirects="warn"),
        _redirect_site(302),
    )
    assert res.passed
    assert res.events.filter("kind='redirect'").count() == 1


def test_redirects_error_broken(spark):
    # error -> BROKEN with the 3xx status (src/index.ts:524-540)
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], redirects="error"),
        _redirect_site(307),
    )
    assert not res.passed
    assert states(res)["http://r.example/from"] == ("BROKEN", 307)


def test_redirect_chain_within_cap(spark):
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://c.example/0">x</a>')
    for i in range(5):
        site.redirect(f"http://c.example/{i}", f"http://c.example/{i+1}", 302)
    site.page("http://c.example/5", html="<p>end</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed


def test_redirect_chain_over_cap_broken(spark):
    # 21+ hops -> 'redirect count exceeded' (test/test.redirects.ts:595-653)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://c.example/0">x</a>')
    for i in range(25):
        site.redirect(f"http://c.example/{i}", f"http://c.example/{i+1}", 301)
    site.page("http://c.example/25", html="<p>end</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert not res.passed
    row = res.results.filter("url='http://c.example/0'").collect()[0]
    assert any("redirect count exceeded" in d for d in row["failure_details"])


def test_redirect_to_skipped_target(spark):
    # test/test.redirects.ts:400-463: hop target matches skip rule ->
    # source SKIPPED, target never fetched
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://r.example/from">x</a>')
    site.redirect("http://r.example/from", "http://secret.example/hidden", 302)
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], links_to_skip=["secret\\.example"]),
        site,
    )
    assert res.passed
    assert states(res)["http://r.example/from"][0] == "SKIPPED"


def test_relative_location_header(spark):
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://r.example/a/from">x</a>')
    for m in ("GET", "HEAD"):
        site._pages.append(("http://r.example/a/from", "r.example", m, 1, 301,
                            {"location": "/rooted"}, "", "", None))
    site.page("http://r.example/rooted", html="<p>ok</p>")
    res = run(spark, CheckOptions(paths=["http://fake.local/"]), site)
    assert res.passed


# ------------------------------------------------------------ status codes

def test_status_codes_actions(spark):
    # test/test.status-codes.ts:27-194 (ok/warn/skip/error + patterns)
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html="".join(f'<a href="http://s.example/{c}">{c}</a>' for c in
                     (403, 404, 200, 410, 503)),
    )
    for c in (403, 404, 200, 410, 503):
        site.script(f"http://s.example/{c}", "HEAD", 1, c)
        site.script(f"http://s.example/{c}", "GET", 1, c)
    cfg = CheckOptions(
        paths=["http://fake.local/"],
        status_codes={"403": "ok", "404": "skip", "200": "error", "4xx": "warn",
                      "5xx": "ok"},
    )
    res = run(spark, cfg, site)
    st = states(res)
    assert st["http://s.example/403"][0] == "OK"       # exact beats 4xx
    assert st["http://s.example/404"][0] == "SKIPPED"
    assert st["http://s.example/200"][0] == "BROKEN"   # forced error
    assert st["http://s.example/410"][0] == "OK"       # 4xx wildcard warn
    assert st["http://s.example/503"][0] == "OK"       # 5xx wildcard ok
    assert res.events.filter("kind='statusCodeWarning'").count() == 1


# ------------------------------------------------------------- requireHttps

def test_require_https_error(spark):
    # test/test.https.ts: http link broken in error mode; https fine
    site = SiteBuilder()
    site.page(
        "https://secure.local/",
        html='<a href="http://plain.example/x">p</a><a href="https://tls.example/y">t</a>',
    )
    site.page("http://plain.example/x")
    site.page("https://tls.example/y")
    res = run(
        spark,
        CheckOptions(paths=["https://secure.local/"], require_https="error"),
        site,
    )
    assert not res.passed
    st = states(res)
    assert st["http://plain.example/x"][0] == "BROKEN"
    assert st["https://tls.example/y"][0] == "OK"


def test_require_https_warn(spark):
    site = SiteBuilder()
    site.page("https://secure.local/", html='<a href="http://plain.example/x">p</a>')
    site.page("http://plain.example/x")
    res = run(
        spark,
        CheckOptions(paths=["https://secure.local/"], require_https="warn"),
        site,
    )
    assert res.passed
    assert res.events.filter("kind='httpInsecure'").count() == 1


# ------------------------------------------------------------- url rewrite

def test_url_rewrite(spark):
    # test/test.index.ts:847-858; src/index.ts:310-318
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="NOTLICENSE.md">l</a>')
    site.page("http://fake.local/LICENSE.md", html="<p>mit</p>")
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"],
                     url_rewrite=[("NOTLICENSE\\.md", "LICENSE.md")]),
        site,
    )
    assert res.passed
    assert "http://fake.local/LICENSE.md" in states(res)


# ---------------------------------------------------------------- fragments

def test_fragment_valid_and_invalid(spark):
    # test/test.fragments.ts:83-196: invalid fragment -> BROKEN with exact
    # message; valid -> just the OK page row
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="page.html#real">ok</a><a href="page.html#ghost">bad</a>',
    )
    site.page("http://fake.local/page.html", html='<div id="real">content</div>')
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True, recurse=True),
        site,
    )
    assert not res.passed
    broken = res.results.filter("state='BROKEN'").collect()
    assert len(broken) == 1
    assert broken[0]["url"] == "http://fake.local/page.html#ghost"
    assert broken[0]["failure_details"] == [
        "Error: Fragment identifier '#ghost' not found on page"
    ]


def test_fragment_encoding_and_case_sensitivity(spark):
    """Percent-encoded fragments match their decoded id; matching is
    case-sensitive (reference test.fragments.ts 'should handle URL-encoded
    fragments' / 'case-sensitive fragment matching')."""
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="p.html#sec%20one">enc</a>'
             '<a href="p.html#Sec">wrongcase</a>',
    )
    site.page("http://fake.local/p.html",
              html='<div id="sec one">x</div><div id="sec">y</div>')
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True,
                     recurse=True),
        site,
    )
    assert not res.passed
    broken = res.results.filter("state='BROKEN'").collect()
    assert [r["url"] for r in broken] == ["http://fake.local/p.html#Sec"]


def test_same_page_fragment(spark):
    # test/test.fragments.ts same-page: <a href="#sec"> validated against
    # the page itself (src/index.ts:878-920)
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<a href="#here">x</a><a href="#missing">y</a><div id="here"></div>',
    )
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True),
        site,
    )
    assert not res.passed
    broken = res.results.filter("state='BROKEN'").collect()
    assert [b["url"] for b in broken] == ["http://fake.local/#missing"]


def test_fragment_skip_rules(spark):
    # test/test.index.ts:120-149: fragmentsToSkip leaves URL OK
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="page.html#L10-L20">x</a>')
    site.page("http://fake.local/page.html", html="<p>no anchors</p>")
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True,
                     recurse=True, fragments_to_skip=[r"^L\d+(-L\d+)?$"]),
        site,
    )
    assert res.passed
    st = states(res)
    assert st["http://fake.local/page.html#L10-L20"][0] == "SKIPPED"
    assert st["http://fake.local/page.html"][0] == "OK"


def test_fragment_on_leaf_page_via_head_refetch(spark):
    # a leaf (HEAD-checked) target with pending fragments is re-GET for its
    # body (src/index.ts:450-473)
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="http://doc.example/p#sec">x</a>')
    site.page("http://doc.example/p", html='<h1 id="sec">s</h1>')
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True),
        site,
    )
    assert res.passed


def test_soft_404_skips_fragment_validation(spark):
    # src/index.ts:630-638: noindex+nofollow page -> fragments not validated
    site = SiteBuilder()
    site.page("http://fake.local/", html='<a href="page.html#any">x</a>')
    site.page(
        "http://fake.local/page.html",
        html='<meta name="robots" content="noindex, nofollow"><p>not found</p>',
    )
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True, recurse=True),
        site,
    )
    assert res.passed


def test_markdown_fragments(spark):
    # test/test.fragments.ts:414-455: markdown headings are anchors
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        md="# Docs\n[good](guide.md#setup-steps)\n[bad](guide.md#nope)",
    )
    site.page("http://fake.local/guide.md", md="## Setup Steps\ntext")
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], check_fragments=True, recurse=True),
        site,
    )
    broken = [r["url"] for r in res.results.filter("state='BROKEN'").collect()]
    assert broken == ["http://fake.local/guide.md#nope"]


# -------------------------------------------------------------- css links

def test_check_css_external_stylesheet(spark):
    # test/test.index.ts:888-951: checkCss crawls .css and extracts url()
    site = SiteBuilder()
    site.page("http://fake.local/", html='<link rel="stylesheet" href="style.css">')
    site.page("http://fake.local/style.css",
              css='@import "base.css"; .x { background: url(bg.png); }')
    site.page("http://fake.local/base.css", css=".y{}")
    site.page("http://fake.local/bg.png", content_type="image/png")
    res = run(
        spark,
        CheckOptions(paths=["http://fake.local/"], recurse=True, check_css=True),
        site,
    )
    assert res.passed
    urls = {r["url"] for r in res.results.collect()}
    assert "http://fake.local/bg.png" in urls
    assert "http://fake.local/base.css" in urls


def test_css_not_extracted_without_flag(spark):
    site = SiteBuilder()
    site.page("http://fake.local/", html='<link rel="stylesheet" href="style.css">')
    site.page("http://fake.local/style.css", css=".x { background: url(bg.png); }")
    res = run(spark, CheckOptions(paths=["http://fake.local/"], recurse=True), site)
    assert res.passed
    urls = {r["url"] for r in res.results.collect()}
    assert "http://fake.local/bg.png" not in urls


# ---------------------------------------------------------- resume/restart

def test_checkpoint_resume_identical_results(spark):
    # north_rule: resumable from checkpoint; run full, then resume from an
    # early wave and get identical results
    def build():
        site = SiteBuilder()
        site.page("http://fake.local/",
                  html='<a href="a.html">a</a><a href="b.html">b</a>')
        site.page("http://fake.local/a.html", html='<a href="c.html">c</a>')
        site.page("http://fake.local/b.html", html='<a href="missing.html">m</a>')
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

        # simulate a crash after wave 0: re-point the store at wave 0 and resume
        import json
        import os
        with open(os.path.join(ckpt, "_latest.json"), "w") as f:
            json.dump({"wave": 0}, f)
        resumed = LinkChecker(spark).check(cfg, pages, docs, resume=True)
        resumed_rows = {(r["url"], r["state"], r["parent"])
                        for r in resumed.results.collect()}
        assert resumed_rows == full_rows
        assert not resumed.passed
