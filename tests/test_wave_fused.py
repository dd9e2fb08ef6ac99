"""Gear equivalence: the fully-fused python loop, the per-wave fused Arrow
stage, and the staged DataFrame pipeline must produce IDENTICAL crawls.

The staged pipeline is the semantics reference (it is what the driver's
oracles and the rest of the suite exercise); the fused gears
(operators/wave_fused.py) are execution strategies only. Gear forcing uses
existing config knobs:

  * full fusion (default for scripted fixture crawls): plain CheckOptions
  * wave-fused gear: a non-binding per_host_budget disables full fusion
    but keeps small waves on the single-stage path
  * staged gear: chain_map_max_rows=0 rebuilds the wave from broadcast
    joins + the iterative hop loop (no fused anything)
"""

import pyspark.sql.functions as F
import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker
from linkinator_spark.sources.fixtures import SiteBuilder


def _rich_site() -> SiteBuilder:
    """One site exercising every fused branch: redirect chains (+ relative
    and 303 forms), a redirect loop over the 20-hop cap, 405->GET, a
    last-gasp GET that flips a HEAD-only page to OK, broken links,
    duplicate links from two parents (dup re-report), an external host,
    a CSS body, a skipped subtree, and a meta-refresh page."""
    base = "http://rich.test"
    s = SiteBuilder()
    s.page(
        base + "/",
        html=(
            '<a href="/chain">c</a><a href="/loop0">l</a>'
            '<a href="/headonly">h</a><a href="/gone">g</a>'
            '<a href="/private/x">p</a><a href="http://ext.example/ok">e</a>'
            '<a href="/styles.css">s</a><a href="/page2">p2</a>'
            '<a href="/see">s3</a><a href="bad://u r l">m</a>'
        ),
    )
    s.redirect(base + "/chain", "hop2", status=301)
    s.redirect(base + "/hop2", "/land", status=302)
    s.page(base + "/land", html='<a href="/gone">g2</a>')
    for i in range(25):
        s.redirect(base + f"/loop{i}", base + f"/loop{i + 1}", status=301)
    s.redirect(base + "/see", base + "/get-only", status=303)
    s.script(base + "/get-only", "GET", 1, 200, html="<p>get</p>")
    # HEAD 405 -> GET 200 fallback
    s.script(base + "/headonly", "HEAD", 1, 405)
    s.script(base + "/headonly", "GET", 1, 200, html="<p>ok</p>")
    s.page(base + "/page2", html='<a href="/gone">dup</a><a href="/land">dup2</a>')
    s.page(base + "/styles.css", css='@import url("/imported.css");')
    s.page(base + "/imported.css", css="/* empty */")
    s.page(base + "/private/x", html="<p>secret</p>")
    s.page("http://ext.example/ok")
    return s


def _crawl(spark, site: SiteBuilder, **kw):
    pages, docs = site.build(spark)
    cfg = CheckOptions(paths=["http://rich.test/"], recurse=True,
                       links_to_skip=[r"/private/"], **kw)
    res = LinkChecker(spark).check(cfg, pages, docs)
    rows = sorted(
        (r["url"], r["status"], r["state"], r["parent"], r["wave"],
         tuple(r["failure_details"] or []))
        for r in res.results.collect()
    )
    events = sorted(
        (r["kind"], r["url"], r["status"], r["detail"], r["wave"])
        for r in res.events.collect()
    )
    return rows, events, res.passed, res.waves


GEAR_KNOBS = {
    "full": {},
    "wave": {"per_host_budget": 10**9},       # non-binding budget
    "staged": {"chain_map_max_rows": 0},      # no chain map -> staged+hops
}


@pytest.mark.parametrize("extra", [
    {},
    {"check_css": True},
    {"redirects": "error"},
    {"require_https": "warn"},
    {"status_codes": {"404": "warn", "5xx": "skip"}},
])
def test_gears_identical(spark, extra):
    outs = {
        gear: _crawl(spark, _rich_site(), **knobs, **extra)
        for gear, knobs in GEAR_KNOBS.items()
    }
    full, wavef, staged = outs["full"], outs["wave"], outs["staged"]
    assert full[0] == staged[0], "results: full-fused != staged"
    assert wavef[0] == staged[0], "results: wave-fused != staged"
    assert full[1] == staged[1], "events: full-fused != staged"
    assert wavef[1] == staged[1], "events: wave-fused != staged"
    assert full[2] == staged[2] == wavef[2]
    assert full[3] == staged[3] == wavef[3]


def _retry_frag_site() -> SiteBuilder:
    """Retry + fragment choreography: a 429 with retry-after that heals on
    attempt 2, a transient 500 (error-backoff family), fragment links both
    present and missing (missing -> the reference's exact BROKEN message),
    a fragment link to a HEAD-fetched leaf (forces the body re-GET), and a
    second host so the per-host delay gate has a bystander."""
    base = "http://rt.test"
    s = SiteBuilder()
    s.page(
        base + "/",
        html=(
            '<h2 id="top">t</h2><a href="/a">a</a><a href="/b#sec">b</a>'
            '<a href="/c#missing">c</a><a href="/leaf#frag">l</a>'
            '<a href="http://other.test/ok">o</a>'
        ),
    )
    for m in ("HEAD", "GET"):
        s.script(base + "/a", m, 1, 429, headers={"retry-after": "2"})
        s.script(base + "/a", m, 2, 200,
                 html='<a href="/d">d</a><a href="/e">e</a><a href="/f">f</a>')
        s.script(base + "/d", m, 1, 500)
        s.script(base + "/d", m, 2, 200, html="<p>ok</p>")
        # the other two parseRetryAfter forms (duration + HTTP-date on the
        # virtual epoch) — the fused twin parses these independently of
        # the JVM expression, so each form needs a differential leg
        s.script(base + "/e", m, 1, 429, headers={"retry-after": "1m2s"})
        s.script(base + "/e", m, 2, 200, html="<p>e</p>")
        s.script(base + "/f", m, 1, 429,
                 headers={"retry-after": "Thu, 01 Jan 1970 00:01:10 GMT"})
        s.script(base + "/f", m, 2, 200, html="<p>f</p>")
    s.page(base + "/b", html='<h3 id="sec">s</h3><a href="/#top">home</a>')
    s.page(base + "/c", html="<p>no anchors here</p>")
    # fragment target that is NOT recursed into (leaf fetched by HEAD):
    # validation needs the staged body re-GET / fused plain-GET twin
    s.page("http://other.test/ok", html='<a href="http://rt.test/leaf#frag">x</a>')
    s.page(base + "/leaf", html='<h4 id="frag">f</h4>')
    return s


def _crawl_strict(spark, site: SiteBuilder, **kw):
    """Like _crawl but also compares host/seq per row and the final virtual
    clock — the retry twins must reproduce politeness seq numbers and the
    jitter-derived deadlines bit-exactly."""
    pages, docs = site.build(spark)
    cfg = CheckOptions(paths=["http://rt.test/"], recurse=True, **kw)
    res = LinkChecker(spark).check(cfg, pages, docs)
    rows = sorted(
        (r["url"], r["status"], r["state"], r["parent"], r["wave"],
         r["host"], r["seq"], tuple(r["failure_details"] or []))
        for r in res.results.collect()
    )
    events = sorted(
        (r["kind"], r["url"], r["status"], r["detail"], r["wave"])
        for r in res.events.collect()
    )
    return rows, events, res.passed, res.waves, res.clock


@pytest.mark.parametrize("extra", [
    {"retry": True, "retry_errors": True, "retry_errors_count": 2,
     "check_fragments": True},
    {"retry": True, "check_fragments": True,
     "fragments_to_skip": ["^missing$"],
     "status_codes": {"500": "warn"}},
])
def test_retry_fragment_gears_identical(spark, extra):
    """Full-fused vs staged on the retry/fragment families (the wave-Arrow
    gear is N/A here — its gate excludes cross-wave retry state). Rows,
    events, verdict, wave count AND the final virtual clock must match:
    the clock only agrees if every 429 deadline, backoff jitter hash and
    requeue batching decision was identical."""
    fused = _crawl_strict(spark, _retry_frag_site(), **extra)
    staged = _crawl_strict(spark, _retry_frag_site(),
                           fused_docs_max_bytes=0, **extra)
    assert fused[0] == staged[0], "results diverge"
    assert fused[1] == staged[1], "events diverge"
    assert fused[2:] == staged[2:], "verdict/waves/clock diverge"


def test_docs_byte_gate_forces_staged(spark):
    """The fused gears' docs broadcast is byte-gated, not just row-gated:
    a zero budget must push the whole crawl onto the staged path with
    identical results."""
    fused = _crawl(spark, _rich_site())
    staged = _crawl(spark, _rich_site(), fused_docs_max_bytes=0)
    assert fused[0] == staged[0]
    assert fused[1] == staged[1]
    assert fused[2] == staged[2] and fused[3] == staged[3]


def test_robots_gears_identical(spark):
    """Robots-aware crawls take the fully-fused gear: its python
    longest-prefix allow/disallow twin must match the staged JVM
    robots_filter, including the Allow-beats-shorter-Disallow case and
    the trailing-* prefix form."""
    base = "http://rb.test"
    s = SiteBuilder()
    s.page(base + "/robots.txt", content_type="text/plain",
           spans=[{"kind": "text",
                   "text": ("User-agent: *\nDisallow: /private/\n"
                            "Allow: /private/open/\nDisallow: /tmp*\n"),
                   "media_ref": "", "offset": 0}])
    s.page(base + "/", html=(
        '<a href="/private/x.html">p</a><a href="/private/open/y.html">o</a>'
        '<a href="/tmpfile.html">t</a><a href="/ok.html">k</a>'))
    s.page(base + "/private/x.html", html="<p>secret</p>")
    s.page(base + "/private/open/y.html", html="<p>open</p>")
    s.page(base + "/tmpfile.html", html="<p>tmp</p>")
    s.page(base + "/ok.html", html="<p>ok</p>")

    def crawl(**knobs):
        pages, docs = s.build(spark)
        cfg = CheckOptions(paths=[base + "/"], recurse=True,
                           respect_robots=True, **knobs)
        res = LinkChecker(spark).check(cfg, pages, docs)
        rows = sorted(
            (r["url"], r["status"], r["state"], r["parent"], r["wave"],
             r["host"], r["seq"], tuple(r["failure_details"] or []))
            for r in res.results.collect())
        return rows, res.passed, res.waves

    fused = crawl()
    staged = crawl(fused_docs_max_bytes=0)
    assert fused == staged
    st = {u: (state, tuple(d)) for (u, _s, state, _p, _w, _h, _q, d)
          in fused[0]}
    assert st[base + "/private/x.html"] == (
        "SKIPPED", ("robots.txt disallow",))
    assert st[base + "/tmpfile.html"] == ("SKIPPED", ("robots.txt disallow",))
    assert st[base + "/private/open/y.html"][0] == "OK"
    assert st[base + "/ok.html"][0] == "OK"


def test_fused_result_cap_falls_back_to_staged(spark):
    """The input gates bound pages/doc-bytes, not the edge counts a crawl
    discovers; crossing fused_max_result_rows mid-crawl must abort the
    python gear and re-run the whole crawl on the staged loop with
    identical output."""
    fused = _crawl(spark, _rich_site())
    capped = _crawl(spark, _rich_site(), fused_max_result_rows=3)
    assert fused[0] == capped[0]
    assert fused[1] == capped[1]
    assert fused[2] == capped[2] and fused[3] == capped[3]


def test_full_fusion_runs_zero_wave_jobs(spark):
    """The fully-fused gear must not launch Spark jobs inside the wave
    loop: after the broadcast maps are built, the whole crawl is Python.
    Guard: poison mapInPandas + DataFrame actions during check() except
    the map builds and finalization (which the test triggers AFTER)."""
    from pyspark.sql.classic.dataframe import DataFrame

    site = _rich_site()
    pages, docs = site.build(spark)
    cfg = CheckOptions(paths=["http://rich.test/"], recurse=True)

    calls = {"collect": 0}
    real_collect = DataFrame.collect

    def counting(self, *a, **k):
        calls["collect"] += 1
        return real_collect(self, *a, **k)

    checker = LinkChecker(spark)
    import unittest.mock as mock
    with mock.patch.object(DataFrame, "collect", counting):
        res = checker.check(cfg, pages, docs)
        mid_calls = calls["collect"]
    # the loop itself must do no driver-side collect at all; the only
    # Spark work before materialization is the two one-time map builds
    # (chain map + docs map, one tree_fold collect of ~fanin pickled
    # fragment blobs each — never data rows) plus at most two byte-gate /
    # finalization probes. A per-wave collect would blow well past this
    # bound on the multi-wave rich site.
    assert mid_calls <= 4, f"fused crawl ran {mid_calls} collects"
    assert res.results.count() > 0


def test_robots_crawl_delay_gears_identical(spark):
    """robots Crawl-delay paces fetches per host on the virtual clock:
    a host fetched in a wave admits no further fetches until
    clock + delay. The fused python twin must match the staged
    gate/arming exactly, and the final clock must show the pacing."""
    base = "http://cd.test"
    s = SiteBuilder()
    s.page(base + "/robots.txt", content_type="text/plain",
           spans=[{"kind": "text",
                   "text": "User-agent: *\nCrawl-delay: 3\n",
                   "media_ref": "", "offset": 0}])
    s.page(base + "/", html='<a href="/a.html">a</a><a href="/b.html">b</a>')
    s.page(base + "/a.html", html='<a href="/c.html">c</a>')
    s.page(base + "/b.html", html="<p>b</p>")
    s.page(base + "/c.html", html="<p>c</p>")

    def crawl(**knobs):
        pages, docs = s.build(spark)
        cfg = CheckOptions(paths=[base + "/"], recurse=True,
                           respect_robots=True, **knobs)
        res = LinkChecker(spark).check(cfg, pages, docs)
        rows = sorted(
            (r["url"], r["status"], r["state"], r["parent"], r["host"],
             r["seq"], tuple(r["failure_details"] or []))
            for r in res.results.collect())
        return rows, res.passed, res.clock

    fused = crawl()
    staged = crawl(fused_docs_max_bytes=0)
    assert fused[0] == staged[0]
    assert fused[1] == staged[1] is True
    # wave 0 at t=0 (seed), a/b deferred to t=3, c to t=6
    assert fused[2] == staged[2] == 6.0
    states = {u: st for (u, _s, st, _p, _h, _q, _d) in fused[0]}
    assert all(v == "OK" for v in states.values())
