"""URL canonicalization unit tests.

Golden behaviors from the reference's WHATWG URL usage
(/root/reference/src/links.ts:220-232) and dedup-key semantics
(/root/reference/src/index.ts:813-817).
"""

from linkinator_spark.functions.urls import (
    canonicalize,
    is_absolute_url,
    parse_link,
    url_host_py,
    url_protocol_py,
)


def test_relative_resolution():
    p = parse_link("first.html", "http://example.com/dir/index.html")
    assert p["resolved_url"] == "http://example.com/dir/first.html"
    assert p["parse_error"] is None


def test_absolute_passthrough_and_default_port():
    p = parse_link("HTTP://Example.COM:80/path", None)
    assert p["resolved_url"] == "http://example.com/path"


def test_fragment_split_and_decode():
    p = parse_link("http://example.com/page#sec%20one", None)
    assert p["resolved_url"] == "http://example.com/page"
    assert p["url_with_fragment"] == "http://example.com/page#sec%20one"
    assert p["fragment"] == "sec one"


def test_fragment_only_link_resolves_to_page():
    p = parse_link("#anchor", "http://example.com/a/b.html")
    assert p["resolved_url"] == "http://example.com/a/b.html"
    assert p["fragment"] == "anchor"


def test_empty_path_gets_root():
    assert parse_link("http://example.com", None)["resolved_url"] == "http://example.com/"


def test_non_http_protocols_parse():
    p = parse_link("mailto:nobody@example.com", "http://example.com/")
    assert p["resolved_url"] == "mailto:nobody@example.com"
    assert p["parse_error"] is None
    assert url_protocol_py(p["resolved_url"]) == "mailto:"


def test_malformed_is_error():
    # 'https://' with no host fails new URL() in the reference (fixture
    # test/fixtures/malformed) -> BROKEN status 0
    assert parse_link("https://", None)["parse_error"] is not None
    assert parse_link("relative/no/base", None)["parse_error"] is not None


def test_host_includes_nondefault_port():
    assert url_host_py("http://127.0.0.1:8080/x") == "127.0.0.1:8080"
    assert url_host_py("https://Example.com:443/x") == "example.com"


def test_query_preserved():
    p = parse_link("/search?q=a+b&x=1", "http://example.com/dir/")
    assert p["resolved_url"] == "http://example.com/search?q=a+b&x=1"


def test_is_absolute_url():
    assert is_absolute_url("https://x.com")
    assert is_absolute_url("mailto:a@b.c")
    assert not is_absolute_url("/relative")
    assert not is_absolute_url("C:\\windows\\path")


def test_dot_segment_normalization():
    p = parse_link("../up.html", "http://example.com/a/b/c.html")
    assert p["resolved_url"] == "http://example.com/a/up.html"


def test_canonicalize_space_encoding():
    assert canonicalize("http://example.com/a b") == "http://example.com/a%20b"


def test_encoded_urlpatterns_parity():
    """Percent-encoding edge cases from the reference urlpatterns fixture
    (test/fixtures/urlpatterns, test/test.index.ts:953-959): existing
    escapes survive canonicalization un-double-encoded, sub-delims like '+'
    stay raw, and the two spellings remain distinct URLs (the SERVER unifies
    them, not the URL parser — src/server.ts:77-80)."""
    enc = parse_link("funky%2Bpath.html", "http://h.local/dir/")
    raw = parse_link("funky+path.html", "http://h.local/dir/")
    assert enc["resolved_url"] == "http://h.local/dir/funky%2Bpath.html"
    assert raw["resolved_url"] == "http://h.local/dir/funky+path.html"
    assert enc["resolved_url"] != raw["resolved_url"]
    # %20 is not re-encoded; a raw space is
    assert canonicalize("http://h.local/a%20b") == "http://h.local/a%20b"
    assert canonicalize("http://h.local/a b c") == "http://h.local/a%20b%20c"
    # mixed: encoded fragment decodes (links.ts:224-226)
    p = parse_link("page.html#se%C3%A7%C3%A3o", "http://h.local/")
    assert p["fragment"] == "seção"


# ------------------------------------------------ tracking-param stripping

def test_strip_tracking_params(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from linkinator_spark.functions.urls import (
        strip_tracking_params, strip_tracking_sql,
    )

    cases = [
        # (input, expected)
        ("http://a.x/p?utm_source=n&id=7&utm_medium=e", "http://a.x/p?id=7"),
        ("http://a.x/p?id=7&fbclid=abc123", "http://a.x/p?id=7"),
        ("http://a.x/p?gclid=1&utm_campaign=c", "http://a.x/p"),   # all gone
        ("http://a.x/p", "http://a.x/p"),                          # no query
        ("http://a.x/p?", "http://a.x/p"),                         # empty query
        ("http://a.x/p?keep=utm_source", "http://a.x/p?keep=utm_source"),
        ("http://a.x/p?utm_source", "http://a.x/p"),               # bare name
        ("http://a.x/p?b=2&a=1", "http://a.x/p?b=2&a=1"),          # order kept
        ("http://a.x/p?spm=x&ref_src=t&mc_eid=9&real=1", "http://a.x/p?real=1"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    got = [r["s"] for r in
           df.select(strip_tracking_params("url").alias("s")).collect()]
    assert got == [c[1] for c in cases]

    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": [c[0] for c in cases]}))
    want = [r[0] for r in con.execute(
        f"select {strip_tracking_sql('url')} from u").fetchall()]
    assert want == [c[1] for c in cases]


# ---------------------------------------------------------------- IDN hosts

def test_idn_hosts_punycode_like_whatwg():
    """WHATWG URL punycodes unicode hostnames; the unicode and punycode
    spellings of one host must canonicalize to ONE seen-set key
    (expected values verified against Node's `new URL(...)`)."""
    cases = {
        "http://bücher.example/path": "http://xn--bcher-kva.example/path",
        "http://例え.jp/": "http://xn--r8jz45g.jp/",
        "http://straße.de/": "http://xn--strae-oqa.de/",      # UTS46 non-transitional
        "http://\U0001f4a9.la/": "http://xn--ls8h.la/",            # emoji, raw-punycode fallback
        "http://xn--bcher-kva.example/q": "http://xn--bcher-kva.example/q",
    }
    for raw, want in cases.items():
        assert canonicalize(raw) == want, raw
    a = parse_link("http://BÜCHER.example/a", None)
    b = parse_link("http://xn--bcher-kva.example/a", None)
    assert a["resolved_url"] == b["resolved_url"]
    # ascii hosts untouched, ports/userinfo survive
    assert canonicalize("http://bücher.example:8080/x") == \
        "http://xn--bcher-kva.example:8080/x"


def test_whatwg_host_normalization():
    """IPv4 numeric forms, percent-encoded domains, IPv6 brackets —
    expected values verified against Node's `new URL(...)`."""
    cases = {
        "http://0x7f.1/x": "http://127.0.0.1/x",
        "http://2130706433/": "http://127.0.0.1/",
        "http://0177.0.0.1/": "http://127.0.0.1/",
        "http://192.168.257/": "http://192.168.1.1/",
        "http://192.168.0.1/": "http://192.168.0.1/",
        "http://ex%61mple.com/": "http://example.com/",
        "http://example.com./": "http://example.com./",  # trailing dot kept
        "http://[::1]:8080/x": "http://[::1]:8080/x",
        "http://[2001:DB8::1]/": "http://[2001:db8::1]/",
        "http://a.0x7f.b/": "http://a.0x7f.b/",  # not all-numeric: domain
    }
    for raw, want in cases.items():
        assert canonicalize(raw) == want, raw


def test_whatwg_path_normalization():
    """Backslash conversion, dot-segment removal (incl. %2e spellings),
    and scheme-missing-slashes — expected values pinned against Node."""
    cases = {
        "http://a.x/b\\c": "http://a.x/b/c",
        "http://a.x/p/../../q": "http://a.x/q",
        "http:foo.com/x": "http://foo.com/x",
        "http:////a.x/": "http://a.x/",
        "http://a.x//b//c": "http://a.x//b//c",   # empty segments kept
        "http://a.x/./b/.": "http://a.x/b/",
        "http://a.x/a/..": "http://a.x/",
        "http://a.x/a/b/..": "http://a.x/a/",
        "http://a.x/%2e/b": "http://a.x/b",
        "http://a.x/.%2e/b": "http://a.x/b",
        # backslash survives raw in query and fragment
        "http://a.x/b?c\\d#e\\f": "http://a.x/b?c\\d#e\\f",
    }
    for raw, want in cases.items():
        assert canonicalize(raw) == want, raw
    # relative path parsing against a special base converts '\' too
    assert parse_link("b\\c", "http://a.x/d/")["resolved_url"] == \
        "http://a.x/d/b/c"


def test_bare_query_and_fragment_markers_preserved():
    """WHATWG href keeps a bare '?' and '#'; the reference's URL-seen
    Set keys on href, where '/p?' and '/p' are distinct."""
    assert canonicalize("http://a.x/p?") == "http://a.x/p?"
    assert canonicalize("http://a.x/p#") == "http://a.x/p#"
    assert canonicalize("http://a.x/p?#") == "http://a.x/p?#"
    assert canonicalize("http://a.x/p") == "http://a.x/p"
    p = parse_link("http://a.x/p?", None)
    assert p["resolved_url"] == "http://a.x/p?"
    assert p["fragment"] is None
    q = parse_link("http://a.x/p#", None)
    assert q["resolved_url"] == "http://a.x/p"     # hash='' removes '#'
    assert q["url_with_fragment"] == "http://a.x/p#"


def test_idn_seen_set_collapse_in_crawl(spark):
    """End-to-end: a page linking to BOTH spellings of one IDN host
    (unicode and punycode) produces exactly one fetch and one OK row —
    the reference's fetch-once semantics over WHATWG host folding."""
    from linkinator_spark.config import CheckOptions
    from linkinator_spark.operators.crawler import LinkChecker
    from linkinator_spark.sources.fixtures import SiteBuilder

    site = SiteBuilder()
    site.page(
        "http://xn--bcher-kva.example/",
        html='<a href="http://bücher.example/x">u</a>'
             '<a href="http://xn--bcher-kva.example/x">p</a>')
    site.page("http://xn--bcher-kva.example/x", html="<p>leaf</p>")
    pages, docs = site.build(spark)
    cfg = CheckOptions(paths=["http://xn--bcher-kva.example/"],
                       recurse=True)
    res = LinkChecker(spark).check(cfg, pages, docs)
    rows = res.results.collect()
    xs = [r for r in rows if r["url"].endswith("/x")]
    assert len(xs) == 1
    assert xs[0]["state"] == "OK"
    assert xs[0]["url"] == "http://xn--bcher-kva.example/x"
    res.release()
