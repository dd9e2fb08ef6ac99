"""Extraction unit tests — golden behaviors from the reference fixtures
(/root/reference/test/fixtures/*) and links.ts parsing rules.
"""

from linkinator_spark.functions.extract import (
    extract_fragment_ids_from_spans,
    extract_links_from_json,
    extract_urls_from_css,
    get_links_from_spans,
    parse_meta_refresh,
    parse_srcset,
)
from linkinator_spark.functions.markdown import gfm_heading_id, markdown_to_html

BASE = "http://example.com/index.html"


def html_spans(*chunks):
    return [{"kind": "html", "text": c, "media_ref": "", "offset": i} for i, c in enumerate(chunks)]


def links(spans, **kw):
    return get_links_from_spans(spans, BASE, **kw)


def resolved(spans, **kw):
    return [x["resolved_url"] for x in links(spans, **kw)]


def test_basic_href_and_src():
    out = resolved(html_spans('<a href="a.html">x</a><img src="img/pic.png">'))
    assert out == ["http://example.com/a.html", "http://example.com/img/pic.png"]


def test_document_order_preserved():
    out = links(html_spans('<a href="1"></a>', '<script src="2"></script>', '<a href="3"></a>'))
    assert [x["ordinal"] for x in out] == [0, 1, 2]
    assert [x["raw_link"] for x in out] == ["1", "2", "3"]


def test_base_tag_override_first_wins():
    # reference test/fixtures/basetag + test.index.ts:264-334
    out = resolved(
        html_spans('<base href="http://other.org/sub/"><a href="x.html"></a>'
                   '<base href="http://third.net/"><a href="y.html"></a>')
    )
    assert out == ["http://other.org/sub/x.html", "http://other.org/sub/y.html"]


def test_base_tag_relative():
    out = resolved(html_spans('<base href="sub/dir/"><a href="x.html"></a>'))
    assert out == ["http://example.com/sub/dir/x.html"]


def test_rel_prefetch_ignored():
    # reference test/fixtures/prefetch, links.ts:100-103
    out = resolved(
        html_spans('<link rel="dns-prefetch" href="http://skip.me/">'
                   '<link rel="preconnect" href="http://skip2.me/">'
                   '<link rel="stylesheet" href="style.css">')
    )
    assert out == ["http://example.com/style.css"]


def test_meta_content_url_guard():
    # reference test/fixtures/twittercard; links.ts:107-121
    out = resolved(
        html_spans('<meta name="twitter:image" content="http://img.example/x.png">'
                   '<meta name="description" content="just words not a url">')
    )
    assert out == ["http://img.example/x.png"]


def test_meta_refresh():
    # reference test/fixtures/metarefresh; links.ts:57-65
    out = resolved(html_spans('<meta http-equiv="REFRESH" content="0; url=/target.html">'))
    assert out == ["http://example.com/target.html"]
    assert parse_meta_refresh("5;url=http://x.y/z") == "http://x.y/z"
    assert parse_meta_refresh("not a refresh") is None


def test_srcset():
    # reference test/fixtures/srcset; links.ts:204-218
    assert parse_srcset("a.png 1x, b.png 2x,c.png 100w") == ["a.png", "b.png", "c.png"]
    out = resolved(html_spans('<img srcset="small.jpg 480w, big.jpg 1080w" src="fallback.jpg">'))
    assert out == [
        "http://example.com/fallback.jpg",
        "http://example.com/small.jpg",
        "http://example.com/big.jpg",
    ]


def test_css_extraction_gated():
    spans = html_spans(
        '<style>body { background: url("bg.png"); }</style>'
        '<div style="background-image: url(inline.gif)"></div>'
        '<a href="normal.html"></a>'
    )
    assert resolved(spans) == ["http://example.com/normal.html"]
    out = resolved(spans, check_css=True)
    assert set(out) == {
        "http://example.com/bg.png",
        "http://example.com/inline.gif",
        "http://example.com/normal.html",
    }


def test_css_rules():
    # links.ts:272-307
    css = """
    /* comment url(commented.png) */
    @import url("imported.css");
    @import 'quoted.css';
    .a { background: url(plain.png); }
    .b { background: url(data:image/png;base64,AAAA); }
    """
    # note: the reference's url() regex re-matches `@import url(...)` too, so
    # imported.css appears twice (links.ts:281-304) — we mirror that.
    assert extract_urls_from_css(css) == ["imported.css", "quoted.css", "imported.css", "plain.png"]


def test_css_document_kind():
    spans = [{"kind": "css", "text": "@import 'x.css'; .a{background:url(y.png)}",
              "media_ref": "", "offset": 0}]
    out = get_links_from_spans(spans, "http://example.com/style.css", content_kind="css")
    assert [x["resolved_url"] for x in out] == [
        "http://example.com/x.css", "http://example.com/y.png",
    ]


def test_jsonld_whitelist_walk():
    # reference test/fixtures/json-ld expects 7 links (test.json-ld.ts:20-57)
    payload = """{"@context": "https://schema.org", "@type": "Article",
      "url": "http://example.com/article",
      "image": ["http://example.com/1x1/photo.jpg", "http://example.com/16x9/photo.jpg"],
      "author": {"@type": "Person", "sameAs": "http://example.com/profile"},
      "notAUrlField": "http://example.com/ignored",
      "publisher": {"logo": {"url": "http://example.com/logo.png"}},
      "mainEntityOfPage": "http://example.com/page"}"""
    spans = html_spans(f'<script type="application/ld+json">{payload}</script>')
    out = resolved(spans)
    assert out == [
        "http://example.com/article",
        "http://example.com/1x1/photo.jpg",
        "http://example.com/16x9/photo.jpg",
        "http://example.com/profile",
        "http://example.com/logo.png",
        "http://example.com/page",
    ]
    assert extract_links_from_json({"url": "not-absolute"}) == []


def test_malformed_link_recorded():
    out = links(html_spans('<a href="https://">broken</a>'))
    assert len(out) == 1 and out[0]["parse_error"] is not None


def test_media_ref_spans_interleaved():
    spans = [
        {"kind": "html", "text": '<a href="a.html"></a>', "media_ref": "", "offset": 0},
        {"kind": "media_ref", "text": "", "media_ref": "http://cdn.example/v.mp4", "offset": 1},
        {"kind": "html", "text": '<a href="b.html"></a>', "media_ref": "", "offset": 2},
    ]
    out = resolved(spans)
    assert out == [
        "http://example.com/a.html",
        "http://cdn.example/v.mp4",
        "http://example.com/b.html",
    ]


def test_markdown_spans():
    spans = [{"kind": "markdown", "text": "# Title\n[link](target.md)\n![img](pic.png)",
              "media_ref": "", "offset": 0}]
    out = resolved(spans)
    assert out == ["http://example.com/target.md", "http://example.com/pic.png"]


def test_fragment_ids():
    # links.ts:363-399: id attrs, <a name>, GitHub permalink anchors
    spans = html_spans(
        '<div id="section1"></div><a name="legacy"></a>'
        '<a id="user-content-x" href="#x">x</a><h2 id="h2id">t</h2>'
    )
    assert extract_fragment_ids_from_spans(spans) == ["h2id", "legacy", "section1", "user-content-x", "x"]


def test_markdown_heading_anchors():
    assert gfm_heading_id("Hello, World!") == "hello-world"
    spans = [{"kind": "markdown", "text": "## My Section Title", "media_ref": "", "offset": 0}]
    assert extract_fragment_ids_from_spans(spans) == ["my-section-title"]


def test_markdown_to_html_links():
    html = markdown_to_html("[a](x.html) and <http://auto.example/>\n\n[ref][1]\n\n[1]: http://ref.example/")
    assert '<a href="x.html">' in html
    assert '<a href="http://auto.example/">' in html
    assert '<a href="http://ref.example/">' in html
