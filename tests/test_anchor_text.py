"""Anchor-text capture (extract._LinkSax capture_anchor_text) and the
per-target anchor profile (graph.anchor_text_agg)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.functions.extract import (  # noqa: E402
    get_links_from_spans,
)
from linkinator_spark.functions.graph import anchor_text_agg  # noqa: E402


def _edges(html, base="http://ex.com/"):
    spans = [{"kind": "html", "text": html, "media_ref": "", "offset": 0}]
    return [
        (p["resolved_url"], p["anchor_text"])
        for p in get_links_from_spans(
            spans, base, capture_anchor_text=True)
    ]


def test_anchor_text_captured_and_whitespace_collapsed():
    out = _edges('<a href="/a">Click\n  here   now</a>')
    assert out == [("http://ex.com/a", "Click here now")]


def test_non_anchor_links_have_empty_anchor_text():
    out = _edges('<img src="/i.png"><a href="/a">go</a><script src="/s.js">')
    assert out == [("http://ex.com/i.png", ""),
                   ("http://ex.com/a", "go"),
                   ("http://ex.com/s.js", "")]


def test_nested_a_implicitly_closes_previous():
    out = _edges('<a href="/a">first <a href="/b">second</a>')
    assert out == [("http://ex.com/a", "first"),
                   ("http://ex.com/b", "second")]


def test_unclosed_anchor_finalized_on_close():
    out = _edges('<a href="/a">dangling text')
    assert out == [("http://ex.com/a", "dangling text")]


def test_inline_markup_inside_anchor_keeps_text():
    out = _edges('<a href="/a">bold <b>middle</b> end</a>')
    assert out == [("http://ex.com/a", "bold middle end")]


def test_markdown_link_carries_anchor_text():
    spans = [{"kind": "markdown", "text": "see [the guide](/g)",
              "media_ref": "", "offset": 0}]
    out = [(p["resolved_url"], p["anchor_text"])
           for p in get_links_from_spans(
               spans, "http://ex.com/", capture_anchor_text=True)]
    assert ("http://ex.com/g", "the guide") in out


def test_default_path_unchanged_no_anchor_key():
    spans = [{"kind": "html", "text": '<a href="/a">go</a>',
              "media_ref": "", "offset": 0}]
    parsed = get_links_from_spans(spans, "http://ex.com/")
    assert "anchor_text" not in parsed[0]


def test_anchor_text_agg_counts_and_deterministic_tie(spark):
    rows = [
        # url X: 'alpha' x2, 'beta' x2 -> tie, lexicographically largest
        ("p1", "X", "alpha"), ("p2", "X", "alpha"),
        ("p1", "X", "beta"), ("p3", "X", "beta"),
        # url Y: single ref
        ("p1", "Y", "gamma"),
    ]
    df = spark.createDataFrame(
        rows, "page_url string, resolved_url string, anchor_text string")
    out = {r["url"]: r.asDict() for r in anchor_text_agg(df).collect()}
    assert out["X"]["n_refs"] == 4
    assert out["X"]["n_pages"] == 3
    assert out["X"]["top_anchor"] == "beta"  # tie at 2 -> max lexicographic
    assert out["X"]["top_anchor_refs"] == 2
    assert out["Y"] == {"url": "Y", "n_refs": 1, "n_pages": 1,
                        "top_anchor": "gamma", "top_anchor_refs": 1}
