"""Candidate-link extraction over interleaved text+media span sequences.

Re-creates the reference's streaming SAX extraction (getLinks,
/root/reference/src/links.ts:67-181) and its satellite extractors:

* tag->attribute URL table (links.ts:8-41)
* <base href> override, first tag wins (links.ts:82-86,183-202)
* srcset splitting (links.ts:204-218)
* meta-refresh "0;url=X" (links.ts:57-65,107-115)
* <meta content> absolute-URL shape guard (links.ts:107-121)
* rel=dns-prefetch/preconnect ignore (links.ts:100-103)
* CSS @import / url() extraction, comment-strip, data:-skip (links.ts:272-307)
* JSON-LD schema.org whitelist walk (links.ts:315-353)
* fragment-id extraction: id attrs, <a name>, GitHub permalinks (links.ts:363-399)
* markdown spans compiled to HTML first (reference server-side markdown,
  src/server.ts:147-165)

Input shape is the graft's interleaved document model:
``spans: array<struct<kind,text,media_ref,offset>>`` — one row per page body.
`media_ref` spans surface their URL directly, in document order.

Spark surface: `candidate_links(pages_with_spans)` runs mapInPandas with an
Arrow-batched parser — one Python parse per page body, vectorized at batch
level, never a per-row Spark UDF.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from typing import Iterable, Iterator

import pandas as pd

from linkinator_spark.functions.markdown import markdown_to_html
from linkinator_spark.functions.schema_org import SCHEMA_ORG_URL_FIELDS
from linkinator_spark.functions.urls import is_absolute_url, parse_link

# tag -> attributes that carry URLs (behavioral spec from links.ts:8-41)
TAG_URL_ATTRS: dict[str, list[str]] = {
    "body": ["background"],
    "blockquote": ["cite"],
    "del": ["cite"],
    "ins": ["cite"],
    "q": ["cite"],
    "object": ["data"],
    "a": ["href"],
    "area": ["href"],
    "embed": ["href", "pluginspage", "pluginurl", "src"],
    "link": ["href"],
    "command": ["icon"],
    "frame": ["longdesc", "src"],
    "iframe": ["longdesc", "src"],
    "html": ["manifest"],
    "meta": ["content"],
    "video": ["poster", "src"],
    "audio": ["src"],
    "img": ["src", "srcset"],
    "input": ["src"],
    "script": ["src"],
    "source": ["src", "srcset"],
    "track": ["src"],
}

_META_REFRESH_RE = re.compile(r"^\s*\d+\s*;\s*url\s*=\s*(.+)", re.IGNORECASE)
_CSS_COMMENT_RE = re.compile(r"/\*[\s\S]*?\*/")
_CSS_IMPORT_RE = re.compile(
    r"@import\s+(?:url\(\s*['\"]?([^'\")]+)['\"]?\s*\)|['\"]([^'\"]+)['\"])",
    re.IGNORECASE,
)
_CSS_URL_RE = re.compile(r"url\(\s*['\"]?([^'\")]+)['\"]?\s*\)", re.IGNORECASE)


def parse_meta_refresh(content: str) -> str | None:
    m = _META_REFRESH_RE.match(content or "")
    return m.group(1).strip() if m else None


def parse_srcset(value: str) -> list[str]:
    urls = []
    for part in value.split(","):
        part = part.strip()
        if part:
            urls.append(part.split()[0])
    return urls


def extract_urls_from_css(css: str) -> list[str]:
    clean = _CSS_COMMENT_RE.sub("", css or "")
    urls: list[str] = []
    for m in _CSS_IMPORT_RE.finditer(clean):
        url = m.group(1) or m.group(2)
        if url:
            urls.append(url.strip())
    for m in _CSS_URL_RE.finditer(clean):
        url = m.group(1)
        if url and not url.startswith("data:"):
            urls.append(url.strip())
    return urls


def extract_links_from_json(obj, parent_key: str | None = None) -> list[str]:
    links: list[str] = []
    if obj is None or not isinstance(obj, (dict, list)):
        if isinstance(obj, str) and parent_key in SCHEMA_ORG_URL_FIELDS:
            if is_absolute_url(obj):
                links.append(obj)
        return links
    if isinstance(obj, list):
        for item in obj:
            links.extend(extract_links_from_json(item, parent_key))
        return links
    for key, value in obj.items():
        if isinstance(value, str) and key in SCHEMA_ORG_URL_FIELDS:
            if is_absolute_url(value):
                links.append(value)
        elif isinstance(value, list):
            for item in value:
                links.extend(extract_links_from_json(item, key))
        elif isinstance(value, dict):
            links.extend(extract_links_from_json(value, key))
    return links


def _get_base_url(html_base: str, old_base: str) -> str:
    """links.ts:183-191 — absolute wins, else resolve + strip hash."""
    if is_absolute_url(html_base):
        return html_base
    parsed = parse_link(html_base, old_base)
    return parsed["resolved_url"] or old_base


class _LinkSax(HTMLParser):
    """SAX extractor mirroring the reference's onopentag/ontext/onclosetag
    dance (links.ts:80-176). Emits (raw_link, base_at_emit) in document order.
    """

    def __init__(self, base_url: str, check_css: bool,
                 capture_anchor_text: bool = False):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.base_set = False
        self.check_css = check_css
        self.raw_links: list[tuple[str, str]] = []  # (raw, base)
        self.fragment_ids: set[str] = set()
        self._in_style = False
        self._style_buf: list[str] = []
        self._in_jsonld = False
        self._jsonld_buf: list[str] = []
        # anchor-text capture (opt-in): anchor_texts[i] is the visible
        # text of raw_links[i] when that link came from an <a href>,
        # else "" — an LLM-data signal (incoming anchor text describes
        # the target page), not reference behavior (linkinator reports
        # per-link verdicts only)
        self.capture_anchor_text = capture_anchor_text
        self.anchor_texts: list[str] = []
        self._open_anchor: int | None = None
        self._anchor_buf: list[str] = []

    # -- open tag ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs_list):
        attrs: dict[str, str] = {}
        for k, v in attrs_list:
            if k not in attrs:
                attrs[k] = v if v is not None else ""

        # fragment-target collection (links.ts:368-391)
        if attrs.get("id"):
            self.fragment_ids.add(attrs["id"])
        if tag == "a" and attrs.get("name"):
            self.fragment_ids.add(attrs["name"])
        if tag == "a" and attrs.get("id") and attrs.get("href", "").startswith("#") \
                and len(attrs.get("href", "")) > 1:
            self.fragment_ids.add(attrs["href"][1:])

        if tag == "base" and not self.base_set:
            if attrs.get("href"):
                self.base_url = _get_base_url(attrs["href"], self.base_url)
            self.base_set = True

        if tag == "style" and self.check_css:
            self._in_style = True
            self._style_buf = []

        if tag == "script" and attrs.get("type") == "application/ld+json":
            self._in_jsonld = True
            self._jsonld_buf = []

        # ignore link tags with rel values likely to fail (links.ts:100-103)
        if tag == "link" and attrs.get("rel") in ("dns-prefetch", "preconnect"):
            return

        if tag == "meta" and attrs.get("content"):
            if (attrs.get("http-equiv") or "").lower() == "refresh":
                refresh_url = parse_meta_refresh(attrs["content"])
                if refresh_url:
                    self._emit(refresh_url)
                return
            # only take <meta content> shaped like an absolute URL
            if not _looks_like_absolute_url(attrs["content"]):
                return

        if attrs.get("style") and self.check_css:
            for url in extract_urls_from_css(attrs["style"]):
                self._emit(url)

        for attribute in TAG_URL_ATTRS.get(tag, ()):  # document order
            value = attrs.get(attribute)
            if value:
                if attribute == "srcset":
                    for url in parse_srcset(value):
                        self._emit(url)
                else:
                    self._emit(value)

        if self.capture_anchor_text and tag == "a":
            # a new <a> implicitly closes any open one (nesting is
            # invalid HTML; browsers auto-close the same way)
            self._close_anchor()
            if attrs.get("href"):
                self._open_anchor = len(self.raw_links) - 1
                self._anchor_buf = []

    def handle_startendtag(self, tag, attrs):  # <img ... /> style
        self.handle_starttag(tag, attrs)

    def handle_data(self, data: str):
        if self._in_style:
            self._style_buf.append(data)
        if self._in_jsonld:
            self._jsonld_buf.append(data)
        if self._open_anchor is not None:
            self._anchor_buf.append(data)

    def _close_anchor(self):
        if self._open_anchor is not None:
            self.anchor_texts[self._open_anchor] = " ".join(
                "".join(self._anchor_buf).split())
            self._open_anchor = None
            self._anchor_buf = []

    def handle_endtag(self, tag: str):
        if tag == "a":
            self._close_anchor()
        if tag == "style" and self._in_style:
            self._in_style = False
            for url in extract_urls_from_css("".join(self._style_buf)):
                self._emit(url)
            self._style_buf = []
        if tag == "script" and self._in_jsonld:
            self._in_jsonld = False
            try:
                payload = json.loads("".join(self._jsonld_buf))
                for url in extract_links_from_json(payload, None):
                    self._emit(url)
            except (json.JSONDecodeError, ValueError):
                pass
            self._jsonld_buf = []

    def _emit(self, raw: str):
        self.raw_links.append((raw, self.base_url))
        self.anchor_texts.append("")

    def close(self):
        super().close()
        self._close_anchor()


def _looks_like_absolute_url(value: str) -> bool:
    parsed = parse_link(value, None)
    return parsed["parse_error"] is None



def _span_list(spans) -> list:
    """Null-safe span materialization: the spans column arrives as a
    Python list from driver-built rows but as a numpy object array from
    Arrow batches (mapInPandas), where `spans or []` raises on ambiguous
    truth — normalize both to a plain list."""
    if spans is None:
        return []
    return list(spans)


def get_links_from_spans(
    spans: Iterable[dict],
    base_url: str,
    check_css: bool = False,
    markdown: bool = True,
    content_kind: str = "html",
    capture_anchor_text: bool = False,
) -> list[dict]:
    """One page body (span sequence) -> candidate links in document order.

    Returns list of parse_link dicts + 'ordinal'. Equivalent of getLinks /
    getCssLinks on a full body (links.ts:67-181,243-264) with media_ref spans
    emitted directly at their position.
    """
    ordered = sorted(_span_list(spans), key=lambda s: s.get("offset", 0))
    anchor_texts: list[str] | None = None
    if content_kind == "css":
        css_text = "".join(s.get("text") or "" for s in ordered)
        raw = [(u, base_url) for u in extract_urls_from_css(css_text)]
    else:
        sax = _LinkSax(base_url, check_css,
                       capture_anchor_text=capture_anchor_text)
        raw = []
        for span in ordered:
            kind = span.get("kind") or "text"
            text = span.get("text") or ""
            media_ref = span.get("media_ref") or ""
            if kind == "html":
                sax.feed(text)
            elif kind == "markdown" and markdown:
                sax.feed(markdown_to_html(text))
            elif kind == "css" and check_css:
                for url in extract_urls_from_css(text):
                    sax._emit(url)
            elif kind == "jsonld":
                try:
                    for url in extract_links_from_json(json.loads(text), None):
                        sax._emit(url)
                except (json.JSONDecodeError, ValueError):
                    pass
            elif kind == "media_ref" and media_ref:
                sax._emit(media_ref)
            # kind == 'text': plain text carries no markup links
        sax.close()
        raw = sax.raw_links
        if capture_anchor_text:
            anchor_texts = sax.anchor_texts

    out = []
    for i, (link, base) in enumerate(raw):
        parsed = parse_link(link, base)
        parsed["ordinal"] = i
        if capture_anchor_text:
            parsed["anchor_text"] = (
                anchor_texts[i] if anchor_texts is not None else "")
        out.append(parsed)
    return out


def extract_fragment_ids_from_spans(spans: Iterable[dict], markdown: bool = True) -> list[str]:
    """Valid fragment targets on a page (links.ts:363-399); markdown headings
    become gfm anchors (server.ts:147-165)."""
    sax = _LinkSax("http://placeholder.invalid/", check_css=False)
    for span in sorted(_span_list(spans), key=lambda s: s.get("offset", 0)):
        kind = span.get("kind") or "text"
        text = span.get("text") or ""
        if kind == "html":
            sax.feed(text)
        elif kind == "markdown" and markdown:
            sax.feed(markdown_to_html(text))
    sax.close()
    return sorted(sax.fragment_ids)


def page_text_from_spans(spans: Iterable[dict]) -> str:
    """Raw body text in span order (soft-404 sniffing, src/index.ts:632-635)."""
    return "".join(
        (s.get("text") or "") for s in sorted(_span_list(spans), key=lambda x: x.get("offset", 0))
    )


# ---------------------------------------------------------------------------
# Spark mapInPandas surface
# ---------------------------------------------------------------------------

CANDIDATE_SCHEMA = (
    "page_url string, ordinal int, raw_link string, resolved_url string, "
    "url_with_fragment string, fragment string, parse_error string"
)

ANCHORS_SCHEMA = "page_url string, anchors array<string>, body_text string"

ANCHOR_EDGES_SCHEMA = (
    "page_url string, ordinal int, resolved_url string, anchor_text string"
)


def make_anchor_edges_udf(markdown: bool):
    """mapInPandas fn: (page_url, base_url, spans) -> one row per <a href>
    link with its visible anchor text (whitespace-collapsed; markdown
    [text](url) compiles to <a> first, so it carries anchor text too).
    Non-anchor links (img/script/meta/...) are excluded — this surface
    feeds anchor-text aggregation, not the crawl frontier."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for page_url, base_url, spans in zip(
                pdf["page_url"], pdf["base_url"], pdf["spans"]
            ):
                for parsed in get_links_from_spans(
                    spans, base_url or page_url, check_css=False,
                    markdown=markdown, capture_anchor_text=True,
                ):
                    if parsed["anchor_text"] and parsed["resolved_url"]:
                        rows.append((page_url, parsed["ordinal"],
                                     parsed["resolved_url"],
                                     parsed["anchor_text"]))
            yield pd.DataFrame(
                rows, columns=["page_url", "ordinal", "resolved_url",
                               "anchor_text"])

    return fn


def make_candidate_links_udf(check_css: bool, markdown: bool):
    """mapInPandas fn: (page_url, base_url, content_kind, spans) -> candidates."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for page_url, base_url, kind, spans in zip(
                pdf["page_url"], pdf["base_url"], pdf["content_kind"], pdf["spans"]
            ):
                for parsed in get_links_from_spans(
                    spans, base_url or page_url, check_css, markdown, kind or "html"
                ):
                    rows.append(
                        (
                            page_url,
                            parsed["ordinal"],
                            parsed["raw_link"],
                            parsed["resolved_url"],
                            parsed["url_with_fragment"],
                            parsed["fragment"],
                            parsed["parse_error"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "page_url", "ordinal", "raw_link", "resolved_url",
                    "url_with_fragment", "fragment", "parse_error",
                ],
            )

    return fn


def make_anchors_udf(markdown: bool):
    """mapInPandas fn: (page_url, spans) -> (page_url, anchors, body_text)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for page_url, spans in zip(pdf["page_url"], pdf["spans"]):
                rows.append(
                    (
                        page_url,
                        extract_fragment_ids_from_spans(spans, markdown),
                        page_text_from_spans(spans),
                    )
                )
            yield pd.DataFrame(rows, columns=["page_url", "anchors", "body_text"])

    return fn
