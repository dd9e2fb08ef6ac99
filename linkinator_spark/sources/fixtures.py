"""Synthetic web-graph fixtures: the `pages` + `documents` tables.

The reference tests replace the network with undici MockAgent interceptors
scripted per (method, path) with (status, headers, body)
(/root/reference/test/test.index.ts:26-46) and with fixture mini-sites under
test/fixtures/. We encode both as data: one `pages` row per
(url, method, attempt) behavior and one `documents` row per body, in the
graft's interleaved span shape (doc_id, spans<kind,text,media_ref,offset>).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType, IntegerType, MapType, StringType, StructField, StructType,
)

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))),
])

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("host", StringType()),
    StructField("method", StringType()),
    StructField("attempt", IntegerType()),
    StructField("status", IntegerType()),
    StructField("headers", MapType(StringType(), StringType())),
    StructField("content_type", StringType()),
    StructField("body_doc_id", StringType()),
    StructField("final_url", StringType()),
])


def html_span(text: str, offset: int = 0) -> dict:
    return {"kind": "html", "text": text, "media_ref": "", "offset": offset}


def md_span(text: str, offset: int = 0) -> dict:
    return {"kind": "markdown", "text": text, "media_ref": "", "offset": offset}


def css_span(text: str, offset: int = 0) -> dict:
    return {"kind": "css", "text": text, "media_ref": "", "offset": offset}


def media_span(ref: str, offset: int = 0) -> dict:
    return {"kind": "media_ref", "text": "", "media_ref": ref, "offset": offset}


class SiteBuilder:
    """Scripted web. `page()` = a normal 200 page; `script()` = one raw
    (method, attempt) behavior, like one MockAgent interceptor."""

    def __init__(self):
        self._docs: list[tuple] = []
        self._pages: list[tuple] = []

    # -------------------------------------------------------------- helpers
    def _add_doc(self, doc_id: str, spans: list[dict]) -> str:
        self._docs.append(
            (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        )
        return doc_id

    @staticmethod
    def _host(url: str) -> str:
        from linkinator_spark.functions.urls import url_host_py

        return url_host_py(url)

    def page(
        self,
        url: str,
        html: str | None = None,
        md: str | None = None,
        css: str | None = None,
        spans: list[dict] | None = None,
        status: int = 200,
        content_type: str | None = None,
        headers: dict | None = None,
        methods: tuple = ("GET", "HEAD"),
        final_url: str | None = None,
    ):
        if spans is None:
            if html is not None:
                spans = [html_span(html)]
            elif md is not None:
                spans = [md_span(md)]
            elif css is not None:
                spans = [css_span(css)]
        if content_type is None:
            content_type = "text/css" if css is not None else "text/html"
        doc_id = ""
        if spans is not None:
            doc_id = self._add_doc(f"{url}", spans)
        hdrs = {"content-type": content_type, **(headers or {})}
        for method in methods:
            self._pages.append(
                (url, self._host(url), method, 1, status, hdrs, content_type,
                 doc_id, final_url)
            )
        return self

    def script(
        self,
        url: str,
        method: str,
        attempt: int,
        status: int,
        headers: dict | None = None,
        html: str | None = None,
        spans: list[dict] | None = None,
        content_type: str = "text/html",
        final_url: str | None = None,
    ):
        """One scripted behavior row, like a single MockAgent interceptor."""
        if spans is None and html is not None:
            spans = [html_span(html)]
        doc_id = ""
        if spans is not None:
            doc_id = self._add_doc(f"{url}::{method}::{attempt}", spans)
        hdrs = {"content-type": content_type, **(headers or {})}
        self._pages.append(
            (url, self._host(url), method, attempt, status, hdrs, content_type,
             doc_id, final_url)
        )
        return self

    def directory(self, url: str, entries: list[str] | None = None,
                  index_html: str | None = None, listing: bool = False):
        """Static-server directory semantics (reference src/server.ts:
        100-116 trailing-slash 301, :172-184 listing, :191-196 404): the
        slashless URL 301-redirects to `url + '/'`; the slash URL serves
        index_html if given, else a <ul><li><a> listing of `entries` when
        listing=True (directoryListing option), else 404."""
        base = url.rstrip("/")
        self.redirect(base, base + "/", status=301)
        if index_html is not None:
            self.page(base + "/", html=index_html)
        elif listing and entries is not None:
            items = "\r\n".join(
                f'<li><a href="{e}">{e}</a></li>' for e in entries
            )
            self.page(
                base + "/",
                html=f"<html><body><ul>{items}</ul></body></html>",
            )
        else:
            self.page(base + "/", status=404, html="")
        return self

    def clean_page(self, url: str, html: str, **kw):
        """cleanUrls semantics (reference src/server.ts:118-143): the
        extensionless URL serves the .html file's content directly (no
        redirect); the .html URL continues to exist too."""
        self.page(url, html=html, **kw)
        self.page(url + ".html", html=html, **kw)
        return self

    def redirect(self, url: str, to: str, status: int = 301,
                 methods: tuple = ("GET", "HEAD")):
        for method in methods:
            self._pages.append(
                (url, self._host(url), method, 1, status,
                 {"location": to}, "", "", None)
            )
        return self

    def build(self, spark: SparkSession):
        pages = spark.createDataFrame(self._pages, PAGES_SCHEMA)
        docs = spark.createDataFrame(self._docs, DOCUMENTS_SCHEMA)
        return pages, docs


def recurse_site() -> SiteBuilder:
    """The reference's `recurse` fixture: index -> first -> second -> index,
    plus an external link (test/fixtures/recurse; expectations
    test/test.index.ts:348-366)."""
    site = SiteBuilder()
    site.page(
        "http://fake.local/",
        html='<html><body><a href="first.html">first</a></body></html>',
    )
    site.page(
        "http://fake.local/first.html",
        html='<a href="second.html">second</a>',
    )
    site.page(
        "http://fake.local/second.html",
        html='<a href="http://fake.local/">home</a><a href="http://external.example/page">ext</a>',
    )
    site.page("http://external.example/page", html="<p>external</p>")
    return site
