"""Live-HTTP fetch stage vs the table-join fetch — identical results on the
same graph served two ways (the reference's own pattern: a scripted local
server in test/test.redirects.ts:15-92).

The server runs on localhost only; no external network is touched.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import check_live
from linkinator_spark.sources.fixtures import SiteBuilder

# one scripted site: / -> a.html (200 w/ links), /hop1 -> 301 -> /hop2 ->
# 302 -> /target (200), /missing (404), /headless 405 on HEAD + 200 on GET
PAGES = {
    "/": (200, "text/html",
          '<a href="/a.html">a</a><a href="/hop1">hops</a>'
          '<a href="/missing">gone</a><a href="/headless">no head</a>'),
    "/a.html": (200, "text/html", "<p>leaf</p>"),
    "/target": (200, "text/html", "<p>landed</p>"),
}
REDIRECTS = {"/hop1": (301, "/hop2"), "/hop2": (302, "/target")}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    inflight = 0
    max_inflight = 0
    seen_headers: list[dict] = []
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def _serve(self, method):
        import time

        with _Handler.lock:
            _Handler.inflight += 1
            _Handler.max_inflight = max(_Handler.max_inflight,
                                        _Handler.inflight)
            _Handler.seen_headers.append(
                {k.lower(): v for k, v in self.headers.items()})
        try:
            time.sleep(0.05)  # widen the in-flight observation window
            if self.path in REDIRECTS:
                status, loc = REDIRECTS[self.path]
                self.send_response(status)
                self.send_header("Location", loc)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if self.path == "/headless" and method == "HEAD":
                self.send_response(405)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if self.path == "/headless":
                body = b"<p>get works</p>"
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path in PAGES:
                status, ct, body = PAGES[self.path]
                data = body.encode()
                self.send_response(status)
                self.send_header("Content-Type", ct)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                if method == "GET":
                    self.wfile.write(data)
                return
            body = b"Not Found"
            self.send_response(404)
            self.send_header("Content-Type", "text/plain; charset=UTF-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if method == "GET":
                self.wfile.write(body)
        finally:
            with _Handler.lock:
                _Handler.inflight -= 1

    def do_GET(self):
        self._serve("GET")

    def do_HEAD(self):
        self._serve("HEAD")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _table_site(base):
    site = SiteBuilder()
    for path, (status, ct, body) in PAGES.items():
        site.page(base + path, html=body, status=status, content_type=ct)
    for path, (status, loc) in REDIRECTS.items():
        site.redirect(base + path, base + loc, status=status)
    site.script(base + "/headless", "HEAD", 1, 405)
    site.script(base + "/headless", "GET", 1, 200,
                html="<p>get works</p>")
    # /missing: absent in the table too -> the host_defaults-free engine
    # reads it as a network error (status 0); the live server 404s. Script
    # the 404 so both modes agree on the graph.
    site.script(base + "/missing", "HEAD", 1, 404, content_type="text/plain")
    site.script(base + "/missing", "GET", 1, 404, content_type="text/plain")
    return site


def _rows(res):
    return {
        (r["url"], r["status"], r["state"], r["parent"])
        for r in res.results.select("url", "status", "state", "parent").collect()
    }


def test_live_crawl_matches_table_crawl(spark, server):
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=8,
                       timeout=10_000)
    live = check_live(spark, cfg)
    pages, docs = _table_site(server).build(spark)
    from linkinator_spark.operators.crawler import LinkChecker

    table = LinkChecker(spark).check(cfg, pages, docs)
    assert _rows(live) == _rows(table)
    assert live.passed == table.passed is False  # /missing is BROKEN 404
    by_url = {r["url"]: r["status"] for r in
              live.results.select("url", "status").collect()}
    assert by_url[server + "/hop1"] == 200      # chain followed to /target
    assert by_url[server + "/headless"] == 200  # 405 HEAD -> GET fallback
    assert by_url[server + "/missing"] == 404


def test_live_concurrency_cap_observed(spark, server):
    """The reference asserts its concurrency cap server-side
    (test/test.concurrency.ts:18-90): with concurrency=2 and single-task
    waves, the server must never see more than 2 in-flight requests."""
    _Handler.max_inflight = 0
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=2,
                       timeout=10_000)
    res = check_live(spark, cfg)
    assert res.results.count() >= 5
    assert _Handler.max_inflight <= 2


def test_live_custom_headers_sent(spark, server):
    """--header pairs ride every request, user keys override the defaults
    (reference options.ts:30, cli.ts:220-233; test/test.index.ts headers)."""
    _Handler.seen_headers = []
    cfg = CheckOptions(paths=[server + "/a.html"], concurrency=2,
                       timeout=10_000,
                       headers={"X-Custom": "abc123",
                                "User-Agent": "override-ua/1.0"})
    res = check_live(spark, cfg)
    assert res.passed
    assert _Handler.seen_headers, "server saw no requests"
    for h in _Handler.seen_headers:
        assert h.get("x-custom") == "abc123"
        assert h.get("user-agent") == "override-ua/1.0"


def test_live_timeout_reads_as_broken(spark):
    """An unroutable/closed port times out or refuses -> status 0 BROKEN
    (reference test.index.ts timeout test, src/cli.ts:118-119)."""
    cfg = CheckOptions(paths=["http://127.0.0.1:9/"], timeout=500)
    res = check_live(spark, cfg)
    assert not res.passed
    row = res.results.collect()[0]
    assert row["status"] == 0 and row["state"] == "BROKEN"
