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
    "/landing": (200, "text/html", "<p>landed cross-origin</p>"),
}
REDIRECTS = {"/hop1": (301, "/hop2"), "/hop2": (302, "/target")}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    inflight = 0
    max_inflight = 0
    seen_headers: list[dict] = []
    extra_redirects: dict[str, str] = {}
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
            if self.path in _Handler.extra_redirects:
                self.send_response(302)
                self.send_header("Location",
                                 _Handler.extra_redirects[self.path])
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
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


def test_live_cross_origin_redirect_strips_sensitive_headers(spark, server):
    """authorization/cookie stop riding once a hop crosses origins; other
    custom headers keep going (stripSensitiveHeaders,
    reference src/index.ts:1277-1305)."""
    srv2 = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv2.serve_forever, daemon=True)
    t.start()
    base2 = f"http://127.0.0.1:{srv2.server_address[1]}"
    _Handler.extra_redirects["/xorigin"] = base2 + "/landing"
    _Handler.seen_headers = []
    try:
        cfg = CheckOptions(
            paths=[server + "/xorigin"], timeout=10_000,
            headers={"Authorization": "Bearer tok", "Cookie": "c=1",
                     "X-Keep": "yes"})
        res = check_live(spark, cfg)
        assert res.passed
        host1, host2 = server.split("//")[1], base2.split("//")[1]
        h1 = [h for h in _Handler.seen_headers if h.get("host") == host1]
        h2 = [h for h in _Handler.seen_headers if h.get("host") == host2]
        assert h1 and h2, "both origins must see traffic"
        for h in h1:  # same-origin: sensitive headers ride
            assert h.get("authorization") == "Bearer tok"
            assert h.get("cookie") == "c=1"
        for h in h2:  # cross-origin hop: stripped, non-sensitive kept
            assert "authorization" not in h and "cookie" not in h
            assert h.get("x-keep") == "yes"
    finally:
        _Handler.extra_redirects.clear()
        srv2.shutdown()


class _ProxyHandler(BaseHTTPRequestHandler):
    """Minimal forwarding HTTP proxy: absolute-form request line in,
    relayed origin response out (reference test/test.proxy.ts pattern)."""

    protocol_version = "HTTP/1.1"
    seen: list[str] = []

    def log_message(self, *a):
        pass

    def _relay(self, method):
        import urllib.request

        _ProxyHandler.seen.append(self.path)  # absolute-form URL
        req = urllib.request.Request(self.path, method=method)
        # the relay must NOT honor HTTP_PROXY itself (infinite self-relay)
        opener = urllib.request.build_opener(
            urllib.request.ProxyHandler({}))
        with opener.open(req) as r:
            body = r.read() if method == "GET" else b""
            self.send_response(r.status)
            ct = r.headers.get("Content-Type")
            if ct:
                self.send_header("Content-Type", ct)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

    def do_GET(self):
        self._relay("GET")

    def do_HEAD(self):
        self._relay("HEAD")


def test_live_proxy_env_is_honored(spark, server):
    """HTTP_PROXY routes requests through the proxy in absolute form;
    NO_PROXY exempts hosts (reference src/index.ts:37-78 proxy agents,
    test/test.proxy.ts)."""
    import os

    proxy = ThreadingHTTPServer(("127.0.0.1", 0), _ProxyHandler)
    threading.Thread(target=proxy.serve_forever, daemon=True).start()
    proxy_url = f"http://127.0.0.1:{proxy.server_address[1]}"
    _ProxyHandler.seen = []
    old = {k: os.environ.get(k) for k in ("HTTP_PROXY", "http_proxy",
                                          "NO_PROXY", "no_proxy")}
    try:
        os.environ["HTTP_PROXY"] = proxy_url
        os.environ.pop("NO_PROXY", None)
        os.environ.pop("no_proxy", None)
        cfg = CheckOptions(paths=[server + "/a.html"], timeout=10_000)
        res = check_live(spark, cfg)
        assert res.passed
        assert server + "/a.html" in _ProxyHandler.seen

        # NO_PROXY exempts the host: the proxy must see no new traffic
        _ProxyHandler.seen = []
        os.environ["NO_PROXY"] = "127.0.0.1"
        res = check_live(spark, CheckOptions(paths=[server + "/a.html"],
                                             timeout=10_000))
        assert res.passed
        assert _ProxyHandler.seen == []
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        proxy.shutdown()


def test_live_timeout_reads_as_broken(spark):
    """An unroutable/closed port times out or refuses -> status 0 BROKEN
    (reference test.index.ts timeout test, src/cli.ts:118-119)."""
    cfg = CheckOptions(paths=["http://127.0.0.1:9/"], timeout=500)
    res = check_live(spark, cfg)
    assert not res.passed
    row = res.results.collect()[0]
    assert row["status"] == 0 and row["state"] == "BROKEN"
