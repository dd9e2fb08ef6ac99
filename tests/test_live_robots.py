"""Live-mode robots.txt: rules are fetched over the real network, once per
host, as the crawl meets new hosts (north_star: "robots.txt-aware"
politeness; the reference has no robots support — this mirrors the
TABLE-mode robots semantics already oracle-checked by robots_gate).
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import check_live

ROBOTS_BODY = (b"User-agent: *\n"
               b"Disallow: /private/\n"
               b"Allow: /private/open/\n")

PAGES = {
    "/": (b'<a href="/private/x.html">p</a>'
          b'<a href="/private/open/y.html">o</a>'
          b'<a href="/ok.html">k</a>'),
    "/private/x.html": b"<p>secret</p>",
    "/private/open/y.html": b"<p>open</p>",
    "/ok.html": b"<p>ok</p>",
}


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    robots_hits = 0
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def _serve(self, method):
        if self.path == "/robots.txt":
            with _Handler.lock:
                _Handler.robots_hits += 1
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(ROBOTS_BODY)))
            self.end_headers()
            if method == "GET":
                self.wfile.write(ROBOTS_BODY)
            return
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)

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


def test_live_robots_gate_and_single_fetch(spark, server):
    _Handler.robots_hits = 0
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=4,
                       timeout=10_000, respect_robots=True)
    res = check_live(spark, cfg)
    rows = {r["url"]: r for r in res.results.collect()}

    x = rows[server + "/private/x.html"]
    assert x["state"] == "SKIPPED"
    assert list(x["failure_details"]) == ["robots.txt disallow"]
    assert rows[server + "/private/open/y.html"]["state"] == "OK"
    assert rows[server + "/ok.html"]["state"] == "OK"
    assert res.passed is True
    # robots.txt is a side-channel fetch, not a crawled link
    assert server + "/robots.txt" not in rows
    # fetched exactly once for the host, not per wave / per URL
    assert _Handler.robots_hits == 1


def test_live_robots_missing_allows_everything(spark, server, monkeypatch):
    """A host without robots.txt (404) must crawl unrestricted, and the
    host must still be recorded so robots is not re-probed every wave."""
    _Handler.robots_hits = 0
    missing = dict(PAGES)

    def serve(self, method):
        if self.path == "/robots.txt":
            with _Handler.lock:
                _Handler.robots_hits += 1
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = missing.get(self.path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)

    monkeypatch.setattr(_Handler, "_serve", serve)
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=4,
                       timeout=10_000, respect_robots=True)
    res = check_live(spark, cfg)
    rows = {r["url"]: r["state"] for r in res.results.collect()}
    assert rows[server + "/private/x.html"] == "OK"
    assert rows[server + "/ok.html"] == "OK"
    assert res.passed is True
    assert _Handler.robots_hits == 1


def test_skip_ruled_host_never_contacted_for_robots(spark, server):
    """A host the user excluded via links_to_skip must receive NO requests
    at all — not even the robots.txt probe (the probe runs after the
    pre-fetch skip, keyed on post-rewrite hosts)."""
    other = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=other.serve_forever, daemon=True)
    t.start()
    other_base = f"http://127.0.0.1:{other.server_address[1]}"
    try:
        _Handler.robots_hits = 0
        # the main site links to the other server, but the user skips it
        PAGES["/"] = (PAGES["/"]
                      + f'<a href="{other_base}/ok.html">x</a>'.encode())
        try:
            cfg = CheckOptions(
                paths=[server + "/"], recurse=True, concurrency=4,
                timeout=10_000, respect_robots=True,
                links_to_skip=[other_base.replace(".", r"\.")])
            res = check_live(spark, cfg)
            rows = {r["url"]: r["state"] for r in res.results.collect()}
            assert rows[other_base + "/ok.html"] == "SKIPPED"
            # both servers share the _Handler counter: exactly ONE robots
            # fetch happened (the crawled host); the skipped host got none
            assert _Handler.robots_hits == 1
        finally:
            PAGES["/"] = PAGES["/"].replace(
                f'<a href="{other_base}/ok.html">x</a>'.encode(), b"")
    finally:
        other.shutdown()


def test_live_clock_advance_waits_wall_clock(spark, server, monkeypatch):
    """Live mode must honor deferred deadlines in REAL time (reference
    setTimeout semantics): a robots Crawl-delay of 2s makes the crawl take
    at least ~2s of wall clock between host waves."""
    import time

    robots = (b"User-agent: *\nCrawl-delay: 2\n")

    def serve(self, method):
        if self.path == "/robots.txt":
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(robots)))
            self.end_headers()
            if method == "GET":
                self.wfile.write(robots)
            return
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)

    monkeypatch.setattr(_Handler, "_serve", serve)
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=4,
                       timeout=10_000, respect_robots=True)
    t0 = time.time()
    res = check_live(spark, cfg)
    elapsed = time.time() - t0
    assert res.passed is True
    assert res.clock >= 2.0       # virtual deadline was armed
    assert elapsed >= 2.0         # and actually waited in wall-clock time


def _make_serve(robots_responder):
    """Build a _serve replacement whose /robots.txt behavior is
    `robots_responder(self, method, path) -> bool handled`."""
    def serve(self, method):
        if robots_responder(self, method, self.path):
            return
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)
    return serve


def test_live_robots_follows_redirect(spark, server, monkeypatch):
    """RFC 9309 §2.3.1.2: a 301 on /robots.txt must be followed (http→https
    and apex→www robots redirects are the common real-web case); the rules
    at the redirect target apply."""
    def responder(self, method, path):
        if path == "/robots.txt":
            self.send_response(301)
            self.send_header("Location", "/actual-robots.txt")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return True
        if path == "/actual-robots.txt":
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(ROBOTS_BODY)))
            self.end_headers()
            if method == "GET":
                self.wfile.write(ROBOTS_BODY)
            return True
        return False

    monkeypatch.setattr(_Handler, "_serve", _make_serve(responder))
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=4,
                       timeout=10_000, respect_robots=True)
    res = check_live(spark, cfg)
    rows = {r["url"]: r["state"] for r in res.results.collect()}
    # the redirected-to rules (Disallow /private/, Allow /private/open/) apply
    assert rows[server + "/private/x.html"] == "SKIPPED"
    assert rows[server + "/private/open/y.html"] == "OK"
    assert rows[server + "/ok.html"] == "OK"


def test_live_robots_5xx_disallows_all(spark, server, monkeypatch):
    """RFC 9309 §2.3.1.4: an unreachable robots.txt (5xx) means the policy
    cannot be read — the crawler MUST assume complete disallow rather than
    silently crawling disallowed paths: the whole host (seed included) is
    robots-SKIPPED and no page on it is ever requested."""
    page_hits = []

    def responder(self, method, path):
        if path == "/robots.txt":
            self.send_response(503)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return True
        page_hits.append(path)
        return False

    monkeypatch.setattr(_Handler, "_serve", _make_serve(responder))
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=4,
                       timeout=10_000, respect_robots=True)
    res = check_live(spark, cfg)
    rows = {r["url"]: r for r in res.results.collect()}
    seed = rows[server + "/"]
    assert seed["state"] == "SKIPPED"
    assert list(seed["failure_details"]) == ["robots.txt disallow"]
    # nothing on the host was fetched, so no links were ever discovered
    assert server + "/ok.html" not in rows
    assert page_hits == []


def test_live_robots_redirect_loop_disallows_all(spark, server, monkeypatch):
    """A robots.txt redirect chain past 5 hops is 'unreachable' (RFC 9309
    §2.3.1.2) -> treated as complete disallow, and the probe gives up
    rather than looping."""
    def responder(self, method, path):
        if path.startswith("/robots"):
            with _Handler.lock:
                _Handler.robots_hits += 1
            self.send_response(302)
            self.send_header("Location", "/robots.txt?hop")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return True
        return False

    _Handler.robots_hits = 0
    monkeypatch.setattr(_Handler, "_serve", _make_serve(responder))
    cfg = CheckOptions(paths=[server + "/"], recurse=True, concurrency=4,
                       timeout=10_000, respect_robots=True)
    res = check_live(spark, cfg)
    rows = {r["url"]: r["state"] for r in res.results.collect()}
    assert rows[server + "/"] == "SKIPPED"  # whole host disallowed
    assert _Handler.robots_hits <= 6  # initial fetch + 5 followed hops
