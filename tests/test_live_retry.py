"""Live-mode 429 retry choreography vs the table-join fetch — the
reference's retry semantics (test/test.retry.ts:177-221): a 429 with
`retry-after` requeues the link, sets a per-host delay that pauses other
URLs on that host (max-wins), and the retried fetch succeeds.

Both modes share the engine's virtual clock (no real sleeping): the live
server keys its 429-then-200 script on attempt count per (method, path),
exactly like the scripted pages table keys on `attempt`.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import LinkChecker, check_live
from linkinator_spark.sources.fixtures import SiteBuilder

ROOT_HTML = '<a href="/slow">s</a><a href="/mid">m</a>'
MID_HTML = '<a href="/other">o</a>'


class _RetryHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    counts: dict = {}
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def _serve(self, method):
        key = (method, self.path)
        with _RetryHandler.lock:
            n = _RetryHandler.counts.get(key, 0) + 1
            _RetryHandler.counts[key] = n
        if self.path == "/slow" and n == 1:
            # first attempt: 429 + retry-after (reference
            # test/test.retry.ts:177-189 shape)
            self.send_response(429)
            self.send_header("retry-after", "2")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        pages = {
            "/": ("text/html", ROOT_HTML),
            "/mid": ("text/html", MID_HTML),
            "/slow": ("text/html", "<p>finally</p>"),
            "/other": ("text/html", "<p>ok</p>"),
        }
        if self.path in pages:
            ct, body = pages[self.path]
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", ct)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if method == "GET":
                self.wfile.write(data)
            return
        self.send_response(404)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):
        self._serve("GET")

    def do_HEAD(self):
        self._serve("HEAD")


@pytest.fixture()
def retry_server():
    _RetryHandler.counts = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RetryHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _table_site(base):
    site = SiteBuilder()
    site.page(base + "/", html=ROOT_HTML)
    site.page(base + "/mid", html=MID_HTML)
    site.page(base + "/other", html="<p>ok</p>")
    # /slow: attempt 1 -> 429 retry-after 2s; attempt 2 -> 200 (leaf, so
    # the engine probes HEAD; script both methods like the live server)
    for m in ("HEAD", "GET"):
        site.script(base + "/slow", m, 1, 429,
                    headers={"retry-after": "2"})
        site.script(base + "/slow", m, 2, 200, html="<p>finally</p>")
    return site


def _rows(res):
    return {
        (r["url"], r["status"], r["state"], r["parent"])
        for r in res.results.select("url", "status", "state",
                                    "parent").collect()
    }


def test_live_429_retry_choreography_matches_table(spark, retry_server):
    cfg = CheckOptions(paths=[retry_server + "/"], recurse=True, retry=True,
                       concurrency=4, timeout=10_000)
    live = check_live(spark, cfg)

    pages, docs = _table_site(retry_server).build(spark)
    table = LinkChecker(spark).check(cfg, pages, docs)

    assert _rows(live) == _rows(table)
    assert live.passed and table.passed

    for res in (live, table):
        by_url = {r["url"]: (r["status"], r["state"])
                  for r in res.results.collect()}
        # the 429'd link retried to 200 OK
        assert by_url[retry_server + "/slow"] == (200, "OK")
        # a 'retry' event with the parsed delay was observed
        retries = [r for r in res.events.collect() if r["kind"] == "retry"]
        assert retries and retries[0]["url"] == retry_server + "/slow"
        assert float(retries[0]["detail"]) == 2.0
        # the per-host delay advanced the virtual clock to the deadline —
        # same-host URLs discovered later were gated behind it (J3 max-wins)
        assert res.clock >= 2.0

    # the live server saw exactly 2 attempts on /slow (429 then 200) and
    # exactly 1 on the gated same-host URL — no fetch raced the delay gate
    slow_hits = sum(n for (m, p), n in _RetryHandler.counts.items()
                    if p == "/slow")
    assert slow_hits == 2
    assert sum(n for (m, p), n in _RetryHandler.counts.items()
               if p == "/other") == 1
