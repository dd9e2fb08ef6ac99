"""Mid-wave resume without re-fetching (north_rule).

The wave commit is the durable boundary; live crawls additionally journal
each fetch stage's output intra-wave (WaveStore.commit_partial), so a crash
AFTER a wave's fetch materialized but BEFORE the wave committed resumes by
replaying the journal — already-fetched URLs are never re-requested. The
reference holds its whole queue in process memory and restarts from zero on
a crash (src/queue.ts); resumability is the north_rule's addition.

Both tests drive a real local HTTP server that counts every (method, path)
request, crash the crawl at a chosen point via monkeypatch, resume, and
assert (a) results are byte-identical to an uninterrupted baseline run and
(b) the TOTAL network request counts across crash + resume equal the
baseline's — zero re-fetches.
"""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import check_live
from linkinator_spark.sources import tableio
from linkinator_spark.sources.tableio import WaveStore

# three-wave site: / -> {/a, /b}, /a -> /c
PAGES = {
    "/": ("text/html", '<a href="/a">a</a><a href="/b">b</a>'),
    "/a": ("text/html", '<a href="/c">c</a>'),
    "/b": ("text/html", "<p>leaf</p>"),
    "/c": ("text/html", "<p>leaf</p>"),
}


ROBOTS_BODY = b"User-agent: *\nDisallow: /b\n"


class _CountingHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    counts: dict = {}
    lock = threading.Lock()

    def log_message(self, *a):
        pass

    def _serve(self, method):
        with _CountingHandler.lock:
            key = (method, self.path)
            _CountingHandler.counts[key] = (
                _CountingHandler.counts.get(key, 0) + 1)
        if self.path == "/robots.txt":
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(ROBOTS_BODY)))
            self.end_headers()
            if method == "GET":
                self.wfile.write(ROBOTS_BODY)
            return
        if self.path in PAGES:
            ct, body = PAGES[self.path]
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
def site():
    _CountingHandler.counts = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CountingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _cfg(base, ckpt, robots=False):
    return CheckOptions(paths=[base + "/"], recurse=True, concurrency=4,
                        timeout=10_000, checkpoint_dir=ckpt,
                        respect_robots=robots)


def _rows(res):
    return sorted(
        tuple(r) for r in res.results.select(
            "url", "status", "state", "parent", "wave").collect()
    )


def _snap_counts():
    with _CountingHandler.lock:
        out = dict(_CountingHandler.counts)
        _CountingHandler.counts = {}
    return out


def _run_crash_resume(spark, site, tmp_path, monkeypatch, crash,
                      robots=False):
    """Shared scaffold: baseline run, crashed run (crash() installs the
    bomb), resume run; assert identical results and identical TOTAL
    request counts (crash + resume == baseline)."""
    baseline = check_live(spark, _cfg(site, str(tmp_path / "ck_base"),
                                      robots))
    base_rows, base_counts = _rows(baseline), _snap_counts()
    if robots:
        # robots disallows /b (never fetched); robots.txt probed ONCE
        assert sum(n for (m, p), n in base_counts.items()
                   if p == "/robots.txt") == 1
        assert not any(p == "/b" for (m, p) in base_counts)
    else:
        # sanity on the fixture: three GET waves, four pages, no retries
        assert base_counts == {("GET", p): 1 for p in PAGES}

    cfg = _cfg(site, str(tmp_path / "ck_crash"), robots)
    with monkeypatch.context() as m:
        crash(m)
        with pytest.raises(RuntimeError, match="injected crash"):
            check_live(spark, cfg)

    resumed = check_live(spark, cfg, resume=True)
    assert _rows(resumed) == base_rows
    # the journal replay means the crash cost ZERO extra requests: the
    # combined crash+resume traffic equals one clean run
    assert _snap_counts() == base_counts
    assert resumed.passed


def test_crash_before_wave_commit_resumes_without_refetch(
        spark, site, tmp_path, monkeypatch):
    """Kill at the END of wave 1 (every fetch stage journaled, wave commit
    refused): resume replays wave 1's fetch journal — /a and /b are never
    re-requested — and completes waves 2+ normally."""

    real_commit = WaveStore.commit

    def crash(m):
        def bomb(self, wave, clock, dfs, metrics=None):
            if wave == 1:
                raise RuntimeError("injected crash before wave-1 commit")
            return real_commit(self, wave, clock, dfs, metrics)

        m.setattr(tableio.WaveStore, "commit", bomb)

    _run_crash_resume(spark, site, tmp_path, monkeypatch, crash)


def test_crash_right_after_fetch_journal_resumes_without_refetch(
        spark, site, tmp_path, monkeypatch):
    """Kill IMMEDIATELY after wave 1's fetch output is journaled (nothing
    downstream of the fetch ran): the narrowest mid-wave point. Resume
    must replay the journaled fetch rows and re-derive everything else."""

    real_partial = WaveStore.commit_partial

    def crash(m):
        def bomb(self, wave, name, df):
            out = real_partial(self, wave, name, df)
            if wave == 1 and name == "fetch":
                raise RuntimeError(
                    "injected crash after wave-1 fetch journal")
            return out

        m.setattr(tableio.WaveStore, "commit_partial", bomb)

    _run_crash_resume(spark, site, tmp_path, monkeypatch, crash)


def test_crash_resume_with_live_robots_never_reprobes_robots(
        spark, site, tmp_path, monkeypatch):
    """respect_robots live: rules ride the wave commit AND the intra-wave
    robots journal, so a crash + resume never re-contacts a known host
    for robots.txt (and the /b disallow holds identically across the
    resume)."""

    real_commit = WaveStore.commit

    def crash(m):
        def bomb(self, wave, clock, dfs, metrics=None):
            if wave == 1:
                raise RuntimeError("injected crash before wave-1 commit")
            return real_commit(self, wave, clock, dfs, metrics)

        m.setattr(tableio.WaveStore, "commit", bomb)

    _run_crash_resume(spark, site, tmp_path, monkeypatch, crash,
                      robots=True)


def test_partial_journal_store_contract(spark, tmp_path):
    """WaveStore intra-wave journal contract: atomic per-stage publish,
    re-publish overwrite, crash-leftover .tmp cleanup, clear on commit."""
    import os

    store = WaveStore(str(tmp_path / "ck"))
    df = spark.range(5).withColumnRenamed("id", "url")

    out = store.commit_partial(3, "fetch", df)
    assert out.count() == 5
    loaded = store.load_partials(spark, 3)
    assert set(loaded) == {"fetch"} and loaded["fetch"].count() == 5

    # re-publish overwrites atomically (replay-over-rewrite path)
    store.commit_partial(3, "fetch", df.limit(2))
    assert store.load_partials(spark, 3)["fetch"].count() == 2

    # a crash mid-write leaves only a .tmp dir: ignored and cleaned
    tmp_leftover = os.path.join(store._partial_dir(3), "lg.tmp")
    os.makedirs(tmp_leftover)
    loaded = store.load_partials(spark, 3)
    assert set(loaded) == {"fetch"}
    assert not os.path.exists(tmp_leftover)

    # lineage sidecar recorded per stage
    assert os.path.exists(
        os.path.join(store._partial_dir(3), "fetch.lineage.json"))

    store.clear_partials(3)
    assert store.load_partials(spark, 3) == {}
