"""Job configuration — the Spark-side equivalent of linkinator's CheckOptions.

Reference: /root/reference/src/options.ts:13-45 (field inventory and defaults),
/root/reference/src/index.ts:256-288 (runtime defaults: concurrency 100,
retryErrorsCount 5, retryErrorsJitter 3000).

The reference allows user *functions* for linksToSkip / fragmentsToSkip
(options.ts:20,36-38). In the distributed engine those are regex lists by
default; a user-supplied predicate is accepted as a plain Python callable and
shipped inside the vectorized skip UDF (Arrow-batched, never per-row Spark
Python UDF).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


class LinkState:
    """Reference: /root/reference/src/index.ts:94-98 (same literals)."""

    OK = "OK"
    BROKEN = "BROKEN"
    SKIPPED = "SKIPPED"


# statusCodes action values — reference src/options.ts StatusCodeAction
STATUS_ACTIONS = ("ok", "warn", "skip", "error")

# seq = (wave+1) * SEQ_WAVE_STRIDE + global FIFO rank within the wave.
# The stride must exceed any single wave's row count: the rank is GLOBAL
# (reference queue position), so at a 10^10-URL frontier a wave can pass
# 10^9 rows — 10^12 slots per wave leaves max_waves=1000 waves * 10^12
# = 10^15, comfortably inside int64. Both execution gears share this
# constant (staged crawler tail + fused loop).
SEQ_WAVE_STRIDE = 1_000_000_000_000


@dataclass
class CheckOptions:
    # seed URLs (already URL-form; the reference's glob/local-path expansion is
    # a driver-side concern handled by sources.seeds)
    paths: list[str] = field(default_factory=list)

    concurrency: int = 100
    recurse: bool = False
    timeout: int = 0          # ms; live-HTTP request deadline (0 = 30s default)
    insecure: bool = False    # live-HTTP: skip TLS verification
    # extra request headers, user keys win (reference options.ts:30 headers,
    # cli.ts:220-233 --header "Name: value")
    headers: dict[str, str] = field(default_factory=dict)
    # pin the modeled static-server port (reference options.ts:15 port;
    # the reference binds it for real, we bake it into the synthetic origin)
    port: int | None = None

    # skip rules: list of regex strings OR a callable str->bool
    links_to_skip: list[str] | Callable[[str], bool] | None = None
    # fragment skip rules: list of regex OR callable (fragment, url)->bool
    fragments_to_skip: list[str] | Callable[[str, str], bool] | None = None

    # retry machinery (reference src/index.ts:1019-1109)
    retry: bool = False                 # 429 + retry-after
    retry_errors: bool = False          # 5xx / status-0 / 429-sans-header
    retry_errors_count: int = 5
    retry_errors_jitter: int = 3000     # ms

    # 'allow' | 'warn' | 'error'  (reference src/options.ts:111, index.ts:524-576)
    redirects: str = "allow"
    # 'off' | 'warn' | 'error'    (reference src/index.ts:578-604)
    require_https: str = "off"

    check_css: bool = False
    check_fragments: bool = False

    # map of "403"/"4xx"-style pattern -> action (reference src/index.ts:1339-1361)
    status_codes: dict[str, str] = field(default_factory=dict)

    # [(search_regex, replacement)] (reference src/index.ts:310-318)
    url_rewrite: list[tuple[str, str]] = field(default_factory=list)

    # markdown handling: spans of kind 'markdown' compiled to HTML before
    # extraction (reference serves md via marked: src/server.ts:147-165)
    markdown: bool = True

    # local static server host exemption for require_https
    # (reference src/index.ts:580-583)
    static_http_server_host: str | None = None

    # local-path mode (sources/localfs.py; reference src/options.ts:117-190
    # + src/server.ts). server_root anchors glob expansion and the modeled
    # static server; synthetic_server_root restores filesystem paths in
    # reports (mapUrl, src/index.ts:1148-1176)
    server_root: str | None = None
    synthetic_server_root: str | None = None
    directory_listing: bool = False
    clean_urls: bool = False

    # robots.txt politeness (north_star addition; reference has none)
    respect_robots: bool = False
    user_agent: str = "linkinator-spark"

    # engine knobs (ours — scale controls, no reference analog)
    max_waves: int = 1000
    per_host_budget: int | None = None   # max fetches per host per wave (politeness)
    bloom_expected: int = 10_000_000     # URL-seen Bloom pre-filter sizing
    bloom_fpp: float = 0.01
    use_bloom: bool = True
    # the pre-filter only pays once the frontier is large; below this many
    # frontier rows the exact anti-join alone is cheaper (set 0 to force the
    # Bloom path on, e.g. in tests)
    bloom_min_frontier: int = 200_000
    # which URL-seen pre-filter backs the J2 fast path once the frontier
    # crosses bloom_min_frontier: "bloom" (default — fixed-size bitmaps
    # regardless of key count) or "cuckoo" (operators/cuckoo.py — ~4
    # bytes/key at fpp ~0.012%, supports deletion for recrawl windows).
    # Either way the exact anti-join verifies the maybe-seen slice, so the
    # crawl result set is identical for both (and for use_bloom=False).
    seen_filter: str = "bloom"
    salt_hot_host_threshold: int = 50_000  # frontier rows per host before salting
    # scripted-pages rows above which the redirect chain map (built
    # executor-side, but broadcast as one driver dict; test-mode
    # convenience) is skipped for the iterative hop loop. 200k entries is
    # ~tens of MB of Python objects — a safe broadcast
    chain_map_max_rows: int = 200_000
    # byte-size gate for the fused gears' docs broadcast (the row gate
    # above bounds count, not body size); exceeded -> staged path
    fused_docs_max_bytes: int = 256 * 1024 * 1024
    # safety valve for the fully-fused gear's driver-side state: the input
    # gates bound PAGES and DOC BYTES, but result/edge counts grow with
    # links-per-page during the crawl. Crossing this mid-crawl aborts the
    # gear and re-runs the whole crawl on the staged path (idempotent —
    # the fused loop has no side effects)
    fused_max_result_rows: int = 2_000_000
    checkpoint_dir: str | None = None    # wave-state checkpoints (resume)
    # Iceberg catalog name for wave-state checkpoints (atomic snapshot
    # commits + VERSION AS OF resume); needs the iceberg-spark runtime on
    # the cluster. Mutually exclusive with checkpoint_dir; wins if set.
    checkpoint_catalog: str | None = None
    seed: int = 42                       # deterministic jitter seed

    def has_skip_rules(self) -> bool:
        """Reference src/index.ts:929-935."""
        if callable(self.links_to_skip):
            return True
        return bool(self.links_to_skip)
