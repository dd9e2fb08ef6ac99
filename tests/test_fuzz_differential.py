"""Property-based differential fuzzing (SURVEY §5 model, verdict item 7).

Two independent implementations of the crawl semantics are run over ≥200
seeded random (web graph × option matrix) cases and must agree on the
result set:

* ``run_crawl_fused`` — the engine's wave-batched control flow
  (operators/wave_fused.py), pure Python, proven identical to the staged
  DataFrame engine by tests/test_wave_fused.py::test_gears_identical.
* ``simulate_fifo`` — a from-scratch single-threaded FIFO crawler written
  the way the reference executes (one link at a time off a queue,
  src/queue.ts:69-97 + src/index.ts:344-604), sharing only the leaf
  request/classify helpers.

The differential axis is the control flow — wave batching, URL-seen and
edge dedup, duplicate re-report, recursion gating — which is where crawler
bugs live. Fetch choreography equivalence (chain resolver vs hop loop) is
separately pinned by tests/test_redirect_chain.py.

Pure Python on both sides: all 200+ cases run in seconds, no Spark.
"""

from __future__ import annotations

import random
from collections import deque
from types import SimpleNamespace

from linkinator_spark.config import CheckOptions, LinkState
from linkinator_spark.functions.extract import make_candidate_links_udf
from linkinator_spark.functions.urls import url_host_py
from linkinator_spark.operators.fetch import _make_py_skip, make_fused_fetcher
from linkinator_spark.operators.wave_fused import (
    _CSS_RE_PY, _HTML_RE_PY, classify_py, run_crawl_fused,
)
from linkinator_spark.sources.fixtures import SiteBuilder

import re

import pandas as pd


# --------------------------------------------------------------- site maps

def _site_maps(site: SiteBuilder):
    """Python twins of build_chain_map/build_docs_map over a SiteBuilder
    (no Spark)."""
    cmap: dict = {}
    for (url, _host, method, attempt, status, headers, ct, body_doc,
         final) in site._pages:
        cmap.setdefault((url, method), []).append((
            attempt, status, headers.get("location"),
            headers.get("retry-after"),
            headers.get("cf-mitigated") is not None,
            headers.get("content-type") or ct or "",
            body_doc or "", final,
        ))
    for v in cmap.values():
        v.sort(key=lambda t: t[0])
    docs = {}
    for doc_id, spans in site._docs:
        docs[doc_id] = [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in spans
        ]
    return cmap, docs


# ------------------------------------------------- sequential FIFO reference

def simulate_fifo(site: SiteBuilder, cfg: CheckOptions, with_order=False):
    """Single-threaded reference-semantics crawl: one link at a time off a
    FIFO queue, exactly the reference's per-link flow. Returns the result
    set {(url, status, state, parent)} including duplicate-link BROKEN
    re-reports; with ``with_order`` also returns {host: [urls in queue-pop
    order]} — the reference's per-host fetch ordering (north_rule)."""
    cmap, docs_map = _site_maps(site)
    fetcher = make_fused_fetcher(SimpleNamespace(value=cmap), cfg)
    skip_fn = _make_py_skip(cfg.links_to_skip)
    extract = make_candidate_links_udf(cfg.check_css, cfg.markdown)

    seeds = []
    seen_seed = set()
    for p in cfg.paths:
        if p not in seen_seed:
            seen_seed.add(p)
            seeds.append(p)
    seen = set(seeds)
    # each queue item carries its recursion root (inherited from the seed
    # that discovered it, src/index.ts:786-798)
    queue = deque((u, True, None, u) for u in seeds)
    results = []          # (url, status, state, parent)
    pending_dups = []     # (url, parent) duplicate edges
    edges_seen = set()
    order: dict = {}      # host -> urls in pop order (http urls only)

    while queue:
        url, crawl, parent, root = queue.popleft()
        if not re.match(r"^https?://", url):
            results.append((url, 0, LinkState.SKIPPED, parent))
            continue
        order.setdefault(url_host_py(url), []).append(url)
        if skip_fn is not None and skip_fn(url):
            results.append((url, None, LinkState.SKIPPED, parent))
            continue
        f = fetcher([{"url": url, "crawl": crawl, "attempt": 1}])[0]
        if f["redirect_skipped"] is not None:
            results.append((url, None, LinkState.SKIPPED, parent))
            continue
        has_body = (f["has_response"] and f["method_effective"] == "GET"
                    and f["body_doc_id"] != "")
        state, _details, _evs = classify_py(
            cfg, url, f["status"], f["has_response"], has_body,
            f["final_url"], f["location"], f["cf_mitigated"],
            f["fetch_failures"])
        results.append((url, f["status"], state, parent))
        is_html = bool(_HTML_RE_PY.search(f["content_type"] or ""))
        is_css = bool(_CSS_RE_PY.search(f["content_type"] or ""))
        if not (crawl and has_body
                and (is_html or (is_css and cfg.check_css))):
            continue
        base = f["final_url"] if f["final_url"] is not None else url
        spans = docs_map.get(f["body_doc_id"])
        pdf = pd.DataFrame(
            [(url, base, "css" if is_css else "html", spans)],
            columns=["page_url", "base_url", "content_kind", "spans"])
        for cpdf in extract([pdf]):
            for c in cpdf.to_dict("records"):
                if c["parse_error"] is not None:
                    results.append((c["raw_link"], 0, LinkState.BROKEN, url))
                    continue
                uwf = c["url_with_fragment"]
                if (skip_fn is not None and uwf is not None
                        and re.match(r"^https?://", uwf) and skip_fn(uwf)):
                    results.append((uwf, None, LinkState.SKIPPED, url))
                    continue
                child = c["resolved_url"]
                if (child, url) in edges_seen:
                    continue
                edges_seen.add((child, url))
                if child in seen:
                    pending_dups.append((child, url))
                    continue
                seen.add(child)
                # same-prefix + same-host recursion predicate against the
                # item's inherited root (src/index.ts:786-798)
                child_crawl = (
                    bool(cfg.recurse) and child.startswith(root)
                    and url_host_py(child) == url_host_py(root)
                )
                queue.append((child, child_crawl, url, root))

    # duplicate-link BROKEN re-report (src/index.ts:840-875)
    broken = {(u, s, st) for (u, s, st, _p) in results
              if st == LinkState.BROKEN and "#" not in u}
    by_url = {u: (s, st) for (u, s, st) in broken}
    for (u, p) in pending_dups:
        if u in by_url:
            s, st = by_url[u]
            results.append((u, s, st, p))
    if with_order:
        return set(results), order
    return set(results)


# ------------------------------------------------------------ random sites

STATUS_POOL = [200, 200, 200, 200, 404, 500, 301, 302, 303, 307, 999, 403,
               405, 410, 204]


def _random_site(rng: random.Random, n_pages: int):
    base = "http://fuzz.test"
    urls = [f"{base}/p{i}" for i in range(n_pages)]
    ext = [f"http://ext{i}.example/x" for i in range(3)]
    site = SiteBuilder()
    scripted = set()
    for i, u in enumerate(urls):
        st = 200 if i == 0 else rng.choice(STATUS_POOL)
        if st in (301, 302, 303, 307):
            # redirect somewhere (maybe a loop, maybe relative)
            tgt = rng.choice(urls + ext + [f"/p{rng.randrange(n_pages)}",
                                           "rel" + str(rng.randrange(5))])
            site.redirect(u, tgt, status=st)
            scripted.add(u)
            continue
        n_links = rng.randrange(0, 5)
        links = [rng.choice(urls + ext + ["/frag#sec" + str(rng.randrange(3)),
                                          "bad://u r l"])
                 for _ in range(n_links)]
        html = "".join(f'<a href="{x}">l</a>' for x in links)
        if rng.random() < 0.15:
            html += f'<img src="{rng.choice(urls)}">'
        if st == 403 and rng.random() < 0.5:
            site.page(u, html=html, status=st,
                      headers={"cf-mitigated": "challenge"})
        elif st == 405:
            site.script(u, "HEAD", 1, 405)
            site.script(u, "GET", 1, 200, html=html)
        else:
            site.page(u, html=html, status=st)
        scripted.add(u)
    # a few dangling targets referenced but never scripted happen naturally
    # (rng may pick ext hosts); script some of the ext hosts
    for e in ext[:2]:
        site.page(e, html="<p>ok</p>")
    return site, urls[0]


def _random_cfg(rng: random.Random, seed_url: str) -> CheckOptions:
    kw = {}
    if rng.random() < 0.3:
        kw["redirects"] = rng.choice(["allow", "warn", "error"])
    if rng.random() < 0.25:
        kw["require_https"] = rng.choice(["warn", "error"])
    if rng.random() < 0.3:
        kw["status_codes"] = rng.choice([
            {"404": "warn"}, {"5xx": "skip"}, {"410": "ok", "4xx": "error"},
            {"999": "error"},
        ])
    if rng.random() < 0.3:
        kw["links_to_skip"] = rng.choice([
            [r"/p1\b"], [r"ext0"], [r"/p[23]$"],
        ])
    if rng.random() < 0.2:
        kw["check_css"] = True
    return CheckOptions(paths=[seed_url], recurse=rng.random() < 0.85, **kw)


N_CASES = 240


def _random_retry_site(rng: random.Random, n_pages: int):
    """Random site exercising the retry + fragment machinery: 429s with
    retry-after that succeed on attempt 2, transient 500s, fragment links
    against pages with (sometimes missing) anchor ids."""
    base = "http://retryfuzz.test"
    urls = [f"{base}/p{i}" for i in range(n_pages)]
    site = SiteBuilder()
    for i, u in enumerate(urls):
        links = []
        for _ in range(rng.randrange(1, 4)):
            t = rng.randrange(n_pages)
            if rng.random() < 0.3:
                links.append(f"/p{t}#sec{rng.randrange(3)}")
            else:
                links.append(f"/p{t}")
        anchors = "".join(f'<h2 id="sec{j}">h</h2>'
                          for j in range(rng.randrange(0, 3)))
        html = anchors + "".join(f'<a href="{x}">l</a>' for x in links)
        if i == 0:
            site.page(u, html=html)
        elif rng.random() < 0.25:
            # 429 with retry-after, healed on attempt 2 (both methods —
            # leaves probe HEAD); all three parseRetryAfter forms appear
            n = rng.randrange(1, 4)
            ra = rng.choice([
                str(n), f"{n}s", f"1m{n}s",
                f"Thu, 01 Jan 1970 00:00:0{n} GMT",
            ])
            for m in ("HEAD", "GET"):
                site.script(u, m, 1, 429, headers={"retry-after": ra})
                site.script(u, m, 2, 200, html=html)
        elif rng.random() < 0.15:
            # transient 500, healed on attempt 2 (retry_errors path)
            for m in ("HEAD", "GET"):
                site.script(u, m, 1, 500)
                site.script(u, m, 2, 200, html=html)
        elif rng.random() < 0.1:
            site.page(u, html=html, status=404)
        else:
            site.page(u, html=html)
    return site, urls[0]


def test_fuzz_retry_fragments_fused_vs_staged(spark):
    """Differential fuzz on random retry/fragment sites: the fully-fused
    python gear (default for these crawls) vs a staged leg, alternating
    the staged fetch strategy per case — broadcast chain map (even cases)
    and the iterative hop loop (odd cases) — so all three execution paths
    of the retry machinery face random choreography. Identical result
    sets and verdicts required.

    A staged retry crawl is Catalyst-latency-bound (~40 s at fixture
    scale), so the default case count is small; raise LK_FUZZ_RETRY_CASES
    for a deep sweep."""
    import os

    from linkinator_spark.operators.crawler import LinkChecker

    for case in range(int(os.environ.get("LK_FUZZ_RETRY_CASES", "3"))):
        rng = random.Random(20_000 + case)
        site, seed = _random_retry_site(rng, rng.randrange(4, 8))
        kw = {"retry": True, "check_fragments": rng.random() < 0.7}
        if rng.random() < 0.5:
            kw["retry_errors"] = True
            kw["retry_errors_count"] = 1
        staged_knob = ({"fused_docs_max_bytes": 0} if case % 2 == 0
                       else {"chain_map_max_rows": 0})
        # third leg: URL-seen pre-filter forced on from wave 0, alternating
        # backends — retry requeues + fragment refetches must not be
        # perturbed by either filter (results identical to filter-off)
        filter_knob = {"use_bloom": True, "bloom_min_frontier": 0,
                       "bloom_expected": 4096,
                       "seen_filter": "cuckoo" if case % 2 else "bloom"}
        outs = []
        for knobs in ({}, staged_knob, filter_knob):
            pages, docs = site.build(spark)
            cfg = CheckOptions(paths=[seed], recurse=True, **kw, **knobs)
            res = LinkChecker(spark).check(cfg, pages, docs)
            rows = sorted(
                (r["url"], r["status"], r["state"], r["parent"],
                 tuple(r["failure_details"] or []))
                for r in res.results.collect())
            outs.append((rows, res.passed))
        assert outs[0] == outs[1], f"case {case} diverged (seed {20_000+case})"
        assert outs[0] == outs[2], (
            f"case {case} diverged under {filter_knob['seen_filter']} "
            f"seen-filter (seed {20_000+case})")


def test_fuzz_engine_vs_fifo_reference():
    """≥200 seeded random graph/option cases: the engine's wave-batched
    semantics (run_crawl_fused, == staged engine by gear-equivalence) must
    produce the same result SET as the sequential FIFO reference
    simulator. Zero divergences allowed."""
    from linkinator_spark.operators.crawler import LinkChecker

    divergences = []
    for case in range(N_CASES):
        rng = random.Random(10_000 + case)
        site, seed_url = _random_site(rng, rng.randrange(4, 12))
        cfg = _random_cfg(rng, seed_url)

        cmap, docs_map = _site_maps(site)
        extract = make_candidate_links_udf(cfg.check_css, cfg.markdown)
        seeds = LinkChecker._seed_frontier(
            SimpleNamespace(spark=None), cfg)  # staticmethod-style reuse
        res_rows, _ev, dup_rows, _w, _clock = run_crawl_fused(
            seeds, cmap, docs_map, cfg, extract)
        engine = {(u, s, st, p) for (u, s, st, p, _d, _h, _sq, _w2)
                  in res_rows}
        # engine-side dup re-report twin (crawler._finalize)
        by_url = {u: (s, st) for (u, s, st, _p) in engine
                  if st == LinkState.BROKEN and "#" not in u}
        for (u, p) in dup_rows:
            if u in by_url:
                s, st = by_url[u]
                engine.add((u, s, st, p))

        fifo = simulate_fifo(site, cfg)
        if engine != fifo:
            divergences.append((case, engine - fifo, fifo - engine))
            if len(divergences) >= 3:
                break
    assert not divergences, (
        f"{len(divergences)} divergent cases; first: {divergences[0]}")


# --------------------------------------- per-host ORDER parity (north_rule)

def _random_multiseed_site(rng: random.Random):
    """Seeds on 2-3 different hosts whose subtrees link into SHARED check
    hosts — the shape where per-host ordering depends on cross-subtree
    interleaving. This is where a per-host (rather than global) FIFO rank
    ties and diverges from the reference queue order."""
    n_seed_hosts = rng.randrange(2, 4)
    hosts = [f"http://s{i}.test" for i in range(n_seed_hosts)]
    shared = [f"http://shared{j}.example/t{k}"
              for j in range(2) for k in range(4)]
    site = SiteBuilder()
    pages_per_host = rng.randrange(2, 5)
    for h in hosts:
        for p in range(pages_per_host):
            links = []
            if p + 1 < pages_per_host and rng.random() < 0.9:
                links.append(f"/p{p + 1}")          # crawl chain stays on-host
            for _ in range(rng.randrange(1, 4)):
                links.append(rng.choice(shared))     # contended check links
            if rng.random() < 0.3:
                links.append(rng.choice(hosts) + "/p0")  # cross-seed dup
            html = "".join(f'<a href="{x}">l</a>' for x in links)
            url = f"{h}/" if p == 0 else f"{h}/p{p}"
            site.page(url, html=html,
                      status=404 if rng.random() < 0.1 else 200)
    for s in shared:
        if rng.random() < 0.8:
            site.page(s, html="<p>t</p>")
        # else: unscripted -> BROKEN 0
    seeds = [f"{h}/" for h in hosts]
    rng.shuffle(seeds)
    return site, seeds


def _engine_order(res_rows):
    """{host: [urls by seq]} from run_crawl_fused result rows (rows with
    host '' never occupied a queue slot: parse errors / pre-enqueue skips)."""
    per_host: dict = {}
    for (url, _s, _st, _p, _d, host, seq, _w) in res_rows:
        if host:
            per_host.setdefault(host, []).append((seq, url))
    return {h: [u for _, u in sorted(v)] for h, v in per_host.items()}


def test_fuzz_multiseed_per_host_order_matches_fifo_reference():
    """≥80 seeded multi-host-seed cases: the engine's per-host fetch order
    (sorted by seq) must equal the sequential FIFO reference's queue-pop
    order per host — not just the result set. Guards the global-FIFO seq
    rank against regressing to a per-host rank (whose cross-host ties
    break reference ordering)."""
    from linkinator_spark.operators.crawler import LinkChecker

    divergences = []
    for case in range(80):
        rng = random.Random(30_000 + case)
        site, seeds = _random_multiseed_site(rng)
        cfg = CheckOptions(paths=seeds, recurse=True)

        cmap, docs_map = _site_maps(site)
        extract = make_candidate_links_udf(cfg.check_css, cfg.markdown)
        seed_rows = LinkChecker._seed_frontier(
            SimpleNamespace(spark=None), cfg)
        res_rows, _ev, _dups, _w, _clock = run_crawl_fused(
            seed_rows, cmap, docs_map, cfg, extract)
        engine = _engine_order(res_rows)

        _fifo_set, ref = simulate_fifo(site, cfg, with_order=True)
        if engine != ref:
            diff = {h: (engine.get(h), ref.get(h))
                    for h in set(engine) | set(ref)
                    if engine.get(h) != ref.get(h)}
            divergences.append((case, diff))
            if len(divergences) >= 3:
                break
    assert not divergences, (
        f"{len(divergences)} order-divergent cases; first: {divergences[0]}")


def _random_robots_site(rng: random.Random):
    """Random multi-host site where each host carries a random robots.txt:
    0-3 Disallow prefixes, an occasional longer Allow override, an
    occasional Crawl-delay, an occasional specific-user-agent group, and
    sometimes a missing or 500 robots.txt (-> no rules)."""
    hosts = [f"http://r{c}.test" for c in "abc"[:rng.randrange(2, 4)]]
    # path shapes chosen so prefix semantics bite: /p1 vs /p1a vs /p1a/x
    paths = ["/", "/p1", "/p1a", "/p1a/x", "/p2", "/p2/y", "/q3"]
    all_urls = [h + p for h in hosts for p in paths]
    site = SiteBuilder()
    for u in all_urls:
        links = [rng.choice(all_urls) for _ in range(rng.randrange(1, 4))]
        html = "".join(f'<a href="{x}">l</a>' for x in links)
        site.page(u, html=html,
                  status=404 if rng.random() < 0.1 else 200)
    for h in hosts:
        r = rng.random()
        if r < 0.15:
            continue                       # no robots.txt scripted at all
        if r < 0.25:
            site.page(h + "/robots.txt", status=500,
                      content_type="text/plain")   # error -> no rules
            continue
        lines = []
        if rng.random() < 0.3:
            # a non-matching specific group first: must be ignored
            lines += ["User-agent: otherbot", "Disallow: /"]
        lines.append("User-agent: *")
        for _ in range(rng.randrange(0, 4)):
            lines.append("Disallow: " + rng.choice(
                ["/p1", "/p1a", "/p2", "/q", "/p2/y", "/"]))
        if rng.random() < 0.4:
            lines.append("Allow: " + rng.choice(["/p1a", "/p2/y", "/p1a/x"]))
        if rng.random() < 0.3:
            lines.append(f"Crawl-delay: {rng.randrange(1, 3)}")
        site.page(h + "/robots.txt", content_type="text/plain",
                  html="\n".join(lines))
    return site, hosts[0] + "/"


def test_fuzz_robots_fused_vs_staged(spark):
    """Differential fuzz on random robots rulesets x random multi-host
    graphs: the fully-fused gear (default for robots crawls) vs the staged
    DataFrame engine must agree row-for-row on results AND verdict —
    including which URLs are SKIPPED by robots, prefix/Allow overrides,
    ignored non-matching user-agent groups, and broken robots.txt.

    Staged robots crawls pay Catalyst latency per wave, so the default
    case count is small; raise LK_FUZZ_ROBOTS_CASES for a deep sweep."""
    import os

    from linkinator_spark.operators.crawler import LinkChecker

    robots_bit = False
    for case in range(int(os.environ.get("LK_FUZZ_ROBOTS_CASES", "3"))):
        rng = random.Random(30_000 + case)
        site, seed = _random_robots_site(rng)
        outs = []
        for knobs in ({}, {"fused_docs_max_bytes": 0}):
            pages, docs = site.build(spark)
            cfg = CheckOptions(paths=[seed], recurse=True,
                               respect_robots=True, **knobs)
            res = LinkChecker(spark).check(cfg, pages, docs)
            rows = sorted(
                (r["url"], r["status"], r["state"], r["parent"],
                 tuple(r["failure_details"] or []))
                for r in res.results.collect())
            outs.append((rows, res.passed))
        assert outs[0] == outs[1], f"case {case} diverged (seed {30_000+case})"
        robots_bit = robots_bit or any(
            "robots" in " ".join(r[4]) for r in outs[0][0])
    # the sweep is vacuous if no seed ever produced a robots skip
    assert robots_bit, "no random ruleset ever bit — regen the seeds"
