"""Fused execution gears for small waves and small scripted crawls.

Fixture-scale crawls and the tail waves of a big crawl are driver-latency
bound: a 4-row frontier still pays ~300 Catalyst plan nodes, ~17 AQE query
stages / broadcast builds and several physical-planning passes per wave in
the staged pipeline (measured ~9-12 s/wave at sf0.001 regardless of shuffle
partitioning or codegen mode — the cost is plan handling, not tasks). This
module provides two progressively fused gears; the staged pipeline in
operators/crawler.py remains the at-scale path and the semantics reference:

* ``run_wave_fused`` — ONE ``mapInPandas`` stage per wave covering the
  per-row pipeline (pre-fetch skip, scripted request choreography, content
  sniff, classification, link extraction, within-wave edge dedup). The
  cross-wave relational state (URL-seen anti-join, relationship-edge
  anti-join, politeness rank) stays in DataFrame land
  (crawler._candidates_tail).
* ``run_crawl_fused`` — the whole wave LOOP in vectorized Python over the
  same broadcast-sized maps, for crawls whose entire scripted web already
  fits the chain-map gate (cfg.chain_map_max_rows). This is the shape of
  the reference itself — a single-node loop — applied exactly where the
  input is single-node sized; state (seen set, edge set) is bounded by the
  gated table size, never by frontier scale. Retry and fragment crawls DO
  take this gear (virtual clock, per-host delay gate, 429/backoff requeues
  with a bit-exact xxhash64 jitter twin, pending-fragment validation —
  each a python twin of its staged branch), and so do robots-aware crawls
  (longest-prefix allow/disallow twin over the per-host rules dim).
  Checkpointed, per-host-budget, url-rewrite and live crawls never take
  this gear.

Semantics parity, piece by piece:
* request choreography: `fetch.make_fused_fetcher` — python twins of
  `request()` + `follow_redirects_chain` + the crawler's 405/last-gasp
  blocks (reference src/index.ts:344-417, 1185-1286).
* classification: `classify_py`, a line-for-line twin of
  operators/classify.py (src/index.ts:482-604).
* extraction: calls the SAME `make_candidate_links_udf` batch fn the
  staged plan uses — zero duplicated extraction semantics.
* edge dedup + URL-seen + politeness seq: twins of the staged
  `w_edge`/`w_url` windows and `_candidates_tail`
  (src/index.ts:800-875, SURVEY §2.6).

Equivalence between the gears is asserted by tests/test_wave_fused.py
(same crawl forced down each path must produce identical result sets) and
by the driver's crawl oracles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from linkinator_spark.config import (CheckOptions, LinkState,
                                     SEQ_WAVE_STRIDE)
from linkinator_spark.operators.fetch import _make_py_skip

_HTML_RE_PY = re.compile("text/html|application/xhtml\\+xml")
_CSS_RE_PY = re.compile("text/css")

TAGGED_SCHEMA = (
    "t string, url string, status int, state string, parent string, "
    "failure_details array<string>, host string, seq long, "
    "kind string, detail string, "
    "resolved_url string, page_url string, cand_crawl boolean, "
    "child_host string, parent_seq long, ordinal int, root_path string"
)


def docs_bytes_ok(documents: DataFrame, max_bytes: int) -> bool:
    """Byte-size gate for the docs broadcast: the chain-map row gate bounds
    COUNT, but 200k documents of long bodies could still be gigabytes.
    One JVM-side aggregate over span text lengths; the fused gears are
    skipped (staged path taken) when the estimated map exceeds
    `max_bytes`."""
    from pyspark.sql import functions as F

    row = documents.select(
        F.sum(F.expr(
            "aggregate(spans, 0L, (a, s) -> "
            "a + length(s.text) + length(s.media_ref) + 64)")).alias("b")
    ).collect()[0]
    return int(row["b"] or 0) <= max_bytes


def build_docs_map(documents: DataFrame):
    """{doc_id: [span dicts]} via executor-side ``tree_fold`` (same shape
    as build_chain_map — the driver receives merged fragments, never
    rows). Spans become the same dict shape Arrow hands the staged
    extraction UDF."""
    from linkinator_spark.plans.treefold import tree_fold

    src = documents.select("doc_id", "spans")

    def _fold(acc: dict, pdf) -> dict:
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            acc[doc_id] = [
                {"kind": s["kind"], "text": s["text"],
                 "media_ref": s["media_ref"],
                 "offset": None if s["offset"] is None else int(s["offset"])}
                for s in (spans if spans is not None else [])
            ]
        return acc

    def _merge(acc: dict, other: dict) -> dict:
        acc.update(other)
        return acc

    return tree_fold(src, dict, _fold, _merge)


def status_code_action_py(status: int, status_codes: dict) -> str | None:
    """Twin of classify.status_code_action: exact keys first, then 'Nxx'
    wildcards (first wildcard in config order wins)."""
    if not status_codes:
        return None
    for pattern, action in status_codes.items():
        if not (pattern.endswith("xx") and len(pattern) == 3):
            if status == int(pattern):
                return action
    for pattern, action in status_codes.items():
        if pattern.endswith("xx") and len(pattern) == 3:
            if status // 100 == int(pattern[0]):
                return action
    return None


def classify_py(cfg: CheckOptions, url: str, status: int, has_response: bool,
                has_body: bool, final_url: str | None, location: str | None,
                cf_mitigated: bool, fetch_failures: list):
    """Twin of operators/classify.classify for one row. Returns
    (state, failure_details, ev_status_warn, ev_redirect, ev_http_insecure).
    """
    is_2xx = 200 <= status < 300
    is_redir = 300 <= status < 400
    url_changed = final_url is not None and final_url != url
    followed = url_changed or (is_redir and has_body)
    action = status_code_action_py(status, cfg.status_codes)
    nonstandard_ok = is_redir and followed and has_body

    if cfg.redirects == "error":
        mode_state = (LinkState.BROKEN if is_redir else
                      LinkState.OK if (is_2xx or nonstandard_ok)
                      else LinkState.BROKEN)
    else:
        mode_state = (LinkState.OK if (is_2xx or nonstandard_ok)
                      else LinkState.BROKEN)

    if action == "ok" or action == "warn":
        state = LinkState.OK
    elif action == "skip":
        state = LinkState.SKIPPED
    elif action == "error":
        state = LinkState.BROKEN
    elif status == 999:
        state = LinkState.SKIPPED
    elif status == 403 and cf_mitigated:
        state = LinkState.SKIPPED
    else:
        state = mode_state

    is_http = url.startswith("http://")
    if cfg.static_http_server_host:
        is_http = is_http and not url.startswith(cfg.static_http_server_host)
    https_detail = None
    if cfg.require_https == "error":
        if is_http:
            state = LinkState.BROKEN
            https_detail = (f"Error: HTTP link detected ({url}) but HTTPS "
                            f"is required")
    redirect_err_detail = None
    if cfg.redirects == "error" and is_redir:
        redirect_err_detail = (
            f"Error: Redirect detected ({url}"
            + (f" to {location}" if location is not None else "")
            + ") but redirects are disabled")
    response_detail = None
    if state == LinkState.BROKEN and has_response:
        response_detail = f"HttpResponse(status={status})"

    details = list(fetch_failures or []) + [
        d for d in (redirect_err_detail, response_detail, https_detail)
        if d is not None
    ]
    ev_status_warn = action == "warn"
    ev_redirect = cfg.redirects == "warn" and (is_redir or followed)
    ev_http_insecure = cfg.require_https == "warn" and is_http
    return state, details, (ev_status_warn, ev_redirect, ev_http_insecure)


_EPS_PY = 1e-9  # crawler._EPS twin


class FusedCapExceeded(Exception):
    """Raised by run_crawl_fused when driver-side state (results, edges,
    seen) outgrows cfg.fused_max_result_rows — the input gates bound pages
    and doc bytes, not the edge counts a crawl discovers. The caller
    falls back to the staged loop, which holds this state as DataFrames."""


def retry_after_seconds_py(s: str | None, clock: float) -> float | None:
    """Twin of crawler.retry_after_seconds (parseRetryAfter,
    src/index.ts:993-1009): plain seconds | '1m30s'/'30s' durations |
    HTTP-date on the virtual epoch. Returns an absolute virtual deadline
    or None, matching the JVM expression branch-for-branch."""
    import calendar
    from datetime import datetime

    if s is None:
        return None
    if re.search(r"^\d+(\.\d+)?$", s):
        return float(s) + clock
    if re.search(r"^(\d+m)?\d+s$", s):
        m = re.search(r"^(\d+)m", s)
        minutes = float(m.group(1)) if m else 0.0
        secs = float(re.search(r"(\d+)s$", s).group(1))
        return minutes * 60 + secs + clock
    m = re.search(r"^[A-Za-z]{3}, (.+) GMT$", s)
    if m:
        try:
            dt = datetime.strptime(m.group(1), "%d %b %Y %H:%M:%S")
        except ValueError:
            return None
        return float(calendar.timegm(dt.timetuple()))
    return None


def _round_half_up(v: float) -> float:
    """Twin of F.round(double): BigDecimal HALF_UP at scale 0."""
    import decimal

    return float(
        decimal.Decimal(repr(v)).quantize(0, rounding=decimal.ROUND_HALF_UP))


def _double_str(v: float) -> str:
    """Twin of Spark's double→string cast (Java Double.toString) for the
    post-round values the retry events carry (integral, small)."""
    import math

    if v == int(v) and abs(v) < 1e7:
        if v == 0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return f"{int(v)}.0"
    return repr(v)


def _make_py_frag_skip(rules):
    """Python twin of skiprules.make_fragment_skip_match (regex path
    matches the FRAGMENT only, like the JVM `frag.rlike` union)."""
    if rules is None:
        return None
    if callable(rules):
        return lambda f, u: bool(rules(f, u))
    if not rules:
        return None
    pats = [re.compile(p) for p in rules]
    return lambda f, u: any(p.search(f) for p in pats)


def process_wave_rows(rows_in: list, fetcher, skip_fn, cfg: CheckOptions,
                      docs_map: dict, candidates_fn, url_host_py,
                      retry_ctx: dict | None = None):
    """One wave's per-row pipeline over plain dict rows. Returns
    (res_rows, ev_rows, cand_rows):

      res:  (url, status, state, parent, failure_details, host, seq)
      ev:   (kind, url, status, detail)
      cand: (resolved_url, page_url, crawl, child_host, parent_seq,
             ordinal, root_path) — within-wave (child,parent)-deduped,
             ordered by (parent_seq, ordinal) like the staged w_edge window

    With ``retry_ctx`` (fully-fused gear only: keys clock / host_delays /
    pending_targets / frag_skip_fn) the retry + fragment branches run too,
    and four more values are returned: requeue (frontier dicts), new_delays
    (host -> 429 deadline), page_meta (fragment-validation inputs) and
    new_pending ((target, fragment) pairs). ``retry_ctx=None`` (the per-wave
    Arrow gear) keeps the original 3-tuple contract.
    """
    import pandas as pd

    check_css = bool(cfg.check_css)
    recurse = bool(cfg.recurse)
    res: list[tuple] = []
    ev: list[tuple] = []
    cand: list[tuple] = []
    requeue: list[dict] = []      # frontier rows to re-enter a later wave
    new_delays: dict = {}         # host -> max 429 deadline this wave
    page_meta: list[dict] = []    # fragment-validation inputs (check_fragments)
    new_pending: list[tuple] = [] # (target_url, fragment) per-wave distinct

    # ---- pre-fetch skip (src/index.ts:320-323,973-985)
    fetchable = []
    for r in rows_in:
        url = r["url"]
        non_http = not re.match(r"^https?://", url)
        if non_http or (skip_fn is not None and skip_fn(url)):
            res.append((url, 0 if non_http else None, LinkState.SKIPPED,
                        r["parent"], [], r["host"], r["seq"]))
        else:
            fetchable.append(r)

    # ---- robots.txt gate (staged robots_filter twin; north_star
    # politeness): longest-prefix allow-vs-disallow per host, hosts with
    # no rules row pass. Runs after the pre-fetch skip and before the
    # delay gate, matching the staged order.
    rules_map = (retry_ctx or {}).get("robots_rules")
    if rules_map is not None:
        from linkinator_spark.operators.robots import robots_allowed

        still = []
        for r in fetchable:
            rules = rules_map.get(r["host"])
            if rules is None:
                still.append(r)
                continue
            path = re.sub(r"^https?://[^/]+", "", r["url"])
            if robots_allowed(path, rules[0], rules[1]):
                still.append(r)
            else:
                res.append((r["url"], None, LinkState.SKIPPED, r["parent"],
                            ["robots.txt disallow"], r["host"], r["seq"]))
        fetchable = still

    # ---- per-host delay gate (J3, staged crawler delay join twin):
    # skipped rows above never reach the gate, matching the staged order.
    # Active for 429 deadlines (cfg.retry) AND robots Crawl-delay pacing
    # (rules dim present), like the staged condition
    if (retry_ctx is not None and (cfg.retry or rules_map is not None)
            and retry_ctx["host_delays"]):
        clock = retry_ctx["clock"]
        still = []
        for r in fetchable:
            nb = retry_ctx["host_delays"].get(r["host"])
            if nb is not None and nb > clock + _EPS_PY:
                requeue.append(dict(r, not_before=nb))
            else:
                still.append(r)
        fetchable = still

    # ---- robots Crawl-delay -> per-host pacing (staged arming twin):
    # every host fetched this wave waits crawl_delay of virtual time
    # before its next wave of fetches (max-wins merge with 429 deadlines)
    if rules_map is not None and retry_ctx is not None:
        clock0 = retry_ctx["clock"]
        for r in fetchable:
            rules = rules_map.get(r["host"])
            if rules is not None and rules[2] is not None:
                new_delays[r["host"]] = max(
                    new_delays.get(r["host"], float("-inf")),
                    clock0 + rules[2])

    # ---- fetch choreography (request + chains + 405 + last-gasp),
    # wave-batch gated exactly like the staged aggregate
    fetched = fetcher(fetchable)

    # ---- retry diversion between fetch and classify (staged c429/cerr
    # twins, src/index.ts:1019-1109): 429+retry-after -> host delay +
    # requeue; retryable errors -> exponential backoff with the staged
    # plan's BIT-EXACT xxhash64 jitter (functions/xxhash.py)
    if retry_ctx is not None and (cfg.retry or cfg.retry_errors):
        from linkinator_spark.functions.xxhash import pmod, spark_xxhash64

        clock = retry_ctx["clock"]
        keep_r, keep_f = [], []
        for r, f in zip(fetchable, fetched):
            status = f["status"]
            if f["redirect_skipped"] is None:
                if cfg.retry and status == 429 and f["retry_after"] is not None:
                    deadline = retry_after_seconds_py(f["retry_after"], clock)
                    if deadline is not None:
                        h = r["host"]
                        new_delays[h] = max(
                            new_delays.get(h, float("-inf")), deadline)
                        requeue.append(dict(
                            r, not_before=deadline, attempt=r["attempt"] + 1))
                        ev.append(("retry", r["url"], status,
                                   _double_str(_round_half_up(
                                       deadline - clock))))
                        continue
                if (cfg.retry_errors
                        and (status == 0 or status >= 500 or status == 429)
                        and r["retry_errors_n"] < cfg.retry_errors_count):
                    n1 = r["retry_errors_n"] + 1
                    jitter_s = (
                        pmod(spark_xxhash64(r["url"], n1, cfg.seed), 10000)
                        / 10000.0 * cfg.retry_errors_jitter / 1000.0)
                    backoff = 2.0 ** n1 + jitter_s
                    requeue.append(dict(
                        r, not_before=clock + backoff, retry_errors_n=n1,
                        attempt=r["attempt"] + 1))
                    ev.append(("retry", r["url"], status,
                               _double_str(_round_half_up(backoff))))
                    continue
            keep_r.append(r)
            keep_f.append(f)
        fetchable, fetched = keep_r, keep_f

    # ---- classification + events + extraction inputs
    frag_targets = (retry_ctx or {}).get("pending_targets") or ()
    ext_pages = []  # (page_url, base_url, kind, spans, parent_seq, root)
    for r, f in zip(fetchable, fetched):
        if f["redirect_skipped"] is not None:
            res.append((r["url"], None, LinkState.SKIPPED, r["parent"],
                        [], r["host"], r["seq"]))
            continue
        has_body = (f["has_response"] and f["method_effective"] == "GET"
                    and f["body_doc_id"] != "")
        is_html = bool(_HTML_RE_PY.search(f["content_type"] or ""))
        is_css = bool(_CSS_RE_PY.search(f["content_type"] or ""))
        # ---- fragment-target body re-GET for HEAD-fetched html pages
        # (staged frag re-GET twin, src/index.ts:450-473): the plain-GET
        # refetch REPLACES the row before classification; a refetch that
        # lands on a skip-rule redirect drops the row entirely, exactly
        # like the staged left_anti + rskip-filtered union
        if (cfg.check_fragments and r["url"] in frag_targets
                and is_html and not has_body and f["has_response"]):
            f2 = fetcher([r], method_override="GET", fallbacks=False)[0]
            f2["fetch_failures"] = (list(f["fetch_failures"] or [])
                                    + list(f2["fetch_failures"] or []))
            if f2["redirect_skipped"] is not None:
                continue
            f = f2
            has_body = (f["has_response"] and f["method_effective"] == "GET"
                        and f["body_doc_id"] != "")
            is_html = bool(_HTML_RE_PY.search(f["content_type"] or ""))
            is_css = bool(_CSS_RE_PY.search(f["content_type"] or ""))
        state, details, (ev_warn, ev_redir, ev_insecure) = classify_py(
            cfg, r["url"], f["status"], f["has_response"], has_body,
            f["final_url"], f["location"], f["cf_mitigated"],
            f["fetch_failures"])
        if retry_ctx is not None and cfg.check_fragments and f["has_response"]:
            page_meta.append({
                "url": r["url"], "status": f["status"], "state": state,
                "parent": r["parent"], "host": r["host"], "seq": r["seq"],
                "has_body": has_body, "is_html": is_html,
                "body_doc_id": f["body_doc_id"],
            })
        res.append((r["url"], f["status"], state, r["parent"], details,
                    r["host"], r["seq"]))
        detail = (f["final_url"] if f["final_url"] is not None
                  else f["location"])
        if ev_warn:
            ev.append(("statusCodeWarning", r["url"], f["status"], detail))
        if ev_redir:
            ev.append(("redirect", r["url"], f["status"], detail))
        if ev_insecure:
            ev.append(("httpInsecure", r["url"], f["status"], detail))
        if r["crawl"] and has_body and (is_html or (is_css and check_css)):
            ev.append(("pagestart", r["url"], None, ""))
            ext_pages.append((
                r["url"],
                f["final_url"] if f["final_url"] is not None else r["url"],
                "css" if is_css else "html",
                f["body_doc_id"],
                r["seq"], r["root_path"],
            ))

    # ---- extraction: the staged UDF fn, called inline on the same
    # (page_url, base_url, content_kind, spans) frame shape. A large
    # wave may instead be dispatched to the executors through
    # retry_ctx["parallel_extract"] (fully-fused gear only): extraction
    # is per-page pure, so chunking across tasks is semantics-free, and
    # the downstream (parent_seq, ordinal) sort restores the total order
    # the edge dedup walks.
    cand_rows = []
    meta = {p[0]: (p[4], p[5]) for p in ext_pages}
    par = (retry_ctx or {}).get("parallel_extract")
    if ext_pages and par is not None and len(ext_pages) >= par["min_pages"]:
        for c in par["run"]([(p[0], p[1], p[2], p[3]) for p in ext_pages]):
            parent_seq, root_path = meta[c["page_url"]]
            cand_rows.append(dict(c, parent_seq=parent_seq,
                                  root_path=root_path))
    elif ext_pages:
        ext_pdf = pd.DataFrame(
            [(p[0], p[1], p[2], docs_map.get(p[3])) for p in ext_pages],
            columns=["page_url", "base_url", "content_kind", "spans"])
        for cpdf in candidates_fn([ext_pdf]):
            for c in cpdf.to_dict("records"):
                parent_seq, root_path = meta[c["page_url"]]
                cand_rows.append(dict(c, parent_seq=parent_seq,
                                      root_path=root_path))

    # ---- malformed + skip-rule branches (_process_candidates head)
    kept = []
    for c in cand_rows:
        if c["parse_error"] is not None:
            res.append((c["raw_link"], 0, LinkState.BROKEN, c["page_url"],
                        [c["parse_error"]], "", c["parent_seq"]))
            continue
        uwf = c["url_with_fragment"]
        if (skip_fn is not None and uwf is not None
                and re.match(r"^https?://", uwf) and skip_fn(uwf)):
            res.append((uwf, None, LinkState.SKIPPED, c["page_url"], [],
                        "", c["parent_seq"]))
            continue
        kept.append(c)

    # ---- fragment bookkeeping (staged _process_candidates twin,
    # src/index.ts:754-784): runs on ALL post-skip candidates BEFORE the
    # edge dedup; a frag-skipped link is SKIPPED but its target page still
    # recurses, and pending pairs are per-wave distinct only
    if retry_ctx is not None and cfg.check_fragments:
        frag_skip_fn = retry_ctx.get("frag_skip_fn")
        wave_pairs = set()
        for c in kept:
            frag = c["fragment"]
            if frag is None or len(frag) == 0:
                continue
            if frag_skip_fn is not None and frag_skip_fn(
                    frag, c["url_with_fragment"]):
                res.append((c["url_with_fragment"], None, LinkState.SKIPPED,
                            c["page_url"], [], "", c["parent_seq"]))
                continue
            pair = (c["resolved_url"], frag)
            if pair not in wave_pairs:
                wave_pairs.add(pair)
                new_pending.append(pair)

    # ---- recurse predicate + within-wave edge dedup (w_edge twin)
    kept.sort(key=lambda c: (c["parent_seq"], c["ordinal"]))
    seen_edges = set()
    for c in kept:
        edge = (c["resolved_url"], c["page_url"])
        if edge in seen_edges:
            continue
        seen_edges.add(edge)
        child_host = url_host_py(c["resolved_url"])
        crawl = (recurse and c["resolved_url"].startswith(c["root_path"])
                 and child_host == url_host_py(c["root_path"]))
        cand.append((c["resolved_url"], c["page_url"], crawl, child_host,
                     c["parent_seq"], c["ordinal"], c["root_path"]))
    if retry_ctx is None:
        return res, ev, cand
    return res, ev, cand, requeue, new_delays, page_meta, new_pending


def run_wave_fused(
    ready: DataFrame,
    chain_bc,            # broadcast of fetch.build_chain_map(pages)
    docs_bc,             # broadcast of build_docs_map(documents)
    cfg: CheckOptions,
    candidates_fn,       # the staged extraction UDF's batch fn (reused)
) -> DataFrame:
    """One mapInPandas stage producing tagged rows:

      t='res'  -> result rows (url/status/state/parent/failure_details/
                  host/seq); the crawler stamps `wave`
      t='ev'   -> events (kind/url/status/detail)
      t='cand' -> within-wave-deduped candidate edges for the relational
                  tail (seen/relationship anti-joins + politeness rank)

    The caller must pass a SINGLE-partition df (the 405/last-gasp fallbacks
    are wave-batch gated, as in the staged path)."""
    from linkinator_spark.operators.fetch import make_fused_fetcher

    fetcher = make_fused_fetcher(chain_bc, cfg)
    skip_fn = _make_py_skip(getattr(cfg, "links_to_skip", None))

    def fn(batches):
        import pandas as pd

        from linkinator_spark.functions.urls import url_host_py

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = (pd.concat(pdfs, ignore_index=True)
               if len(pdfs) > 1 else pdfs[0])
        res, ev, cand = process_wave_rows(
            pdf.to_dict("records"), fetcher, skip_fn, cfg, docs_bc.value,
            candidates_fn, url_host_py)

        out = (
            [("res",) + r + (None,) * 9 for r in res]
            + [("ev", r[1], r[2], None, None, None, None, None, r[0], r[3],
                None, None, None, None, None, None, None) for r in ev]
            + [("cand",) + (None,) * 9 + c for c in cand]
        )
        cols = ["t", "url", "status", "state", "parent", "failure_details",
                "host", "seq", "kind", "detail", "resolved_url", "page_url",
                "cand_crawl", "child_host", "parent_seq", "ordinal",
                "root_path"]
        yield pd.DataFrame(out, columns=cols)

    return ready.mapInPandas(fn, TAGGED_SCHEMA)


def run_crawl_fused(seeds: list, chain_map: dict, docs_map: dict,
                    cfg: CheckOptions, candidates_fn, anchors_fn=None,
                    frag_skip_fn=None, robots_rules=None,
                    parallel_extract=None):
    """The whole wave loop in Python over the (gate-bounded) maps: for
    crawls whose scripted web fits the chain-map gate, every wave is
    driver-side vectorized work — zero Spark jobs in the loop. Returns
    (result_rows, event_rows, dup_edge_rows, waves, clock) as plain tuples
    for ``spark.createDataFrame``; the caller applies the shared
    finalization (dup-BROKEN re-report, mapUrl, link events, pass verdict).

    State twins (asserted equal to the staged path by
    tests/test_wave_fused.py): URL-seen set, (child,parent) relationship
    set, per-URL first-edge selection (w_url), per-host politeness rank
    and the (wave+1)*SEQ_WAVE_STRIDE+rank seq formula (_candidates_tail) — plus the
    retry-family state (virtual clock, per-host delay gate, 429 requeue,
    error backoff with bit-exact xxhash64 jitter) and the fragment
    machinery (pending pairs, HEAD->GET body refetch, anchors + soft-404
    validation), twins of the staged branches they mirror."""
    from types import SimpleNamespace

    from linkinator_spark.functions.urls import url_host_py
    from linkinator_spark.operators.fetch import make_fused_fetcher

    fetcher = make_fused_fetcher(SimpleNamespace(value=chain_map), cfg)
    skip_fn = _make_py_skip(getattr(cfg, "links_to_skip", None))

    frontier = [
        {"url": u, "host": h, "parent": p, "crawl": c, "root_path": rp,
         "attempt": at, "retry_errors_n": rn, "not_before": nb,
         "wave": w, "seq": sq}
        for (u, h, p, c, rp, at, rn, nb, w, sq) in seeds
    ]
    seen = {r["url"] for r in frontier}
    rel: set[tuple] = set()
    results: list[tuple] = []
    events: list[tuple] = []
    dup_edges: list[tuple] = []
    host_delays: dict = {}
    pending: list[tuple] = []  # (target_url, fragment), duplicates kept
                               # across waves exactly like the staged union
    clock = 0.0
    wave = 0
    while wave < cfg.max_waves and frontier:
        # ---- virtual clock: if nothing is ready, advance to the earliest
        # deadline (staged loop's min_nb jump)
        if not any(r["not_before"] <= clock + _EPS_PY for r in frontier):
            clock = min(r["not_before"] for r in frontier)
        ready = [r for r in frontier if r["not_before"] <= clock + _EPS_PY]
        deferred = [r for r in frontier if r["not_before"] > clock + _EPS_PY]

        retry_ctx = {
            "clock": clock, "host_delays": host_delays,
            "pending_targets": {t for t, _ in pending},
            "frag_skip_fn": frag_skip_fn,
            "robots_rules": robots_rules,
            "parallel_extract": parallel_extract,
        }
        (res, ev, cand, requeue, new_delays, page_meta,
         new_pending) = process_wave_rows(
            ready, fetcher, skip_fn, cfg, docs_map, candidates_fn,
            url_host_py, retry_ctx=retry_ctx)
        results.extend(r + (wave,) for r in res)
        events.extend(e + (wave,) for e in ev)
        for h, d in new_delays.items():
            host_delays[h] = max(host_delays.get(h, float("-inf")), d)

        # relational tail twin (_candidates_tail): rel anti-join ->
        # per-URL first edge -> URL-seen -> global FIFO rank/seq (the
        # reference queue position; cand is already (parent_seq, ordinal)-
        # sorted, matching the staged global_fifo_rank)
        grank = 0
        url_first: set[str] = set()
        nxt = []
        for (resolved, page_url, crawl, child_host, parent_seq, ordinal,
             root_path) in cand:
            if (resolved, page_url) in rel:
                continue
            rel.add((resolved, page_url))
            if resolved in url_first:
                dup_edges.append((resolved, page_url))
                continue
            url_first.add(resolved)
            if resolved in seen:
                dup_edges.append((resolved, page_url))
                continue
            seen.add(resolved)
            grank += 1
            rank = grank
            nxt.append({
                "url": resolved, "host": child_host, "parent": page_url,
                "crawl": crawl, "root_path": root_path, "attempt": 1,
                "retry_errors_n": 0, "not_before": 0.0, "wave": wave + 1,
                "seq": (wave + 1) * SEQ_WAVE_STRIDE + rank,
            })

        # ---- fragment validation (staged _validate_fragments twin,
        # src/index.ts:616-673,878-920): pending pairs resolve when their
        # target page is fetched OK as html-with-body this wave; missing
        # anchors report BROKEN with the reference's exact message, the
        # soft-404 sniff skips validation, and EVERY pending entry with a
        # fetched target resolves (validated or reported)
        if cfg.check_fragments:
            pending = pending + new_pending
            target_urls = {t for t, _ in pending}
            targets = {
                m["url"]: m for m in page_meta
                if (m["has_body"] and m["is_html"]
                    and m["state"] == LinkState.OK
                    and m["url"] in target_urls)
            }
            if targets:
                import pandas as pd

                arows = [(u, docs_map.get(m["body_doc_id"]))
                         for u, m in targets.items()]
                anchors_map: dict = {}
                soft404: dict = {}
                apdf_in = pd.DataFrame(arows, columns=["page_url", "spans"])
                for apdf in anchors_fn([apdf_in]):
                    for rec in apdf.to_dict("records"):
                        anchors_map[rec["page_url"]] = set(rec["anchors"])
                        body = rec["body_text"] or ""
                        soft404[rec["page_url"]] = (
                            'content="noindex' in body and "nofollow" in body)
                for (t, frag) in pending:
                    m = targets.get(t)
                    if m is None:
                        continue
                    if not soft404[t] and frag not in anchors_map[t]:
                        results.append((
                            f"{t}#{frag}", m["status"], LinkState.BROKEN,
                            m["parent"],
                            [f"Error: Fragment identifier '#{frag}' "
                             f"not found on page"],
                            m["host"], m["seq"], wave,
                        ))
                pending = [p for p in pending if p[0] not in targets]

        frontier = deferred + requeue + nxt
        wave += 1
        cap = getattr(cfg, "fused_max_result_rows", 2_000_000)
        if max(len(results), len(events), len(rel), len(seen)) > cap:
            raise FusedCapExceeded(
                f"fused gear state exceeded {cap} rows at wave {wave}")
    return results, events, dup_edges, wave, clock
