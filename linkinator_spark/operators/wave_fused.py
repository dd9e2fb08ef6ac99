"""Whole-wave fused operator for small waves — one Arrow stage per wave.

Fixture-scale crawls and the tail waves of a big crawl are driver-latency
bound: a 4-row frontier still pays ~300 Catalyst plan nodes, ~20 AQE query
stages and 6 physical-planning passes per wave in the staged pipeline
(measured: ~12 s/wave at sf0.001 regardless of shuffle partitioning or
codegen mode — the cost is plan handling, not tasks). This module collapses
the per-row portion of a wave — pre-fetch skip, the full scripted request
choreography, content sniff, classification, link extraction and
within-wave edge dedup — into ONE ``mapInPandas`` stage over the broadcast
pages/docs maps, emitting tagged rows the crawler splits back into result /
event / candidate frames. Only the genuinely cross-wave relational state
(URL-seen anti-join, relationship-edge anti-join, politeness ranking) stays
in DataFrame land.

Semantics parity, piece by piece:
* request choreography: `fetch.fetch_wave_fused`-style python twins of
  `request()` + `follow_redirects_chain` + the crawler's 405/last-gasp
  blocks (reference src/index.ts:344-417, 1185-1286) — shared helpers in
  operators/fetch.py.
* classification: `classify_py`, a line-for-line twin of
  operators/classify.py (src/index.ts:482-604).
* extraction: calls the SAME `make_candidate_links_udf` batch fn the
  staged plan uses — zero duplicated extraction semantics.
* edge dedup: first occurrence per (resolved_url, page_url) ordered by
  (parent_seq, ordinal) — the staged `w_edge` window.

Gated (see crawler `_wave_fused_ok`): scripted tables only (chain map
built), no live requester, and none of fragments / retry / robots /
url-rewrite — those waves keep the staged plan. Equivalence between the
two paths is asserted by tests/test_wave_fused.py on a site exercising
every fused branch, and by the driver's crawl oracles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from linkinator_spark.config import CheckOptions, LinkState
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


def build_docs_map(documents: DataFrame):
    """{doc_id: [span dicts]} via executor-side treeAggregate (same shape
    as build_chain_map — the driver receives merged fragments, never
    rows). Spans become the same dict shape Arrow hands the staged
    extraction UDF."""
    src = documents.select("doc_id", "spans")

    def _fold(acc: dict, row) -> dict:
        if isinstance(row, dict):
            acc.update(row)
        else:
            acc[row["doc_id"]] = [
                {"kind": s["kind"], "text": s["text"],
                 "media_ref": s["media_ref"], "offset": s["offset"]}
                for s in (row["spans"] or [])
            ]
        return acc

    return src.rdd.treeAggregate({}, _fold, _fold, depth=2)


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
    return state, details, ev_status_warn, ev_redirect, ev_http_insecure


def run_wave_fused(
    ready: DataFrame,
    chain_bc,            # broadcast of fetch.build_chain_map(pages)
    docs_bc,             # broadcast of build_docs_map(documents)
    cfg: CheckOptions,
    candidates_fn,       # the staged extraction UDF's batch fn (reused as-is)
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
    check_css = bool(cfg.check_css)
    recurse = bool(cfg.recurse)

    def fn(batches):
        import pandas as pd

        from linkinator_spark.functions.urls import url_host_py

        docs_map = docs_bc.value

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = (pd.concat(pdfs, ignore_index=True)
               if len(pdfs) > 1 else pdfs[0])
        n = len(pdf)
        rows_in = pdf.to_dict("records")

        out: list[tuple] = []

        def emit_res(url, status, state, parent, details, host, seq):
            out.append(("res", url, status, state, parent, details, host,
                        seq, None, None,
                        None, None, None, None, None, None, None))

        def emit_ev(kind, url, status, detail):
            out.append(("ev", url, status, None, None, None, None, None,
                        kind, detail,
                        None, None, None, None, None, None, None))

        def emit_cand(resolved, page_url, crawl, child_host, parent_seq,
                      ordinal, root_path):
            out.append(("cand", None, None, None, None, None, None, None,
                        None, None,
                        resolved, page_url, crawl, child_host, parent_seq,
                        ordinal, root_path))

        # ---- pre-fetch skip (src/index.ts:320-323,973-985)
        fetchable = []
        for r in rows_in:
            url = r["url"]
            non_http = not re.match(r"^https?://", url)
            if non_http or (skip_fn is not None and skip_fn(url)):
                emit_res(url, 0 if non_http else None, LinkState.SKIPPED,
                         r["parent"], [], r["host"], r["seq"])
            else:
                fetchable.append(r)

        # ---- fetch choreography (request + chains + 405 + last-gasp),
        # wave-batch gated exactly like the staged aggregate
        fetched = fetcher(fetchable)

        # ---- classification + events + extraction inputs
        ext_pages = []  # (page_url, base_url, kind, spans, parent_seq)
        for r, f in zip(fetchable, fetched):
            if f["redirect_skipped"] is not None:
                emit_res(r["url"], None, LinkState.SKIPPED, r["parent"],
                         [], r["host"], r["seq"])
                continue
            has_body = (f["has_response"] and f["method_effective"] == "GET"
                        and f["body_doc_id"] != "")
            is_html = bool(_HTML_RE_PY.search(f["content_type"] or ""))
            is_css = bool(_CSS_RE_PY.search(f["content_type"] or ""))
            (state, details, ev_warn, ev_redir, ev_insecure) = classify_py(
                cfg, r["url"], f["status"], f["has_response"], has_body,
                f["final_url"], f["location"], f["cf_mitigated"],
                f["fetch_failures"])
            emit_res(r["url"], f["status"], state, r["parent"], details,
                     r["host"], r["seq"])
            detail = f["final_url"] if f["final_url"] is not None \
                else f["location"]
            if ev_warn:
                emit_ev("statusCodeWarning", r["url"], f["status"], detail)
            if ev_redir:
                emit_ev("redirect", r["url"], f["status"], detail)
            if ev_insecure:
                emit_ev("httpInsecure", r["url"], f["status"], detail)
            if (r["crawl"] and has_body
                    and (is_html or (is_css and check_css))):
                emit_ev("pagestart", r["url"], None, "")
                ext_pages.append((
                    r["url"],
                    f["final_url"] if f["final_url"] is not None
                    else r["url"],
                    "css" if is_css else "html",
                    docs_map.get(f["body_doc_id"]),
                    r["seq"], r["root_path"],
                ))

        # ---- extraction: the staged UDF fn, called inline on the same
        # (page_url, base_url, content_kind, spans) frame shape
        cand_rows = []
        if ext_pages:
            ext_pdf = pd.DataFrame(
                [(p[0], p[1], p[2], p[3]) for p in ext_pages],
                columns=["page_url", "base_url", "content_kind", "spans"])
            meta = {p[0]: (p[4], p[5]) for p in ext_pages}
            for cpdf in candidates_fn([ext_pdf]):
                for c in cpdf.to_dict("records"):
                    parent_seq, root_path = meta[c["page_url"]]
                    cand_rows.append(dict(c, parent_seq=parent_seq,
                                          root_path=root_path))

        # ---- malformed + skip-rule branches (_process_candidates head)
        kept = []
        for c in cand_rows:
            if c["parse_error"] is not None:
                emit_res(c["raw_link"], 0, LinkState.BROKEN, c["page_url"],
                         [c["parse_error"]], "", c["parent_seq"])
                continue
            uwf = c["url_with_fragment"]
            if (skip_fn is not None and uwf is not None
                    and re.match(r"^https?://", uwf) and skip_fn(uwf)):
                emit_res(uwf, None, LinkState.SKIPPED, c["page_url"], [],
                         "", c["parent_seq"])
                continue
            kept.append(c)

        # ---- recurse predicate + within-wave edge dedup (w_edge twin):
        # first occurrence per (resolved_url, page_url) by
        # (parent_seq, ordinal)
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
            emit_cand(c["resolved_url"], c["page_url"], crawl, child_host,
                      c["parent_seq"], c["ordinal"], c["root_path"])

        cols = ["t", "url", "status", "state", "parent", "failure_details",
                "host", "seq", "kind", "detail", "resolved_url", "page_url",
                "cand_crawl", "child_host", "parent_seq", "ordinal",
                "root_path"]
        yield pd.DataFrame(out, columns=cols)

    return ready.mapInPandas(fn, TAGGED_SCHEMA)
