"""Fetch stage — test-mode network simulator.

The reference issues real HTTP via undici with a manual redirect-follow loop
(makeRequest, /root/reference/src/index.ts:1185-1286); its tests replace the
network with scripted MockAgent interceptors (test/test.index.ts:26-46). We do
the same thing as dataflow: a fetch is a broadcast hash join of the frontier
against a scripted `pages` dimension keyed (url, method, attempt), and the
redirect-follow loop is an iterative self-join capped at 20 hops
(index.ts:1272, asserted by test/test.redirects.ts:595-653).

Semantics mirrored here:
* attempt selection: the highest scripted attempt <= the frontier row's
  attempt counter wins (a MockAgent script that runs out persists its last
  behavior).
* HEAD->GET on 405 (index.ts:378-388) and last-gasp GET for non-2xx leaf
  checks (index.ts:396-417) are handled by the caller re-invoking `request`.
* redirect hops check skip rules per hop; a matching hop returns
  redirect_skipped (index.ts:1267-1270).
* hop 21 raises "redirect count exceeded" -> no response, status 0.

At 100 TB scale this module is swapped for a live-HTTP `mapInPandas` stage
(operators/http_fetch.py) — the surrounding dataflow is identical; per-host
partition affinity comes from the frontier's host partitioning either way.

Output columns appended to the frontier rows:
  status INT, has_response BOOL, has_body BOOL, content_type STRING,
  location STRING, retry_after STRING, cf_mitigated BOOL, final_url STRING,
  body_doc_id STRING, redirect_skipped STRING, fetch_failures ARRAY<STRING>,
  method_effective STRING
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkinator_spark.config import CheckOptions
from linkinator_spark.functions.urls import url_host

REDIRECT_STATUSES = (301, 302, 303, 307, 308)

FETCH_COLS = [
    "status", "has_response", "has_body", "content_type", "location",
    "retry_after", "cf_mitigated", "final_url", "body_doc_id",
    "redirect_skipped", "fetch_failures", "method_effective",
]


def prepare_pages_dim(pages: DataFrame) -> DataFrame:
    """Project the scripted pages table to the fetch dimension."""
    return pages.select(
        F.col("url").alias("p_url"),
        F.col("method").alias("p_method"),
        F.col("attempt").alias("p_attempt"),
        F.col("status").alias("p_status"),
        F.lower(F.coalesce(F.element_at("headers", "location"), F.lit(""))).alias("_loc_lower"),
        F.coalesce(F.element_at("headers", "location"), F.lit(None)).alias("p_location"),
        F.element_at("headers", "retry-after").alias("p_retry_after"),
        F.element_at("headers", "cf-mitigated").isNotNull().alias("p_cf_mitigated"),
        F.coalesce(
            F.element_at("headers", "content-type"), F.col("content_type"), F.lit("")
        ).alias("p_content_type"),
        F.coalesce(F.col("body_doc_id"), F.lit("")).alias("p_body_doc_id"),
        F.col("final_url").alias("p_final_url"),
    ).drop("_loc_lower")


def resolve_location(base: Column, loc: Column) -> Column:
    """Resolve a Location header against the request URL — JVM expressions
    only (absolute, root-relative, and same-directory-relative forms)."""
    origin = F.regexp_extract(base, r"^(https?://[^/?#]+)", 1)
    dir_prefix = F.regexp_replace(F.regexp_replace(base, r"[?#].*$", ""), r"[^/]*$", "")
    return (
        F.when(loc.rlike(r"^[a-zA-Z][a-zA-Z\d+\-.]*:"), loc)
        .when(loc.startswith("/"), F.concat(origin, loc))
        .otherwise(F.concat(dir_prefix, loc))
    )


def request(df: DataFrame, pages_dim: DataFrame, method: Column,
            host_defaults: DataFrame | None = None,
            static_prefix: str | None = None) -> DataFrame:
    """One simulated HTTP request for every row of `df`.

    Row-preserving even when `url` values repeat: the redirect resolvers
    re-request the chain's LANDING url, and two distinct links whose
    chains converge on one landing must each keep their row (a per-url
    pick would silently drop all but one — found by the redirect_resolve
    oracle). The best-scripted-attempt pick therefore partitions on a
    per-row tag, not the url. Joins are broadcast — the pages dim is the
    scripted fixture web, always small; the live-mode replacement is an
    HTTP UDF.
    """
    req = df.withColumn("_req_method", method).withColumn(
        "_reqid", F.monotonically_increasing_id())
    if static_prefix:
        # the modeled static server resolves files from the PATH only —
        # query strings are ignored (reference src/server.ts:77-88 parses
        # url.pathname), and a directory redirect preserves the query in
        # its Location (src/server.ts:100-116, issue #595)
        is_static = req["url"].startswith(static_prefix)
        lookup = F.when(
            is_static, F.regexp_replace(req["url"], r"\?[^#]*$", "")
        ).otherwise(req["url"])
    else:
        lookup = req["url"]
    joined = req.join(
        F.broadcast(pages_dim),
        (lookup == pages_dim["p_url"]) & (req["_req_method"] == pages_dim["p_method"]),
        "left",
    )
    # best scripted attempt: highest attempt <= our counter, else the lowest
    le = F.col("p_attempt") <= F.col("attempt")
    w = Window.partitionBy("_reqid").orderBy(
        le.desc(),
        F.when(le, -F.col("p_attempt")).otherwise(F.col("p_attempt")).asc(),
    )
    picked = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_reqid", "p_url", "p_method", "p_attempt")
    )
    if host_defaults is not None:
        # modeled static server: un-scripted URLs on the server host are
        # 404s, not network errors (reference return404,
        # src/server.ts:191-196). The default keys on the REQUESTED url's
        # host so redirect hops off-host keep network-error semantics.
        hd = host_defaults.withColumnRenamed("host", "_dh")
        picked = (
            picked.join(
                F.broadcast(hd), url_host(F.col("url")) == F.col("_dh"), "left",
            )
            .drop("_dh")
            .withColumn("p_status", F.coalesce("p_status", "d_status"))
            .withColumn(
                "p_content_type",
                F.when(F.col("p_content_type").isNotNull(),
                       F.col("p_content_type"))
                .otherwise(F.col("d_content_type")),
            )
            .drop("d_status", "d_content_type")
        )
    if static_prefix:
        # dir-slash 301s preserve the request's query in their Location
        q = F.regexp_extract(F.col("url"), r"(\?[^#]*)$", 1)
        picked = picked.withColumn(
            "p_location",
            F.when(
                F.col("p_location").isNotNull() & (q != F.lit(""))
                & F.col("url").startswith(static_prefix),
                F.concat(F.col("p_location"), q),
            ).otherwise(F.col("p_location")),
        )
    return (
        picked.withColumn("has_response", F.col("p_status").isNotNull())
        .withColumn("status", F.coalesce(F.col("p_status"), F.lit(0)))
        .withColumn("location", F.col("p_location"))
        .withColumn("retry_after", F.col("p_retry_after"))
        .withColumn("cf_mitigated", F.coalesce(F.col("p_cf_mitigated"), F.lit(False)))
        .withColumn("content_type", F.coalesce(F.col("p_content_type"), F.lit("")))
        .withColumn("body_doc_id", F.coalesce(F.col("p_body_doc_id"), F.lit("")))
        .withColumn("final_url", F.col("p_final_url"))
        .withColumn("method_effective", F.col("_req_method"))
        .drop("p_status", "p_location", "p_retry_after", "p_cf_mitigated",
              "p_content_type", "p_body_doc_id", "p_final_url", "_req_method")
    )


def build_chain_map(pages: DataFrame):
    """Broadcastable {(url, method): [(attempt, status, location,
    retry_after, cf_mitigated, content_type, body_doc_id, final_url), ...]}
    over the WHOLE scripted pages table — the lookup dim for both the
    redirect-chain resolver (reads positions 0-2) and the fused small-wave
    fetch (reads the full payload). Non-redirect rows act as chain
    terminators so a resolver picks exactly the row `request()` would
    (same best-attempt rule); the payload columns mirror
    `prepare_pages_dim` field for field.

    Built executor-side: each partition folds its rows into a dict fragment
    and ``tree_fold`` (DataFrame-native depth-2 tree) merges fragments on
    executors, so the driver never materializes pages rows — it receives a
    handful of pre-merged dicts (same shape as the Bloom build). Test-mode
    only: the scripted table already broadcasts per wave, so this is
    strictly smaller state; the live-HTTP mode keeps the iterative hop loop
    (network hops can't be table-resolved)."""
    from linkinator_spark.plans.treefold import tree_fold
    src = pages.select(
        "url", "method", "attempt", "status",
        F.element_at("headers", "location").alias("location"),
        F.element_at("headers", "retry-after").alias("retry_after"),
        F.element_at("headers", "cf-mitigated").isNotNull().alias("cf_mitigated"),
        F.coalesce(
            F.element_at("headers", "content-type"), F.col("content_type"),
            F.lit(""),
        ).alias("content_type"),
        F.coalesce(F.col("body_doc_id"), F.lit("")).alias("body_doc_id"),
        F.col("final_url"),
    )

    def _fold(acc: dict, pdf) -> dict:
        def _i(x):
            # Arrow->pandas renders nullable ints as NaN floats
            return None if x is None or x != x else int(x)

        for row in pdf.itertuples(index=False):
            attempt = _i(row.attempt)
            status = _i(row.status)
            acc.setdefault((row.url, row.method), []).append(
                (attempt, status, row.location, row.retry_after,
                 bool(row.cf_mitigated), row.content_type,
                 row.body_doc_id, row.final_url))
        return acc

    def _merge(acc: dict, other: dict) -> dict:
        for k, v in other.items():
            acc.setdefault(k, []).extend(v)
        return acc

    cmap = tree_fold(src, dict, _fold, _merge)
    for v in cmap.values():
        v.sort(key=lambda t: t[0])
    return cmap


def _pick_attempt(behaviors, attempt):
    """request()'s best-attempt rule: highest scripted attempt <= ours,
    else the lowest scripted attempt."""
    le = [b for b in behaviors if b[0] <= attempt]
    return max(le, key=lambda b: b[0]) if le else min(behaviors,
                                                      key=lambda b: b[0])


def _resolve_location_py(base: str, loc: str) -> str:
    """Python twin of resolve_location (kept in lockstep; asserted equal by
    tests/test_redirect_chain.py)."""
    import re

    if re.match(r"^[a-zA-Z][a-zA-Z\d+\-.]*:", loc):
        return loc
    if loc.startswith("/"):
        m = re.match(r"^(https?://[^/?#]+)", base)
        return (m.group(1) if m else "") + loc
    return re.sub(r"[^/]*$", "", re.sub(r"[?#].*$", "", base)) + loc


def _make_py_skip(rules):
    import re

    if rules is None:
        return None
    if callable(rules):
        return lambda u: bool(rules(u))
    if not rules:
        return None
    pats = [re.compile(p) for p in rules]
    return lambda u: any(p.search(u) for p in pats)


def follow_redirects_chain(
    fetched: DataFrame,
    requester,
    chain_bc,          # broadcast of build_chain_map(pages)
    skip_rules,        # cfg.links_to_skip (regex list / callable / None)
    static_prefix: str | None = None,  # static-host chain lookups drop ?query
) -> DataFrame:
    """Barrier-free redirect follow for scripted tables: resolve each row's
    ENTIRE hop chain (cap 20, per-hop skip, 303→GET) inside one Arrow batch
    against the broadcast chain map, then issue ONE follow-up request for
    the chain's landing URL. Semantics identical to `follow_redirects`
    (tests assert equality); cost is O(1) extra plan nodes per wave instead
    of 2 driver jobs per hop depth."""
    from pyspark.sql.types import StringType, StructField, StructType

    init = (
        fetched.withColumn("redirect_skipped", F.lit(None).cast("string"))
        .withColumn("fetch_failures", F.array().cast("array<string>"))
    )
    is_redir = (
        F.col("has_response")
        & F.col("status").isin(list(REDIRECT_STATUSES))
        & F.col("location").isNotNull()
    )
    done0 = init.filter(~is_redir).withColumn("_ch_stop", F.col("url"))
    pending = init.filter(is_redir)

    out_schema = StructType(
        list(pending.schema.fields)
        + [StructField("_ch_target", StringType()),
           StructField("_ch_method", StringType()),
           StructField("_ch_stop", StringType())]
    )
    skip_fn = _make_py_skip(skip_rules)

    def fn(batches):
        cmap = chain_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            skipped = [None] * n
            failures = [
                list(v) if v is not None else []
                for v in pdf["fetch_failures"]
            ]
            has_resp = pdf["has_response"].tolist()
            statuses = [int(s) for s in pdf["status"]]
            locations = pdf["location"].tolist()
            targets, methods, stops = [None] * n, [None] * n, [None] * n
            for i in range(n):
                cur = pdf["url"].iat[i]
                status = statuses[i]
                loc = pdf["location"].iat[i]
                method = pdf["method_effective"].iat[i]
                attempt = int(pdf["attempt"].iat[i])
                hops = 0
                while True:
                    nxt = _resolve_location_py(cur, loc)
                    if skip_fn is not None and skip_fn(nxt):
                        # keep the current hop's (redirect) response
                        skipped[i], stops[i] = nxt, cur
                        statuses[i], locations[i] = status, loc
                        break
                    if hops >= 20:
                        has_resp[i], statuses[i] = False, 0
                        locations[i] = loc  # last hop's Location header
                        failures[i].append(
                            "TypeError: redirect count exceeded")
                        stops[i] = cur
                        break
                    if status == 303:
                        method = "GET"
                    hops += 1
                    key_url = nxt
                    if (static_prefix and nxt.startswith(static_prefix)
                            and "?" in nxt):
                        key_url = nxt.split("?", 1)[0]
                    beh = cmap.get((key_url, method))
                    picked = _pick_attempt(beh, attempt) if beh else None
                    if (picked is None or picked[1] not in REDIRECT_STATUSES
                            or picked[2] is None):
                        targets[i], methods[i], stops[i] = nxt, method, nxt
                        break
                    cur, status, loc = nxt, picked[1], picked[2]
            out = pdf.copy()
            out["redirect_skipped"] = skipped
            out["fetch_failures"] = failures
            out["has_response"] = has_resp
            out["status"] = statuses
            out["location"] = locations
            out["_ch_target"] = targets
            out["_ch_method"] = methods
            out["_ch_stop"] = stops
            yield out

    resolved = pending.mapInPandas(fn, out_schema)
    settled = resolved.filter(F.col("_ch_target").isNull()).drop(
        "_ch_target", "_ch_method")
    need = resolved.filter(F.col("_ch_target").isNotNull())
    refetched = requester(
        need.drop(*[c for c in FETCH_COLS
                    if c not in ("redirect_skipped", "fetch_failures")])
        .withColumn("url", F.col("_ch_target"))
        .drop("_ch_target"),
        F.col("_ch_method"),
    ).drop("_ch_method")

    out = done0.unionByName(settled).unionByName(
        refetched.select(*settled.columns))
    return (
        out.withColumn(
            "final_url",
            F.coalesce(
                F.col("final_url"),
                F.when(F.col("_ch_stop") != F.col("_orig_url"),
                       F.col("_ch_stop")),
            ),
        )
        .withColumn("url", F.col("_orig_url"))
        .drop("_ch_stop")
    )


def follow_redirects(
    fetched: DataFrame,
    requester,  # Callable[[DataFrame, Column], DataFrame] — one HTTP hop
    skip_match,  # Callable[[Column], Column] | None — per-hop skip predicate
    cache_into: list | None = None,  # registry for the hop-0 persist
) -> DataFrame:
    """Iterative redirect-follow: at most 20 hops (21 requests), per-hop skip
    check, 303 switches to GET. Mirrors makeRequest's loop
    (index.ts:1218-1285). Requester-agnostic: the same loop drives the
    table-join `request` and the live `http_fetch` stage."""
    cur = (
        fetched.withColumn("_hops", F.lit(0))
        .withColumn("_cur_url", F.col("url"))
        .withColumn("redirect_skipped", F.lit(None).cast("string"))
        .withColumn("fetch_failures", F.array().cast("array<string>"))
        # once a hop crosses origins, authorization/cookie/proxy-authorization
        # stop riding subsequent requests (stripSensitiveHeaders,
        # index.ts:1277-1281; the live requester honors this flag)
        .withColumn("_strip_sensitive", F.lit(False))
    )
    done_parts: list[DataFrame] = []

    for _hop in range(22):
        is_redir = (
            F.col("has_response")
            & F.col("status").isin(list(REDIRECT_STATUSES))
            & F.col("location").isNotNull()
            & F.col("redirect_skipped").isNull()
        )
        cur = cur.withColumn("_pending", is_redir)
        if _hop > 0:
            # hop rows are few; truncating lineage per hop keeps the plan
            # O(1) deep — 20 chained join plans otherwise OOM the driver
            # during plan stringification
            cur = cur.localCheckpoint(eager=True)
        else:
            cur = cur.persist()
            if cache_into is not None:
                cache_into.append(cur)
        pending = cur.filter(F.col("_pending"))
        done_parts.append(cur.filter(~F.col("_pending")).drop("_pending"))
        if pending.isEmpty():
            break

        target = resolve_location(F.col("_cur_url"), F.col("location"))
        pending = pending.withColumn("_target", target)

        if skip_match is not None:
            skipped = pending.filter(skip_match(F.col("_target")))
            pending = pending.filter(~skip_match(F.col("_target")))
            done_parts.append(
                skipped.withColumn("redirect_skipped", F.col("_target"))
                .drop("_target", "_pending")
            )

        over_cap = pending.filter(F.col("_hops") >= 20)
        done_parts.append(
            over_cap.withColumn("has_response", F.lit(False))
            .withColumn("status", F.lit(0))
            .withColumn(
                "fetch_failures",
                F.array_union(
                    F.col("fetch_failures"),
                    F.array(F.lit("TypeError: redirect count exceeded")),
                ),
            )
            .drop("_target", "_pending")
        )
        pending = pending.filter(F.col("_hops") < 20)

        # 303 switches the method to GET (fetch spec); compute before the
        # fetch columns are dropped for the next hop.
        pending = pending.withColumn(
            "_nxt_method",
            F.when(F.col("status") == 303, F.lit("GET")).otherwise(F.col("method_effective")),
        )
        origin = lambda c: F.lower(  # noqa: E731 — scheme://authority
            F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z\d+\-.]*://[^/?#]*)", 1))
        hop_req = (
            pending.drop(*[c for c in FETCH_COLS if c not in
                           ("redirect_skipped", "fetch_failures")])
            .withColumn("_hops", F.col("_hops") + 1)
            .withColumn(
                "_strip_sensitive",
                F.col("_strip_sensitive")
                | (origin(F.col("_cur_url")) != origin(F.col("_target"))),
            )
            .withColumn("url", F.col("_target"))
            .drop("_target", "_pending")
        )
        cur = (
            requester(hop_req, F.col("_nxt_method"))
            .drop("_nxt_method")
            .withColumn("_cur_url", F.col("url"))
        )

    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    # restore the original requested URL; record where we landed
    return (
        out.withColumn(
            "final_url",
            F.coalesce(
                F.col("final_url"),
                F.when(F.col("_cur_url") != F.col("_orig_url"), F.col("_cur_url")),
            ),
        )
        .withColumn("url", F.col("_orig_url"))
        .drop("_hops", "_cur_url", "_strip_sensitive")
    )


def fetch_once(
    df: DataFrame,
    pages_dim: DataFrame,
    method: Column,
    cfg: CheckOptions,
    skip_match,
    host_defaults: DataFrame | None = None,
    requester=None,
    chain_bc=None,
    cache_into: list | None = None,
) -> DataFrame:
    """request + (conditionally) redirect following.

    redirects='error' -> manual mode: the first 3xx is returned as-is
    (index.ts:351-352). Otherwise follow with the 20-hop cap. Pass
    `requester` (e.g. http_fetch.make_live_requester) to fetch over the
    network instead of the scripted tables. `cache_into`: a list the caller
    drains/unpersists per wave; when given, the chain path persists the
    first-hop fetch so its 3 plan branches (non-redirect bypass, settled
    chains, landing refetch) scan the cache instead of re-running the
    fetch join 3x.
    """
    static = (cfg.static_http_server_host or "").rstrip("/") or None
    if requester is None:
        def requester(d, m):
            return request(d, pages_dim, m, host_defaults,
                           static_prefix=static)

    tagged = df.withColumn("_orig_url", F.col("url"))
    first = requester(tagged, method)
    if cfg.redirects == "error":
        return (
            first.withColumn("redirect_skipped", F.lit(None).cast("string"))
            .withColumn(
                "fetch_failures",
                F.when(
                    ~F.col("has_response"),
                    F.array(F.lit("FetchError: request failed")),
                ).otherwise(F.array().cast("array<string>")),
            )
            .withColumn("url", F.col("_orig_url"))
            .drop("_orig_url")
        )
    if chain_bc is not None:
        if cache_into is not None:
            first = first.persist()
            cache_into.append(first)
        followed = follow_redirects_chain(first, requester, chain_bc,
                                          getattr(cfg, "links_to_skip", None),
                                          static_prefix=static)
    else:
        followed = follow_redirects(first, requester, skip_match,
                                    cache_into=cache_into)
    return followed.withColumn(
        "fetch_failures",
        F.when(
            ~F.col("has_response") & (F.size("fetch_failures") == 0),
            F.array(F.lit("FetchError: request failed")),
        ).otherwise(F.col("fetch_failures")),
    ).drop("_orig_url")


def with_body_flag(df: DataFrame) -> DataFrame:
    """GET responses with a scripted body have a readable body; HEAD never
    does (fetch semantics the reference relies on for recursion)."""
    return df.withColumn(
        "has_body",
        F.col("has_response")
        & (F.col("method_effective") == "GET")
        & (F.col("body_doc_id") != ""),
    )


def fetch_wave_fused(
    df: DataFrame,
    chain_bc,          # broadcast of build_chain_map(pages) — full payload
    cfg: CheckOptions,
) -> DataFrame:
    """The whole per-wave scripted request choreography in ONE mapInPandas
    stage: method pick (GET when crawling, else HEAD), redirect chains with
    per-hop skip + 20-hop cap + 303→GET, 405→GET fallback, last-gasp GET
    for non-2xx leaf checks, static-server query rules and host-default
    404s — everything `fetch_once` + the crawler's fallback blocks do
    across ~3 broadcast-join plans and 2 driver aggregates
    (src/index.ts:344-417, 1185-1286 semantics).

    Small-wave path only: tail waves of a big crawl and fixture-scale
    crawls are driver-latency-bound, not data-bound — a 4-row frontier
    paying ~30 stages per wave is the cost anatomy this removes. The
    caller must pass a SINGLE-partition df (coalesce(1)): the 405 and
    last-gasp fallbacks are gated per wave batch, exactly like the staged
    path's one aggregate over the whole wave. Big waves keep the staged
    plan; live mode keeps http_fetch. Output is column-identical to
    `fetch_once` (+405/lg applied); equivalence is asserted by
    tests/test_fused_fetch.py and the crawl oracles."""
    from pyspark.sql.types import (
        ArrayType, BooleanType, IntegerType, StringType, StructField,
        StructType,
    )

    static = (cfg.static_http_server_host or "").rstrip("/") or None
    skip_fn = _make_py_skip(getattr(cfg, "links_to_skip", None))
    follow = cfg.redirects != "error"
    hd_map = {}
    if cfg.static_http_server_host:
        from linkinator_spark.functions.urls import url_host_py

        # mirrors sources/localfs.host_defaults_for (config-derived, O(1))
        hd_map[url_host_py(cfg.static_http_server_host)] = (
            404, "text/plain; charset=UTF-8")

    out_schema = StructType(
        list(df.schema.fields) + [
            StructField("status", IntegerType()),
            StructField("has_response", BooleanType()),
            StructField("content_type", StringType()),
            StructField("location", StringType()),
            StructField("retry_after", StringType()),
            StructField("cf_mitigated", BooleanType()),
            StructField("final_url", StringType()),
            StructField("body_doc_id", StringType()),
            StructField("redirect_skipped", StringType()),
            StructField("fetch_failures", ArrayType(StringType())),
            StructField("method_effective", StringType()),
        ]
    )

    fetcher = make_fused_fetcher(chain_bc, cfg)

    def fn(batches):
        import pandas as pd

        # one frame per partition: the 405/last-gasp passes are gated over
        # the WHOLE wave batch (the caller coalesces to one partition),
        # mirroring the staged path's single aggregate
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = (pd.concat(pdfs, ignore_index=True)
                   if len(pdfs) > 1 else pdfs[0])
            fetched = fetcher(pdf.to_dict("records"))
            out = pdf.copy()
            for col in ("status", "has_response", "content_type", "location",
                        "retry_after", "cf_mitigated", "final_url",
                        "body_doc_id", "redirect_skipped", "fetch_failures",
                        "method_effective"):
                out[col] = [f[col] for f in fetched]
            yield out

    return df.mapInPandas(fn, out_schema)


def make_fused_fetcher(chain_bc, cfg: CheckOptions):
    """Row-level twin of the staged fetch complex, shared by
    `fetch_wave_fused` and `wave_fused.run_wave_fused`: returns
    ``fetch(rows) -> list[dict]`` where each input row dict carries
    (url, crawl, attempt) and each output dict carries the 11 fetch
    columns. The 405/last-gasp fallbacks are gated over the WHOLE rows
    list (the wave batch), mirroring the staged path's single aggregate."""
    static = (cfg.static_http_server_host or "").rstrip("/") or None
    skip_fn = _make_py_skip(getattr(cfg, "links_to_skip", None))
    follow = cfg.redirects != "error"
    hd_map = {}
    if cfg.static_http_server_host:
        from linkinator_spark.functions.urls import url_host_py as _uh

        # mirrors sources/localfs.host_defaults_for (config-derived, O(1))
        hd_map[_uh(cfg.static_http_server_host)] = (
            404, "text/plain; charset=UTF-8")

    def fetch(rows: list, method_override: str | None = None,
              fallbacks: bool = True) -> list:
        """Default: the full wave-batch choreography. With
        ``method_override='GET', fallbacks=False`` it twins the staged
        ``_refetch`` (a plain chain-following GET with no 405/last-gasp
        batch passes — the fragment body-refetch shape)."""
        from linkinator_spark.functions.urls import url_host_py

        cmap = chain_bc.value

        def base_request(url: str, method: str, attempt: int) -> dict:
            """One `request()` twin: best-attempt pick, host-default 404,
            static query-strip lookup + dir-301 query preservation."""
            import re

            key = url
            if static and url.startswith(static):
                key = re.sub(r"\?[^#]*$", "", key)
            beh = cmap.get((key, method))
            picked = _pick_attempt(beh, attempt) if beh else None
            if picked is None:
                d = hd_map.get(url_host_py(url))
                if d is not None:
                    return {"status": d[0], "has_response": True,
                            "location": None, "retry_after": None,
                            "cf": False, "ct": d[1], "body_doc": "",
                            "final_url": None}
                return {"status": 0, "has_response": False, "location": None,
                        "retry_after": None, "cf": False, "ct": "",
                        "body_doc": "", "final_url": None}
            _, status, location, retry_after, cf, ct, body_doc, final = picked
            if static and location is not None and url.startswith(static):
                m = re.search(r"(\?[^#]*)$", url)
                if m:
                    location = location + m.group(1)
            return {"status": int(status) if status is not None else 0,
                    "has_response": status is not None,
                    "location": location, "retry_after": retry_after,
                    "cf": bool(cf), "ct": ct if ct is not None else "",
                    "body_doc": body_doc or "", "final_url": final}

        def unit(url: str, method: str, attempt: int):
            """One `fetch_once` twin: request + chain follow + failure
            padding. Returns (resp, redirect_skipped, failures,
            method_effective, final_url)."""
            r = base_request(url, method, attempt)
            failures: list[str] = []
            rskip = None
            stop = url
            meth = method
            landed = False
            status, loc = r["status"], r["location"]
            if (follow and r["has_response"] and status in REDIRECT_STATUSES
                    and loc is not None):
                cur, hops = url, 0
                while True:
                    nxt = _resolve_location_py(cur, loc)
                    if skip_fn is not None and skip_fn(nxt):
                        # keep the current hop's (redirect) response values;
                        # non-status fields stay the FIRST response's —
                        # exactly the chain resolver's behavior
                        rskip, stop = nxt, cur
                        r = dict(r, status=status, location=loc)
                        break
                    if hops >= 20:
                        r = dict(r, status=0, has_response=False,
                                 location=loc)
                        failures.append("TypeError: redirect count exceeded")
                        stop = cur
                        break
                    if status == 303:
                        meth = "GET"
                    hops += 1
                    key = nxt
                    if static and nxt.startswith(static) and "?" in nxt:
                        key = nxt.split("?", 1)[0]
                    beh = cmap.get((key, meth))
                    picked = _pick_attempt(beh, attempt) if beh else None
                    if (picked is None or picked[1] not in REDIRECT_STATUSES
                            or picked[2] is None):
                        r = base_request(nxt, meth, attempt)
                        stop = nxt
                        landed = True
                        break
                    cur, status, loc = nxt, picked[1], picked[2]
            if not r["has_response"] and not failures:
                failures = ["FetchError: request failed"]
            # only a chain that LANDED carries the (possibly 303-switched)
            # follow-up method; settled/skip/cap rows keep the request's
            meth_eff = meth if landed else method
            final = r["final_url"] if r["final_url"] is not None else (
                stop if stop != url else None)
            return r, rskip, failures, meth_eff, final

        n = len(rows)
        urls = [r["url"] for r in rows]
        crawls = [bool(r["crawl"]) for r in rows]
        attempts = [int(r["attempt"]) for r in rows]
        units = [unit(urls[i],
                      method_override or ("GET" if crawls[i] else "HEAD"),
                      attempts[i]) for i in range(n)]

        def bad(r):
            return (not r["has_response"] or r["status"] < 200
                    or r["status"] >= 300)

        # 405 -> GET fallback, then last-gasp GET — wave-batch gated
        # exactly like the staged path's shared aggregate: the lg pass
        # only runs when some NON-405 row needed it pre-refetch
        # (post-refetch when a 405 pass ran), and then applies to every
        # still-bad leaf row (crawler.py lg_cond/lg_full distinction)
        if fallbacks and any(
                u[0]["status"] == 405 and u[1] is None for u in units):
            for i, u in enumerate(units):
                if u[0]["status"] == 405 and u[1] is None:
                    r, rskip, f, me, fin = unit(urls[i], "GET", attempts[i])
                    units[i] = (r, rskip, u[2] + f, me, fin)
        if fallbacks and any(bad(u[0]) and not crawls[i] and u[1] is None
                             and u[0]["status"] != 405
                             for i, u in enumerate(units)):
            for i, u in enumerate(units):
                if bad(u[0]) and not crawls[i] and u[1] is None:
                    r, rskip, f, me, fin = unit(urls[i], "GET", attempts[i])
                    units[i] = (r, rskip, u[2] + f, me, fin)

        return [
            {"status": u[0]["status"], "has_response": u[0]["has_response"],
             "content_type": u[0]["ct"], "location": u[0]["location"],
             "retry_after": u[0]["retry_after"], "cf_mitigated": u[0]["cf"],
             "final_url": u[4], "body_doc_id": u[0]["body_doc"],
             "redirect_skipped": u[1], "fetch_failures": u[2],
             "method_effective": u[3]}
            for u in units
        ]

    return fetch
