"""robots.txt politeness.

The reference has no robots support; the north_star adds it ("per-host
politeness priority queue ... robots.txt-aware"). Design: robots.txt is
fetched once per host in wave 0 (here: joined from the scripted pages table,
exactly like any other fetch), parsed into per-host prefix rules, and
broadcast as a `host_rules` dimension. Frontier rows matching a Disallow
prefix (and not a longer Allow prefix) are tagged SKIPPED before fetch;
Crawl-delay feeds the per-host delay gate.

Rule matching follows RFC 9309: user-agent sections, '*' wildcards anywhere
in a rule, a trailing '$' end-anchor, most-specific match (longest raw rule,
wildcards counted) with Allow winning exact ties. Plain prefix rules — the
overwhelming majority on the real web — stay on a cheap startswith path;
only rules that actually contain '*' or a trailing '$' pay regex matching,
and their regexes are precomputed per RULE on the O(hosts) dimension, never
per frontier row.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "host string, disallow array<string>, allow array<string>, crawl_delay double"
)


def parse_robots_txt(body: str, user_agent: str = "*") -> dict:
    """-> {'disallow': [...], 'allow': [...], 'crawl_delay': float|None}.
    Rules from the matching user-agent group(s); '*' group applies when no
    specific group matches."""
    groups: list[tuple[list[str], dict]] = []
    cur_agents: list[str] = []
    cur_rules: dict = {"disallow": [], "allow": [], "crawl_delay": None}
    started_rules = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if started_rules and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], {"disallow": [], "allow": [], "crawl_delay": None}
                started_rules = False
            cur_agents.append(value.lower())
        elif key in ("disallow", "allow", "crawl-delay"):
            started_rules = True
            if key == "disallow" and value:
                cur_rules["disallow"].append(value)
            elif key == "allow" and value:
                cur_rules["allow"].append(value)
            elif key == "crawl-delay":
                try:
                    cur_rules["crawl_delay"] = float(value)
                except ValueError:
                    pass
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    ua = user_agent.lower()
    # specific match beats the wildcard group
    for agents, rules in groups:
        if any(a != "*" and a in ua for a in agents):
            return rules
    for agents, rules in groups:
        if "*" in agents:
            return rules
    return {"disallow": [], "allow": [], "crawl_delay": None}


# robots.txt bodies are untrusted input and each '*' compiles to a '.*'
# regex group; a hostile rule with many wildcards drives polynomial
# backtracking in re.match / regexp_like executor tasks. RFC 9309 lets a
# parser impose limits, so: consecutive '*' runs collapse (semantically
# identical), and rules still over the wildcard cap degrade
# CONSERVATIVELY by direction — a Disallow falls back to its literal
# prefix (a superset match: over-blocks, never under-blocks) while an
# Allow is DROPPED (a superset Allow would win the longest-raw-rule
# tie-break and let the crawler fetch paths the site disallowed).
# Either way the crawler errs toward politeness on adversarial input.
_MAX_WILDCARDS = 16


def _rule_over_cap(rule: str) -> bool:
    """True when the ('*'-run-collapsed) rule exceeds the wildcard cap."""
    body = rule[:-1] if rule.endswith("$") else rule
    return re.sub(r"\*+", "*", body).count("*") > _MAX_WILDCARDS


@lru_cache(maxsize=4096)
def _rule_regex(rule: str) -> str:
    """RFC 9309 §2.2.3 rule -> anchored regex: '*' matches any char run,
    a trailing '$' anchors at end-of-path; all else is literal. Memoized:
    the fused gear calls this per (row, rule) and rulesets repeat.
    Complexity-bounded per _MAX_WILDCARDS (see above)."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    body = re.sub(r"\*+", "*", body)
    if body.count("*") > _MAX_WILDCARDS:
        return "^" + re.escape(body.split("*", 1)[0])
    pat = ".*".join(re.escape(p) for p in body.split("*"))
    return "^" + pat + ("$" if anchored else "")


def robots_allowed(path: str, disallow: list[str], allow: list[str]) -> bool:
    """RFC 9309 §2.2.2 most-specific-match: the longest matching rule
    (raw octet length, wildcards counted — the de-facto Googlebot tie
    rule) wins; Allow wins exact ties. Rules support '*' anywhere and a
    trailing '$' end-anchor (§2.2.3)."""
    def best(rules: list[str], drop_over_cap: bool) -> int:
        hit = -1
        for r in rules or []:
            if drop_over_cap and _rule_over_cap(r):
                continue
            if re.match(_rule_regex(r), path) and len(r) > hit:
                hit = len(r)
        return hit

    # over-cap Allow rules are dropped, over-cap Disallow rules match by
    # literal prefix (see _MAX_WILDCARDS: both degrade toward politeness)
    return best(allow, True) >= best(disallow, False)


def host_rules_from_bodies(with_body: DataFrame,
                           user_agent: str = "*") -> DataFrame:
    """(host, body) -> per-host rule arrays, parsed in one Arrow batch pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                rules = parse_robots_txt(body, user_agent)
                rows.append((host, rules["disallow"], rules["allow"],
                             rules["crawl_delay"]))
            yield pd.DataFrame(
                rows, columns=["host", "disallow", "allow", "crawl_delay"]
            )

    return with_body.mapInPandas(fn, RULES_SCHEMA)


def host_rules_from_pages(pages: DataFrame, documents: DataFrame,
                          user_agent: str = "*") -> DataFrame:
    """Fetch+parse robots.txt for every host in the scripted web: join the
    per-host robots URL against pages/documents (the wave-0 robots fetch)."""
    robots_pages = pages.filter(
        F.col("url").rlike(r"^https?://[^/]+/robots\.txt$")
        & (F.col("method") == "GET") & (F.col("status") == 200)
    ).select("host", "body_doc_id")
    with_body = robots_pages.join(
        documents.select(F.col("doc_id").alias("body_doc_id"), "spans"), "body_doc_id"
    ).select(
        "host",
        F.concat_ws("", F.transform(F.col("spans"), lambda s: s["text"])).alias("body"),
    )
    return host_rules_from_bodies(with_body, user_agent)


def _rule_structs(rules_col, allow: bool = False):
    """Per-rule match precomputation, evaluated once per RULE on the
    O(hosts) dimension (inside F.transform over the rule array), never
    per frontier row: (wild, pat, len) where plain prefix rules keep the
    raw prefix for a cheap startswith and only rules containing '*' or a
    trailing '$' get the compiled-at-match-time regex. JVM twin of
    _rule_regex: trailing '$' anchors, '*' -> '.*', else literal."""
    def one(r):
        anchored = r.endswith("$")
        body = F.when(anchored, F.substr(r, F.lit(1), F.length(r) - 1)
                      ).otherwise(r)
        # JVM twin of _rule_regex's complexity bound: collapse '*' runs,
        # and over-cap rules degrade to a plain prefix match on the text
        # before the first '*' (untrusted robots bodies must not compile
        # to backtracking-heavy '.*'-chained regexes)
        body = F.regexp_replace(body, F.lit(r"\*+"), F.lit("*"))
        nstars = F.length(body) - F.length(
            F.regexp_replace(body, F.lit(r"\*"), F.lit("")))
        over = nstars > _MAX_WILDCARDS
        wild = (r.contains("*") | anchored) & ~over
        escaped = F.regexp_replace(
            body, F.lit(r"([.\[\]{}()+?^$|\\])"), F.lit(r"\\$1"))
        rex = F.concat(F.lit("^"),
                       F.regexp_replace(escaped, F.lit(r"\*"), F.lit(".*")),
                       F.when(anchored, F.lit("$")).otherwise(F.lit("")))
        # over-cap degrade is direction-aware (see _MAX_WILDCARDS):
        # Disallow -> literal prefix (over-blocks); Allow -> dead rule
        # (a path never starts with \x01, so it can never match and
        # can never win the specificity tie-break)
        prefix = (F.lit("\x01") if allow
                  else F.substring_index(body, "*", 1))
        return F.struct(wild.alias("wild"),
                        F.when(wild, rex)
                        .when(over, prefix).otherwise(r).alias("pat"),
                        F.length(r).alias("len"))

    return F.transform(rules_col, one)


_RULE_STRUCT_T = "array<struct<wild:boolean,pat:string,len:int>>"


def robots_filter(frontier: DataFrame, host_rules: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, disallowed) by broadcast rules join.
    The RFC 9309 rule match runs as JVM expressions over per-rule structs
    precomputed on the dimension side (see _rule_structs)."""
    dim = host_rules.withColumn(
        "_dis", _rule_structs(F.col("disallow"))
    ).withColumn("_alw", _rule_structs(F.col("allow"), allow=True))
    # `_path` must be a REAL column before the higher-order aggregate: a
    # free nested expression captured inside the HOF lambda can be carried
    # across join/filter pushdown into a plan where its `url` attribute no
    # longer binds (Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND, hit when
    # the filter pushes toward the broadcast side on a narrow frontier)
    joined = frontier.withColumn(
        "_path", F.regexp_replace(F.col("url"), r"^https?://[^/]+", "")
    ).join(F.broadcast(dim), "host", "left")

    def best_len(structs_col):
        # RFC 9309 most-specific match: longest RAW rule that matches
        # (wildcards counted in the length — the Googlebot tie rule,
        # mirrored by robots_allowed on the Python side)
        return F.aggregate(
            F.coalesce(structs_col, F.array().cast(_RULE_STRUCT_T)),
            F.lit(-1),
            lambda acc, s: F.greatest(
                acc,
                F.when(
                    F.when(s["wild"],
                           F.regexp_like(F.col("_path"), s["pat"]))
                    .otherwise(F.col("_path").startswith(s["pat"])),
                    s["len"],
                ).otherwise(F.lit(-1)),
            ),
        )

    allowed_cond = F.col("disallow").isNull() | (
        best_len(F.col("_alw")) >= best_len(F.col("_dis"))
    )
    tagged = joined.withColumn("_robots_ok", allowed_cond)
    drop = ["_robots_ok", "_path", "disallow", "allow", "crawl_delay",
            "_dis", "_alw"]
    allowed = tagged.filter(F.col("_robots_ok")).drop(*drop)
    disallowed = tagged.filter(~F.col("_robots_ok")).drop(*drop)
    return allowed, disallowed


def host_rules_live(hosts_df: DataFrame, cfg, user_agent: str = "*") -> DataFrame:
    """Live-mode robots: fetch /robots.txt ONCE per new host over the real
    network (Arrow-batched mapInPandas, keep-alive pooled per thread,
    honoring timeout, allow-insecure-certs, custom request headers, and
    HTTP(S)_PROXY/NO_PROXY exactly like the page-fetch stage — robots must
    not silently fail where pages succeed through a proxy). A transient
    error retries once on a fresh connection (the page path's stale
    keep-alive recovery). Status handling follows RFC 9309 §2.3.1:
    3xx Location is followed up to 5 hops (http→https and apex→www
    redirects are the common real-web case), 4xx (incl. 404) parses to
    empty rules (allow-all), and 5xx / still-unreachable / redirect-loop
    is treated as DISALLOW-ALL for this run — crawling a host whose
    robots.txt cannot be read would silently violate its policy. Either
    way the host gets a rules row so robots is probed once per host per
    run (RFC 9309 permits caching up to 24h; a run is shorter). Input:
    (host, url_sample); scheme and port ride the sample URL. The output
    unions into the same broadcast `host_rules` dim the table mode builds
    up front — at web scale the dim is O(hosts), the standard
    dimension-table shape."""
    import urllib.request

    from linkinator_spark.operators.http_fetch import (
        _HostConnections, _no_proxy,
    )

    timeout = (cfg.timeout / 1000.0) if cfg.timeout else 30.0
    insecure = bool(getattr(cfg, "insecure", False))
    ua = cfg.user_agent
    extra_headers = dict(cfg.headers or {})
    # driver-resolved, like make_live_requester: executor workers may
    # predate an env change
    proxies = urllib.request.getproxies()

    # RFC 9309 §2.3.1.2: crawlers should follow at least 5 redirect hops
    # before giving up; past that, treat as unreachable.
    max_hops = 5
    # synthetic body: parses to one Disallow:/ rule, i.e. disallow-all
    DISALLOW_ALL = "User-agent: *\nDisallow: /\n"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.parse import urljoin, urlsplit

        conns = _HostConnections(timeout, insecure)

        def fetch(robots_url: str) -> tuple[int, str, str]:
            """One GET of `robots_url` -> (status, location, body)."""
            parts = urlsplit(robots_url)
            scheme = parts.scheme or "http"
            hostname = parts.hostname or ""
            port = parts.port or (443 if scheme == "https" else 80)
            path = parts.path or "/robots.txt"
            if parts.query:
                path += "?" + parts.query
            proxy = proxies.get(scheme)
            if proxy and not _no_proxy(hostname, proxies):
                pparts = urlsplit(
                    proxy if "://" in proxy else "http://" + proxy)
                if scheme == "https":
                    conn_key = ("https", pparts.hostname or "",
                                pparts.port or 80, (hostname, port))
                else:
                    conn_key = ("http", pparts.hostname or "",
                                pparts.port or 80, None)
                    path = f"{scheme}://{parts.netloc}{path}"
            else:
                conn_key = (scheme, hostname, port, None)
            headers = {"User-Agent": ua, "Accept": "*/*",
                       "Host": parts.netloc, "Connection": "keep-alive"}
            headers.update(extra_headers)
            try:
                conn = conns.get(*conn_key)
                conn.request("GET", path, headers=headers)
                resp = conn.getresponse()
            except Exception:
                # stale keep-alive / transient failure: one fresh retry —
                # a momentary blip must not permanently misclassify robots
                # for the host (the rules row is recorded for the run)
                conns.drop(*conn_key)
                conn = conns.get(*conn_key)
                conn.request("GET", path, headers=headers)
                resp = conn.getresponse()
            raw = resp.read(1_000_000)
            while resp.read(65536):
                pass
            return (resp.status, resp.headers.get("Location") or "",
                    raw.decode("utf-8", errors="replace"))

        def one(host: str, sample: str) -> str:
            parts = urlsplit(sample)
            scheme = parts.scheme or "http"
            netloc = parts.netloc or host
            url = f"{scheme}://{netloc}/robots.txt"
            for _ in range(max_hops + 1):
                try:
                    status, location, body = fetch(url)
                except Exception:
                    return DISALLOW_ALL  # unreachable after retry
                if 300 <= status < 400 and location:
                    url = urljoin(url, location)
                    continue
                if 200 <= status < 300:
                    return body
                if 400 <= status < 500:
                    return ""  # no robots.txt -> everything allowed
                return DISALLOW_ALL  # 5xx / other: policy unreadable
            return DISALLOW_ALL  # redirect chain exceeded max_hops

        for pdf in batches:
            rows = []
            for host, sample in zip(pdf["host"], pdf["url_sample"]):
                rows.append((host, one(host, sample)))
            yield pd.DataFrame(rows, columns=["host", "body"])

    with_body = hosts_df.mapInPandas(fn, "host string, body string")
    return host_rules_from_bodies(with_body, user_agent)
