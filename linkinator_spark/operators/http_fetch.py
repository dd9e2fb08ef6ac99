"""Live-HTTP fetch stage: the drop-in replacement for the table-join
`request()` when crawling a real network instead of scripted tables.

Mirrors the reference's `makeRequest` single-hop semantics
(/root/reference/src/index.ts:1185-1286): one HTTP round-trip per row, NO
automatic redirect following (the shared `follow_redirects` loop applies the
20-hop cap / per-hop skip / 303→GET semantics identically for both
requesters), per-host connection reuse, honoring

* `CheckOptions.timeout` (ms; reference src/cli.ts:118-119 — a timed-out
  request reads as a failed fetch, status 0),
* `HTTP_PROXY` / `HTTPS_PROXY` / `NO_PROXY` env (reference
  src/index.ts:14-78 proxy agents),
* `CheckOptions.insecure` (skip TLS verification; reference
  test/test.insecure.ts).

Spark shape: an Arrow-batched `mapInPandas` stage; each partition drives a
thread pool of up to `cfg.concurrency` in-flight requests (I/O-bound — the
reference's Queue concurrency cap maps to pool size × partitions), with
per-(scheme, host, port) keep-alive connections reused across a partition's
rows. Page bodies come back as a `_live_spans` column in the documents-table
span shape, so the extraction pipeline is identical in both modes.
"""

from __future__ import annotations

import threading
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, StringType, StructField, StructType,
)

from linkinator_spark.config import CheckOptions

_SPAN_TYPE = ArrayType(StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
]))

_ADDED = [
    StructField("status", IntegerType()),
    StructField("has_response", BooleanType()),
    StructField("content_type", StringType()),
    StructField("location", StringType()),
    StructField("retry_after", StringType()),
    StructField("cf_mitigated", BooleanType()),
    StructField("final_url", StringType()),
    StructField("body_doc_id", StringType()),
    StructField("method_effective", StringType()),
    StructField("_live_spans", _SPAN_TYPE),
]

MAX_BODY_BYTES = 10 * 1024 * 1024

# dropped from user headers once a redirect chain crosses origins
# (reference stripSensitiveHeaders, src/index.ts:1292-1305)
SENSITIVE_HEADERS = {"authorization", "cookie", "proxy-authorization"}


def _span_kind(content_type: str) -> str | None:
    ct = (content_type or "").lower()
    if "text/html" in ct or "application/xhtml" in ct:
        return "html"
    if "text/css" in ct:
        return "css"
    if "markdown" in ct:
        return "markdown"
    if "text/plain" in ct:
        return "html"  # sniffable text; extraction gates on content_type
    return None


class _HostConnections:
    """Per-thread keep-alive connections keyed by (scheme, host, port)."""

    def __init__(self, timeout: float | None, insecure: bool):
        self._local = threading.local()
        self.timeout = timeout
        self.insecure = insecure

    def get(self, scheme: str, host: str, port: int,
            tunnel: tuple[str, int] | None = None):
        """`tunnel=(target_host, target_port)` makes a CONNECT tunnel
        through the proxy at (host, port) with TLS to the target."""
        import http.client
        import ssl

        pool = getattr(self._local, "pool", None)
        if pool is None:
            pool = self._local.pool = {}
        key = (scheme, host, port, tunnel)
        conn = pool.get(key)
        if conn is None:
            if scheme == "https":
                ctx = (ssl._create_unverified_context() if self.insecure
                       else ssl.create_default_context())
                conn = http.client.HTTPSConnection(
                    host, port, timeout=self.timeout, context=ctx)
                if tunnel is not None:
                    conn.set_tunnel(*tunnel)
            else:
                conn = http.client.HTTPConnection(
                    host, port, timeout=self.timeout)
            pool[key] = conn
        return conn

    def drop(self, scheme: str, host: str, port: int,
             tunnel: tuple[str, int] | None = None):
        pool = getattr(self._local, "pool", {})
        conn = pool.pop((scheme, host, port, tunnel), None)
        if conn is not None:
            try:
                conn.close()
            except OSError:
                pass


def _fetch_one(url: str, method: str, conns: _HostConnections,
               ua: str, proxies: dict, extra_headers: dict | None = None):
    """One HTTP round-trip. Returns the _ADDED tuple (sans method)."""
    from urllib.parse import urlsplit

    try:
        parts = urlsplit(url)
        scheme = parts.scheme
        host = parts.hostname or ""
        port = parts.port or (443 if scheme == "https" else 80)
        path = parts.path or "/"
        if parts.query:
            path += "?" + parts.query

        proxy = proxies.get(scheme)
        if proxy and not _no_proxy(host, proxies):
            pparts = urlsplit(proxy if "://" in proxy else "http://" + proxy)
            phost, pport = pparts.hostname or "", pparts.port or 80
            if scheme == "https":
                # CONNECT tunnel + TLS to the target (reference proxy agents,
                # src/index.ts:37-55 HttpsProxyAgent)
                conn_key = ("https", phost, pport, (host, port))
            else:
                conn_key = ("http", phost, pport, None)
                path = url  # absolute-form request line through the proxy
        else:
            conn_key = (scheme, host, port, None)
        conn = conns.get(*conn_key)

        headers = {"User-Agent": ua, "Accept": "*/*",
                   "Host": parts.netloc, "Connection": "keep-alive"}
        if extra_headers:
            # user keys win over the defaults (reference src/index.ts spreads
            # options.headers after its own)
            headers.update(extra_headers)
        try:
            conn.request(method, path, headers=headers)
            resp = conn.getresponse()
        except (OSError, Exception):
            # stale keep-alive or connect failure: drop and retry once on a
            # fresh connection (normal keep-alive race, not a crawl retry)
            conns.drop(*conn_key)
            conn = conns.get(*conn_key)
            conn.request(method, path, headers=headers)
            resp = conn.getresponse()

        hdrs = {k.lower(): v for k, v in resp.getheaders()}
        ct = hdrs.get("content-type", "")
        kind = _span_kind(ct)
        spans = None
        body_doc = ""
        if method != "HEAD":
            raw = resp.read(MAX_BODY_BYTES)
            # drain so the connection is reusable
            while resp.read(65536):
                pass
            if kind is not None and raw:
                try:
                    text = raw.decode("utf-8", errors="replace")
                    spans = [(kind, text, "", 0)]
                    body_doc = url
                except Exception:
                    pass
        else:
            resp.read()
        return (resp.status, True, ct, hdrs.get("location"),
                hdrs.get("retry-after"),
                "cf-mitigated" in hdrs, None, body_doc, method, spans)
    except Exception:
        return (0, False, "", None, None, False, None, "", method, None)


def _no_proxy(host: str, proxies: dict) -> bool:
    no = proxies.get("no", "")
    return any(host.endswith(h.strip()) for h in no.split(",") if h.strip())


def make_live_requester(cfg: CheckOptions):
    """-> requester(df, method_col) with the same output contract as
    `fetch.request` plus `_live_spans` (page bodies in span shape)."""
    timeout = (cfg.timeout / 1000.0) if cfg.timeout else 30.0
    insecure = getattr(cfg, "insecure", False)
    ua = cfg.user_agent
    extra_headers = dict(cfg.headers or {})
    stripped_headers = {k: v for k, v in extra_headers.items()
                        if k.lower() not in SENSITIVE_HEADERS}
    workers = max(1, min(int(cfg.concurrency or 100), 64))
    # resolve HTTP(S)_PROXY/NO_PROXY on the driver and ship in the closure:
    # executor worker processes may predate an env change, and the driver's
    # env is the reference's behavior (proxy-from-env, src/index.ts:37-55)
    import urllib.request

    proxies = urllib.request.getproxies()

    def live_request(df: DataFrame, method: Column) -> DataFrame:
        stale = [f.name for f in _ADDED if f.name in df.columns]
        req = df.drop(*stale).withColumn("_req_method", method)
        in_fields = [f for f in req.schema.fields if f.name != "_req_method"]
        out_schema = StructType(in_fields + _ADDED)
        in_names = [f.name for f in in_fields]

        def fn(batches) -> Iterator:
            import pandas as pd
            from concurrent.futures import ThreadPoolExecutor

            conns = _HostConnections(timeout, insecure)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    strips = (pdf["_strip_sensitive"].tolist()
                              if "_strip_sensitive" in pdf.columns
                              else [False] * len(pdf))
                    results = list(pool.map(
                        lambda t: _fetch_one(
                            t[0], t[1], conns, ua, proxies,
                            stripped_headers if t[2] else extra_headers),
                        zip(pdf["url"], pdf["_req_method"], strips),
                    ))
                    out = pdf[in_names].copy()
                    cols = list(zip(*results))
                    for i, fld in enumerate(_ADDED):
                        if fld.name == "method_effective":
                            out[fld.name] = pdf["_req_method"].to_numpy()
                        elif fld.name == "_live_spans":
                            out[fld.name] = pd.Series(
                                [c for c in cols[9]], index=pdf.index,
                                dtype=object)
                        else:
                            out[fld.name] = list(cols[i])
                    yield out

        return req.mapInPandas(fn, out_schema)

    return live_request
