"""SURT keys + CDX-style capture index over the crawl's fetch history.

Web archives index captures by SURT (Sort-friendly URI Reordering
Transform — the public Internet Archive / Heritrix / pywb convention:
reverse the host's dot-segments so all of a domain's URLs sort together,
``com,example)/path``) and deduplicate storage by payload digest (a WARC
``revisit`` record replaces a byte-identical re-fetch of the same URL).
The reference (JustinBeckwith/linkinator) runs one-shot and keeps no
capture history; at crawl tier the standing fetch history IS a table and
the index is a projection + one bounded window over it.

Design notes (100-TB lens):

* ``surt_key`` is a pure single-pass codegen projection — regexp splits,
  an array reverse and an array sort, no UDF, no shuffle. The DuckDB twin
  ``surt_sql`` lives next to it so the oracle and the engine share ONE
  definition point (the graphgen pattern); both sides stay inside the
  Java-regex ∩ RE2-safe subset used by text.py's PII pass.
* ``cdx_index`` shuffles once on ``url`` (uniform key — the politeness
  scheduler caps per-URL refetch rate, so a URL's capture history is
  bounded by crawl age, not corpus size; the lag window never sees a hot
  partition) and ranks the index globally with the scale-safe
  ``global_fifo_rank`` (range-partition + per-partition offsets) instead
  of a single-task ``ORDER BY surt, ts`` — the same machinery the
  frontier's reference-FIFO rank uses. Writing physical CDX runs is then
  a ``repartitionByRange(surt, ts)`` + ``sortWithinPartitions`` write,
  Spark's native distributed total-order shape.

SURT subset implemented (applied to an absolute http(s) URL):
lowercase everything; strip fragment and userinfo; drop a leading
``www`` / ``www<digits>`` host label; strip default ports (http:80,
https:443) but keep explicit non-default ports; reverse host labels
joined by commas + ``)``; empty path becomes ``/``; query parameters are
sorted bytewise (first ``?`` starts the query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkinator_spark.operators.politeness import global_fifo_rank

# shared regex fragments — Java ∩ RE2 safe (no backrefs, no lookaround)
_NETLOC_RE = "^[a-z]+://([^/?#]*)"
_SCHEME_RE = "^([a-z]+)://"
_PORT_RE = ":([0-9]+)$"
_WWW_RE = "^www[0-9]*\\."


def surt_key(url: Column | str) -> Column:
    """SURT key of an absolute http(s) URL — pure codegen, no UDF."""
    u = F.lower(F.col(url) if isinstance(url, str) else url)
    u = F.split_part(u, F.lit("#"), F.lit(1))          # strip fragment
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    netloc = F.regexp_extract(u, _NETLOC_RE, 1)
    netloc = F.regexp_replace(netloc, "^[^@]*@", "")   # strip userinfo
    port = F.regexp_extract(netloc, _PORT_RE, 1)
    host = F.regexp_replace(netloc, ":[0-9]+$", "")
    host = F.regexp_replace(host, _WWW_RE, "")
    revhost = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443"))
    portpart = F.when((port != "") & ~default,
                      F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    rest = F.regexp_replace(u, "^[a-z]+://[^/?#]*", "")
    path = F.split_part(rest, F.lit("?"), F.lit(1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qpos = F.locate("?", rest)
    query = F.when(qpos > 0, F.substring(rest, qpos + 1, 1 << 24)).otherwise(
        F.lit(""))
    sortedq = F.when(
        query != "",
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")),
                                          "&")),
    ).otherwise(F.lit(""))
    return F.concat(revhost, portpart, F.lit(")"), path, sortedq)


def surt_sql(expr: str) -> str:
    """DuckDB twin of :func:`surt_key` — same steps, verbatim-spliced
    ``expr``. Kept adjacent so a semantics change edits one file."""
    u = f"split_part(lower({expr}), '#', 1)"
    return f"""(
      with s(u) as (select {u})
      select
        array_to_string(list_reverse(string_split(
            regexp_replace(regexp_replace(regexp_replace(
                regexp_extract(u, '{_NETLOC_RE}', 1),
                '^[^@]*@', ''), ':[0-9]+$', ''), '{_WWW_RE}', ''),
            '.')), ',')
        || (case when regexp_extract(regexp_replace(
                    regexp_extract(u, '{_NETLOC_RE}', 1), '^[^@]*@', ''),
                    ':([0-9]+)$', 1) <> ''
              and not ((regexp_extract(u, '{_SCHEME_RE}', 1) = 'http'
                        and regexp_extract(regexp_replace(
                            regexp_extract(u, '{_NETLOC_RE}', 1),
                            '^[^@]*@', ''), ':([0-9]+)$', 1) = '80')
                    or (regexp_extract(u, '{_SCHEME_RE}', 1) = 'https'
                        and regexp_extract(regexp_replace(
                            regexp_extract(u, '{_NETLOC_RE}', 1),
                            '^[^@]*@', ''), ':([0-9]+)$', 1) = '443'))
            then ':' || regexp_extract(regexp_replace(
                    regexp_extract(u, '{_NETLOC_RE}', 1), '^[^@]*@', ''),
                    ':([0-9]+)$', 1)
            else '' end)
        || ')'
        || (case when split_part(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                                 '?', 1) = '' then '/'
            else split_part(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                            '?', 1) end)
        || (case when strpos(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                             '?') > 0
              and substr(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                         strpos(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                                '?') + 1) <> ''
            then '?' || array_to_string(list_sort(string_split(
                substr(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                       strpos(regexp_replace(u, '^[a-z]+://[^/?#]*', ''),
                              '?') + 1),
                '&')), '&')
            else '' end)
      from s
    )"""


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    with_rank: bool = True,
) -> DataFrame:
    """CDX-style capture index over a fetch history.

    Input: one row per capture with (`url_col`, `ts_col`, ``status``,
    ``digest``, ``length``). Output adds:

    * ``surt`` — the sort key (:func:`surt_key`);
    * ``record_type`` — ``'revisit'`` when the payload digest equals the
      SAME URL's previous capture (the WARC dedup rule: store a pointer,
      not the bytes), else ``'response'``;
    * ``saved_bytes`` — ``length`` for revisit rows (storage the dedup
      avoids), 0 otherwise;
    * ``idx_rank`` — the global (surt, ts) ordinal via the range-partition
      rank (only when ``with_rank``; callers must guarantee (surt, ts)
      uniqueness, which any (url, ts)-unique history with ts-disjoint
      surt-collisions satisfies).

    One shuffle (the per-``url`` lag window, uniform key, bounded
    partitions); the rank adds the frontier's standard two-small-window
    range rank — nothing driver-side, nothing all-pairs.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col)
    idx = (
        captures
        .withColumn("surt", surt_key(url_col))
        .withColumn("_prev", F.lag("digest").over(w))
        .withColumn(
            "record_type",
            F.when(F.col("_prev").isNotNull()
                   & (F.col("_prev") == F.col("digest")),
                   F.lit("revisit")).otherwise(F.lit("response")))
        .withColumn(
            "saved_bytes",
            F.when(F.col("record_type") == "revisit",
                   F.col("length").cast("long")).otherwise(F.lit(0)))
        .drop("_prev")
    )
    if with_rank:
        idx = global_fifo_rank(idx, "surt", ts_col, out_col="idx_rank")
    return idx
