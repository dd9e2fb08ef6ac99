"""Crawl-trap detection: URL-template explosion analysis.

A crawler trap is a host whose link graph manufactures unbounded URL
variants of one underlying page family — calendars (`/cal/2024/06/17`),
session ids, sort/filter permutations. At a 10^10-URL frontier, traps
are what turn a polite per-host queue into an infinite one, so frontier
hygiene flags them BEFORE scheduling (the classic heritrix/Nutch
"path-repetition + template explosion" heuristics, e.g. Heydon &
Najork, "Mercator: A scalable, extensible Web crawler", WWW 1999 §4).

The detector canonicalizes every URL to its TEMPLATE — digit runs in
the PATH (never the scheme://authority prefix, so `site1.example` and
`site2.example` stay distinct families) collapse to `N`, query VALUES
collapse to `*` while query keys are kept sorted — and counts distinct
URLs per (host, template). A template whose distinct-URL count crosses
`threshold` is a trap family; its URLs can then be dropped or
budget-capped by joining the verdict back on (host, template).

Determinism: the template is a pure regexp/array projection (Java regex
∩ RE2-safe: classes and bounded constructs only), so Spark and DuckDB
produce identical templates and identical counts.

Scale shape (100-TB lens): one projection + one groupBy on
(host, template). The count partial-aggregates map-side, so even a
10^9-URL trap family reaches its reducer as one partial count per
upstream task — the template key is "hot" precisely when it IS a trap,
and that hotness never materializes as shuffled rows. No driver state,
no window, no join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_template", "detect_traps", "traps_oracle_sql"]

# one-or-more digits anywhere in the path collapse to a single N
_DIGITS_RE = r"[0-9]+"
# a query pair `key=value` keeps the key, drops the value
_QVAL_RE = r"=[^&]*"


# scheme://authority — kept verbatim so digit-bearing hosts/ports never
# collapse into one family
_AUTH_RE = r"^([a-z][a-z0-9+.-]*://[^/?#]*)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"


def url_template(url: Column) -> Column:
    """Collapse a URL to its trap-family template.

    `http://h1.example/cal/2024/06/17?sess=abc&page=2` →
    `http://h1.example/cal/N/N/N?page=*&sess=*` (PATH digit runs → N —
    the authority stays verbatim, so `h1` does not become `hN` —
    query values → *, query keys sorted so permuted parameter orders
    meet in one family)."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    path = F.concat(
        auth,
        F.regexp_replace(
            F.regexp_extract(url, _PATH_RE, 1), _DIGITS_RE, "N"))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    qnorm = F.array_join(
        F.array_sort(F.filter(
            F.split(F.regexp_replace(query, _QVAL_RE, "=*"), "&"),
            lambda p: F.length(p) > 0)),
        "&")
    return F.concat(
        path,
        F.when(F.length(qnorm) > 0, F.concat(F.lit("?"), qnorm))
        .otherwise(F.lit("")))


def detect_traps(
    urls: DataFrame, threshold: int = 50,
    url_col: str = "url", host_col: str = "host",
) -> DataFrame:
    """Aggregate URL templates per host and flag trap families.

    Output, one row per (host, template):
      (host, template, n_urls:long, is_trap:int)
    where n_urls counts DISTINCT urls in the family and is_trap is 1
    iff n_urls >= threshold. Join back on (host, template) of a
    candidate URL to gate the frontier — the template alone is not a
    key (different hosts can share a collapsed path shape)."""
    t = urls.select(
        F.col(host_col).alias("host"),
        url_template(F.col(url_col)).alias("template"),
        F.col(url_col).alias("u"),
    )
    return (
        t.groupBy("host", "template")
        .agg(F.count_distinct("u").alias("n_urls"))
        .select(
            "host", "template",
            F.col("n_urls").cast("long").alias("n_urls"),
            (F.col("n_urls") >= threshold).cast("int").alias("is_trap"),
        )
    )


def traps_oracle_sql(
    urls_sql: str, threshold: int = 50,
    url_col: str = "url", host_col: str = "host",
) -> str:
    """DuckDB twin of detect_traps over a urls subquery with the same
    columns — identical template regexes and counts. The normalized
    query string is computed ONCE in its own CTE column so the Spark
    twin (url_template) has a single expression to stay in lockstep
    with."""
    return f"""
        with urls as ({urls_sql}),
        q as (
          select {host_col} as host, {url_col} as u,
                 regexp_extract({url_col}, '{_AUTH_RE}', 1)
                 || regexp_replace(
                      regexp_extract({url_col}, '{_PATH_RE}', 1),
                      '{_DIGITS_RE}', 'N', 'g') as p,
                 array_to_string(list_sort(list_filter(
                   string_split(regexp_replace(
                     regexp_extract({url_col}, '\\?([^#]*)', 1),
                     '{_QVAL_RE}', '=*', 'g'), '&'),
                   x -> length(x) > 0)), '&') as qnorm
          from urls),
        t as (
          select host, u,
                 p || case when length(qnorm) > 0
                           then '?' || qnorm else '' end as template
          from q)
        select host, template,
               count(distinct u)::bigint as n_urls,
               case when count(distinct u) >= {threshold} then 1 else 0 end
                 as is_trap
        from t group by host, template
    """
