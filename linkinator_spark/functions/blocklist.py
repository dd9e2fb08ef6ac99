"""Domain-blocklist URL filtering (the UT1-style curation gate used by
RefinedWeb / FineWeb: drop documents whose URL host falls under a listed
domain).

Semantics: a host is blocked iff it EQUALS a listed domain or is a
SUBDOMAIN of one (`ads.example` blocks `ads.example` and
`cdn.ads.example`, never `bads.example`). That is exactly suffix-set
membership over the host's dot-separated label suffixes, so the match
is a JOIN, not a per-rule regex scan:

  host "a.b.c.d"  →  suffixes {a.b.c.d, b.c.d, c.d, d}  →  join rules

Scale shape (100-TB lens): the explode is bounded by the host's label
count (≈ ≤10), so the probe side is O(10·URLs) rows; with a list that
fits an executor (UT1 is ~4M domains, tens of MB) the join is BROADCAST
— zero shuffle of the URL table, dropped map-side. A larger list falls
back to a shuffle join keyed on the suffix; only suffixes that are
themselves listed rules can be hot there (a non-rule 'com' never
survives the build side). The most-specific (longest) matching rule is
attributed via max_by — deterministic because a host's suffixes have
pairwise-distinct lengths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["host_suffixes", "apply_blocklist", "blocklist_oracle_sql"]


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    'a.b.c' → ['a.b.c', 'b.c', 'c']. Pure codegen array ops."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."))


def apply_blocklist(
    urls: DataFrame, rules: DataFrame,
    url_col: str = "url", host_col: str = "host",
    rule_col: str = "domain", broadcast_rules: bool = True,
) -> DataFrame:
    """Tag every row of `urls` with its blocklist verdict.

    `urls` needs a `host_col` (lowercase host; derive with
    functions/urls.url_host or a regexp over url_col). `rules` is one
    lowercase domain per row in `rule_col`.

    Output: all original columns of `urls` plus (blocked:int,
    matched_domain:string|null) where matched_domain is the longest
    (most specific) listed domain covering the host. Keep the clean
    set with `.filter("blocked = 0")`."""
    probe = urls.select(
        url_col, host_col,
        F.explode(host_suffixes(F.col(host_col))).alias("_sfx"))
    build = rules.select(F.col(rule_col).alias("_sfx"))
    build = F.broadcast(build) if broadcast_rules else build
    hits = (
        probe.join(build, "_sfx")
        .groupBy(url_col).agg(
            F.max_by("_sfx", F.length("_sfx")).alias("matched_domain"))
    )
    return (
        urls.join(hits, url_col, "left")
        .select(
            *urls.columns,
            F.col("matched_domain").isNotNull().cast("int")
            .alias("blocked"),
            "matched_domain",
        )
    )


def blocklist_oracle_sql(
    urls_sql: str, rules_values: list[str],
    url_col: str = "url", host_col: str = "host",
) -> str:
    """DuckDB twin of apply_blocklist: identical suffix explode + join +
    longest-match attribution (arg_max)."""
    vals = ", ".join(f"('{d}')" for d in rules_values)
    return f"""
        with urls as ({urls_sql}),
        rules(domain) as (values {vals}),
        sfx as (
          select {url_col}, unnest(
            list_transform(range(1, len(string_split({host_col}, '.')) + 1),
              i -> list_aggregate(
                     string_split({host_col}, '.')[i:],
                     'string_agg', '.'))) as s
          from urls
        ),
        hits as (
          select {url_col}, arg_max(s, length(s)) as matched_domain
          from sfx join rules on s = domain
          group by {url_col}
        )
        select u.*,
               case when h.matched_domain is not null then 1 else 0 end
                 as blocked,
               h.matched_domain
        from urls u left join hits h using ({url_col})
    """
