"""Mirror-site detection over host-level content fingerprints.

Crawls hit the same corpus under many hostnames (CDN aliases, country
mirrors, scraped re-hosts). Doc-level dedup removes the duplicate
PAGES; this operator finds the duplicate SITES — host pairs whose
content-fingerprint sets overlap — so a frontier can deprioritize a
whole mirrored host instead of rediscovering each page. The reference
has no notion of this (single-site checker); it belongs to the
crawl-scale tier next to the Bloom/Cuckoo filters and crawl traps.

Scale shape (100-TB lens): hosts pair ONLY through shared fingerprints
(an equi-join on fp), never all-pairs over hosts. The classic hot key
— boilerplate content present on thousands of hosts, whose posting
list would pair quadratically — is dropped up front by a max_fp_df
gate (same reasoning as stopword pruning in the inverted index: a
fingerprint on >max_fp_df hosts identifies nothing). All aggregates
partial-combine map-side; the Jaccard is integer micro-points via
bigint division, so both engines agree exactly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gated_sets(pages: DataFrame, host_col: str, fp_col: str,
                max_fp_df: int) -> tuple[DataFrame, DataFrame]:
    """Shared pairing substrate: the distinct (host, fp) set with
    boilerplate fingerprints (df > max_fp_df) dropped, plus per-host
    set sizes over the SAME gated set."""
    d = (pages.select(F.col(host_col).alias("host"),
                      F.col(fp_col).alias("fp"))
         .distinct())
    fp_df = d.groupBy("fp").agg(F.count("*").alias("_df"))
    d = (d.join(fp_df, "fp").filter(F.col("_df") <= max_fp_df)
         .select("host", "fp"))
    sizes = d.groupBy("host").agg(F.count("*").alias("size"))
    return d, sizes


def host_mirrors(
    pages: DataFrame, host_col: str = "host", fp_col: str = "fp",
    min_jaccard_micro: int = 100_000, max_fp_df: int = 50,
) -> DataFrame:
    """Host pairs with Jaccard(fingerprint sets) >= threshold:
    (host_a, host_b, shared, size_a, size_b, jaccard_micro) with
    host_a < host_b. `jaccard_micro` = floor(shared * 1e6 / union) as
    exact bigint arithmetic. Fingerprints seen on more than `max_fp_df`
    hosts are treated as boilerplate and excluded from BOTH the pairing
    and the per-host set sizes (so a host of pure boilerplate doesn't
    dilute its real overlap)."""
    d, sizes = _gated_sets(pages, host_col, fp_col, max_fp_df)
    return _mirror_pairs(d, sizes, min_jaccard_micro)


def _mirror_pairs(d: DataFrame, sizes: DataFrame,
                  min_jaccard_micro: int) -> DataFrame:
    pairs = (
        d.select(F.col("host").alias("host_a"), "fp")
        .join(d.select(F.col("host").alias("host_b"), "fp"), "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    out = (
        pairs
        .join(sizes.select(F.col("host").alias("host_a"),
                           F.col("size").alias("size_a")), "host_a")
        .join(sizes.select(F.col("host").alias("host_b"),
                           F.col("size").alias("size_b")), "host_b")
        .withColumn(
            "jaccard_micro",
            F.expr("(shared * 1000000) div (size_a + size_b - shared)")
            .cast("long"))
        .filter(F.col("jaccard_micro") >= min_jaccard_micro)
    )
    return out.select("host_a", "host_b", "shared",
                      F.col("size_a").cast("long").alias("size_a"),
                      F.col("size_b").cast("long").alias("size_b"),
                      "jaccard_micro")


def host_mirrors_oracle_sql(
    pages_rel: str, min_jaccard_micro: int = 100_000,
    max_fp_df: int = 50,
) -> str:
    """DuckDB twin of `host_mirrors`: `pages_rel` yields (host, fp)."""
    return f"""
        with d0 as (
          select distinct host, fp from ({pages_rel})
        ),
        fpdf as (
          select fp, count(*) as df from d0 group by fp
        ),
        d as (
          select host, d0.fp from d0 join fpdf on fpdf.fp = d0.fp
          where df <= {max_fp_df}
        ),
        sizes as (
          select host, count(*) as size from d group by host
        ),
        pairs as (
          select a.host as host_a, b.host as host_b,
                 count(*) as shared
          from d a join d b on a.fp = b.fp and a.host < b.host
          group by a.host, b.host
        )
        select host_a, host_b, cast(shared as bigint) as shared,
               cast(sa.size as bigint) as size_a,
               cast(sb.size as bigint) as size_b,
               cast((shared * 1000000) // (sa.size + sb.size - shared)
                    as bigint) as jaccard_micro
        from pairs
        join sizes sa on sa.host = host_a
        join sizes sb on sb.host = host_b
        where (shared * 1000000) // (sa.size + sb.size - shared)
              >= {min_jaccard_micro}
    """


def host_mirror_groups(
    pages: DataFrame, host_col: str = "host", fp_col: str = "fp",
    min_jaccard_micro: int = 100_000, max_fp_df: int = 50,
) -> DataFrame:
    """Mirror GROUPS with one canonical host — the CommonCrawl/IA-style
    "mirror collapse" a frontier dedups hosts on: mirror pairs (from
    :func:`host_mirrors`) close transitively into components
    (dedup.connected_components — the O(log n) star rounds above the
    fused-gear threshold), and each group elects a canonical host by
    (crawl volume desc, host asc), volume being the host's
    non-boilerplate fingerprint count.

    Output: (host, size, canonical_host, group_size) for every host in
    a mirror group. Scale shape: pairing is fp-equi-join bounded (never
    all-pairs over hosts), the closure is node=HOST scale (tiny next to
    the corpus), and the keeper election is a struct-min AGGREGATE per
    component — no window over a hot component."""
    from linkinator_spark.functions.dedup import connected_components

    # one gated (host, fp) pass feeds the pairing self-join AND the
    # election's volume table; checkpointing it keeps the corpus-scale
    # distinct+df-gate from re-executing per consumer (the pairing
    # consumes it twice, the final join a third time)
    d, sizes = _gated_sets(pages, host_col, fp_col, max_fp_df)
    d = d.localCheckpoint()
    sizes = sizes.select(
        "host", F.col("size").cast("long").alias("size")).localCheckpoint()
    pairs = _mirror_pairs(d, sizes, min_jaccard_micro)
    comp = connected_components(pairs, id_a="host_a", id_b="host_b")

    scored = comp.select(F.col("node").alias("host"), "component").join(
        sizes, "host")
    # keeper = max size, ties to lexicographically smallest host:
    # min(struct(-size, host)) — an aggregate, not a window, so a
    # 10k-host mirror farm never serializes into one task
    elect = scored.groupBy("component").agg(
        F.min(F.struct((-F.col("size")).alias("ns"),
                       F.col("host").alias("h"))).alias("_k"),
        F.count("*").cast("long").alias("group_size"),
    )
    return (scored.join(elect, "component")
            .select("host", "size", F.col("_k.h").alias("canonical_host"),
                    "group_size"))


def host_mirror_groups_oracle_sql(
    pages_rel: str, min_jaccard_micro: int = 100_000,
    max_fp_df: int = 50,
) -> str:
    """DuckDB twin of `host_mirror_groups`: the host_mirrors pairing
    CTEs + a recursive transitive closure (the dedup_cc_canonical
    pattern) + a row_number keeper election by (size desc, host)."""
    return f"""
        with recursive
        d0 as (
          select distinct host, fp from ({pages_rel})
        ),
        fpdf as (
          select fp, count(*) as df from d0 group by fp
        ),
        d as (
          select host, d0.fp from d0 join fpdf on fpdf.fp = d0.fp
          where df <= {max_fp_df}
        ),
        sizes as (
          select host, cast(count(*) as bigint) as size
          from d group by host
        ),
        pairs as (
          select host_a, host_b from (
            select a.host as host_a, b.host as host_b,
                   count(*) as shared
            from d a join d b on a.fp = b.fp and a.host < b.host
            group by a.host, b.host) p
          join sizes sa on sa.host = p.host_a
          join sizes sb on sb.host = p.host_b
          where (shared * 1000000) // (sa.size + sb.size - shared)
                >= {min_jaccard_micro}
        ),
        edges as (
          select host_a as u, host_b as v from pairs
          union
          select host_b as u, host_a as v from pairs
        ),
        reach(u, v) as (
          select u, v from edges
          union
          select r.u, e.v from reach r join edges e on r.v = e.u
          where r.u <> e.v
        ),
        comp as (
          select u as host, least(u, min(v)) as component
          from reach group by u
        ),
        scored as (
          select c.host, c.component, s.size
          from comp c join sizes s using (host)
        ),
        keep as (
          select component, host as canonical_host from (
            select component, host,
                   row_number() over (partition by component
                                      order by size desc, host) as rn
            from scored) t where rn = 1
        )
        select s.host, s.size, k.canonical_host,
               cast(count(*) over (partition by s.component) as bigint)
                 as group_size
        from scored s join keep k using (component)
    """
