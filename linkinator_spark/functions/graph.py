"""Link-graph analytics over crawl edge tables.

`pagerank` — host/page authority by fixed-iteration power method, the
signal a training-data pipeline uses to weight crawl sources (quality
weighting, frontier prioritization). DataFrame-native: each iteration is
one uniform-key join + one map-side-combined aggregate; no driver-side
rows, no windows, no per-row Python. A fixed iteration count (not a
convergence probe) keeps the computation a pure function of the edge
set, so the DuckDB oracle replays it exactly as unrolled SQL.

The reference has no graph analytics (it reports per-link verdicts only,
/root/reference/src/index.ts:447-520); this is one of the beyond-the-
reference pipeline operators, same tier as dedup/ANN.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame, iters: int = 5, damping: float = 0.85,
    src_col: str = "src", dst_col: str = "dst",
) -> DataFrame:
    """(node, pagerank) after `iters` power iterations at `damping`.

    Nodes = src ∪ dst (so sinks that are only ever linked-to still get
    ranked). Parallel edges are collapsed first — rank flows once per
    distinct (src, dst). Dangling nodes (no out-edges) redistribute
    their mass uniformly, keeping sum(pr) == 1 at every iteration.

    Scale shape at 10^10 edges: the per-iteration exchange keys on node
    ids (uniform by construction after url-hash node mapping); the
    contribution aggregate partial-combines map-side; the rank vector —
    O(nodes), not O(edges) — is localCheckpoint-ed per round to cut the
    iterative lineage exactly like connected_components' star rounds.
    """
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    ranks = nodes.select("id", (F.lit(1.0) / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks["id"] == deg["src"], "left")
        # dangling mass: ranks of nodes with no out-edges, spread evenly
        dangling = (with_deg.filter(F.col("src").isNull())
                    .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
                    .collect()[0][0])
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                (F.lit(base)
                 + F.lit(damping)
                 * (F.coalesce(F.col("c"), F.lit(0.0))
                    + F.lit(dangling / n_nodes))).alias("pr"),
            )
        ).localCheckpoint(eager=True)
    return ranks.select(F.col("id").alias("node"), F.col("pr").alias("pagerank"))


def pagerank_oracle_sql(
    edges_rel: str, nodes_rel: str, iters: int = 5, damping: float = 0.85,
) -> str:
    """The unrolled-SQL twin of `pagerank` for the DuckDB oracle:
    `edges_rel` must yield (src, dst) with parallel edges already
    meaningful-or-not (we DISTINCT them here, mirroring the Spark side),
    `nodes_rel` must yield (id). Returns (node, pagerank) unrounded —
    the caller decides the compare rounding."""
    sql = [f"""
        with e as (select distinct src, dst from ({edges_rel})),
        nodes as (select id from ({nodes_rel})),
        nn as (select count(*) as n from nodes),
        deg as (select src, count(*) as outdeg from e group by src),
        r0 as (select id, 1.0::DOUBLE / nn.n as pr from nodes, nn)"""]
    for i in range(iters):
        p, c = f"r{i}", f"r{i + 1}"
        sql.append(f""",
        d{i} as (
          select coalesce(sum({p}.pr), 0) as mass from {p}
          left join deg on deg.src = {p}.id where deg.src is null
        ),
        {c} as (
          select nodes.id,
                 (1 - {damping})::DOUBLE / nn.n
                 + {damping}::DOUBLE
                   * (coalesce(contrib.c, 0)::DOUBLE + d{i}.mass / nn.n)
                 as pr
          from nodes
          left join (
            select e.dst, sum({p}.pr / deg.outdeg) as c
            from e join {p} on {p}.id = e.src join deg on deg.src = e.src
            group by e.dst
          ) contrib on contrib.dst = nodes.id, nn, d{i}
        )""")
    sql.append(f"""
        select id as node, pr as pagerank from r{iters}""")
    return "".join(sql)


def anchor_text_agg(
    edges: DataFrame, url_col: str = "resolved_url",
    anchor_col: str = "anchor_text", page_col: str = "page_url",
) -> DataFrame:
    """Incoming anchor-text profile per target URL:

      (url, n_refs, n_pages, top_anchor, top_anchor_refs)

    — the classic web-graph description signal (anchor text describes
    the TARGET page better than the page describes itself; used for
    retrieval corpora and page-quality features in training-data
    curation). top_anchor is the most frequent incoming anchor string,
    ties broken deterministically by the lexicographically LARGEST
    anchor (max over a (count, anchor) struct), so Spark and the SQL
    twin agree bit-for-bit.

    Scale shape at 10^10 edges: both aggregates partial-combine
    map-side; the per-(url, anchor) count spreads a hot target URL
    across its distinct anchor strings before the final per-url argmax,
    whose state is one struct per distinct anchor — never the raw edge
    list. n_pages is an exact count_distinct (two-phase expand), the
    right call because the profile is consumed per-URL; switch to
    approx_count_distinct only if a consumer tolerates it.
    """
    url, anchor, page = F.col(url_col), F.col(anchor_col), F.col(page_col)
    refs = edges.select(url.alias("url"), anchor.alias("anchor"),
                        page.alias("page"))
    stats = refs.groupBy("url").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.count_distinct("page").cast("long").alias("n_pages"),
    )
    top = (
        refs.groupBy("url", "anchor").agg(F.count("*").alias("n"))
        .groupBy("url")
        .agg(F.max(F.struct("n", "anchor")).alias("_t"))
        .select("url", F.col("_t.anchor").alias("top_anchor"),
                F.col("_t.n").cast("long").alias("top_anchor_refs"))
    )
    return stats.join(top, "url")


def anchor_text_agg_oracle_sql(edges_rel: str) -> str:
    """DuckDB twin of `anchor_text_agg`: `edges_rel` must yield
    (page_url, resolved_url, anchor_text); ties resolve to the
    lexicographically largest anchor among max-count ones, matching the
    Spark struct-max."""
    return f"""
        with refs as (
          select page_url as page, resolved_url as url,
                 anchor_text as anchor
          from ({edges_rel})
        ),
        stats as (
          select url, count(*)::bigint as n_refs,
                 count(distinct page)::bigint as n_pages
          from refs group by url
        ),
        counts as (
          select url, anchor, count(*) as n from refs group by url, anchor
        ),
        top as (
          select url, anchor as top_anchor, n::bigint as top_anchor_refs
          from (select url, anchor, n,
                       row_number() over (partition by url
                                          order by n desc, anchor desc) rn
                from counts)
          where rn = 1
        )
        select stats.url, n_refs, n_pages, top_anchor, top_anchor_refs
        from stats join top using (url)
    """
