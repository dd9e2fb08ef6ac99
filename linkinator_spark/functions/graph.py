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

# Fused small-graph gear (same philosophy as dedup._cc_fused and the
# fused BFS): a fixture/bench-scale edge list pays per-round shuffles and
# checkpoints in the staged loop purely as scheduling latency. When the
# (distinct) edge list fits one task, the whole fixed-round iteration
# runs as vectorized numpy inside ONE executor task. The staged
# DataFrame loop remains the at-scale path and the semantics reference;
# float accumulation order differs only within the tolerance the
# engine-vs-oracle compare already absorbs (all float outputs are
# 6dp-rounded by their queries), and the integer label propagation is
# bit-exact. tests/test_graph.py pins fused == staged on real data.
GRAPH_FUSE_MAX_EDGES = 5_000_000  # ~80 MB of int64 pairs in one task


def _edges_fused(e: DataFrame, compute, schema: str) -> DataFrame:
    """Run `compute(src, dst)` (int64 arrays -> pandas DataFrame) over
    the whole edge list in one executor task."""
    def fn(batches):
        import numpy as np

        srcs, dsts = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(np.int64))
            dsts.append(pdf["dst"].to_numpy(np.int64))
        yield compute(np.concatenate(srcs), np.concatenate(dsts))

    return e.repartition(1).mapInPandas(fn, schema)


def _node_index(np, src, dst):
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=len(nodes))
    return nodes, si, di, outdeg


def pagerank(
    edges: DataFrame, iters: int = 5, damping: float = 0.85,
    src_col: str = "src", dst_col: str = "dst",
    fuse_max_edges: int = GRAPH_FUSE_MAX_EDGES,
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
    if fuse_max_edges and e.count() <= fuse_max_edges:
        def compute(src, dst):
            import numpy as np
            import pandas as pd

            if len(src) == 0:
                return pd.DataFrame({"node": np.empty(0, np.int64),
                                     "pr": np.empty(0, np.float64)})
            nodes, si, di, outdeg = _node_index(np, src, dst)
            n = len(nodes)
            pr = np.full(n, 1.0 / n)
            base = (1.0 - damping) / n
            dang = outdeg == 0
            for _ in range(iters):
                dangling = pr[dang].sum()
                contrib = np.bincount(
                    di, weights=pr[si] / outdeg[si], minlength=n)
                pr = base + damping * (contrib + dangling / n)
            return pd.DataFrame({"node": nodes, "pr": pr})

        return _edges_fused(e, compute, "node long, pr double").select(
            "node", F.col("pr").alias("pagerank"))
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    ranks = nodes.select("id", (F.lit(1.0) / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks["id"] == deg["src"], "left")
        # dangling mass: ranks of nodes with no out-edges, spread evenly.
        # Kept as a 1-row aggregate crossJoined into the round (NOT a
        # per-round collect): the whole power iteration then runs as ONE
        # Spark job — no driver barrier per round (same IEEE doubles, so
        # results are bit-identical to the collected-literal form)
        dmass = (with_deg.filter(F.col("src").isNull())
                 .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm")))
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .crossJoin(dmass)
            .select(
                "id",
                (F.lit(base)
                 + F.lit(damping)
                 * (F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("_dm") / n_nodes)).alias("pr"),
            )
        ).localCheckpoint(eager=False)  # lazy: truncates the logical
        # plan immediately, materializes inside the single final job
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


def hits(
    edges: DataFrame, iters: int = 5,
    src_col: str = "src", dst_col: str = "dst",
    fuse_max_edges: int = GRAPH_FUSE_MAX_EDGES,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) after `iters` mutual-
    reinforcement rounds: (node, hub, auth).

    auth'(v) = Σ hub(u) over in-edges (u,v); hub'(u) = Σ auth'(v) over
    out-edges (u,v); each vector L1-normalizes after its update (the
    classic convergent form, and — unlike L2 — replayable as exact SQL
    aggregation plus one division). Parallel edges collapse first; both
    scores start uniform over src ∪ dst. A fixed iteration count keeps
    the result a pure function of the edge set so the DuckDB oracle can
    unroll it.

    Where pagerank weights crawl sources by incoming authority alone,
    HITS separates "good directory" (hub) from "good content" (auth) —
    the signal for seeding a crawl (high hubs first) vs. keeping a page
    in a training corpus (high auth).

    Scale shape at 10^10 edges: each half-round is one join keyed on
    node ids (uniform after url-hash node mapping) + one map-side-
    combined sum; the L1 normalizer is a scalar aggregate collected to
    the driver (O(1) rows/round, same as pagerank's dangling mass); the
    score vectors are O(nodes) and localCheckpoint-ed per round to cut
    the iterative lineage.
    """
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    if fuse_max_edges and e.count() <= fuse_max_edges:
        def compute(src, dst):
            import numpy as np
            import pandas as pd

            if len(src) == 0:
                z = np.empty(0, np.float64)
                return pd.DataFrame({"node": np.empty(0, np.int64),
                                     "hub": z, "auth": z})
            nodes, si, di, _ = _node_index(np, src, dst)
            n = len(nodes)
            hub = np.full(n, 1.0 / n)
            for _ in range(iters):
                a_raw = np.bincount(di, weights=hub[si], minlength=n)
                auth = a_raw / a_raw.sum()
                h_raw = np.bincount(si, weights=auth[di], minlength=n)
                hub = h_raw / h_raw.sum()
            return pd.DataFrame({"node": nodes, "hub": hub, "auth": auth})

        return _edges_fused(
            e, compute, "node long, hub double, auth double")
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    n_nodes = nodes.count()
    scores = nodes.select(
        "id", (F.lit(1.0) / n_nodes).alias("hub"),
        (F.lit(1.0) / n_nodes).alias("auth"))
    for _ in range(iters):
        # auth step: sum incoming hub mass, L1-normalize. The normalizer
        # is a 1-row aggregate crossJoined in (pagerank's no-per-round-
        # collect shape): the full mutual-reinforcement chain is ONE job
        a_raw = (e.join(scores.select(F.col("id").alias("src"), "hub"), "src")
                 .groupBy("dst").agg(F.sum("hub").alias("a")))
        a_tot = a_raw.agg(F.coalesce(F.sum("a"), F.lit(1.0)).alias("_at"))
        auth = (nodes.join(a_raw, nodes["id"] == a_raw["dst"], "left")
                .crossJoin(a_tot)
                .select("id", (F.coalesce(F.col("a"), F.lit(0.0))
                               / F.col("_at")).alias("auth")))
        # hub step: sum outgoing (new) auth mass, L1-normalize
        h_raw = (e.join(auth.select(F.col("id").alias("dst"),
                                    F.col("auth").alias("na")), "dst")
                 .groupBy("src").agg(F.sum("na").alias("h")))
        h_tot = h_raw.agg(F.coalesce(F.sum("h"), F.lit(1.0)).alias("_ht"))
        hub = (nodes.join(h_raw, nodes["id"] == h_raw["src"], "left")
               .crossJoin(h_tot)
               .select("id", (F.coalesce(F.col("h"), F.lit(0.0))
                              / F.col("_ht")).alias("hub")))
        scores = (hub.join(auth, "id")
                  .select("id", "hub", "auth")
                  .localCheckpoint(eager=False))
    return scores.select(F.col("id").alias("node"), "hub", "auth")


def hits_oracle_sql(edges_rel: str, nodes_rel: str, iters: int = 5) -> str:
    """Unrolled-SQL twin of `hits`: `edges_rel` yields (src, dst),
    `nodes_rel` yields (id). Returns (node, hub, auth) unrounded."""
    # every CTE is MATERIALIZED: the round chain references each prior
    # round several times, and DuckDB's default CTE inlining would
    # duplicate the whole edge scan exponentially across rounds
    sql = [f"""
        with e as materialized (select distinct src, dst from ({edges_rel})),
        nodes as materialized (select id from ({nodes_rel})),
        nn as materialized (select count(*) as n from nodes),
        s0 as materialized (select id, 1.0::DOUBLE / nn.n as hub,
                      1.0::DOUBLE / nn.n as auth from nodes, nn)"""]
    for i in range(iters):
        p, c = f"s{i}", f"s{i + 1}"
        sql.append(f""",
        ar{i} as materialized (
          select e.dst, sum({p}.hub) as a
          from e join {p} on {p}.id = e.src group by e.dst
        ),
        at{i} as materialized (
          select coalesce(sum(a), 1.0) as tot from ar{i}),
        a{i} as materialized (
          select nodes.id,
                 coalesce(ar{i}.a, 0)::DOUBLE / at{i}.tot as auth
          from nodes left join ar{i} on ar{i}.dst = nodes.id, at{i}
        ),
        hr{i} as materialized (
          select e.src, sum(a{i}.auth) as h
          from e join a{i} on a{i}.id = e.dst group by e.src
        ),
        ht{i} as materialized (
          select coalesce(sum(h), 1.0) as tot from hr{i}),
        {c} as materialized (
          select nodes.id,
                 coalesce(hr{i}.h, 0)::DOUBLE / ht{i}.tot as hub,
                 a{i}.auth as auth
          from nodes
          left join hr{i} on hr{i}.src = nodes.id
          join a{i} on a{i}.id = nodes.id, ht{i}
        )""")
    sql.append(f"""
        select id as node, hub, auth from s{iters}""")
    return "".join(sql)


# ---------------------------------------------------------------------------
# Link-farm / outlink-spam detection
# ---------------------------------------------------------------------------

def link_spam_scores(
    edges: DataFrame,
    min_out: int = 20,
    min_hosts: int = 8,
    min_ext_pct: int = 80,
) -> DataFrame:
    """Per-source outlink-spam signals over an edge table carrying
    (src, dst, src_host, dst_host): pages that fan out to many distinct
    external hosts are link farms / SEO spam — a standard web-corpus
    quality signal (the "too many outbound domains" family of CC
    cleaning heuristics) and a crawl-frontier poisoner (every farm page
    injects dozens of junk hosts into the politeness scheduler).

    Output per src: out_degree, n_targets, n_hosts, n_ext, and
    ``spam`` — true iff out_degree >= min_out AND n_hosts >= min_hosts
    AND external share >= min_ext_pct (integer cross-multiplication, no
    float division). One groupBy on the src key; out-degree is bounded
    by page size, so no hot-key path. The two exact count-distincts
    ride Spark's expand; sketched variants (functions/sketches.py) are
    the downgrade path if edge volume ever makes exactness the
    bottleneck — flagged thresholds are coarse, so HLL precision
    suffices there.
    """
    per = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"),
        F.countDistinct("dst").cast("long").alias("n_targets"),
        F.countDistinct("dst_host").cast("long").alias("n_hosts"),
        F.sum(F.when(F.col("dst_host") != F.col("src_host"), 1)
              .otherwise(0)).cast("long").alias("n_ext"),
    )
    spam = (
        (F.col("out_degree") >= min_out)
        & (F.col("n_hosts") >= min_hosts)
        & (F.col("n_ext") * 100 >= min_ext_pct * F.col("out_degree")))
    return per.withColumn("spam", spam)


def link_spam_oracle_sql(edges_rel: str, min_out: int = 20,
                         min_hosts: int = 8,
                         min_ext_pct: int = 80) -> str:
    """DuckDB twin of :func:`link_spam_scores`."""
    return f"""
      select src,
             cast(count(*) as bigint) as out_degree,
             cast(count(distinct dst) as bigint) as n_targets,
             cast(count(distinct dst_host) as bigint) as n_hosts,
             cast(sum(case when dst_host <> src_host then 1 else 0 end)
                  as bigint) as n_ext,
             count(*) >= {min_out}
               and count(distinct dst_host) >= {min_hosts}
               and sum(case when dst_host <> src_host then 1 else 0 end)
                   * 100 >= {min_ext_pct} * count(*) as spam
      from {edges_rel} group by src
    """


# ---------------------------------------------------------------------------
# Label-propagation community detection
# ---------------------------------------------------------------------------

def label_propagation(
    edges: DataFrame, iters: int = 4,
    src_col: str = "src", dst_col: str = "dst",
    fuse_max_edges: int = GRAPH_FUSE_MAX_EDGES,
) -> DataFrame:
    """(node, community) after `iters` synchronous label-propagation
    rounds (Raghavan et al. 2007) over the UNDIRECTED graph.

    Where connected_components answers "reachable at all" and pagerank
    answers "how authoritative", LPA answers "which densely-linked
    neighborhood" — the signal for host clustering (site families,
    mirror groups, spam rings) in crawl analytics and for
    domain-balanced corpus mixing.

    Every node starts labeled with its own id. Each round, a node
    adopts the most frequent label among its neighbors AND its own
    current label (the self-inclusive variant — it damps the 2-cycle
    oscillation plain synchronous LPA exhibits on bipartite structures);
    ties break to the SMALLEST label, and a node with no neighbors keeps
    its current label (its self-vote stands alone). Both rules are
    deterministic, so a fixed iteration count makes the result a pure
    function of the edge set and the DuckDB oracle can replay it as
    unrolled SQL.

    Scale shape at 10^10 edges: per round, one join keyed on node ids
    (uniform after url-hash node mapping) + two map-side-combinable
    aggregates; the (node, label) count spreads a hot node across its
    distinct neighbor labels before the per-node argmax, whose state is
    one struct per distinct label — never the raw adjacency list. The
    label vector is O(nodes) and localCheckpoint-ed per round to cut
    the iterative lineage, exactly like pagerank/hits/star rounds.
    """
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    if fuse_max_edges and e.count() <= fuse_max_edges:
        def compute(src, dst):
            import numpy as np
            import pandas as pd

            if len(src) == 0:
                return pd.DataFrame({"node": np.empty(0, np.int64),
                                     "community": np.empty(0, np.int64)})
            nodes = np.unique(np.concatenate([src, dst]))
            n = len(nodes)
            # undirected symmetrized edge set, self-loops dropped,
            # deduplicated — the DF path's `sym`
            ns = src != dst
            u = np.concatenate([src[ns], dst[ns]])
            v = np.concatenate([dst[ns], src[ns]])
            pair = np.unique(np.stack(
                [np.searchsorted(nodes, u),
                 np.searchsorted(nodes, v)], axis=1), axis=0)
            su, sv = pair[:, 0], pair[:, 1]
            lab = nodes.copy()
            self_ids = np.arange(n)
            # labels are always node ids, so votes pack losslessly into
            # ONE int64 key (node_idx * n + label_idx): 1-D np.unique is
            # ~10x the structured axis=0 form at fused-gate edge counts
            for _ in range(iters):
                vid = np.concatenate([su, self_ids])
                vlab_idx = np.searchsorted(
                    nodes, np.concatenate([lab[sv], lab]))
                key, cnt = np.unique(vid * np.int64(n) + vlab_idx,
                                     return_counts=True)
                kid, klab = key // n, nodes[key % n]
                # argmax by (count desc, label asc) per node: lexsort is
                # last-key-primary; keys are already label-ascending
                # within a node
                order = np.lexsort((klab, -cnt, kid))
                rid = kid[order]
                first = np.unique(rid, return_index=True)[1]
                new = lab.copy()
                new[rid[first]] = klab[order][first]
                lab = new
            return pd.DataFrame({"node": nodes, "community": lab})

        return _edges_fused(e, compute, "node long, community long")
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    sym = (e.filter(F.col("src") != F.col("dst"))
           .select("src", "dst")
           .union(e.filter(F.col("src") != F.col("dst"))
                  .select(F.col("dst").alias("src"),
                          F.col("src").alias("dst")))
           .distinct())
    labels = nodes.select("id", F.col("id").alias("label"))
    for _ in range(iters):
        nbr = (sym.join(labels.select(F.col("id").alias("dst"), "label"),
                        "dst")
               .select(F.col("src").alias("id"), "label")
               .union(labels.select("id", "label")))
        cnt = nbr.groupBy("id", "label").agg(F.count(F.lit(1)).alias("n"))
        # argmax by (count desc, label asc) via lexicographic struct-min
        best = (cnt.groupBy("id")
                .agg(F.min(F.struct((-F.col("n")).alias("nn"),
                                    F.col("label").alias("lb"))).alias("t"))
                .select("id", F.col("t.lb").alias("new_label")))
        labels = (labels.join(best, "id", "left")
                  .select("id", F.coalesce("new_label", "label")
                          .alias("label"))
                  .localCheckpoint(eager=False))  # lazy: the fixed-round
        # propagation runs as one job, no per-round driver barrier
    return labels.select(F.col("id").alias("node"),
                         F.col("label").alias("community"))


def label_propagation_oracle_sql(
    edges_rel: str, iters: int = 4,
) -> str:
    """Unrolled-SQL twin of :func:`label_propagation`: `edges_rel`
    yields (src, dst). Returns (node, community). CTEs are MATERIALIZED
    for the same reason as `hits_oracle_sql` — each round is referenced
    twice and default inlining would re-derive the chain per reference."""
    sql = [f"""
        with e as materialized (select distinct src, dst from ({edges_rel})),
        nodes as materialized (
          select src as id from e union select dst from e),
        sym as materialized (
          select src, dst from e where src <> dst
          union select dst, src from e where src <> dst),
        l0 as materialized (select id, id as label from nodes)"""]
    for i in range(iters):
        p, c = f"l{i}", f"l{i + 1}"
        sql.append(f""",
        c{i} as materialized (
          select id, label, count(*) as n from (
            select sym.src as id, {p}.label
            from sym join {p} on {p}.id = sym.dst
            union all select id, label from {p}
          ) group by id, label
        ),
        b{i} as materialized (
          select id, label as new_label
          from (select id, label,
                       row_number() over (partition by id
                                          order by n desc, label asc) rn
                from c{i})
          where rn = 1
        ),
        {c} as materialized (
          select {p}.id, coalesce(b{i}.new_label, {p}.label) as label
          from {p} left join b{i} on b{i}.id = {p}.id
        )""")
    sql.append(f"""
        select id as node, label as community from l{iters}""")
    return "".join(sql)


# ---------------------------------------------------------------------------
# TrustRank (seed-biased PageRank)
# ---------------------------------------------------------------------------

def trustrank(
    edges: DataFrame, seeds: DataFrame, iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src", dst_col: str = "dst",
    fuse_max_edges: int = GRAPH_FUSE_MAX_EDGES,
) -> DataFrame:
    """(node, trust) after `iters` biased power iterations (Gyongyi,
    Garcia-Molina & Pedersen, VLDB 2004): PageRank whose teleport vector
    is uniform over a hand-vetted TRUSTED seed set instead of all nodes,
    so trust decays with link distance from the seeds — the standard
    demotion signal for link farms that manufacture raw PageRank but sit
    far from any trusted neighborhood (pairs with link_spam_scores: that
    flags structure, this scores distance-from-trust).

    `seeds` is a one-column (id) DataFrame; seed ids absent from the
    edge set are ignored. Teleport AND dangling mass both redistribute
    over the seed set (the paper's static score distribution d = s).
    Nodes unreachable from any seed get trust exactly (1-d)*0 = 0 —
    distinguishing "no evidence" from "low rank" is the point.

    Scale shape: identical to `pagerank` — per iteration one node-keyed
    join + one map-side-combined aggregate, O(1) driver rows (the
    dangling-mass scalar), rank vector localCheckpoint-ed per round. The
    seed dim is O(seeds) and broadcast.
    """
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    seed_ids = (seeds.select(F.col(seeds.columns[0]).cast("long")
                             .alias("id"))
                .distinct().join(nodes, "id"))
    n_seeds = seed_ids.count()
    if n_seeds == 0:
        return nodes.select(F.col("id").alias("node"),
                            F.lit(0.0).alias("trust"))
    if fuse_max_edges and e.count() <= fuse_max_edges:
        # the seed dim is bounded (hand-vetted set) — same collect class
        # as the broadcast it replaces
        seed_arr = [r["id"] for r in seed_ids.collect()]

        def compute(src, dst):
            import numpy as np
            import pandas as pd

            if len(src) == 0:
                return pd.DataFrame({"node": np.empty(0, np.int64),
                                     "trust": np.empty(0, np.float64)})
            nodes_a, si, di, outdeg = _node_index(np, src, dst)
            n = len(nodes_a)
            s = np.where(np.isin(nodes_a, np.asarray(seed_arr, np.int64)),
                         1.0 / n_seeds, 0.0)
            tr = s.copy()
            dang = outdeg == 0
            for _ in range(iters):
                dangling = tr[dang].sum()
                contrib = np.bincount(
                    di, weights=tr[si] / outdeg[si], minlength=n)
                tr = (((1.0 - damping) + damping * dangling) * s
                      + damping * contrib)
            return pd.DataFrame({"node": nodes_a, "trust": tr})

        return _edges_fused(e, compute, "node long, trust double")
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # static distribution s: 1/|seeds| on seeds, 0 elsewhere
    s = (nodes.join(F.broadcast(seed_ids.withColumn("_s", F.lit(1))),
                    "id", "left")
         .select("id", F.when(F.col("_s").isNotNull(),
                              F.lit(1.0) / n_seeds)
                 .otherwise(F.lit(0.0)).alias("s")))
    ranks = s.select("id", F.col("s").alias("tr"))
    for _ in range(iters):
        with_deg = ranks.join(deg, ranks["id"] == deg["src"], "left")
        # 1-row dangling aggregate crossJoined in (no per-round collect —
        # pagerank's one-job shape; same IEEE arithmetic, identical result)
        dmass = (with_deg.filter(F.col("src").isNull())
                 .agg(F.coalesce(F.sum("tr"), F.lit(0.0)).alias("_dm")))
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("tr") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            s.join(contrib, s["id"] == contrib["dst"], "left")
            .crossJoin(dmass)
            .select(
                "id",
                ((F.lit(1.0 - damping) + F.lit(damping) * F.col("_dm"))
                 * F.col("s")
                 + F.lit(damping)
                 * F.coalesce(F.col("c"), F.lit(0.0))).alias("tr"),
            )
        ).localCheckpoint(eager=False)
    return ranks.select(F.col("id").alias("node"), F.col("tr").alias("trust"))


def trustrank_oracle_sql(
    edges_rel: str, seeds_rel: str, iters: int = 5, damping: float = 0.85,
) -> str:
    """Unrolled-SQL twin of :func:`trustrank`: `edges_rel` yields
    (src, dst), `seeds_rel` yields (id). Returns (node, trust) unrounded."""
    sql = [f"""
        with e as materialized (select distinct src, dst from ({edges_rel})),
        nodes as materialized (
          select src as id from e union select dst from e),
        seeds as materialized (
          select distinct s.id from ({seeds_rel}) s
          join nodes on nodes.id = s.id),
        ns as materialized (select count(*) as n from seeds),
        deg as materialized (
          select src, count(*) as outdeg from e group by src),
        sv as materialized (
          select nodes.id,
                 case when seeds.id is not null
                      then 1.0::DOUBLE / ns.n else 0.0::DOUBLE end as s
          from nodes left join seeds on seeds.id = nodes.id, ns),
        t0 as materialized (select id, s as tr from sv)"""]
    for i in range(iters):
        p, c = f"t{i}", f"t{i + 1}"
        sql.append(f""",
        d{i} as materialized (
          select coalesce(sum({p}.tr), 0) as mass from {p}
          left join deg on deg.src = {p}.id where deg.src is null
        ),
        {c} as materialized (
          select sv.id,
                 ((1 - {damping})::DOUBLE + {damping}::DOUBLE * d{i}.mass)
                   * sv.s
                 + {damping}::DOUBLE * coalesce(contrib.c, 0)::DOUBLE as tr
          from sv
          left join (
            select e.dst, sum({p}.tr / deg.outdeg) as c
            from e join {p} on {p}.id = e.src join deg on deg.src = e.src
            group by e.dst
          ) contrib on contrib.dst = sv.id, d{i}
        )""")
    sql.append(f"""
        select id as node, tr as trust from t{iters}""")
    return "".join(sql)


# ---------------------------------------------------------------------------
# OPIC — On-line Page Importance Computation
# ---------------------------------------------------------------------------

def opic(
    edges: DataFrame, iters: int = 5,
    src_col: str = "src", dst_col: str = "dst",
    fuse_max_edges: int = GRAPH_FUSE_MAX_EDGES,
) -> DataFrame:
    """(node, cash, history, importance) after `iters` synchronous OPIC
    rounds (Abiteboul, Preda & Cobena, WWW 2003): every node starts with
    equal cash 1/n; each round a node banks its cash into its history and
    distributes it equally over its out-links (dangling nodes distribute
    uniformly over ALL nodes — the paper's virtual-root link). The
    importance estimate is (history + cash) / (rounds + 1).

    Why next to pagerank: OPIC is the CRAWL-ORDER algorithm — importance
    accumulates online as pages are visited, so a frontier scheduler can
    rank candidates by current cash without waiting for a converged
    offline power method; the fixed-round batch form here is the
    deterministic synchronous variant (all nodes "crawled" per round),
    which makes it a pure function of the edge set that the DuckDB
    oracle replays as unrolled SQL.

    Scale shape: identical per-round skeleton to pagerank — one exchange
    keyed on node ids, map-side-combined cash aggregate, O(1) driver
    rows (the dangling-cash scalar), (cash, history) vector O(nodes)
    localCheckpoint-ed per round.

    Invariant: total cash stays 1 every round, so history sums to the
    round number and importance sums to 1 (asserted in tests).
    """
    e = (edges.select(F.col(src_col).cast("long").alias("src"),
                      F.col(dst_col).cast("long").alias("dst"))
         .distinct())
    if fuse_max_edges and e.count() <= fuse_max_edges:
        def compute(src, dst):
            import numpy as np
            import pandas as pd

            if len(src) == 0:
                z = np.empty(0, np.float64)
                return pd.DataFrame({
                    "node": np.empty(0, np.int64), "cash": z,
                    "history": z, "importance": z})
            nodes_a, si, di, outdeg = _node_index(np, src, dst)
            n = len(nodes_a)
            cash = np.full(n, 1.0 / n)
            hist = np.zeros(n)
            dang = outdeg == 0
            for _ in range(iters):
                dangling = cash[dang].sum()
                inflow = np.bincount(
                    di, weights=cash[si] / outdeg[si], minlength=n)
                hist = hist + cash
                cash = inflow + dangling / n
            return pd.DataFrame({
                "node": nodes_a, "cash": cash, "history": hist,
                "importance": (hist + cash) / (iters + 1)})

        return _edges_fused(
            e, compute,
            "node long, cash double, history double, importance double")
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct())
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    state = nodes.select(
        "id", (F.lit(1.0) / n_nodes).alias("cash"),
        F.lit(0.0).alias("hist"))
    for _ in range(iters):
        with_deg = state.join(deg, state["id"] == deg["src"], "left")
        # 1-row dangling-cash aggregate crossJoined in (no per-round
        # collect — the fixed-round loop becomes ONE job)
        dmass = (with_deg.filter(F.col("src").isNull())
                 .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_dm")))
        inflow = (
            e.join(state, e["src"] == state["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("cash") / F.col("outdeg")).alias("c"))
        )
        state = (
            state.join(inflow, state["id"] == inflow["dst"], "left")
            .crossJoin(dmass)
            .select(
                state["id"],
                (F.coalesce(F.col("c"), F.lit(0.0))
                 + F.col("_dm") / n_nodes).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
        ).localCheckpoint(eager=False)
    return state.select(
        F.col("id").alias("node"), "cash", F.col("hist").alias("history"),
        ((F.col("hist") + F.col("cash")) / (iters + 1)).alias("importance"))


def opic_oracle_sql(edges_rel: str, iters: int = 5) -> str:
    """Unrolled-SQL twin of :func:`opic`: `edges_rel` yields (src, dst).
    Returns (node, cash, history, importance) unrounded."""
    sql = [f"""
        with e as materialized (select distinct src, dst from ({edges_rel})),
        nodes as materialized (
          select src as id from e union select dst from e),
        nn as materialized (select count(*) as n from nodes),
        deg as materialized (
          select src, count(*) as outdeg from e group by src),
        s0 as materialized (
          select id, 1.0::DOUBLE / nn.n as cash, 0.0::DOUBLE as hist
          from nodes, nn)"""]
    for i in range(iters):
        p, c = f"s{i}", f"s{i + 1}"
        sql.append(f""",
        d{i} as materialized (
          select coalesce(sum({p}.cash), 0) as mass from {p}
          left join deg on deg.src = {p}.id where deg.src is null
        ),
        {c} as materialized (
          select {p}.id,
                 coalesce(inflow.c, 0)::DOUBLE + d{i}.mass / nn.n as cash,
                 {p}.hist + {p}.cash as hist
          from {p}
          left join (
            select e.dst, sum({p}.cash / deg.outdeg) as c
            from e join {p} on {p}.id = e.src join deg on deg.src = e.src
            group by e.dst
          ) inflow on inflow.dst = {p}.id, nn, d{i}
        )""")
    sql.append(f"""
        select id as node, cash, hist as history,
               (hist + cash) / {iters + 1} as importance from s{iters}""")
    return "".join(sql)


# ---------------------------------------------------------------------------
# Crawl-coverage estimation (species richness over discovery events)
# ---------------------------------------------------------------------------

def discovery_coverage(
    edges: DataFrame, dst_col: str = "dst",
) -> DataFrame:
    """One-row crawl-completeness report from link-discovery events: how
    much of the reachable URL space has this crawl actually seen, and
    how many URLs likely remain undiscovered?

    Treats every edge as one discovery event of its target (species
    sighting); the frequency-of-frequencies spectrum then yields the two
    classic species-richness estimators:

      * Good-Turing sample coverage  C = 1 - f1/N  (Good 1953): the
        probability the NEXT discovered link points at an already-seen
        URL — the operational "stop crawling?" signal.
      * Chao1 richness (Chao 1984, bias-corrected form, defined even
        when f2 = 0):  S_chao1 = S_obs + f1*(f1-1) / (2*(f2+1)); the
        estimated total URL count including never-yet-seen ones.

    Output: (s_obs, n_events, f1, f2, chao1, est_unseen, coverage) —
    counts exact integers, chao1/coverage rounded to 6dp.

    Scale shape at 10^10 events: two map-side-combined aggregates
    (dst -> count, count -> frequency; hot URLs partial-combine, the
    second keyspace is O(max multiplicity) — tiny) and a final one-row
    rollup. No windows, no joins, no driver state.
    """
    per_url = (edges.groupBy(F.col(dst_col).alias("u"))
               .agg(F.count(F.lit(1)).alias("k")))
    spectrum = per_url.groupBy("k").agg(F.count(F.lit(1)).alias("f"))
    return spectrum.agg(
        F.sum("f").cast("long").alias("s_obs"),
        F.sum(F.col("k") * F.col("f")).cast("long").alias("n_events"),
        F.coalesce(F.sum(F.when(F.col("k") == 1, F.col("f"))),
                   F.lit(0)).cast("long").alias("f1"),
        F.coalesce(F.sum(F.when(F.col("k") == 2, F.col("f"))),
                   F.lit(0)).cast("long").alias("f2"),
    ).select(
        "s_obs", "n_events", "f1", "f2",
        # f1 is cast to double before the multiply: f1*(f1-1) overflows
        # int64 once singletons exceed ~3e9 — reachable at the 10^10-
        # event scale this operator targets
        F.round(F.col("s_obs")
                + (F.col("f1").cast("double") * (F.col("f1") - 1))
                / (2.0 * (F.col("f2") + 1)), 6).alias("chao1"),
        # + 0.0 normalizes IEEE negative zero (f1 = 0 gives 0.0 * -1 =
        # -0.0, which DuckDB would print as -0.0 and break hash parity)
        F.round((F.col("f1").cast("double") * (F.col("f1") - 1))
                / (2.0 * (F.col("f2") + 1)) + 0.0, 6)
        .alias("est_unseen"),
        F.round(1.0 - F.col("f1") / F.col("n_events"), 6).alias("coverage"),
    )


def discovery_coverage_oracle_sql(edges_rel: str) -> str:
    """DuckDB twin of :func:`discovery_coverage`."""
    return f"""
        with per_url as (
          select dst as u, count(*) as k from ({edges_rel}) group by dst
        ),
        spectrum as (select k, count(*) as f from per_url group by k),
        agg as (
          select cast(sum(f) as bigint) as s_obs,
                 cast(sum(k * f) as bigint) as n_events,
                 cast(coalesce(sum(case when k = 1 then f end), 0)
                      as bigint) as f1,
                 cast(coalesce(sum(case when k = 2 then f end), 0)
                      as bigint) as f2
          from spectrum
        )
        select s_obs, n_events, f1, f2,
               round(s_obs + (f1::DOUBLE * (f1 - 1)) / (2.0 * (f2 + 1)), 6)
                 as chao1,
               round((f1::DOUBLE * (f1 - 1)) / (2.0 * (f2 + 1)) + 0.0, 6)
                 as est_unseen,
               round(1.0 - f1 / n_events, 6) as coverage
        from agg
    """


# ---------------------------------------------------------------------------
# Degree distribution + power-law fit
# ---------------------------------------------------------------------------

def degree_powerlaw(
    edges: DataFrame, kmin: int = 1,
    src_col: str = "src", dst_col: str = "dst",
) -> DataFrame:
    """One-row in-degree distribution report with the discrete power-law
    exponent estimate — the standard sanity check that a crawled web
    graph has the expected scale-free shape (alpha ~ 2.1 for the web's
    in-degree; a bot-farm or trap-heavy crawl shows up as a distorted
    tail long before eyeballing samples would catch it).

    alpha uses the continuous MLE approximation (Clauset, Shalizi &
    Newman 2009, eq. 3.1): alpha = 1 + n / sum(ln(k / (kmin - 1/2)))
    over nodes with in-degree k >= kmin.

    Output: (n_nodes, n_tail, kmin, max_k, mean_k, alpha) — counts
    exact, mean/alpha rounded to 6dp.

    Scale shape: one map-side-combined groupBy(dst) then a one-row
    rollup (sum/count/max partial-combine); the log arithmetic is
    whole-stage codegen. No windows, no joins, no driver state.
    """
    deg = (edges.groupBy(F.col(dst_col).alias("u"))
           .agg(F.count(F.lit(1)).alias("k")))
    tail = F.when(F.col("k") >= kmin, F.log(F.col("k") / (kmin - 0.5)))
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.when(F.col("k") >= kmin, 1).otherwise(0))
        .cast("long").alias("n_tail"),
        F.lit(kmin).cast("long").alias("kmin"),
        F.max("k").cast("long").alias("max_k"),
        F.round(F.avg("k"), 6).alias("mean_k"),
        F.round(
            1.0
            + F.sum(F.when(F.col("k") >= kmin, 1).otherwise(0))
            / F.sum(tail), 6).alias("alpha"),
    )


def degree_powerlaw_oracle_sql(edges_rel: str, kmin: int = 1) -> str:
    """DuckDB twin of :func:`degree_powerlaw`."""
    return f"""
        with deg as (
          select dst as u, count(*) as k from ({edges_rel}) group by dst
        )
        select cast(count(*) as bigint) as n_nodes,
               cast(sum(case when k >= {kmin} then 1 else 0 end)
                    as bigint) as n_tail,
               cast({kmin} as bigint) as kmin,
               cast(max(k) as bigint) as max_k,
               round(avg(k), 6) as mean_k,
               round(1.0 + sum(case when k >= {kmin} then 1 else 0 end)
                     / sum(case when k >= {kmin}
                                then ln(k / ({kmin} - 0.5)) end), 6)
                 as alpha
        from deg
    """


# ---------------------------------------------------------------------------
# Host-graph projection (interlinking report)
# ---------------------------------------------------------------------------

def host_graph_stats(
    edges: DataFrame,
    src_host_col: str = "src_host", dst_host_col: str = "dst_host",
) -> DataFrame:
    """Project the page-level edge table onto hosts and report each
    host's interlinking profile:

      (host, out_links, in_links, n_dst_hosts, n_src_hosts,
       internal_pct)

    — out_links/in_links count page edges leaving/entering the host,
    n_dst_hosts/n_src_hosts count distinct peer hosts, internal_pct is
    the integer percentage of the host's outgoing edges that stay on
    the host (site insularity: ~100 = self-contained silo, ~0 = pure
    link hub). The inputs to crawl budgeting (allocate fetches toward
    hosts that many OTHER hosts point into) and mirror/spam triage.

    Scale shape: two map-side-combined aggregates keyed on host (the
    out side and the in side), one equi-join between two host-sized
    tables (broadcastable). Exact count_distincts ride the expand; the
    HLL sketches are the documented downgrade path if peer-host
    cardinality ever dominates.
    """
    sh, dh = F.col(src_host_col), F.col(dst_host_col)
    out = edges.groupBy(sh.alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_links"),
        F.countDistinct(dh).cast("long").alias("n_dst_hosts"),
        F.floor(
            F.sum(F.when(dh == sh, 1).otherwise(0)) * 100
            / F.count(F.lit(1))).cast("long").alias("internal_pct"),
    )
    inn = edges.groupBy(dh.alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_links"),
        F.countDistinct(sh).cast("long").alias("n_src_hosts"),
    )
    return (out.join(inn, "host", "full")
            .select("host",
                    F.coalesce("out_links", F.lit(0)).alias("out_links"),
                    F.coalesce("in_links", F.lit(0)).alias("in_links"),
                    F.coalesce("n_dst_hosts", F.lit(0))
                    .alias("n_dst_hosts"),
                    F.coalesce("n_src_hosts", F.lit(0))
                    .alias("n_src_hosts"),
                    F.coalesce("internal_pct", F.lit(0))
                    .alias("internal_pct")))


def host_graph_stats_oracle_sql(edges_rel: str) -> str:
    """DuckDB twin of :func:`host_graph_stats`: `edges_rel` yields
    (src_host, dst_host)."""
    return f"""
        with e as (select src_host, dst_host from ({edges_rel})),
        o as (
          select src_host as host,
                 cast(count(*) as bigint) as out_links,
                 cast(count(distinct dst_host) as bigint) as n_dst_hosts,
                 cast(floor(sum(case when dst_host = src_host then 1
                                     else 0 end) * 100 / count(*))
                      as bigint) as internal_pct
          from e group by src_host
        ),
        i as (
          select dst_host as host,
                 cast(count(*) as bigint) as in_links,
                 cast(count(distinct src_host) as bigint) as n_src_hosts
          from e group by dst_host
        )
        select coalesce(o.host, i.host) as host,
               coalesce(out_links, 0) as out_links,
               coalesce(in_links, 0) as in_links,
               coalesce(n_dst_hosts, 0) as n_dst_hosts,
               coalesce(n_src_hosts, 0) as n_src_hosts,
               coalesce(internal_pct, 0) as internal_pct
        from o full outer join i on o.host = i.host
    """
