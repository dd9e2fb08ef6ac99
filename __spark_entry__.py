"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 (or a
training-data-pipeline extension); ``oracle_sql()`` gives the DuckDB twin run
on the same parquet. Engine-portable primitives (60-bit md5 hash, shingles,
stopword regexes, the derived link graph) are shared between both sides so
values hash-match exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from linkinator_spark.config import CheckOptions  # noqa: E402
from linkinator_spark.functions import dedup as D  # noqa: E402
from linkinator_spark.functions import blocklist as BL  # noqa: E402
from linkinator_spark.functions import c4 as C4M  # noqa: E402
from linkinator_spark.functions import cdx as CDX  # noqa: E402
from linkinator_spark.functions import classifier as CF  # noqa: E402
from linkinator_spark.functions import dsir as DSIR  # noqa: E402
from linkinator_spark.functions import linededup as LD  # noqa: E402
from linkinator_spark.functions import graph as GR  # noqa: E402
from linkinator_spark.functions import interleave as IV  # noqa: E402
from linkinator_spark.functions import lm as LM  # noqa: E402
from linkinator_spark.functions import media as M  # noqa: E402
from linkinator_spark.functions import mirrors as MR  # noqa: E402
from linkinator_spark.functions import search as SRCH  # noqa: E402
from linkinator_spark.functions import sketches as SK  # noqa: E402
from linkinator_spark.functions import similarity as S  # noqa: E402
from linkinator_spark.functions import text as T  # noqa: E402
from linkinator_spark.functions import traps as TRM  # noqa: E402
from linkinator_spark.functions import vectorize as VZ  # noqa: E402
from linkinator_spark.operators.classify import classify  # noqa: E402
from linkinator_spark.functions import attributes as AT_MOD  # noqa: E402
from linkinator_spark.functions import normalize as NM_MOD  # noqa: E402
from linkinator_spark.functions import urls as URLS_MOD  # noqa: E402
from linkinator_spark.operators import politeness as PLT  # noqa: E402
from linkinator_spark.operators import revalidate as REVAL  # noqa: E402
from linkinator_spark.functions import graph as GRF_MOD  # noqa: E402
from linkinator_spark.functions import boilerplate as BP_MOD  # noqa: E402
from linkinator_spark.functions import tokenize as TOK_MOD  # noqa: E402
from linkinator_spark.sources import warc as WARC  # noqa: E402
from linkinator_spark.operators.crawler import LinkChecker  # noqa: E402
from linkinator_spark.plans import graphgen as G  # noqa: E402

MINHASH_N = 8
MINHASH_BANDS = 2   # 4 rows per band: the synthetic corpus has a tiny
SHINGLE_K = 10      # vocabulary, so loose bands bucket half the corpus
SIMHASH_BITS = 16
TOPK = 5


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# shared derivations (Spark side)
# ---------------------------------------------------------------------------

def _docs_with_dups(spark, sf_dir):
    """documents ∪ copies of doc_id%10==0 rows (shifted ids) — a corpus with
    known exact/near duplicates for the dedup operators."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


_DOCS_WITH_DUPS_SQL = (
    "(select doc_id, text from documents "
    " union all "
    " select doc_id + 1000000 as doc_id, text from documents where doc_id % 10 = 0)"
)

# the planted mirror-site table (_mirror_sites' DuckDB twin): origin
# hosts h0-h19, full mirrors m0-m4, partial mirror p0
_MIRROR_SITES_SQL = (
    "select 'h' || cast(doc_id % 20 as varchar) as host,"
    " 'f' || cast(doc_id as varchar) as fp from documents"
    " union all "
    "select 'm' || cast(doc_id % 5 as varchar) as host,"
    " 'f' || cast(doc_id as varchar) as fp from documents"
    " where doc_id % 4 = 0"
    " union all "
    "select 'p0' as host,"
    " 'f' || cast(doc_id as varchar) as fp from documents"
    " where doc_id % 8 = 0"
)


def _linked_text(col):
    """Embed deterministic URLs into the document text so extraction has
    something real to find (same concat on the DuckDB side)."""
    return F.concat(
        F.lit('<a href="http://site'),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example/page/"),
        F.col("doc_id").cast("string"),
        F.lit('">doc</a> '),
        col,
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(' see https://ref.example/r/'),
                        (F.col("doc_id") % 50).cast("string"))).otherwise(F.lit("")),
    )


_LINKED_TEXT_SQL = (
    "concat('<a href=\"http://site', cast(doc_id % 20 as varchar), "
    "'.example/page/', cast(doc_id as varchar), '\">doc</a> ', text, "
    "case when doc_id % 3 = 0 then concat(' see https://ref.example/r/', "
    "cast(doc_id % 50 as varchar)) else '' end)"
)

_URL_RE = r"https?://[A-Za-z0-9./_%-]+"


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full wave-loop crawl engine over the graph derived from
    sf0.001 documents — fetch join, classify, URL-seen anti-join, BFS waves."""
    return q_crawl_bfs_engine(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# crawl-core queries
# ---------------------------------------------------------------------------

def q_crawl_bfs_engine(spark, sf_dir, staged: bool = False):
    docs = _t(spark, sf_dir, "documents")
    pages, sdocs = G.pages_from_documents(docs)
    # staged=True zeroes the fused-gear gates so the oracle exercises the
    # staged wave loop + iterative redirect hops — the exact plan that runs
    # above the gates at 10^10 scale (gear equivalence pinned by an
    # EXTERNAL oracle, not only by pytest)
    cfg = CheckOptions(paths=[G.ROOT], recurse=True,
                       chain_map_max_rows=0 if staged else 200_000)
    res = LinkChecker(spark).check(cfg, pages, sdocs)
    return (
        res.results.groupBy("url")
        .agg(
            F.min("wave").alias("wave"),
            F.min("status").alias("status"),
            F.min("state").alias("state"),
        )
    )


def q_crawl_bfs_engine_staged(spark, sf_dir):
    """The full crawl engine FORCED onto the staged at-scale gears
    (chain_map_max_rows=0 disables both the fused wave loop and the
    broadcast chain map), checked against the SAME DuckDB oracle as
    crawl_bfs_engine."""
    return q_crawl_bfs_engine(spark, sf_dir, staged=True)


_BFS_FUSE_MAX_EDGES = 5_000_000  # ~80 MB of int64 arrays in one task


def _bfs_fused(edges: DataFrame, max_wave: int) -> DataFrame:
    """Every BFS wave in ONE executor-side task: when the (expandable) edge
    list fits a single Arrow batch, the level loop is vectorized numpy over
    int arrays — zero per-level shuffles and zero driver barriers. This is
    the AQE-style small-input strategy; the iterative DataFrame path in
    `q_frontier_bfs` is the 10^10-scale shape. Result-identical (both are
    level-synchronous first-discovery BFS; tests assert equality)."""
    def fn(batches):
        import numpy as np
        import pandas as pd

        srcs, dsts = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(np.int64))
            dsts.append(pdf["dst"].to_numpy(np.int64))
        src, dst = np.concatenate(srcs), np.concatenate(dsts)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        n = int(max(src.max(initial=0), dst.max(initial=0))) + 1
        starts = np.searchsorted(src, np.arange(n + 1))
        seen = np.zeros(n, dtype=bool)
        seen[0] = True
        frontier = np.array([0], dtype=np.int64)
        ids, waves = [frontier], [np.zeros(1, np.int64)]
        wave = 0
        while len(frontier) and wave < max_wave:
            cnt = starts[frontier + 1] - starts[frontier]
            total = int(cnt.sum())
            if not total:
                break
            # vectorized adjacency gather: for each frontier node u, the
            # rows dst[starts[u] : starts[u]+cnt[u]]
            idx = (np.repeat(starts[frontier], cnt)
                   + np.arange(total)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt))
            nbrs = dst[idx]
            new = np.unique(nbrs[~seen[nbrs]])
            if not len(new):
                break
            seen[new] = True
            wave += 1
            ids.append(new)
            waves.append(np.full(len(new), wave, np.int64))
            frontier = new
        yield pd.DataFrame({"id": np.concatenate(ids),
                            "wave": np.concatenate(waves).astype(np.int32)})

    # repartition(1): the fn must see the whole edge list in one task (and
    # emit the seed exactly once)
    return edges.repartition(1).mapInPandas(fn, "id long, wave int")


def q_frontier_bfs(spark, sf_dir, fuse_max_edges: int = _BFS_FUSE_MAX_EDGES):
    """The wave join in isolation: iterative anti-join BFS over the derived
    edge list (no fetch simulation) — the shape that runs at 10^10 scale.
    Small inputs (edge list fits one task) take the fused single-job path;
    fuse_max_edges=0 forces the staged iterative loop regardless of size."""
    docs = _t(spark, sf_dir, "documents")
    edges = G.edges_df(docs)
    ok_src = G.status_expr(F.col("src")) == 200
    edges = edges.filter(ok_src).localCheckpoint(eager=True)

    if edges.count() <= fuse_max_edges:
        reach = _bfs_fused(edges, max_wave=64)
        return reach.select(
            G.url_expr(F.col("id")).alias("url"),
            "wave",
            G.status_expr(F.col("id")).alias("status"),
            F.when(G.status_expr(F.col("id")) == 200, "OK")
            .otherwise("BROKEN").alias("state"),
        )

    frontier = spark.createDataFrame([(0, 0)], "id long, wave int")
    seen = frontier.select("id")
    out = [frontier]
    wave = 0
    LEVELS = 4  # levels expanded per driver job: at depth D the BFS pays
    # ceil(D/4) scheduling barriers instead of D — wave labels are exact
    # (each level anti-joins everything discovered before it), only the
    # emptiness probe is batched. Measured at sf0.1 (~60 levels, same
    # session): LEVELS=1 12.3s, 2 9.6s, 4 9.4s.
    while wave <= 60:
        batch = []
        probe_seen = seen
        cur = frontier
        for step in range(1, LEVELS + 1):
            nxt = (
                cur.join(edges, cur["id"] == edges["src"])
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(probe_seen, "id", "left_anti")
                .withColumn("wave", F.lit(wave + step))
                .localCheckpoint(eager=False)
            )
            batch.append(nxt)
            probe_seen = probe_seen.unionByName(nxt.select("id"))
            cur = nxt
        # ONE job per batch: the union count materializes every level's
        # lazy checkpoint (truncating lineage) and answers all emptiness
        # gates at once
        marked = batch[0].select(F.lit(1).alias("lvl"))
        for i, b in enumerate(batch[1:]):
            marked = marked.unionByName(b.select(F.lit(i + 2).alias("lvl")))
        lvl_counts = {r["lvl"]: r["count"]
                      for r in marked.groupBy("lvl").count().collect()}
        advanced = 0
        for i, nxt in enumerate(batch):
            if not lvl_counts.get(i + 1, 0):
                break
            out.append(nxt)
            seen = seen.unionByName(nxt.select("id"))
            frontier = nxt
            advanced += 1
        if advanced < LEVELS:
            break
        wave += advanced
    reach = out[0]
    for p in out[1:]:
        reach = reach.unionByName(p)
    return reach.select(
        G.url_expr(F.col("id")).alias("url"),
        "wave",
        G.status_expr(F.col("id")).alias("status"),
        F.when(G.status_expr(F.col("id")) == 200, "OK").otherwise("BROKEN").alias("state"),
    )


def q_frontier_bfs_staged(spark, sf_dir):
    """The BFS wave join FORCED onto the staged batched-anti-join loop
    (fuse_max_edges=0), checked against the SAME DuckDB oracle as
    frontier_bfs — the at-scale plan gets the external hash check."""
    return q_frontier_bfs(spark, sf_dir, fuse_max_edges=0)


def q_extract_links(spark, sf_dir):
    """Regex URL extraction from (linked) document text -> exploded links."""
    docs = _t(spark, sf_dir, "documents")
    linked = docs.select("doc_id", _linked_text(F.col("text")).alias("body"))
    return (
        linked.select(
            "doc_id",
            F.explode(F.regexp_extract_all("body", F.lit(_URL_RE), 0)).alias("link"),
        )
        .select(
            "doc_id", "link",
            F.regexp_extract("link", r"^https?://([^/]+)", 1).alias("host"),
        )
    )


def q_top_hosts(spark, sf_dir):
    links = q_extract_links(spark, sf_dir)
    return (
        links.groupBy("host")
        .agg(F.count("*").alias("n_links"), F.countDistinct("link").alias("n_urls"))
        .orderBy(F.desc("n_links"), "host")
        .limit(10)
    )


def q_link_pagerank(spark, sf_dir):
    """Host/page authority over the deterministic crawl graph: 5 power
    iterations at damping 0.85 (functions/graph.pagerank — iterative
    DataFrame joins + map-side-combined aggregates, rank vector
    localCheckpoint-ed per round). The DuckDB oracle replays all 5
    iterations as unrolled SQL, so the iterative dataflow itself is
    value-checked end to end. 6dp rounding absorbs engine-specific
    double accumulation order."""
    docs = _t(spark, sf_dir, "documents")
    pr = GR.pagerank(G.edges_df(docs), iters=5, damping=0.85)
    return pr.select("node", F.round("pagerank", 6).alias("pagerank"))


def q_link_hits(spark, sf_dir):
    """HITS hubs & authorities over the same deterministic crawl graph:
    5 mutual-reinforcement rounds with L1 normalization
    (functions/graph.hits — per-round join + map-side-combined sum,
    score vector localCheckpoint-ed). Complements link_pagerank: hub
    score ranks crawl-seed directories, auth score ranks keep-worthy
    content. The DuckDB oracle unrolls all 5 rounds; 6dp rounding
    absorbs engine-specific double accumulation order."""
    docs = _t(spark, sf_dir, "documents")
    hs = GR.hits(G.edges_df(docs), iters=5)
    return hs.select("node", F.round("hub", 6).alias("hub"),
                     F.round("auth", 6).alias("auth"))


def q_link_opic(spark, sf_dir):
    """OPIC online page importance over the deterministic crawl graph
    (functions/graph.opic — 5 synchronous cash-distribution rounds): the
    crawl-ORDER twin of link_pagerank; a frontier scheduler ranks by
    current cash without waiting for an offline power method. The DuckDB
    oracle replays all rounds as unrolled SQL; 6dp rounding absorbs
    double accumulation order."""
    docs = _t(spark, sf_dir, "documents")
    op = GR.opic(G.edges_df(docs), iters=5)
    return op.select("node", F.round("cash", 6).alias("cash"),
                     F.round("history", 6).alias("history"),
                     F.round("importance", 6).alias("importance"))


_LICENSE_MARKERS = (
    "",  # no marker -> 'none'
    "Creativecommons.org/licenses/by-nc/4.0",
    "shared under creativecommons.org/licenses/by-nd/4.0",
    "creativecommons.org/licenses/by-sa/4.0 legalcode",
    "CreativeCommons.org/licenses/by/4.0",
    "Released under CC0 1.0 Universal",
    "distributed under the MIT License",
    "Apache License, Version 2.0",
    "terms of the GNU General Public License",
    "Copyright 2024. All Rights Reserved.",
)


def q_text_license(spark, sf_dir):
    """Document license classification (functions/text.license_detect):
    in-text marker detection over LICENSE_CLASSES with most-restrictive-
    first CC precedence — the gate a license-aware corpus build filters
    on. Every doc gets a deterministic marker appended (doc_id % 10, one
    per class incl. none and cc-by-nd, mixed case) so the oracle
    exercises every branch; pure contains() chain, single codegen
    projection, zero regex."""
    docs = _t(spark, sf_dir, "documents")
    marker = F.element_at(
        F.array(*[F.lit(m) for m in _LICENSE_MARKERS]),
        (F.col("doc_id") % 10 + 1).cast("int"))
    return docs.select(
        "doc_id",
        T.license_detect(F.concat(F.col("text"), F.lit(" "), marker))
        .alias("license"))


def q_degree_powerlaw(spark, sf_dir):
    """In-degree distribution + discrete power-law exponent (Clauset et
    al. 2009 MLE, functions/graph.degree_powerlaw): the scale-free-shape
    sanity check on a crawled graph — bot farms and traps distort the
    tail long before samples show it. One map-side-combined groupBy +
    one-row rollup; oracle recomputes the distribution and the log-sum
    in SQL."""
    docs = _t(spark, sf_dir, "documents")
    return GR.degree_powerlaw(G.edges_df(docs), kmin=2)


def q_host_graph_stats(spark, sf_dir):
    """Host-graph interlinking report (functions/graph.host_graph_stats):
    page edges project onto hosts (node % 20 → site host, the frontier
    fixture mapping); per host: in/out page-link counts, distinct peer
    hosts both directions, integer insularity percentage. Two map-side-
    combined host aggregates + one host-sized full join."""
    docs = _t(spark, sf_dir, "documents")
    e = G.edges_df(docs).select(
        F.concat(F.lit("site"), (F.col("src") % 20).cast("string"))
        .alias("src_host"),
        F.concat(F.lit("site"), (F.col("dst") % 20).cast("string"))
        .alias("dst_host"))
    return GR.host_graph_stats(e)


def q_crawl_coverage(spark, sf_dir):
    """Crawl-completeness estimation over link-discovery events
    (functions/graph.discovery_coverage): Good-Turing sample coverage
    (probability the next discovered link is already seen — the "stop
    crawling?" signal) + bias-corrected Chao1 total-URL richness. Two
    map-side-combined aggregates and a one-row rollup; the DuckDB twin
    recomputes the full frequency spectrum."""
    docs = _t(spark, sf_dir, "documents")
    return GR.discovery_coverage(G.edges_df(docs))


def q_link_trustrank(spark, sf_dir):
    """TrustRank over the deterministic crawl graph: PageRank whose
    teleport vector is uniform over a trusted seed set (every 50th doc),
    so trust decays with link distance from the seeds — the classic
    link-farm demotion signal (functions/graph.trustrank; pairs with
    link_pagerank for the raw-authority side and link_spam for the
    structural side). The DuckDB oracle replays all 5 biased iterations
    as unrolled SQL; 6dp rounding absorbs double accumulation order."""
    docs = _t(spark, sf_dir, "documents")
    seeds = docs.select(F.col("doc_id").alias("id")).filter(
        F.col("id") % 50 == 0)
    tr = GR.trustrank(G.edges_df(docs), seeds, iters=5, damping=0.85)
    return tr.select("node", F.round("trust", 6).alias("trust"))


def q_link_communities(spark, sf_dir):
    """Label-propagation community detection over the same deterministic
    crawl graph: 4 synchronous rounds, most-frequent-neighbor label with
    smallest-label tie-break (functions/graph.label_propagation — per
    round one node-keyed join + two map-side-combinable aggregates,
    label vector localCheckpoint-ed). Complements link_pagerank/link_hits
    with the "which densely-linked neighborhood" signal used for site-
    family clustering and domain-balanced corpus mixing. The DuckDB
    oracle replays all 4 rounds as unrolled SQL — exact equality, no
    rounding (labels are integers)."""
    docs = _t(spark, sf_dir, "documents")
    return GR.label_propagation(G.edges_df(docs), iters=4)


def q_url_canonicalize(spark, sf_dir):
    """JVM-side canonicalization of messy derived URLs: lowercase scheme+host,
    strip default port, strip fragment, root empty path."""
    docs = _t(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://Site"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".Example:80/Path/"), F.col("doc_id").cast("string"),
            F.lit("#frag"), (F.col("doc_id") % 7).cast("string"),
        ).alias("raw"),
    )
    no_frag = F.regexp_replace("raw", r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z]+://([^/:]+)", 1))
    port = F.regexp_extract(no_frag, r"^[A-Za-z]+://[^/:]+:(\d+)", 1)
    path = F.regexp_extract(no_frag, r"^[A-Za-z]+://[^/]+(/.*)?$", 1)
    canon_port = F.when(
        (port == "") | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(scheme, F.lit("://"), host, canon_port,
                     F.when(path == "", "/").otherwise(path))
    frag = F.regexp_extract("raw", r"#(.*)$", 1)
    return messy.select("doc_id", canon.alias("canonical_url"), frag.alias("fragment"))


def q_frontier_dedup(spark, sf_dir):
    """J2: candidate URLs anti-joined against the seen set."""
    links = q_extract_links(spark, sf_dir)
    seen = links.filter(F.col("doc_id") % 3 == 0).select("link").distinct()
    return (
        links.select("link").distinct()
        .join(seen, "link", "left_anti")
        .select(F.col("link").alias("url"))
    )


def q_dedup_bloom_exact(spark, sf_dir):
    """J2 with the Bloom fast path (operators/bloom.py): candidates are split
    by a broadcast Bloom filter over the seen set, definite-new rows skip the
    anti-join shuffle, maybe-seen rows are verified exactly — output must be
    identical to a plain anti-join (reference fetch-once semantics,
    /root/reference/src/index.ts:813-817; the oracle IS the plain anti-join)."""
    from linkinator_spark.operators.bloom import build_bloom, dedup_with_bloom

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("http://corpus.test/p/"), F.col("doc_id").cast("string"))
    cand = docs.select(url.alias("url"))
    seen = docs.filter(F.col("doc_id") % 2 == 0).select(url.alias("url"))
    bloom = build_bloom(seen, expected=max(seen.count(), 64), fpp=0.01)
    return dedup_with_bloom(cand, seen, bloom).select("url")


def q_dedup_cuckoo_exact(spark, sf_dir):
    """J2 with the Cuckoo fast path (operators/cuckoo.py — the "Cuckoo" half
    of the north-star's "partitioned Bloom/Cuckoo URL-seen filter"): same
    contract as the Bloom twin — candidates the filter proves unseen skip
    the anti-join shuffle, the maybe-seen slice is verified exactly — so the
    output must be identical to a plain anti-join (reference fetch-once
    semantics, /root/reference/src/index.ts:813-817; the oracle IS the plain
    anti-join). Unlike Bloom, the filter also supports deletion (recrawl
    windows) at ~4 bytes/key, fpp ~0.012%."""
    from linkinator_spark.operators.cuckoo import build_cuckoo, dedup_with_cuckoo

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("http://corpus.test/p/"), F.col("doc_id").cast("string"))
    cand = docs.select(url.alias("url"))
    seen = docs.filter(F.col("doc_id") % 2 == 0).select(url.alias("url"))
    cf = build_cuckoo(seen, expected=max(seen.count(), 64))
    return dedup_with_cuckoo(cand, seen, cf).select("url")


def q_dup_broken_rereport(spark, sf_dir):
    """J1 (src/index.ts:840-875): a duplicate (child, parent) edge — any edge
    whose child already has an earlier parent — re-reports the child's result
    only when it is BROKEN (status >= 400)."""
    docs = _t(spark, sf_dir, "documents")
    edges = G.edges_df(docs).distinct()
    w = Window.partitionBy("dst")
    firsts = edges.withColumn("_min_src", F.min("src").over(w))
    dup_broken = firsts.filter(
        (F.col("src") != F.col("_min_src"))
        & (G.status_expr(F.col("dst")) >= 400)
    )
    return dup_broken.select(
        G.url_expr(F.col("dst")).alias("url"),
        G.url_expr(F.col("src")).alias("parent"),
        G.status_expr(F.col("dst")).cast("int").alias("status"),
    )


def q_robots_gate(spark, sf_dir):
    """robots.txt politeness end-to-end: per-host robots bodies parsed by the
    engine (parse_robots_txt via Arrow mapInPandas), frontier split by
    longest-prefix Allow/Disallow JVM expressions (operators/robots.py); the
    oracle reproduces the rule arithmetic directly in SQL. Even hosts
    disallow /page/ but re-allow /page/special/."""
    from linkinator_spark.operators.robots import (
        host_rules_from_bodies, robots_filter,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 20
    host = F.concat(F.lit("site"), m.cast("string"), F.lit(".example"))
    path = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("/page/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("/page/special/"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("/other/"), F.col("doc_id").cast("string")))
    )
    frontier = docs.select(
        F.concat(F.lit("http://"), host, path).alias("url"), host.alias("host")
    )
    bodies = frontier.select("host").distinct().withColumn(
        "body",
        F.when(
            F.regexp_extract("host", r"site(\d+)", 1).cast("int") % 2 == 0,
            F.lit("User-agent: *\nDisallow: /page/\nAllow: /page/special/\n"),
        ).otherwise(F.lit("")),
    )
    rules = host_rules_from_bodies(bodies)
    allowed, disallowed = robots_filter(frontier, rules)
    return allowed.select("url", F.lit(True).alias("allowed")).unionByName(
        disallowed.select("url", F.lit(False).alias("allowed"))
    )


def q_politeness_schedule(spark, sf_dir):
    """Per-host FIFO politeness: rank within host, assign fetch wave by a
    per-host budget of 4 — the window form of the min-heap scheduler."""
    links = q_extract_links(spark, sf_dir).select("host", "link").distinct()
    w = Window.partitionBy("host").orderBy("link")
    return links.select(
        "host", F.col("link").alias("url"),
        F.row_number().over(w).alias("host_seq"),
        F.floor((F.row_number().over(w) - 1) / 4).cast("int").alias("fetch_wave"),
    )


def q_robots_wildcards(spark, sf_dir):
    """RFC 9309 wildcard rule matching through the engine's
    robots_filter (operators/robots.py): a '$'-anchored extension rule,
    a mid-pattern '*' rule, and an Allow that ties a Disallow on raw
    length (Allow must win). The oracle replays the same rules as
    hand-compiled regexes + the length arithmetic, so the codegen
    escape→wildcard-expand→regexp_like chain is value-checked against
    DuckDB, not only against pytest."""
    from linkinator_spark.operators.robots import robots_filter

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    path = (
        F.when(i % 6 == 0, F.concat(F.lit("/a/x"), i.cast("string"),
                                    F.lit(".tmp")))
        .when(i % 6 == 1, F.concat(F.lit("/a/x"), i.cast("string"),
                                   F.lit(".tmpX")))
        .when(i % 6 == 2, F.lit("/cal/2023/day"))
        .when(i % 6 == 3, F.lit("/cal/2024/day"))
        .when(i % 6 == 4, F.lit("/cal/2025/x"))
        .otherwise(F.concat(F.lit("/plain/"), i.cast("string")))
    )
    frontier = docs.select(
        F.concat(F.lit("http://w.example"), path).alias("url"),
        F.lit("w.example").alias("host"))
    rules = spark.createDataFrame(
        [("w.example", ["/*.tmp$", "/cal/*/day"], ["/cal/2024*"], None)],
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay double")
    allowed, disallowed = robots_filter(frontier, rules)
    return (allowed.select("url", F.lit(True).alias("allowed"))
            .unionByName(disallowed.select(
                "url", F.lit(False).alias("allowed"))))


def q_politeness_ip(spark, sf_dir):
    """Per-SERVER politeness: sibling subdomains resolve (deterministic
    DNS stand-in, operators/politeness.resolve_server_ips — bit-exact in
    DuckDB) to one shared IP, and the scheduler budgets fetches per IP
    rather than per hostname, so vanity-subdomain farms can't multiply
    their budget. The per-IP FIFO rank runs through
    hierarchical_row_number (stripe ranks + offsets — a server fronting
    thousands of subdomains never serializes into one window task)."""
    from linkinator_spark.operators.politeness import politeness_take_ip

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    # odd doc_ids land under a multi-label public suffix (co.uk): the
    # PSL rule must keep site0.co.uk / site1.co.uk / site2.co.uk as
    # SEPARATE registrable domains (separate server budgets), not one
    # collapsed 'co.uk' bucket
    tld = F.when(i % 2 == 0, F.lit(".test")).otherwise(F.lit(".co.uk"))
    host = F.concat(F.lit("s"), (i % 7).cast("string"), F.lit(".site"),
                    (i % 3).cast("string"), tld)
    frontier = docs.select(
        host.alias("host"),
        F.concat(F.lit("http://"), host, F.lit("/p/"),
                 i.cast("string")).alias("url"),
    )
    return politeness_take_ip(frontier, budget=8).select(
        "server_ip", "host", "url", F.col("ip_rank").cast("long"))


def q_host_delay_adaptive(spark, sf_dir):
    """AIMD congestion-controlled per-host delay over the fetch history
    (operators/politeness.adaptive_host_delay): delay doubles on each
    throttle signal (429/5xx), decreases additively on success — one
    map-side-combined groupBy(host) + a codegen higher-order fold over
    the event-flag array. The DuckDB twin replays the identical fold
    via list_reduce."""
    ev = _t(spark, sf_dir, "events")
    fetches = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
        .alias("host"),
        F.col("event_id").alias("seq"),
        (F.col("event_type") == "error").cast("int").alias("throttle"))
    return PLT.adaptive_host_delay(fetches)


def q_frontier_priority(spark, sf_dir):
    """Authority-weighted frontier scheduling — the priority-queue form
    with a learned/computed key instead of FIFO: PageRank over the derived
    link graph (the link_pagerank machinery, 5 exact power iterations)
    becomes an integer micro-priority per candidate URL; the politeness
    scheduler takes each host's top-4 by DESCENDING priority (the same
    skew-salted two-phase top-K as FIFO politeness, just a different sort
    key), and the global emission order is the scale-safe range-partition
    rank (global_fifo_rank) on (-priority, url) — no single-task global
    sort anywhere. Oracle: unrolled-SQL PageRank + two window ranks."""
    from linkinator_spark.operators.politeness import (
        global_fifo_rank,
        politeness_take,
    )

    docs = _t(spark, sf_dir, "documents")
    pr = GR.pagerank(G.edges_df(docs), iters=5, damping=0.85)
    frontier = pr.select(
        F.concat(F.lit("http://site"), (F.col("node") % 20).cast("string"),
                 F.lit(".example/p/"), F.col("node").cast("string"))
        .alias("url"),
        F.concat(F.lit("site"), (F.col("node") % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        F.round(F.col("pagerank") * 1e6, 0).cast("long")
        .alias("priority_micro"),
    ).withColumn("_negp", -F.col("priority_micro"))
    took = politeness_take(frontier, budget=4, order_cols=("_negp", "url"))
    return (
        global_fifo_rank(took, "_negp", "url", out_col="emit_rank")
        .select("url", "host", "priority_micro", "host_rank", "emit_rank")
    )


def q_frontier_opic(spark, sf_dir):
    """OPIC-driven frontier scheduling — the online counterpart of
    frontier_priority: candidates rank by CURRENT OPIC cash (the mass
    that arrived since each page's last visit — exactly the paper's
    crawl-ordering signal) instead of a converged offline PageRank.
    Same composition: integer micro-priority, skew-salted per-host
    top-4 by descending cash, scale-safe global emission rank. Oracle:
    unrolled-SQL OPIC + two window ranks."""
    from linkinator_spark.operators.politeness import (
        global_fifo_rank,
        politeness_take,
    )

    docs = _t(spark, sf_dir, "documents")
    op = GR.opic(G.edges_df(docs), iters=5)
    frontier = op.select(
        F.concat(F.lit("http://site"), (F.col("node") % 20).cast("string"),
                 F.lit(".example/p/"), F.col("node").cast("string"))
        .alias("url"),
        F.concat(F.lit("site"), (F.col("node") % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        F.round(F.col("cash") * 1e6, 0).cast("long")
        .alias("priority_micro"),
    ).withColumn("_negp", -F.col("priority_micro"))
    took = politeness_take(frontier, budget=4, order_cols=("_negp", "url"))
    return (
        global_fifo_rank(took, "_negp", "url", out_col="emit_rank")
        .select("url", "host", "priority_micro", "host_rank", "emit_rank")
    )


def q_revisit_schedule(spark, sf_dir):
    """Freshness-driven recrawl scheduling (operators/revisit.py — Cho &
    Garcia-Molina change-rate estimation over the standing fetch history,
    fed into the same skew-salted politeness scheduler as discovery
    traffic): each doc becomes a URL with 3-6 past fetches whose content
    hash rolls over every ``1 + doc_id % 3`` fetches (docs with
    doc_id % 5 == 0 never change and must NOT be scheduled). The
    change-rate estimator rounds to integer micro-nats (the lm.py
    F.log/DuckDB-ln precedent); the priority is a pure int64 product;
    per-host top-5 and the global emission rank reuse politeness_take +
    global_fifo_rank. Oracle: lag-window change count + the same
    estimator + two window ranks in DuckDB."""
    from linkinator_spark.operators.revisit import revisit_schedule

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    base = docs.select(
        i.alias("doc_id"),
        F.concat(F.lit("site"), (i % 20).cast("string"),
                 F.lit(".example")).alias("host"),
        F.explode(
            F.sequence(F.lit(0), (i % 4 + 2).cast("int"))).alias("j"),
    )
    period = F.col("doc_id") % 3 + 1
    version = F.when(F.col("doc_id") % 5 == 0, F.lit(0)).otherwise(
        F.floor(F.col("j") / period))
    hist = base.select(
        F.concat(F.lit("http://"), F.col("host"), F.lit("/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "host",
        (F.col("j") * 100).cast("long").alias("fetch_ts"),
        F.md5(version.cast("string")).alias("content_hash"),
    )
    return revisit_schedule(hist, now_ts=900, interval=100, budget=5)


def q_host_health(spark, sf_dir):
    """Per-host circuit breaker (operators/health.py — the Heritrix/Nutch
    host-quarantine signal): events replay as fetch attempts across 25
    hosts; hosts 0-4 run a ~40% blended failure rate (rate trip at 30%),
    host 7's tail beyond event 9000 is all failures (trailing trip even
    though its overall rate is fine), the rest stay healthy. Two
    map-side-combined host aggregates + a failed-side-only host join (the
    AQE-skew-join shape) — no per-host window. Oracle replays both
    passes and the cross-multiplied rate rule in DuckDB."""
    from linkinator_spark.operators.health import host_health

    events = _t(spark, sf_dir, "events")
    host = F.concat(F.lit("h"), (F.col("user_id") % 25).cast("string"))
    failed = (
        (F.col("event_type") == "error")
        | ((F.col("user_id") % 25 < 5) & (F.col("event_type") == "click"))
        | ((F.col("user_id") % 25 == 7) & (F.col("event_id") > 9000)))
    fetches = events.select(
        host.alias("host"),
        F.col("event_id").cast("long").alias("ts"),
        failed.alias("failed"))
    return host_health(fetches, rate_micro=300_000, min_fetches=20,
                       max_trailing=5)


def q_crawl_diff(spark, sf_dir):
    """Crawl snapshot diff (operators/diff.py — the between-runs report a
    CI user derives by hand from the reference's one-shot output): two
    derived result snapshots with overlapping URL sets and shifted status
    arithmetic produce every transition class — new (%10 docs absent from
    prev), gone (%13 absent from curr), newly_broken (%19 newly 404),
    fixed (%17 recovered), still_broken (%23 broken in both),
    changed (%7 OK 200 -> OK 301) and unchanged. ONE full-outer join on
    the unique uniform URL key + a codegen CASE; oracle is the same join
    in DuckDB."""
    from linkinator_spark.operators.diff import crawl_diff

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    prev = docs.filter(i % 10 != 0).select(
        G.url_expr(i).alias("url"), G.status_expr(i).alias("status"))
    prev = prev.withColumn(
        "state",
        F.when(F.col("status") == 200, F.lit("OK")).otherwise(
            F.lit("BROKEN")))
    curr_status = (
        F.when((i > 0) & (i % 19 == 0), F.lit(404))
        .when((i > 0) & (i % 23 == 0), F.lit(503))
        .when((i > 0) & (i % 7 == 0), F.lit(301))
        .otherwise(F.lit(200)))
    curr = docs.filter(i % 13 != 0).select(
        G.url_expr(i).alias("url"), curr_status.alias("status"))
    curr = curr.withColumn(
        "state",
        F.when(F.col("status").isin(404, 503), F.lit("BROKEN")).otherwise(
            F.lit("OK")))
    return crawl_diff(prev, curr)


def q_sitemap_ingest(spark, sf_dir):
    """Sitemap discovery + ingestion (sources/sitemap.py — the crawl-tier
    seeding hop linkinator lacks; RFC 9309 §2.3 / sitemaps.org): per host
    (doc_id%7) a robots.txt declares one sitemapindex, the index lists two
    urlset parts (doc_id%2), and each doc plants one <url> entry with
    priority BEFORE loc (field-order independence), lastmod omitted on
    %3==0 and priority omitted on %4==0 (protocol default 0.5). The whole
    XML build/strip/parse round trip must reproduce the doc_id arithmetic
    the oracle computes directly — a namespace slip, block mis-framing, or
    field mis-alignment breaks the hash. All parsing is codegen
    regexp/xpath; the only join broadcasts the metadata-scale body table."""
    from linkinator_spark.sources import sitemap as SM

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 7).cast("string"), F.lit(".sm.example"))
    loc = F.concat(F.lit("http://"), host, F.lit("/p/"), d.cast("string"))
    lastmod_tag = F.when(
        d % 3 != 0,
        F.concat(F.lit("<lastmod>2026-05-1"), (d % 9).cast("string"),
                 F.lit("</lastmod>"))).otherwise(F.lit(""))
    pri_tag = F.when(
        d % 4 != 0,
        F.concat(F.lit("<priority>0."), (d % 10).cast("string"),
                 F.lit("</priority>"))).otherwise(F.lit(""))
    entry = F.concat(
        F.lit("<url>"), pri_tag,
        F.lit("<loc>"), loc, F.lit("</loc>"), lastmod_tag, F.lit("</url>"))
    parts = docs.select(
        host.alias("host"), (d % 2).cast("string").alias("part"),
        d.alias("doc_id"), entry.alias("entry"))
    urlsets = (
        parts.groupBy("host", "part")
        .agg(F.concat(
            F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/'
                  'sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s["entry"]), ""),
            F.lit("</urlset>")).alias("xml"))
        .select(
            F.concat(F.lit("http://"), F.col("host"), F.lit("/sm_"),
                     F.col("part"), F.lit(".xml")).alias("sitemap_url"),
            "xml"))
    hosts = docs.select(host.alias("host")).distinct()
    base = F.concat(F.lit("http://"), F.col("host"))
    indexes = hosts.select(
        F.concat(base, F.lit("/sitemap.xml")).alias("sitemap_url"),
        F.concat(
            F.lit('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
                  'sitemap/0.9"><sitemap><loc>'),
            base, F.lit("/sm_0.xml</loc></sitemap><sitemap><loc>"),
            base, F.lit("/sm_1.xml</loc></sitemap></sitemapindex>"),
        ).alias("xml"))
    robots = hosts.select(
        "host",
        F.concat(F.lit("User-agent: *\nDisallow: /private\nSitemap: "),
                 base, F.lit("/sitemap.xml")).alias("robots_txt"))
    return SM.resolve_sitemaps(robots, urlsets.unionByName(indexes))


def q_phrase_search(spark, sf_dir):
    """Exact phrase query over positional tokens (search.phrase_search):
    a token at (doc, pos) matching phrase offset k votes for start
    pos-k; starts with every offset present are hits. Phrases are
    corpus-derived (tokens 3..5 of docs 0-2) so both engines build the
    same query set and every phrase is guaranteed >=1 hit. Oracle:
    identical vote-and-count logic in DuckDB. The broadcast-dictionary
    semi-join shape (only phrase-term tokens shuffle) is the same as
    bm25_topk's."""
    from linkinator_spark.functions.search import WORD_RE, phrase_search

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("phrase_id"),
        F.array_join(
            F.slice(F.regexp_extract_all(F.lower(F.col("text")),
                                         F.lit(WORD_RE), 0), 3, 3),
            " ").alias("phrase"),
    )
    return phrase_search(docs, phrases)


def q_host_cardinality_hll(spark, sf_dir):
    """Per-host HyperLogLog distinct-URL estimate
    (sketches.hll_cardinality, p=6): the frontier's "how many distinct
    URLs per host" without an exact count_distinct expansion. The input
    re-unions every third URL so distinctness is actually exercised.
    The oracle replays every register from the same portable md5-prefix
    hash — v_zero and the integer register sum s_scaled pin the sketch
    state bit-for-bit; est adds the linear-counting branch."""
    docs = _t(spark, sf_dir, "documents")

    def derive(df):
        return df.select(
            F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string"))
            .alias("host"),
            F.concat(F.lit("http://corpus.test/p/"),
                     F.col("doc_id").cast("string")).alias("url"),
        )

    rows = derive(docs).unionByName(derive(docs.filter(F.col("doc_id") % 3 == 0)))
    return SK.hll_cardinality(rows, "url", ["host"])


def q_host_heavy_hitters(spark, sf_dir):
    """Count-min frequency estimates over a skewed key stream
    (sketches.cms_estimate, d=4 w=64): five hot keys carry half the
    rows, the rest are singletons, so the tiny sketch visibly
    overcounts colliding cold keys while est >= exact holds everywhere
    (the CMS one-sided guarantee, pinned by the overcount column). The
    oracle rebuilds every cell from the same portable hash."""
    docs = _t(spark, sf_dir, "documents")
    keys = docs.select(
        F.when((F.col("doc_id") % 2) == 0,
               F.concat(F.lit("hot"), (F.col("doc_id") % 5).cast("string")))
        .otherwise(F.concat(F.lit("cold"), F.col("doc_id").cast("string")))
        .alias("key"))
    return SK.cms_estimate(keys, "key")


def q_host_mirrors(spark, sf_dir):
    """Mirror-site detection (mirrors.host_mirrors): hosts pair through
    shared content fingerprints (equi-join, never all-pairs), Jaccard
    in integer micro-points. The derived site set plants five perfect
    mirrors (every 4th doc re-hosted under m0-m4 lands entirely on one
    origin host each) and one partial mirror p0 (every 8th doc) whose
    Jaccard is ~1/6 against several hosts — both families must surface
    above the 0.1 threshold with exact shared/size/jaccard values."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.concat(F.lit("f"), F.col("doc_id").cast("string"))
    orig = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("host"), fp.alias("fp"))
    full = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("m"), (F.col("doc_id") % 5).cast("string"))
        .alias("host"), fp.alias("fp"))
    part = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.lit("p0").alias("host"), fp.alias("fp"))
    sites = orig.unionByName(full).unionByName(part)
    return MR.host_mirrors(sites, min_jaccard_micro=100_000)


def _mirror_sites(spark, sf_dir):
    """The planted mirror-site table q_host_mirrors documents, shared
    with the group-closure query."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.concat(F.lit("f"), F.col("doc_id").cast("string"))
    orig = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("host"), fp.alias("fp"))
    full = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("m"), (F.col("doc_id") % 5).cast("string"))
        .alias("host"), fp.alias("fp"))
    part = docs.filter(F.col("doc_id") % 8 == 0).select(
        F.lit("p0").alias("host"), fp.alias("fp"))
    return orig.unionByName(full).unionByName(part)


def q_host_mirror_groups(spark, sf_dir):
    """Mirror-closure canonical election (mirrors.host_mirror_groups —
    the CommonCrawl/IA "mirror collapse"): mirror pairs close
    transitively via connected_components and each group elects a
    canonical host by (crawl volume desc, host asc) through a
    struct-min aggregate (never a per-component window). The DuckDB
    twin replays the closure as a recursive CTE (the dedup_cc_canonical
    pattern) and the election as a row_number."""
    return MR.host_mirror_groups(_mirror_sites(spark, sf_dir),
                                 min_jaccard_micro=100_000)


def q_inverted_index(spark, sf_dir):
    """Positional inverted index over the raw corpus text
    (search.inverted_index): term -> df, total_tf, and the full ordered
    posting list ('%012d@pos.pos' entries). The salted three-phase build
    (per-(term,doc) partial -> per-(term,bucket) collect -> <=salt-array
    merge) must agree with DuckDB's direct group-and-sort — a bucket
    mis-merge, position mis-sort, or padding slip breaks the hash.
    min_df=2 exercises the hapax pruning."""
    from linkinator_spark.functions.search import inverted_index

    out = inverted_index(_t(spark, sf_dir, "documents"), min_df=2)
    # driver-facing outputs must be atomic (pandas hashers cannot hash
    # list cells): join the already-sorted posting list into one string
    return out.select("term", "df", "total_tf",
                      F.array_join("postings", ",").alias("postings"))


def q_host_delay_maxwins(spark, sf_dir):
    """J3/A4: per-host retry-after delays merge max-wins."""
    events = _t(spark, sf_dir, "events")
    delays = events.filter(F.col("event_type") == "error").select(
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string")).alias("host"),
        (F.col("value") * 10).alias("not_before"),
    )
    return delays.groupBy("host").agg(
        F.round(F.max("not_before"), 6).alias("not_before")
    )


def q_redirect_resolve(spark, sf_dir):
    """S2 redirect machinery standalone, value-checked: the barrier-free
    chain resolver (follow_redirects_chain — hop cap 20, Location resolve,
    landing re-request) over the derived redirect graph
    (graphgen.redirect_pages_from_documents: +5 chains, %25 terminals,
    %125==120 back-jump 4-cycles that exceed the cap). Oracle: DuckDB
    recursive CTE following the same arithmetic. Also guards request()'s
    row preservation when distinct chains converge on one landing URL."""
    from linkinator_spark.operators.fetch import (
        build_chain_map, fetch_once, prepare_pages_dim,
    )

    docs = _t(spark, sf_dir, "documents")
    pages = G.redirect_pages_from_documents(docs)
    pages_dim = prepare_pages_dim(pages)
    frame = docs.select(
        G.url_expr(F.col("doc_id")).alias("url"), F.lit(1).alias("attempt"))
    cfg = CheckOptions(paths=[])
    bc = spark.sparkContext.broadcast(build_chain_map(pages))
    out = fetch_once(frame, pages_dim, F.lit("HEAD"), cfg, None, chain_bc=bc)
    return out.select(
        "url",
        F.col("status").cast("int").alias("status"),
        "final_url",
        F.array_contains(
            "fetch_failures", "TypeError: redirect count exceeded"
        ).alias("exceeded"),
    )


def q_retry_backoff(spark, sf_dir):
    """Exponential backoff schedule with deterministic (hash-seeded) jitter
    for the first 5 retries of every 404/503 node in the derived graph."""
    docs = _t(spark, sf_dir, "documents")
    status = G.status_expr(F.col("doc_id"))
    broken = docs.select("doc_id").filter(status != 200)
    retries = broken.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.lit(5))).alias("retry_n")
    )
    url = G.url_expr(F.col("doc_id"))
    jitter_ms = F.pmod(
        T.portable_hash64(F.concat(url, F.lit("#"), F.col("retry_n").cast("string"))),
        F.lit(3000),
    )
    return retries.select(
        url.alias("url"), "retry_n",
        F.round(F.pow(F.lit(2.0), F.col("retry_n")) + jitter_ms / 1000.0, 6).alias("backoff_s"),
    )


def q_classify_taxonomy(spark, sf_dir):
    """The classifier CASE chain over a synthetic status matrix (statusCodes
    map with exact-beats-wildcard, bot-protection skips, redirect modes)."""
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    statuses = [200, 201, 301, 403, 404, 410, 429, 500, 503, 999]
    status = F.element_at(
        F.array(*[F.lit(s) for s in statuses]), (i % len(statuses) + 1).cast("int")
    )
    frame = docs.select(
        G.url_expr(i).alias("url"),
        status.alias("status"),
        F.lit(True).alias("has_response"),
        (i % 2 == 0).alias("has_body"),
        F.lit(False).alias("cf_mitigated"),
        F.lit(None).cast("string").alias("final_url"),
        F.lit(None).cast("string").alias("location"),
        F.array().cast("array<string>").alias("fetch_failures"),
    )
    cfg = CheckOptions(status_codes={"403": "ok", "4xx": "skip", "5xx": "error"})
    out = classify(frame, cfg)
    return out.select("url", "status", "state")


# ---------------------------------------------------------------------------
# span / interleaved-document queries
# ---------------------------------------------------------------------------

def q_span_flatten(spark, sf_dir):
    """Derive an interleaved span sequence from each document (fixed-width
    40-char chunks, every 4th chunk a media_ref), explode with ordinality,
    and emit rows that must survive byte-identical — the per-row
    span-sequence invariant (kind, text, media_ref, order)."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    # the chunk/span derivation is an interpreted nested transform (+ md5
    # per media chunk); spread the narrow scan first (no-op when wide)
    docs = spread_small_scan(
        _t(spark, sf_dir, "documents").select("doc_id", "text"))
    n_chunks = F.ceil(F.greatest(F.length("text"), F.lit(1)) / 40).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substring(F.col("text"), i * 40 + 1, 40),
    )
    spans = F.transform(
        chunks,
        lambda c, j: F.struct(
            F.when(j % 4 == 3, F.lit("media_ref")).otherwise(F.lit("text")).alias("kind"),
            F.when(j % 4 == 3, F.lit("")).otherwise(c).alias("text"),
            F.when(j % 4 == 3,
                   F.concat(F.lit("http://m.example/"), F.md5(c))).otherwise(F.lit("")).alias("media_ref"),
            j.cast("int").alias("offset"),
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(spans).alias("offset_check", "span"))
        .select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )


def q_interleave_gate(spark, sf_dir):
    """OBELICS-style interleaved-document gate
    (functions/interleave.gate_interleaved) over the derived span table:
    one map-side-combined groupBy(doc_id) computes exact media/text/token
    counts, then a codegen CASE chain rejects docs with no media (the
    sub-121-char docs here), too many media, too little text, or a bad
    text/media balance (cross-multiplied — no float division). Oracle
    replays the span synthesis + the same regex token count + the same
    rule order in DuckDB."""
    return IV.gate_interleaved(
        q_span_flatten(spark, sf_dir),
        min_media=1, max_media=2, min_tokens=60, min_tokens_per_media=35)


def q_span_extract(spark, sf_dir):
    """Kind-aware candidate-link extraction from interleaved span
    sequences — the north-rule's extraction stage surfaced as an oracle
    query: html spans parse through the SAX walker (tag→attr table,
    reference src/links.ts:8-41), markdown spans compile to html first
    (src/server.ts markdown path), media_ref spans emit their reference
    at their document position — all inside ONE Arrow-batched
    mapInPandas pass (extract.make_candidate_links_udf, the same batch
    fn the crawl engine runs), no per-row Python. One deterministic link
    is planted per span kind (markdown on %3, media on %4) so the DuckDB
    twin replays the parser's ordinal-ordered output exactly."""
    from linkinator_spark.functions import extract as EX

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html_span = F.concat(
        F.lit('<p>intro</p><a href="http://site'), (d % 20).cast("string"),
        F.lit(".example/page/"), d.cast("string"), F.lit('">x</a>'))
    md_span = F.when(
        d % 3 == 0,
        F.concat(F.lit("see [ref](https://ref.example/r/"),
                 (d % 50).cast("string"), F.lit(")")),
    ).otherwise(F.lit("plain prose without any link"))
    media = F.concat(F.lit("http://m.example/"),
                     F.md5(d.cast("string")))
    spans = F.array(
        F.struct(F.lit("html").alias("kind"), html_span.alias("text"),
                 F.lit("").alias("media_ref"), F.lit(0).alias("offset")),
        F.struct(F.lit("markdown").alias("kind"), md_span.alias("text"),
                 F.lit("").alias("media_ref"), F.lit(1).alias("offset")),
        F.struct(F.lit("media_ref").alias("kind"), F.lit("").alias("text"),
                 F.when(d % 4 == 0, media).otherwise(F.lit(""))
                 .alias("media_ref"), F.lit(2).alias("offset")),
    )
    pages = docs.select(
        F.concat(F.lit("http://host.example/p/"),
                 d.cast("string")).alias("page_url"),
        F.concat(F.lit("http://host.example/p/"),
                 d.cast("string")).alias("base_url"),
        F.lit("html").alias("content_kind"),
        spans.alias("spans"),
    )
    from linkinator_spark.functions.partitioning import spread_small_scan

    out = spread_small_scan(pages).mapInPandas(
        EX.make_candidate_links_udf(check_css=False, markdown=True),
        EX.CANDIDATE_SCHEMA)
    return out.select("page_url", "ordinal", "raw_link", "resolved_url")


def q_span_anchors(spark, sf_dir):
    """Fragment-target extraction from span sequences
    (extract.make_anchors_udf — the fragment-validation side of the
    crawl): html id attributes collected by the SAX walker plus markdown
    headings compiled to GitHub-flavored anchors (gfm_heading_id,
    reference src/server.ts:147-165), one Arrow batch pass. The DuckDB
    twin rebuilds the slugs from the same plantings (ascii-only, so the
    \\w classes agree)."""
    from linkinator_spark.functions import extract as EX

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html_span = F.concat(
        F.lit('<h1 id="top">T</h1><div id="intro'), (d % 5).cast("string"),
        F.lit('">i</div>'))
    md_span = F.concat(
        F.lit("## Section "), (d % 7).cast("string"), F.lit(" Overview!"))
    spans = F.array(
        F.struct(F.lit("html").alias("kind"), html_span.alias("text"),
                 F.lit("").alias("media_ref"), F.lit(0).alias("offset")),
        F.struct(F.lit("markdown").alias("kind"), md_span.alias("text"),
                 F.lit("").alias("media_ref"), F.lit(1).alias("offset")),
    )
    pages = docs.select(
        F.concat(F.lit("http://host.example/p/"),
                 d.cast("string")).alias("page_url"),
        spans.alias("spans"),
    )
    out = pages.mapInPandas(
        EX.make_anchors_udf(markdown=True), EX.ANCHORS_SCHEMA)
    # Driver-facing outputs must be atomic (the harness hashes cells via
    # pandas, which cannot hash list cells) — join the sorted anchor set
    # into one scalar string.
    return out.select(
        "page_url",
        F.array_join(F.sort_array("anchors"), "|").alias("anchors"),
        F.size("anchors").alias("n_anchors"),
        F.md5("body_text").alias("body_md5"))


def q_span_captions(spark, sf_dir):
    """MMC4/OBELICS-style media-caption pairing over the interleaved
    span table (interleave.caption_pairs): each media span pairs with
    the nearest text span by offset, ties to the preceding text. One
    uniform doc-keyed shuffle; the alignment itself is a codegen array
    fold bounded by the document's own span count."""
    return IV.caption_pairs(q_span_flatten(spark, sf_dir))


def q_span_render(spark, sf_dir):
    """Interleaved-sequence rendering (functions/interleave.render_spans):
    reassemble each document's model-input stream from the exploded span
    table — offset-ordered text pieces with <|media:REF|> placeholders.
    The reassembly sort is array_sort over (offset, piece) structs, so
    the result is partition-order independent; the only shuffle keys on
    the uniform doc id."""
    from linkinator_spark.functions import interleave as IV

    return IV.render_spans(q_span_flatten(spark, sf_dir))


def q_span_roundtrip(spark, sf_dir):
    """Span-sequence equality check: reassemble text spans in offset order
    and compare with a direct chunking — count of intact documents."""
    spans = q_span_flatten(spark, sf_dir)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("kind") == "media_ref", 1).otherwise(0)).cast("long").alias("n_media"),
            F.md5(F.concat_ws("", F.transform(
                F.array_sort(
                    F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
                ),
                lambda s: F.concat_ws(
                    "|", s.kind, s.text, s.media_ref, s.offset.cast("string")
                ),
            ))).alias("seq_hash"),
        )
    )


# ---------------------------------------------------------------------------
# dedup queries
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return D.exact_duplicates(_docs_with_dups(spark, sf_dir)).select(
        "content_key", "keeper_id", "n_copies"
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_candidate_pairs(
        _docs_with_dups(spark, sf_dir),
        n_hashes=MINHASH_N, bands=MINHASH_BANDS, k=SHINGLE_K,
    )


def q_dedup_jaccard(spark, sf_dir):
    docs = _docs_with_dups(spark, sf_dir)
    cands = D.minhash_candidate_pairs(
        docs, n_hashes=MINHASH_N, bands=MINHASH_BANDS, k=SHINGLE_K
    )
    return D.jaccard_pairs(docs, cands, threshold=0.5, k=SHINGLE_K)


def q_dedup_cc_canonical(spark, sf_dir):
    """Near-dup clustering end-to-end: MinHash bands -> Jaccard verify ->
    alternating-star connected components -> one keeper per cluster.
    Collapses transitive near-dup chains (A~B~C without A~C) into ONE
    keeper — the step a training corpus actually needs after pair
    generation. Oracle: recursive-CTE transitive closure over the same
    verified pairs."""
    return D.near_dup_clusters(
        _docs_with_dups(spark, sf_dir), threshold=0.5,
        n_hashes=MINHASH_N, bands=MINHASH_BANDS, k=SHINGLE_K,
    )


def q_dedup_cluster_keeper(spark, sf_dir):
    """near_dup_clusters with the best-copy keeper policy: the keeper is
    the longest member of each cluster (ties: smallest id) instead of
    the min-id label — keep the best copy, not an arbitrary one. The
    argmax is a map-side-combined max_by per component. Oracle: the same
    recursive-CTE closure, keeper via argmax over (length, -id)."""
    docs = _docs_with_dups(spark, sf_dir).withColumn(
        "score", F.length("text").cast("bigint"))
    return D.near_dup_clusters(
        docs, threshold=0.5,
        n_hashes=MINHASH_N, bands=MINHASH_BANDS, k=SHINGLE_K,
        score_col="score",
    )


def _incremental_batch(spark, sf_dir):
    """A deterministic 'day's crawl': perturbed copies of doc_id%10==0
    (near-dups of the standing corpus) plus md5-garbage docs for
    doc_id%10==3 (genuinely novel) — same derivation in the SQL twin."""
    docs = _t(spark, sf_dir, "documents")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail marker")).alias("text"))
    novel = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.md5(F.col("text")).alias("text"))
    return dups.unionByName(novel)


def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup check: a new batch vs the standing corpus
    WITHOUT re-pairing the corpus against itself (the continual-crawl
    shape: corpus band buckets are persistable; a day's batch is one
    hash join). Perturbed copies must match their source doc; the
    md5-garbage docs must not appear."""
    return D.incremental_near_dups(
        _incremental_batch(spark, sf_dir),
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        threshold=0.5,
        n_hashes=MINHASH_N, bands=MINHASH_BANDS, k=SHINGLE_K,
    )


def q_dedup_simhash(spark, sf_dir):
    from linkinator_spark.functions.partitioning import spread_small_scan

    # the 32-bit-majority simhash is a deep interpreted expression; spread
    # the narrow scan across the cores first (no-op on wide inputs)
    docs = spread_small_scan(_docs_with_dups(spark, sf_dir))
    return docs.select(
        "doc_id", D.simhash(F.col("text"), bits=SIMHASH_BITS).alias("simhash")
    )


def q_dedup_embedding(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding",
        F.col("label"),
    )
    corpus = emb.unionByName(dup)
    # Banded hyperplane LSH candidates + exact cosine verify. The oracle is
    # ground truth (exact all-pairs): at threshold 0.999 the only qualifying
    # pairs are the planted exact copies, whose sign signatures are
    # identical, so every band matches and LSH recall is exactly 1 — the
    # hash compare against the exact oracle verifies that.
    # round to 4dp: Spark sums float32 casts in array order, DuckDB's
    # list_cosine_similarity may accumulate differently
    return D.embedding_near_dup_pairs(
        corpus, threshold=0.999, dim=64, bands=8, rows_per_band=8
    ).select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


# 26 lowercase words so normalize_text is a no-op on it; planted into
# doc_id % 9 == 0 docs (identically in the SQL twin) so the corpus has
# cross-doc verbatim PASSAGES inside otherwise-distinct documents — the
# case doc-level dedup misses and substring dedup must catch.
_SUBSTR_PASSAGE = (
    "shared canonical passage the training corpus repeats verbatim across "
    "documents so substring level deduplication must flag it even when "
    "every other word differs between containing docs")


def q_dedup_substring(spark, sf_dir):
    """Substring-level exact dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): flag 20-token windows
    shared verbatim across distinct docs. The corpus is documents ∪ exact
    copies (full-doc spans) ∪ a 26-word passage planted into doc_id%9==0
    rows (partial spans inside otherwise-distinct docs — the case
    doc-level exact/minhash dedup keeps). k=20 here because the synthetic
    docs run 10-99 words; the operator default is Lee et al.'s k=50."""
    docs = _docs_with_dups(spark, sf_dir)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 9 == 0,
                   F.lit(" " + _SUBSTR_PASSAGE)).otherwise(F.lit("")),
        ).alias("text"))
    return D.duplicate_spans(corpus, k=20)


def q_dedup_substring_clean(spark, sf_dir):
    """The removal half of Lee et al. substring dedup: the same planted
    corpus as dedup_substring, but duplicated 20-token windows are CUT
    from the text (overlaps merge; full-duplicate docs collapse to "").
    Oracle replays the cut with positional string grams + list_where."""
    docs = _docs_with_dups(spark, sf_dir)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 9 == 0,
                   F.lit(" " + _SUBSTR_PASSAGE)).otherwise(F.lit("")),
        ).alias("text"))
    return D.remove_duplicate_spans(corpus, k=20).select(
        F.col("id").alias("doc_id"), "clean_text", "n_tokens", "n_removed")


# ---------------------------------------------------------------------------
# text analysis queries
# ---------------------------------------------------------------------------

def q_text_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
    )


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    f = T.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(f["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


def q_text_langid(spark, sf_dir):
    from linkinator_spark.functions.partitioning import spread_small_scan

    # 4 full-text regex passes per row, interpreted — spread the scan
    docs = spread_small_scan(
        _t(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


def q_text_fingerprint(spark, sf_dir):
    """Same values as content_fingerprint + kgram_min_fingerprint, but
    the k-gram min runs as a codegen position-explode + min aggregate
    (the minhash_signature_table shape): the column form's interpreted
    transform re-evaluates normalize_text per element AND pays an
    interpreted md5 per gram — the 151s sf1.0 leg. min over the exploded
    (possibly duplicated) gram stream equals array_min over the gram
    array, and the normalized text is bound to a real column once."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    docs = _t(spark, sf_dir, "documents")
    base = spread_small_scan(docs.select("doc_id", "text")).select(
        "doc_id", T.normalize_text(F.col("text")).alias("_t"))
    ex = base.select(
        "doc_id", "_t",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.length("_t") - 7, F.lit(1)))).alias("_i"))
    kmin = ex.groupBy("doc_id").agg(
        F.min(T.portable_hash64(F.expr("substring(_t, _i, 8)")))
        .alias("kgram_fp"))
    return (
        base.select("doc_id",
                    T.portable_hash64(F.col("_t")).alias("fingerprint"))
        .join(kmin, "doc_id")
        .select("doc_id", "fingerprint", "kgram_fp")
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing word 8-grams
    with the eval split (doc_id % 50 == 0 stands in for the benchmark
    suite). The benchmark n-gram set is distinct-collapsed and BROADCAST —
    real eval suites are 10^6-10^7 grams, far under the broadcast
    threshold even at a 100-TB corpus (if a suite ever outgrew it, the
    same plan degrades to a shuffle hash join on gram). Training grams are
    exploded and probed against the broadcast set map-side: no shuffle of
    corpus-sized data; the only exchange is the per-doc count aggregate,
    which partial-aggregates map-side first. Catches the corpus's planted
    near-duplicate that crosses the train/eval split."""
    docs = _t(spark, sf_dir, "documents")
    return _decontaminate_over(docs.filter(F.col("doc_id") % 50 != 0), docs)


def _decontaminate_over(train_docs, all_docs):
    """Shared decontamination core: score `train_docs` against the eval
    split of `all_docs`. Docs too short to produce any 8-gram cannot be
    contaminated and are reported with n_shared = 0 (the gram explode
    drops them, so the count re-attaches by a left join from the doc
    base — an inner join here would silently drop every short doc).

    The probe compares xxhash64 gram hashes, not gram strings
    (T.word_ngram_hashes): the broadcast eval set shrinks ~8x (8
    bytes/gram vs ~50-byte strings), the join compare is a long equality
    instead of a string compare, and the word array is bound to a real
    column once per doc — Catalyst does no CSE inside transform()
    lambdas, so the string-gram path re-ran split(normalize(text)) per
    element_at, O(grams * n * doclen). Measured 26.5s -> 2.9s on the
    sf0.1 gram explode. A 64-bit collision (≈ g_eval * g_doc / 2^64 per
    doc — vanishing at real gram counts) could only nudge n_shared by 1;
    the contamination verdict is an overlap threshold, not an exact-set
    identity, so the trade is sound at 100-TB scale."""
    def grams_of(df):
        return T.word_ngram_hashes(df, "text", 8)

    bench = (grams_of(all_docs.filter(F.col("doc_id") % 50 == 0))
             .select(F.col("gram").alias("bgram")).distinct())
    hits = (
        grams_of(train_docs)
        .join(F.broadcast(bench), F.col("gram") == F.col("bgram"), "inner")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("_hits"))
    )
    return (
        train_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("_hits"), F.lit(0)).alias("n_shared"),
                (F.coalesce(F.col("_hits"), F.lit(0)) >= 2)
                .alias("contaminated"))
    )


def q_doc_pack(spark, sf_dir):
    """Deterministic token-budget sharding (sequence-packing layout):
    hash-deal documents into independent bucket streams, one window
    cumsum per bucket, greedy cut every 512 tokens. One shuffle keyed by
    the uniform hash bucket; no global sort, no driver state
    (functions/sampling.pack_shards)."""
    from linkinator_spark.functions import sampling as SMP

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens"))
    return SMP.pack_shards(docs, max_tokens=512, n_buckets=8)


# fixed per-image token budget in the packed sequence — the
# Flamingo/LLaVA-style convention where every media element consumes a
# constant number of positions regardless of content
_MEDIA_SPAN_TOKENS = 64


def q_doc_pack_multimodal(spark, sf_dir):
    """Token-budget sharding of INTERLEAVED documents: a document's cost
    is its text spans' token count plus a fixed 64-token charge per
    media span (the constant-positions-per-image convention of
    interleaved multimodal training). The cost rollup is one uniform
    doc-keyed aggregate over the span table; the layout itself is the
    same hash-deal + bucket-cumsum pack_shards shape as doc_pack — no
    global sort, reshuffle-stable, media-heavy docs just weigh more."""
    from linkinator_spark.functions import sampling as SMP

    spans = q_span_flatten(spark, sf_dir)
    tok = F.when(
        F.col("kind") == "media_ref", F.lit(_MEDIA_SPAN_TOKENS)
    ).otherwise(T.token_count(F.col("text")))
    costs = spans.groupBy("doc_id").agg(
        F.sum(tok).cast("long").alias("n_tokens"))
    return SMP.pack_shards(
        costs, max_tokens=512, n_buckets=8, salt="mpack")


def q_corpus_build_mm(spark, sf_dir):
    """INTERLEAVED (multimodal) corpus assembly — the OBELICS/MMC4-shaped
    composition over the span table, end-to-end: (1) gate_interleaved
    keeps documents with a sane media/text balance (1-3 media, >=30
    tokens, >=10 tokens per media); (2) drop_dup_media removes every
    non-keeper occurrence of a media ref ACROSS the survivors (dedup is
    computed post-gate, so a ref whose other copies were gated away is
    not a duplicate); (3) survivors re-cost from their CLEANED spans
    (text tokens + 64 per kept media) and pack into 512-token shards via
    the doc_pack hash-deal layout. Scale shapes: the gate and both
    rollups are map-side-combined aggregates on the uniform doc key, the
    dedup keeper is a struct-min aggregate on the uniform ref key, the
    survivor filter is a left-semi join, and packing is the single
    uniform-hash shuffle + bucket cumsum — no global sort, no driver
    state, no skewable key anywhere."""
    from linkinator_spark.functions import media as MD
    from linkinator_spark.functions import sampling as SMP

    # one materialization of the derived span table: it feeds the gate,
    # the survivor semi-join, the dedup rollup and the original-media
    # count — without it the whole span derivation (explode over the
    # narrow documents scan) re-runs per consumer
    spans = q_span_flatten(spark, sf_dir).localCheckpoint(eager=False)
    gate = IV.gate_interleaved(
        spans, min_media=1, max_media=3, min_tokens=30,
        min_tokens_per_media=10)
    kept_docs = gate.filter(F.col("keep")).select("doc_id")
    kept_spans = spans.join(kept_docs, "doc_id", "left_semi")
    kept_spans = kept_spans.localCheckpoint(eager=False)
    cleaned = MD.drop_dup_media(kept_spans)
    tok = F.when(
        F.col("kind") == "media_ref", F.lit(_MEDIA_SPAN_TOKENS)
    ).otherwise(T.token_count(F.col("text")))
    stats = cleaned.groupBy("doc_id").agg(
        F.sum(tok).cast("long").alias("n_tokens"),
        F.sum((F.col("kind") == "media_ref").cast("long"))
        .alias("n_media_kept"),
    )
    orig = kept_spans.filter(F.col("kind") == "media_ref").groupBy(
        "doc_id").agg(F.count("*").alias("_n_orig"))
    stats = stats.join(orig, "doc_id").withColumn(
        "n_media_dropped", F.col("_n_orig") - F.col("n_media_kept")
    ).drop("_n_orig")
    pack = SMP.pack_shards(stats, max_tokens=512, n_buckets=8,
                           salt="mmpack")
    return (
        pack.join(stats.withColumnRenamed("doc_id", "id"), "id")
        .select(F.col("id").alias("doc_id"), "n_tokens", "n_media_kept",
                "n_media_dropped", "bucket", "shard_seq", "shard_id")
    )


def q_doc_pack_bpe(spark, sf_dir):
    """Token-budget sharding under the pluggable BPE tokenizer
    (functions/tokenize.py): same single uniform-hash-shuffle pack as
    doc_pack, but budgets by greedy vendored-merge BPE counts instead of
    whitespace counts — the real-pipeline configuration, where rare-word
    heavy docs consume more shard budget than their word count suggests.
    Value-checked since round 5: the greedy lowest-rank-first apply loop
    replays in pure SQL as a rank-ordered replace() chain over
    delimiter-wrapped symbols (tokenize.bpe_word_tokens_sql — valid
    because DEFAULT_MERGES' product strings are unique, so a merged pair
    never reappears after its own pass)."""
    from linkinator_spark.functions import sampling as SMP
    from linkinator_spark.functions import tokenize as TOK

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", TOK.bpe_token_count(F.col("text")).alias("n_tokens"))
    return SMP.pack_shards(docs, max_tokens=512, n_buckets=8)


_MAIN_TEXT_NAV = (
    '<nav><ul><li><a href="/">Home</a></li>'
    '<li><a href="/about">About us</a></li>'
    '<li><a href="/contact">Contact the team today</a></li></ul></nav>')
_MAIN_TEXT_TAIL = (
    '<div class="share"><a href="/s">Share this page now with friends'
    '</a></div><footer><a href="/privacy">Privacy policy</a> '
    '<a href="/terms">Terms of use</a></footer></body></html>')


def q_extract_main_text(spark, sf_dir):
    """Main-content extraction / boilerplate removal (functions/
    boilerplate.py — jusText-style block classification, the RefinedWeb
    §3.1 text-extraction stage): every document is wrapped in realistic
    page furniture (nav, share button, footer — all links) plus two
    prose paragraphs from its text; the classifier must strip the
    furniture and keep the prose, reporting per-page boilerplate mass.
    Pure codegen (regexp block split + higher-order-function features);
    oracle shares the regex/threshold constants via
    main_content_oracle_sql."""
    from linkinator_spark.functions import boilerplate as BP

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body>" + _MAIN_TEXT_NAV),
        F.lit("<p>"), F.substring("text", 1, 180), F.lit("</p>"),
        F.lit("<p>"), F.substring("text", 181, 180), F.lit("</p>"),
        F.lit(_MAIN_TEXT_TAIL),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return BP.main_content(pages)


def q_link_spam(spark, sf_dir):
    """Link-farm detection (functions/graph.link_spam_scores): the
    deterministic crawl graph (3 outlinks per page) is augmented with
    planted farms — every 37th page fans out to 30 extra cross-host
    targets — and the detector must flag exactly the farms (high
    out-degree AND many distinct hosts AND mostly-external, integer
    cross-multiplied). One src-keyed groupBy; oracle is the same
    aggregate over the same synthesized edges."""
    from linkinator_spark.functions import graph as GRF

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    src = F.col("src")
    base = docs.select(F.col("doc_id").alias("src")).select(
        "src",
        F.explode(F.array(
            *[(src * a + b) % n for a, b in G.LINK_MULTS])).alias("dst"))
    farm = (
        docs.filter(F.col("doc_id") % 37 == 0)
        .select(F.col("doc_id").alias("src"),
                F.explode(F.sequence(F.lit(0), F.lit(29))).alias("j"))
        .select("src", ((F.col("src") * 7 + F.col("j") * 13 + 1) % n)
                .alias("dst"))
    )
    edges = base.unionByName(farm).select(
        "src", "dst",
        F.concat(F.lit("site"), (F.col("src") % 20).cast("string"))
         .alias("src_host"),
        F.concat(F.lit("site"), (F.col("dst") % 20).cast("string"))
         .alias("dst_host"),
    )
    return GRF.link_spam_scores(edges)


def q_jsonl_export_packed(spark, sf_dir):
    """Packing→export composition: token-budget shard assignment
    (doc_pack's hash-deal bucket cumsum) keys the JSONL shard writer, so
    training shards leave in the exact layout the packer planned —
    deterministic .jsonl.gz per (bucket, shard_seq), read back by the
    inverse reader. Oracle chains the doc_pack SQL twin with the
    writer∘reader identity projection."""
    from linkinator_spark.functions import sampling as SMP
    from linkinator_spark.sources import jsonl as JL

    docs = _t(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", "text", T.token_count(F.col("text")).alias("n_tokens"))
    packed = SMP.pack_shards(
        counted.select("doc_id", "n_tokens"), max_tokens=512, n_buckets=8)
    with_shard = counted.join(
        packed.select(F.col("id").alias("doc_id"), "shard_id"), "doc_id")
    labeled = with_shard.select(
        "doc_id", "text",
        F.concat(F.lit("sh"), F.col("shard_id").cast("string"))
         .alias("shard"))
    files = JL.jsonl_shards(labeled)
    return JL.read_jsonl_shards(files).select(
        "shard", F.col("line_no").cast("long").alias("line_no"),
        "doc_id", "text", "meta")


def q_revalidate_plan(spark, sf_dir):
    """Conditional-request planning + 304 accounting (operators/
    revalidate.py): the revisit fetch history (3-6 captures per URL,
    validator mix by construction — ETags on 2/3 of URLs, Last-Modified
    on most of the rest, a no-validator residue) plans if-none-match /
    if-modified-since refetches from the latest non-null validators,
    then the refetch digests (half changed, half not) classify each
    exchange as the 304 it would have been and the body bytes saved.
    One uniform url-key groupBy + one equi-join; oracle via the
    arg_max plan twin + the same join CASE."""
    from linkinator_spark.operators import revalidate as RV

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = docs.select(
        d.alias("doc_id"),
        F.explode(F.sequence(F.lit(0), (d % 4 + 2).cast("int"))).alias("j"),
    )
    dd = F.col("doc_id")
    period = dd % 3 + 1
    version = F.when(dd % 5 == 0, F.lit(0)).otherwise(
        F.floor(F.col("j") / period)).cast("string")
    url = F.concat(F.lit("http://site"), (dd % 20).cast("string"),
                   F.lit(".example/d/"), dd.cast("string"))
    hist = base.select(
        url.alias("url"),
        (F.col("j").cast("long") * 100 + dd % 7).alias("fetch_ts"),
        F.when(dd % 3 != 0,
               F.concat(F.lit('W/"'), version, F.lit('"'))).alias("etag"),
        F.when((dd % 3 == 0) & (dd % 5 != 0),
               F.concat(F.lit("LM-"), version)).alias("last_modified"),
        F.concat(F.lit("dg"), version).alias("digest"),
    )
    v_last = F.when(dd % 5 == 0, F.lit(0)).otherwise(
        F.floor((dd % 4 + 2) / period)).cast("string")
    fetched = docs.select(
        F.concat(F.lit("http://site"), (dd % 20).cast("string"),
                 F.lit(".example/d/"), dd.cast("string")).alias("url"),
        F.when(dd % 2 == 0, F.lit("dgNEW")).otherwise(
            F.concat(F.lit("dg"), v_last)).alias("digest"),
        (F.lit(100) + dd % 50).cast("long").alias("length"),
    )
    plan = RV.conditional_plan(hist)
    return RV.revalidation_outcome(plan, fetched)


_V4_FIX1 = ("The same announcement is mirrored on every copy of this "
            "page and it is not short at all.")
_V4_FIX2 = ("It repeats for each mirror so the keeper logic must "
            "collapse all of the copies into one.")


def q_corpus_build_v4(spark, sf_dir):
    """The extraction-first curation chain composed from this round's
    operators: page furniture stripped (boilerplate.main_content) →
    typography normalized (normalize.clean_text) → PII gate (docs whose
    clean text still carries an email are dropped) → exact-dedup keeper
    on the CLEAN content hash (1-in-7 pages share fully templated
    bodies and must collapse to one keeper) → deterministic split
    assignment, all one declarative dataflow. Scale shape: codegen
    projections end-to-end with exactly ONE corpus-sized shuffle (the
    uniform md5 keeper groupBy); split is the composable split_expr,
    not a join. Oracle chains the four operators' SQL twins."""
    from linkinator_spark.functions import boilerplate as BP
    from linkinator_spark.functions import normalize as NM
    from linkinator_spark.functions import sampling as SMP
    from linkinator_spark.functions.text import PII_EMAIL_RE

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    para1 = F.when(d % 7 == 0, F.lit(_V4_FIX1)).otherwise(
        F.concat(F.lit("“"), F.substring("text", 1, 180),
                 F.lit("”")))
    para2 = (F.when(d % 7 == 0, F.lit(_V4_FIX2))
             .when(d % 9 == 0, F.concat(
                 F.lit("Contact the team at ops"),
                 (d % 40).cast("string"),
                 F.lit("@example.org for all support questions today.")))
             .otherwise(F.substring("text", 181, 160)))
    html = F.concat(
        F.lit("<html><body>" + _MAIN_TEXT_NAV + "<p>"), para1,
        F.lit("</p><p>"), para2, F.lit("</p>" + _MAIN_TEXT_TAIL))
    mc = BP.main_content(docs.select("doc_id", html.alias("html")))
    # materialize the cleaned text once: the PII filter + the md5 keeper
    # key would otherwise re-evaluate the whole boilerplate+normalize
    # chain per consumer (the corpus_build §4.4 duplication shape)
    cl = mc.select("doc_id",
                   NM.clean_text(F.col("main_text")).alias("clean")
                   ).localCheckpoint(eager=False)
    gated = cl.filter(
        F.size(F.regexp_extract_all("clean", F.lit(PII_EMAIL_RE),
                                    F.lit(0))) == 0)
    keep = (
        gated.groupBy(F.md5("clean").alias("content_md5"))
        .agg(F.min("doc_id").alias("doc_id"),
             F.count(F.lit(1)).cast("long").alias("n_dups"))
    )
    bucket, split = SMP.split_expr()
    return keep.select("doc_id", "content_md5", "n_dups",
                       bucket.alias("bucket"), split.alias("split"))


_V4_HTML_SQL = (
    "'<html><body>" + _MAIN_TEXT_NAV.replace("'", "''") + "<p>' || "
    "case when doc_id % 7 = 0 then '" + _V4_FIX1 + "' "
    "else chr(8220) || substr(text, 1, 180) || chr(8221) end "
    "|| '</p><p>' || "
    "case when doc_id % 7 = 0 then '" + _V4_FIX2 + "' "
    "when doc_id % 9 = 0 then 'Contact the team at ops' "
    "|| cast(doc_id % 40 as varchar) "
    "|| '@example.org for all support questions today.' "
    "else substr(text, 181, 160) end "
    "|| '</p>" + _MAIN_TEXT_TAIL.replace("'", "''") + "'")


def q_warc_cdx(spark, sf_dir):
    """Archive→index composition: the revisit-style fetch history (3-6
    captures per URL, digest rolling every ``1 + doc_id % 3`` fetches)
    is written to per-host WARC files, parsed BACK from the archive
    bytes, and CDX-indexed from the parsed records — payload digests
    recomputed from the recovered payloads, revisit classification via
    the per-URL lag window, global (surt, ts) ordinal. Proves the
    archive bytes alone reconstruct the exact capture index (what a
    web-archive replay stack does). Oracle: the same synthesis +
    surt/lag/rank twins, never touching WARC."""
    from linkinator_spark.functions import cdx as CDXF
    from linkinator_spark.sources import warc as W

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    base = docs.select(
        i.alias("doc_id"),
        F.explode(F.sequence(F.lit(0), (i % 4 + 2).cast("int"))).alias("j"),
    )
    period = F.col("doc_id") % 3 + 1
    version = F.when(F.col("doc_id") % 5 == 0, F.lit(0)).otherwise(
        F.floor(F.col("j") / period))
    captures = base.select(
        F.concat(F.lit("http://site"),
                 (F.col("doc_id") % 20).cast("string"),
                 F.lit(".example/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.lit(1700000000).cast("long") + F.col("j") * 100
         + F.col("doc_id") % 7).alias("fetch_ts"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        F.concat(F.lit("body v"), version.cast("string"), F.lit(" of "),
                 F.col("doc_id").cast("string")).alias("body"),
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
         .alias("shard"),
    )
    files = W.warc_files(W.build_warc_records(captures), gzip_records=True)
    recovered = (
        W.parse_warc_files(files)
        .filter(F.col("warc_type") == "response")
        .select(F.col("target_uri").alias("url"),
                F.col("payload").alias("body"),
                F.unix_timestamp(
                    F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("fetch_ts"),
                F.col("http_status").alias("status"),
                F.md5("payload").alias("digest"),
                F.octet_length("payload").cast("long").alias("length"))
        .drop("body")
    )
    return (
        CDXF.cdx_index(recovered)
        .withColumn("idx_rank", F.col("idx_rank").cast("long"))
        .withColumn("fetch_ts", F.col("fetch_ts").cast("long"))
        .withColumn("status", F.col("status").cast("long"))
    )


def q_jsonl_export(spark, sf_dir):
    """JSONL training-shard export roundtrip (sources/jsonl.py): the
    corpus leaves as deterministic per-shard .jsonl.gz blobs (codegen
    to_json lines, one shard shuffle, id-ordered, mtime-0 gzip) and the
    reader ingests them back. Oracle recomputes (shard, ordinal, id,
    text, sorted-key meta JSON) straight from documents — writer∘reader
    must be the identity, JSON escaping included."""
    from linkinator_spark.sources import jsonl as JL

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        F.concat(F.lit("s"), (F.col("doc_id") % 6).cast("string"))
         .alias("shard"))
    files = JL.jsonl_shards(docs, meta_cols=("lang", "source"))
    return JL.read_jsonl_shards(files).select(
        "shard", F.col("line_no").cast("long").alias("line_no"),
        "doc_id", "text", "meta")


def q_url_strip_tracking(spark, sf_dir):
    """Tracking-parameter folding (functions/urls.py
    strip_tracking_params): frontier URLs carrying utm/click-id
    analytics params collapse to their canonical resource — the
    crawl-side dedup pass that kills unbounded URL aliasing (the
    reference, a one-shot tool, has no such pass). Pure codegen
    split + higher-order filter; survivor order preserved; oracle
    shares TRACKING_PARAM_RE."""
    from linkinator_spark.functions.urls import strip_tracking_params

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("http://site"), (d % 20).cast("string"),
        F.lit(".example/p/"), d.cast("string"),
        F.when(d % 4 == 0, F.concat(
            F.lit("?utm_source=news&utm_medium=email&id="),
            d.cast("string")))
         .when(d % 4 == 1, F.concat(
             F.lit("?id="), d.cast("string"), F.lit("&fbclid=abc"),
             d.cast("string")))
         .when(d % 4 == 2, F.lit("?gclid=x&utm_campaign=c"))
         .otherwise(F.lit("")),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id", "url",
        strip_tracking_params("url").alias("folded"),
        (strip_tracking_params("url") != F.col("url")).alias("changed"))


_TN_DIRTY_SQL = (
    "(chr(8220) || substr(text, 1, 80) || chr(8221) || ' ' || chr(8212)"
    " || ' tail' || chr(8230) || chr(160) || substr(text, 81, 40)"
    " || chr(9) || chr(9) || 'end' || chr(7))")


def q_text_normalize(spark, sf_dir):
    """Unicode normalization (functions/normalize.py): every document
    is wrapped in typographic junk (curly quotes, em dash, ellipsis,
    NBSP, tabs, a BEL control char) and must come out clean — straight
    quotes, ASCII spacing, controls stripped. Zero-shuffle codegen
    regexp chain; oracle shares the x{...}-escaped class constants,
    which Java regex and RE2 parse identically."""
    from linkinator_spark.functions import normalize as NM

    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("“"), F.substring("text", 1, 80),
        F.lit("” — tail… "),
        F.substring("text", 81, 40),
        F.lit("\t\tend"),
    )
    clean = NM.clean_text(dirty)
    return docs.select(
        "doc_id", clean.alias("clean"),
        (F.length(dirty) - F.length(clean)).alias("removed"))


def q_span_attributes(spark, sf_dir):
    """Standoff paragraph-attribute tagging (functions/attributes.py —
    the Dolma attributes model): documents are recomposed into three
    paragraphs (two text slices + a deterministic PII-bearing contact
    line) and tagged per paragraph with exact-integer quality + PII
    signals and source-slicing offsets. One codegen projection + one
    explode, no shuffle; oracle shares every regex/stoplist constant."""
    from linkinator_spark.functions import attributes as AT

    docs = _t(spark, sf_dir, "documents")
    text2 = F.concat(
        F.substring("text", 1, 120), F.lit("\n\n"),
        F.substring("text", 121, 160), F.lit("\n\nReach us at ops"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("@example.org or +1 (555) 010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now."),
    )
    return AT.paragraph_attributes(
        docs.select("doc_id", text2.alias("text")))


def q_bpe_train(spark, sf_dir):
    """Distributed BPE merge-table training (Sennrich et al. 2016;
    functions/tokenize.py bpe_train): one corpus-scale word-count
    shuffle, then 12 merge rounds over the distinct-word vocabulary only
    — per round a map-side-combined pair count, a single collected
    argmax row (tie-break count desc then pair asc), and a codegen
    array-fold merge apply. Oracle: the rounds unrolled into chained
    DuckDB CTEs (the kmeans pattern) with list_reduce as the fold twin —
    the full learned merge table must hash-match, rank by rank."""
    from linkinator_spark.functions import tokenize as TOK

    docs = _t(spark, sf_dir, "documents")
    merges, _vocab = TOK.bpe_train(TOK.word_vocab(docs), n_merges=12)
    return merges


def q_corpus_build(spark, sf_dir):
    """End-to-end training-corpus assembly — the composition a real
    pipeline runs as one declarative dataflow: exact-dedup keeper ->
    benchmark decontamination -> language + quality gate ->
    deterministic split assignment.

    Scale shape: the dedup keeper is a groupBy(content_key) + key-pair
    join (two hash-partitioned shuffles on uniformly-distributed md5
    keys); decontamination reuses the broadcast 8-gram probe (no
    corpus-sized shuffle); the language/quality gates and the split label
    are pure whole-stage-codegen projections, so Catalyst pushes them
    into the surviving rows only. Nothing in the chain collects to the
    driver or keys a shuffle on a skewable column."""
    from linkinator_spark.functions import sampling as SMP
    from linkinator_spark.functions.partitioning import spread_small_scan

    docs = _t(spark, sf_dir, "documents")
    # one spread + materialization of the slim (doc_id, text, ck) base:
    # it feeds BOTH sides of the keeper join and the gate stage, and the
    # LogicalRDD boundary stops Catalyst pushing the (expensive) lang/
    # quality gate predicate below the joins onto the narrow parquet scan
    # — the pushed copy evaluated 16 full-text regexes per row over the
    # WHOLE corpus single-threaded, then the top projection evaluated
    # them again (the §4.4 filter-duplication shape, here with native
    # expressions). With the barrier both evaluations run wide and on
    # post-dedup rows only (13.1s -> ~1s of the sf1.0 leg).
    keyed = spread_small_scan(
        docs.select("doc_id", "text")
    ).select(
        "doc_id", "text",
        F.md5(T.normalize_text(F.col("text"))).alias("ck"),
    ).localCheckpoint(eager=False)
    keepers = keyed.groupBy("ck").agg(F.min("doc_id").alias("doc_id"))
    kept = keyed.join(keepers, ["ck", "doc_id"]).select("doc_id", "text")
    # decontaminate only the surviving keepers (the gram explode is the
    # heaviest map-side stage — running it over rows the dedup join is
    # about to discard would be pure waste); the eval gram set still
    # comes from the untouched documents table
    clean = (_decontaminate_over(
        kept.filter(F.col("doc_id") % 50 != 0), docs)
        .filter(~F.col("contaminated")).select("doc_id"))
    bucket, split = SMP.split_expr("doc_id")
    return (
        kept.join(clean, "doc_id")
        .withColumn("lang_pred", T.lang_id(F.col("text")))
        .withColumn("quality", T.quality_score(F.col("text")))
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.7))
        .select("doc_id", "lang_pred", "quality", split.alias("split"))
    )


def q_corpus_build_capped(spark, sf_dir):
    """corpus_build composed with the per-domain quota: after dedup,
    decontamination and the lang/quality gate, keep at most 12 docs per
    source — best by quality (micro-point rounded so the order is
    engine-exact), ties by deterministic hash. The full
    RefinedWeb-style chain as ONE declarative dataflow; the cap is the
    skew-safe two-phase top-K."""
    from linkinator_spark.functions import sampling as SMP

    built = q_corpus_build(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    joined = built.join(src, "doc_id").withColumn(
        "score", F.round(F.col("quality") * 1e6).cast("long"))
    capped = SMP.domain_cap(
        joined, cap=12, domain_col="source", score_col="score")
    return (
        joined.join(capped.select(F.col("id").alias("doc_id"), "cap_rank"),
                    "doc_id")
        .select("doc_id", "source", "split", "cap_rank")
    )


# lcm(3,4,5,6,7,11,19,20,23) — every doc_id modulus the v2 gate plantings
# key on, so a planted copy renders byte-identical gate text and co-survives
# (or co-dies with) its original; the dedup keeper then genuinely collapses
# the pair instead of the gates separating them first.
_V2_SHIFT = 2_018_940


def _docs_v2(spark, sf_dir):
    """documents (doc_id < _V2_SHIFT) ∪ copies of doc_id%10==1 rows
    shifted by _V2_SHIFT — the corpus_build_v2 input, with
    mod-class-preserving planted duplicates. Residue 1 (not 0) because
    %10==0 implies %5==0, whose planted ellipsis lines structurally fail
    Gopher's ellipsis rule — copies of those docs could never reach the
    dedup stage. The `doc_id < _V2_SHIFT` gate on BOTH legs keeps copy
    ids from aliasing genuine documents at scale factors whose id space
    grows past the shift (ids ≤ ~5k at every shipped SF, so the gate is
    a no-op here — it is the invariant, not a behavior change)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < _V2_SHIFT)
    copies = docs.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + _V2_SHIFT).alias("doc_id"), "text")
    return docs.unionByName(copies)


_DOCS_V2_SQL = (
    f"(select doc_id, text from documents where doc_id < {_V2_SHIFT}"
    " union all"
    f" select doc_id + {_V2_SHIFT} as doc_id, text from documents"
    f" where doc_id % 10 = 1 and doc_id < {_V2_SHIFT})"
)


def q_corpus_build_v2(spark, sf_dir):
    """FineWeb-style corpus assembly (Penedo et al. 2024 stage order):
    URL blocklist -> C4 line cleaning -> Gopher quality gate -> exact
    dedup keeper -> deterministic split, composed as ONE declarative
    dataflow. Complements q_corpus_build (whose gates are langid +
    quality score + decontamination) with the curation stack the round-4
    operators added.

    Scale shape (100-TB lens): both content gates (Gopher's seven rules
    and the C4 line filter) are computed in a SINGLE whole-stage-codegen
    projection — no join between gate stages, so Catalyst prunes failed
    docs before anything shuffles. The blocklist is the bounded
    suffix-explode + BROADCAST join (zero shuffle of the corpus). The
    only corpus-sized shuffles are the dedup keeper's groupBy(ck) +
    (ck, doc_id) join — uniformly-distributed md5 keys. The split label
    is a pure projection. No global sort, no driver collect, no
    skewable shuffle key anywhere."""
    from linkinator_spark.functions import blocklist as BL
    from linkinator_spark.functions import c4 as C4
    from linkinator_spark.functions import gopher as GP
    from linkinator_spark.functions import sampling as SMP

    from linkinator_spark.functions.partitioning import spread_small_scan

    # spread + materialize the input once: the Gopher/C4 gate expressions
    # (dozens of full-text regex/array passes) would otherwise be pushed
    # below the keeper join onto the narrow scan and re-evaluated per
    # consumer (the corpus_build §4.4 shape)
    dd = spread_small_scan(_docs_v2(spark, sf_dir)).localCheckpoint(
        eager=False)
    d = F.col("doc_id")
    host = F.concat(F.lit("sub"), (d % 3).cast("string"),
                    F.lit(".site"), (d % 20).cast("string"),
                    F.lit(".example"))
    gtext = _gopher_demo_text()
    ctext = _c4_demo_text()
    gated = dd.select(
        "doc_id", "text", host.alias("host"),
        GP.gopher_features(gtext)["n_words"].alias("n_words"),
        GP.gopher_pass(gtext).alias("_gok"),
        F.size(C4.kept_lines(ctext)).cast("long").alias("n_kept"),
        C4.page_kept(ctext).alias("_cok"),
    ).filter(F.col("_gok") & F.col("_cok"))
    rules = spark.createDataFrame(
        [(r,) for r in _BLOCKLIST_RULES], "domain string")
    # slim (no text) decision rows; one materialization feeds the keeper
    # groupBy AND the final join, so the gate chain runs exactly once
    surv = (
        BL.apply_blocklist(gated, rules, url_col="doc_id")
        .filter(F.col("blocked") == 0)
        .select("doc_id", "host", "n_words", "n_kept",
                F.md5(T.normalize_text(F.col("text"))).alias("ck"))
    ).localCheckpoint(eager=False)
    keepers = surv.groupBy("ck").agg(F.min("doc_id").alias("doc_id"))
    _, split = SMP.split_expr("doc_id")
    return (
        surv.join(keepers, ["ck", "doc_id"])
        .select("doc_id", "host", "n_words", "n_kept",
                split.alias("split"))
    )


def q_corpus_build_v3(spark, sf_dir):
    """corpus_build_v2 plus corpus-level boilerplate-line removal
    (functions/linededup): the CCNet/RefinedWeb line-dedup pass runs
    over the FULL v2 corpus (boilerplate statistics are corpus-wide, so
    it cannot run after the gates shrink the population), and each
    surviving doc carries its removal stats + cleaned-text fingerprint.
    min_dup_docs=3 keeps the two roles separated: the planted exact
    copies have multiplicity 2, so line dedup targets only the >=3-doc
    boilerplate (nav/footer analogs) while DOCUMENT duplication is left
    to the dedup keeper — the same division of labor as production
    pipelines (line thresholds sit above quotation multiplicity).

    Scale shape: everything in q_corpus_build_v2's audit plus
    line_dedup's three uniform exchanges (composite-key distinct,
    map-side-combined count, doc-keyed reassembly) and a broadcast
    probe; the stats join back on the uniform doc id."""
    from linkinator_spark.functions import blocklist as BL
    from linkinator_spark.functions import c4 as C4
    from linkinator_spark.functions import gopher as GP
    from linkinator_spark.functions import sampling as SMP

    from linkinator_spark.functions.partitioning import spread_small_scan

    # same spread + materialization shape as corpus_build_v2 (the gate
    # expressions must evaluate once, wide, not per consumer at the scan)
    dd = spread_small_scan(_docs_v2(spark, sf_dir)).localCheckpoint(
        eager=False)
    d = F.col("doc_id")
    host = F.concat(F.lit("sub"), (d % 3).cast("string"),
                    F.lit(".site"), (d % 20).cast("string"),
                    F.lit(".example"))
    gtext = _gopher_demo_text()
    ctext = _c4_demo_text()
    ld = LD.line_dedup(
        dd.select("doc_id", ctext.alias("text")), min_dup_docs=3,
    ).select("doc_id",
             F.col("n_removed").alias("n_line_removed"),
             F.col("cleaned_md5").alias("line_md5"))
    gated = dd.select(
        "doc_id", "text", host.alias("host"),
        GP.gopher_features(gtext)["n_words"].alias("n_words"),
        GP.gopher_pass(gtext).alias("_gok"),
        F.size(C4.kept_lines(ctext)).cast("long").alias("n_kept"),
        C4.page_kept(ctext).alias("_cok"),
    ).filter(F.col("_gok") & F.col("_cok"))
    rules = spark.createDataFrame(
        [(r,) for r in _BLOCKLIST_RULES], "domain string")
    surv = (
        BL.apply_blocklist(gated, rules, url_col="doc_id")
        .filter(F.col("blocked") == 0)
        .join(ld, "doc_id")
        .select("doc_id", "host", "n_words", "n_kept",
                "n_line_removed", "line_md5",
                F.md5(T.normalize_text(F.col("text"))).alias("ck"))
    ).localCheckpoint(eager=False)
    keepers = surv.groupBy("ck").agg(F.min("doc_id").alias("doc_id"))
    _, split = SMP.split_expr("doc_id")
    return (
        surv.join(keepers, ["ck", "doc_id"])
        .select("doc_id", "host", "n_words", "n_kept",
                "n_line_removed", "line_md5", split.alias("split"))
    )


def _lined_text() -> "F.Column":
    """The corpus is single-line, so plant a deterministic multi-line shape:
    every doc gains one 40-char echo line; doc_id % 4 == 0 docs gain it
    twice (a true duplicate line). Identical construction in the SQL twin,
    so the repetition signals are value-checked, not vacuously zero."""
    echo = F.substring(F.col("text"), 1, 40)
    return F.concat(
        F.col("text"), F.lit("\n"), echo,
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("\n"), echo)).otherwise(F.lit("")),
    )


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    duplicate-line fraction (pure codegen array ops) and top-bigram count
    fraction. The bigram mode is explode -> two-level hash agg keyed by
    (doc_id, gram): partial map-side combine collapses within-doc repeats
    before the shuffle, so shuffle volume is O(distinct grams per doc) and
    the keys are doc-scoped — no global hot key at any corpus size."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    docs = spread_small_scan(
        _t(spark, sf_dir, "documents").select("doc_id", "text"))
    lined = _lined_text()
    rep = T.repetition_line_features(lined)
    # bind the word array to a real column before the bigram transform
    # (no CSE inside transform lambdas — see text.word_ngrams_of)
    base = docs.select(
        "doc_id",
        rep["n_lines"].alias("n_lines"),
        rep["dup_line_frac"].alias("dup_line_frac"),
        F.split(T.normalize_text(F.col("text")), " ").alias("_w"),
    ).select(
        "doc_id", "n_lines", "dup_line_frac",
        T.word_ngrams_of(F.col("_w"), 2).alias("bigrams"),
    )
    ex = base.select(
        "doc_id", "n_lines", "dup_line_frac",
        F.size("bigrams").alias("n_bigrams"),
        F.explode_outer("bigrams").alias("gram"),
    )
    counts = ex.groupBy(
        "doc_id", "n_lines", "dup_line_frac", "n_bigrams", "gram"
    ).agg(F.count("*").alias("c"))
    return (
        counts.groupBy("doc_id", "n_lines", "dup_line_frac", "n_bigrams")
        .agg(F.max(F.when(F.col("gram").isNotNull(), F.col("c"))
                   .otherwise(F.lit(0))).alias("top_cnt"))
        .select(
            "doc_id", "n_lines", "dup_line_frac",
            F.round(F.col("top_cnt").cast("double")
                    / F.greatest(F.col("n_bigrams"), F.lit(1)), 6)
            .alias("top_bigram_frac"),
        )
    )


def q_text_pii(spark, sf_dir):
    """PII detection + redaction over the documents table. The corpus holds
    no PII, so deterministic synthetic PII is planted from doc_id (email on
    %3, IPv4 on %5, phone on %7, SSN on %11, card on %13) with the identical
    construction in the SQL twin — counts AND the redacted text (by md5) are
    value-checked. All
    regex work is single-pass codegen; regexes are written to parse the
    same under Java regex and RE2 (classes + bounded repeats only)."""
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(d % 3 == 0,
               F.concat(F.lit(" contact user"), d.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(d % 5 == 0,
               F.concat(F.lit(" from 10."), (d % 256).cast("string"),
                        F.lit(".0."), ((d * 7) % 256).cast("string")))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0,
               F.concat(F.lit(" call +1 555 0"),
                        (d % 100 + 100).cast("string"),
                        F.lit(" 23 45"))).otherwise(F.lit("")),
        F.when(d % 11 == 0,
               F.concat(F.lit(" ssn "),
                        F.lpad((d % 900 + 100).cast("string"), 3, "0"),
                        F.lit("-"),
                        F.lpad((d % 89 + 10).cast("string"), 2, "0"),
                        F.lit("-"),
                        F.lpad((d % 9000 + 1000).cast("string"), 4, "0")))
        .otherwise(F.lit("")),
        F.when(d % 13 == 0,
               F.concat(F.lit(" card 4111 1111 1111 "),
                        F.lpad((d % 10000).cast("string"), 4, "0")))
        .otherwise(F.lit("")),
    )
    c = T.pii_counts(aug)
    return docs.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        c["n_phones"].alias("n_phones"),
        c["n_ssns"].alias("n_ssns"),
        c["n_cards"].alias("n_cards"),
        F.md5(T.redact_pii(aug)).alias("redacted_md5"),
    )


# Deterministic gopher_gate plantings, shared verbatim with the SQL twin:
# a stopword-rich sentence (lets longer docs clear the stopword floor), an
# all-bullet 50-line doc (trips ONLY the bullet rule), and a 60-long-word
# doc (trips ONLY the mean-word-length rule).
_GOPHER_STOP_SENTENCE = (
    " and that is to be one of the things we have to live with today")
_GOPHER_BULLET_DOC = "\n".join(
    f"- bullet item number {i} from the official listing"
    for i in range(50))
_GOPHER_LONGWORD_DOC = " ".join(
    ["honorificabilitudinitatibus the of"] * 20)


def q_gopher_gate(spark, sf_dir):
    """Gopher-rule quality gate (functions/gopher.gopher_gate, Rae et al.
    2021 table A1): seven per-document filters — word count, mean word
    length, symbol ratio, bullet/ellipsis line fractions, alpha-word
    fraction, required-stopword floor — all as integer cross-multiplied
    comparisons in one codegen projection (no float division anywhere, so
    the pass bits are engine-exact). The corpus's synthetic prose rarely
    trips the line rules, so deterministic bullet/ellipsis/symbol/numeric
    noise is planted from doc_id (%4/%5/%6/%7) with the identical
    construction in the SQL twin; word-count and stopword failures occur
    naturally. Scale: pure projection — gates at parquet scan speed."""
    from linkinator_spark.functions import gopher as GP

    from linkinator_spark.functions.partitioning import spread_small_scan

    docs = spread_small_scan(
        _t(spark, sf_dir, "documents").select("doc_id", "text"))
    return GP.gopher_gate(
        docs.select("doc_id", _gopher_demo_text().alias("text")))


def _gopher_demo_text():
    """doc_id-keyed noise planting around the corpus prose used by
    q_gopher_gate and corpus_build_v2 (Spark side of
    _gopher_demo_text_sql)."""
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.lit(_GOPHER_STOP_SENTENCE))
        .otherwise(F.lit("")),
        F.when(d % 4 == 0,
               F.lit("\n- first point\n- second point\n* third point"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0,
               F.lit("\nread more...\nclick here...\nto be continued…"))
        .otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit(" # ## ### #### #####"))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0,
               F.lit(" 000 111 222 333 444 555 666 777 888 999"))
        .otherwise(F.lit("")),
    )
    return (
        F.when(d % 19 == 0, F.lit(_GOPHER_BULLET_DOC))
        .when(d % 23 == 0, F.lit(_GOPHER_LONGWORD_DOC))
        .otherwise(aug)
    )


_BLOCKLIST_RULES = [
    "site3.example", "site7.example", "site5.example",
    "sub1.site5.example", "nomatch.example",
]


def q_url_blocklist(spark, sf_dir):
    """UT1-style domain-blocklist gate (functions/blocklist): a host is
    blocked iff it equals or is a subdomain of a listed domain —
    suffix-set membership as a bounded explode + BROADCAST join (≤ label
    count probe rows per URL, zero shuffle of the URL table), never a
    per-rule regex scan. site5 + sub1.site5 are both listed so the
    longest-match attribution is exercised."""
    from linkinator_spark.functions import blocklist as BL

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("sub"), (d % 3).cast("string"),
                    F.lit(".site"), (d % 20).cast("string"),
                    F.lit(".example"))
    urls = docs.select(
        F.concat(F.lit("http://"), host, F.lit("/page/"),
                 d.cast("string")).alias("url"),
        host.alias("host"),
    )
    rules = spark.createDataFrame(
        [(r,) for r in _BLOCKLIST_RULES], "domain string")
    return BL.apply_blocklist(urls, rules)


def q_url_traps(spark, sf_dir):
    """Crawl-trap detection (functions/traps.detect_traps): URLs collapse
    to templates (path digit runs → N, query values → *, keys sorted) and
    families with an exploding distinct-URL count are flagged — the
    frontier-hygiene stage that keeps a calendar/session-id host from
    filling a 10^10-URL queue. Planted: every doc links a sectioned
    article page (families of ~14 per host — below threshold) and even
    docs link a calendar URL with a unique session id (50 per host —
    a trap). One projection + one map-side-combined groupBy; the hot
    template key never materializes as shuffled rows."""
    from linkinator_spark.functions import traps as TR

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(F.lit("site"), (d % 5).cast("string"),
                    F.lit(".example"))
    sec = F.substring(F.lit("abcdefg"), (d % 7) + 1, 1)
    normal = F.concat(F.lit("http://"), host, F.lit("/sec-"), sec,
                      F.lit("/item/"), d.cast("string"))
    trap = F.concat(F.lit("http://"), host,
                    F.lit("/cal/20"), (d % 24).cast("string"),
                    F.lit("/"), (d % 12 + 1).cast("string"),
                    F.lit("/"), (d % 28 + 1).cast("string"),
                    F.lit("?sess="), d.cast("string"),
                    F.lit("&page="), (d % 17).cast("string"))
    urls = docs.select(host.alias("host"), normal.alias("url")).unionByName(
        docs.filter(d % 2 == 0).select(host.alias("host"),
                                       trap.alias("url")))
    return TR.detect_traps(urls, threshold=40)


def q_c4_clean(spark, sf_dir):
    """C4 line-level cleaning (functions/c4.c4_clean, Raffel et al. 2020
    §2.2): keep only terminal-punctuated >=3-word non-javascript lines,
    drop pages with '{', 'lorem ipsum', or too few survivors. The corpus
    is single-line prose, so each doc is recast as six deterministic
    lines (prose slices + doc_id-keyed boilerplate on %5/%7/%11) with the
    identical construction in the SQL twin. Pure codegen projection —
    cleans at parquet scan speed at any corpus size."""
    from linkinator_spark.functions import c4 as C4

    docs = _t(spark, sf_dir, "documents")
    return C4.c4_clean(docs.select("doc_id", _c4_demo_text().alias("text")))


def _c4_demo_text():
    """The six-line recast of a single-line corpus doc used by q_c4_clean
    and corpus_build_v2 (Spark side of _C4_DEMO_TEXT_SQL)."""
    d = F.col("doc_id")
    return F.concat_ws(
        "\n",
        F.concat(F.substring("text", 1, 60), F.lit(" so it ends.")),
        F.concat(F.substring("text", 61, 60), F.lit(" no punct")),
        F.lit("click here."),
        F.when(d % 5 == 0, F.lit("please enable javascript to continue."))
        .otherwise(F.lit("another proper sentence appears right here.")),
        F.when(d % 7 == 0, F.lit("lorem ipsum dolor sit amet consectetur."))
        .otherwise(F.lit("the final line closes the page properly!")),
        F.when(d % 11 == 0, F.lit("object { braces }"))
        .otherwise(F.lit("is this the end of the document?")),
    )


_C4_DEMO_TEXT_SQL = (
    "concat_ws(chr(10), "
    "substring(text, 1, 60) || ' so it ends.', "
    "substring(text, 61, 60) || ' no punct', "
    "'click here.', "
    "case when doc_id % 5 = 0 "
    "then 'please enable javascript to continue.' "
    "else 'another proper sentence appears right here.' end, "
    "case when doc_id % 7 = 0 "
    "then 'lorem ipsum dolor sit amet consectetur.' "
    "else 'the final line closes the page properly!' end, "
    "case when doc_id % 11 = 0 then 'object { braces }' "
    "else 'is this the end of the document?' end)"
)


def q_anchor_agg(spark, sf_dir):
    """Incoming anchor-text profile per target URL
    (graph.anchor_text_agg over extract.make_anchor_edges_udf): the SAX
    walker captures the visible text of every <a href> (markdown links
    compile to <a> first) in one Arrow batch pass; the aggregation is
    two map-side-combined groupBys with a deterministic struct-max
    argmax. Plantings: two html anchors per doc (shared 'read more' +
    a doc_id%3-varying label, both to target page doc_id%10), one
    markdown link to guide doc_id%4, and an <img> that must NOT appear.
    The oracle rebuilds the same edges from the doc_id arithmetic, so a
    parsing slip (img leaking in, anchor text mis-captured, markdown
    not compiled) breaks the hash."""
    from linkinator_spark.functions import extract as EX
    from linkinator_spark.functions import graph as GRF

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html_span = F.concat(
        F.lit('<p><a href="http://t.example/page/'), (d % 10).cast("string"),
        F.lit('">read  more</a> and <a href="http://t.example/page/'),
        (d % 10).cast("string"),
        F.lit('">article '), (d % 3).cast("string"),
        F.lit('</a> <img src="http://t.example/img/'), d.cast("string"),
        F.lit('.png"></p>'))
    md_span = F.concat(
        F.lit("see [guide "), (d % 4).cast("string"),
        F.lit("](http://t.example/guide/"), (d % 4).cast("string"),
        F.lit(")"))
    spans = F.array(
        F.struct(F.lit("html").alias("kind"), html_span.alias("text"),
                 F.lit("").alias("media_ref"), F.lit(0).alias("offset")),
        F.struct(F.lit("markdown").alias("kind"), md_span.alias("text"),
                 F.lit("").alias("media_ref"), F.lit(1).alias("offset")),
    )
    pages = docs.select(
        F.concat(F.lit("http://host.example/p/"),
                 d.cast("string")).alias("page_url"),
        F.lit(None).cast("string").alias("base_url"),
        spans.alias("spans"),
    )
    from linkinator_spark.functions.partitioning import spread_small_scan

    edges = spread_small_scan(pages).mapInPandas(
        EX.make_anchor_edges_udf(markdown=True), EX.ANCHOR_EDGES_SCHEMA)
    return GRF.anchor_text_agg(edges)


def q_line_dedup(spark, sf_dir):
    """Corpus-level exact line dedup (functions/linededup.line_dedup,
    CCNet §3.1 / RefinedWeb §3.2): CCNet-normalized lines (lowercase,
    trim, digits->0) that appear in >=2 distinct documents are removed
    from every document. Input is the same six-line recast as c4_clean
    (_c4_demo_text), whose %5/%7/%11-keyed boilerplate lines repeat
    across docs while the prose slices stay unique. Scale shape:
    composite-key distinct (hot banner lines stay uniform), map-side
    combined count, broadcast 8-byte hash probe, one doc-keyed
    reassembly shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return LD.line_dedup(
        docs.select("doc_id", _c4_demo_text().alias("text")))


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (functions/dsir.dsir_select, Xie et al.
    2023): fit hashed-bigram multinomials over the English docs (target)
    vs the whole corpus (raw), score every doc's importance log-weight in
    exact integer micro-nats, and Gumbel-top-k resample 100 docs without
    replacement ∝ w(x) — noise derived from the portable hash, so the
    draw is bit-reproducible. Scale: bucket tables are ≤512 rows
    (broadcast joins; the corpus never shuffles on a skewable key) and
    the top-k plans as TakeOrderedAndProject, never a global sort."""
    from linkinator_spark.functions import dsir as DS

    docs = _t(spark, sf_dir, "documents")
    return DS.dsir_select(
        target=docs.filter(F.col("lang") == "en"),
        raw=docs, k=100, n_buckets=512, alpha=0.5)


# ---------------------------------------------------------------------------
# similarity / media
# ---------------------------------------------------------------------------

def q_doc_split(spark, sf_dir):
    """Deterministic hash-bucket train/val/test split (98/1/1) — the
    reproducible corpus-split step: reshuffles/re-ingest select exactly
    the same documents (functions/sampling.hash_split)."""
    from linkinator_spark.functions import sampling as SMP

    return SMP.hash_split(_t(spark, sf_dir, "documents"))


def q_doc_sample_stratified(spark, sf_dir):
    """Exact-count stratified sampling: exactly ceil(0.2 * n) docs per
    stratum, chosen by deterministic hash order; the per-stratum rank is
    hierarchical (hash-bucket stripes + offsets) so a hot stratum never
    serializes into one window task."""
    from linkinator_spark.functions import sampling as SMP

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 7).alias("shard"))
    return SMP.stratified_sample_exact(docs, "shard", 0.2).select(
        F.col("id").alias("doc_id"), F.col("stratum").alias("shard"),
        "sample_rank")


def q_doc_mixture(spark, sf_dir):
    """Temperature-based domain mixture sampling (sampling.mixture_sample,
    after Conneau & Lample 2019 / mC4): resample to a 300-doc corpus where
    language d contributes ~ count_d^0.5 of the mix — rare languages
    up-weighted, the head language capped. Quotas are exact integer
    arithmetic (per-domain micro-weights, decimal div), so the DuckDB twin
    reproduces them bit-for-bit; in-domain selection is the deterministic
    portable-hash order through the hierarchical (striped) rank."""
    from linkinator_spark.functions import sampling as SMP

    docs = _t(spark, sf_dir, "documents")
    return SMP.mixture_sample(
        docs, target_rows=300, alpha=0.5, domain_col="lang",
    ).select(F.col("id").alias("doc_id"), F.col("domain").alias("lang"),
             "mix_rank", "quota")


def q_doc_mixture_epochs(spark, sf_dir):
    """mixture_sample with replacement: alpha=0 wants a UNIFORM language
    mix of 1000 docs (200/language against languages holding 60-220
    docs), so every language upsamples — full epochs via copy_idx plus a
    remainder epoch for the first rows in hash order; each language
    emits exactly 200 rows. The DuckDB twin replays quota arithmetic and
    the generate_series copy expansion."""
    from linkinator_spark.functions import sampling as SMP

    docs = _t(spark, sf_dir, "documents")
    return SMP.mixture_sample(
        docs, target_rows=1000, alpha=0.0, domain_col="lang",
        with_replacement=True,
    ).select(F.col("id").alias("doc_id"), F.col("domain").alias("lang"),
             "mix_rank", "copy_idx")


def q_domain_cap(spark, sf_dir):
    """Per-domain quota (C4/RefinedWeb rule): keep the 40 longest docs per
    source, ties broken by deterministic hash. Two-phase exact top-K —
    stripe-local rank then rank-of-survivors — so a hot domain never
    serializes into one window task; output identical to the naive
    single-window form (the oracle computes exactly that)."""
    from linkinator_spark.functions import sampling as SMP

    # plant a hot domain holding half the corpus (the skew case the
    # two-phase rank exists for) so the cap actually evicts rows
    docs = _t(spark, sf_dir, "documents").withColumn(
        "domain",
        F.when(F.col("doc_id") % 2 == 0, F.lit("hot.example"))
        .otherwise(F.col("source")))
    return SMP.domain_cap(
        docs, cap=15, domain_col="domain", score_col="n_chars"
    ).select(F.col("id").alias("doc_id"), "domain", "cap_rank")


BM25_QUERIES = [
    ("q1", "spark"), ("q1", "window"),
    ("q2", "hash"), ("q2", "merge"), ("q2", "sort"),
    ("q3", "zzzunseen"),
]


def q_bm25_topk(spark, sf_dir):
    """Lexical retrieval: BM25 top-10 docs per keyword query. Query terms
    broadcast and prune the exploded corpus before any shuffle; scores
    are integer micro-points (per-term contributions rounded at 1e-6
    then summed) so ranking is exact and engine-independent; per-query
    top-k is the two-phase stripe rank. Queries include an
    out-of-vocabulary term (q3) that must return nothing."""
    from linkinator_spark.functions import search as SRCH

    docs = _t(spark, sf_dir, "documents")
    q = spark.createDataFrame(BM25_QUERIES, "query_id string, term string")
    return SRCH.bm25_topk(docs, q, k=10)


def q_length_quantiles(spark, sf_dir):
    """Exact discrete quantiles of doc length — curation thresholds
    without a global sort or an approximate sketch: value-histogram
    cumsum over the bounded distinct-value table."""
    from linkinator_spark.functions import sampling as SMP

    return SMP.exact_int_quantiles(
        _t(spark, sf_dir, "documents"), "n_chars",
        qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-25 by term frequency (with doc frequency) —
    the tokenizer-training primitive. Hot terms partial-aggregate
    map-side; the top-v cut is TakeOrdered bounded by v, never a global
    sort."""
    from linkinator_spark.functions import search as SRCH

    return SRCH.vocab_topk(_t(spark, sf_dir, "documents"), v=25)


def _ann_corpus(spark, sf_dir):
    """embeddings ∪ 4 deterministic near-dup perturbations of each query
    vector (vec_id%100==0): copy j shifts each coordinate by
    eps_j * v[(i+j) % 64] with eps_j = 0.05*j, giving planted neighbors at
    cosine ≈ 0.999…0.98. The exact top-5 of every query is then provably
    {self, 4 planted copies} — the near-duplicate-retrieval task ANN is for
    — and the derivation is pure arithmetic, so DuckDB replicates it
    bit-exactly (float32 → double casts on both sides)."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    parts = [base]
    v = F.col("embedding")

    def _shift(j, eps):
        # factory: F.transform counts lambda params, so no default-arg capture
        def fn(i):
            return (
                F.element_at(v, i + 1).cast("double")
                + F.lit(eps)
                * F.element_at(v, F.pmod(i + F.lit(j), F.lit(64)) + 1)
                .cast("double")
            )
        return fn

    for j in range(1, 5):
        pert = F.transform(F.sequence(F.lit(0), F.lit(63)), _shift(j, 0.05 * j))
        parts.append(
            emb.filter(F.col("vec_id") % 100 == 0).select(
                (F.lit(2_000_000) + F.col("vec_id") * 10 + F.lit(j))
                .alias("vec_id"),
                pert.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # one lazy materialization: the ANN queries read the corpus for
    # bucketing/assignment AND for the exact re-rank side, and the bench
    # recall harness adds a third read — without this the union + the
    # interpreted perturbation transform re-run per consumer
    return out.localCheckpoint(eager=False)


_ANN_CORPUS_SQL = """
    select vec_id, embedding::DOUBLE[] as v from embeddings
    union all
    select 2000000 + vec_id * 10 + j as vec_id,
           list_transform(range(0, 64), i ->
             embedding[i + 1]::DOUBLE
             + 0.05 * j * embedding[((i + j) % 64) + 1]::DOUBLE) as v
    from embeddings, (select unnest(range(1, 5)) as j) _j
    where vec_id % 100 = 0
"""


def q_ann_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = S.cosine_topk(emb, queries, k=TOPK)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 4).alias("cosine"))


def q_ann_lsh_topk(spark, sf_dir):
    """ANN near-duplicate retrieval over the planted corpus (_ann_corpus):
    each query's exact top-5 is itself + its 4 planted near-copies (cosine
    0.98+). With 8 tables × 8 planes the per-neighbor miss probability is
    < 1e-3 and, with the fixed seed, the realized recall on this data is
    exactly 1 at every test scale — so the exact-SQL top-k is a valid
    value-checked oracle for the LSH output (verified sf0.001/0.01/0.1)."""
    corpus = _ann_corpus(spark, sf_dir)
    queries = corpus.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2_000_000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.lsh_topk(corpus, queries, dim=64, k=TOPK, n_planes=8, n_tables=8)
    # compare surface is (query, neighbor, rank): the retrieved set and its
    # ranking. The raw cosine is value-checked by ann_cosine_topk; here a
    # planted copy's cosine lands exactly on a 4dp rounding boundary
    # (x.99875) where Spark HALF_UP vs DuckDB accumulation order disagree.
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN over the planted corpus, oracle-checked MECHANICALLY: the
    DuckDB oracle re-runs the whole IVF pipeline in SQL (deterministic
    seed codebook = 16 smallest vec_ids, nearest-cell assignment, 2-probe
    candidate generation, exact re-rank) rather than falling back to
    exact top-k — so cell assignment, probe selection, and candidate-set
    parity are all value-checked, not just the final ranking. iters=0
    pins the codebook to the raw seeds (Lloyd refinement is engine-
    specific in the last ulp; it is pytest-covered instead). Cosine is
    dropped from the compare surface for the same 4dp-boundary reason as
    ann_lsh_topk."""
    corpus = _ann_corpus(spark, sf_dir)
    queries = corpus.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2_000_000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.ivf_topk(corpus, queries, k=TOPK, n_lists=16, nprobe=2,
                     assign_gear="sql")
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_ivf_topk_arrow(spark, sf_dir):
    """The Arrow-matmul assignment gear of the same IVF pipeline (the
    10^10-vector path, ivf_topk's default) against the SAME unrolled-SQL
    oracle as the SQL gear — so the at-scale gear is value-checked
    directly, not by gear-equality transitivity (the round-3 lesson:
    oracles must touch the plan that actually runs at 100x)."""
    corpus = _ann_corpus(spark, sf_dir)
    queries = corpus.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2_000_000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.ivf_topk(corpus, queries, k=TOPK, n_lists=16, nprobe=2,
                     assign_gear="arrow")
    return out.select("query_id", "neighbor_id", "rank")


def q_kmeans_train(spark, sf_dir):
    """Engine-exact k-means codebook training (similarity.kmeans_train):
    two full Lloyd rounds over the embeddings table, oracle-checked —
    the refinement path ivf_centroids leaves unchecked (float means) is
    here replayed bit-for-bit by DuckDB because vectors are quantized to
    integer micro-units once and every centroid update is an exact
    integer sum + one rounded division. Per round: one broadcast
    codebook join with a map-side-combined argmax (the groupBy(vid)
    still exchanges one row per corpus vector — the shuffle KEY is the
    uniform vid, but the volume is corpus-sized), then a k*dim-row
    partial-combined aggregate; driver traffic is the k*dim-long
    codebook only."""
    emb = _t(spark, sf_dir, "embeddings")
    out = S.kmeans_train(emb, n_lists=8, iters=2)
    # atomic projection of the codebook for the driver's hash harness
    return out.select(
        "list_id",
        F.array_join(
            F.transform("centroid_micro", lambda x: x.cast("string")), ","
        ).alias("centroid_micro"))


def q_lm_score(spark, sf_dir):
    """CCNet-style LM perplexity filter (functions/lm.lm_nll, after
    Wenzek et al. 2020): bigram add-alpha model trained on the even
    doc_ids (the 'reference corpus'), scoring EVERY document — the
    transfer-scoring path a real pipeline runs (model trained on clean
    text, applied to crawl text). Scores are integer micro-nats (the
    BM25 determinism trick), so the DuckDB oracle — which replays
    training counts, smoothing, and scoring end to end — must match
    bit-for-bit. ppl is a derived float view, excluded from the compare
    surface."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    out = LM.lm_nll(train, docs, alpha=0.5)
    return out.select("doc_id", "n_bigrams", "nll_micro", "avg_nll_micro")


def q_tfidf_sparse(spark, sf_dir):
    """Hashed TF-IDF sparse vectorization (functions/vectorize.py, after
    Weinberger et al. 2009): token -> feature via fixed hash mod 16 (no
    vocabulary object at any scale), weight = tf * micro-idf, collisions
    integer-summed — every cell an exact int64, so the DuckDB twin is
    bit-for-bit. 16 features against the corpus's 31-word vocabulary
    GUARANTEES hash collisions, exercising the collision-sum path the
    production-sized 2^18 default rarely hits on a toy vocab."""
    return VZ.tfidf_sparse(_t(spark, sf_dir, "documents"), n_features=16)


def q_media_dedup(spark, sf_dir):
    """Cross-document exact media dedup (functions/media.dedup_media_spans
    — the LAION/DataComp repeated-image removal step, keyed on the media
    URL/content hash): three media spans per doc with refs colliding mod
    97 (every group duplicated, ~15 occurrences each at sf0.01) plus a
    text span that must be ignored. ONE map-side-combined groupBy on the
    uniform ref key; the keeper is a struct-min AGGREGATE (no per-ref
    window), so a hot logo ref never serializes one task. The DuckDB twin
    replays the synthesis and picks keepers via row_number."""
    from linkinator_spark.functions import media as MD

    docs = _t(spark, sf_dir, "documents")
    media = (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"))
        .select(
            "doc_id",
            F.lit("media_ref").alias("kind"),
            F.lit("").alias("text"),
            F.concat(
                F.lit("http://m.example/"),
                F.md5(F.pmod(F.col("doc_id") * 3 + F.col("j"), F.lit(97))
                      .cast("string"))).alias("media_ref"),
            F.col("j").cast("int").alias("offset"),
        )
    )
    text = docs.select(
        "doc_id", F.lit("text").alias("kind"),
        F.substring("text", 1, 40).alias("text"),
        F.lit("").alias("media_ref"), F.lit(3).alias("offset"))
    return MD.dedup_media_spans(media.unionByName(text))


def q_quality_classifier(spark, sf_dir):
    """Model-based quality filtering (functions/classifier.py): hashed
    linear (fastText-style) classifier inference — the curation stage
    CCNet/DCLM/FineWeb-Edu run after the heuristic gates. token ->
    feature via fixed hash mod 64 (64 features vs the 31-word toy vocab
    forces collisions), broadcast weights join (the model fan-out a
    trained head would use, here a deterministic pseudo-model), one
    map-side-combined groupBy(doc). Scores are exact int64 micro-units
    and the keep bit is the cross-multiplied integer inequality
    `score_sum > thr * n_tokens` — no float anywhere, engine-exact."""
    from linkinator_spark.functions import classifier as CF

    docs = _t(spark, sf_dir, "documents")
    w = CF.hashed_weights(spark, n_features=64)
    return CF.classifier_score(docs, w, n_features=64, threshold_micro=0)


def q_corpus_stats(spark, sf_dir):
    """Per-language corpus report card — the rollup a curation run prints
    before/after each filter stage: doc count, token and char volume,
    quality mass, PII incidence. ALL-INTEGER columns: a float mean is
    summation-order-dependent and cannot hash-match across engines, so
    quality aggregates as per-doc micro-points (round -> exact integer
    double -> cast) and means are derived downstream. Single scan,
    map-side-combined agg on the uniform lang key — no second shuffle."""
    from functools import reduce
    from operator import add

    docs = _t(spark, sf_dir, "documents")
    f = T.quality_features(F.col("text"))
    pii_any = reduce(add, T.pii_counts(F.col("text")).values()) > 0
    per = docs.select(
        "lang",
        f["n_tokens"].alias("_tok"),
        F.col("n_chars").alias("_ch"),
        F.round(T.quality_score(F.col("text")) * 1e6, 0)
        .cast("long").alias("_qm"),
        F.when(pii_any, 1).otherwise(0).alias("_p"),
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").cast("long").alias("tokens_sum"),
        F.sum("_ch").cast("long").alias("chars_sum"),
        F.sum("_qm").cast("long").alias("quality_micro_sum"),
        F.sum("_p").cast("long").alias("pii_docs"),
    )


def q_domain_quality(spark, sf_dir):
    """Data-driven domain blocklist builder (the RefinedWeb/C4 URL-level
    filtering step that turns corpus statistics INTO the next crawl's
    blocklist, complementing the static UT1 suffix list of
    url_blocklist): per-domain quality mass, token volume and PII
    incidence in one map-side-combined scan, then integer
    cross-multiplied verdicts — low_quality when the domain's mean
    quality micro-score falls below 0.736 (splits the 11 derived domains
    at sf0.01), pii_heavy when more than 25% of its docs carry PII
    (planted on two domains, one of which also fails quality — pinning
    rule precedence). ALL-INTEGER compares: a float mean is
    summation-order-dependent and could not hash-match across engines."""
    from functools import reduce
    from operator import add

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    planted = F.when(
        (i % 11 <= 1) & (i % 2 == 0),
        F.concat(F.col("text"), F.lit(" contact bob@example.com")),
    ).otherwise(F.col("text"))
    base = docs.select(
        F.concat(F.lit("d"), (i % 11).cast("string")).alias("domain"),
        planted.alias("text"))
    f = T.quality_features(F.col("text"))
    pii_any = reduce(add, T.pii_counts(F.col("text")).values()) > 0
    per = base.select(
        "domain",
        f["n_tokens"].alias("_tok"),
        F.round(T.quality_score(F.col("text")) * 1e6, 0)
        .cast("long").alias("_qm"),
        F.when(pii_any, 1).otherwise(0).alias("_p"),
    )
    agg = per.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").cast("long").alias("tokens_sum"),
        F.sum("_qm").cast("long").alias("quality_micro_sum"),
        F.sum("_p").cast("long").alias("pii_docs"),
    )
    low_q = F.col("quality_micro_sum") < F.lit(736_000) * F.col("n_docs")
    high_pii = F.col("pii_docs") * 4 > F.col("n_docs")
    reason = (
        F.when(low_q, F.lit("low_quality"))
        .when(high_pii, F.lit("pii_heavy"))
        .otherwise(F.lit(""))
    )
    return agg.withColumn("flag_reason", reason).withColumn(
        "flagged", F.col("flag_reason") != "")


def q_ppl_bucket(spark, sf_dir):
    """CCNet head/middle/tail perplexity filter (functions/lm.ppl_bucket,
    Wenzek et al. 2020 §4.3): LM-score every doc, then bucket each
    LANGUAGE at its own exact perplexity terciles (milli-nat resolution
    histogram cumsum — bounded window tasks regardless of language skew;
    thresholds broadcast back). The DuckDB twin replays training,
    scoring, per-language quantiles, and bucketing end to end."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    return LM.ppl_bucket(train, docs, alpha=0.5)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (functions/similarity.semantic_dedup,
    after Abbas et al. 2023): IVF codebook -> nearest-cell clustering ->
    within-cluster cosine prune with a greedy min-id keeper. Runs the
    Arrow-GEMM assignment gear (the 10^10-vector default); the DuckDB
    oracle replays the ENTIRE pipeline in SQL — seed codebook, cell
    assignment, within-cell pairwise threshold, min-id keeper — so the
    clustering mechanics and prune rule are value-checked end to end,
    not just the survivor count. Corpus = embeddings + planted exact
    copies (vec_id % 25 -> +1,000,000), eps=0.999: qualifying pairs are
    exactly the planted copies (cosine 1.0 — engine-boundary-safe, same
    argument as dedup_embedding), and identical vectors provably share a
    cell, so every copy must be dropped with dup_of = its original."""
    emb = _t(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(dup)
    return S.semantic_dedup(corpus, n_lists=16, eps=0.999,
                            assign_gear="arrow")


def q_media_features(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    with_media = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(F.lit("text").alias("kind"), F.col("text").alias("text"),
                     F.lit("").alias("media_ref"), F.lit(0).alias("offset")),
            F.struct(F.lit("media_ref").alias("kind"), F.lit("").alias("text"),
                     F.concat(F.lit("http://m.example/img"),
                              (F.col("doc_id") % 40).cast("string"),
                              F.lit(".png")).alias("media_ref"),
                     F.lit(1).alias("offset")),
            F.struct(F.lit("media_ref").alias("kind"), F.lit("").alias("text"),
                     F.concat(F.lit("http://m.example/vid"),
                              (F.col("doc_id") % 15).cast("string"),
                              F.lit(".mp4")).alias("media_ref"),
                     F.lit(2).alias("offset")),
        ).alias("spans"),
    )
    media = M.media_from_documents(with_media)
    # exploded + floor-quantized (1e-9) feature values: the stub decoder is
    # deterministic sha256 math, so DuckDB reproduces the float32 features
    # bit-exactly and the driver value-checks the whole decode path
    return (
        # decoder pinned to the stub: the oracle replays its sha256 math
        # bit-exactly in DuckDB, so the value check must not depend on
        # whether a real codec library happens to be importable
        M.extract_media_features(media, out_dim=8, decoder="stub")
        .select("media_id", "kind",
                F.posexplode("feature").alias("dim", "f"))
        .select(
            "media_id", "kind", F.col("dim").cast("int").alias("dim"),
            F.floor(F.col("f").cast("double") * 1e9)
            .cast("long").alias("qval"),
        )
    )


# ---------------------------------------------------------------------------
# web-archive indexing + budget apportionment
# ---------------------------------------------------------------------------

def q_url_surt(spark, sf_dir):
    """SURT canonicalization (functions/cdx.py — the Internet Archive /
    Heritrix / Common Crawl sort key): deterministic messy URLs (mixed
    case, www/www2 prefixes on %3, explicit ports on %5/%7 — default
    and non-default, userinfo on %11, unordered two-param query on odd
    ids, fragment on %3==1, empty path on %13==0) must reduce to the
    same reversed-host key on both engines. Pure codegen projection —
    the Spark Column and the DuckDB twin are built from ONE definition
    site (surt_key / surt_sql, same file)."""
    from linkinator_spark.functions import cdx as CDX

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.when(i % 11 == 0, F.lit("user:pw@")).otherwise(F.lit("")),
        F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (i % 20).cast("string"), F.lit(".Example"),
        F.when(i % 5 == 0, F.lit(":80"))
         .when(i % 7 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.when(i % 13 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/Page/"), i.cast("string"))),
        F.when(i % 2 == 1,
               F.concat(F.lit("?b="), (i % 4).cast("string"),
                        F.lit("&a="), (i % 6).cast("string")))
         .otherwise(F.lit("")),
        F.when(i % 3 == 1, F.lit("#Sec")).otherwise(F.lit("")),
    )
    return docs.select(
        i.alias("doc_id"), url.alias("url"),
        CDX.surt_key(url).alias("surt"))


_CDX_HIST_SQL = """
              select 'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/d/' || cast(doc_id as varchar) as url,
                     cast(j * 100 + doc_id % 7 as bigint) as fetch_ts,
                     cast(200 as int) as status,
                     md5(cast(case when doc_id % 5 = 0 then 0
                              else j // (doc_id % 3 + 1) end
                              as varchar)) as digest,
                     cast(100 + doc_id % 50 as bigint) as length
              from documents,
                   lateral (select unnest(range(0, doc_id % 4 + 3)) as j)
"""


def q_cdx_index(spark, sf_dir):
    """CDX capture index with WARC revisit-by-digest dedup
    (functions/cdx.py): the revisit-schedule fetch history (3-6 captures
    per URL, content hash rolling every ``1 + doc_id % 3`` fetches,
    never-changing %5 docs) indexed by SURT with per-URL lag-digest
    revisit classification, byte savings, and the global (surt, ts)
    ordinal via the range-partition rank (never a single-task sort).
    Oracle: same lag window + row_number in DuckDB."""
    from linkinator_spark.functions import cdx as CDX

    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    base = docs.select(
        i.alias("doc_id"),
        F.explode(F.sequence(F.lit(0), (i % 4 + 2).cast("int"))).alias("j"),
    )
    period = F.col("doc_id") % 3 + 1
    version = F.when(F.col("doc_id") % 5 == 0, F.lit(0)).otherwise(
        F.floor(F.col("j") / period))
    captures = base.select(
        F.concat(F.lit("http://site"),
                 (F.col("doc_id") % 20).cast("string"),
                 F.lit(".example/d/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.col("j").cast("long") * 100
         + F.col("doc_id") % 7).alias("fetch_ts"),
        F.lit(200).alias("status"),
        F.md5(version.cast("string")).alias("digest"),
        (F.lit(100) + F.col("doc_id") % 50).cast("long").alias("length"),
    )
    return (
        CDX.cdx_index(captures)
        .withColumn("idx_rank", F.col("idx_rank").cast("long"))
    )


def q_crawl_budget(spark, sf_dir):
    """Global fetch-budget apportionment (operators/budget.py): 40 hosts
    scored by their total stored text bytes (a demand × quality proxy)
    share a prime budget of 997 fetches by exact largest-remainder
    (Hamilton) apportionment — grants sum to the budget exactly, ties
    broken host-ascending. Host table is metadata-scale; the remainder
    rank is the range-partition global rank, not a one-task window.
    Oracle: same integer div/mod + row_number + scalar subqueries."""
    from linkinator_spark.operators.budget import allocate_budget

    docs = _t(spark, sf_dir, "documents")
    hosts = (
        docs.groupBy(
            F.concat(F.lit("site"), (F.col("doc_id") % 40).cast("string"),
                     F.lit(".example")).alias("host"))
        .agg(F.sum(F.length("text")).alias("score"))
    )
    return allocate_budget(hosts, budget=997)


# ---------------------------------------------------------------------------
# events (streaming-analog) query
# ---------------------------------------------------------------------------

def q_warc_roundtrip(spark, sf_dir):
    """WARC (ISO 28500) archive write→read roundtrip (sources/warc.py):
    a capture table synthesized from documents (one response per doc,
    status cycling 200/404/301, 1-in-17 bodies poisoned with a literal
    fake WARC header) is serialized to per-shard ``.warc.gz`` blobs —
    codegen record build, one shard shuffle, deterministic per-record
    gzip members — then parsed back by the Content-Length-driven
    scanner. The oracle recomputes every header field (record-id md5,
    Zulu date, payload digest, byte-exact Content-Length) directly from
    the source rows in SQL, so a hash match proves writer∘parser is the
    identity on real data, poison included."""
    docs = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    body = F.when(
        i % 17 == 0,
        F.concat(F.lit("WARC/1.0\r\nWARC-Type: response\r\n\r\n"),
                 F.substring("text", 1, 160)),
    ).otherwise(F.substring("text", 1, 200))
    status = (F.when(i % 7 == 3, 404).when(i % 7 == 5, 301)
              .otherwise(200))
    captures = docs.select(
        F.concat(F.lit("http://site"), (i % 20).cast("string"),
                 F.lit(".example/d/"), i.cast("string")).alias("url"),
        (F.lit(1700000000).cast("long") + i).alias("fetch_ts"),
        status.alias("status"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        body.alias("body"),
        F.concat(F.lit("s"), (i % 8).cast("string")).alias("shard"),
    )
    recs = WARC.build_warc_records(captures)
    files = WARC.warc_files(recs, gzip_records=True)
    return (
        WARC.parse_warc_files(files)
        .filter(F.col("warc_type") == "response")
        .select(
            "shard", F.col("rec_index").cast("long").alias("rec_index"),
            "record_id", "target_uri", "warc_date", "payload_digest",
            F.col("content_length").cast("long").alias("content_length"),
            F.col("http_status").cast("long").alias("http_status"),
            "content_type", "payload")
    )


def q_events_windowed(spark, sf_dir):
    """Tumbling 1-hour windowed aggregation over the events stream table —
    the batch twin of the Structured Streaming path."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_bfs_engine": q_crawl_bfs_engine,
        "crawl_bfs_engine_staged": q_crawl_bfs_engine_staged,
        "frontier_bfs": q_frontier_bfs,
        "frontier_bfs_staged": q_frontier_bfs_staged,
        "extract_links": q_extract_links,
        "top_hosts": q_top_hosts,
        "link_pagerank": q_link_pagerank,
        "link_hits": q_link_hits,
        "link_communities": q_link_communities,
        "link_trustrank": q_link_trustrank,
        "link_opic": q_link_opic,
        "crawl_coverage": q_crawl_coverage,
        "degree_powerlaw": q_degree_powerlaw,
        "host_graph_stats": q_host_graph_stats,
        "frontier_opic": q_frontier_opic,
        "text_license": q_text_license,
        "url_canonicalize": q_url_canonicalize,
        "frontier_dedup": q_frontier_dedup,
        "dedup_bloom_exact": q_dedup_bloom_exact,
        "dedup_cuckoo_exact": q_dedup_cuckoo_exact,
        "dup_broken_rereport": q_dup_broken_rereport,
        "robots_gate": q_robots_gate,
        "politeness_schedule": q_politeness_schedule,
        "politeness_ip": q_politeness_ip,
        "robots_wildcards": q_robots_wildcards,
        "host_delay_adaptive": q_host_delay_adaptive,
        "host_delay_maxwins": q_host_delay_maxwins,
        "redirect_resolve": q_redirect_resolve,
        "retry_backoff": q_retry_backoff,
        "classify_taxonomy": q_classify_taxonomy,
        "span_flatten": q_span_flatten,
        "interleave_gate": q_interleave_gate,
        "span_extract": q_span_extract,
        "span_anchors": q_span_anchors,
        "span_captions": q_span_captions,
        "span_render": q_span_render,
        "span_roundtrip": q_span_roundtrip,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_cc_canonical": q_dedup_cc_canonical,
        "dedup_cluster_keeper": q_dedup_cluster_keeper,
        "doc_mixture": q_doc_mixture,
        "doc_mixture_epochs": q_doc_mixture_epochs,
        "dedup_incremental": q_dedup_incremental,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "dedup_substring": q_dedup_substring,
        "dedup_semantic": q_semantic_dedup,
        "dedup_substring_clean": q_dedup_substring_clean,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "text_repetition": q_text_repetition,
        "text_pii": q_text_pii,
        "gopher_gate": q_gopher_gate,
        "dsir_select": q_dsir_select,
        "c4_clean": q_c4_clean,
        "line_dedup": q_line_dedup,
        "anchor_agg": q_anchor_agg,
        "url_blocklist": q_url_blocklist,
        "url_traps": q_url_traps,
        "lm_score": q_lm_score,
        "ppl_bucket": q_ppl_bucket,
        "corpus_stats": q_corpus_stats,
        "domain_quality": q_domain_quality,
        "tfidf_sparse": q_tfidf_sparse,
        "quality_classifier": q_quality_classifier,
        "media_dedup": q_media_dedup,
        "frontier_priority": q_frontier_priority,
        "revisit_schedule": q_revisit_schedule,
        "crawl_diff": q_crawl_diff,
        "host_health": q_host_health,
        "sitemap_ingest": q_sitemap_ingest,
        "inverted_index": q_inverted_index,
        "phrase_search": q_phrase_search,
        "host_cardinality_hll": q_host_cardinality_hll,
        "host_heavy_hitters": q_host_heavy_hitters,
        "host_mirrors": q_host_mirrors,
        "host_mirror_groups": q_host_mirror_groups,
        "decontaminate": q_decontaminate,
        "corpus_build": q_corpus_build,
        "corpus_build_capped": q_corpus_build_capped,
        "corpus_build_v2": q_corpus_build_v2,
        "corpus_build_v3": q_corpus_build_v3,
        "doc_pack": q_doc_pack,
        "doc_pack_multimodal": q_doc_pack_multimodal,
        "corpus_build_mm": q_corpus_build_mm,
        "doc_pack_bpe": q_doc_pack_bpe,
        "doc_split": q_doc_split,
        "doc_sample_stratified": q_doc_sample_stratified,
        "domain_cap": q_domain_cap,
        "bm25_topk": q_bm25_topk,
        "vocab_topk": q_vocab_topk,
        "length_quantiles": q_length_quantiles,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_topk_arrow": q_ann_ivf_topk_arrow,
        "kmeans_train": q_kmeans_train,
        "media_features": q_media_features,
        "url_surt": q_url_surt,
        "cdx_index": q_cdx_index,
        "crawl_budget": q_crawl_budget,
        "warc_roundtrip": q_warc_roundtrip,
        "bpe_train": q_bpe_train,
        "extract_main_text": q_extract_main_text,
        "span_attributes": q_span_attributes,
        "text_normalize": q_text_normalize,
        "url_strip_tracking": q_url_strip_tracking,
        "jsonl_export": q_jsonl_export,
        "warc_cdx": q_warc_cdx,
        "corpus_build_v4": q_corpus_build_v4,
        "revalidate_plan": q_revalidate_plan,
        "jsonl_export_packed": q_jsonl_export_packed,
        "link_spam": q_link_spam,
        "events_windowed": q_events_windowed,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _hash_sql(expr: str, prefix: str = "") -> str:
    return T.portable_hash64_sql(expr, prefix)


_SPAN_FLAT_SQL = """
            with chunks as (
              select doc_id, text,
                     cast(ceil(greatest(length(text), 1) / 40.0) as int) as nc
              from documents
            ),
            flat as (
              select doc_id, substring(text, j * 40 + 1, 40) as c, j
              from chunks, lateral (select unnest(range(0, nc)) as j)
            )
            select doc_id,
                   case when j % 4 = 3 then 'media_ref' else 'text' end as kind,
                   case when j % 4 = 3 then '' else c end as text,
                   case when j % 4 = 3 then concat('http://m.example/', md5(c)) else '' end as media_ref,
                   cast(j as int) as "offset"
            from flat
        """


def _gopher_demo_text_sql() -> str:
    """SQL twin of _gopher_demo_text (the q_gopher_gate planting)."""
    nl = "chr(10)"
    aug = (
        "text"
        f" || case when doc_id % 3 = 0 then '{_GOPHER_STOP_SENTENCE}'"
        " else '' end"
        f" || case when doc_id % 4 = 0 then {nl} || '- first point' || {nl}"
        f" || '- second point' || {nl} || '* third point' else '' end"
        f" || case when doc_id % 5 = 0 then {nl} || 'read more...' || {nl}"
        f" || 'click here...' || {nl} || 'to be continued…' else '' end"
        " || case when doc_id % 6 = 0 then ' # ## ### #### #####'"
        " else '' end"
        " || case when doc_id % 7 = 0 then"
        " ' 000 111 222 333 444 555 666 777 888 999' else '' end"
    )
    # DuckDB string literals may hold raw newlines, so the planted docs
    # embed verbatim (neither contains a single quote).
    return (
        f"case when doc_id % 19 = 0 then '{_GOPHER_BULLET_DOC}'"
        f" when doc_id % 23 = 0 then '{_GOPHER_LONGWORD_DOC}'"
        f" else {aug} end"
    )


def _gopher_gate_oracle(docs_table: str = "documents") -> str:
    """DuckDB twin of q_gopher_gate: the same doc_id-keyed noise planting
    wrapped around gopher.gopher_gate_oracle_sql."""
    from linkinator_spark.functions import gopher as GP

    return GP.gopher_gate_oracle_sql(
        docs_table="(select doc_id, " + _gopher_demo_text_sql()
        + f" as text from {docs_table})",
        text_expr="text")


def _bm25_values_sql() -> str:
    return ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)


def _shingles_sql(expr: str, k: int) -> str:
    norm = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length({norm}) - {k - 1}, 1) + 1), "
        f"i -> substring({norm}, i, {k})))"
    )


def _minhash_sql(expr: str, n: int, k: int) -> str:
    """DuckDB twin of dedup.minhash_signature: one 28-bit md5-derived hash
    per shingle, n linear permutations (a_j*h + b_j) mod P."""
    from linkinator_spark.functions.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    hash28 = "cast(('0x' || substr(md5(s), 1, 7)) as ubigint)::bigint"
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {MINHASH_A[j]} + {MINHASH_B[j]}) % {MINHASH_P}))"
        for j in range(n)
    )
    return (
        f"(select [{mins}] from "
        f"(select list_transform({_shingles_sql(expr, k)}, s -> {hash28}) as hs))"
    )


def _simhash_sql(expr: str, bits: int) -> str:
    norm = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    tokens = f"list_distinct(regexp_extract_all({norm}, '[a-z0-9]+'))"
    terms = " + ".join(
        f"(case when 2 * len(list_filter(hs, h -> (h & {1 << b}) != 0)) >= len(hs) "
        f"then {1 << b} else 0 end)"
        for b in range(bits)
    )
    return (
        f"(select case when len(hs) > 0 then {terms} else 0 end "
        f"from (select list_transform({tokens}, t -> {_hash_sql('t')}) as hs))"
    )


def oracle_sql() -> dict[str, str]:
    n_sf001 = 500  # documents rows at sf0.01 (driver compares at sf0.01)
    url_re = _URL_RE

    extract_links = f"""
        with linked as (
          select doc_id, {_LINKED_TEXT_SQL} as body from documents
        )
        select doc_id, link,
               regexp_extract(link, '^https?://([^/]+)', 1) as host
        from (
          select doc_id, unnest(regexp_extract_all(body, '{url_re}')) as link
          from linked
        )
    """

    seen_sql = f"""
        (select distinct link from ({extract_links}) where doc_id % 3 = 0)
    """

    quality_parts = {
        "n_chars": "length(text)",
        "n_alpha": "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))",
        "n_digit": "length(regexp_replace(text, '[^0-9]', '', 'g'))",
        "n_punct": "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))",
        "n_tokens": "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))",
        "n_stop": ("len(regexp_extract_all(lower(text), "
                   "'\\b(?:the|and|of|to|in|is|that|it|was|for)\\b'))"),
    }
    q = quality_parts
    alpha_ratio = f"({q['n_alpha']}::double / greatest({q['n_chars']}, 1))"
    punct_ratio = f"({q['n_punct']}::double / greatest({q['n_chars']}, 1))"
    stop_ratio = f"({q['n_stop']}::double / greatest({q['n_tokens']}, 1))"
    quality_score = (
        f"round(least({alpha_ratio} * 1.25, 1.0) * 0.4"
        f" + least({stop_ratio} * 5.0, 1.0) * 0.3"
        f" + (1.0 - least({punct_ratio} * 4.0, 1.0)) * 0.2"
        f" + (case when {q['n_chars']} between 100 and 100000 then 1.0 else 0.0 end) * 0.1, 6)"
    )

    lang_cases = []
    for lg in sorted(T.LANG_STOPWORDS):
        words = "|".join(T.LANG_STOPWORDS[lg])
        lang_cases.append(
            (lg, f"len(regexp_extract_all(lower(text), '\\b(?:{words})\\b'))")
        )
    best = "greatest(" + ", ".join(s for _, s in lang_cases) + ")"
    chain = "'und'"
    for lg, s in reversed(lang_cases):
        chain = f"case when {s} = {best} then '{lg}' else {chain} end"
    langid_sql = f"""
        select doc_id,
               case when {best} > 0 then {chain} else 'und' end as lang_pred
        from documents
    """

    norm_text = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

    def gram8(src: str, k: int = 8) -> str:
        """Word k-grams of `src` (doc_id, text) — the one definition the
        decontamination and substring-dedup oracles share, so gram width
        and construction can never drift between them."""
        parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
        return f"""(
            select doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - {k - 2}, 1)),
                                         i -> {parts})) as gram
            from (select doc_id, string_split({norm_text}, ' ') as w
                  from {src})
        )"""
    kgram = (
        f"list_min(list_transform("
        f"range(1, greatest(length({norm_text}) - 7, 1) + 1), "
        f"i -> {_hash_sql(f'substring({norm_text}, i, 8)')}))"
    )

    minhash_bands_sql = f"""
        with corpus as (select * from {_DOCS_WITH_DUPS_SQL} c),
        sigs as (
          select doc_id, {_minhash_sql('text', MINHASH_N, SHINGLE_K)} as sig
          from corpus
        ),
        bands as (
          select doc_id, band_id,
                 md5(concat_ws('|',
                     {", ".join(f"cast(sig[band_id * {MINHASH_N // MINHASH_BANDS} + {r + 1}] as varchar)" for r in range(MINHASH_N // MINHASH_BANDS))}
                 )) as band_hash
          from sigs, (select unnest(range(0, {MINHASH_BANDS})) as band_id)
        )
        select distinct l.doc_id as doc_a, r.doc_id as doc_b
        from bands l join bands r
          on l.band_id = r.band_id and l.band_hash = r.band_hash
         and l.doc_id < r.doc_id
    """

    jaccard_sql = f"""
        with corpus as (select * from {_DOCS_WITH_DUPS_SQL} c),
        cands as ({minhash_bands_sql}),
        sh as (select doc_id, {_shingles_sql('text', SHINGLE_K)} as s from corpus)
        select doc_a, doc_b,
               round(len(list_intersect(a.s, b.s))::double /
                     greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 6) as jaccard
        from cands join sh a on cands.doc_a = a.doc_id
                   join sh b on cands.doc_b = b.doc_id
        where len(list_intersect(a.s, b.s))::double /
              greatest(len(list_distinct(list_concat(a.s, b.s))), 1) >= 0.5
    """

    _band_rows = MINHASH_N // MINHASH_BANDS
    _band_hash = (
        "md5(concat_ws('|', "
        + ", ".join(
            f"cast(sig[band_id * {_band_rows} + {r + 1}] as varchar)"
            for r in range(_band_rows))
        + "))"
    )
    incremental_sql = f"""
        with newdocs as (
          select doc_id + 2000000 as doc_id, text || ' tail marker' as text
          from documents where doc_id % 10 = 0
          union all
          select doc_id + 3000000 as doc_id, md5(text) as text
          from documents where doc_id % 10 = 3),
        corpus as (select doc_id, text from documents),
        nsig as (select doc_id,
                        {_minhash_sql('text', MINHASH_N, SHINGLE_K)} as sig
                 from newdocs),
        csig as (select doc_id,
                        {_minhash_sql('text', MINHASH_N, SHINGLE_K)} as sig
                 from corpus),
        nb as (select doc_id, band_id, {_band_hash} as band_hash
               from nsig,
                    (select unnest(range(0, {MINHASH_BANDS})) as band_id)),
        cb as (select doc_id, band_id, {_band_hash} as band_hash
               from csig,
                    (select unnest(range(0, {MINHASH_BANDS})) as band_id)),
        cands as (
          select distinct n.doc_id as new_id, c.doc_id as corpus_id
          from nb n join cb c
            on n.band_id = c.band_id and n.band_hash = c.band_hash),
        shn as (select doc_id, {_shingles_sql('text', SHINGLE_K)} as s
                from newdocs),
        shc as (select doc_id, {_shingles_sql('text', SHINGLE_K)} as s
                from corpus)
        select new_id, corpus_id,
               round(len(list_intersect(a.s, b.s))::double /
                     greatest(len(list_distinct(list_concat(a.s, b.s))), 1),
                     6) as jaccard
        from cands join shn a on cands.new_id = a.doc_id
                   join shc b on cands.corpus_id = b.doc_id
        where len(list_intersect(a.s, b.s))::double /
              greatest(len(list_distinct(list_concat(a.s, b.s))), 1) >= 0.5
    """

    corpus_build_sql = f"""
            with keyed as (
              select doc_id, text, md5({norm_text}) as ck from documents),
            keepers as (
              select ck, min(doc_id) as doc_id from keyed group by 1),
            kept as (
              select k.doc_id, k.text from keyed k
              join keepers u on u.ck = k.ck and u.doc_id = k.doc_id),
            bench as (
              select distinct gram from {gram8("documents")}
              where doc_id % 50 = 0),
            kept_train as (
              select doc_id, text from kept where doc_id % 50 <> 0),
            hits as (
              select g.doc_id, count(distinct g.gram) as n_shared
              from {gram8("kept_train")} g join bench b using (gram)
              group by 1),
            clean as (
              select k.doc_id from kept_train k
              left join hits h using (doc_id)
              where coalesce(h.n_shared, 0) < 2),
            corpus as (
              select kept.doc_id, kept.text
              from kept join clean using (doc_id))
            select doc_id,
                   case when {best} > 0 then {chain} else 'und' end
                     as lang_pred,
                   {quality_score} as quality,
                   case when {_hash_sql("cast(doc_id as varchar)", "split:")}
                             % 100 < 98 then 'train'
                        when {_hash_sql("cast(doc_id as varchar)", "split:")}
                             % 100 < 99 then 'val'
                        else 'test' end as split
            from corpus
            where (case when {best} > 0 then {chain} else 'und' end) = 'en'
              and {quality_score} >= 0.7
        """

    v2_gop = _gopher_gate_oracle("dd")
    v2_c4 = C4M.c4_clean_oracle_sql(
        docs_table="(select doc_id, " + _C4_DEMO_TEXT_SQL
        + " as text from dd)")
    v2_blk = BL.blocklist_oracle_sql(
        "select doc_id,"
        " 'sub' || cast(doc_id % 3 as varchar) || '.site'"
        " || cast(doc_id % 20 as varchar) || '.example' as host"
        " from dd",
        _BLOCKLIST_RULES, url_col="doc_id")
    split_bucket = f"{_hash_sql('cast(doc_id as varchar)', 'split:')} % 100"
    corpus_build_v2_sql = f"""
        with dd as (select * from {_DOCS_V2_SQL} ddx),
        g as (select doc_id, n_words from ({v2_gop}) where gopher_pass = 1),
        c as (select doc_id, n_kept from ({v2_c4}) where doc_kept = 1),
        b as (select doc_id, host from ({v2_blk}) where blocked = 0),
        surv as (
          select d.doc_id, b.host, g.n_words, c.n_kept,
                 md5({norm_text}) as ck
          from dd d
          join g using (doc_id) join c using (doc_id) join b using (doc_id)),
        keepers as (select ck, min(doc_id) as doc_id from surv group by 1)
        select s.doc_id, s.host, s.n_words, s.n_kept,
               case when {split_bucket} < 98 then 'train'
                    when {split_bucket} < 99 then 'val'
                    else 'test' end as split
        from surv s join keepers using (ck, doc_id)
    """

    v3_ld = LD.line_dedup_oracle_sql(
        docs_table="(select doc_id, " + _C4_DEMO_TEXT_SQL
        + " as text from dd)", min_dup_docs=3)
    corpus_build_v3_sql = f"""
        with dd as (select * from {_DOCS_V2_SQL} ddx),
        g as (select doc_id, n_words from ({v2_gop}) where gopher_pass = 1),
        c as (select doc_id, n_kept from ({v2_c4}) where doc_kept = 1),
        b as (select doc_id, host from ({v2_blk}) where blocked = 0),
        ld as (select doc_id, n_removed as n_line_removed,
                      cleaned_md5 as line_md5 from ({v3_ld})),
        surv as (
          select d.doc_id, b.host, g.n_words, c.n_kept,
                 ld.n_line_removed, ld.line_md5,
                 md5({norm_text}) as ck
          from dd d
          join g using (doc_id) join c using (doc_id) join b using (doc_id)
          join ld using (doc_id)),
        keepers as (select ck, min(doc_id) as doc_id from surv group by 1)
        select s.doc_id, s.host, s.n_words, s.n_kept,
               s.n_line_removed, s.line_md5,
               case when {split_bucket} < 98 then 'train'
                    when {split_bucket} < 99 then 'val'
                    else 'test' end as split
        from surv s join keepers using (ck, doc_id)
    """

    return {
        "frontier_bfs": G.bfs_oracle_sql(n_sf001),
        "frontier_bfs_staged": G.bfs_oracle_sql(n_sf001),
        "crawl_bfs_engine": G.bfs_oracle_sql(n_sf001),
        "crawl_bfs_engine_staged": G.bfs_oracle_sql(n_sf001),
        "extract_links": extract_links,
        "top_hosts": f"""
            select host, count(*) as n_links, count(distinct link) as n_urls
            from ({extract_links})
            group by host
            order by n_links desc, host
            limit 10
        """,
        "url_canonicalize": """
            select doc_id,
                   concat('http://site', cast(doc_id % 20 as varchar),
                          '.example/Path/', cast(doc_id as varchar)) as canonical_url,
                   concat('frag', cast(doc_id % 7 as varchar)) as fragment
            from documents
        """,
        "frontier_dedup": f"""
            select distinct link as url from ({extract_links})
            where link not in (select link from {seen_sql} s)
        """,
        "dedup_bloom_exact": """
            select concat('http://corpus.test/p/', cast(doc_id as varchar)) as url
            from documents where doc_id % 2 = 1
        """,
        "dedup_cuckoo_exact": """
            select concat('http://corpus.test/p/', cast(doc_id as varchar)) as url
            from documents where doc_id % 2 = 1
        """,
        "link_pagerank": f"""
            -- unrolled 5-iteration power method over the same derived
            -- edge set (functions/graph.pagerank_oracle_sql)
            select node, round(pagerank, 6) as pagerank
            from ({GR.pagerank_oracle_sql(
                G.edges_sql(n_sf001),
                "select doc_id as id from documents",
                iters=5, damping=0.85)})
        """,
        "link_hits": f"""
            -- unrolled 5-round HITS with L1 normalization over the same
            -- derived edge set (functions/graph.hits_oracle_sql)
            select node, round(hub, 6) as hub, round(auth, 6) as auth
            from ({GR.hits_oracle_sql(
                G.edges_sql(n_sf001),
                "select doc_id as id from documents",
                iters=5)})
        """,
        "link_communities": f"""
            -- unrolled 4-round label propagation over the same derived
            -- edge set (functions/graph.label_propagation_oracle_sql)
            {GR.label_propagation_oracle_sql(G.edges_sql(n_sf001), iters=4)}
        """,
        "link_trustrank": f"""
            -- unrolled 5-iteration seed-biased power method
            -- (functions/graph.trustrank_oracle_sql)
            select node, round(trust, 6) as trust
            from ({GR.trustrank_oracle_sql(
                G.edges_sql(n_sf001),
                "select doc_id as id from documents where doc_id % 50 = 0",
                iters=5, damping=0.85)})
        """,
        "link_opic": f"""
            -- unrolled 5-round synchronous OPIC cash distribution
            -- (functions/graph.opic_oracle_sql)
            select node, round(cash, 6) as cash,
                   round(history, 6) as history,
                   round(importance, 6) as importance
            from ({GR.opic_oracle_sql(G.edges_sql(n_sf001), iters=5)})
        """,
        "crawl_coverage": GR.discovery_coverage_oracle_sql(
            G.edges_sql(n_sf001)),
        "degree_powerlaw": GR.degree_powerlaw_oracle_sql(
            G.edges_sql(n_sf001), kmin=2),
        "host_graph_stats": GR.host_graph_stats_oracle_sql(
            f"""select concat('site', cast(src % 20 as varchar))
                         as src_host,
                       concat('site', cast(dst % 20 as varchar))
                         as dst_host
                from {G.edges_sql(n_sf001)}"""),
        "frontier_priority": f"""
            -- unrolled PageRank -> micro-priority -> per-host top-4 by
            -- descending priority -> global emission rank
            with pr as ({GR.pagerank_oracle_sql(
                G.edges_sql(n_sf001),
                "select doc_id as id from documents",
                iters=5, damping=0.85)}),
            f as (
              select 'http://site' || cast(node % 20 as varchar)
                       || '.example/p/' || cast(node as varchar) as url,
                     'site' || cast(node % 20 as varchar) || '.example'
                       as host,
                     cast(round(pagerank * 1e6) as bigint) as priority_micro
              from pr
            ),
            t as (
              select *, cast(row_number() over
                       (partition by host
                        order by -priority_micro, url) as integer)
                       as host_rank
              from f
            ),
            s as (select * from t where host_rank <= 4)
            select url, host, priority_micro, host_rank,
                   row_number() over (order by -priority_micro, url)
                     as emit_rank
            from s
        """,
        "frontier_opic": f"""
            -- unrolled OPIC -> micro-priority -> per-host top-4 by
            -- descending cash -> global emission rank
            with op as ({GR.opic_oracle_sql(G.edges_sql(n_sf001),
                                            iters=5)}),
            f as (
              select 'http://site' || cast(node % 20 as varchar)
                       || '.example/p/' || cast(node as varchar) as url,
                     'site' || cast(node % 20 as varchar) || '.example'
                       as host,
                     cast(round(cash * 1e6) as bigint) as priority_micro
              from op
            ),
            t as (
              select *, cast(row_number() over
                       (partition by host
                        order by -priority_micro, url) as integer)
                       as host_rank
              from f
            ),
            s as (select * from t where host_rank <= 4)
            select url, host, priority_micro, host_rank,
                   row_number() over (order by -priority_micro, url)
                     as emit_rank
            from s
        """,
        "host_health": """
            -- replayed fetch attempts -> base rollup + last success ->
            -- trailing failures (failed rows after last_ok only) ->
            -- cross-multiplied rate rule, then trailing rule
            with fetches as (
              select 'h' || cast(user_id % 25 as varchar) as host,
                     cast(event_id as bigint) as ts,
                     (event_type = 'error'
                      or (user_id % 25 < 5 and event_type = 'click')
                      or (user_id % 25 = 7 and event_id > 9000)) as failed
              from events
            ),
            base as (
              select host,
                     cast(count(*) as bigint) as n_fetches,
                     cast(sum(case when failed then 1 else 0 end)
                          as bigint) as n_errors,
                     max(case when not failed then ts end) as last_ok
              from fetches group by host
            ),
            trail as (
              select f.host,
                     cast(count(*) as bigint) as trailing_failures
              from fetches f join base b using (host)
              where f.failed and (b.last_ok is null or f.ts > b.last_ok)
              group by f.host
            )
            select b.host, b.n_fetches, b.n_errors,
                   cast(floor(b.n_errors * 1000000 / b.n_fetches)
                        as bigint) as error_rate_micro,
                   coalesce(t.trailing_failures, 0)::bigint
                     as trailing_failures,
                   case when b.n_fetches >= 20
                             and b.n_errors * 1000000
                                 >= 300000 * b.n_fetches
                          then 'error_rate'
                        when coalesce(t.trailing_failures, 0) >= 5
                          then 'trailing_failures'
                        else '' end as trip_reason,
                   (case when b.n_fetches >= 20
                              and b.n_errors * 1000000
                                  >= 300000 * b.n_fetches
                           then 'error_rate'
                         when coalesce(t.trailing_failures, 0) >= 5
                           then 'trailing_failures'
                         else '' end) <> '' as tripped
            from base b left join trail t using (host)
        """,
        "sitemap_ingest": """
            -- the oracle computes the declared URL inventory directly from
            -- the doc_id arithmetic; the Spark side must reproduce it
            -- through the robots -> index -> urlset XML round trip
            select 'h' || cast(doc_id % 7 as varchar) || '.sm.example'
                     as host,
                   'http://h' || cast(doc_id % 7 as varchar)
                     || '.sm.example/p/' || cast(doc_id as varchar) as loc,
                   case when doc_id % 3 <> 0
                        then '2026-05-1' || cast(doc_id % 9 as varchar)
                   end as lastmod,
                   cast(case when doc_id % 4 <> 0
                             then (doc_id % 10) * 100000
                             else 500000 end as bigint) as priority_micro,
                   'http://h' || cast(doc_id % 7 as varchar)
                     || '.sm.example/sm_' || cast(doc_id % 2 as varchar)
                     || '.xml' as sitemap_url
            from documents
        """,
        "phrase_search": f"""
            -- corpus-derived phrases (tokens 3..5 of docs 0-2) ->
            -- vote-and-count positional match (search.phrase_search_oracle_sql)
            {SRCH.phrase_search_oracle_sql(
                "select doc_id, text from documents",
                "select doc_id as phrase_id, "
                " array_to_string("
                "   regexp_extract_all(lower(text), '[a-z0-9]+')[3:5], ' ')"
                " as phrase from documents where doc_id < 3")}
        """,
        "host_cardinality_hll": f"""
            -- register-exact HLL replay from the portable md5-prefix hash
            {SK.hll_cardinality_oracle_sql(
                "select 'h' || cast(doc_id % 8 as varchar) as host,"
                " 'http://corpus.test/p/' || cast(doc_id as varchar) as url"
                " from documents"
                " union all "
                "select 'h' || cast(doc_id % 8 as varchar) as host,"
                " 'http://corpus.test/p/' || cast(doc_id as varchar) as url"
                " from documents where doc_id % 3 = 0",
                "url", ["host"])}
        """,
        "host_heavy_hitters": f"""
            -- cell-exact count-min replay over the skewed key stream
            {SK.cms_estimate_oracle_sql(
                "select case when doc_id % 2 = 0"
                " then 'hot' || cast(doc_id % 5 as varchar)"
                " else 'cold' || cast(doc_id as varchar) end as key"
                " from documents",
                "key")}
        """,
        "host_mirrors": f"""
            -- planted full (m0-m4) and partial (p0) mirrors over
            -- fingerprint equi-join + integer-micro Jaccard
            {MR.host_mirrors_oracle_sql(_MIRROR_SITES_SQL,
                                        min_jaccard_micro=100_000)}
        """,
        "host_mirror_groups": f"""
            -- pairs -> recursive transitive closure -> keeper election
            -- by (size desc, host asc)
            {MR.host_mirror_groups_oracle_sql(_MIRROR_SITES_SQL,
                                              min_jaccard_micro=100_000)}
        """,
        "inverted_index": """
            -- direct group-and-sort twin of the salted three-phase build
            with toks as (
              select doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') as ts
              from documents
            ),
            pos as (
              select doc_id, ts[i] as term, i - 1 as pos
              from toks, lateral (select unnest(range(1, len(ts) + 1)) as i)
            ),
            per_doc as (
              select term, doc_id, cast(count(*) as bigint) as tf,
                     printf('%012d', doc_id) || '@' ||
                     string_agg(cast(pos as varchar), '.' order by pos) as e
              from pos group by term, doc_id
            )
            select term, cast(count(*) as bigint) as df,
                   cast(sum(tf) as bigint) as total_tf,
                   array_to_string(list_sort(list(e)), ',') as postings
            from per_doc group by term
            having count(*) >= 2
        """,
        "crawl_diff": f"""
            -- two replayed snapshots -> full-outer join -> transition CASE
            with prevb as (
              select {G.url_sql('doc_id')} as url,
                     {G.status_sql('doc_id')} as status
              from documents where doc_id % 10 <> 0),
            prev as (
              select url, status,
                     case when status = 200 then 'OK' else 'BROKEN' end
                       as state
              from prevb),
            currb as (
              select {G.url_sql('doc_id')} as url,
                     case when doc_id > 0 and doc_id % 19 = 0 then 404
                          when doc_id > 0 and doc_id % 23 = 0 then 503
                          when doc_id > 0 and doc_id % 7 = 0 then 301
                          else 200 end as status
              from documents where doc_id % 13 <> 0),
            curr as (
              select url, status,
                     case when status in (404, 503) then 'BROKEN'
                          else 'OK' end as state
              from currb),
            j as (
              select coalesce(p.url, c.url) as url,
                     cast(p.status as int) as prev_status,
                     p.state as prev_state,
                     cast(c.status as int) as curr_status,
                     c.state as curr_state
              from prev p full outer join curr c on p.url = c.url)
            select url, prev_status, prev_state, curr_status, curr_state,
                   case when prev_state is null then 'new'
                        when curr_state is null then 'gone'
                        when prev_state <> 'BROKEN'
                             and curr_state = 'BROKEN' then 'newly_broken'
                        when prev_state = 'BROKEN'
                             and curr_state <> 'BROKEN' then 'fixed'
                        when prev_state = 'BROKEN'
                             and curr_state = 'BROKEN' then 'still_broken'
                        when prev_status <> curr_status
                             or prev_state <> curr_state then 'changed'
                        else 'unchanged' end as transition
            from j
        """,
        "revisit_schedule": """
            -- replayed fetch history -> lag-window change count ->
            -- Cho & Garcia-Molina micro-nat rate -> int64 priority ->
            -- per-host top-5 -> global emission rank
            with hist as (
              select 'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/d/' || cast(doc_id as varchar) as url,
                     'site' || cast(doc_id % 20 as varchar)
                       || '.example' as host,
                     cast(j * 100 as bigint) as fetch_ts,
                     md5(cast(case when doc_id % 5 = 0 then 0
                              else j // (doc_id % 3 + 1) end
                              as varchar)) as content_hash
              from documents,
                   lateral (select unnest(range(0, doc_id % 4 + 3)) as j)
            ),
            lagged as (
              select *, lag(content_hash) over
                       (partition by url order by fetch_ts) as prev_hash
              from hist
            ),
            agg as (
              select url, host,
                     cast(count(*) as bigint) as n_fetches,
                     cast(sum(case when prev_hash is not null
                                    and prev_hash <> content_hash
                              then 1 else 0 end) as bigint) as n_changes,
                     max(fetch_ts) as last_ts
              from lagged group by url, host
            ),
            pri as (
              select url, host, n_fetches, n_changes,
                     cast(round(-ln((n_fetches - 1 - n_changes + 0.5)
                                    / (n_fetches - 1 + 0.5)) * 1e6)
                          as bigint) as rate_micro,
                     cast(greatest(0, floor((900 - last_ts) / 100.0))
                          as bigint) as age_intervals
              from agg
            ),
            due as (
              select *, rate_micro * age_intervals as priority_micro
              from pri where rate_micro * age_intervals > 0
            ),
            t as (
              select *, cast(row_number() over
                       (partition by host
                        order by -priority_micro, url) as integer)
                       as host_rank
              from due
            ),
            s as (select * from t where host_rank <= 5)
            select url, host, n_fetches, n_changes, rate_micro,
                   age_intervals, priority_micro, host_rank,
                   row_number() over (order by -priority_micro, url)
                     as emit_rank
            from s
        """,
        "dup_broken_rereport": f"""
            with e as (select distinct src, dst from {G.edges_sql(n_sf001)} t),
            ranked as (
              select src, dst, min(src) over (partition by dst) as min_src
              from e
            )
            select {G.url_sql('dst')} as url,
                   {G.url_sql('src')} as parent,
                   cast({G.status_sql('dst')} as int) as status
            from ranked
            where src <> min_src and ({G.status_sql('dst')}) >= 400
        """,
        "robots_gate": """
            with f as (
              select doc_id,
                     doc_id % 20 as m,
                     case when doc_id % 5 = 0
                          then concat('/page/', cast(doc_id as varchar))
                          when doc_id % 5 = 1
                          then concat('/page/special/', cast(doc_id as varchar))
                          else concat('/other/', cast(doc_id as varchar)) end as path
              from documents
            )
            select concat('http://site', cast(m as varchar), '.example', path) as url,
                   not (m % 2 = 0 and path like '/page/%'
                        and path not like '/page/special/%') as allowed
            from f
        """,
        "politeness_schedule": f"""
            with links as (select distinct host, link from ({extract_links}))
            select host, link as url,
                   row_number() over (partition by host order by link) as host_seq,
                   cast(floor((row_number() over (partition by host order by link) - 1) / 4) as int) as fetch_wave
            from links
        """,
        "host_delay_maxwins": """
            select concat('h', cast(user_id % 10 as varchar)) as host,
                   round(max(value * 10), 6) as not_before
            from events where event_type = 'error'
            group by 1
        """,
        "robots_wildcards": r"""
            -- hand-compiled regex twins of the fixture's RFC 9309
            -- rules: disallow ['/*.tmp$' len 7, '/cal/*/day' len 10],
            -- allow ['/cal/2024*' len 10]; allowed = best_allow >=
            -- best_disallow over raw-rule-length specificity
            with f as (
              select case
                       when doc_id % 6 = 0
                         then concat('/a/x', cast(doc_id as varchar),
                                     '.tmp')
                       when doc_id % 6 = 1
                         then concat('/a/x', cast(doc_id as varchar),
                                     '.tmpX')
                       when doc_id % 6 = 2 then '/cal/2023/day'
                       when doc_id % 6 = 3 then '/cal/2024/day'
                       when doc_id % 6 = 4 then '/cal/2025/x'
                       else concat('/plain/', cast(doc_id as varchar))
                     end as path
              from documents
            )
            select concat('http://w.example', path) as url,
                   greatest(
                     case when regexp_matches(path, '^/cal/2024')
                          then 10 else -1 end
                   ) >= greatest(
                     case when regexp_matches(path, '^/.*\.tmp$')
                          then 7 else -1 end,
                     case when regexp_matches(path, '^/cal/.*/day')
                          then 10 else -1 end
                   ) as allowed
            from f
        """,
        "host_delay_adaptive": PLT.adaptive_host_delay_sql(
            "select concat('h', cast(user_id % 10 as varchar)) as host, "
            "event_id as s, "
            "case when event_type = 'error' then 1 else 0 end as t "
            "from events"),
        "politeness_ip": f"""
            -- per-server (shared-IP) budget: deterministic DNS twin
            -- (operators/politeness.server_ip_sql) + window rank per IP
            with hh as (
              select doc_id,
                     concat('s', cast(doc_id % 7 as varchar), '.site',
                            cast(doc_id % 3 as varchar),
                            case when doc_id % 2 = 0 then '.test'
                                 else '.co.uk' end) as host
              from documents
            ),
            fr as (
              select host,
                     concat('http://', host, '/p/',
                            cast(doc_id as varchar)) as url
              from hh
            ),
            ips as (
              select {PLT.server_ip_sql('host')} as server_ip, host, url
              from fr
            )
            select server_ip, host, url, ip_rank from (
              select server_ip, host, url,
                     cast(row_number() over (partition by server_ip
                                             order by host, url)
                          as bigint) as ip_rank
              from ips)
            where ip_rank <= 8
        """,
        "redirect_resolve": f"""
            with recursive
            n as (select count(*) as n from documents),
            chain(start_id, cur_id, hops) as (
              select doc_id, doc_id, 0 from documents
              union all
              select c.start_id,
                     {G.redirect_target_sql('c.cur_id', '(select n from n)')},
                     c.hops + 1
              from chain c
              where c.cur_id > 0 and c.cur_id % 5 = 0 and c.hops < 21
            ),
            terminal as (
              select start_id, cur_id, hops,
                     row_number() over (partition by start_id
                                        order by hops) as rn
              from chain
              where not (cur_id > 0 and cur_id % 5 = 0) and hops <= 20
            ),
            land as (select start_id, cur_id, hops from terminal where rn = 1)
            select {G.url_sql('d.doc_id')} as url,
                   cast(case when l.start_id is null then 0
                             else {G.status_sql('l.cur_id')} end as int)
                     as status,
                   case when l.start_id is not null and l.hops > 0
                        then {G.url_sql('l.cur_id')} end as final_url,
                   (l.start_id is null) as exceeded
            from documents d left join land l on l.start_id = d.doc_id
        """,
        "retry_backoff": f"""
            with broken as (
              select doc_id from documents where ({G.status_sql('doc_id')}) != 200
            ),
            retries as (
              select doc_id, unnest(range(1, 6)) as retry_n from broken
            )
            select {G.url_sql('doc_id')} as url,
                   cast(retry_n as int) as retry_n,
                   round(pow(2.0, retry_n) +
                         ({_hash_sql(f"concat({G.url_sql('doc_id')}, '#', cast(retry_n as varchar))")} % 3000) / 1000.0,
                         6) as backoff_s
            from retries
        """,
        "classify_taxonomy": f"""
            with frame as (
              select {G.url_sql('doc_id')} as url,
                     ([200, 201, 301, 403, 404, 410, 429, 500, 503, 999])[cast(doc_id % 10 as int) + 1] as status,
                     (doc_id % 2 = 0) as has_body
              from documents
            )
            select url, cast(status as int) as status,
                   case
                     when status = 403 then 'OK'
                     when status >= 400 and status < 500 then 'SKIPPED'
                     when status >= 500 and status < 600 then 'BROKEN'
                     when status = 999 then 'SKIPPED'
                     when status >= 200 and status < 300 then 'OK'
                     when status >= 300 and status < 400 and has_body then 'OK'
                     else 'BROKEN'
                   end as state
            from frame
        """,
        "span_flatten": _SPAN_FLAT_SQL,
        "interleave_gate": f"""
            -- span synthesis -> exact counts -> ordered rule chain
            with spans as ({_SPAN_FLAT_SQL}),
            stats as (
              select doc_id,
                     count(*)::bigint as n_spans,
                     sum(case when kind = 'media_ref' then 1 else 0
                         end)::bigint as n_media,
                     sum(case when kind = 'text' then 1 else 0
                         end)::bigint as n_text,
                     sum(case when kind = 'text' then
                           len(regexp_extract_all(text,
                               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                         else 0 end)::bigint as n_tokens
              from spans group by doc_id
            )
            select doc_id, n_spans, n_media, n_text, n_tokens,
                   case when n_media < 1 then 'too_few_media'
                        when n_media > 2 then 'too_many_media'
                        when n_tokens < 60 then 'too_few_tokens'
                        when n_tokens < n_media * 35
                          then 'low_text_media_ratio'
                        else '' end as reject_reason,
                   (case when n_media < 1 then 'too_few_media'
                         when n_media > 2 then 'too_many_media'
                         when n_tokens < 60 then 'too_few_tokens'
                         when n_tokens < n_media * 35
                           then 'low_text_media_ratio'
                         else '' end) = '' as keep
            from stats
        """,
        "span_extract": """
            -- the parser's ordinal-ordered output on the planted spans:
            -- html link always (ordinal 0), markdown link on %3 (ordinal
            -- 1), media_ref on %4 (after the markdown link if present)
            with base as (
              select doc_id,
                     'http://host.example/p/' || cast(doc_id as varchar)
                       as page_url
              from documents),
            links as (
              select page_url, 0 as ordinal,
                     'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/page/' || cast(doc_id as varchar) as u
              from base
              union all
              select page_url, 1 as ordinal,
                     'https://ref.example/r/' || cast(doc_id % 50 as varchar)
              from base where doc_id % 3 = 0
              union all
              select page_url,
                     case when doc_id % 3 = 0 then 2 else 1 end as ordinal,
                     'http://m.example/' || md5(cast(doc_id as varchar))
              from base where doc_id % 4 = 0)
            select page_url, cast(ordinal as int) as ordinal,
                   u as raw_link, u as resolved_url
            from links
        """,
        "span_anchors": """
            with base as (
              select doc_id,
                     'http://host.example/p/' || cast(doc_id as varchar)
                       as page_url,
                     '<h1 id="top">T</h1><div id="intro'
                       || cast(doc_id % 5 as varchar) || '">i</div>' as h,
                     '## Section ' || cast(doc_id % 7 as varchar)
                       || ' Overview!' as md
              from documents)
            select page_url,
                   array_to_string(
                     list_sort(['top',
                                'intro' || cast(doc_id % 5 as varchar),
                                'section-' || cast(doc_id % 7 as varchar)
                                  || '-overview']), '|') as anchors,
                   3 as n_anchors,
                   md5(h || md) as body_md5
            from base
        """,
        "span_captions": IV.caption_pairs_oracle_sql(_SPAN_FLAT_SQL),
        "span_render": IV.render_spans_oracle_sql(_SPAN_FLAT_SQL),
        "span_roundtrip": """
            with chunks as (
              select doc_id, text,
                     cast(ceil(greatest(length(text), 1) / 40.0) as int) as nc
              from documents
            ),
            flat as (
              select doc_id, substring(text, j * 40 + 1, 40) as c, j
              from chunks, lateral (select unnest(range(0, nc)) as j)
            ),
            spans as (
              select doc_id,
                     case when j % 4 = 3 then 'media_ref' else 'text' end as kind,
                     case when j % 4 = 3 then '' else c end as text,
                     case when j % 4 = 3 then concat('http://m.example/', md5(c)) else '' end as media_ref,
                     j as off
              from flat
            )
            select doc_id,
                   cast(count(*) as bigint) as n_spans,
                   cast(sum(case when kind = 'media_ref' then 1 else 0 end) as bigint) as n_media,
                   md5(string_agg(
                     kind || '|' || text || '|' || media_ref || '|' || cast(off as varchar),
                     '' order by off)) as seq_hash
            from spans group by doc_id
        """,
        "dedup_exact": f"""
            select md5({norm_text}) as content_key,
                   min(doc_id) as keeper_id, count(*) as n_copies
            from {_DOCS_WITH_DUPS_SQL} c
            group by 1 having count(*) > 1
        """,
        "dedup_minhash_lsh": minhash_bands_sql,
        "dedup_jaccard": jaccard_sql,
        "dedup_incremental": incremental_sql,
        "dedup_cc_canonical": f"""
            with recursive
            pairs as (select doc_a, doc_b from ({jaccard_sql}) jp),
            edges as (select doc_a as u, doc_b as v from pairs
                      union
                      select doc_b as u, doc_a as v from pairs),
            reach(u, v) as (
              select u, v from edges
              union
              select r.u, e.v from reach r join edges e on r.v = e.u
              where r.u <> e.v
            ),
            comp as (
              select u as doc_id, least(u, min(v)) as keeper_id
              from reach group by u
            )
            select doc_id, keeper_id,
                   cast(count(*) over (partition by keeper_id) as bigint)
                     as cluster_size
            from comp
        """,
        "dedup_cluster_keeper": f"""
            -- same transitive closure; keeper = argmax(length, -id)
            with recursive
            pairs as (select doc_a, doc_b from ({jaccard_sql}) jp),
            edges as (select doc_a as u, doc_b as v from pairs
                      union
                      select doc_b as u, doc_a as v from pairs),
            reach(u, v) as (
              select u, v from edges
              union
              select r.u, e.v from reach r join edges e on r.v = e.u
              where r.u <> e.v
            ),
            comp as (
              select u as doc_id, least(u, min(v)) as component
              from reach group by u
            ),
            lens as (
              select doc_id, cast(length(text) as bigint) as sc
              from {_DOCS_WITH_DUPS_SQL}
            ),
            scored as (
              select c.doc_id, c.component, l.sc
              from comp c join lens l using (doc_id)
            ),
            keep as (
              select component, doc_id as keeper_id from (
                select component, doc_id,
                       row_number() over (partition by component
                                          order by sc desc, doc_id) as rn
                from scored) t where rn = 1
            )
            select s.doc_id, k.keeper_id,
                   cast(count(*) over (partition by s.component) as bigint)
                     as cluster_size
            from scored s join keep k using (component)
        """,
        "dedup_simhash": f"""
            select doc_id, {_simhash_sql('text', SIMHASH_BITS)} as simhash
            from {_DOCS_WITH_DUPS_SQL} c
        """,
        "dedup_substring": f"""
            with corpus as (
              select doc_id,
                     text || case when doc_id % 9 = 0
                                  then ' {_SUBSTR_PASSAGE}' else '' end as text
              from {_DOCS_WITH_DUPS_SQL}),
            grams as (select * from {gram8("corpus", 20)} g),
            dup as (
              select gram
              from (select distinct doc_id, gram from grams)
              group by gram having count(*) > 1),
            per as (
              select doc_id, cast(count(*) as bigint) as n_dup_windows
              from grams join dup using (gram) group by 1),
            base as (
              select doc_id,
                     cast(greatest(
                       len(string_split({norm_text}, ' ')) - 19, 0) as bigint)
                       as n_windows
              from corpus)
            select b.doc_id, b.n_windows,
                   coalesce(p.n_dup_windows, cast(0 as bigint))
                     as n_dup_windows,
                   coalesce(p.n_dup_windows, 0) > 0 as has_dup_span
            from base b left join per p using (doc_id)
        """,
        "dedup_substring_clean": f"""
            -- positional string grams replay the hash-gram cut (equality
            -- semantics are identical; xxhash64 collisions are the only
            -- divergence and none exist at this scale)
            with corpus as (
              select doc_id,
                     text || case when doc_id % 9 = 0
                                  then ' {_SUBSTR_PASSAGE}' else '' end as text
              from {_DOCS_WITH_DUPS_SQL}),
            base as (
              select doc_id, string_split({norm_text}, ' ') as w
              from corpus),
            pg as (
              select doc_id, s.pos as pos, s.gram as gram from (
                select doc_id,
                       unnest(list_transform(
                         range(1, greatest(len(w) - 18, 1)),
                         i -> struct_pack(pos := i, gram :=
                           {" || ' ' || ".join(f"w[i+{j}]" for j in range(20))}
                         ))) as s
                from base)),
            dup as (
              select gram from (select distinct doc_id, gram from pg)
              group by gram having count(*) > 1),
            dps as (
              select doc_id, list(distinct pos) as dps
              from pg join dup using (gram) group by 1),
            cov as (
              select b.doc_id, b.w,
                     coalesce(list_distinct(flatten(list_transform(
                       d.dps, p -> range(p, p + 20)))), []) as covered
              from base b left join dps d using (doc_id)),
            sel as (
              select doc_id,
                     list_where(w, list_transform(range(1, len(w) + 1),
                       i -> not list_contains(covered, i))) as cw,
                     len(w) as n
              from cov)
            select doc_id,
                   coalesce(array_to_string(cw, ' '), '') as clean_text,
                   cast(n as bigint) as n_tokens,
                   cast(n - len(cw) as bigint) as n_removed
            from sel
        """,
        "text_tokens": """
            select doc_id,
                   cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as int) as n_tokens,
                   cast(len(regexp_split_to_array(trim(text), '\\s+')) as int) as n_ws_tokens
            from documents
        """,
        "text_quality": f"""
            select doc_id,
                   round({alpha_ratio}, 6) as alpha_ratio,
                   round({stop_ratio}, 6) as stopword_ratio,
                   round({punct_ratio}, 6) as punct_ratio,
                   {quality_score} as quality
            from documents
        """,
        "text_langid": langid_sql,
        "text_fingerprint": f"""
            select doc_id,
                   {_hash_sql(norm_text)} as fingerprint,
                   {kgram} as kgram_fp
            from documents
        """,
        "text_repetition": f"""
            with base as (
              select doc_id,
                     string_split(
                       text || chr(10) || substr(text, 1, 40) ||
                       case when doc_id % 4 = 0
                            then chr(10) || substr(text, 1, 40)
                            else '' end,
                       chr(10)) as lines,
                     string_split({norm_text}, ' ') as w
              from documents),
            line_stats as (
              select doc_id,
                     len(lines) as n_lines,
                     round((len(lines) - len(list_distinct(lines)))::double
                           / greatest(len(lines), 1), 6) as dup_line_frac,
                     list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i+1]) as bigrams
              from base),
            ex as (
              select doc_id, unnest(bigrams) as gram from line_stats),
            counts as (
              select doc_id, gram, count(*) as c from ex group by 1, 2),
            top as (
              select doc_id, max(c) as top_cnt from counts group by 1)
            select ls.doc_id,
                   cast(ls.n_lines as int) as n_lines,
                   ls.dup_line_frac,
                   round(coalesce(t.top_cnt, 0)::double
                         / greatest(len(ls.bigrams), 1), 6)
                     as top_bigram_frac
            from line_stats ls left join top t using (doc_id)
        """,
        "doc_pack": f"""
            with keyed as (
              select doc_id as id,
                     cast(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bigint)
                       as tok,
                     {_hash_sql("cast(doc_id as varchar)", "pack:")} as h
              from documents),
            b as (select id, tok, h, h % 8 as bucket from keyed),
            c as (select id, bucket, tok,
                         sum(tok) over (partition by bucket
                                        order by h, id) as cum
                  from b)
            select id, bucket,
                   cast(floor((cum - tok) / 512) as bigint) as shard_seq,
                   bucket * 281474976710656
                     + cast(floor((cum - tok) / 512) as bigint) as shard_id
            from c
        """,
        "doc_pack_bpe": f"""
            -- doc_pack's hash-deal layout, budgeted by the SQL replay of
            -- the greedy BPE apply loop (tokenize.bpe_word_tokens_sql)
            with bpe as ({TOK_MOD.bpe_token_count_sql()}),
            keyed as (
              select doc_id as id, n_tokens as tok,
                     {_hash_sql("cast(doc_id as varchar)", "pack:")} as h
              from bpe),
            b as (select id, tok, h, h % 8 as bucket from keyed),
            c as (select id, bucket, tok,
                         sum(tok) over (partition by bucket
                                        order by h, id) as cum
                  from b)
            select id, bucket,
                   cast(floor((cum - tok) / 512) as bigint) as shard_seq,
                   bucket * 281474976710656
                     + cast(floor((cum - tok) / 512) as bigint) as shard_id
            from c
        """,
        "corpus_build_mm": f"""
            -- span synthesis -> gate -> post-gate media dedup (rn=1 ==
            -- drop_dup_media's keeper-or-unique rule) -> cleaned re-cost
            -- -> hash-deal pack
            with spans as ({_SPAN_FLAT_SQL}),
            stats0 as (
              select doc_id,
                     sum(case when kind = 'media_ref' then 1 else 0
                         end)::bigint as n_media,
                     sum(case when kind = 'text' then
                           len(regexp_extract_all(text,
                               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                         else 0 end)::bigint as n_tokens
              from spans group by doc_id),
            kept as (
              select doc_id from stats0
              where n_media between 1 and 3 and n_tokens >= 30
                and n_tokens >= n_media * 10),
            ks as (select s.* from spans s join kept using (doc_id)),
            med as (
              select *, row_number() over
                     (partition by media_ref
                      order by doc_id, "offset") as rn
              from ks where kind = 'media_ref'),
            cleaned as (
              select doc_id, kind, text from ks where kind = 'text'
              union all
              select doc_id, kind, '' as text from med where rn = 1),
            st as (
              select doc_id,
                     sum(case when kind = 'media_ref' then 64
                          else len(regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                         end)::bigint as n_tokens,
                     sum(case when kind = 'media_ref' then 1 else 0
                         end)::bigint as n_media_kept
              from cleaned group by doc_id),
            orig as (
              select doc_id, count(*)::bigint as n_orig
              from ks where kind = 'media_ref' group by doc_id),
            fin as (
              select st.doc_id, st.n_tokens, st.n_media_kept,
                     (orig.n_orig - st.n_media_kept)::bigint
                       as n_media_dropped
              from st join orig using (doc_id)),
            keyed as (
              select doc_id as id, n_tokens, n_media_kept,
                     n_media_dropped, n_tokens as tok,
                     {_hash_sql("cast(doc_id as varchar)", "mmpack:")} as h
              from fin),
            b as (select *, h % 8 as bucket from keyed),
            c as (select *, sum(tok) over (partition by bucket
                                           order by h, id) as cum
                  from b)
            select id as doc_id, n_tokens, n_media_kept, n_media_dropped,
                   bucket,
                   cast(floor((cum - tok) / 512) as bigint) as shard_seq,
                   bucket * 281474976710656
                     + cast(floor((cum - tok) / 512) as bigint) as shard_id
            from c
        """,
        "doc_pack_multimodal": f"""
            with spans as ({_SPAN_FLAT_SQL}),
            costs as (
              select doc_id as id,
                     sum(case when kind = 'media_ref' then 64
                          else len(regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) end
                         )::bigint as tok
              from spans group by 1),
            keyed as (
              select id, tok,
                     {_hash_sql("cast(id as varchar)", "mpack:")} as h
              from costs),
            b as (select id, tok, h, h % 8 as bucket from keyed),
            c as (select id, bucket, tok,
                         sum(tok) over (partition by bucket
                                        order by h, id) as cum
                  from b)
            select id, bucket,
                   cast(floor((cum - tok) / 512) as bigint) as shard_seq,
                   bucket * 281474976710656
                     + cast(floor((cum - tok) / 512) as bigint) as shard_id
            from c
        """,
        "corpus_build": corpus_build_sql,
        "corpus_build_v2": corpus_build_v2_sql,
        "corpus_build_v3": corpus_build_v3_sql,
        "corpus_build_capped": f"""
            with built as ({corpus_build_sql}),
            src as (select doc_id, source, n_chars from documents),
            scored as (
              select b.doc_id, s.source, b.split,
                     cast(round(b.quality * 1e6) as bigint) as score,
                     {_hash_sql("cast(b.doc_id as varchar)", "cap:")} as h
              from built b join src s using (doc_id)),
            ranked as (
              select doc_id, source, split,
                     cast(row_number() over (
                       partition by source
                       order by score desc, h, doc_id) as bigint)
                       as cap_rank
              from scored)
            select doc_id, source, split, cap_rank from ranked
            where cap_rank <= 12
        """,
        "decontaminate": f"""
            with bench as (
              select distinct gram from {gram8("documents")}
              where doc_id % 50 = 0),
            hits as (
              select g.doc_id, count(distinct g.gram) as n_shared
              from {gram8("documents")} g join bench b using (gram)
              where g.doc_id % 50 <> 0
              group by 1),
            train_docs as (
              select doc_id from documents where doc_id % 50 <> 0)
            select d.doc_id,
                   coalesce(h.n_shared, 0) as n_shared,
                   coalesce(h.n_shared, 0) >= 2 as contaminated
            from train_docs d left join hits h using (doc_id)
        """,
        "text_license": f"""
            -- shared LICENSE_CLASSES definition site: the marker array
            -- and the contains-chain CASE both derive from text.py
            with aug as (
              select doc_id,
                     concat(text, ' ', case doc_id % 10
                       {" ".join(f"when {i} then '{m}'" for i, m in enumerate(_LICENSE_MARKERS))}
                       end) as t2
              from documents
            )
            select doc_id, {T.license_detect_sql("t2")} as license
            from aug
        """,
        "text_pii": f"""
            with aug as (
              select doc_id,
                     text
                     || case when doc_id % 3 = 0
                          then ' contact user' || cast(doc_id as varchar)
                               || '@example.com' else '' end
                     || case when doc_id % 5 = 0
                          then ' from 10.' || cast(doc_id % 256 as varchar)
                               || '.0.' || cast((doc_id * 7) % 256 as varchar)
                          else '' end
                     || case when doc_id % 7 = 0
                          then ' call +1 555 0'
                               || cast(doc_id % 100 + 100 as varchar)
                               || ' 23 45' else '' end
                     || case when doc_id % 11 = 0
                          then ' ssn '
                               || lpad(cast(doc_id % 900 + 100 as varchar), 3, '0')
                               || '-'
                               || lpad(cast(doc_id % 89 + 10 as varchar), 2, '0')
                               || '-'
                               || lpad(cast(doc_id % 9000 + 1000 as varchar), 4, '0')
                          else '' end
                     || case when doc_id % 13 = 0
                          then ' card 4111 1111 1111 '
                               || lpad(cast(doc_id % 10000 as varchar), 4, '0')
                          else '' end
                     as t
              from documents)
            select doc_id,
                   len(regexp_extract_all(t, '{T.PII_EMAIL_RE}'))
                     as n_emails,
                   len(regexp_extract_all(t, '{T.PII_IPV4_RE}')) as n_ips,
                   len(regexp_extract_all(t, '{T.PII_PHONE_RE}'))
                     as n_phones,
                   len(regexp_extract_all(t, '{T.PII_SSN_RE}')) as n_ssns,
                   len(regexp_extract_all(t, '{T.PII_CARD_RE}')) as n_cards,
                   md5(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(t,
                       '{T.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{T.PII_IPV4_RE}', '<IP>', 'g'),
                       '{T.PII_PHONE_RE}', '<PHONE>', 'g'),
                       '{T.PII_SSN_RE}', '<SSN>', 'g'),
                       '{T.PII_CARD_RE}', '<CARD>', 'g'))
                     as redacted_md5
            from aug
        """,
        "gopher_gate": _gopher_gate_oracle(),
        "url_blocklist": BL.blocklist_oracle_sql(
            "select 'http://sub' || cast(doc_id % 3 as varchar) || '.site'"
            " || cast(doc_id % 20 as varchar) || '.example/page/'"
            " || cast(doc_id as varchar) as url,"
            " 'sub' || cast(doc_id % 3 as varchar) || '.site'"
            " || cast(doc_id % 20 as varchar) || '.example' as host"
            " from documents",
            _BLOCKLIST_RULES),
        "url_traps": TRM.traps_oracle_sql(
            "select 'site' || cast(doc_id % 5 as varchar) || '.example'"
            " as host,"
            " 'http://site' || cast(doc_id % 5 as varchar) || '.example'"
            " || '/sec-' || substring('abcdefg', doc_id % 7 + 1, 1)"
            " || '/item/' || cast(doc_id as varchar) as url"
            " from documents"
            " union all"
            " select 'site' || cast(doc_id % 5 as varchar) || '.example',"
            " 'http://site' || cast(doc_id % 5 as varchar) || '.example'"
            " || '/cal/20' || cast(doc_id % 24 as varchar)"
            " || '/' || cast(doc_id % 12 + 1 as varchar)"
            " || '/' || cast(doc_id % 28 + 1 as varchar)"
            " || '?sess=' || cast(doc_id as varchar)"
            " || '&page=' || cast(doc_id % 17 as varchar)"
            " from documents where doc_id % 2 = 0",
            threshold=40),
        "c4_clean": C4M.c4_clean_oracle_sql(
            docs_table="(select doc_id, " + _C4_DEMO_TEXT_SQL
            + " as text from documents)"),
        "line_dedup": LD.line_dedup_oracle_sql(
            docs_table="(select doc_id, " + _C4_DEMO_TEXT_SQL
            + " as text from documents)"),
        "anchor_agg": GR.anchor_text_agg_oracle_sql(
            "select 'http://host.example/p/' || cast(doc_id as varchar)"
            "   as page_url,"
            " 'http://t.example/page/' || cast(doc_id % 10 as varchar)"
            "   as resolved_url,"
            " 'read more' as anchor_text from documents"
            " union all"
            " select 'http://host.example/p/' || cast(doc_id as varchar),"
            " 'http://t.example/page/' || cast(doc_id % 10 as varchar),"
            " 'article ' || cast(doc_id % 3 as varchar) from documents"
            " union all"
            " select 'http://host.example/p/' || cast(doc_id as varchar),"
            " 'http://t.example/guide/' || cast(doc_id % 4 as varchar),"
            " 'guide ' || cast(doc_id % 4 as varchar) from documents"),
        "dsir_select": DSIR.dsir_oracle_sql(
            "lang = 'en'", k=100, n_buckets=512, alpha=0.5),
        "lm_score": LM.lm_nll_oracle_sql("doc_id % 2 = 0", alpha=0.5),
        "ppl_bucket": LM.ppl_bucket_oracle_sql("doc_id % 2 = 0", alpha=0.5),
        "tfidf_sparse": VZ.tfidf_sparse_oracle_sql(n_features=16),
        "quality_classifier": CF.classifier_score_oracle_sql(
            n_features=64, threshold_micro=0),
        "media_dedup": """
            with media as (
              select doc_id,
                     'http://m.example/'
                       || md5(cast((doc_id * 3 + j) % 97 as varchar))
                       as media_ref,
                     cast(j as int) as "offset"
              from documents, lateral (select unnest(range(0, 3)) as j)
            ),
            stats as (
              select media_ref, count(*) as n_refs,
                     count(distinct doc_id) as n_docs
              from media group by 1
            ),
            keep as (
              select media_ref, doc_id as keeper_doc_id,
                     "offset" as keeper_offset
              from (select *, row_number() over
                      (partition by media_ref
                       order by doc_id, "offset") as rn
                    from media)
              where rn = 1
            )
            select media_ref, n_refs, n_docs, keeper_doc_id, keeper_offset
            from stats join keep using (media_ref)
            where n_refs >= 2
        """,
        "domain_quality": f"""
            -- planted-PII synthesis -> one rollup -> integer verdicts
            with base as (
              select 'd' || cast(doc_id % 11 as varchar) as domain,
                     case when doc_id % 11 <= 1 and doc_id % 2 = 0
                          then text || ' contact bob@example.com'
                          else text end as text
              from documents
            ),
            agg as (
              select domain,
                     count(*)::bigint as n_docs,
                     sum({q['n_tokens']})::bigint as tokens_sum,
                     sum(round({quality_score} * 1e6)::bigint)::bigint
                       as quality_micro_sum,
                     sum(case when
                           len(regexp_extract_all(text, '{T.PII_EMAIL_RE}'))
                           + len(regexp_extract_all(text, '{T.PII_IPV4_RE}'))
                           + len(regexp_extract_all(text, '{T.PII_PHONE_RE}'))
                           + len(regexp_extract_all(text, '{T.PII_SSN_RE}'))
                           + len(regexp_extract_all(text, '{T.PII_CARD_RE}'))
                           > 0 then 1 else 0 end)::bigint as pii_docs
              from base group by domain
            )
            select domain, n_docs, tokens_sum, quality_micro_sum, pii_docs,
                   case when quality_micro_sum < 736000 * n_docs
                          then 'low_quality'
                        when pii_docs * 4 > n_docs then 'pii_heavy'
                        else '' end as flag_reason,
                   (case when quality_micro_sum < 736000 * n_docs
                           then 'low_quality'
                         when pii_docs * 4 > n_docs then 'pii_heavy'
                         else '' end) <> '' as flagged
            from agg
        """,
        "corpus_stats": f"""
            select lang,
                   count(*)::bigint as n_docs,
                   sum({q['n_tokens']})::bigint as tokens_sum,
                   sum(n_chars)::bigint as chars_sum,
                   sum(round({quality_score} * 1e6)::bigint)::bigint
                     as quality_micro_sum,
                   sum(case when
                         len(regexp_extract_all(text, '{T.PII_EMAIL_RE}'))
                         + len(regexp_extract_all(text, '{T.PII_IPV4_RE}'))
                         + len(regexp_extract_all(text, '{T.PII_PHONE_RE}'))
                         + len(regexp_extract_all(text, '{T.PII_SSN_RE}'))
                         + len(regexp_extract_all(text, '{T.PII_CARD_RE}'))
                         > 0 then 1 else 0 end)::bigint as pii_docs
            from documents group by lang
        """,
        "doc_split": f"""
            select doc_id,
                   cast({_hash_sql("cast(doc_id as varchar)", "split:")} % 100
                        as int) as bucket,
                   case when {_hash_sql("cast(doc_id as varchar)", "split:")}
                             % 100 < 98 then 'train'
                        when {_hash_sql("cast(doc_id as varchar)", "split:")}
                             % 100 < 99 then 'val'
                        else 'test' end as split
            from documents
        """,
        "doc_sample_stratified": f"""
            with keyed as (
              select doc_id, doc_id % 7 as shard,
                     {_hash_sql("cast(doc_id as varchar)", "sample:")} as h
              from documents
            ),
            ranked as (
              select doc_id, shard,
                     cast(row_number() over (partition by shard
                                             order by h % 1024, h) as bigint)
                       as sample_rank,
                     count(*) over (partition by shard) as n
              from keyed
            )
            select doc_id, shard, sample_rank from ranked
            where sample_rank <= cast(ceil(n * 0.2) as bigint)
        """,
        "doc_mixture": f"""
            with keyed as (
              select doc_id, lang,
                     {_hash_sql("cast(doc_id as varchar)", "mix:")} as h
              from documents
            ),
            weights as (
              select lang, count(*) as c,
                     cast(round(pow(count(*), 0.5) * 1e6) as bigint) as w
              from keyed group by lang
            ),
            quota as (
              select lang,
                     least(c, cast(300::hugeint * w //
                                   (select sum(w) from weights)
                                   as bigint)) as quota
              from weights
            ),
            ranked as (
              select doc_id, lang,
                     cast(row_number() over (partition by lang
                                             order by h % 1024, h) as bigint)
                       as mix_rank
              from keyed
            )
            select r.doc_id, r.lang, r.mix_rank, q.quota
            from ranked r join quota q using (lang)
            where r.mix_rank <= q.quota
        """,
        "doc_mixture_epochs": f"""
            with keyed as (
              select doc_id, lang,
                     {_hash_sql("cast(doc_id as varchar)", "mix:")} as h
              from documents
            ),
            weights as (
              select lang, count(*) as c,
                     cast(round(pow(count(*), 0.0) * 1e6) as bigint) as w
              from keyed group by lang
            ),
            reps as (
              select lang, c,
                     cast(1000::hugeint * w // (select sum(w) from weights)
                          as bigint) as target
              from weights
            ),
            ranked as (
              select doc_id, lang,
                     cast(row_number() over (partition by lang
                                             order by h % 1024, h) as bigint)
                       as mix_rank
              from keyed
            )
            select r.doc_id, r.lang, r.mix_rank, copy_idx
            from ranked r
            join reps using (lang)
            cross join lateral (
              select unnest(generate_series(
                0, cast(target // c as bigint)
                   + (case when r.mix_rank <= target % c then 1 else 0 end)
                   - 1)) as copy_idx
            ) cp
            where (target // c)
                  + (case when r.mix_rank <= target % c then 1 else 0 end) > 0
        """,
        "domain_cap": f"""
            -- naive single-window form; the Spark side runs the two-phase
            -- skew-safe top-K, which must produce identical rows
            with keyed as (
              select doc_id,
                     case when doc_id % 2 = 0 then 'hot.example'
                          else source end as domain,
                     n_chars,
                     {_hash_sql("cast(doc_id as varchar)", "cap:")} as h
              from documents
            ),
            ranked as (
              select doc_id, domain,
                     cast(row_number() over (
                       partition by domain
                       order by n_chars desc, h, doc_id) as bigint)
                       as cap_rank
              from keyed
            )
            select doc_id, domain, cap_rank from ranked
            where cap_rank <= 15
        """,
        "bm25_topk": f"""
            -- same integer micro-point BM25 (k1=1.2, b=0.75); naive
            -- window top-k vs Spark's two-phase stripe rank
            with q(query_id, term) as (values {_bm25_values_sql()}),
            qterms as (select distinct query_id, lower(term) as term from q),
            toks as (
              select doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') as t
              from documents
            ),
            dl as (select doc_id, len(t) as dl, t from toks),
            stats as (select count(*) as n, avg(dl) as avgdl from dl),
            tf as (
              select doc_id, term, count(*) as tf, max(dl) as dl
              from (select doc_id, dl, unnest(t) as term from dl)
              where term in (select term from qterms)
              group by doc_id, term
            ),
            dft as (select term, count(*) as df from tf group by term),
            contrib as (
              select t.doc_id, t.term,
                     cast(round(1e6
                       * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                       * (t.tf * 2.2)
                         / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / s.avgdl))
                     ) as bigint) as c
              from tf t join dft d using (term) cross join stats s
            ),
            scored as (
              select qt.query_id, c.doc_id, sum(c.c) as score_micro
              from contrib c join qterms qt using (term)
              group by 1, 2
            )
            select query_id, doc_id, score_micro, rank from (
              select query_id, doc_id, score_micro,
                     cast(row_number() over (
                       partition by query_id
                       order by score_micro desc, doc_id) as bigint) as rank
              from scored
            ) where rank <= 10
        """,
        "length_quantiles": """
            with counts as (
              select cast(n_chars as bigint) as v, count(*) as c
              from documents group by 1
            ),
            cum as (
              select v, sum(c) over (order by v
                rows between unbounded preceding and current row) as cum
              from counts
            ),
            t as (select count(*) as n from documents),
            qs(q) as (values (0.1), (0.25), (0.5), (0.75), (0.9), (0.99))
            select cast(q as double) as q, min(v) as value
            from cum, t, qs
            where cum >= cast(ceil(q * n) as bigint)
            group by q
        """,
        "vocab_topk": """
            with terms as (
              select doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       as term
              from documents
            ),
            counts as (
              select term, count(*) as freq,
                     count(distinct doc_id) as doc_freq
              from terms group by term
            )
            select term, freq, doc_freq, rank from (
              select term, freq, doc_freq,
                     cast(row_number() over (
                       order by freq desc, term) as bigint) as rank
              from counts
            ) where rank <= 25
        """,
        "dedup_embedding": """
            -- ground truth: exact all-pairs at the threshold. The Spark
            -- side prunes with banded hyperplane LSH; matching this hash
            -- verifies the LSH found every qualifying pair (recall 1).
            with corpus as (
              select vec_id, embedding from embeddings
              union all
              select vec_id + 1000000 as vec_id, embedding
              from embeddings where vec_id % 25 = 0
            ),
            v as (select vec_id as vid, embedding::DOUBLE[] as v from corpus)
            select l.vid as id_a, r.vid as id_b,
                   round(list_cosine_similarity(l.v, r.v), 4) as cosine
            from v l join v r on l.vid < r.vid
            where list_cosine_similarity(l.v, r.v) >= 0.999
        """,
        "dedup_semantic": """
            -- full SemDeDup recomputation: seed codebook (16 smallest
            -- vec_ids), nearest-cell assignment, within-cell pairwise
            -- prune at round(cos,6) >= 0.999, greedy min-id keeper —
            -- value-checks the clustering mechanics AND the prune rule
            with corpus as (
              select vec_id, embedding from embeddings
              union all
              select vec_id + 1000000 as vec_id, embedding
              from embeddings where vec_id % 25 = 0
            ),
            v as (select vec_id as vid, embedding::DOUBLE[] as v from corpus),
            cent as (
              select row_number() over (order by vid) as list_id,
                     v as centroid
              from (select vid, v from v order by vid limit 16)
            ),
            member as (
              select vid, v, list_id from (
                select v.vid, v.v, t.list_id,
                       row_number() over (partition by v.vid
                          order by list_cosine_similarity(v.v, t.centroid)
                                   desc, t.list_id asc) as rn
                from v, cent t) where rn = 1
            ),
            dup as (
              select b.vid as vid, min(a.vid) as dup_of
              from member a join member b
                on a.list_id = b.list_id and a.vid < b.vid
              where round(list_cosine_similarity(a.v, b.v), 6) >= 0.999
              group by b.vid
            )
            select m.vid as vec_id, cast(m.list_id as int) as list_id,
                   coalesce(d.dup_of, -1) as dup_of,
                   cast(d.dup_of is null as int) as kept
            from member m left join dup d on m.vid = d.vid
        """,
        "ann_cosine_topk": f"""
            with q as (
              select vec_id as query_id, embedding::DOUBLE[] as qv
              from embeddings where vec_id % 100 = 0
            ),
            scored as (
              select q.query_id, e.vec_id as neighbor_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.qv) as cos
              from embeddings e, q
            ),
            ranked as (
              select query_id, neighbor_id, cos,
                     row_number() over (partition by query_id
                                        order by cos desc, neighbor_id asc) as rank
              from scored
            )
            select query_id, neighbor_id, cast(rank as int) as rank,
                   round(cos, 4) as cosine
            from ranked where rank <= {TOPK}
        """,
        "ann_lsh_topk": f"""
            -- exact top-k over the planted near-dup corpus; valid as an
            -- oracle for the LSH query because its realized recall on this
            -- data is exactly 1 (q_ann_lsh_topk docstring)
            with corpus as ({_ANN_CORPUS_SQL}),
            q as (
              select vec_id as query_id, v as qv from corpus
              where vec_id % 100 = 0 and vec_id < 2000000
            ),
            scored as (
              select q.query_id, c.vec_id as neighbor_id,
                     list_cosine_similarity(c.v, q.qv) as cos
              from corpus c, q
            ),
            ranked as (
              select query_id, neighbor_id, cos,
                     row_number() over (partition by query_id
                                        order by cos desc, neighbor_id asc) as rank
              from scored
            )
            select query_id, neighbor_id, cast(rank as int) as rank
            from ranked where rank <= {TOPK}
        """,
        "kmeans_train": (
            "select list_id, array_to_string(centroid_micro, ',')"
            " as centroid_micro from ("
            + S.kmeans_oracle_sql(n_lists=8, iters=2, dim=64) + ")"),
        "bpe_train": TOK_MOD.bpe_train_oracle_sql(12),
        "link_spam": f"""
            with base as (
              select src, dst from {G.edges_sql(500)} e
            ),
            farm as (
              select doc_id as src,
                     (doc_id * 7 + j * 13 + 1) % 500 as dst
              from documents,
                   unnest(generate_series(0, 29)) as t(j)
              where doc_id % 37 = 0
            ),
            edges as (
              select src, dst,
                     'site' || cast(src % 20 as varchar) as src_host,
                     'site' || cast(dst % 20 as varchar) as dst_host
              from (select * from base union all select * from farm)
            )
            {GRF_MOD.link_spam_oracle_sql('edges')}
        """,
        "jsonl_export_packed": f"""
            -- doc_pack twin -> shard label -> writer-reader identity
            with keyed as (
              select doc_id as id,
                     cast(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bigint)
                       as tok,
                     {_hash_sql("cast(doc_id as varchar)", "pack:")} as h
              from documents),
            b as (select id, tok, h, h % 8 as bucket from keyed),
            c as (select id, bucket, tok,
                         sum(tok) over (partition by bucket
                                        order by h, id) as cum
                  from b),
            shards as (
              select id,
                     'sh' || cast(bucket * 281474976710656
                       + cast(floor((cum - tok) / 512) as bigint)
                       as varchar) as shard
              from c),
            j as (
              select s.shard, cast(d.doc_id as varchar) as doc_id, d.text
              from shards s join documents d on d.doc_id = s.id)
            select shard,
                   cast(row_number() over
                        (partition by shard order by doc_id) - 1
                        as bigint) as line_no,
                   doc_id, text, cast(null as varchar) as meta
            from j
        """,
        "revalidate_plan": f"""
            with h as (
              select 'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/d/' || cast(doc_id as varchar) as url,
                     cast(j * 100 + doc_id % 7 as bigint) as fetch_ts,
                     case when doc_id % 3 <> 0
                          then 'W/"' || v || '"' end as etag,
                     case when doc_id % 3 = 0 and doc_id % 5 <> 0
                          then 'LM-' || v end as last_modified,
                     'dg' || v as digest
              from (
                select doc_id, j,
                       cast(case when doc_id % 5 = 0 then 0
                            else j // (doc_id % 3 + 1) end as varchar) as v
                from (select doc_id,
                             unnest(generate_series(0,
                                 cast(doc_id % 4 + 2 as bigint))) as j
                      from documents)
              )
            ),
            plan as ({REVAL.plan_sql('h')}),
            f as (
              select 'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/d/' || cast(doc_id as varchar) as url,
                     case when doc_id % 2 = 0 then 'dgNEW'
                          else 'dg' || cast(case when doc_id % 5 = 0 then 0
                               else (doc_id % 4 + 2) // (doc_id % 3 + 1)
                               end as varchar) end as digest,
                     cast(100 + doc_id % 50 as bigint) as length
              from documents
            )
            select plan.url, cond_type,
                   cast(case when cond_type <> 'unconditional'
                             and prior_digest is not null
                             and f.digest = prior_digest
                        then 304 else 200 end as bigint) as status,
                   cast(case when cond_type <> 'unconditional'
                             and prior_digest is not null
                             and f.digest = prior_digest
                        then f.length else 0 end as bigint) as saved_bytes,
                   f.digest <> prior_digest as changed
            from plan join f on plan.url = f.url
        """,
        "corpus_build_v4": f"""
            -- the four SQL twins chained: boilerplate -> normalize ->
            -- PII gate -> keeper -> split
            with mc as ({BP_MOD.main_content_oracle_sql(_V4_HTML_SQL)}),
            cl as (
              select doc_id,
                     {NM_MOD.clean_text_sql('main_text')} as clean
              from mc
            ),
            gated as (
              select * from cl
              where len(regexp_extract_all(clean,
                        '{T.PII_EMAIL_RE}', 0)) = 0
            ),
            keep as (
              select md5(clean) as content_md5,
                     min(doc_id) as doc_id,
                     cast(count(*) as bigint) as n_dups
              from gated group by md5(clean)
            )
            select doc_id, content_md5, n_dups,
                   cast({_hash_sql("cast(doc_id as varchar)", "split:")}
                        % 100 as int) as bucket,
                   case when {_hash_sql("cast(doc_id as varchar)",
                                        "split:")} % 100 < 98 then 'train'
                        when {_hash_sql("cast(doc_id as varchar)",
                                        "split:")} % 100 < 99 then 'val'
                        else 'test' end as split
            from keep
        """,
        "warc_cdx": f"""
            -- archive->index composition oracle: same synthesis, surt +
            -- lag + rank twins, no WARC bytes involved
            with hist as (
              select 'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/d/' || cast(doc_id as varchar) as url,
                     cast(1700000000 + j * 100 + doc_id % 7 as bigint)
                       as fetch_ts,
                     cast(200 as bigint) as status,
                     md5(body) as digest,
                     cast(strlen(body) as bigint) as length
              from (
                select doc_id, j,
                       'body v' || cast(case when doc_id % 5 = 0 then 0
                            else j // (doc_id % 3 + 1) end as varchar)
                         || ' of ' || cast(doc_id as varchar) as body
                from (select doc_id,
                             unnest(generate_series(0,
                                 cast(doc_id % 4 + 2 as bigint))) as j
                      from documents)
              )
            ),
            surted as (
              select *, {CDX.surt_sql('url')} as surt from hist
            ),
            lagged as (
              select *, lag(digest) over
                       (partition by url order by fetch_ts) as prev
              from surted
            )
            select url, fetch_ts, status, digest, length, surt,
                   case when prev is not null and prev = digest
                        then 'revisit' else 'response' end as record_type,
                   cast(case when prev is not null and prev = digest
                        then length else 0 end as bigint) as saved_bytes,
                   cast(row_number() over (order by surt, fetch_ts)
                        as bigint) as idx_rank
            from lagged
        """,
        "jsonl_export": """
            -- writer-reader identity: ordinal by string-sorted id within
            -- shard; meta reserialized with sorted keys and ', '/': '
            -- separators (json.dumps defaults)
            select 's' || cast(doc_id % 6 as varchar) as shard,
                   cast(row_number() over
                        (partition by doc_id % 6
                         order by cast(doc_id as varchar)) - 1
                        as bigint) as line_no,
                   cast(doc_id as varchar) as doc_id,
                   text,
                   '{"lang": "' || lang || '", "source": "' || source
                     || '"}' as meta
            from documents
        """,
        "url_strip_tracking": (
            "with u as (select doc_id, 'http://site' || "
            "cast(doc_id % 20 as varchar) || '.example/p/' || "
            "cast(doc_id as varchar) || case "
            "when doc_id % 4 = 0 then '?utm_source=news&utm_medium=email"
            "&id=' || cast(doc_id as varchar) "
            "when doc_id % 4 = 1 then '?id=' || cast(doc_id as varchar)"
            " || '&fbclid=abc' || cast(doc_id as varchar) "
            "when doc_id % 4 = 2 then '?gclid=x&utm_campaign=c' "
            "else '' end as url from documents) "
            "select doc_id, url, " + URLS_MOD.strip_tracking_sql("url")
            + " as folded, " + URLS_MOD.strip_tracking_sql("url")
            + " <> url as changed from u"),
        "text_normalize": (
            "select doc_id, " + NM_MOD.clean_text_sql(_TN_DIRTY_SQL)
            + " as clean, length(" + _TN_DIRTY_SQL + ") - length("
            + NM_MOD.clean_text_sql(_TN_DIRTY_SQL)
            + ") as removed from documents"),
        "span_attributes": AT_MOD.paragraph_attributes_oracle_sql(
            "substr(text, 1, 120) || chr(10) || chr(10)"
            " || substr(text, 121, 160) || chr(10) || chr(10)"
            " || 'Reach us at ops' || cast(doc_id % 50 as varchar)"
            " || '@example.org or +1 (555) 010-'"
            " || lpad(cast(doc_id % 10000 as varchar), 4, '0')"
            " || ' now.'"),
        "extract_main_text": BP_MOD.main_content_oracle_sql(
            "'<html><body>" + _MAIN_TEXT_NAV.replace("'", "''")
            + "<p>' || substr(text, 1, 180) || '</p><p>'"
            " || substr(text, 181, 180) || '</p>"
            + _MAIN_TEXT_TAIL.replace("'", "''") + "'"),
        "ann_ivf_topk": f"""
            -- full IVF recomputation (not an exact-top-k fallback): seed
            -- codebook = 16 smallest vec_ids, nearest-cell assignment,
            -- 2-probe candidate generation, exact re-rank — value-checks
            -- the index mechanics themselves (q_ann_ivf_topk docstring)
            with corpus as ({_ANN_CORPUS_SQL}),
            cent as (
              select row_number() over (order by vec_id) as list_id,
                     v as centroid
              from (select vec_id, v from corpus order by vec_id limit 16)
            ),
            cassign as (
              select vec_id as neighbor_id, list_id from (
                select c.vec_id, t.list_id,
                       row_number() over (partition by c.vec_id
                          order by list_cosine_similarity(c.v, t.centroid)
                                   desc, t.list_id asc) as rn
                from corpus c, cent t) where rn = 1
            ),
            q as (
              select vec_id as query_id, v as qv from corpus
              where vec_id % 100 = 0 and vec_id < 2000000
            ),
            qprobe as (
              select query_id, list_id from (
                select q.query_id, t.list_id,
                       row_number() over (partition by q.query_id
                          order by list_cosine_similarity(q.qv, t.centroid)
                                   desc, t.list_id asc) as rn
                from q, cent t) where rn <= 2
            ),
            cand as (
              select distinct query_id, neighbor_id
              from qprobe join cassign using (list_id)
            ),
            scored as (
              select cand.query_id, cand.neighbor_id,
                     list_cosine_similarity(c.v, q.qv) as cos
              from cand
              join corpus c on c.vec_id = cand.neighbor_id
              join q on q.query_id = cand.query_id
            ),
            ranked as (
              select query_id, neighbor_id,
                     row_number() over (partition by query_id
                        order by cos desc, neighbor_id asc) as rank
              from scored
            )
            select query_id, neighbor_id, cast(rank as int) as rank
            from ranked where rank <= {TOPK}
        """,
        "ann_ivf_topk_arrow": f"""
            -- full IVF recomputation (not an exact-top-k fallback): seed
            -- codebook = 16 smallest vec_ids, nearest-cell assignment,
            -- 2-probe candidate generation, exact re-rank — value-checks
            -- the index mechanics themselves (q_ann_ivf_topk docstring)
            with corpus as ({_ANN_CORPUS_SQL}),
            cent as (
              select row_number() over (order by vec_id) as list_id,
                     v as centroid
              from (select vec_id, v from corpus order by vec_id limit 16)
            ),
            cassign as (
              select vec_id as neighbor_id, list_id from (
                select c.vec_id, t.list_id,
                       row_number() over (partition by c.vec_id
                          order by list_cosine_similarity(c.v, t.centroid)
                                   desc, t.list_id asc) as rn
                from corpus c, cent t) where rn = 1
            ),
            q as (
              select vec_id as query_id, v as qv from corpus
              where vec_id % 100 = 0 and vec_id < 2000000
            ),
            qprobe as (
              select query_id, list_id from (
                select q.query_id, t.list_id,
                       row_number() over (partition by q.query_id
                          order by list_cosine_similarity(q.qv, t.centroid)
                                   desc, t.list_id asc) as rn
                from q, cent t) where rn <= 2
            ),
            cand as (
              select distinct query_id, neighbor_id
              from qprobe join cassign using (list_id)
            ),
            scored as (
              select cand.query_id, cand.neighbor_id,
                     list_cosine_similarity(c.v, q.qv) as cos
              from cand
              join corpus c on c.vec_id = cand.neighbor_id
              join q on q.query_id = cand.query_id
            ),
            ranked as (
              select query_id, neighbor_id,
                     row_number() over (partition by query_id
                        order by cos desc, neighbor_id asc) as rank
              from scored
            )
            select query_id, neighbor_id, cast(rank as int) as rank
            from ranked where rank <= {TOPK}
        """,
        "url_surt": f"""
            -- messy-URL derivation + the shared SURT twin (cdx.surt_sql —
            -- ONE definition site with the Spark Column builder)
            with u as (
              select doc_id,
                (case when doc_id % 2 = 0 then 'http://'
                      else 'https://' end)
                || (case when doc_id % 11 = 0 then 'user:pw@' else '' end)
                || (case when doc_id % 3 = 0 then 'WWW.' else '' end)
                || 'Site' || cast(doc_id % 20 as varchar) || '.Example'
                || (case when doc_id % 5 = 0 then ':80'
                         when doc_id % 7 = 0 then ':8080' else '' end)
                || (case when doc_id % 13 = 0 then ''
                    else '/Page/' || cast(doc_id as varchar) end)
                || (case when doc_id % 2 = 1
                    then '?b=' || cast(doc_id % 4 as varchar)
                         || '&a=' || cast(doc_id % 6 as varchar)
                    else '' end)
                || (case when doc_id % 3 = 1 then '#Sec' else '' end)
                as url
              from documents
            )
            select doc_id, url, {CDX.surt_sql('url')} as surt from u
        """,
        "cdx_index": f"""
            -- fetch history -> SURT -> lag-digest revisit classification ->
            -- global (surt, ts) ordinal
            with hist as ({_CDX_HIST_SQL}),
            surted as (
              select *, {CDX.surt_sql('url')} as surt from hist
            ),
            lagged as (
              select *, lag(digest) over
                       (partition by url order by fetch_ts) as prev
              from surted
            )
            select url, fetch_ts, status, digest, length, surt,
                   case when prev is not null and prev = digest
                        then 'revisit' else 'response' end as record_type,
                   cast(case when prev is not null and prev = digest
                        then length else 0 end as bigint) as saved_bytes,
                   cast(row_number() over (order by surt, fetch_ts)
                        as bigint) as idx_rank
            from lagged
        """,
        "crawl_budget": """
            -- largest-remainder (Hamilton) apportionment: floor quotas +
            -- leftover units by remainder desc, host asc
            with hosts as (
              select 'site' || cast(doc_id % 40 as varchar) || '.example'
                       as host,
                     cast(sum(length(text)) as bigint) as score
              from documents group by 1
            ),
            tot as (select sum(score) as t from hosts),
            q as (
              select host, score,
                     (997 * score) // t as quota,
                     (997 * score) % t as remainder
              from hosts, tot
            ),
            lft as (select 997 - sum(quota) as l from q),
            r as (
              select *, row_number() over
                       (order by remainder desc, host) as rk
              from q
            )
            select host, score, cast(quota as bigint) as quota,
                   cast(remainder as bigint) as remainder,
                   cast(quota + case when rk <= (select l from lft)
                                then 1 else 0 end as bigint) as granted
            from r
        """,
        "warc_roundtrip": """
            -- recompute every WARC header field straight from the source
            -- rows: a hash match proves the archive writer and the
            -- Content-Length-driven parser are exact inverses
            with caps as (
              select 'http://site' || cast(doc_id % 20 as varchar)
                       || '.example/d/' || cast(doc_id as varchar) as url,
                     1700000000 + doc_id as fetch_ts,
                     case when doc_id % 7 = 3 then 404
                          when doc_id % 7 = 5 then 301
                          else 200 end as status,
                     'text/html; charset=utf-8' as content_type,
                     case when doc_id % 17 = 0
                          then 'WARC/1.0' || chr(13) || chr(10)
                               || 'WARC-Type: response'
                               || chr(13) || chr(10) || chr(13) || chr(10)
                               || substr(text, 1, 160)
                          else substr(text, 1, 200) end as body,
                     's' || cast(doc_id % 8 as varchar) as shard
              from documents
            ),
            blocks as (
              select *,
                'HTTP/1.1 ' || cast(status as varchar) || ' '
                  || case status when 200 then 'OK'
                          when 301 then 'Moved Permanently'
                          when 404 then 'Not Found' end
                  || chr(13) || chr(10)
                  || 'Content-Type: ' || content_type
                  || chr(13) || chr(10)
                  || 'Content-Length: ' || cast(strlen(body) as varchar)
                  || chr(13) || chr(10) || chr(13) || chr(10)
                  || body as http_block
              from caps
            )
            select shard,
                   cast(row_number() over
                        (partition by shard order by fetch_ts)
                        as bigint) as rec_index,
                   '<urn:md5:'
                     || md5(url || '|' || cast(fetch_ts as varchar))
                     || '>' as record_id,
                   url as target_uri,
                   strftime(make_timestamp(fetch_ts * 1000000),
                            '%Y-%m-%dT%H:%M:%SZ') as warc_date,
                   'md5:' || md5(body) as payload_digest,
                   cast(strlen(http_block) as bigint) as content_length,
                   cast(status as bigint) as http_status,
                   content_type,
                   body as payload
            from blocks
        """,
        "events_windowed": """
            select strftime(time_bucket(interval '1 hour', ts), '%Y-%m-%d %H:%M:%S') as window_start,
                   event_type, count(*) as n, round(sum(value), 4) as total_value
            from events
            group by 1, 2
        """,
        "media_features": """
            -- replays the whole media decode path in SQL: the stub decoder
            -- is sha256(media_bytes) -> LE uint32 words -> /uint32_max ->
            -- float32, and media_bytes is the ASCII hex of sha256(media_id),
            -- so sha256(sha256(id)) + hex math reproduces it bit-exactly
            with ids as (
              select distinct 'http://m.example/img'
                     || cast(doc_id % 40 as varchar) || '.png' as media_id
              from documents
              union
              select distinct 'http://m.example/vid'
                     || cast(doc_id % 15 as varchar) || '.mp4'
              from documents
            ),
            m as (
              select media_id,
                     case when regexp_matches(media_id, '\\.(mp4|webm)($|\\?)')
                            then 'video'
                          when regexp_matches(media_id, '\\.(mp3|wav|ogg)($|\\?)')
                            then 'audio'
                          else 'image' end as kind,
                     sha256(sha256(media_id)) as dg
              from ids
            ),
            dims as (select unnest(range(0, 8)) as dim)
            select m.media_id, m.kind, cast(dim as int) as dim,
                   cast(floor(cast(cast(
                       ('0x' || substr(dg, 8*dim+1, 2))::bigint
                     + ('0x' || substr(dg, 8*dim+3, 2))::bigint * 256
                     + ('0x' || substr(dg, 8*dim+5, 2))::bigint * 65536
                     + ('0x' || substr(dg, 8*dim+7, 2))::bigint * 16777216
                   as double) / 4294967295.0 as real)::double * 1e9) as bigint)
                   as qval
            from m cross join dims
        """,
    }
