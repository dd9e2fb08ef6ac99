"""Approximate-nearest-neighbor search over embedding columns.

* `cosine_topk` — brute-force exact top-k (the baseline & the oracle-checked
  query): broadcast the query set, one pass over the corpus, per-query window
  rank. Exact, O(corpus x queries), fully JVM-side.
* `lsh_topk` — a scale path: sign-sketch (random-hyperplane) bucketing via
  a vectorized Arrow UDF (numpy matmul per batch), candidate generation by
  bucket join with multi-probe, exact re-rank inside candidates. At 10^10
  vectors the bucket join replaces the full cross product.
* `ivf_topk` — the other scale path: an inverted-file index (deterministic
  seed codebook + optional DataFrame-native Lloyd refinement), nearest-cell
  assignment by broadcast argmax, nprobe-cell candidate generation, exact
  re-rank. Gives a tunable candidate budget (~nprobe/n_lists of the corpus)
  where LSH's budget depends on bucket balance; full probe provably equals
  brute force.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkinator_spark.functions.dedup import cosine_similarity


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", gear: str = "arrow",
) -> DataFrame:
    """Exact top-k by cosine for every query vector. queries is small ->
    broadcast; ties broken by corpus id for determinism.

    `gear` picks the candidate-generation path; both produce IDENTICAL
    results because the FINAL scoring/ranking always runs the same JVM
    `cosine_similarity` expression + window over the same rows:

    * "sql"   — the original brute force: broadcast-nested-loop corpus x
      queries with the interpreted zip_with/aggregate cosine on every
      pair. O(n*q*dim) interpreted Catalyst evaluation — the 60s leg of
      the sf1.0 bench.
    * "arrow" (default) — GEMM prune + exact re-rank: one numpy matmul
      per Arrow batch scores all queries against the batch (normalized
      dot == cosine up to accumulation order, |err| ~1e-14), each task
      keeps a running top-(k+16) per query, and ONLY those candidates
      (tasks * q * (k+16) id rows, never vectors) are shuffled. The
      exact JVM cosine then re-scores the pruned candidate set and the
      original window ranks it — bit-identical output to the "sql" gear
      as long as the true top-k survive the prune, which the +16 pad
      guarantees up to a 17-way tie within ~1e-13 of the k-th score
      (impossible on real-valued embeddings; exact-duplicate ties at
      the SAME score are ordered by the final exact window anyway, so
      only >16 duplicates of one boundary vector could differ).
      Per guide §4.2/§8: decide with small rows (ids + approx score),
      move/score heavy vectors only for the ~q*(k+16) survivors.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    if gear not in ("arrow", "sql"):
        raise ValueError(f"unknown gear {gear!r}")
    if gear == "arrow":
        cand = _gemm_topk_candidates(
            corpus, queries, k + 16, id_col, vec_col, query_id_col)
        if cand is not None:
            # global prune to k+16 per query by the approx score, then
            # re-attach vectors for the survivors only (broadcast the id
            # pairs — the corpus is never shuffled)
            wp = Window.partitionBy("query_id").orderBy(
                F.desc("apx"), F.asc("neighbor_id"))
            top = (cand.withColumn("pr", F.row_number().over(wp))
                   .filter(F.col("pr") <= k + 16)
                   .select("query_id", "neighbor_id"))
            scored = c.join(F.broadcast(top), "neighbor_id").join(
                F.broadcast(q), "query_id").select(
                "query_id", "neighbor_id",
                cosine_similarity(F.col("cv"), F.col("qv")).alias("cos"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("cos"), F.asc("neighbor_id"))
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id",
                        F.round("cos", 6).alias("cosine"), "rank")
            )
    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id",
        cosine_similarity(F.col("cv"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


def _gemm_topk_candidates(
    corpus: DataFrame, queries: DataFrame, kpad: int,
    id_col: str, vec_col: str, query_id_col: str,
):
    """(query_id, neighbor_id, apx) — a per-task running top-`kpad` per
    query by normalized-dot GEMM score. Returns None when the query set
    is empty (caller falls back to the brute-force gear, which yields
    the correct empty result). The query matrix is collected to the
    driver (the function's contract is a broadcastable query side — same
    bounded-dimension read as the IVF codebook) and shipped in the task
    closure; the corpus crosses the Python boundary once as Arrow
    batches and only candidate IDS are ever emitted or shuffled."""
    int_types = ("tinyint", "smallint", "int", "bigint")
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = corpus.schema[id_col].dataType.simpleString()
    if qid_type not in int_types or id_type not in int_types:
        return None  # numpy id buffers are int64; exotic ids take the sql gear
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        return None
    Q = np.array([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Qn = (Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)).T
    nq = len(qids)
    # cap the transient score matrix at ~32 MB per chunk
    chunk = max(64, 4_000_000 // nq)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best_s = None
        best_id = None

        def merge(cs, cid):
            nonlocal best_s, best_id
            if best_s is None:
                best_s, best_id = cs, cid
            else:
                best_s = np.vstack([best_s, cs])
                best_id = np.vstack([best_id, cid])
            if best_s.shape[0] > kpad:
                sel = np.argpartition(-best_s, kpad - 1, axis=0)[:kpad]
                best_s = np.take_along_axis(best_s, sel, axis=0)
                best_id = np.take_along_axis(best_id, sel, axis=0)

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids_all = pdf["vid"].to_numpy(np.int64)
            for lo in range(0, n, chunk):
                part = pdf["v"].iloc[lo:lo + chunk]
                M = np.stack(part.map(
                    lambda v: np.asarray(v, dtype=np.float64)))
                Mn = M / np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                S = Mn @ Qn  # (rows, nq)
                rows = S.shape[0]
                ids = ids_all[lo:lo + chunk]
                if rows > kpad:
                    idx = np.argpartition(-S, kpad - 1, axis=0)[:kpad]
                    cs = np.take_along_axis(S, idx, axis=0)
                    cid = ids[idx]
                else:
                    cs, cid = S, np.broadcast_to(
                        ids[:, None], S.shape).copy()
                merge(cs, cid)
        if best_s is not None:
            rows = best_s.shape[0]
            yield pd.DataFrame({
                "query_id": np.tile(qids, rows),
                "neighbor_id": best_id.ravel(),
                "apx": best_s.ravel(),
            })

    vecs = corpus.select(F.col(id_col).alias("vid"),
                         F.col(vec_col).alias("v"))
    # a small parquet input arrives as 1-2 scan partitions, which would
    # pin the whole GEMM onto 1-2 tasks; spread it across the cores
    # (tiny shuffle of (id, vec) rows — the decision pass, not the
    # payload pass)
    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    vecs = vecs.repartition(n_parts)
    return vecs.mapInPandas(
        fn, f"query_id {qid_type}, neighbor_id {id_type}, apx double")


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def sign_buckets(
    df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) via random-hyperplane signs — one numpy matmul per Arrow
    batch (vectorized, no per-row Python)."""
    planes = _planes(dim, n_planes, seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vid": [], "bucket": []})
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            signs = (mat @ planes) > 0
            bucket = signs @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame({"vid": pdf[id_col].values, "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(fn, "vid long, bucket long")


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_planes: int = 10, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", multiprobe: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: `n_tables` independent sign-sketch hash tables (one shared
    matmul computes all of them), candidates = union over tables of
    same-bucket rows (+multi-probe: flip each of the lowest `multiprobe`
    bits), exact cosine re-rank within candidates.

    Accuracy contract: recall@k vs `cosine_topk` depends on how similar the
    true neighbors are — near 1.0 for near-duplicate retrieval (neighbor
    cosine >= ~0.95, the 100-TB dedup/retrieval case; per-neighbor miss prob
    is (1 - p^R)^L with p = 1 - arccos(c)/pi), but low when true neighbors
    are weakly similar (random-vector corpora, where no sublinear method
    helps). bench.py measures recall@k and candidate fraction vs the exact
    baseline; tests/test_text_dedup.py asserts >= 0.9 on a planted
    near-dup task, and the ann_lsh_topk driver oracle value-checks the
    planted-retrieval configuration against exact SQL top-k."""
    from linkinator_spark.functions.dedup import hyperplane_band_buckets

    cb = hyperplane_band_buckets(
        corpus, dim, n_tables, n_planes, seed, id_col, vec_col)
    qb = hyperplane_band_buckets(
        queries, dim, n_tables, n_planes, seed, query_id_col, vec_col)
    probes = [F.col("band_hash")] + [
        F.col("band_hash").bitwiseXOR(F.lit(1 << i)) for i in range(multiprobe)
    ]
    qb = qb.select(
        "vid", "band_id", F.explode(F.array(*probes)).alias("band_hash"))

    cand = cb.alias("c").join(
        qb.alias("q"),
        (F.col("c.band_id") == F.col("q.band_id"))
        & (F.col("c.band_hash") == F.col("q.band_hash")),
    ).select(
        F.col("q.vid").alias("query_id"), F.col("c.vid").alias("neighbor_id")
    ).distinct()

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id",
        cosine_similarity(F.col("cv"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


# --------------------------------------------------------------------- IVF
# The inverted-file (coarse-quantizer) scale path: partition the corpus
# into n_lists Voronoi cells around a small codebook, probe only the
# nprobe cells nearest each query, re-rank exactly inside the candidates.
# Complements lsh_topk: IVF gives a *tunable candidate budget* (nprobe/
# n_lists of the corpus on average) where LSH's budget is a function of
# the data's bucket balance. At 10^10 vectors the assignment is one
# broadcast-join + map-side-combined argmax (no corpus-sized shuffle key
# other than the uniform vid), and the probe join fans each query out to
# nprobe cells only.


def ivf_centroids(
    corpus: DataFrame, n_lists: int = 16, iters: int = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(list_id, centroid:array<double>) codebook.

    Seeds are the `n_lists` corpus vectors with the smallest ids —
    deterministic and reproducible in plain SQL (the driver oracle
    recomputes them), via a TakeOrdered top-K, never a full sort. `iters`
    Lloyd rounds refine the codebook DataFrame-natively: broadcast
    assign + posexplode + per-(list, dim) mean — k-means without any
    driver-side loop over rows. Refined codebooks are NOT oracle-checked
    (group-sum accumulation order makes the last ulp engine-specific);
    the oracle query pins iters=0.
    """
    seeds = corpus.orderBy(id_col).limit(n_lists)
    w = Window.orderBy(id_col)
    cents = seeds.select(
        F.row_number().over(w).alias("list_id"),
        F.col(vec_col).cast("array<double>").alias("centroid"),
    )
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    for _ in range(iters):
        assign = _nearest_lists(vecs, cents, 1).select("vid", "list_id")
        cents = (
            vecs.join(assign, "vid")
            .select("list_id", F.posexplode("v").alias("dim", "x"))
            .groupBy("list_id", "dim").agg(F.avg("x").alias("x"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "x"))).alias("s"))
            .select("list_id",
                    F.transform("s", lambda e: e["x"]).alias("centroid"))
        )
        cents = cents.localCheckpoint(eager=True)  # cut the iteration lineage
    return cents


def _nearest_lists(vecs: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """(vid, list_id, cos) of each vector's `nprobe` nearest centroids.
    Broadcast the codebook; nprobe=1 aggregates with a map-side-combined
    max_by (no per-vid shuffle group survives un-combined), the window
    rank form only runs for the (small) query side."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    # the interpreted per-element cosine must not run on 1-2 raw scan
    # partitions (no-op on wide inputs)
    scored = spread_small_scan(vecs).join(F.broadcast(cents)).select(
        "vid", "list_id",
        cosine_similarity(F.col("v"), F.col("centroid")).alias("cos"),
    )
    if nprobe == 1:
        # max_by over (cos, -list_id): smallest list wins cosine ties,
        # matching the oracle's `order by cos desc, list_id asc`
        return scored.groupBy("vid").agg(
            F.max_by(F.struct("list_id", "cos"),
                     F.struct(F.col("cos"), -F.col("list_id"))).alias("m")
        ).select("vid", F.col("m.list_id").alias("list_id"),
                 F.col("m.cos").alias("cos"))
    w = Window.partitionBy("vid").orderBy(F.desc("cos"), F.asc("list_id"))
    return (scored.withColumn("pr", F.row_number().over(w))
            .filter(F.col("pr") <= nprobe).drop("pr"))


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_lists: int = 16, nprobe: int = 4, iters: int = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", assign_gear: str = "arrow",
) -> DataFrame:
    """ANN top-k through an IVF index built on the fly.

    1. codebook: `ivf_centroids` (deterministic seeds, optional Lloyd)
    2. corpus assignment: nearest cell per vector (broadcast argmax)
    3. query probes: `nprobe` nearest cells per query
    4. candidates: cell-equality join, exact cosine re-rank, top-k

    With nprobe == n_lists every cell is probed and the result equals
    `cosine_topk` exactly (tested); smaller nprobe trades recall for a
    candidate budget of ~nprobe/n_lists of the corpus. Candidate
    generation never compares query x corpus directly — the only
    corpus-wide joins are broadcast (codebook) and cell-bucketed.

    `assign_gear` picks the nearest-cell implementation: "arrow"
    (default — numpy GEMM per Arrow batch against the broadcast
    codebook, the 10^10-vector path, measured ~4.7x end-to-end on a
    1M-vector run) or "sql" (interpreted cosine aggregates + max_by, every
    step a Catalyst expression). Both gears implement the same argmax
    with the same smaller-list tie-break; the driver oracle value-checks
    BOTH against one unrolled SQL recomputation, and pytest asserts
    assignment equality on real data."""
    if assign_gear not in ("arrow", "sql"):
        raise ValueError(f"unknown assign_gear {assign_gear!r}")
    nearest = _nearest_lists_arrow if assign_gear == "arrow" else (
        lambda v, c, p: _nearest_lists(v, c, p).select("vid", "list_id"))
    cents = ivf_centroids(corpus, n_lists, iters, id_col, vec_col)
    # the codebook feeds two gear lookups; compute it once
    cents = cents.localCheckpoint(eager=True)
    cvecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"))
    qvecs = queries.select(
        F.col(query_id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"))
    cassign = nearest(cvecs, cents, 1).select(
        F.col("vid").alias("neighbor_id"), "list_id")
    qprobe = nearest(qvecs, cents, nprobe).select(
        F.col("vid").alias("query_id"), "list_id")
    cand = qprobe.join(cassign, "list_id").select(
        "query_id", "neighbor_id").distinct()
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    scored = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id",
        cosine_similarity(F.col("cv"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


def _nearest_lists_arrow(vecs: DataFrame, cents: DataFrame,
                         nprobe: int, keep_vec: bool = False) -> DataFrame:
    """Arrow-matmul gear of `_nearest_lists` — the 10^10-vector assignment
    path. One numpy GEMM per Arrow batch against the driver-broadcast
    codebook (n_lists rows — the ONLY thing collected) replaces the
    interpreted per-element cosine aggregates of the SQL gear; measured
    ~4.7x end-to-end on a 1M-vector x 64-list ivf_topk (58.7s -> 12.4s
    warm, SCALE.md §5b). Semantics are
    identical: cosine over doubles, ties to the smaller list_id (argmax /
    stable argsort take the first maximum and the codebook columns are in
    list_id order) — the driver oracle value-checks this gear against the
    same unrolled SQL as the SQL gear.

    `keep_vec` (nprobe=1 only) passes the vector column through the
    batch, yielding (vid, v, list_id) straight off the scan — callers
    that need vectors AND assignments (semantic_dedup's pairwise prune)
    skip a corpus-sized vid re-join that way: the assignment stage stays
    entirely shuffle-free."""
    rows = cents.orderBy("list_id").collect()
    C = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    lids = np.array([r["list_id"] for r in rows], dtype=np.int32)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    id_type = vecs.schema["vid"].dataType.simpleString()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["v"].map(
                lambda v: np.asarray(v, dtype=np.float64)))
            Mn = M / np.maximum(
                np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cos = Mn @ Cn.T  # (batch, n_lists), columns in list_id order
            if nprobe == 1:
                out = {"vid": pdf["vid"].values,
                       "list_id": lids[cos.argmax(axis=1)]}
                if keep_vec:
                    out["v"] = pdf["v"].values
                yield pd.DataFrame(out)
            else:
                top = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
                yield pd.DataFrame({
                    "vid": np.repeat(pdf["vid"].values, top.shape[1]),
                    "list_id": lids[top].reshape(-1),
                })

    if keep_vec and nprobe != 1:
        raise ValueError("keep_vec requires nprobe=1")
    schema = (f"vid {id_type}, v array<double>, list_id int" if keep_vec
              else f"vid {id_type}, list_id int")
    from linkinator_spark.functions.partitioning import spread_small_scan

    # spread a narrow scan so the GEMM batches use every core (no-op on
    # already-wide inputs)
    return spread_small_scan(vecs).mapInPandas(fn, schema)


def semantic_dedup(
    corpus: DataFrame, n_lists: int = 16, eps: float = 0.999,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assign_gear: str = "arrow",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then prune semantic
    duplicates ONLY within a cluster — the pairwise cosine cost is
    O(sum |cluster|^2), bounded by sizing n_lists ~ N / target_cluster,
    never an all-pairs corpus join.

    1. codebook: `ivf_centroids` (deterministic smallest-id seeds, so the
       DuckDB oracle replays the whole pipeline in SQL)
    2. assignment: nearest cell per vector (`assign_gear` picks the Arrow
       GEMM batch path — the 10^10-vector default — or the pure-Catalyst
       SQL gear; both oracle/pytest-checked to agree)
    3. prune: within each cell, a vector is dropped iff a SMALLER-id
       vector in the same cell has round(cosine, 6) >= eps; `dup_of` is
       the smallest such id (greedy-by-id keeper — deterministic, order-
       independent, and exactly expressible in SQL for the oracle)

    Returns (vec_id, list_id, dup_of, kept) with dup_of = -1 for keepers.

    100-TB shape: the only corpus-wide operations are the broadcast
    codebook probe and ONE shuffle on list_id for the self-join; the
    codebook (n_lists rows) is the only driver-side collect. Skew lives
    exactly where SemDeDup puts it — a giant cluster is a hot key — and
    is controlled the way the paper controls it: raise n_lists so
    clusters stay small (they use ~50k clusters at web scale). Exact
    copies always share a cell (identical vectors score identically
    against every centroid, same tie-break), so recall on exact
    duplicates is 1 by construction.
    """
    if assign_gear not in ("arrow", "sql"):
        raise ValueError(f"unknown assign_gear {assign_gear!r}")
    cents = ivf_centroids(corpus, n_lists, 0, id_col, vec_col)
    cents = cents.localCheckpoint(eager=True)
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"))
    if assign_gear == "arrow":
        # keep_vec: (vid, v, list_id) straight off the scan — the
        # assignment stage is shuffle-free, no corpus-sized vid re-join
        member = _nearest_lists_arrow(vecs, cents, 1, keep_vec=True)
    else:
        member = vecs.join(
            _nearest_lists(vecs, cents, 1).select("vid", "list_id"), "vid")
    # one materialization feeds the pair stage (twice) and the final
    # keeper join — without it the assignment recomputes per consumer
    member = member.localCheckpoint(eager=False)
    # Within-cell pairwise prune, GEMM gear: the former expression-level
    # cell self-join evaluated the interpreted zip_with cosine on every
    # in-cell pair (O(sum |cell|^2 * dim) interpreted — 200s at sf1.0).
    # Per cell, one numpy GEMM finds candidate pairs with normalized-dot
    # >= eps - 1e-6 (a margin that provably captures every pair whose
    # EXACT cosine could round up to >= eps at 6dp: round-up needs
    # cos >= eps - 5e-7, GEMM accumulation differs by ~1e-13), and only
    # those candidates are re-scored with the exact JVM cosine + round —
    # the same filter expression as before, so the output is identical.
    id_type = member.schema["vid"].dataType.simpleString()
    margin = eps - 1e-6

    def pair_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if n < 2:
            return empty
        ids = pdf["vid"].to_numpy(np.int64)
        M = np.stack(pdf["v"].map(lambda v: np.asarray(v, np.float64)))
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        out_a, out_b = [], []
        block = max(64, 4_000_000 // n)  # keep the score block ~32 MB
        for lo in range(0, n, block):
            S = Mn[lo:lo + block] @ Mn.T
            ia, ib = np.nonzero(S >= margin)
            ga, gb = ids[lo + ia], ids[ib]
            m = ga < gb
            if m.any():
                out_a.append(ga[m])
                out_b.append(gb[m])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = member.groupBy("list_id").applyInPandas(
        pair_fn, f"id_a {id_type}, id_b {id_type}")
    va = member.select(F.col("vid").alias("id_a"), F.col("v").alias("va"))
    vb = member.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    dup = (
        cand.join(va, "id_a").join(vb, "id_b")
        .filter(F.round(cosine_similarity(F.col("va"), F.col("vb")), 6) >= eps)
        .groupBy("id_b").agg(F.min("id_a").alias("dup_of"))
    )
    return (
        member.join(dup, member["vid"] == dup["id_b"], "left")
        .select(
            F.col("vid").alias("vec_id"),
            F.col("list_id").cast("int").alias("list_id"),
            F.coalesce("dup_of", F.lit(-1)).alias("dup_of"),
            F.col("dup_of").isNull().cast("int").alias("kept"),
        )
    )


# --- oracle-checkable Lloyd training -------------------------------------
#
# ivf_centroids' Lloyd refinement is float-mean based, so its result is
# engine-specific in the last ulp and the oracle pins iters=0. kmeans_train
# is the checkable twin: vectors are quantized ONCE to integer micro-units
# (round(x * 1e6) as int64) and every centroid update is an EXACT integer
# sum followed by one double division and one round — bit-reproducible in
# any engine, so a DuckDB twin can replay whole training rounds. The only
# float comparison left is the assignment argmax, where a cross-engine
# 1-ulp cosine difference matters only on exact centroid ties (broken by
# list_id) — measure-zero on real embeddings.
#
# Scale shape (100-TB lens): per round, ONE broadcast join (codebook) with
# a map-side-combined max_by argmax (no corpus-sized shuffle key besides
# the uniform vid), then posexplode + groupBy(list_id, dim) whose partial
# aggregation collapses to k*dim rows map-side. The codebook is
# localCheckpoint-ed per round to cut the iteration lineage — driver
# traffic is k*dim longs per round, never corpus-sized.

KMEANS_QUANT = 1_000_000


def kmeans_train(
    corpus: DataFrame, n_lists: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Train a k-means codebook with engine-exact Lloyd rounds.

    Returns (list_id:int, centroid_micro:array<bigint>) — centroid
    coordinates in micro-units (1e-6). Seeds are the n_lists vectors
    with the smallest ids (TakeOrdered, never a full sort), quantized.
    Empty cells drop out of the codebook (both engines agree, because
    the assignment itself agrees). DuckDB twin: kmeans_oracle_sql."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    q = float(KMEANS_QUANT)
    # spread the narrow scan: every Lloyd round evaluates the interpreted
    # per-element cosine against the broadcast codebook over these rows
    vecs = spread_small_scan(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * q).cast("long")).alias("vm"),
    )
    seeds = vecs.orderBy("vid").limit(n_lists)
    w = Window.orderBy("vid")
    cents = seeds.select(
        F.row_number().over(w).cast("int").alias("list_id"),
        F.col("vm").alias("cm"))
    for _ in range(iters):
        scored = vecs.join(F.broadcast(cents)).select(
            "vid", "vm", "list_id",
            cosine_similarity(
                F.transform("vm", lambda m: m / q),
                F.transform("cm", lambda m: m / q)).alias("cos"),
        )
        assign = scored.groupBy("vid").agg(
            F.max_by(F.struct("list_id", "vm"),
                     F.struct(F.col("cos"), -F.col("list_id"))).alias("m")
        ).select(F.col("m.list_id").alias("list_id"),
                 F.col("m.vm").alias("vm"))
        cents = (
            assign.select("list_id", F.posexplode("vm").alias("dim", "x"))
            .groupBy("list_id", "dim")
            .agg(F.round(F.sum("x").cast("double") / F.count("*"))
                 .cast("long").alias("x"))
            .groupBy("list_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("dim", "x"))).alias("s"))
            .select("list_id",
                    F.transform("s", lambda e: e["x"]).alias("cm"))
        )
        cents = cents.localCheckpoint(eager=True)
    return cents.select("list_id", F.col("cm").alias("centroid_micro"))


def kmeans_oracle_sql(
    n_lists: int = 8, iters: int = 2, dim: int = 64,
    table: str = "embeddings", id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of kmeans_train: the same quantize / assign / exact
    integer mean rounds, unrolled (one CTE pair per Lloyd round, like
    link_pagerank's unrolled power-method twin)."""
    qq = KMEANS_QUANT
    parts = [
        f"with v as (select {id_col} as vid,"
        f" list_transform({vec_col}::DOUBLE[],"
        f" x -> cast(round(x * {qq}) as bigint)) as vm from {table})",
        f"dims as (select unnest(range(1, {dim} + 1)) as dim)",
        "c0 as (select cast(row_number() over (order by vid) as int)"
        " as list_id, vm as cm from"
        f" (select vid, vm from v order by vid limit {n_lists}))",
    ]
    prev = "c0"
    for r in range(1, iters + 1):
        parts.append(
            f"a{r} as ("
            " select vid, vm, list_id from ("
            "  select v.vid, v.vm, c.list_id,"
            "   row_number() over (partition by v.vid order by"
            f"   list_cosine_similarity("
            f"     list_transform(v.vm, m -> m / {qq}.0),"
            f"     list_transform(c.cm, m -> m / {qq}.0)) desc,"
            "    c.list_id asc) as rn"
            f"  from v cross join {prev} c) where rn = 1)")
        parts.append(
            f"c{r} as ("
            " select list_id, list(x order by dim) as cm from ("
            "  select list_id, dim,"
            "   cast(round(sum(vm[dim])::double / count(*)) as bigint) as x"
            f"  from a{r} cross join dims group by list_id, dim)"
            " group by list_id)")
        prev = f"c{r}"
    parts_sql = ",\n".join(parts)
    return (f"{parts_sql}\n"
            f"select list_id, cm as centroid_micro from {prev}")
