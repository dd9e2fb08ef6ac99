"""Deduplication operators for training-data pipelines.

Five families, each a `queries()` entry with a DuckDB oracle where the math
is engine-portable:

* exact dedup            — hash-groupBy on normalized text
* MinHash + LSH          — shingle -> n portable min-hashes -> band-bucket
                           join -> candidate pairs (near-dup detection at
                           10^10-doc scale: the band join is the only shuffle)
* SimHash                — bit-majority over token hashes, Hamming buckets
* n-gram Jaccard         — exact verify step for LSH candidates
* embedding cosine       — near-dup by vector similarity

Scale notes: MinHash signatures are computed in one projection (JVM
`transform`/`array_min`, no Python); the LSH join shuffles only
(band_id, band_hash) pairs, so candidate generation is O(docs x bands)
rows — this is the standard shape that survives a 1000-executor run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import (
    normalize_text, portable_hash64, shingles,
)


# ------------------------------------------------------------- exact dedup

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: keeper = min id."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    keyed = spread_small_scan(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select(
        "doc_id",
        F.md5(normalize_text(F.col(text_col))).alias("content_key"),
    )
    return (
        keyed.groupBy("content_key")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------- minhash

# one md5 per shingle -> 28-bit base hash; n permutations are linear maps
# (a_j*h + b_j) mod P. ONE hash pass per document regardless of n — the
# naive "md5 per (shingle, j)" form blows up codegen n-fold. Constants are
# shared with the DuckDB oracle.
MINHASH_P = 268435399  # prime < 2^28; a*h + b stays < 2^63
MINHASH_A = [15485863, 32452843, 49979687, 67867967,
             86028121, 104395301, 122949823, 141650939,
             160481183, 179424673, 198491317, 217645177,
             236887691, 256203161, 275604541, 295075147]
MINHASH_B = [12345701, 23456791, 34567891, 45678929,
             56789101, 67891099, 78910103, 89101103,
             91011137, 10111409, 11121433, 12131453,
             13141507, 14151511, 15161573, 16171621]


def shingle_hash28(s: Column) -> Column:
    """Portable 28-bit shingle hash (md5-hex prefix)."""
    return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint")


def minhash_signature(text_col: Column, n_hashes: int = 16, k: int = 5) -> Column:
    """n min-hashes over k-gram shingles via one aggregate pass."""
    sh = F.array_distinct(shingles(normalize_text(text_col), k))
    hashes = F.transform(sh, shingle_hash28)
    a_arr = F.array(*[F.lit(a).cast("bigint") for a in MINHASH_A[:n_hashes]])
    b_arr = F.array(*[F.lit(b).cast("bigint") for b in MINHASH_B[:n_hashes]])
    init = F.array_repeat(F.lit(MINHASH_P).cast("bigint"), n_hashes)
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.transform(
            acc,
            lambda ac, i: F.least(
                ac,
                F.pmod(h * F.element_at(a_arr, i + 1) + F.element_at(b_arr, i + 1),
                       F.lit(MINHASH_P)),
            ),
        ),
    )


def minhash_signature_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, k: int = 5,
) -> DataFrame:
    """(doc_id, sig array<bigint>) via explode -> groupBy(doc_id) with one
    `min` aggregate per permutation. Same math as `minhash_signature`, but
    min/pmod run inside whole-stage codegen with map-side partial
    aggregation (Spark evaluates higher-order array functions interpreted —
    the column form measured ~30x slower on multi-KB documents), and the
    shuffle carries only n_hashes partial mins per doc."""
    # Shingling as a pure-codegen position explode: `shingles()` builds a
    # per-doc string array through an interpreted higher-order transform
    # (~33us/shingle — 15.7s for the sf1.0 bucket table); exploding the
    # POSITION sequence and slicing with a codegen substring computes the
    # same shingle stream at expression speed. Duplicate shingles are NOT
    # removed (the column form array_distincts first): min() is
    # duplicate-insensitive, so the signature is identical.
    # Round-robin spread before the explode: a small parquet input
    # arrives as 1-2 partitions, which would pin the whole corpus's
    # shingling onto one task; scale-adaptive (no-op on an already-wide
    # scan — a cluster-sized corpus must not pay a payload shuffle here).
    # Deliberately NOT hash-partitioned on doc_id — pre-aligning with the
    # groupBy key collapses the partial/final aggregate split and
    # measured 10x slower than keeping map-side partial aggregation +
    # tiny shuffle.
    from linkinator_spark.functions.partitioning import spread_small_scan

    ex = (
        spread_small_scan(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", normalize_text(F.col(text_col)).alias("_t"))
        .select(
            "doc_id", "_t",
            F.explode(F.sequence(
                F.lit(1),
                F.greatest(F.length("_t") - (k - 1), F.lit(1)))).alias("_i"))
        .select("doc_id", F.expr(f"substring(_t, _i, {k})").alias("s"))
    )
    h = shingle_hash28(F.col("s"))
    mins = [
        F.min(F.pmod(h * F.lit(MINHASH_A[j]).cast("bigint")
                     + F.lit(MINHASH_B[j]).cast("bigint"),
                     F.lit(MINHASH_P))).alias(f"_m{j}")
        for j in range(n_hashes)
    ]
    agg = ex.groupBy("doc_id").agg(*mins)
    # empty/short docs (no shingles) drop out of the explode; restore them
    # with the empty-set signature (all mins = P), matching the column form
    empty_sig = F.array_repeat(F.lit(MINHASH_P).cast("bigint"), n_hashes)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_m0").isNull(), empty_sig).otherwise(
                F.array(*[F.col(f"_m{j}") for j in range(n_hashes)])
            ).alias("sig"),
        )
    )


def minhash_band_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, k: int = 5,
) -> DataFrame:
    """(doc_id, band_id, band_hash): documents agreeing on all rows of a band
    share a bucket. rows-per-band = n_hashes/bands."""
    rows = n_hashes // bands
    with_sig = minhash_signature_table(docs, id_col, text_col, n_hashes, k)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *[
                F.element_at("sig", b * rows + r + 1).cast("string")
                for r in range(rows)
            ])).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return with_sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def minhash_candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, k: int = 5,
) -> DataFrame:
    """Distinct candidate near-dup pairs (a < b) from any shared band bucket.
    This is the LSH self-join: shuffle keyed on (band_id, band_hash)."""
    # materialize buckets once — the self-join would otherwise recompute the
    # full minhash on both sides
    b = minhash_band_buckets(docs, id_col, text_col, n_hashes, bands, k) \
        .localCheckpoint(eager=False)
    left = b.alias("l")
    right = b.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_candidate_pairs_between(
    new_docs: DataFrame, corpus_docs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, k: int = 5,
) -> DataFrame:
    """Cross-corpus LSH candidates: (new_id, corpus_id) pairs whose docs
    share at least one band bucket — the incremental-dedup shape for a
    continual crawl, where each day's batch checks against the standing
    corpus WITHOUT re-pairing the corpus against itself (a self-join of
    corpus ∪ batch recomputes and re-shuffles the 100-TB side every
    day; this joins batch-sized buckets against corpus buckets instead).
    The corpus side's band-bucket table depends only on the corpus:
    persist it once (it is `minhash_band_buckets(corpus)`) and a day's
    batch costs one hash join keyed on (band_id, band_hash)."""
    bn = minhash_band_buckets(new_docs, id_col, text_col, n_hashes, bands, k)
    bc = minhash_band_buckets(
        corpus_docs, id_col, text_col, n_hashes, bands, k)
    return (
        bn.alias("n").join(
            bc.alias("c"),
            (F.col("n.band_id") == F.col("c.band_id"))
            & (F.col("n.band_hash") == F.col("c.band_hash")),
        )
        .select(F.col("n.doc_id").alias("new_id"),
                F.col("c.doc_id").alias("corpus_id"))
        .distinct()
    )


def incremental_near_dups(
    new_docs: DataFrame, corpus_docs: DataFrame, threshold: float = 0.7,
    id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 16, bands: int = 4, k: int = 5,
) -> DataFrame:
    """Incremental near-dup check: which docs of a new batch duplicate
    the standing corpus. LSH candidates between the two tables, then
    exact shingle-Jaccard verify. Output: (new_id, corpus_id, jaccard)
    with jaccard >= threshold — anti-join the batch against `new_id` to
    admit only genuinely novel documents.

    Scale: the only corpus-sized work is the (persistable) corpus bucket
    table and the candidate-driven shingle lookup — both keyed on
    uniform hashes; nothing all-pairs, nothing driver-side."""
    cands = minhash_candidate_pairs_between(
        new_docs, corpus_docs, id_col, text_col, n_hashes, bands, k
    ).localCheckpoint(eager=False)

    def _sh(df, out_id):
        # shingle only the docs that actually appear in a candidate pair
        # (same verify-side prune as jaccard_pairs — the corpus side would
        # otherwise re-shingle the standing corpus every day), with the
        # same codegen position-explode + collect_set shingle sets
        from linkinator_spark.functions.partitioning import spread_small_scan

        members = cands.select(out_id).distinct().withColumnRenamed(
            out_id, id_col)
        return (
            spread_small_scan(
                df.select(F.col(id_col), F.col(text_col))
                .join(members, id_col))
            .select(F.col(id_col).alias(out_id),
                    normalize_text(F.col(text_col)).alias("_t"))
            .select(
                out_id, "_t",
                F.explode(F.sequence(
                    F.lit(1),
                    F.greatest(F.length("_t") - (k - 1),
                               F.lit(1)))).alias("_i"))
            .select(out_id, F.expr(f"substring(_t, _i, {k})").alias("s"))
            .groupBy(out_id).agg(
                F.collect_set("s").alias(f"_sh_{out_id}"))
        )

    joined = (
        cands.join(_sh(new_docs, "new_id"), "new_id")
        .join(_sh(corpus_docs, "corpus_id"), "corpus_id")
    )
    inter = F.size(
        F.array_intersect("_sh_new_id", "_sh_corpus_id")).cast("double")
    union = F.size(
        F.array_union("_sh_new_id", "_sh_corpus_id")).cast("double")
    return (
        joined.select(
            "new_id", "corpus_id",
            F.round(inter / F.greatest(union, F.lit(1.0)), 6)
            .alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------- ngram jaccard

def jaccard_pairs(
    docs: DataFrame, candidates: DataFrame, threshold: float = 0.7,
    id_col: str = "doc_id", text_col: str = "text", k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; the verify step after
    LSH. Output: (doc_a, doc_b, jaccard) with jaccard >= threshold."""
    # compute shingle arrays ONLY for docs that appear in a candidate pair:
    # the LSH prune typically leaves a tiny fraction of the corpus, and the
    # shingle transform (interpreted substring-per-position) was the
    # dominant cost of the verify step when run over every document. The
    # member semi-join keys on the uniform doc id; candidates are
    # checkpointed once so the (expensive) pair generation upstream is not
    # re-run for each of its three consumers here.
    candidates = candidates.localCheckpoint(eager=False)
    members = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # shingle SETS via the same codegen position-explode as
    # minhash_signature_table (the interpreted per-doc transform was the
    # verify step's dominant cost), aggregated with collect_set — set
    # semantics identical to array_distinct, and intersect/union SIZES
    # (all the jaccard needs) are order-independent. One lazy
    # materialization feeds both pair sides instead of re-shingling per
    # side.
    from linkinator_spark.functions.partitioning import spread_small_scan

    sh = (
        spread_small_scan(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            .join(members, "doc_id"))
        .select("doc_id",
                normalize_text(F.col(text_col)).alias("_t"))
        .select(
            "doc_id", "_t",
            F.explode(F.sequence(
                F.lit(1),
                F.greatest(F.length("_t") - (k - 1), F.lit(1)))).alias("_i"))
        .select("doc_id", F.expr(f"substring(_t, _i, {k})").alias("s"))
        .groupBy("doc_id").agg(F.collect_set("s").alias("sh"))
        .localCheckpoint(eager=False)
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select(
            "doc_a", "doc_b",
            F.round(inter / F.greatest(union, F.lit(1.0)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------------ simhash

def simhash(text_col: Column, bits: int = 32) -> Column:
    """Bit-majority SimHash over word-token hashes — pure expressions:
    bit b is set when >= half the token hashes have bit b set."""
    tokens = F.array_distinct(
        F.regexp_extract_all(normalize_text(text_col), F.lit(r"[a-z0-9]+"), 0)
    )
    hashes = F.transform(tokens, lambda t: portable_hash64(t))
    n = F.size(hashes)

    def bit_term(b: int) -> Column:
        bit_count = F.size(
            F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << b)) != 0)
        )
        return F.when(bit_count * 2 >= n, F.lit(1 << b)).otherwise(0).cast("bigint")

    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        acc = acc + bit_term(b)
    return F.when(n > 0, acc).otherwise(F.lit(0).cast("bigint"))


def simhash_near_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 32, block_bits: int = 8, max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block the fingerprint into bands (pigeonhole
    — any pair within max_hamming agrees on >=1 block), bucket-join, then
    exact popcount filter."""
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     simhash(F.col(text_col), bits).alias("sh"))
    n_blocks = bits // block_bits
    mask = (1 << block_bits) - 1
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("block_id"),
            F.shiftright("sh", i * block_bits).bitwiseAND(F.lit(mask)).alias("block_val"),
        )
        for i in range(n_blocks)
    ])
    bl = sh.select("doc_id", "sh", F.explode(blocks).alias("b")).select(
        "doc_id", "sh", "b.block_id", "b.block_val"
    )
    pairs = (
        bl.alias("l").join(
            bl.alias("r"),
            (F.col("l.block_id") == F.col("r.block_id"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"),
            F.col("l.sh").alias("sh_a"), F.col("r.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------- embedding near-dup

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over array<float/double> columns — JVM aggregate/zip_with."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / F.greatest(na * nb, F.lit(1e-12))


def hyperplane_band_buckets(
    df: DataFrame, dim: int, bands: int, rows_per_band: int, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Banded random-hyperplane signatures: (vid, band_id, band_hash), one
    row per (vector, band). One numpy matmul per Arrow batch computes all
    ``bands x rows_per_band`` signs; each band packs its signs into a
    64-bit hash. This mirrors the MinHash band-join structure
    (minhash_candidate_pairs above): a candidate pair is any pair agreeing
    on >= 1 full band, so the self-join key is (band_id, band_hash) and no
    bucket does unbounded all-pairs — hyperplanes span ALL dims, so
    adversarial shared prefixes cannot collapse the corpus into one bucket
    (tests/test_text_dedup.py skew test)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bands * rows_per_band)).astype(np.float64)
    weights = 1 << np.arange(rows_per_band, dtype=np.int64)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            signs = (mat @ planes) > 0
            hashes = signs.reshape(len(pdf), bands, rows_per_band) @ weights
            yield pd.DataFrame({
                "vid": np.repeat(pdf[id_col].to_numpy(), bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int32), len(pdf)),
                "band_hash": hashes.reshape(-1),
            })

    from linkinator_spark.functions.partitioning import spread_small_scan

    return spread_small_scan(df.select(id_col, vec_col)).mapInPandas(
        fn, "vid long, band_id int, band_hash long")


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, bands: int = 8, rows_per_band: int = 8, seed: int = 42,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold: banded hyperplane LSH
    candidates (band self-join keyed on (band_id, band_hash) — never
    all-pairs), exact cosine verify.

    Recall: a pair at cosine c agrees per-plane with prob 1 - arccos(c)/pi,
    so a full band matches with p^rows_per_band and >= 1 of `bands` bands
    misses with (1-p^R)^B. At the thresholds this engine dedups at
    (c >= 0.95), that miss rate is < 1e-6; exact duplicates (identical
    vectors) produce identical signs, so their recall is exactly 1."""
    import numpy as np
    import pandas as pd

    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    bb = hyperplane_band_buckets(
        embeddings, dim, bands, rows_per_band, seed, id_col, vec_col)
    # Per-bucket GEMM pre-verify (the semantic_dedup shape): the bucket
    # self-join used to fan every in-bucket pair (random vectors give
    # ~|bucket|^2/2 pairs per bucket — millions at bench scale) into an
    # interpreted per-pair cosine. Instead the vectors ride to their
    # buckets once and one numpy GEMM per bucket keeps only pairs with
    # normalized-dot >= threshold - 1e-9 — a margin that provably
    # captures every pair whose EXACT cosine passes the raw >= threshold
    # filter (GEMM accumulation differs by ~1e-13). The surviving
    # candidates (the actual near-dups) then pass through the SAME exact
    # JVM cosine filter + projection as before, so output is identical.
    margin = threshold - 1e-9
    vecs = e.join(bb, "vid").select("band_id", "band_hash", "vid", "v")

    def bucket_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["vid"].to_numpy(np.int64)
        M = np.stack(pdf["v"].map(lambda v: np.asarray(v, np.float64)))
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        out_a, out_b = [], []
        block = max(64, 4_000_000 // n)
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

    cand = (vecs.groupBy("band_id", "band_hash")
            .applyInPandas(bucket_pairs, "id_a long, id_b long")
            .distinct())
    pairs = (
        cand.join(e.select(F.col("vid").alias("id_a"), F.col("v").alias("va")),
                  "id_a")
        .join(e.select(F.col("vid").alias("id_b"), F.col("v").alias("vb")),
              "id_b")
        .select("id_a", "id_b",
                cosine_similarity(F.col("va"), F.col("vb")).alias("cos"))
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        "id_a", "id_b", F.round("cos", 6).alias("cosine")
    )


# ----------------------------------------------- connected components (CC)

def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round (Kiveris, Lattanzi, Mirrokni,
    Rastogi, Vassilvitskii — "Connected Components in MapReduce and
    Beyond", SoCC 2014). `edges` holds undirected edges as (u, v); the
    output again holds (u, v) with every edge pointing both endpoints
    closer to the component minimum. Per-node minima are computed with a
    combiner-friendly groupBy().agg(min) + join rather than a window min:
    the partial aggregate collapses a hot node's neighborhood map-side
    (a template page near-dup to millions of docs never buffers its whole
    neighborhood in one window task), and the fan-out join streams/spills
    instead of materializing the partition."""
    # large-star over the symmetrized neighborhood: every neighbor v > u
    # re-attaches to m = min(N(u) ∪ {u})
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    large = (
        sym.join(mins, "u")
        .withColumn("m", F.least(F.col("_mn"), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # small-star over edges oriented big->small: u and all its smaller
    # neighbors re-attach to the smallest of them
    oriented = large.filter(F.col("u") != F.col("v")).select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
    small = oriented.join(mins2, "u")
    out = (
        small.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(small.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    return out


def _cc_fused(edges: DataFrame) -> DataFrame:
    """Whole CC in ONE executor-side task: path-compressed union-find over
    the edge list in a single Arrow batch. The AQE-style small-input gear
    (same philosophy as the fused BFS / fused crawl gears): a pair graph
    that fits one task pays one job instead of O(log n) star rounds each
    with two shuffles and a driver probe. Result-identical to the star
    rounds (test asserts equality on random graphs)."""
    def fn(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for a, b in zip(pdf["u"], pdf["v"]):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        nodes = list(parent)
        yield pd.DataFrame({"node": nodes,
                            "component": [find(x) for x in nodes]})

    schema = "node {t}, component {t}".format(
        t=edges.schema["u"].dataType.simpleString())
    return edges.repartition(1).mapInPandas(fn, schema)


def connected_components(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b",
    max_rounds: int = 25, fuse_max_edges: int = 5_000_000,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`, where
    `component` is the smallest node id in its connected component.

    At-scale path — alternating large-star/small-star: converges in
    O(log n) rounds even on path graphs (plain min-label propagation
    needs O(diameter)), each round is two window shuffles, and per-round
    driver traffic is one 2-value aggregate row for the convergence probe
    — nothing scales with node or edge count on the driver. The per-round
    `localCheckpoint` truncates the iterative lineage so the plan stays
    O(1) per round. Edge lists at or under `fuse_max_edges` (~80 MB of
    int64 pairs) instead take `_cc_fused`, a one-task union-find — the
    near-dup pair graph of a fixture-scale corpus is latency-bound, not
    data-bound (measured 8 s -> ~1 s at sf0.1).
    """
    # one checkpoint of the slim pair projection: the (possibly expensive)
    # pair-generation upstream materializes ONCE and feeds both the edge
    # list and the node set (deriving nodes from `pairs` directly would
    # recompute the whole upstream — visible as a doubled pipeline in the
    # PLANS.md audit)
    slim = pairs.select(
        F.col(id_a).alias("x"), F.col(id_b).alias("y")).localCheckpoint()
    edges = (
        slim.filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes_in = (
        slim.select(F.col("x").alias("node"))
        .union(slim.select(F.col("y").alias("node")))
        .distinct()
    )
    if fuse_max_edges and edges.count() <= fuse_max_edges:
        comp = _cc_fused(edges)
        return (
            nodes_in.join(comp, "node", "left")
            .select("node", F.coalesce("component", "node").alias("component"))
        )
    prev_sig, converged = None, False
    for _ in range(max_rounds):
        edges = _star_round(edges).localCheckpoint()
        # bit_xor is order-independent and cannot overflow under ANSI mode
        # (a sum of 64-bit hashes would)
        row = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # an unconverged edge set is NOT a node->component mapping; silently
        # returning it would yield wrong clusters with no signal. The star
        # rounds converge in O(log n); 25 rounds covers ~2^25 nodes, so
        # hitting this means a pathological input or a too-small max_rounds.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} star "
            "rounds; raise max_rounds")
    # converged: every edge is (node, component-min); minima map to themselves
    return (
        nodes_in.join(edges.withColumnRenamed("u", "node"), "node", "left")
        .select("node", F.coalesce("v", "node").alias("component"))
    )


def near_dup_clusters(
    docs: DataFrame, threshold: float = 0.5, id_col: str = "doc_id",
    text_col: str = "text", n_hashes: int = 16, bands: int = 4, k: int = 5,
    score_col: str | None = None,
) -> DataFrame:
    """End-to-end near-duplicate clustering: MinHash band candidates ->
    exact-Jaccard verify -> connected components -> one keeper per cluster.
    Output: (doc_id, keeper_id, cluster_size) for every clustered doc
    (keeper included; singletons never enter the pair graph and keep
    themselves implicitly). This is the canonical-dedup step a training
    corpus needs after pair generation: transitive near-dup chains
    (A~B~C without A~C) collapse into ONE keeper instead of two.

    Keeper policy: by default the smallest doc id in the component (the
    component label itself — free). With `score_col` (a numeric column
    of `docs`, e.g. a quality score or length), the keeper is the
    highest-scoring member, ties to the smallest id — what a real
    pipeline wants: keep the best copy, not an arbitrary one. The argmax
    is a map-side-combined max_by per component (partial aggregation —
    a 10^7-member cluster arrives at its reducer as one candidate per
    upstream task, no hot-key window)."""
    from pyspark.sql import Window

    cands = minhash_candidate_pairs(docs, id_col, text_col, n_hashes, bands, k)
    verified = jaccard_pairs(docs, cands, threshold, id_col, text_col, k)
    cc = connected_components(verified, "doc_a", "doc_b")
    size = (F.count("*").over(Window.partitionBy("component"))
            .cast("bigint").alias("cluster_size"))
    if score_col is None:
        return cc.select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("keeper_id"),
            size,
        )
    scores = docs.select(F.col(id_col).alias("node"),
                         F.col(score_col).alias("_sc"))
    scored = cc.join(scores, "node")
    keepers = scored.groupBy("component").agg(
        F.max_by("node", F.struct(F.col("_sc"), -F.col("node")))
        .alias("keeper_id"))
    return (
        scored.join(keepers, "component")
        .select(F.col("node").alias("doc_id"), "keeper_id", size)
    )


# ------------------------------------------------- substring-level dedup

def duplicate_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Substring-level exact dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): flag k-token passages
    shared VERBATIM across >=2 distinct documents. Doc-level
    exact/minhash/simhash dedup keeps documents that merely share long
    verbatim passages; this operator catches those spans.

    Scale shape — no suffix arrays needed: explode k-token rolling
    windows hashed as xxhash64 word tuples (O(tokens) map-side rows,
    never materialized as strings), take distinct (doc, window) pairs
    and groupBy(window) keeping count > 1 — both shuffles key on the
    uniform 64-bit window hash and partial-aggregate map-side — then map
    the duplicated-window set back per doc with a hash join on the same
    uniform key. Bucketed end to end, never all-pairs: the exact shape
    that survives a 100-TB corpus (same plan family as the benchmark
    decontamination probe).

    Output: (doc_id, n_windows, n_dup_windows, has_dup_span) for EVERY
    input doc. Docs shorter than k tokens produce no windows and report
    (0, 0, false) — the window explode drops them, so counts re-attach
    via a left join from the doc base (an inner join would silently
    drop every short doc). A window repeated only WITHIN one doc is not
    "duplicated" (cross-doc is the dedup signal), but once a window is
    duplicated, all of its occurrences in a doc count toward
    n_dup_windows.

    A 64-bit window-hash collision could only nudge a count by 1; the
    verdict is span-overlap detection, not exact-set identity, so the
    trade is sound at scale (same argument as the decontamination
    probe).
    """
    from linkinator_spark.functions.text import word_ngram_hashes

    grams = word_ngram_hashes(docs, text_col, k, id_col)
    duplicated = (
        grams.select(id_col, "gram").distinct()
        .groupBy("gram").agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("gram")
    )
    per_doc = (
        grams.join(duplicated, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("_dup"))
    )
    w = F.split(normalize_text(F.col(text_col)), " ")
    n_windows = (
        F.when(F.size(w) < k, F.lit(0))
        .otherwise(F.size(w) - (k - 1))
        .cast("bigint")
    )
    return (
        docs.select(id_col, n_windows.alias("n_windows"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce(F.col("_dup"), F.lit(0)).cast("bigint")
            .alias("n_dup_windows"),
            (F.coalesce(F.col("_dup"), F.lit(0)) > 0).alias("has_dup_span"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """The removal half of substring-level dedup (Lee et al. 2022):
    CUT every k-token window that appears verbatim in >=2 distinct
    documents out of the (normalized) text, keeping the remaining tokens
    in order. `duplicate_spans` flags; this cleans. A token is removed
    iff at least one duplicated window covers it, so overlapping
    duplicated windows merge naturally and a fully-duplicated document
    collapses to an empty string.

    Output: (id, clean_text, n_tokens, n_removed) for EVERY input doc —
    docs without duplicated spans pass through with their normalized
    text intact (left join from the doc base, same short-doc guard as
    duplicate_spans). Text is the whitespace-normalized lowercase form
    (the form training corpora keep); original-case offsets do not
    survive normalization and are not reconstructed.

    Scale shape: identical to duplicate_spans up to the duplicated-gram
    set (uniform 64-bit shuffle keys, map-side combines, never
    all-pairs); the per-doc cover positions come back as one
    collect_set per doc (bounded by the doc's own window count), and the
    cut itself is a whole-stage-codegen array filter — per-doc compute,
    no extra exchange. The token filter probes the covered-index array
    per token (O(tokens x covered) per doc worst case) — bounded by
    document length, embarrassingly parallel, no cross-doc state.
    """
    from linkinator_spark.functions.text import word_ngram_hashes

    grams = word_ngram_hashes(docs, text_col, k, id_col)
    duplicated = (
        grams.select(id_col, "gram").distinct()
        .groupBy("gram").agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("gram")
    )

    # positional grams (1-based window start)
    w = F.col("_w")
    gram_arr = F.when(
        F.size(w) < k, F.array().cast("array<bigint>")
    ).otherwise(F.transform(
        F.sequence(F.lit(1), F.size(w) - (k - 1)),
        lambda i: F.xxhash64(*[F.element_at(w, i + j) for j in range(k)])))
    from linkinator_spark.functions.partitioning import spread_small_scan

    # spread the narrow scan under the positional-gram explode, and
    # materialize the tokenized base once (it feeds the gram explode AND
    # the final reassembly join)
    base = spread_small_scan(
        docs.select(F.col(id_col).alias("id"), F.col(text_col))
    ).select(
        "id", F.split(normalize_text(F.col(text_col)), " ").alias("_w")
    ).localCheckpoint(eager=False)
    pos_grams = base.select(
        "id", F.posexplode(gram_arr).alias("_p0", "gram"))
    dpos = (
        pos_grams.join(duplicated, "gram")
        .groupBy("id")
        .agg(F.collect_set(F.col("_p0") + 1).alias("_dps"))
    )

    covered = F.array_distinct(F.flatten(F.transform(
        F.coalesce(F.col("_dps"), F.array().cast("array<int>")),
        lambda p: F.sequence(p, p + (k - 1)))))
    clean = F.filter(
        "_w", lambda t, i: ~F.array_contains(F.col("_cov"), i + 1))
    return (
        base.join(dpos, "id", "left")
        .withColumn("_cov", covered)
        .withColumn("_clean", clean)
        .select(
            "id",
            F.array_join("_clean", " ").alias("clean_text"),
            F.size("_w").cast("bigint").alias("n_tokens"),
            (F.size("_w") - F.size("_clean")).cast("bigint")
            .alias("n_removed"),
        )
    )
