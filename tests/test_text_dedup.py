"""Training-data ops: text analysis, dedup families, similarity, media stubs."""

import pyspark.sql.functions as F
import pytest

from linkinator_spark.functions.dedup import (
    cosine_similarity,
    embedding_near_dup_pairs,
    exact_duplicates,
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_signature,
    simhash,
    simhash_near_pairs,
)
from linkinator_spark.functions.media import (
    extract_media_features,
    media_from_documents,
    sample_frames,
)
from linkinator_spark.functions.similarity import cosine_topk, lsh_topk
from linkinator_spark.functions.text import (
    content_fingerprint,
    kgram_min_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and runs away into the forest."),
        (2, "The quick brown fox jumps over the lazy dog and runs away into the forest."),
        (3, "The quick brown fox jumps over the lazy dog and runs away into the woods."),
        (4, "Der schnelle braune Fuchs springt und das ist ein guter Tag mit der Sonne."),
        (5, "le chat est dans la maison et les oiseaux sont dans le jardin pour la nuit"),
        (6, "completely different content about spark dataframes and shuffle partitions"),
        (7, "  THE QUICK  brown fox jumps over the lazy dog and runs away into the forest. "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark):
    df = spark.createDataFrame([("hello world, 42 times!",)], "t string")
    # tokens: hello, world, ',', 42, times, '!'
    assert df.select(token_count(F.col("t")).alias("n")).collect()[0]["n"] == 6


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang"] for r in
           docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[4] == "de"
    assert got[5] == "fr"


def test_quality_score_ranges(docs):
    rows = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_exact_duplicates(docs):
    # 1, 2 and 7 normalize to the same text
    dups = exact_duplicates(docs).collect()
    assert len(dups) == 1
    assert dups[0]["keeper_id"] == 1
    assert dups[0]["n_copies"] == 3


def test_fingerprint_stability(docs):
    fp = docs.select(
        "doc_id", content_fingerprint(F.col("text")).alias("fp"),
        kgram_min_fingerprint(F.col("text")).alias("kfp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in fp}
    assert by_id[1]["fp"] == by_id[2]["fp"] == by_id[7]["fp"]
    assert by_id[1]["fp"] != by_id[6]["fp"]
    # near-identical docs share the k-gram min fingerprint w.h.p.
    assert by_id[1]["kfp"] == by_id[3]["kfp"]


def test_minhash_signature_shape(docs):
    sig = docs.select(minhash_signature(F.col("text"), 16, 5).alias("s")).collect()
    assert all(len(r["s"]) == 16 for r in sig)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs        # exact dups always collide
    assert (1, 3) in pairs        # near-dup (one word changed)
    assert (1, 6) not in pairs    # unrelated content


def test_jaccard_verify(docs, spark):
    cand = spark.createDataFrame([(1, 2), (1, 3), (1, 6)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs(docs, cand, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.5 < out[(1, 3)] < 1.0
    assert out[(1, 6)] < 0.1


def test_simhash_near_pairs(docs):
    # identical docs have hamming 0; near-dups small hamming. 8 blocks of 4
    # bits guarantee (pigeonhole) that any pair within hamming 7 shares a
    # block — hamming(1,3) is 4 for this corpus.
    out = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_pairs(docs, block_bits=4, max_hamming=6).collect()}
    assert out[(1, 2)] == 0
    assert (1, 3) in out and 0 < out[(1, 3)] <= 6
    assert (1, 6) not in out


def test_simhash_empty_text(spark):
    df = spark.createDataFrame([("",), ("   ",)], "t string")
    rows = df.select(simhash(F.col("t")).alias("s")).collect()
    assert all(r["s"] == 0 for r in rows)


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # 20: a scaled copy of 0 — cosine exactly 1, all hyperplane signs equal
    rows.append((20, [float(x * 1.001) for x in base[0]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_similarity_identity(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])],
                               "a array<float>, b array<float>")
    val = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    assert abs(val - 1.0) < 1e-9


def test_cosine_topk_exact(vecs):
    queries = vecs.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk(vecs, queries, k=3).collect()
    assert [r["neighbor_id"] for r in top][:2] == [0, 20]  # self then near-dup
    assert [r["rank"] for r in top] == [1, 2, 3]


def test_lsh_topk_recall(vecs):
    queries = vecs.filter("vec_id in (0, 5)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(vecs, queries, k=3)
    approx = lsh_topk(vecs, queries, dim=8, k=3, n_planes=4, multiprobe=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # self-match always found; recall is non-trivial but bucketed
    assert (0, 0) in a and (5, 5) in a
    assert len(a & e) >= len(e) // 2


def test_embedding_near_dup(vecs):
    pairs = embedding_near_dup_pairs(vecs, threshold=0.95, dim=8,
                                     bands=8, rows_per_band=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 20) in got


def test_embedding_near_dup_banded_resists_prefix_skew(spark):
    """Adversarial skew: every vector shares the same first 12 dims. A
    prefix sign-sketch would put the whole corpus into ONE bucket
    (unbounded in-bucket all-pairs); banded hyperplanes over all dims must
    spread it."""
    import numpy as np

    from linkinator_spark.functions.dedup import hyperplane_band_buckets

    rng = np.random.default_rng(11)
    n, dim = 400, 32
    mat = rng.standard_normal((n, dim))
    mat[:, :12] = rng.standard_normal(12)  # identical prefix everywhere
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bb = hyperplane_band_buckets(df, dim=dim, bands=8, rows_per_band=8)
    biggest = (
        bb.groupBy("band_id", "band_hash").count()
        .agg(F.max("count").alias("mx")).collect()[0]["mx"]
    )
    assert biggest < n / 4  # no band bucket degenerates toward all-pairs


def test_lsh_topk_planted_recall(spark):
    """The accuracy contract from similarity.lsh_topk's docstring: on a
    near-duplicate retrieval task (planted neighbors at cosine >= ~0.95),
    multi-table LSH recall@k vs the exact baseline is >= 0.9."""
    import numpy as np

    rng = np.random.default_rng(3)
    dim, n_base, n_q = 32, 400, 8
    base = rng.standard_normal((n_base, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    # plant 4 near-copies of each query vector
    for q in range(n_q):
        for j in range(1, 5):
            v = base[q] + 0.08 * j * rng.standard_normal(dim) * 0.5
            rows.append((10_000 + q * 10 + j, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(f"vec_id < {n_q}").select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(corpus, queries, k=5)
    approx = lsh_topk(corpus, queries, dim=dim, k=5, n_planes=8, n_tables=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.9


def test_media_pipeline(spark):
    docs = spark.createDataFrame(
        [("d1", [("html", "<p>x</p>", "", 0),
                 ("media_ref", "", "http://cdn.example/v.mp4", 1),
                 ("media_ref", "", "http://cdn.example/i.png", 2)])],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    media = media_from_documents(docs)
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert kinds["http://cdn.example/v.mp4"] == "video"
    assert kinds["http://cdn.example/i.png"] == "image"

    feats = extract_media_features(media, out_dim=8).collect()
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same input -> same features
    feats2 = extract_media_features(media, out_dim=8).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == \
           {r["media_id"]: r["feature"] for r in feats2}

    frames = sample_frames(media, every_ms=500).collect()
    assert len(frames) > 0
    assert all(r["ts_ms"] % 500 == 0 for r in frames)
    # no codec libs in this container -> stub identity is recorded per row
    assert all(r["decoder"] == "stub" for r in feats)


def test_real_codec_picked_up_when_available(spark, monkeypatch):
    """Import-if-available contract (VERDICT r2 item 5): when a codec
    library is importable, auto mode must select it with zero code change,
    and the output must record the real-decoder identity per row."""
    import numpy as np

    import linkinator_spark.functions.media as M

    def fake_pil_decode(data, out_dim=16):
        # a stand-in "real" codec: constant features, clearly distinct
        # from the sha256 stub
        return np.full(out_dim, 0.5, dtype=np.float32)

    monkeypatch.setitem(M._DECODERS, "pil", fake_pil_decode)
    monkeypatch.setattr(M, "_pil_available", lambda: True)

    docs = spark.createDataFrame(
        [("d1", [("media_ref", "", "http://cdn.example/i.png", 0)])],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    media = media_from_documents(docs)
    rows = M.extract_media_features(media, out_dim=4).collect()
    assert rows and all(r["decoder"] == "pil" for r in rows)
    assert all(r["feature"] == [0.5] * 4 for r in rows)
    # pinning the stub still works (the oracle path)
    stub_rows = M.extract_media_features(media, out_dim=4,
                                         decoder="stub").collect()
    assert all(r["decoder"] == "stub" for r in stub_rows)
    assert stub_rows[0]["feature"] != [0.5] * 4


# ----------------------------------------------- connected components

def _uf_components(pairs):
    """Reference union-find: node -> min-id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("fuse", [5_000_000, 0])
def test_connected_components_chain_and_islands(spark, fuse):
    from linkinator_spark.functions.dedup import connected_components

    # a transitive chain 1-2-3-4 (no direct 1-4 edge), an island {10,11},
    # and a 2-cycle duplicate edge; fuse=0 forces the star-round gear
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df, fuse_max_edges=fuse).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


@pytest.mark.parametrize("fuse", [5_000_000, 0])
def test_connected_components_random_vs_union_find(spark, fuse):
    import random

    from linkinator_spark.functions.dedup import connected_components

    rng = random.Random(4242)
    # worst-case-ish shapes for star rounds: long paths + random extras
    pairs = [(i, i + 1) for i in range(0, 60)]          # one 61-node path
    pairs += [(rng.randrange(100, 200), rng.randrange(100, 200))
              for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df, fuse_max_edges=fuse).collect()}
    assert got == _uf_components(pairs)


def test_near_dup_clusters_transitive_keeper(spark):
    """A~B and B~C near-dups (A,C farther apart) must collapse to ONE
    keeper for all three — pairwise dedup alone would keep two."""
    from linkinator_spark.functions.dedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog " * 8
    a = base
    b = base.replace("lazy", "sleepy", 3)
    c = b.replace("quick", "swift", 3)
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, "completely unrelated text here " * 10)],
        "doc_id long, text string",
    )
    rows = near_dup_clusters(docs, threshold=0.4).collect()
    got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"]) for r in rows}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}  # 9 never enters pairs


def test_near_dup_clusters_best_copy_keeper(spark):
    """With score_col the keeper is the highest-scoring cluster member
    (ties to smallest id), not the min-id label — here the middle doc of
    the A~B~C chain scores best and must keep all three."""
    from linkinator_spark.functions.dedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog " * 8
    a = base
    b = base.replace("lazy", "sleepy", 3)
    c = b.replace("quick", "swift", 3)
    docs = spark.createDataFrame(
        [(1, a, 10), (2, b, 99), (3, c, 10),
         (9, "completely unrelated text here " * 10, 1000)],
        "doc_id long, text string, quality long",
    )
    rows = near_dup_clusters(docs, threshold=0.4,
                             score_col="quality").collect()
    got = {r["doc_id"]: (r["keeper_id"], r["cluster_size"]) for r in rows}
    assert got == {1: (2, 3), 2: (2, 3), 3: (2, 3)}
    # tie on score -> smallest id wins
    docs2 = docs.withColumn("quality", F.lit(7))
    rows2 = near_dup_clusters(docs2, threshold=0.4,
                              score_col="quality").collect()
    assert {r["keeper_id"] for r in rows2} == {1}


# ------------------------------------------------- split / sampling

def test_hash_split_deterministic_under_repartition(spark):
    """The split must select identical documents regardless of physical
    layout — the reproducibility contract Spark's sample() cannot give."""
    from linkinator_spark.functions.sampling import hash_split

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = {(r["doc_id"], r["split"]) for r in hash_split(docs).collect()}
    b = {(r["doc_id"], r["split"])
         for r in hash_split(docs.repartition(13)).collect()}
    assert a == b
    by_split = {}
    for _, s in a:
        by_split[s] = by_split.get(s, 0) + 1
    # 98/1/1 within binomial slack at n=2000
    assert by_split["train"] > 1900
    assert 0 < by_split["val"] < 80 and 0 < by_split["test"] < 80

    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_split(docs, weights=(("a", 50), ("b", 40)))


def test_stratified_sample_exact_counts_and_determinism(spark):
    from math import ceil

    from linkinator_spark.functions.sampling import stratified_sample_exact

    docs = spark.range(0, 1100).select(
        F.col("id").alias("doc_id"),
        # skewed strata: one hot stratum with ~10x the others
        F.when(F.col("id") < 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 5).cast("string")))
        .alias("lang"),
    )
    got = stratified_sample_exact(docs, "lang", 0.17).collect()
    per = {}
    for r in got:
        per.setdefault(r["stratum"], set()).add(r["id"])
    sizes = {s: len(v) for s, v in per.items()}
    assert sizes["hot"] == ceil(1000 * 0.17)
    assert all(sizes[f"s{i}"] == ceil(20 * 0.17) for i in range(5))
    # identical selection under a different physical layout
    again = stratified_sample_exact(docs.repartition(7), "lang", 0.17).collect()
    assert {(r["id"], r["stratum"]) for r in again} == {
        (r["id"], r["stratum"]) for r in got}


# ---------------------------------------------------------------- rep / pii

def test_word_bigrams_short_doc_guard(spark):
    """sequence(1, 0) descends in Spark — the CASE guard must yield [] for
    docs with fewer than two words, not a bogus [w1 w0] pair."""
    from linkinator_spark.functions.text import word_bigrams

    df = spark.createDataFrame(
        [("",), ("one",), ("two words",), ("a b a b",)], ["text"]
    ).select(word_bigrams(F.col("text")).alias("bi"))
    got = [r["bi"] for r in df.collect()]
    assert got[0] == [] and got[1] == []
    assert got[2] == ["two words"]
    assert got[3] == ["a b", "b a", "a b"]


def test_repetition_line_features(spark):
    from linkinator_spark.functions.text import repetition_line_features

    feats = repetition_line_features(F.col("text"))
    df = spark.createDataFrame(
        [("x\ny\nx",), ("a\nb",), ("solo",)], ["text"]
    ).select(feats["n_lines"].alias("n"), feats["dup_line_frac"].alias("f"))
    got = df.collect()
    assert (got[0]["n"], got[0]["f"]) == (3, 0.333333)
    assert (got[1]["n"], got[1]["f"]) == (2, 0.0)
    assert (got[2]["n"], got[2]["f"]) == (1, 0.0)


def test_pii_counts_and_redaction_order(spark):
    """Email must redact before IPv4 (digits in local parts) and IPv4
    before phone (so dotted quads never feed the phone class)."""
    from linkinator_spark.functions.text import pii_counts, redact_pii

    text = ("mail bob42@host.example.org or root@10.1.2.3 box, "
            "server 192.168.0.1 up, call +1 555 0100 22 33 now")
    c = pii_counts(F.col("text"))
    df = spark.createDataFrame([(text,)], ["text"]).select(
        c["n_emails"].alias("e"), c["n_ips"].alias("i"),
        c["n_phones"].alias("p"),
        redact_pii(F.col("text")).alias("red"),
    )
    r = df.collect()[0]
    # root@10.1.2.3 is NOT an email (no alphabetic TLD) — its quad falls
    # through to the IPv4 pass, which is why IP must redact before phone
    assert (r["e"], r["i"], r["p"]) == (1, 2, 1)
    assert r["red"] == ("mail <EMAIL> or root@<IP> box, server <IP> up, "
                        "call <PHONE> now")


def test_word_ngrams_and_decontaminate(spark):
    from linkinator_spark.functions.text import word_ngrams

    df = spark.createDataFrame(
        [("a b c d",), ("a b c",), ("x y",)], ["text"]
    ).select(word_ngrams(F.col("text"), 3).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b c"]
    assert got[2] == []  # <n words -> empty, not a descending-sequence pair

    # a train doc that quotes 8+ words of an eval doc must be flagged
    import __spark_entry__ as E
    import os
    import tempfile

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, eval_text, "en", "w", len(eval_text)),        # doc 0: eval split
        (1, "clean words only here nothing shared at all today folks",
         "en", "w", 10),
        (2, "quoted: " + eval_text + " end", "en", "w", 10),  # contaminated
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: (r["n_shared"], r["contaminated"])
               for r in E.q_decontaminate(spark, d).collect()}
    assert out[1] == (0, False)
    assert out[2][0] >= 3 and out[2][1] is True
    assert 0 not in out  # eval docs are not re-reported

    # a doc too short for any 8-gram cannot be contaminated — it must
    # still be REPORTED (n_shared 0), not silently dropped by the gram
    # explode; corpus_build relies on this to keep short docs
    rows.append((3, "short title only", "en", "w", 16))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out2 = {r["doc_id"]: (r["n_shared"], r["contaminated"])
                for r in E.q_decontaminate(spark, d).collect()}
    assert out2[3] == (0, False)


def test_pack_shards_deterministic_and_correct(spark):
    """Sequence-packing layout: bit-identical under reshuffle, and equal
    to a pandas twin of the greedy per-bucket cut."""
    from linkinator_spark.functions.sampling import pack_shards
    from linkinator_spark.functions.text import portable_hash64

    docs = spark.range(0, 700).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(90)) + 10).alias("n_tokens"),
    )
    got = pack_shards(docs, max_tokens=200, n_buckets=4).collect()
    again = pack_shards(docs.repartition(11), max_tokens=200,
                        n_buckets=4).collect()
    key = lambda rows: sorted((r["id"], r["bucket"], r["shard_seq"],
                               r["shard_id"]) for r in rows)
    assert key(got) == key(again)

    # pandas twin of the greedy cut, over the same portable hash
    hashes = {r["doc_id"]: r["h"] for r in docs.select(
        "doc_id", portable_hash64(F.col("doc_id").cast("string"),
                                  prefix="pack:").alias("h")).collect()}
    toks = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    expected = {}
    buckets: dict = {}
    for d, h in hashes.items():
        buckets.setdefault(h % 4, []).append((h, d))
    for b, items in buckets.items():
        cum = 0
        for h, d in sorted(items):
            expected[d] = (b, (cum // 200))
            cum += toks[d]
    assert {r["id"]: (r["bucket"], r["shard_seq"]) for r in got} == expected
    # shard_id embeds the bucket uniquely (2^48 stride: see docstring)
    assert all(r["shard_id"] == r["bucket"] * 2**48 + r["shard_seq"]
               for r in got)
    with pytest.raises(ValueError):
        pack_shards(docs, max_tokens=200, n_buckets=65536)


def test_pii_ssn_and_card_classes(spark):
    """SSN redacts before card (9 digits can never match the 13-19 digit
    card class, but order is pinned anyway); separators inside card
    numbers (space or dash) are covered; a bare 12-digit run is neither."""
    from linkinator_spark.functions.text import pii_counts, redact_pii

    text = ("ssn 123-45-6789 here, card 4111 1111 1111 1234 and "
            "4111-1111-1111-1234 too, ref 123456789012 stays")
    c = pii_counts(F.col("text"))
    df = spark.createDataFrame([(text,)], ["text"]).select(
        c["n_ssns"].alias("s"), c["n_cards"].alias("k"),
        redact_pii(F.col("text")).alias("red"))
    r = df.collect()[0]
    assert (r["s"], r["k"]) == (1, 2)
    assert r["red"] == ("ssn <SSN> here, card <CARD> and <CARD> too, "
                        "ref 123456789012 stays")


def test_word_ngram_hashes_matches_string_grams(spark):
    """The fast tuple-hash gram path must agree with the string-gram path
    on gram COUNT per doc and on cross-doc equality structure: two docs
    share k distinct string 8-grams iff they share k distinct hashes."""
    from linkinator_spark.functions.text import (word_ngram_hashes,
                                                 word_ngrams)

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "X alpha beta gamma delta epsilon zeta eta theta Y"),
        (3, "unrelated words that share nothing with the others at all"),
        (4, "short doc"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = word_ngram_hashes(df, "text", 8)
    slow = df.select("doc_id",
                     F.explode(word_ngrams(F.col("text"), 8)).alias("g"))
    n_fast = {r["doc_id"]: r["n"] for r in
              fast.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_slow = {r["doc_id"]: r["n"] for r in
              slow.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert n_fast == n_slow

    def overlap(pairs_df, col):
        a = pairs_df.filter(F.col("doc_id") == 1).select(col).distinct()
        b = pairs_df.filter(F.col("doc_id") == 2).select(col).distinct()
        return a.intersect(b).count()

    # docs 1/2 share exactly the one aligned 8-word window
    assert overlap(fast, "gram") == overlap(slow, "g") == 1


def test_duplicate_spans_planted_passage(spark):
    """A 60-token passage shared verbatim between two otherwise-distinct
    ~200-word docs is found at the k=50 default (Lee et al. 2022 shape):
    both carriers flag has_dup_span with n_dup_windows == 11 (60-50+1),
    while unrelated docs and <k-token docs report (0, false)."""
    from linkinator_spark.functions.dedup import duplicate_spans

    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]

    def words(n, salt):
        r = random.Random(salt)
        return " ".join(r.choice(vocab) for _ in range(n))

    passage = " ".join(f"p{i}" for i in range(60))
    rows = [
        # two distinct docs sharing ONLY the planted passage
        (1, words(100, 1) + " " + passage + " " + words(40, 11)),
        (2, words(70, 2) + " " + passage + " " + words(70, 22)),
        # a long doc with no shared content
        (3, words(200, 3)),
        # too short to produce any 50-token window
        (4, words(20, 4)),
    ]
    out = {r["doc_id"]: r for r in duplicate_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=50
    ).collect()}

    assert out[1]["has_dup_span"] and out[2]["has_dup_span"]
    # the only 50-windows common to docs 1 and 2 are those fully inside
    # the 60-token passage: 60 - 50 + 1 = 11
    assert out[1]["n_dup_windows"] == 11
    assert out[2]["n_dup_windows"] == 11
    assert out[1]["n_windows"] == 100 + 60 + 40 - 49
    assert not out[3]["has_dup_span"] and out[3]["n_dup_windows"] == 0
    assert out[4]["n_windows"] == 0 and not out[4]["has_dup_span"]


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    """A window repeated only WITHIN one doc is not cross-doc duplicated;
    but when a window IS duplicated across docs, every occurrence counts."""
    from linkinator_spark.functions.dedup import duplicate_spans

    span = " ".join(f"s{i}" for i in range(10))  # exactly one 10-window
    filler_a = " ".join(f"a{i}" for i in range(10))
    filler_b = " ".join(f"b{i}" for i in range(10))
    filler_c = " ".join(f"c{i}" for i in range(10))
    rows = [
        # doc 1 repeats the span twice internally; doc 2 carries it once
        (1, span + " " + filler_a + " " + span),
        (2, filler_b + " " + span),
        # doc 3 repeats ITS OWN private span twice — never flagged
        (3, filler_c + " " + filler_c),
    ]
    # k=10 so only the exact planted spans align across docs
    out = {r["doc_id"]: r for r in duplicate_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=10
    ).collect()}

    assert out[1]["has_dup_span"] and out[2]["has_dup_span"]
    # doc1's two occurrences of the cross-doc span both count...
    assert out[1]["n_dup_windows"] >= 2
    # ...but doc3's purely internal repeat does not flag it
    assert not out[3]["has_dup_span"]


def test_bpe_token_count_semantics(spark):
    """Greedy lowest-rank-first merges: 'the' collapses via (t,h)->(th,e)
    to ONE token; unmergeable words stay one token per char; counting is
    case-normalized and null-safe."""
    from linkinator_spark.functions.tokenize import (
        DEFAULT_MERGES, bpe_token_count, bpe_word_tokens,
    )

    ranks = {p: i for i, p in enumerate(DEFAULT_MERGES)}
    assert bpe_word_tokens("the", ranks) == 1
    assert bpe_word_tokens("and", ranks) == 1
    assert bpe_word_tokens("xq", ranks) == 2       # no merge applies
    assert bpe_word_tokens("z", ranks) == 1

    rows = [(1, "the and"), (2, "THE"), (3, "xq z"), (4, None)]
    out = {r["doc_id"]: r["n"] for r in spark.createDataFrame(
        rows, "doc_id long, text string"
    ).select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert out[1] == 2 and out[2] == 1 and out[3] == 3 and out[4] == 0


def test_pack_shards_pluggable_tokenizer_inflation(spark):
    """Packing under a 2x-inflating tokenizer is EXACTLY packing the
    original counts at half the budget (cumsums scale linearly), so a
    tokenizer swap changes the layout through `tokens_col` alone — and
    per-shard doc counts drop to ~half."""
    from linkinator_spark.functions.sampling import pack_shards

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(90)) + 10).alias("n_tokens"))
    inflated = docs.withColumn("n_tokens", F.col("n_tokens") * 2)

    base = pack_shards(docs, max_tokens=512, n_buckets=8)
    doubled = pack_shards(inflated, max_tokens=512, n_buckets=8)
    halved_budget = pack_shards(docs, max_tokens=256, n_buckets=8)

    assert doubled.orderBy("id").collect() == \
        halved_budget.orderBy("id").collect()

    def docs_per_shard(df):
        n_docs = df.count()
        n_shards = df.select("shard_id").distinct().count()
        return n_docs / n_shards

    b, d = docs_per_shard(base), docs_per_shard(doubled)
    assert d < 0.62 * b, f"expected ~halved docs/shard, got {b} -> {d}"


# ---------------------------------------------------------------- domain cap

def test_domain_cap_equals_naive_window_and_is_deterministic(spark):
    """Two-phase skew-safe top-K == naive row_number() OVER (PARTITION BY
    domain) on a skewed corpus; selection stable under reshuffle; stripe
    count never changes the kept set."""
    from pyspark.sql import Window

    from linkinator_spark.functions.sampling import domain_cap
    from linkinator_spark.functions.text import portable_hash64

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        # hot domain holds 80% of the corpus
        F.when(F.col("id") % 5 != 0, F.lit("hot.example"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 7).cast("string")))
        .alias("host"),
        (F.col("id") * 37 % 211).alias("score"),
    )
    got = domain_cap(docs, cap=25, domain_col="host", id_col="doc_id",
                     score_col="score").collect()

    h = portable_hash64(F.col("doc_id").cast("string"), prefix="cap:")
    w = Window.partitionBy("host").orderBy(
        F.desc("score"), h.asc(), F.asc("doc_id"))
    naive = (docs.withColumn("cap_rank", F.row_number().over(w).cast("long"))
             .filter(F.col("cap_rank") <= 25)
             .select(F.col("doc_id").alias("id"),
                     F.col("host").alias("domain"), "cap_rank").collect())
    key = lambda rows: sorted((r["id"], r["domain"], r["cap_rank"])
                              for r in rows)
    assert key(got) == key(naive)
    # hot domain is actually capped; small domains are not
    per = {}
    for r in got:
        per[r["domain"]] = per.get(r["domain"], 0) + 1
    assert per["hot.example"] == 25
    assert all(v <= 25 for v in per.values())

    # invariant under physical layout and stripe count
    again = domain_cap(docs.repartition(13), cap=25, domain_col="host",
                       id_col="doc_id", score_col="score",
                       stripes=7).collect()
    assert key(again) == key(got)

    # hash-order variant (no score): still exact-cap and deterministic
    nos = domain_cap(docs, cap=10, domain_col="host").collect()
    nos2 = domain_cap(docs.repartition(3), cap=10, domain_col="host",
                      stripes=256).collect()
    assert key(nos) == key(nos2)
    assert sum(1 for r in nos if r["domain"] == "hot.example") == 10


def test_remove_duplicate_spans_cuts_passage_and_passes_clean_docs(spark):
    """The removal half of Lee et al.: exactly the 60 planted passage
    tokens are cut from both carriers (duplicated 50-windows cover the
    passage and nothing else), unrelated docs pass through unchanged,
    and a full-duplicate pair collapses to empty."""
    import random

    from linkinator_spark.functions.dedup import remove_duplicate_spans

    vocab = [f"w{i}" for i in range(5000)]

    def words(n, salt):
        r = random.Random(salt)
        return " ".join(r.choice(vocab) for _ in range(n))

    passage = " ".join(f"p{i}" for i in range(60))
    pre1, post1 = words(100, 1), words(40, 11)
    pre2, post2 = words(70, 2), words(70, 22)
    clone = words(80, 5)
    rows = [
        (1, pre1 + " " + passage + " " + post1),
        (2, pre2 + " " + passage + " " + post2),
        (3, words(200, 3)),
        (4, clone),
        (5, clone),
    ]
    out = {r["id"]: r for r in remove_duplicate_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=50
    ).collect()}

    assert out[1]["clean_text"] == pre1 + " " + post1
    assert out[1]["n_removed"] == 60 and out[1]["n_tokens"] == 200
    assert out[2]["clean_text"] == pre2 + " " + post2
    assert out[2]["n_removed"] == 60
    assert out[3]["clean_text"] == rows[2][1] and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 80
    assert out[5]["clean_text"] == ""


def test_incremental_near_dups_batch_vs_corpus(spark):
    """Cross-corpus LSH: each perturbed batch doc pairs with exactly its
    source corpus doc; novel docs and corpus-internal duplicate pairs
    never appear (the corpus is not re-paired against itself)."""
    from linkinator_spark.functions.dedup import incremental_near_dups

    base = "the quick brown fox jumps over the lazy dog " * 6
    corpus = spark.createDataFrame(
        [(1, base), (2, base.replace("fox", "cat", 2)),
         (3, "an entirely different standing document " * 6)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(101, base + " tail marker"),                  # near-dup of 1 (and 2)
         (103, "novel content nothing shares this " * 6)],
        "doc_id long, text string")
    got = incremental_near_dups(batch, corpus, threshold=0.5).collect()
    pairs = {(r["new_id"], r["corpus_id"]) for r in got}
    assert (101, 1) in pairs
    assert all(n != 103 for n, _ in pairs)          # novel doc stays novel
    assert all(n >= 100 for n, _ in pairs)          # no corpus self-pairs
    for r in got:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_license_detect_classes_and_precedence(spark):
    """Each class detects from its markers; CC precedence is
    most-restrictive-first (by-nc-sa text classifies as by-nc, plain
    /licenses/by never steals by-sa); matching is case-insensitive;
    unmarked text is 'none'."""
    from pyspark.sql import functions as F

    from linkinator_spark.functions.text import license_detect

    cases = [
        ("See creativecommons.org/licenses/by-nc-sa/4.0", "cc-by-nc"),
        ("under Creativecommons.org/licenses/by-sa/3.0", "cc-by-sa"),
        # no-derivatives must NOT classify as permissive cc-by (its URL
        # contains the generic /licenses/by prefix)
        ("see creativecommons.org/licenses/by-nd/4.0", "cc-by-nd"),
        ("shared CC BY-ND 3.0", "cc-by-nd"),
        ("restricted CC BY-NC-ND 4.0 terms", "cc-by-nc"),
        ("CREATIVECOMMONS.ORG/LICENSES/BY/4.0", "cc-by"),
        ("released as CC0 1.0", "cc0"),
        ("The MIT License applies", "mit"),
        ("Apache License, Version 2.0", "apache"),
        ("GNU General Public License v3", "gpl"),
        ("(c) 2024 All Rights Reserved", "all-rights-reserved"),
        ("just some ordinary text", "none"),
        # ARR boilerplate must not override an explicit CC grant
        ("All rights reserved except as licensed under "
         "creativecommons.org/licenses/by/4.0", "cc-by"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r.lic for r in
           df.select(license_detect(F.col("t")).alias("lic")).collect()]
    assert got == [want for _, want in cases]
