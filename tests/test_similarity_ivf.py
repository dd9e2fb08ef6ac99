"""IVF ANN contract (functions/similarity.py):

* full probe (nprobe == n_lists) is EXACTLY cosine_topk — the index can
  only drop candidates, so probing every cell must reproduce brute force
* every corpus vector is assigned to exactly one cell, every cell id is
  in the codebook
* Lloyd refinement keeps the codebook geometry (n_lists rows, dim dims)
  and never breaks the full-probe-equals-exact invariant
* planted near-duplicate retrieval (the 100-TB use case) reaches recall
  1.0 at nprobe=2
"""

import pyspark.sql.functions as F
import pytest

import linkinator_spark.functions.similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")


def _pairs(df):
    return {(r.query_id, r.rank): r.neighbor_id for r in df.collect()}


def test_full_probe_equals_exact(emb, queries):
    exact = _pairs(S.cosine_topk(emb, queries, k=5))
    full = _pairs(S.ivf_topk(emb, queries, k=5, n_lists=8, nprobe=8))
    assert full == exact and len(exact) > 0


def test_assignment_partitions_corpus(emb):
    cents = S.ivf_centroids(emb, n_lists=8)
    assert cents.count() == 8
    vecs = emb.select(F.col("vec_id").alias("vid"),
                      F.col("embedding").cast("array<double>").alias("v"))
    assign = S._nearest_lists(vecs, cents, 1)
    n = emb.count()
    assert assign.count() == n  # one cell per vector
    assert assign.select("vid").distinct().count() == n
    lists = {r.list_id for r in assign.select("list_id").distinct().collect()}
    assert lists <= set(range(1, 9))


def test_lloyd_refinement_keeps_contract(emb, queries):
    cents = S.ivf_centroids(emb, n_lists=8, iters=2)
    assert cents.count() == 8
    dims = cents.select(F.size("centroid").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64]
    exact = _pairs(S.cosine_topk(emb, queries, k=5))
    full = _pairs(S.ivf_topk(emb, queries, k=5, n_lists=8, nprobe=8, iters=2))
    assert full == exact


def test_planted_neardup_recall(spark):
    import __spark_entry__ as e

    corpus = e._ann_corpus(spark, SF_DIR)
    queries = corpus.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2_000_000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    want = {(r.query_id, r.neighbor_id)
            for r in S.cosine_topk(corpus, queries, k=5).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in S.ivf_topk(corpus, queries, k=5, n_lists=16,
                               nprobe=2).collect()}
    assert len(want) > 0
    assert len(got & want) / len(want) == 1.0


def test_assignment_gears_identical(spark, emb):
    cents = S.ivf_centroids(emb, n_lists=8).localCheckpoint(eager=True)
    vecs = emb.select(F.col("vec_id").alias("vid"),
                      F.col("embedding").cast("array<double>").alias("v"))
    sql = {(r.vid, r.list_id)
           for r in S._nearest_lists(vecs, cents, 1).collect()}
    arrow = {(r.vid, r.list_id)
             for r in S._nearest_lists_arrow(vecs, cents, 1).collect()}
    assert sql == arrow and len(sql) == emb.count()
    sql3 = {(r.vid, r.list_id)
            for r in S._nearest_lists(vecs, cents, 3).collect()}
    arrow3 = {(r.vid, r.list_id)
              for r in S._nearest_lists_arrow(vecs, cents, 3).collect()}
    assert sql3 == arrow3


def test_kmeans_train_reshuffle_deterministic(emb):
    """The exact-integer Lloyd rounds must yield a byte-identical codebook
    regardless of input partitioning — the claim that makes the oracle
    (and cross-cluster reproducibility) possible."""
    a = {r.list_id: r.centroid_micro
         for r in S.kmeans_train(emb, n_lists=6, iters=2).collect()}
    b = {r.list_id: r.centroid_micro
         for r in S.kmeans_train(
             emb.repartition(13, "label"), n_lists=6, iters=2).collect()}
    assert a == b
    assert len(a) <= 6 and all(len(v) == 64 for v in a.values())


def test_kmeans_train_zero_iters_is_quantized_seeds(emb):
    out = {r.list_id: r.centroid_micro
           for r in S.kmeans_train(emb, n_lists=3, iters=0).collect()}
    seeds = emb.orderBy("vec_id").limit(3).collect()
    for i, row in enumerate(seeds, start=1):
        expect = [round(float(x) * S.KMEANS_QUANT) for x in row.embedding]
        assert out[i] == expect
