"""SemDeDup contract (functions/similarity.semantic_dedup):

* planted exact copies are ALL dropped, each with dup_of = its original
  (identical vectors provably share a cell -> recall 1 on exact copies)
* originals survive (greedy min-id keeper keeps the smallest id)
* a planted NEAR-duplicate (small perturbation, cosine > eps) in the same
  cell is pruned too — the prune thresholds on cosine, not equality
* the Arrow-GEMM and SQL assignment gears produce identical results
* every input vector appears exactly once in the output
"""

import pyspark.sql.functions as F
import pytest

import linkinator_spark.functions.similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    return emb.unionByName(dup)


@pytest.fixture(scope="module")
def result(corpus):
    return S.semantic_dedup(corpus, n_lists=16, eps=0.999).cache()


def test_exact_copies_dropped_with_original_as_keeper(result):
    rows = {r.vec_id: r for r in result.collect()}
    originals = [v for v in rows if v < 1_000_000 and v % 25 == 0]
    assert originals
    for v in originals:
        copy = rows[v + 1_000_000]
        assert copy.kept == 0 and copy.dup_of == v
        assert rows[v].kept == 1 and rows[v].dup_of == -1
        # copies cluster with their original by construction
        assert copy.list_id == rows[v].list_id


def test_output_covers_corpus_once(corpus, result):
    n = corpus.count()
    assert result.count() == n
    assert result.select("vec_id").distinct().count() == n


def test_near_duplicate_pruned(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")
    # perturb one coordinate by 0.1%: cosine stays >> 0.999 but the
    # vector is not byte-identical — the prune must still catch it
    near = emb.filter(F.col("vec_id") == 7).select(
        F.lit(2_000_007).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x * 1.001).otherwise(x)
        ).alias("embedding"))
    out = S.semantic_dedup(emb.unionByName(near), n_lists=8, eps=0.999)
    row = out.filter(F.col("vec_id") == 2_000_007).collect()[0]
    assert row.kept == 0 and row.dup_of == 7


def test_assignment_gears_identical(corpus):
    a = S.semantic_dedup(corpus, n_lists=16, eps=0.999, assign_gear="arrow")
    b = S.semantic_dedup(corpus, n_lists=16, eps=0.999, assign_gear="sql")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_bad_gear_rejected(corpus):
    with pytest.raises(ValueError):
        S.semantic_dedup(corpus, assign_gear="mystery")
