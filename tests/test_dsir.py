"""DSIR importance resampling (functions/dsir.py): weight semantics,
Gumbel-top-k determinism, and the scale-shape contract."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from linkinator_spark.functions.dsir import (  # noqa: E402
    dsir_select,
    dsir_weights,
)

EN = "the cat sat on the mat and the dog sat on the rug with the cat"
DE = "der hund sitzt auf der matte und die katze sitzt auf dem teppich"


def _corpus(spark):
    rows = [(i, EN if i % 2 == 0 else DE) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_weigh_higher(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)  # the English half
    w = {r["doc_id"]: r["logw_micro"]
         for r in dsir_weights(target, docs, docs, n_buckets=64).collect()}
    en = [w[i] for i in range(0, 40, 2)]
    de = [w[i] for i in range(1, 40, 2)]
    assert min(en) > max(de)


def test_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, EN), (2, ""), (3, "word")], "doc_id long, text string")
    w = {r["doc_id"]: (r["n_grams"], r["logw_micro"])
         for r in dsir_weights(docs, docs, docs, n_buckets=64).collect()}
    assert w[2] == (0, 0)
    assert w[3] == (0, 0)  # one word -> no bigram
    assert w[1][0] > 0


def test_select_is_deterministic(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    a = [(r["doc_id"], r["rank"]) for r in
         dsir_select(target, docs, k=10, n_buckets=64).collect()]
    b = [(r["doc_id"], r["rank"]) for r in
         dsir_select(target, docs.repartition(7), k=10,
                     n_buckets=64).collect()]
    assert a == b
    assert len(a) == 10
    assert [r for _, r in a] == list(range(1, 11))


def test_salt_changes_draw_not_weights(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    a = dsir_select(target, docs, k=10, n_buckets=64, salt="s1").collect()
    b = dsir_select(target, docs, k=10, n_buckets=64, salt="s2").collect()
    wa = {r["doc_id"]: r["logw_micro"] for r in a}
    wb = {r["doc_id"]: r["logw_micro"] for r in b}
    for d in set(wa) & set(wb):
        assert wa[d] == wb[d]
    assert ({r["doc_id"] for r in a} != {r["doc_id"] for r in b}
            or [r["doc_id"] for r in a] != [r["doc_id"] for r in b])


def test_selection_favors_target_like_docs(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    picked = {r["doc_id"] for r in
              dsir_select(target, docs, k=10, n_buckets=64).collect()}
    # English docs carry overwhelmingly larger weights here, so the
    # resample should be all (or nearly all) even ids
    assert sum(1 for d in picked if d % 2 == 0) >= 9


def test_k_larger_than_corpus(spark):
    docs = spark.createDataFrame(
        [(1, EN), (2, DE)], "doc_id long, text string")
    out = dsir_select(docs, docs, k=10, n_buckets=64).collect()
    assert len(out) == 2
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_topk_plans_take_ordered_not_global_sort(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 0)
    plan = dsir_select(target, docs, k=5, n_buckets=64)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
