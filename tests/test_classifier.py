"""Hashed linear classifier inference contract (functions/classifier.py):

* a planted weights table yields hand-computable integer scores
* the keep bit is the cross-multiplied MEAN threshold (no float division)
* bias contributes per token (bias_micro * n_tokens)
* pseudo-weights are dense over [0, n_features) and within [-span, span]
* the model side of the join is physically broadcast
"""

import pyspark.sql.functions as F

from linkinator_spark.functions.classifier import (
    classifier_score,
    hashed_weights,
)
from linkinator_spark.functions.text import portable_hash64


def _feat(spark, toks, n_features):
    rows = (
        spark.createDataFrame([(t,) for t in toks], "tok string")
        .select("tok",
                F.pmod(portable_hash64(F.col("tok"), prefix="feat:"),
                       F.lit(n_features)).cast("int").alias("f"))
        .collect()
    )
    return {r["tok"]: r["f"] for r in rows}


def test_hand_computed_scores(spark):
    n = 8
    feats = _feat(spark, ["a", "b", "c"], n)
    # plant w[feat(a)]=10, w[feat(b)]=-4, w[feat(c)]=0, rest 0 — if two
    # tokens collide under mod 8 the planted table sums their weights at
    # build time exactly like inference would, so pick weights per feature.
    w = {feats["a"]: 10, feats["b"]: -4}
    weights = spark.createDataFrame(
        [(i, w.get(i, 0)) for i in range(n)], "feature int, w_micro long")
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b b"), (3, "c")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           classifier_score(docs, weights, n, threshold_micro=0).collect()}
    if feats["a"] != feats["b"]:  # no collision: exact hand values
        assert out[1]["score_sum_micro"] == 10 + 10 - 4
        assert out[2]["score_sum_micro"] == -8
    assert out[1]["n_tokens"] == 3
    assert out[2]["keep"] is (out[2]["score_sum_micro"] > 0)
    assert out[3]["n_tokens"] == 1


def test_threshold_is_mean_not_sum(spark):
    n = 4
    f = _feat(spark, ["x"], n)["x"]
    weights = spark.createDataFrame(
        [(i, 5 if i == f else 0) for i in range(n)],
        "feature int, w_micro long")
    # both docs have mean score 5; threshold 4 keeps both, 5 keeps none —
    # a sum-based gate would treat the 3-token doc differently.
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x x x")], "doc_id long, text string")
    keep4 = {r["doc_id"]: r["keep"] for r in
             classifier_score(docs, weights, n, threshold_micro=4).collect()}
    keep5 = {r["doc_id"]: r["keep"] for r in
             classifier_score(docs, weights, n, threshold_micro=5).collect()}
    assert keep4 == {1: True, 2: True}
    assert keep5 == {1: False, 2: False}


def test_bias_scales_with_tokens(spark):
    n = 4
    weights = spark.createDataFrame(
        [(i, 0) for i in range(n)], "feature int, w_micro long")
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x x x")], "doc_id long, text string")
    out = {r["doc_id"]: r["score_sum_micro"] for r in
           classifier_score(docs, weights, n, bias_micro=7).collect()}
    assert out == {1: 7, 2: 21}


def test_pseudo_weights_dense_and_bounded(spark):
    w = hashed_weights(spark, n_features=256, span_micro=50)
    rows = w.collect()
    assert sorted(r["feature"] for r in rows) == list(range(256))
    assert all(-50 <= r["w_micro"] <= 50 for r in rows)
    # not degenerate: both signs occur
    assert any(r["w_micro"] > 0 for r in rows)
    assert any(r["w_micro"] < 0 for r in rows)


def test_model_join_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    w = hashed_weights(spark, n_features=64)
    plan = classifier_score(docs, w, 64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
