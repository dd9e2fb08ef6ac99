"""Hashed TF-IDF sparse vectorization contract (functions/vectorize.py):

* hand-computed micro-idf weights on a tiny corpus match exactly
* hash collisions SUM integer weights (never overwrite / drop)
* the smoothed idf keeps a token present in every doc at weight > 0
* output is reshuffle-stable and covers exactly the non-empty docs
"""

import math

import pyspark.sql.functions as F

from linkinator_spark.functions.text import portable_hash64
from linkinator_spark.functions.vectorize import tfidf_sparse


def test_hand_computed_weights(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "a b")], "doc_id long, text string")
    # df: a=3, b=2, c=1; N=3
    out = tfidf_sparse(docs, n_features=1 << 18).collect()
    idf = {t: round(math.log((3 + 1) / (df + 1)) * 1e6)
           for t, df in (("a", 3), ("b", 2), ("c", 1))}
    feats = {t: r for t, r in zip(
        ("a", "b", "c"),
        spark.createDataFrame([("a",), ("b",), ("c",)], "tok string")
        .select(F.pmod(portable_hash64(F.col("tok"), prefix="feat:"),
                       F.lit(1 << 18)).cast("int").alias("f"))
        .toPandas()["f"])}
    got = {(r["doc_id"], r["feature"]): r["weight_micro"] for r in out}
    assert got[(1, feats["a"])] == 2 * idf["a"]  # tf=2
    assert got[(1, feats["b"])] == idf["b"]
    assert got[(2, feats["c"])] == idf["c"]
    # smoothed idf: "a" in every doc still weighs ln(4/4)=0 -> 0 here;
    # that's the one token allowed to hit zero, b and c must not
    assert got[(2, feats["a"])] == 0 and idf["b"] > 0 and idf["c"] > 0


def test_collisions_sum_not_overwrite(spark):
    # n_features=1 forces every token into feature 0: the cell must be
    # the SUM of all token weights in the doc
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in tfidf_sparse(docs, n_features=1).collect()}
    idf = {t: round(math.log((2 + 1) / (df + 1)) * 1e6)
           for t, df in (("x", 2), ("y", 1), ("z", 1))}
    assert out[1]["feature"] == 0
    assert out[1]["weight_micro"] == idf["x"] + idf["y"] + idf["z"]
    assert out[2]["weight_micro"] == idf["x"]


def test_reshuffle_stable(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 13} tok{i % 7} common") for i in range(200)],
        "doc_id long, text string")
    a = {(r["doc_id"], r["feature"], r["weight_micro"])
         for r in tfidf_sparse(docs, n_features=64).collect()}
    b = {(r["doc_id"], r["feature"], r["weight_micro"])
         for r in tfidf_sparse(docs.repartition(17), n_features=64).collect()}
    assert a == b and len(a) > 0
