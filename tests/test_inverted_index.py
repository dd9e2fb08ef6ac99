"""Inverted index (search.inverted_index): posting correctness, salt
invariance (the hot-key spread must not change the result), min_df."""
import pyspark.sql.functions as F

from linkinator_spark.functions.search import inverted_index


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog"),
         (10, "cat cat CAT!"),
         (3, "unique hapax")],
        "doc_id long, text string")


def test_postings_positions_and_order(spark):
    out = {r.term: r for r in inverted_index(_docs(spark)).collect()}
    assert out["cat"].postings == ["000000000001@1", "000000000010@0.1.2"]
    assert out["cat"].df == 2 and out["cat"].total_tf == 4
    assert out["the"].postings == ["000000000001@0.4", "000000000002@0"]
    assert out["hapax"].df == 1


def test_min_df_prunes(spark):
    terms = {r.term for r in inverted_index(_docs(spark), min_df=2).collect()}
    assert terms == {"cat", "the"}


def test_salt_invariance_on_hot_term(spark):
    # 200 docs all containing the hot term: salt=1 (single reducer) and
    # salt=16 (bucketed merge) must produce identical posting lists
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hot word"), (F.col("id") % 7).cast("string"))
        .alias("text"))
    a = {r.term: (r.df, r.total_tf, r.postings)
         for r in inverted_index(docs, salt=1).collect()}
    b = {r.term: (r.df, r.total_tf, r.postings)
         for r in inverted_index(docs, salt=16).collect()}
    assert a == b
    assert a["hot"][0] == 200
    assert a["hot"][2][0] == "000000000000@0"
    assert a["hot"][2][-1] == "000000000199@0"
