"""Hashed TF-IDF sparse vectorization (the "hashing trick").

The feature extractor a lexical pipeline runs before clustering,
classification, or near-dup scoring when no trained embedding model is
available: token -> feature index via a fixed hash modulo `n_features`
(Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning"), weight = tf * idf. No vocabulary object is ever built or
broadcast — the hash IS the vocabulary, which is what makes the trick
viable at 10^9-token vocabularies where a dictionary would not fit.

Determinism: idf rounds to integer MICRO-log units per token before any
multiplication (the lm.py contract), tf is an integer count, and hash
collisions within a document sum integer weights — so every output cell
is an exact int64, bit-identical across engines and partitionings.
Output is SPARSE triples (id, feature, weight_micro): dense
array<float> output would bury the determinism in float formatting and
waste space at 2^18 features.

Scale shape (100-TB lens):
- tf is a map-side-combined groupBy on (doc, token); df likewise on
  token. Hot tokens ("the") partial-aggregate in the combiner.
- The token -> idf join keys on the token; frequent-token probe skew is
  AQE skew-join territory (on by default), same as lm.py scoring.
- N (corpus doc count) is the only scalar that crosses stages, via a
  1-row broadcast. Nothing driver-side, no global sort, no vocabulary
  table proportional to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import (
    normalize_text,
    portable_hash64,
    portable_hash64_sql,
)

__all__ = ["tfidf_sparse", "tfidf_sparse_oracle_sql"]


def tfidf_sparse(
    docs: DataFrame, n_features: int = 1 << 18,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(id, feature:int, weight_micro:int64) sparse TF-IDF triples.

    feature = portable_hash64(token) mod n_features; weight_micro =
    sum over colliding tokens of tf * round(ln((N+1)/(df+1)) * 1e6)
    (add-one smoothed idf — a token in every doc still gets a positive
    weight, and an unseen df can never divide by zero). Tokens are
    `normalize_text` words, the same tokenization as the dedup/LM
    families.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    tf = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(words).alias("tok"))
        .groupBy("id", "tok").agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.select(
        F.count("*").alias("n")).withColumn("_k", F.lit(1))
    idf = (
        df_t.withColumn("_k", F.lit(1))
        .join(F.broadcast(n_docs), "_k")
        .select(
            "tok",
            F.round(F.log((F.col("n") + 1) / (F.col("df") + 1)) * 1e6, 0)
            .cast("long").alias("idf_micro"))
    )
    return (
        tf.join(idf, "tok")
        .select(
            "id",
            F.pmod(portable_hash64(F.col("tok"), prefix="feat:"),
                   F.lit(int(n_features))).cast("int").alias("feature"),
            (F.col("tf") * F.col("idf_micro")).alias("_w"))
        .groupBy("id", "feature")
        .agg(F.sum("_w").cast("long").alias("weight_micro"))
        .select(F.col("id").alias(id_col), "feature", "weight_micro")
    )


def tfidf_sparse_oracle_sql(
    n_features: int = 1 << 18, docs_table: str = "documents",
) -> str:
    """DuckDB twin: same tokenization, smoothed micro-idf, feature hash,
    and collision-summed integer weights."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    feat = portable_hash64_sql("tok", prefix="feat:")
    return f"""
        with tf as (
          select id, tok, count(*) as tf from (
            select doc_id as id, unnest(string_split({norm}, ' ')) as tok
            from {docs_table}
          ) group by id, tok
        ),
        dft as (select tok, count(*) as df from tf group by tok),
        n as (select count(*) as n from {docs_table}),
        idf as (
          select tok,
                 round(ln((n + 1)::double / (df + 1)) * 1e6)::bigint
                   as idf_micro
          from dft cross join n
        )
        select id as doc_id,
               cast({feat} % {int(n_features)} as integer) as feature,
               sum(tf * idf_micro)::bigint as weight_micro
        from tf join idf using (tok)
        group by 1, 2
    """
