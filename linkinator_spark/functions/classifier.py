"""Model-based quality filtering: hashed linear (fastText-style) classifier
inference over bag-of-words features.

The curation step every modern pretraining pipeline runs after the heuristic
gates (Gopher rules, C4 line rules, CCNet perplexity): score each document
with a small trained classifier — fastText in CCNet and DCLM ("DataComp-LM",
Li et al. 2024), a linear head in FineWeb-Edu (Penedo et al. 2024) — and keep
documents above a threshold. Inference over a linear bag-of-words model is
exactly a hashed-feature dot product, which Spark expresses without any
Python in the hot path:

    tokens -> feature = hash(token) mod n_features        (codegen)
    join broadcast(weights)                               (model fan-out)
    groupBy(doc).sum                                      (map-side combine)
    keep = score/n_tokens > threshold                     (cross-multiplied)

Determinism contract (the repo-wide integer-micro discipline, see lm.py):
weights are int64 MICRO-units, the document score is an exact integer sum,
and the mean-score threshold comparison is cross-multiplied
(`score_sum > thr * n_tokens`) so no float division ever happens — the keep
bit is bit-identical across engines, partitionings, and accumulation orders.

Scale shape (100-TB lens):
- The weights table is the MODEL: n_features rows (2^18 typical, a few MB),
  broadcast once per job — the same physical plan a real trained fastText
  head would use; swapping in trained weights changes zero topology.
- explode + hash + broadcast-join + groupBy(doc_id) is one shuffle on the
  uniform doc_id key with map-side partial aggregation; hot tokens never
  form a hot KEY because aggregation is per-document, not per-token.
- No driver collect, no global sort, no vocabulary dictionary (the hash is
  the vocabulary — Weinberger et al. 2009).

The reference has no classifier (linkinator classifies links, not text);
this module is pipeline surface beyond the reference, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkinator_spark.functions.text import (
    normalize_text,
    portable_hash64,
    portable_hash64_sql,
)

__all__ = [
    "hashed_weights",
    "classifier_score",
    "classifier_score_oracle_sql",
]


def hashed_weights(
    spark: SparkSession, n_features: int, span_micro: int = 1000,
) -> DataFrame:
    """A deterministic pseudo-trained weight table (feature, w_micro) with
    w_micro uniform in [-span_micro, span_micro].

    Stands in for a trained model so tests and oracles are reproducible
    with no model artifact; a real pipeline passes its trained
    (feature, w_micro) table to `classifier_score` instead — same schema,
    same broadcast plan.
    """
    f = F.col("id").cast("int")
    w = (
        F.pmod(portable_hash64(f.cast("string"), prefix="w:"),
               F.lit(2 * span_micro + 1)) - span_micro
    ).cast("long")
    return spark.range(n_features).select(
        f.alias("feature"), w.alias("w_micro"))


def classifier_score(
    docs: DataFrame, weights: DataFrame, n_features: int,
    threshold_micro: int = 0, bias_micro: int = 0,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, score_sum_micro, keep) — linear classifier inference.

    score_sum_micro = bias*n_tokens + sum over token occurrences of
    w_micro[hash(tok) mod n_features]; keep means the MEAN per-token score
    exceeds threshold_micro, tested as the cross-multiplied integer
    inequality `score_sum_micro > threshold_micro * n_tokens`.

    `weights` must have (feature:int, w_micro:long) covering every residue
    mod n_features (missing features would silently drop tokens; the
    broadcast inner join is exact because `hashed_weights`/trained tables
    are dense over [0, n_features)).
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(words).alias("tok"))
    feat = F.pmod(portable_hash64(F.col("tok"), prefix="feat:"),
                  F.lit(int(n_features))).cast("int")
    scored = (
        toks.select("id", feat.alias("feature"))
        .join(F.broadcast(weights), "feature")
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"),
             F.sum("w_micro").cast("long").alias("_s"))
    )
    score = (F.col("_s") + F.lit(int(bias_micro)) * F.col("n_tokens"))
    return scored.select(
        F.col("id").alias(id_col),
        "n_tokens",
        score.cast("long").alias("score_sum_micro"),
        (score > F.lit(int(threshold_micro)) * F.col("n_tokens"))
        .alias("keep"),
    )


def classifier_score_oracle_sql(
    n_features: int, threshold_micro: int = 0, bias_micro: int = 0,
    span_micro: int = 1000, docs_table: str = "documents",
) -> str:
    """DuckDB twin: same tokenization, feature hash, pseudo-weights, and
    cross-multiplied integer threshold."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    feat = portable_hash64_sql("tok", prefix="feat:")
    wh = portable_hash64_sql("cast(feature as varchar)", prefix="w:")
    m = 2 * span_micro + 1
    return f"""
        with toks as (
          select doc_id as id,
                 cast({feat} % {int(n_features)} as integer) as feature
          from (
            select doc_id, unnest(string_split({norm}, ' ')) as tok
            from {docs_table}
          )
        ),
        weights as (
          select cast(range as integer) as feature,
                 (({wh}) % {m} + {m}) % {m} - {span_micro} as w_micro
          from range({int(n_features)})
        ),
        agg as (
          select id, count(*) as n_tokens, sum(w_micro)::bigint as s
          from toks join weights using (feature)
          group by id
        )
        select id as doc_id, n_tokens,
               (s + {int(bias_micro)} * n_tokens)::bigint as score_sum_micro,
               (s + {int(bias_micro)} * n_tokens)
                 > {int(threshold_micro)} * n_tokens as keep
        from agg
    """
