"""N-gram language-model perplexity scoring for corpus quality filtering.

The CCNet-style filter (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data"): train a smoothed
n-gram LM on a reference corpus, score every crawl document by its
negative log-likelihood, and keep the low-perplexity (fluent) tail.
CCNet uses a 5-gram KenLM; this is the same filter with a bigram
add-alpha model — small enough to be exactly reproducible in plain SQL
(the DuckDB oracle replays training AND scoring end to end), with the
identical dataflow shape a higher-order model would use.

Model: p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V), where
c(w1 w2) / c(w1) are training bigram / unigram counts and V is the
training vocabulary size. Unseen contexts degrade to the uniform 1/V.
Tokens are `normalize_text` words — the same tokenization as the dedup
and decontamination gram families, so one normalization governs all
text operators.

Determinism (the BM25 trick, search.py): each bigram's negative
log-prob rounds to integer MICRO-NATS before any sum, so document
scores are exact int64s — summation order, partitioning, and engine
cannot change them, which a float sum cannot promise.

Scale shape (100-TB lens):
- Training counts are map-side-combined aggregates over exploded grams
  (a hot bigram like "of the" partial-aggregates in the combiner; no
  hot-key shuffle survives).
- Scoring joins the per-doc DISTINCT bigram table (tf-weighted — probe
  rows are bounded by distinct grams per doc, not tokens) against the
  count tables. Both joins key on grams/words; frequent grams make
  skewed probe partitions, which AQE's skew-join split handles — enable
  spark.sql.adaptive.skewJoin (on by default) on real clusters.
- V and nothing else crosses the driver; the final per-doc rollup keys
  on the uniform doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import normalize_text, word_bigrams

__all__ = ["lm_nll", "lm_nll_oracle_sql", "normalize_text", "word_bigrams"]


def lm_nll(
    train: DataFrame, docs: DataFrame, alpha: float = 0.5,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Score `docs` under a bigram add-alpha LM trained on `train`.

    Returns one row per input doc:
      (doc_id, n_bigrams, nll_micro:int64, avg_nll_micro:int64, ppl)
    where nll_micro is the summed negative log-likelihood in micro-nats
    (each bigram's -ln p rounded at 1e-6 BEFORE the tf-weighted sum —
    exact, order-independent), avg_nll_micro = floor(nll_micro /
    n_bigrams), and ppl = exp(avg nll) is the usual perplexity view
    (float, derived — filter thresholds should use the integer columns).
    Docs with fewer than two tokens score (0, 0, 0, 1.0).
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    uni = (
        train.select(F.explode(words).alias("w1"))
        .groupBy("w1").agg(F.count("*").alias("c1"))
    )
    vstats = uni.agg(F.count("*").alias("v"))
    bi = (
        train.select(F.explode(word_bigrams(F.col(text_col))).alias("g"))
        .groupBy("g").agg(F.count("*").alias("c12"))
    )
    doc_tf = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(word_bigrams(F.col(text_col))).alias("g"))
        .groupBy("id", "g").agg(F.count("*").alias("tf"))
    )
    p = (F.coalesce("c12", F.lit(0)) + alpha) / \
        (F.coalesce("c1", F.lit(0)) + alpha * F.col("v"))
    scored = (
        doc_tf.join(bi, "g", "left")
        .withColumn("w1", F.substring_index("g", " ", 1))
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vstats))
        .select("id", "tf",
                F.round(-F.log(p) * 1e6, 0).cast("long").alias("_nll"))
    )
    per_doc = scored.groupBy("id").agg(
        F.sum(F.col("tf") * F.col("_nll")).alias("nll_micro"),
        F.sum("tf").alias("n_bigrams"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    out = base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("nll_micro", F.lit(0)).alias("nll_micro"),
    )
    avg = F.when(
        F.col("n_bigrams") > 0,
        F.floor(F.col("nll_micro") / F.col("n_bigrams")),
    ).otherwise(F.lit(0)).cast("long")
    return out.withColumn("avg_nll_micro", avg).withColumn(
        "ppl", F.exp(F.col("avg_nll_micro") / 1e6))


def lm_nll_oracle_sql(
    train_filter: str, alpha: float = 0.5,
    docs_table: str = "documents",
) -> str:
    """DuckDB twin of `lm_nll` with train = docs_table WHERE train_filter:
    replays tokenization, training counts, smoothing, micro-nat rounding,
    and the per-doc rollup. Integer columns only (ppl is derived float)."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    grams = (
        f"list_transform(range(1, greatest(len(w), 1)), "
        f"i -> w[i] || ' ' || w[i+1])"
    )
    return f"""
        with train as (select * from {docs_table} where {train_filter}),
        uni as (
          select w1, count(*) as c1 from (
            select unnest(string_split({norm}, ' ')) as w1 from train
          ) group by w1
        ),
        vs as (select count(*) as v from uni),
        bi as (
          select g, count(*) as c12 from (
            select unnest({grams}) as g
            from (select string_split({norm}, ' ') as w from train)
          ) group by g
        ),
        doc_tf as (
          select id, g, count(*) as tf from (
            select doc_id as id, unnest({grams}) as g
            from (select doc_id, string_split({norm}, ' ') as w
                  from {docs_table})
          ) group by id, g
        ),
        scored as (
          select id, tf,
                 round(-ln((coalesce(c12, 0) + {alpha}) /
                           (coalesce(c1, 0) + {alpha} * v)) * 1e6)::bigint
                   as nll
          from doc_tf
          left join bi using (g)
          left join uni on split_part(doc_tf.g, ' ', 1) = uni.w1
          cross join vs
        ),
        per_doc as (
          select id, sum(tf * nll) as nll_micro, sum(tf) as n_bigrams
          from scored group by id
        )
        select d.doc_id,
               coalesce(p.n_bigrams, 0)::bigint as n_bigrams,
               coalesce(p.nll_micro, 0)::bigint as nll_micro,
               case when coalesce(p.n_bigrams, 0) > 0
                    then floor(p.nll_micro::double / p.n_bigrams)::bigint
                    else 0 end as avg_nll_micro
        from {docs_table} d left join per_doc p on d.doc_id = p.id
    """
