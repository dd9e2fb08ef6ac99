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

__all__ = ["lm_nll", "lm_nll_oracle_sql", "ppl_bucket",
           "ppl_bucket_oracle_sql", "normalize_text", "word_bigrams"]


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
    from linkinator_spark.functions.partitioning import spread_small_scan
    from linkinator_spark.functions.text import word_ngram_rows

    words = F.split(normalize_text(F.col(text_col)), " ")
    uni = (
        spread_small_scan(train.select(F.col(text_col)))
        .select(F.explode(words).alias("w1"))
        .groupBy("w1").agg(F.count("*").alias("c1"))
    )
    vstats = uni.agg(F.count("*").alias("v"))
    # bigram rows via the bound-word-array fast path (word_ngrams inline
    # re-splits the text per element -- the 80s sf1.0 leg)
    bi = (
        word_ngram_rows(train, text_col, 2)
        .select(F.col("gram").alias("g"))
        .groupBy("g").agg(F.count("*").alias("c12"))
    )
    doc_tf = (
        word_ngram_rows(docs, text_col, 2, keep_cols=(id_col,))
        .select(F.col(id_col).alias("id"), F.col("gram").alias("g"))
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


def ppl_bucket(
    train: DataFrame, docs: DataFrame, alpha: float = 0.5,
    id_col: str = "doc_id", text_col: str = "text", lang_col: str = "lang",
    resolution: int = 1000, qs=(0.33, 0.67),
) -> DataFrame:
    """The CCNet head/middle/tail filter (Wenzek et al. 2020 §4.3): score
    every document under the reference LM (`lm_nll`), then cut each
    LANGUAGE at its own perplexity terciles — cross-language thresholds
    are meaningless (a fluent Swahili doc scores worse than junk English
    under any shared cut), which is why CCNet buckets per language.

    Thresholds are per-language exact discrete quantiles of
    avg_nll_micro at milli-nat `resolution` (grouped_int_quantiles —
    the resolution bounds the histogram domain so a language holding
    half the corpus costs a bounded window task). Bucketing is a
    broadcast join of the (lang, t_head, t_mid) table — three rows of
    state per language, nothing corpus-sized beyond the score pass.

    Output: (id_col, lang_col, bucket) with bucket in head|middle|tail;
    head = most fluent (lowest nll). Deterministic end to end: integer
    micro-nat scores, integer division, exact quantile thresholds.
    """
    from linkinator_spark.functions.sampling import grouped_int_quantiles

    scores = lm_nll(train, docs, alpha, id_col=id_col, text_col=text_col)
    scored = (
        docs.select(id_col, lang_col)
        .join(scores.select(id_col, "avg_nll_micro"), id_col)
        .withColumn("_vb", F.expr(f"avg_nll_micro div {int(resolution)}"))
    )
    th = grouped_int_quantiles(
        scored, lang_col, "avg_nll_micro", qs=qs, resolution=resolution)
    q_head, q_mid = float(qs[0]), float(qs[1])
    tw = th.groupBy(lang_col).agg(
        F.min(F.when(F.col("q") == q_head, F.col("value"))).alias("_t1"),
        F.min(F.when(F.col("q") == q_mid, F.col("value"))).alias("_t2"),
    )
    return (
        scored.join(F.broadcast(tw), lang_col)
        .withColumn(
            "bucket",
            F.when(F.col("_vb") <= F.col("_t1"), "head")
            .when(F.col("_vb") <= F.col("_t2"), "middle")
            .otherwise("tail"))
        .select(id_col, lang_col, "bucket")
    )


def ppl_bucket_oracle_sql(
    train_filter: str, alpha: float = 0.5, resolution: int = 1000,
    qs=(0.33, 0.67), docs_table: str = "documents",
) -> str:
    """DuckDB twin of `ppl_bucket`: the lm_nll twin as a subquery, then
    the same milli-nat histogram cumsum, exact tercile thresholds, and
    bucket labels."""
    lm = lm_nll_oracle_sql(train_filter, alpha, docs_table)
    q_head, q_mid = float(qs[0]), float(qs[1])
    return f"""
        with scores as (select * from ({lm}) s),
        scored as (
          select d.doc_id, d.lang,
                 s.avg_nll_micro // {int(resolution)} as vb
          from {docs_table} d join scores s using (doc_id)
        ),
        hist as (
          select lang, vb, count(*) as c from scored group by lang, vb
        ),
        cum as (
          select lang, vb,
                 sum(c) over (partition by lang order by vb) as cumc
          from hist
        ),
        tot as (select lang, count(*) as n from scored group by lang),
        th as (
          select lang, q, min(vb) as value
          from cum join tot using (lang)
          cross join (values ({q_head!r}), ({q_mid!r})) qv(q)
          where cumc >= ceil(q * n)
          group by lang, q
        ),
        tw as (
          select lang,
                 min(value) filter (where q = {q_head!r}) as t1,
                 min(value) filter (where q = {q_mid!r}) as t2
          from th group by lang
        )
        select s.doc_id, s.lang,
               case when s.vb <= t1 then 'head'
                    when s.vb <= t2 then 'middle'
                    else 'tail' end as bucket
        from scored s join tw using (lang)
    """
