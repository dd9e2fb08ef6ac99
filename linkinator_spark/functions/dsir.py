"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Select raw-corpus documents that look like a target corpus: fit two
bag-of-hashed-ngrams multinomials — p (target) and q (raw) — score every
candidate by its importance log-weight log w(x) = Σ_b c_b(x)·(log p_b −
log q_b) over hashed bigram buckets, then resample without replacement
proportionally to w via the Gumbel-top-k trick. The paper hashes word
n-grams into 10^4 buckets; the same hashing trick here rides the
portable 60-bit hash so the DuckDB oracle replays feature extraction,
both model fits, scoring, and the resample bit-for-bit.

Determinism (the lm.py contract): each bucket's log-ratio rounds to
integer MICRO-NATS before any per-doc sum, so document log-weights are
exact int64s — partitioning and summation order cannot change them. The
Gumbel noise is a pure function of (doc id, salt): u = (h+1)/(2^60+2)
from the portable hash, g = −ln(−ln u), rounded to micro-nats; the
resample is therefore a deterministic ranking, reproducible across
clusters and reshuffles (Spark's rand() streams are not).

Scale shape (100-TB lens):
- Bucket count tables aggregate exploded grams map-side-combined into at
  most `n_buckets` rows (default 4096) — broadcastable state, so scoring
  joins are BROADCAST joins: the corpus-sized side never shuffles on a
  skewable key.
- Per-doc tf keys on (doc_id, bucket) — doc-scoped, uniform; no global
  hot key at any corpus size.
- The Gumbel-top-k is orderBy(key).limit(k): Spark plans
  TakeOrderedAndProject (per-partition top-k, driver merge of k·P rows)
  — no global sort; the final rank window sees exactly k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import (
    portable_hash64,
    portable_hash64_sql,
    word_bigrams,
)

__all__ = ["dsir_weights", "dsir_select", "dsir_oracle_sql"]

_U_DENOM = 2 ** 60 + 2  # portable hash is 60-bit; (h+1)/_U_DENOM ∈ (0,1)


def _bucket_counts(df: DataFrame, n_buckets: int,
                   text_col: str) -> DataFrame:
    """(bucket, c) — hashed-bigram occurrence counts. Map-side combine
    collapses to ≤ n_buckets rows per task before the shuffle."""
    from linkinator_spark.functions.text import word_ngram_rows

    grams = word_ngram_rows(df, text_col, 2).select(
        F.col("gram").alias("g"))
    return (
        grams.select(
            F.pmod(portable_hash64(F.col("g"), prefix="dsir:"),
                   F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("c"))
    )


def dsir_weights(
    target: DataFrame, raw: DataFrame, docs: DataFrame,
    n_buckets: int = 4096, alpha: float = 0.5,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Importance log-weights for every row of `docs` under the
    target-vs-raw hashed-bigram models.

    Returns (id_col, n_grams:int64, logw_micro:int64) — one row per
    input doc; gram-free docs score (0, 0). logw_micro is the summed
    per-gram log(p/q) in micro-nats, each bucket's ratio rounded BEFORE
    the tf-weighted sum (exact, order-independent)."""
    tc = _bucket_counts(target, n_buckets, text_col)
    rc = _bucket_counts(raw, n_buckets, text_col)
    t_tot = tc.agg(F.sum("c").alias("tt"))
    r_tot = rc.agg(F.sum("c").alias("tr"))
    # ≤ n_buckets rows of state: the full ratio table broadcasts
    ratio = (
        rc.withColumnRenamed("c", "cr")
        .join(tc.withColumnRenamed("c", "ct"), "bucket", "outer")
        .crossJoin(F.broadcast(t_tot)).crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.round(F.log(
                ((F.coalesce("ct", F.lit(0)) + alpha)
                 / (F.col("tt") + alpha * n_buckets))
                / ((F.coalesce("cr", F.lit(0)) + alpha)
                   / (F.col("tr") + alpha * n_buckets))
            ) * 1e6, 0).cast("long").alias("ratio_micro"),
        )
    )
    from linkinator_spark.functions.text import word_ngram_rows

    doc_tf = (
        word_ngram_rows(docs, text_col, 2, keep_cols=(id_col,))
        .select(F.col(id_col).alias("id"), F.col("gram").alias("g"))
        .select("id",
                F.pmod(portable_hash64(F.col("g"), prefix="dsir:"),
                       F.lit(n_buckets)).alias("bucket"))
        .groupBy("id", "bucket").agg(F.count("*").alias("tf"))
    )
    per_doc = (
        doc_tf.join(F.broadcast(ratio), "bucket")
        .groupBy("id").agg(
            F.sum("tf").alias("n_grams"),
            F.sum(F.col("tf") * F.col("ratio_micro")).alias("logw_micro"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logw_micro", F.lit(0)).cast("long")
            .alias("logw_micro"),
        )
    )


def gumbel_micro(id_expr, salt: str = "dsir-gumbel"):
    """Deterministic Gumbel(0,1) noise in micro-nats from the portable
    hash of the id — the reproducible stand-in for rand()-based
    resampling. u ∈ (0,1) strictly, so −ln(−ln u) is always finite."""
    h = portable_hash64(id_expr.cast("string"), prefix=f"{salt}:")
    u = (h + F.lit(1)).cast("double") / F.lit(float(_U_DENOM))
    return F.round(-F.log(-F.log(u)) * 1e6, 0).cast("long")


def dsir_select(
    target: DataFrame, raw: DataFrame, k: int,
    n_buckets: int = 4096, alpha: float = 0.5,
    id_col: str = "doc_id", text_col: str = "text",
    salt: str = "dsir-gumbel",
) -> DataFrame:
    """Gumbel-top-k importance resample: the k raw docs with the largest
    logw_micro + gumbel_micro — exactly sampling WITHOUT replacement with
    probabilities ∝ w(x) (Vieira 2014's Gumbel-max coupling), made
    deterministic by hash-derived noise. Ties (identical key) break on
    doc id. Output: (id_col, n_grams, logw_micro, key_micro, rank) with
    rank 1..k, rank 1 = first draw."""
    from pyspark.sql import Window

    w = dsir_weights(target, raw, raw, n_buckets, alpha, id_col, text_col)
    keyed = w.withColumn(
        "key_micro",
        (F.col("logw_micro") + gumbel_micro(F.col(id_col), salt))
        .cast("long"))
    topk = keyed.orderBy(F.desc("key_micro"), F.asc(id_col)).limit(k)
    # rank over exactly k rows — bounded by the ask, never corpus-sized
    win = Window.orderBy(F.desc("key_micro"), F.asc(id_col))
    return topk.withColumn(
        "rank", F.row_number().over(win).cast("long"))


def dsir_oracle_sql(
    target_filter: str, k: int, n_buckets: int = 4096, alpha: float = 0.5,
    docs_table: str = "documents", salt: str = "dsir-gumbel",
) -> str:
    """DuckDB twin of dsir_select with target = docs WHERE target_filter
    and raw = all docs: replays grams, the hashing trick, both model
    fits, micro-nat ratio rounding, the Gumbel noise, and the top-k."""
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    grams = ("list_transform(range(1, greatest(len(w), 1)), "
             "i -> w[i] || ' ' || w[i+1])")
    bucket = f"{portable_hash64_sql('g', 'dsir:')} % {n_buckets}"
    gmb = portable_hash64_sql(
        "cast(doc_id as varchar)", f"{salt}:")
    return f"""
        with raw_grams as (
          select doc_id, unnest({grams}) as g
          from (select doc_id, string_split({norm}, ' ') as w
                from {docs_table})
        ),
        rb as (select doc_id, {bucket} as bucket from raw_grams),
        rc as (select bucket, count(*) as cr from rb group by bucket),
        tc as (
          select bucket, count(*) as ct from rb
          where doc_id in (select doc_id from {docs_table}
                           where {target_filter})
          group by bucket
        ),
        tt as (select coalesce(sum(ct), 0) as tt from tc),
        tr as (select coalesce(sum(cr), 0) as tr from rc),
        ratio as (
          select coalesce(rc.bucket, tc.bucket) as bucket,
                 round(ln(((coalesce(ct, 0) + {alpha})
                            / (tt + {alpha} * {n_buckets}))
                          / ((coalesce(cr, 0) + {alpha})
                             / (tr + {alpha} * {n_buckets}))) * 1e6)::bigint
                   as ratio_micro
          from rc full outer join tc on rc.bucket = tc.bucket
          cross join tt cross join tr
        ),
        doc_tf as (
          select doc_id, bucket, count(*) as tf
          from rb group by doc_id, bucket
        ),
        per_doc as (
          select doc_id, sum(tf) as n_grams,
                 sum(tf * ratio_micro) as logw_micro
          from doc_tf join ratio using (bucket)
          group by doc_id
        ),
        weights as (
          select d.doc_id,
                 coalesce(p.n_grams, 0)::bigint as n_grams,
                 coalesce(p.logw_micro, 0)::bigint as logw_micro
          from {docs_table} d left join per_doc p using (doc_id)
        ),
        keyed as (
          select *,
                 (logw_micro
                  + round(-ln(-ln(({gmb} + 1) / {float(_U_DENOM)!r}))
                          * 1e6)::bigint)::bigint as key_micro
          from weights
        )
        select doc_id, n_grams, logw_micro, key_micro,
               row_number() over (order by key_micro desc, doc_id)::bigint
                 as rank
        from keyed
        order by key_micro desc, doc_id
        limit {k}
    """
