"""Conditional-request planning and 304 accounting (RFC 9110 §13,
RFC 9111): the piece between revisit scheduling (operators/revisit.py —
WHEN to refetch) and the fetch stage (HOW to refetch cheaply).

A crawler that refetches 10^9 URLs per epoch without validators
re-downloads the unchanged majority of the web; with them, unchanged
pages cost a ~200-byte 304 exchange. The reference performs one-shot
unconditional fetches (src/index.ts has no validator cache — nothing
to revalidate against); at crawl tier the fetch HISTORY is a table, so
the plan is an aggregation over it:

* ``conditional_plan`` — per URL, the latest capture's validators
  decide the request form: ``if-none-match`` when an ETag exists
  (strong, preferred per RFC 9110 §13.1.1), else
  ``if-modified-since`` from a Last-Modified value, else
  ``unconditional``. ONE map-side-combined groupBy on the uniform URL
  key (max/max_by aggregates — no per-URL window, no hot key).
* ``revalidation_outcome`` — joined with the refetch results,
  classifies each exchange as it WOULD have gone with conditionals:
  304 (validator present, content unchanged) vs 200, and the response
  bytes the 304 avoids. This is the feedback table that calibrates
  revisit priorities (a host whose pages always 304 can cool down).

Scale shape: one groupBy + one equi-join, both keyed on the uniform
URL; everything else codegen. DuckDB twins ride arg_max — semantics
identical to max_by given per-URL-unique timestamps (guaranteed by the
fetch scheduler: one fetch per URL per wave).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conditional_plan(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
) -> DataFrame:
    """(url, last_ts, n_prior, cond_type, validator, prior_digest) —
    the conditional-request plan from the latest capture per URL."""
    def latest_nonnull(name: str):
        # max over (ts, value) structs of the non-null rows: "the most
        # recent capture that CARRIED this validator" — explicitly
        # null-skipping so the Spark side and DuckDB's arg_max (which
        # ignores null args) share one semantics
        c = F.col(name)
        return F.max(F.when(c.isNotNull(), F.struct(
            F.col(ts_col).alias("t"), c.alias("v"))))["v"]

    agg = history.groupBy(url_col).agg(
        F.max(ts_col).alias("last_ts"),
        latest_nonnull("etag").alias("_etag"),
        latest_nonnull("last_modified").alias("_lm"),
        latest_nonnull("digest").alias("prior_digest"),
        F.count(F.lit(1)).cast("long").alias("n_prior"),
    )
    cond = (
        F.when(F.col("_etag").isNotNull(), F.lit("if-none-match"))
        .when(F.col("_lm").isNotNull(), F.lit("if-modified-since"))
        .otherwise(F.lit("unconditional")))
    return agg.select(
        url_col, "last_ts", "n_prior",
        cond.alias("cond_type"),
        F.coalesce(F.col("_etag"), F.col("_lm")).alias("validator"),
        "prior_digest",
    )


def revalidation_outcome(
    plan: DataFrame,
    fetched: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    length_col: str = "length",
) -> DataFrame:
    """Join the refetch results onto the plan: per URL, the status the
    conditional exchange yields (304 iff a validator existed AND the
    content digest is unchanged) and the body bytes a 304 avoids."""
    j = plan.join(fetched, url_col)
    would_304 = (
        (F.col("cond_type") != "unconditional")
        & F.col("prior_digest").isNotNull()
        & (F.col(digest_col) == F.col("prior_digest")))
    return j.select(
        url_col, "cond_type",
        F.when(would_304, F.lit(304)).otherwise(F.lit(200))
         .cast("long").alias("status"),
        F.when(would_304, F.col(length_col).cast("long"))
         .otherwise(F.lit(0)).alias("saved_bytes"),
        (F.col(digest_col) != F.col("prior_digest")).alias("changed"),
    )


def plan_sql(hist_cte: str) -> str:
    """DuckDB twin of :func:`conditional_plan` over a history CTE named
    ``{hist_cte}`` with columns (url, fetch_ts, etag, last_modified,
    digest)."""
    return f"""
      select url,
             max(fetch_ts) as last_ts,
             cast(count(*) as bigint) as n_prior,
             case when arg_max(etag, fetch_ts) is not null
                  then 'if-none-match'
                  when arg_max(last_modified, fetch_ts) is not null
                  then 'if-modified-since'
                  else 'unconditional' end as cond_type,
             coalesce(arg_max(etag, fetch_ts),
                      arg_max(last_modified, fetch_ts)) as validator,
             arg_max(digest, fetch_ts) as prior_digest
      from {hist_cte} group by url
    """
