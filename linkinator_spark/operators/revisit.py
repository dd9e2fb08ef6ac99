"""Freshness-driven recrawl scheduling over the standing fetch history.

A crawler that maintains a corpus (rather than a one-shot link check)
must decide WHICH already-seen URLs to refetch next. The classic answer
(Cho & Garcia-Molina, "Estimating Frequency of Change", ACM TOIT 2003)
models each page as a Poisson change process: estimate a per-URL change
rate from the observed fetch history, then prioritise pages whose
expected staleness — change rate x time since last fetch — is highest.
This module is that policy as a Spark dataflow, feeding the SAME
skew-salted politeness scheduler the discovery frontier uses
(operators/politeness.py), so recrawl traffic honours per-host budgets
exactly like first-visit traffic.

Scale shape (10^10 URLs):

* the fetch history groups on the URL — a uniform, globally unique key
  (no hot key possible); per-URL state is ONE array bounded by the
  retention depth of the history table (a policy constant, typically
  8-32 snapshots), folded with codegen array expressions
  (sort_array / slice / zip_with / filter) — no Python, no window;
* the change-rate estimator rounds to integer MICRO-NATS exactly like
  functions/lm.py (F.log and DuckDB ln agree at 1e-6 rounding), and the
  priority itself is a pure int64 product (rate_micro x age_intervals)
  — monotone in the expected-staleness formula 1 - exp(-lambda*age)
  without putting a transcendental in the compared output;
* scheduling reuses politeness_take (per-host top-K, hot hosts striped)
  and global_fifo_rank (range-partitioned global emission rank) — no
  single-task global sort anywhere.

The reference (linkinator) is one-shot and has no revisit policy; this
is beyond-reference crawl machinery, like the PageRank priority queue
(`frontier_priority`). Estimator: Cho & GM's bias-reduced
r_hat = -ln((n - X + 0.5) / (n + 0.5)) with n = observed refetch
intervals and X = detected changes, in units of 1/interval.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkinator_spark.operators.politeness import (
    global_fifo_rank,
    politeness_take,
)

__all__ = ["revisit_priorities", "revisit_schedule"]


def revisit_priorities(
    history: DataFrame,
    now_ts: int,
    interval: int,
) -> DataFrame:
    """Per-URL change-rate estimate and recrawl priority.

    ``history`` has one row per past fetch: (url, host, fetch_ts:long,
    content_hash:string). Returns one row per URL with
    (url, host, n_fetches, n_changes, rate_micro, age_intervals,
    priority_micro).

    * n_changes counts hash TRANSITIONS in fetch_ts order (an ABA page
      counts twice — count(distinct) would miss the revert);
    * rate_micro = round(-ln((I - X + 0.5)/(I + 0.5)) * 1e6) with
      I = n_fetches - 1 intervals, X = n_changes: 0 for a single
      observation, grows with the observed change fraction, finite even
      at X == I (the +0.5 smoothing);
    * age_intervals = floor((now_ts - last_fetch_ts) / interval),
      clamped at 0;
    * priority_micro = rate_micro * age_intervals (int64) — a page that
      never changed (rate 0) or was just fetched (age 0) gets 0.
    """
    arr = F.sort_array(F.collect_list(F.struct("fetch_ts", "content_hash")))
    per_url = history.groupBy("url", "host").agg(arr.alias("_h"))

    n = F.size("_h")
    # pairwise transition flags over the ts-ordered history; slice length
    # n-1 is 0 for a single fetch, which yields an empty array (no lag
    # window: per-URL state stays one bounded array in codegen)
    prev = F.slice(F.col("_h"), 1, n - 1)
    nxt = F.slice(F.col("_h"), 2, n - 1)
    changed = F.zip_with(prev, nxt, lambda a, b: a.content_hash != b.content_hash)
    n_changes = F.size(F.filter(changed, lambda x: x))

    intervals = (n - 1).cast("double")
    x = F.col("n_changes").cast("double")
    rate = -F.log((intervals - x + 0.5) / (intervals + 0.5))
    last_ts = F.element_at("_h", -1).fetch_ts
    age = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.lit(now_ts) - last_ts) / F.lit(interval)),
    )

    return (
        per_url.withColumn("n_fetches", n.cast("long"))
        .withColumn("n_changes", n_changes.cast("long"))
        .withColumn("rate_micro", F.round(rate * 1e6, 0).cast("long"))
        .withColumn("age_intervals", age)
        .withColumn("priority_micro", F.col("rate_micro") * F.col("age_intervals"))
        .drop("_h")
    )


def revisit_schedule(
    history: DataFrame,
    now_ts: int,
    interval: int,
    budget: int,
    salt_threshold: int = 100_000,
) -> DataFrame:
    """The recrawl wave: freshness priorities -> per-host top-``budget``
    (skew-salted) -> scale-safe global emission rank. Pages with
    priority 0 (never changed, or just fetched) are not scheduled.

    Output: (url, host, n_fetches, n_changes, rate_micro, age_intervals,
    priority_micro, host_rank, emit_rank).
    """
    pri = revisit_priorities(history, now_ts, interval)
    due = pri.filter(F.col("priority_micro") > 0).withColumn(
        "_negp", -F.col("priority_micro")
    )
    took = politeness_take(
        due, budget=budget, salt_threshold=salt_threshold,
        order_cols=("_negp", "url"),
    )
    return global_fifo_rank(took, "_negp", "url", out_col="emit_rank").select(
        "url", "host", "n_fetches", "n_changes", "rate_micro",
        "age_intervals", "priority_micro", "host_rank", "emit_rank",
    )
