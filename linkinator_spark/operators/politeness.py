"""Per-host politeness scheduling, skew-aware.

Semantics: each wave fetches at most `budget` URLs per host, in per-host FIFO
order (not_before, seq) — the distributed equivalent of the reference queue's
per-host ordering (src/queue.ts:69-97 + SURVEY §2.6).

A naive `row_number() OVER (PARTITION BY host ...)` puts every row of a host
into ONE task — a Zipf-hot host serializes the whole wave. This module uses
the classic two-phase distributed top-K instead:

  phase 1: salt hot hosts (pmod(url_hash, salt_factor)), rank within
           (host, salt) stripes — parallel across stripes — and keep only
           `budget` rows per stripe;
  phase 2: re-rank the survivors per host (at most budget x salt_factor
           rows per host — tiny) and keep `budget`.

Correctness: any row in the true per-host top-budget is in the top-budget of
its stripe, so phase 1 never drops a winner. The selected set equals the
single-window answer exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkinator_spark.sources.webgraph import hot_host_salts, with_salt


def politeness_take(
    frontier: DataFrame,
    budget: int,
    salt_threshold: int = 100_000,
    order_cols: tuple = ("not_before", "seq"),
) -> DataFrame:
    """Rows to fetch this wave: per-host FIFO top-`budget`, skew-parallel.
    Output = input columns + `host_rank`."""
    if "url_hash" not in frontier.columns:
        frontier = frontier.withColumn("url_hash", F.xxhash64("url"))
    # the salt-count aggregation and the ranking both consume the frontier;
    # cache it so the upstream pipeline (anti-join etc.) runs once
    frontier = frontier.persist()
    salts = hot_host_salts(frontier, salt_threshold)
    salted = with_salt(frontier, salts)

    w1 = Window.partitionBy("host", "salt").orderBy(*[F.col(c) for c in order_cols])
    local = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= budget)
        .drop("_r1")
    )
    w2 = Window.partitionBy("host").orderBy(*[F.col(c) for c in order_cols])
    return (
        local.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= budget)
        .drop("salt")
    )


def politeness_split(
    frontier: DataFrame, budget: int, salt_threshold: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """(take, deferred): the wave's fetch set and the rows that wait."""
    take = politeness_take(frontier, budget, salt_threshold)
    deferred = frontier.join(take.select("url"), "url", "left_anti")
    return take.drop("host_rank", "url_hash"), deferred
