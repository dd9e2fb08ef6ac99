"""Global crawl-budget apportionment across hosts.

The politeness layer already caps how many URLs a host may serve *per
wave* (operators/politeness.py); what a crawl operator still needs is the
inverse decision — given a GLOBAL fetch budget for the next epoch (the
knob a 10^10-URL crawl actually turns), how many fetches does each host
*get*? The classic answer is proportional apportionment over a host score
(domain quality × demand); we implement the largest-remainder (Hamilton)
method exactly in integer arithmetic, so the grants always sum to the
budget and the result is reshuffle-stable.

Scale shape: the input is the per-host score table — metadata-scale (one
row per host, orders of magnitude below the frontier). Two scalar
aggregates broadcast back via one-row cross joins (the repo's standard
scalar shape), the quota/remainder math is a pure codegen projection, and
the remainder rank reuses ``global_fifo_rank`` (range-partition + offset
prefix-sum) rather than a single-task global window — so even a
hundred-million-host table never serializes into one task. No UDF, no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.operators.politeness import global_fifo_rank


def allocate_budget(
    hosts: DataFrame,
    budget: int,
    score_col: str = "score",
    host_col: str = "host",
) -> DataFrame:
    """Largest-remainder apportionment of ``budget`` fetches over hosts.

    ``hosts`` has one row per host with a non-negative integer
    ``score_col``; the score sum must be positive. Returns one row per
    host with ``quota`` (the floor share), ``granted`` (quota plus one of
    the leftover units, assigned by remainder descending with host-name
    ascending as the deterministic tie-break) and the remainder itself.
    ``sum(granted) == budget`` exactly — the leftover count is strictly
    less than the host count, a property of the floor sum.

    Integer-exact for ``budget * score`` within int64; at planetary scale
    cast both to ``decimal(38,0)`` upstream (semantics unchanged).
    """
    b = F.lit(int(budget)).cast("long")
    scores = hosts.select(
        F.col(host_col).alias("host"),
        F.col(score_col).cast("long").alias("score"))
    tot = scores.agg(F.sum("score").alias("_tot"))
    q = (
        scores.crossJoin(F.broadcast(tot))
        .withColumn("quota", F.expr(f"div({int(budget)} * score, _tot)"))
        .withColumn("remainder", (b * F.col("score")) % F.col("_tot"))
    )
    leftover = q.agg((b - F.sum("quota")).alias("_left"))
    ranked = global_fifo_rank(
        q.withColumn("_neg_rem", -F.col("remainder")),
        "_neg_rem", "host", out_col="_rk")
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .withColumn(
            "granted",
            (F.col("quota")
             + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0))
            .cast("long"))
        .select("host", "score", "quota", "remainder", "granted")
    )
