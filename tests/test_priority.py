"""Authority-weighted (priority-queue) frontier scheduling contract:
politeness_take with a descending-priority sort key + global_fifo_rank
emission order (the q_frontier_priority composition).

* within a host, the budget keeps the HIGHEST-priority URLs
* across hosts, emit_rank is globally ordered by priority
* identical output at different parallelism (reshuffle-stable)
"""

import pyspark.sql.functions as F

from linkinator_spark.operators.politeness import (
    global_fifo_rank,
    politeness_take,
)

SCHEMA = "url string, host string, priority_micro long"


def _frontier(spark):
    rows = [
        ("http://a/1", "a", 900),
        ("http://a/2", "a", 100),
        ("http://a/3", "a", 500),
        ("http://b/1", "b", 700),
        ("http://b/2", "b", 800),
    ]
    return (spark.createDataFrame(rows, SCHEMA)
            .withColumn("_negp", -F.col("priority_micro")))


def _schedule(spark, budget):
    took = politeness_take(_frontier(spark), budget=budget,
                           order_cols=("_negp", "url"))
    return (global_fifo_rank(took, "_negp", "url", out_col="emit_rank")
            .select("url", "host", "priority_micro", "host_rank",
                    "emit_rank"))


def test_budget_keeps_highest_priority(spark):
    out = {r["url"]: r for r in _schedule(spark, budget=2).collect()}
    # host a drops its priority-100 URL, not a FIFO tail
    assert set(out) == {"http://a/1", "http://a/3",
                        "http://b/1", "http://b/2"}
    assert out["http://a/1"]["host_rank"] == 1
    assert out["http://a/3"]["host_rank"] == 2


def test_emission_order_is_global_priority(spark):
    rows = sorted(_schedule(spark, budget=2).collect(),
                  key=lambda r: r["emit_rank"])
    assert [r["url"] for r in rows] == [
        "http://a/1", "http://b/2", "http://b/1", "http://a/3"]
    assert [r["emit_rank"] for r in rows] == [1, 2, 3, 4]


def test_reshuffle_stable(spark):
    a = sorted(_schedule(spark, budget=2).collect(), key=lambda r: r["url"])
    took = politeness_take(
        _frontier(spark).repartition(5, "url"), budget=2,
        order_cols=("_negp", "url"))
    b = sorted(
        global_fifo_rank(took, "_negp", "url", out_col="emit_rank")
        .select("url", "host", "priority_micro", "host_rank", "emit_rank")
        .collect(), key=lambda r: r["url"])
    assert a == b
