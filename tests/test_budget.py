"""Largest-remainder crawl-budget apportionment (operators/budget.py)."""

import pytest
from pyspark.sql import functions as F

from linkinator_spark.operators.budget import allocate_budget


def _hosts(spark, scores):
    return spark.createDataFrame(
        [(f"h{i:03d}", s) for i, s in enumerate(scores)],
        "host string, score long")


def test_grants_sum_to_budget_exactly(spark):
    for budget in (1, 7, 997, 10_000):
        out = allocate_budget(_hosts(spark, [5, 3, 3, 1, 0]), budget)
        assert out.agg(F.sum("granted")).collect()[0][0] == budget


def test_proportionality_and_floor(spark):
    # scores 50/30/20 of budget 10 divide exactly: no remainder units
    out = {r["host"]: r for r in
           allocate_budget(_hosts(spark, [50, 30, 20]), 10).collect()}
    assert [out[h]["granted"] for h in ("h000", "h001", "h002")] == [5, 3, 2]
    assert all(r["remainder"] == 0 for r in out.values())


def test_largest_remainder_gets_the_leftover(spark):
    # budget 10 over 7/7/6: quotas 3/3/3 (sum 9), remainders 10/10/0 ->
    # ONE leftover unit, won by the first 7-score host (host-asc tie-break)
    out = {r["host"]: r["granted"] for r in
           allocate_budget(_hosts(spark, [7, 7, 6]), 10).collect()}
    assert out == {"h000": 4, "h001": 3, "h002": 3}


def test_tie_breaks_host_ascending(spark):
    # equal scores, budget not divisible: leftover goes to the
    # lexicographically-first hosts, deterministically
    out = {r["host"]: r["granted"] for r in
           allocate_budget(_hosts(spark, [1, 1, 1]), 5).collect()}
    assert out == {"h000": 2, "h001": 2, "h002": 1}


def test_zero_score_host_gets_nothing(spark):
    out = {r["host"]: r["granted"] for r in
           allocate_budget(_hosts(spark, [10, 0]), 7).collect()}
    assert out["h001"] == 0 and out["h000"] == 7


def test_reshuffle_stable(spark):
    hosts = _hosts(spark, [13, 11, 7, 5, 3, 2, 1, 1, 1])
    a = sorted(map(tuple, allocate_budget(hosts, 101).collect()))
    b = sorted(map(tuple,
                   allocate_budget(hosts.repartition(8), 101).collect()))
    assert a == b


def test_matches_reference_hamilton(spark):
    """Pure-Python largest-remainder on a pseudorandom score table."""
    scores = [(i * 7919 + 13) % 97 for i in range(25)]
    budget = 500
    tot = sum(scores)
    quotas = [budget * s // tot for s in scores]
    rems = [budget * s % tot for s in scores]
    left = budget - sum(quotas)
    order = sorted(range(25), key=lambda i: (-rems[i], f"h{i:03d}"))
    want = dict()
    for rank, i in enumerate(order):
        want[f"h{i:03d}"] = quotas[i] + (1 if rank < left else 0)
    got = {r["host"]: r["granted"] for r in
           allocate_budget(_hosts(spark, scores), budget).collect()}
    assert got == want
