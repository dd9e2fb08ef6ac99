"""functions/graph.pagerank unit contract (the oracle pins exact values;
these pin the invariants that make it PageRank):

* total rank mass is conserved (sum == 1) even with dangling nodes
* a symmetric ring yields exactly uniform ranks
* parallel edges collapse — duplicating an edge row changes nothing
* a dangling node's mass is redistributed, not lost
"""

import pytest

from linkinator_spark.functions.graph import pagerank


def _ranks(spark, edges, iters=5):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.pagerank for r in pagerank(df, iters=iters).collect()}


def test_mass_conserved_and_ring_uniform(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    pr = _ranks(spark, ring)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    for v in pr.values():
        assert v == pytest.approx(1.0 / 6, abs=1e-12)


def test_parallel_edges_collapse(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    a = _ranks(spark, edges)
    b = _ranks(spark, edges + [(0, 2), (0, 2)])
    assert a == b


def test_dangling_mass_redistributed(spark):
    # 0 -> 1 -> 2, node 2 dangles; without redistribution sum < 1
    pr = _ranks(spark, [(0, 1), (1, 2)])
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    # authority flows down the chain
    assert pr[2] > pr[1] > pr[0]
