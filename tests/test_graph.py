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


def test_hits_directory_vs_content(spark):
    """A pure hub (links to everything, never linked) must get hub>0,
    auth=0; pure sinks get auth>0, hub=0; scores L1-normalize."""
    from linkinator_spark.functions.graph import hits

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (4, 1), (1, 2)],
        "src bigint, dst bigint")
    rows = {r["node"]: (r["hub"], r["auth"]) for r in hits(edges, iters=4).collect()}
    assert rows[0][1] == 0.0          # node 0 never linked-to: no authority
    assert rows[3][0] == 0.0          # node 3 has no out-links: no hub score
    assert rows[0][0] > rows[4][0]    # 3-out-link hub beats 1-out-link hub
    # node 2 is linked by the two strongest hubs -> top authority
    assert rows[2][1] == max(a for _, a in rows.values())
    assert abs(sum(h for h, _ in rows.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in rows.values()) - 1.0) < 1e-9


def test_hits_parallel_edges_collapse(spark):
    from linkinator_spark.functions.graph import hits

    base = spark.createDataFrame([(0, 1), (2, 1)], "src bigint, dst bigint")
    dup = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (2, 1)], "src bigint, dst bigint")
    a = sorted(map(tuple, hits(base, iters=3).collect()))
    b = sorted(map(tuple, hits(dup, iters=3).collect()))
    assert a == b


def test_lpa_two_triangles(spark):
    """Two triangles bridged by one edge resolve into two communities,
    each labeled by its smallest member (deterministic tie-break)."""
    from linkinator_spark.functions.graph import label_propagation

    edges = [(0, 1), (1, 2), (2, 0),
             (3, 4), (4, 5), (5, 3),
             (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.community
           for r in label_propagation(df, iters=4).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == out[4] == out[5]
    assert out[3] != out[0]


def test_lpa_isolated_self_loop_keeps_label(spark):
    """A node whose only edge is a self-loop has no neighbors: it keeps
    its own id as its community."""
    from linkinator_spark.functions.graph import label_propagation

    df = spark.createDataFrame([(0, 1), (1, 0), (7, 7)],
                               "src long, dst long")
    out = {r.node: r.community
           for r in label_propagation(df, iters=3).collect()}
    assert out[7] == 7
    assert out[0] == out[1] == 0


def test_lpa_undirected_and_parallel_collapse(spark):
    """Direction and duplicate edge rows don't change the result: the
    graph symmetrizes and edges collapse before propagation."""
    from linkinator_spark.functions.graph import label_propagation

    a = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    b = spark.createDataFrame([(1, 0), (2, 1), (2, 1), (1, 2)],
                              "src long, dst long")
    ra = sorted((r.node, r.community)
                for r in label_propagation(a, iters=4).collect())
    rb = sorted((r.node, r.community)
                for r in label_propagation(b, iters=4).collect())
    assert ra == rb


def test_trustrank_decays_from_seeds(spark):
    """Trust is highest at the seed, decays along links, and is exactly
    zero for nodes unreachable from any seed."""
    from linkinator_spark.functions.graph import trustrank

    # seed 0 fans out to 1 and 2; 3 is two hops out; 4 -> 5 is
    # disconnected from the seed entirely. Decay-per-hop is a property
    # of the CONVERGED vector (finite power iterations carry traveling
    # mass waves), so iterate to convergence: residual ~0.85^40 = 1.5e-3
    # against a 0.03 gap between the hop levels.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (4, 5)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    tr = {r.node: r.trust
          for r in trustrank(edges, seeds, iters=40).collect()}
    assert tr[0] > tr[1] > tr[3] > 0  # one more hop, less trust
    assert tr[1] == tr[2]  # symmetric children split evenly
    assert tr[4] == 0.0 and tr[5] == 0.0
    assert sum(tr.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_empty_and_foreign_seeds(spark):
    """Seeds absent from the graph are ignored; an empty effective seed
    set yields all-zero trust rather than dividing by zero."""
    from linkinator_spark.functions.graph import trustrank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "id long")
    tr = {r.node: r.trust
          for r in trustrank(edges, seeds, iters=3).collect()}
    assert tr == {0: 0.0, 1: 0.0}


def test_opic_cash_conserved_and_sums(spark):
    """Total cash stays 1 every round, so history sums to the round
    count and importance sums to 1; a pure sink still accumulates."""
    from linkinator_spark.functions.graph import opic

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long")
    out = {r.node: r for r in opic(edges, iters=5).collect()}
    assert sum(r.cash for r in out.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(r.history for r in out.values()) == pytest.approx(
        5.0, abs=1e-9)
    assert sum(r.importance for r in out.values()) == pytest.approx(
        1.0, abs=1e-9)
    # 2 is linked by both others: most important
    assert out[2].importance == max(r.importance for r in out.values())


def test_opic_ring_uniform(spark):
    from linkinator_spark.functions.graph import opic

    ring = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long")
    out = [r.importance for r in opic(ring, iters=4).collect()]
    for v in out:
        assert v == pytest.approx(1.0 / 5, abs=1e-12)


def test_discovery_coverage_exact_spectrum(spark):
    """Hand-computed spectrum: targets seen {a:1, b:1, c:2, d:3} ->
    s_obs=4, N=7, f1=2, f2=1, chao1 = 4 + 2*1/(2*2) = 4.5,
    coverage = 1 - 2/7."""
    from linkinator_spark.functions.graph import discovery_coverage

    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 12), (2, 12), (0, 13), (1, 13), (2, 13)],
        "src long, dst long")
    r = discovery_coverage(edges).collect()[0]
    assert (r.s_obs, r.n_events, r.f1, r.f2) == (4, 7, 2, 1)
    assert r.chao1 == pytest.approx(4.5)
    assert r.est_unseen == pytest.approx(0.5)
    assert r.coverage == pytest.approx(round(1 - 2 / 7, 6))


def test_discovery_coverage_saturated(spark):
    """Every URL seen repeatedly (f1=0): coverage exactly 1, chao1
    collapses to s_obs — the crawl-is-complete signal."""
    from linkinator_spark.functions.graph import discovery_coverage

    edges = spark.createDataFrame(
        [(0, 10), (1, 10), (0, 11), (1, 11)], "src long, dst long")
    r = discovery_coverage(edges).collect()[0]
    assert r.f1 == 0 and r.coverage == 1.0 and r.chao1 == float(r.s_obs)


def test_degree_powerlaw_hand_computed(spark):
    """in-degrees {10:1, 11:2, 12:3}, kmin=2 -> tail {2,3},
    alpha = 1 + 2/(ln(2/1.5)+ln(3/1.5))."""
    import math

    from linkinator_spark.functions.graph import degree_powerlaw

    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 11), (0, 12), (1, 12), (2, 12)],
        "src long, dst long")
    r = degree_powerlaw(edges, kmin=2).collect()[0]
    assert (r.n_nodes, r.n_tail, r.max_k) == (3, 2, 3)
    assert r.mean_k == pytest.approx(2.0)
    want = 1 + 2 / (math.log(2 / 1.5) + math.log(3 / 1.5))
    assert r.alpha == pytest.approx(round(want, 6))


def test_host_graph_stats_profile(spark):
    """Insular host a (2/3 internal), hub b (all external), pure-sink
    host c (in only, zeroed out-side)."""
    from linkinator_spark.functions.graph import host_graph_stats

    edges = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"),
         ("b", "c"), ("b", "a")],
        "src_host string, dst_host string")
    out = {r.host: r for r in host_graph_stats(edges).collect()}
    assert out["a"].out_links == 3 and out["a"].internal_pct == 66
    assert out["a"].n_dst_hosts == 2
    assert out["b"].internal_pct == 0 and out["b"].n_dst_hosts == 2
    assert out["c"].out_links == 0 and out["c"].in_links == 1
    assert out["c"].n_src_hosts == 1 and out["c"].internal_pct == 0


def test_fused_gear_matches_staged(spark):
    """The small-graph fused numpy gear must agree with the staged
    DataFrame loop: bit-exact for integer label propagation, within the
    6dp rounding the declared queries apply for the float algorithms."""
    import random

    from linkinator_spark.functions.graph import (
        hits, label_propagation, opic, trustrank)

    rng = random.Random(17)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(160)})
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(i,) for i in range(0, 40, 7)],
                                  "id long")

    def cmp(fused, staged, cols, exact=False):
        f = {r["node"]: tuple(r[c] for c in cols) for r in fused.collect()}
        s = {r["node"]: tuple(r[c] for c in cols) for r in staged.collect()}
        assert set(f) == set(s)
        for k in f:
            for a, b in zip(f[k], s[k]):
                if exact:
                    assert a == b, (k, a, b)
                else:
                    assert round(a, 6) == round(b, 6), (k, a, b)

    cmp(pagerank(df), pagerank(df, fuse_max_edges=0), ["pagerank"])
    cmp(hits(df), hits(df, fuse_max_edges=0), ["hub", "auth"])
    cmp(trustrank(df, seeds), trustrank(df, seeds, fuse_max_edges=0),
        ["trust"])
    cmp(opic(df), opic(df, fuse_max_edges=0),
        ["cash", "history", "importance"])
    cmp(label_propagation(df), label_propagation(df, fuse_max_edges=0),
        ["community"], exact=True)
