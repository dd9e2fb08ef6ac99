"""Mirror-site detection: planted mirrors surface, boilerplate
fingerprints are gated, Jaccard micro-points are exact."""

from pyspark.sql import functions as F

from linkinator_spark.functions.mirrors import host_mirrors


def _sites(spark, rows):
    return spark.createDataFrame(rows, "host string, fp string")


def test_full_and_partial_mirrors(spark):
    rows = (
        [("a", f"f{i}") for i in range(10)]
        + [("b", f"f{i}") for i in range(10)]          # full mirror of a
        + [("c", f"f{i}") for i in range(5)]           # half of a
        + [("c", f"g{i}") for i in range(5)]
        + [("d", f"x{i}") for i in range(10)]          # disjoint
    )
    got = {(r["host_a"], r["host_b"]): r
           for r in host_mirrors(_sites(spark, rows),
                                 min_jaccard_micro=100_000).collect()}
    assert got[("a", "b")]["jaccard_micro"] == 1_000_000
    assert got[("a", "b")]["shared"] == 10
    # |a ∩ c| = 5, |a ∪ c| = 15 -> 333333 micro
    assert got[("a", "c")]["jaccard_micro"] == 333_333
    assert got[("b", "c")]["jaccard_micro"] == 333_333
    assert not any("d" in k for k in got)


def test_threshold_filters_weak_overlap(spark):
    rows = ([("a", f"f{i}") for i in range(100)]
            + [("b", "f0")] + [("b", f"y{i}") for i in range(9)])
    # |a ∩ b| = 1, union = 109 -> 9174 micro, below a 10% threshold
    got = host_mirrors(_sites(spark, rows), min_jaccard_micro=100_000).collect()
    assert got == []


def test_boilerplate_fingerprint_gated(spark):
    # 60 hosts share one boilerplate fp; two of them also share real
    # content. With max_fp_df=50 the boilerplate neither pairs the 60
    # hosts nor inflates the two real hosts' set sizes.
    rows = [(f"h{i}", "boiler") for i in range(60)]
    rows += [("h0", f"f{i}") for i in range(4)]
    rows += [("h1", f"f{i}") for i in range(4)]
    got = host_mirrors(_sites(spark, rows), min_jaccard_micro=100_000,
                       max_fp_df=50).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"]) == ("h0", "h1")
    assert r["size_a"] == 4 and r["size_b"] == 4
    assert r["jaccard_micro"] == 1_000_000


def test_duplicate_page_rows_collapse(spark):
    rows = [("a", "f1"), ("a", "f1"), ("a", "f1"), ("b", "f1")]
    [r] = host_mirrors(_sites(spark, rows), min_jaccard_micro=100_000).collect()
    assert r["shared"] == 1 and r["size_a"] == 1 and r["size_b"] == 1


def test_mirror_groups_canonical_election(spark):
    """Pairs close transitively into groups; each group's canonical host
    is the max-volume host (ties -> lexicographically smallest). Chain
    a~b~c must land in ONE group even though (a,c) never pair directly."""
    from linkinator_spark.functions.mirrors import host_mirror_groups

    # group 1: chain a-b-c (a∩b and b∩c overlap, a∩c don't); volumes
    # a=4, b=5, c=4 -> canonical b
    rows = [("a", f"x{i}") for i in range(4)]
    rows += [("b", f"x{i}") for i in range(4)] + [("b", "y0")]
    rows += [("c", "y0")] + [("c", f"z{i}") for i in range(3)]
    # group 2: perfect pair d=e (volume tie) -> canonical d
    rows += [("d", f"w{i}") for i in range(3)]
    rows += [("e", f"w{i}") for i in range(3)]
    # loner f: no qualifying pair -> absent from the output
    rows += [("f", "lone")]
    got = {r.host: (r.canonical_host, r.group_size, r.size)
           for r in host_mirror_groups(
               _sites(spark, rows), min_jaccard_micro=100_000).collect()}
    assert got == {
        "a": ("b", 3, 4), "b": ("b", 3, 5), "c": ("b", 3, 4),
        "d": ("d", 2, 3), "e": ("d", 2, 3),
    }
