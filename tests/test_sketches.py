"""HLL cardinality + count-min sketches: estimate quality, invariance
under duplication/partitioning, and the CMS one-sided error guarantee."""

from pyspark.sql import functions as F

from linkinator_spark.functions.sketches import cms_estimate, hll_cardinality


def test_hll_duplicates_do_not_change_sketch(spark):
    base = spark.range(0, 300).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"))
    tripled = base.unionAll(base).unionAll(base)
    a = hll_cardinality(base, "key", ["g"]).collect()
    b = hll_cardinality(tripled, "key", ["g"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_estimate_tracks_cardinality(spark):
    rows = spark.range(0, 2000).select(
        F.when(F.col("id") < 1600, F.lit("big")).otherwise(F.lit("small"))
        .alias("g"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("key"))
    got = {r["g"]: r for r in hll_cardinality(rows, "key", ["g"]).collect()}
    # m=64 registers -> ~13% standard error; allow 3 sigma
    assert abs(got["big"]["est"] - 1600) / 1600 < 0.4
    assert abs(got["small"]["est"] - 400) / 400 < 0.4
    # the bigger set must estimate bigger
    assert got["big"]["est"] > got["small"]["est"]
    # register-state pins are integer-exact
    assert got["big"]["s_scaled"] > 0 and got["big"]["v_zero"] >= 0


def test_hll_small_range_uses_linear_counting(spark):
    rows = spark.createDataFrame(
        [("g", f"k{i}") for i in range(5)], "g string, key string")
    [r] = hll_cardinality(rows, "key", ["g"]).collect()
    # 5 keys into 64 registers: nearly all registers empty -> the
    # linear-counting branch, which is close to exact at this size
    assert r["v_zero"] >= 59
    assert abs(r["est"] - 5) < 1.5


def test_hll_invariant_under_repartition(spark):
    base = spark.range(0, 500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"))
    a = hll_cardinality(base.repartition(1), "key", ["g"]).collect()
    b = hll_cardinality(base.repartition(16), "key", ["g"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cms_one_sided_error_and_exact_counts(spark):
    # 5 hot keys x 100 + 400 cold singletons into a 4x64 sketch:
    # collisions are certain, undercounts are impossible
    rows = spark.range(0, 900).select(
        F.when(F.col("id") < 500,
               F.concat(F.lit("hot"), (F.col("id") % 5).cast("string")))
        .otherwise(F.concat(F.lit("cold"), F.col("id").cast("string")))
        .alias("key"))
    got = cms_estimate(rows, "key").collect()
    assert len(got) == 405
    for r in got:
        assert r["overcount"] >= 0
        assert r["est"] == r["exact"] + r["overcount"]
    by_key = {r["key"]: r for r in got}
    assert by_key["hot0"]["exact"] == 100
    assert by_key["cold777"]["exact"] == 1
    # the sketch is tiny; something must have collided
    assert any(r["overcount"] > 0 for r in got)


def test_cms_wide_sketch_is_near_exact(spark):
    rows = spark.createDataFrame(
        [(k,) for k in ["a", "a", "a", "b", "c"]], "key string")
    got = {r["key"]: r for r in cms_estimate(rows, "key", d=4, w=4096).collect()}
    assert got["a"]["exact"] == 3 and got["b"]["exact"] == 1
    # 3 keys in 4x4096 cells: no collisions at these fixed hashes
    assert all(r["overcount"] == 0 for r in got.values())
