"""Property-check the pure-Python xxhash64 twin against the JVM expression.

The fully-fused gear's retry jitter must be BIT-EXACT with the staged
engine's ``F.xxhash64(url, n1, seed)`` — these tests compare the twin to
Spark on random strings / ints / longs / nulls and on the exact operand
shape the jitter formula uses."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from linkinator_spark.functions.xxhash import Long, pmod, spark_xxhash64


def test_xxhash64_string_int_int_matches_spark(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(300):
        n = rng.randrange(0, 60)
        s = "".join(rng.choice("abcdefghijklmnop:/.#?%-_0123456789é✓")
                    for _ in range(n))
        rows.append((s, rng.randrange(-5, 100), rng.randrange(0, 10**6)))
    df = spark.createDataFrame(rows, "s string, a int, b int")
    got = df.select(F.xxhash64("s", "a", "b").alias("h")).collect()
    for (s, a, b), r in zip(rows, got):
        assert spark_xxhash64(s, a, b) == r["h"], (s, a, b)


def test_xxhash64_longs_and_nulls_match_spark(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(-2**62, 2**62),
             None if rng.random() < 0.3 else "u%d" % rng.randrange(99))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "l long, s string")
    got = df.select(F.xxhash64("l", "s").alias("h")).collect()
    for (l, s), r in zip(rows, got):
        assert spark_xxhash64(Long(l), s) == r["h"], (l, s)


def test_jitter_formula_matches_staged(spark):
    """The exact operand shape of the staged error-retry jitter:
    pmod(xxhash64(url, n1:int, seed:int), 10000)."""
    rng = random.Random(13)
    rows = [("http://h%d.test/p%d" % (rng.randrange(9), i),
             rng.randrange(1, 7)) for i in range(120)]
    df = spark.createDataFrame(rows, "url string, n1 int")
    got = df.select(
        F.pmod(F.xxhash64("url", "n1", F.lit(42)), F.lit(10000)).alias("j")
    ).collect()
    for (u, n1), r in zip(rows, got):
        assert pmod(spark_xxhash64(u, n1, 42), 10000) == r["j"], (u, n1)
