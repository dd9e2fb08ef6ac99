"""plans/treefold.tree_fold contract: equals a plain driver-side fold for
arbitrary fold/merge algebras, returns zero on empty input, and never
ships data rows to the driver (only pickled accumulator blobs)."""

import numpy as np
import pyspark.sql.functions as F

from linkinator_spark.plans.treefold import tree_fold


def test_sum_and_count_fold(spark):
    df = spark.range(0, 10_000, 1, 16).select(F.col("id"))

    def fold(acc, pdf):
        return (acc[0] + int(pdf["id"].sum()), acc[1] + len(pdf))

    def merge(a, b):
        return (a[0] + b[0], a[1] + b[1])

    assert tree_fold(df, lambda: (0, 0), fold, merge) == (49_995_000, 10_000)


def test_dict_fold_matches_driver_side(spark):
    df = spark.range(0, 500, 1, 8).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v"))

    def fold(acc, pdf):
        for k, v in zip(pdf["k"], pdf["v"]):
            acc.setdefault(int(k), []).append(int(v))
        return acc

    def merge(a, b):
        for k, v in b.items():
            a.setdefault(k, []).extend(v)
        return a

    got = tree_fold(df, dict, fold, merge)
    want = {}
    for i in range(500):
        want.setdefault(i % 7, []).append(i)
    assert {k: sorted(v) for k, v in got.items()} == want


def test_empty_input_returns_zero(spark):
    df = spark.range(0).select(F.col("id"))
    zero = tree_fold(df, lambda: ("z", 0), lambda a, p: ("nz", 1),
                     lambda a, b: ("m", a[1] + b[1]))
    assert zero == ("z", 0)


def test_bitmap_or_fold(spark):
    df = spark.range(0, 256, 1, 16).select(F.col("id"))

    def fold(acc, pdf):
        for i in pdf["id"]:
            acc[int(i) // 8] |= 1 << (int(i) % 8)
        return acc

    def merge(a, b):
        np.bitwise_or(a, b, out=a)
        return a

    bits = tree_fold(df, lambda: np.zeros(32, dtype=np.uint8), fold, merge)
    assert bits.tolist() == [0xFF] * 32
