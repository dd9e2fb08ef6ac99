"""Partitioned Bloom URL-seen pre-filter.

At 10^10-URL frontier scale the exact seen anti-join (J2) shuffles every
candidate. A Bloom filter built over the seen set and broadcast to the
candidate side drops the (vast) majority of already-seen candidates before
the shuffle; the anti-join then restores exactness (Bloom false positives are
rows that *would* have been dropped by the join anyway, so correctness is
join-guaranteed — the reference semantics demand the exact set,
/root/reference/src/index.ts:813-817).

Implementation: a numpy bit array built from the 64-bit url hashes, k derived
hash probes via splitmix64 remixing — vectorized construction (one numpy
bitmap per partition, OR-merged executor-side via ``tree_fold``) and
vectorized probing inside an Arrow-batched mapInPandas. No per-row Python,
and no row ever reaches the driver — only bitmaps do.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    def __init__(self, expected: int, fpp: float = 0.01):
        m = max(64, int(-expected * math.log(max(fpp, 1e-9)) / (math.log(2) ** 2)))
        self.n_bits = 1 << max(6, math.ceil(math.log2(m)))  # power of two
        self.k = max(1, round(self.n_bits / max(expected, 1) * math.log(2)))
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> list[np.ndarray]:
        h = hashes.astype(np.int64).view(np.uint64)
        out = []
        cur = h
        for _ in range(self.k):
            cur = _splitmix64(cur)
            out.append((cur & np.uint64(self.n_bits - 1)).astype(np.int64))
        return out

    def add_many(self, hashes: np.ndarray) -> None:
        for pos in self._positions(hashes):
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        res = np.ones(len(hashes), dtype=bool)
        for pos in self._positions(hashes):
            res &= (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return res


def partition_bitmaps(hashed: DataFrame, n_bits: int, k: int) -> DataFrame:
    """One summary row per partition: the partition's local Bloom bitmap.
    Rows never reach the driver — only bitmaps do (via tree_fold)."""
    size = n_bits // 8

    def fn(batches):
        bits = np.zeros(size, dtype=np.uint8)
        bf = BloomFilter.__new__(BloomFilter)
        bf.bits, bf.n_bits, bf.k = bits, n_bits, k
        seen_any = False
        for pdf in batches:
            if len(pdf):
                bf.add_many(pdf["h"].to_numpy(dtype=np.int64))
                seen_any = True
        if seen_any:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    return hashed.mapInPandas(fn, "bits binary")


def build_bloom(seen: DataFrame, url_col: str = "url",
                expected: int = 1_000_000, fpp: float = 0.01) -> BloomFilter:
    """Distributed build: hash JVM-side (xxhash64), one numpy bitmap per
    partition (Arrow-batched, vectorized), OR-merged executor-side via
    ``tree_fold`` (DataFrame-native depth-2 tree). The driver sees only
    bitmaps — never rows — so a 10^10-key frontier builds without driver
    materialization."""
    from linkinator_spark.plans.treefold import tree_fold

    bloom = BloomFilter(expected, fpp)
    hashed = seen.select(F.xxhash64(F.col(url_col)).alias("h"))
    maps = partition_bitmaps(hashed, bloom.n_bits, bloom.k)

    size = bloom.n_bits // 8

    def _fold(acc: np.ndarray, pdf) -> np.ndarray:
        for b in pdf["bits"]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return acc

    def _or(acc: np.ndarray, other: np.ndarray) -> np.ndarray:
        np.bitwise_or(acc, other, out=acc)
        return acc

    bloom.bits = tree_fold(
        maps, lambda: np.zeros(size, dtype=np.uint8), _fold, _or)
    return bloom


def broadcast_bloom(spark, bloom: BloomFilter):
    """Snapshot the filter into a Spark broadcast (copy the bits: the crawl
    loop mutates its BloomFilter between waves, and local mode can alias
    driver objects)."""
    return spark.sparkContext.broadcast(
        {"bits": bloom.bits.copy(), "n_bits": bloom.n_bits, "k": bloom.k}
    )


def bloom_prefilter(candidates: DataFrame, bloom: BloomFilter,
                    url_col: str = "url",
                    payload=None) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_new, maybe_seen).

    definitely_new rows SKIP the anti-join shuffle entirely; maybe_seen rows
    (a small slice at scale) go through the exact anti-join. Pass `payload`
    (from `broadcast_bloom`) to reuse one broadcast across several plans in
    a wave instead of re-broadcasting per call."""
    spark = candidates.sparkSession
    if payload is None:
        payload = broadcast_bloom(spark, bloom)

    def fn(batches):
        bf = BloomFilter.__new__(BloomFilter)
        bf.bits = payload.value["bits"]
        bf.n_bits = payload.value["n_bits"]
        bf.k = payload.value["k"]
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(_maybe_seen=pd.Series([], dtype=bool))
                continue
            hashes = pdf["_h"].to_numpy(dtype=np.int64)
            yield pdf.assign(_maybe_seen=bf.might_contain(hashes))

    with_hash = candidates.withColumn("_h", F.xxhash64(F.col(url_col)))
    # build a NEW StructType — StructType.add would mutate the DataFrame's
    # cached schema object and corrupt df.columns
    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(
        list(with_hash.schema.fields) + [StructField("_maybe_seen", BooleanType())]
    )
    flagged = with_hash.mapInPandas(fn, schema)
    new = flagged.filter(~F.col("_maybe_seen")).drop("_h", "_maybe_seen")
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_h", "_maybe_seen")
    return new, maybe


def dedup_with_bloom(candidates: DataFrame, seen: DataFrame, bloom: BloomFilter,
                     url_col: str = "url") -> DataFrame:
    """Exact frontier dedup with the Bloom fast path: output = candidates
    not in seen (identical to a plain left-anti join, cheaper at scale)."""
    new, maybe = bloom_prefilter(candidates, bloom, url_col)
    verified = maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
    return new.unionByName(verified)
