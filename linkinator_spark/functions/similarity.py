"""Approximate-nearest-neighbor search over embedding columns.

* `cosine_topk` — brute-force exact top-k (the baseline & the oracle-checked
  query): broadcast the query set, one pass over the corpus, per-query window
  rank. Exact, O(corpus x queries), fully JVM-side.
* `lsh_topk` — the scale path: sign-sketch (random-hyperplane) bucketing via
  a vectorized Arrow UDF (numpy matmul per batch), candidate generation by
  bucket join with multi-probe, exact re-rank inside candidates. At 10^10
  vectors the bucket join replaces the full cross product.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkinator_spark.functions.dedup import cosine_similarity


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for every query vector. queries is small ->
    broadcast; ties broken by corpus id for determinism."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q)).select(
        "query_id", "neighbor_id",
        cosine_similarity(F.col("cv"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def sign_buckets(
    df: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) via random-hyperplane signs — one numpy matmul per Arrow
    batch (vectorized, no per-row Python)."""
    planes = _planes(dim, n_planes, seed)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vid": [], "bucket": []})
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            signs = (mat @ planes) > 0
            bucket = signs @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame({"vid": pdf[id_col].values, "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(fn, "vid long, bucket long")


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_planes: int = 10, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", multiprobe: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: `n_tables` independent sign-sketch hash tables (one shared
    matmul computes all of them), candidates = union over tables of
    same-bucket rows (+multi-probe: flip each of the lowest `multiprobe`
    bits), exact cosine re-rank within candidates.

    Accuracy contract: recall@k vs `cosine_topk` depends on how similar the
    true neighbors are — near 1.0 for near-duplicate retrieval (neighbor
    cosine >= ~0.95, the 100-TB dedup/retrieval case; per-neighbor miss prob
    is (1 - p^R)^L with p = 1 - arccos(c)/pi), but low when true neighbors
    are weakly similar (random-vector corpora, where no sublinear method
    helps). bench.py measures recall@k and candidate fraction vs the exact
    baseline; tests/test_text_dedup.py asserts >= 0.9 on a planted
    near-dup task, and the ann_lsh_topk driver oracle value-checks the
    planted-retrieval configuration against exact SQL top-k."""
    from linkinator_spark.functions.dedup import hyperplane_band_buckets

    cb = hyperplane_band_buckets(
        corpus, dim, n_tables, n_planes, seed, id_col, vec_col)
    qb = hyperplane_band_buckets(
        queries, dim, n_tables, n_planes, seed, query_id_col, vec_col)
    probes = [F.col("band_hash")] + [
        F.col("band_hash").bitwiseXOR(F.lit(1 << i)) for i in range(multiprobe)
    ]
    qb = qb.select(
        "vid", "band_id", F.explode(F.array(*probes)).alias("band_hash"))

    cand = cb.alias("c").join(
        qb.alias("q"),
        (F.col("c.band_id") == F.col("q.band_id"))
        & (F.col("c.band_hash") == F.col("q.band_hash")),
    ).select(
        F.col("q.vid").alias("query_id"), F.col("c.vid").alias("neighbor_id")
    ).distinct()

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id").select(
        "query_id", "neighbor_id",
        cosine_similarity(F.col("cv"), F.col("qv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank")
    )
