"""Synthetic frontier/web-graph generator for scale benchmarks.

Deterministic (seed-hashed, no RNG state), generated distributed via
`spark.range` — no driver-side materialization, so the same generator scales
from 10^4 (smoke) to 10^8+ rows (the 10^10 design point sharded across
executors). Host distribution is power-law skewed so hot-host salting and
AQE skew handling have something to chew on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_frontier(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 1000,
    skew: float = 4.0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Frontier rows (url, host, url_hash, not_before, seq).

    host rank ~ floor(n_hosts * u^skew): a few hosts get most URLs.
    """
    df = spark.range(0, n_urls, 1, partitions or spark.sparkContext.defaultParallelism)
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000_007))
         / 1_000_000_007.0)
    host_id = F.floor(F.pow(u, skew) * n_hosts).cast("long")
    host = F.concat(F.lit("host-"), host_id.cast("string"), F.lit(".example"))
    url = F.concat(
        F.lit("http://"), host, F.lit("/path/"),
        F.conv(F.col("id").cast("string"), 10, 16),
        F.lit("/page"), (F.col("id") % 97).cast("string"),
    )
    return df.select(
        url.alias("url"),
        host.alias("host"),
        F.xxhash64(url).alias("url_hash"),
        F.lit(0.0).alias("not_before"),
        F.col("id").alias("seq"),
    )


def hot_host_salts(frontier: DataFrame, threshold: int) -> DataFrame:
    """(host, salt_factor) for hosts whose frontier share exceeds the
    threshold — drives explicit skew-salting of the fetch shuffle."""
    return (
        frontier.groupBy("host").agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
        .select(
            "host",
            F.ceil(F.col("n") / threshold).cast("int").alias("salt_factor"),
        )
    )


def with_salt(frontier: DataFrame, salts: DataFrame) -> DataFrame:
    """Append a salt column: pmod(url_hash, salt_factor) for hot hosts, 0
    otherwise. Partitioning on (host, salt) splits hot hosts across
    executors while cold hosts stay single-partition (politeness intact:
    per-host order is restored within each salt stripe by seq)."""
    return (
        frontier.join(F.broadcast(salts), "host", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("salt_factor").isNotNull(),
                F.pmod(F.col("url_hash"), F.col("salt_factor")),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("salt_factor")
    )
