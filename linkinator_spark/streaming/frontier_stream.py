"""Structured Streaming surface.

The reference is a terminating batch crawl (await queue.onIdle(),
/root/reference/src/index.ts:290), so the core engine is batch-iterative.
These streaming entry points cover the continuous-ingest shape a production
frontier would use: new candidate URLs arrive as files/streams, are
canonicalized, deduplicated within the watermark horizon, and handed to the
wave scheduler; fetch/result metrics aggregate over event-time windows.

Tested with availableNow triggers (bounded) — the same code runs unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkinator_spark.functions.urls import url_host


def stream_candidates(
    spark: SparkSession, input_dir: str, schema: str = "url string, ts timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-source candidate stream -> canonical frontier rows, streaming
    dedup by URL within the watermark horizon (dropDuplicates state is the
    streaming analog of the URL-seen set; the authoritative exact set still
    lives in the batch `seen` table)."""
    raw = spark.readStream.schema(schema).parquet(input_dir)
    canon = raw.select(
        F.lower(F.regexp_replace("url", r"#.*$", "")).alias("url"),
        F.col("ts"),
    ).withColumn("host", url_host(F.col("url")))
    return canon.withWatermark("ts", watermark).dropDuplicates(["url"])


def stream_fetch_metrics(
    spark: SparkSession, input_dir: str,
    schema: str = "url string, host string, status int, ts timestamp",
    window: str = "1 minute", watermark: str = "5 minutes",
) -> DataFrame:
    """Windowed per-host fetch metrics (throughput, broken rate) with late
    data handled by the watermark — the streaming twin of the per-wave
    metrics the batch engine checkpoints."""
    raw = spark.readStream.schema(schema).parquet(input_dir)
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when((F.col("status") >= 400) | (F.col("status") == 0), 1)
                  .otherwise(0)).alias("n_broken"),
        )
        .select(F.col("w.start").alias("window_start"), "host", "n_fetched", "n_broken")
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, mode: str = "append"):
    """Drain everything currently available into an in-memory table and stop
    — bounded execution of the unbounded plan (used by tests/benches)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stream_out")
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
