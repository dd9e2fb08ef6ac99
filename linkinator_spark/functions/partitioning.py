"""Scale-adaptive input spreading.

The fixture/bench parquet tables are written as ONE row group, so a scan
arrives as 1-2 partitions and every expensive projection downstream of it
(interpreted higher-order transforms, regex extraction, Arrow UDF batches)
runs on 1-2 cores regardless of `local[N]`. At cluster scale the same scan
has thousands of splits and a blanket `repartition()` would be a wasteful
full shuffle of the payload.

`spread_small_scan` bridges the two: it round-robin repartitions ONLY when
the physical scan has fewer partitions than the session's parallelism —
a no-op exactly where the input is already wide. Row-preserving, so query
results are unchanged (declared queries compare as sorted sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_ratio: int = 1) -> DataFrame:
    """Repartition `df` to the default parallelism iff its current physical
    partitioning is narrower than `parallelism * min_ratio`. The partition
    count probe plans the query but runs no job."""
    if df.isStreaming:  # micro-batch partitioning is the planner's call
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_ratio
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    if n >= target:
        return df
    return df.repartition(target)
