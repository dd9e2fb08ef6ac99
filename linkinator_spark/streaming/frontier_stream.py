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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkinator_spark.functions.urls import url_host


def stream_candidates(
    spark: SparkSession, input_dir: str, schema: str = "url string, ts timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-source candidate stream -> canonical frontier rows, streaming
    dedup by URL within the watermark horizon (the dedup state is the
    streaming analog of the URL-seen set; the authoritative exact set still
    lives in the batch `seen` table).

    Uses ``dropDuplicatesWithinWatermark`` — NOT plain ``dropDuplicates``:
    with a key that excludes the event-time column, plain dropDuplicates
    keeps every key's state FOREVER (the watermark never evicts it), which
    on an unbounded candidate stream is an O(all URLs ever seen) state
    store on the hot path. WithinWatermark expires each URL's state one
    watermark-delay after its arrival, bounding state to the horizon."""
    raw = spark.readStream.schema(schema).parquet(input_dir)
    canon = raw.select(
        F.lower(F.regexp_replace("url", r"#.*$", "")).alias("url"),
        F.col("ts"),
    ).withColumn("host", url_host(F.col("url")))
    return canon.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["url"])


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


def stream_politeness_gate(
    candidates: DataFrame, min_delay_ms: int = 1000,
) -> DataFrame:
    """Custom stateful streaming operator: per-host FIFO admission with a
    minimum inter-fetch delay — the streaming twin of the batch host-delay
    gate (operators/crawler.py host_delays; reference delay semantics
    src/index.ts:1019-1070). State per host = the last scheduled fetch
    time; each micro-batch's rows are admitted in event-time order at
    `max(arrival, last + delay)`. Implemented with
    `applyInPandasWithState` (Arrow-batched, one state row per host —
    state size is O(hosts), not O(urls), so 10^7 hosts ≈ hundreds of MB
    across the cluster's state store, partitioned by the groupBy key)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    delay_s = min_delay_ms / 1000.0
    out_schema = ("url string, host string, ts timestamp, "
                  "not_before timestamp")

    def gate(key, pdf_iter, state):
        last = state.get[0] if state.exists else None
        frames = [p for p in pdf_iter if len(p)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts", "url"])
        sched = []
        for t in rows["ts"]:
            t_s = t.timestamp()
            nxt = t_s if last is None else max(t_s, last + delay_s)
            sched.append(nxt)
            last = nxt
        state.update((float(last),))
        out = rows[["url", "host", "ts"]].copy()
        out["not_before"] = pd.to_datetime(
            pd.Series(sched, index=rows.index), unit="s")
        yield out

    return candidates.groupBy("host").applyInPandasWithState(
        gate, out_schema, "last double", "append",
        GroupStateTimeout.NoTimeout,
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


def stream_host_health(
    fetches: DataFrame,
    rate_micro: int = 300_000,
    min_fetches: int = 20,
    max_trailing: int = 5,
) -> DataFrame:
    """Custom stateful streaming operator: the per-host circuit breaker
    (operators/health.py) as a continuous query — state per host =
    (lifetime fetches, lifetime errors, trailing consecutive failures),
    updated per micro-batch and carried across restarts by the state
    store. Emits one verdict row per host per micro-batch with the same
    two trip rules as the batch rollup (cross-multiplied error rate
    gated on min_fetches, checked first; trailing failures since the
    last success). State is three int64s per host — O(hosts), not
    O(fetches) — and the batch update is vectorized numpy over the
    Arrow-delivered rows (no per-row Python arithmetic: counters are
    sums, and the trailing run is `len - 1 - last_success_index`).

    Input stream: (url string, host string, ts timestamp,
    failed boolean)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("host string, n_fetches long, n_errors long, "
                  "trailing_failures long, tripped boolean, "
                  "trip_reason string")

    def breaker(key, pdf_iter, state):
        n, e, tr = state.get if state.exists else (0, 0, 0)
        frames = [p for p in pdf_iter if len(p)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(["ts", "url"])
        arr = rows["failed"].to_numpy(dtype=bool)
        n += len(arr)
        e += int(arr.sum())
        ok_idx = np.nonzero(~arr)[0]
        if len(ok_idx):
            tr = int(len(arr) - 1 - ok_idx[-1])
        else:
            tr += len(arr)
        state.update((int(n), int(e), int(tr)))
        if n >= min_fetches and e * 1_000_000 >= rate_micro * n:
            reason = "error_rate"
        elif tr >= max_trailing:
            reason = "trailing_failures"
        else:
            reason = ""
        yield pd.DataFrame({
            "host": [key[0]], "n_fetches": [n], "n_errors": [e],
            "trailing_failures": [tr], "tripped": [reason != ""],
            "trip_reason": [reason],
        })

    return fetches.groupBy("host").applyInPandasWithState(
        breaker, out_schema, "n long, e long, tr long", "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_blocklist_gate(candidates: DataFrame, rules: DataFrame,
                          rule_col: str = "domain") -> DataFrame:
    """Tag streaming frontier candidates with their domain-blocklist
    verdict: adds (blocked:int, no rows dropped — the caller filters),
    matching the batch operator's suffix-set semantics (a listed domain
    blocks itself and every subdomain; functions/blocklist.py).

    The batch path (apply_blocklist) is an explode + broadcast join +
    per-URL argmax — that final aggregate is illegal in an append-mode
    stream, so here the rules dim (metadata-scale: real blocklists are
    10^4..10^6 domains, a few MB) collects ONCE into a broadcast
    frozenset and the suffix probe runs as an Arrow-batched pandas UDF
    (set lookups per label suffix, ~4 probes/host — vectorized batch
    transfer, not per-row Python serialization). If a blocklist ever
    outgrows broadcast, gate AFTER landing in the batch layer with
    apply_blocklist's join form instead.
    """
    from pyspark.sql.functions import pandas_udf

    spark = candidates.sparkSession
    domains = frozenset(
        r[0].lower() for r in rules.select(rule_col).collect()
        if r[0] is not None)
    bc = spark.sparkContext.broadcast(domains)

    @pandas_udf("int")
    def _blocked(host: pd.Series) -> pd.Series:
        rs = bc.value

        def probe(h):
            if not isinstance(h, str) or not h:
                return 0
            parts = h.lower().split(".")
            return int(any(".".join(parts[i:]) in rs
                           for i in range(len(parts))))

        return host.map(probe).astype("int32")

    return candidates.withColumn("blocked", _blocked(F.col("host")))
