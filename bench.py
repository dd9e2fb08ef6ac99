#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus extra keys: frontier throughput (the north-rule metric) and, when
--scaling is passed, a two-parallelism run (local[8] vs local[32]) with
scaling efficiency.

Usage:
  python bench.py                 # per-round driver invocation
  python bench.py --scaling       # also run the N vs 4N evidence protocol
  SPARK_GRAFT_CPUS=8 python bench.py --frontier-only   # one scaling leg
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FRONTIER_N = int(os.environ.get("BENCH_FRONTIER_N", "2000000"))


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", path)
    return float(m.group(1)) if m else 0.0


def frontier_pipeline_sec(spark, n_urls: int) -> float:
    """The north-rule workload: N frontier URLs through canonicalize-hash ->
    Bloom-less exact seen anti-join -> per-host politeness ranking ->
    classification projection. Returns wall seconds (input generation is
    part of the measured pipeline; it is pure codegen)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from linkinator_spark.sources.webgraph import synth_frontier

    frontier = synth_frontier(spark, n_urls, n_hosts=5000, skew=4.0)
    # half the URL space is already seen (every even id)
    seen = synth_frontier(spark, n_urls, n_hosts=5000, skew=4.0).filter(
        F.col("seq") % 2 == 0
    ).select("url_hash")

    t0 = time.time()
    fresh = frontier.join(seen, "url_hash", "left_anti")
    w = Window.partitionBy("host").orderBy("seq")
    scheduled = fresh.withColumn("host_rank", F.row_number().over(w))
    out = scheduled.select(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("host_rank") <= 100, 1).otherwise(0)).alias("first_budget"),
    ).collect()[0]
    dt = time.time() - t0
    assert out["n"] > 0
    return dt


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    headline = [
        "frontier_bfs",         # iterative wave join (BFS over derived graph)
        "extract_links",        # Arrow-side regex extraction + explode
        "dedup_minhash_lsh",    # shingle->minhash->band join
        "dedup_exact",
        "ann_cosine_topk",      # brute-force cosine top-k
        "text_quality",         # single-pass quality features
        "span_flatten",         # interleaved span derivation + explode
        "events_windowed",      # tumbling-window agg
    ]
    qs = E.queries()
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
        assert n >= 0
    return times


def one_leg(cpus: int, n_urls: int) -> dict:
    """One scaling leg in a fresh Spark session pinned to `cpus` cores."""
    from linkinator_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-local{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    # warm the JVM/codegen path once
    frontier_pipeline_sec(spark, 50_000)
    sec = frontier_pipeline_sec(spark, n_urls)
    spark.stop()
    return {"cpus": cpus, "urls": n_urls, "sec": round(sec, 3),
            "urls_per_sec": round(n_urls / sec, 1)}


def main() -> None:
    args = set(sys.argv[1:])

    if "--frontier-only" in args:
        leg = one_leg(CPUS, FRONTIER_N)
        print(json.dumps(leg))
        return

    from linkinator_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)

    queries = run_headline(spark, SF_DIR)

    # frontier throughput at current parallelism (north-rule metric)
    frontier_pipeline_sec(spark, 50_000)  # warm-up
    fsec = frontier_pipeline_sec(spark, FRONTIER_N)
    spark.stop()

    out = {
        "metric": "headline_suite_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(SF_DIR),
        "frontier_urls": FRONTIER_N,
        "frontier_sec": round(fsec, 3),
        "frontier_urls_per_sec": round(FRONTIER_N / fsec, 1),
        "cpus": CPUS,
    }

    if "--scaling" in args:
        legs = [one_leg(8, FRONTIER_N), one_leg(32, FRONTIER_N)]
        eff = (legs[1]["urls_per_sec"] / legs[0]["urls_per_sec"]) / 4.0
        out["scaling"] = {
            "n": legs[0], "four_n": legs[1],
            "efficiency": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
