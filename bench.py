#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus extra keys: frontier throughput (the north-rule metric) and, when
--scaling is passed, the two-parallelism N-vs-4N run (local[2] vs local[8])
with scaling efficiency. See BENCH/BASELINE.md for the protocol rationale.

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
FRONTIER_N = int(os.environ.get("BENCH_FRONTIER_N", "8000000"))

# driver memory is a JVM-launch-time setting: it must be in the environment
# before the first SparkSession of this process
os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", path)
    return float(m.group(1)) if m else 0.0


def frontier_pipeline_sec(spark, n_urls: int) -> float:
    """The north-rule workload: N *raw* frontier URLs through JVM
    canonicalization (lowercase scheme/host, default-port strip, fragment
    strip) -> xxhash64 -> exact seen anti-join -> skew-salted per-host
    politeness top-K -> budget aggregation. Returns wall seconds (input
    generation is part of the measured pipeline; it is pure codegen)."""
    from pyspark.sql import functions as F

    from linkinator_spark.operators.politeness import politeness_take
    from linkinator_spark.sources.webgraph import synth_frontier

    raw = synth_frontier(spark, n_urls, n_hosts=5000, skew=4.0).select(
        # mess the URLs up the way a real extraction stage sees them
        F.concat(
            F.lit("HTTP://"),
            F.upper(F.substring("host", 1, 4)), F.expr("substring(host, 5)"),
            F.lit(":80"),
            F.regexp_replace("url", r"^http://[^/]+", ""),
            F.lit("#Sec-"), (F.col("seq") % 50).cast("string"),
        ).alias("raw_url"),
        "host", "not_before", "seq",
    )
    seen = synth_frontier(spark, n_urls, n_hosts=5000, skew=4.0).filter(
        F.col("seq") % 2 == 0
    ).select("url_hash")

    t0 = time.time()
    no_frag = F.regexp_replace("raw_url", r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z\d+.-]*):", 1))
    hostp = F.lower(F.regexp_extract(no_frag, r"^[^:]+://([^/?#]+)", 1))
    host_noport = F.regexp_replace(hostp, r":80$", "")
    path = F.regexp_extract(no_frag, r"^[^:]+://[^/?#]+([^#]*)$", 1)
    canon = F.concat(scheme, F.lit("://"), host_noport,
                     F.when(path == "", "/").otherwise(path))
    frontier = raw.select(
        canon.alias("url"), host_noport.alias("host"),
        F.xxhash64(canon).alias("url_hash"), "not_before", "seq",
    )
    fresh = frontier.join(seen, "url_hash", "left_anti")
    scheduled = politeness_take(fresh, budget=100, salt_threshold=50_000)
    out = scheduled.agg(F.count("*").alias("n")).collect()[0]
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
    # warm pass at the smallest sf: JIT/codegen cold-start dominates a
    # first run (measured up to 2.5x on the iterative BFS); the measured
    # number should reflect steady-state execution, not JVM warm-up
    warm_dir = sf_dir.replace("sf0.1", "sf0.001")
    for name in headline:
        qs[name](spark, warm_dir if os.path.isdir(warm_dir) else sf_dir).count()
    # best-of-3 per query (round 5): the shared host shows 1.5-2x
    # noisy-window swings on UNCHANGED legs between back-to-back runs;
    # min wall is the least-interfered reading — the same statistic the
    # frontier leg has always used. (Rounds 1-4 stamped a single pass,
    # so cross-round per-query deltas under ~2x are window noise, not
    # code; see BENCH/BASELINE.md.)
    times: dict[str, float] = {}
    for name in headline:
        runs = []
        for _ in range(3):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
            assert n >= 0
        times[name] = round(min(runs), 3)
    return times


def ann_lsh_recall(spark, sf_dir: str) -> dict:
    """Accuracy contract for the approximate ANN operator: recall@5 of
    multi-table LSH vs the exact cosine baseline on the planted near-dup
    corpus, at a leaner table count than the oracle configuration (the
    oracle runs L=8 / recall 1.0; this measures the scale-path tradeoff)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from linkinator_spark.functions.similarity import cosine_topk, lsh_topk

    corpus = E._ann_corpus(spark, sf_dir)
    queries = corpus.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2_000_000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(corpus, queries, k=5).collect()}
    t0 = time.time()
    approx = {(r["query_id"], r["neighbor_id"])
              for r in lsh_topk(corpus, queries, dim=64, k=5,
                                n_planes=8, n_tables=4).collect()}
    t1 = time.time()
    from linkinator_spark.functions.similarity import ivf_topk

    ivf = {(r["query_id"], r["neighbor_id"])
           for r in ivf_topk(corpus, queries, k=5, n_lists=16,
                             nprobe=2).collect()}
    t2 = time.time()
    return {
        "recall_at_5": round(len(approx & exact) / max(len(exact), 1), 4),
        "tables": 4, "planes": 8, "k": 5,
        # t1-t0 is the LSH leg alone; time.time()-t0 here would silently
        # fold the IVF leg into lsh_sec (a phantom 2.8x "regression")
        "lsh_sec": round(t1 - t0, 3),
        "ivf": {
            "recall_at_5": round(len(ivf & exact) / max(len(exact), 1), 4),
            "n_lists": 16, "nprobe": 2, "k": 5,
            "ivf_sec": round(t2 - t1, 3),
        },
    }


def broken_link_recall(spark, sf_dir: str) -> dict:
    """North-rule metric: broken-link recall of the full crawl engine vs the
    graph's ground truth. The synthetic web graph is deterministic
    (plans/graphgen.py), so the expected broken set is closed-form: nodes
    reachable through 200-status pages whose own status != 200. Runs at
    sf0.01 (the fused engine gears made the full-crawl gate cheap enough
    to leave fixture scale; fallback to the smallest SF if absent)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    mid = sf_dir.replace("sf0.1", "sf0.01")
    small = sf_dir.replace("sf0.1", "sf0.001")
    d = (mid if os.path.isdir(mid)
         else small if os.path.isdir(small) else sf_dir)
    t0 = time.time()
    res = E.queries()["crawl_bfs_engine"](spark, d)
    found = {r["url"] for r in
             res.filter(F.col("state") == "BROKEN").collect()}
    reach = E.queries()["frontier_bfs"](spark, d)  # url/wave/status/state
    expected = {r["url"] for r in
                reach.filter(F.col("status") != 200).collect()}
    inter = len(found & expected)
    return {
        "recall": round(inter / max(len(expected), 1), 4),
        "precision": round(inter / max(len(found), 1), 4),
        "expected_broken": len(expected),
        "found_broken": len(found),
        "sec": round(time.time() - t0, 3),
        "sf": _sf_label(d),
    }


def one_leg(cpus: int, n_urls: int) -> dict:
    """One scaling leg in a fresh Spark session pinned to `cpus` cores."""
    from linkinator_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-local{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            # shuffle blocks on tmpfs: the measurement targets compute+network
            # scaling, not the sandbox's disk bandwidth
            "spark.local.dir": "/dev/shm/spark-bench",
            # cached frontier + 16 executor threads need real heap; the box
            # has 128 GiB
            "spark.driver.memory": "32g",
        },
    )
    # warm the JVM/codegen/shuffle paths at real scale once, then best-of-3
    # (the sandbox timings are noisy; min wall-clock is the least-interfered
    # measurement — a cold first run is up to 1.4x slower than steady state)
    frontier_pipeline_sec(spark, max(50_000, n_urls // 8))
    runs = []
    for _ in range(3):
        spark.catalog.clearCache()
        runs.append(frontier_pipeline_sec(spark, n_urls))
    sec = min(runs)
    spark.stop()
    return {"cpus": cpus, "urls": n_urls, "sec": round(sec, 3),
            "urls_per_sec": round(n_urls / sec, 1),
            "runs": [round(r, 2) for r in runs]}


def _git_head() -> str:
    """Commit hash stamped into SCALING.json so stale N-vs-4N evidence is
    detectable when the block is copied into later per-round bench output."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except OSError:
        return "unknown"


def main() -> None:
    args = set(sys.argv[1:])

    if "--frontier-only" in args:
        leg = one_leg(CPUS, FRONTIER_N)
        print(json.dumps(leg))
        return

    from linkinator_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-bench"})

    queries = run_headline(spark, SF_DIR)
    ann = ann_lsh_recall(spark, SF_DIR)
    broken = broken_link_recall(spark, SF_DIR)

    # end-to-end near-dup clustering (pairs -> connected components ->
    # canonical keeper); time dominated by the minhash+jaccard pair
    # generation — the CC step itself takes the fused union-find gear at
    # this scale (star rounds are the 10^10-pair path)
    import __spark_entry__ as E

    t0 = time.time()
    cc_rows = E.queries()["dedup_cc_canonical"](spark, SF_DIR).count()
    cc = {"sec": round(time.time() - t0, 3), "rows": cc_rows}

    # end-to-end corpus assembly (dedup keeper -> decontamination ->
    # lang/quality gates -> split): the composition a training pipeline
    # actually ships; measured whole so the broadcast-probe + two-shuffle
    # dedup shape has a tracked number
    t0 = time.time()
    corpus_rows = E.queries()["corpus_build"](spark, SF_DIR).count()
    corpus = {"sec": round(time.time() - t0, 3), "rows": corpus_rows}

    # the FineWeb-order curation chain (blocklist -> C4 -> Gopher ->
    # dedup keeper -> split): all content gates are one codegen
    # projection, so this leg tracks the gate+keeper shape, not explodes
    t0 = time.time()
    v2_rows = E.queries()["corpus_build_v2"](spark, SF_DIR).count()
    corpus_v2 = {"sec": round(time.time() - t0, 3), "rows": v2_rows}

    # the interleaved multimodal chain (span gate -> post-gate media
    # dedup -> cleaned re-cost -> pack): tracks the span-table rollup +
    # uniform-ref dedup + bucket-cumsum shapes end-to-end
    t0 = time.time()
    mm_rows = E.queries()["corpus_build_mm"](spark, SF_DIR).count()
    corpus_mm = {"sec": round(time.time() - t0, 3), "rows": mm_rows}

    # round-4 session operators, each measured whole at SF_DIR:
    # WARC write->read roundtrip (codegen build + shard shuffle + Arrow
    # scan), boilerplate removal (zero-shuffle codegen), BPE training
    # (12 vocabulary-scale merge rounds), standoff attribute tagging
    # (codegen + explode)
    r4_ops = {}
    for key, qname in (("warc_archive", "warc_roundtrip"),
                       ("main_text", "extract_main_text"),
                       ("bpe_train", "bpe_train"),
                       ("span_attributes", "span_attributes"),
                       # graph analytics added late in round 4: both are
                       # fixed-round iterative join+agg jobs, so the legs
                       # track per-round scheduling + localCheckpoint cost
                       ("link_communities", "link_communities"),
                       ("trustrank", "link_trustrank")):
        t0 = time.time()
        n = E.queries()[qname](spark, SF_DIR).count()
        r4_ops[key] = {"sec": round(time.time() - t0, 3), "rows": n}

    # frontier throughput at current parallelism (north-rule metric);
    # warm at FULL scale then best-of-3. A smaller warm pass is not
    # enough: C2 compilation of the codegen'd canonicalize/anti-join/
    # politeness stages keeps landing through the first full-scale run
    # (measured: 28s -> 2.3s from rep 1 to rep 2 at 8M rows; an eighth-
    # scale warm left the first measured rep 3-5x off steady state —
    # historically masked when the broken-link leg ran the same codegen
    # paths for 2 minutes first, unmasked once that leg went fused)
    frontier_pipeline_sec(spark, FRONTIER_N)
    fsec = min(frontier_pipeline_sec(spark, FRONTIER_N) for _ in range(3))
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
        "ann_lsh": ann,
        "broken_link": broken,
        "cc_cluster": cc,
        "corpus_build": corpus,
        "corpus_build_v2": corpus_v2,
        "corpus_build_mm": corpus_mm,
        "round4_ops": r4_ops,
        "notes": (
            "frontier leg warms at FULL scale before best-of-3 (round-3 "
            "fix); honest steady state is 2.6-3.6M/s at 32 threads, "
            "consistent with the per-core curve. Round 4: scaling's "
            "primary statistic is the median same-execution N/4N pairing "
            "(pooled-min kept as the secondary least-interfered view), "
            "and ann_lsh carries an ivf sub-block for the second ANN "
            "scale path (the interim BENCH_scaling_r4.json reported "
            "lsh_sec inflated by the ivf leg — timing bug, fixed; "
            "BENCH_r03's 1.77s predates ivf and was pure LSH). "
            "See BENCH/BASELINE.md."),
    }

    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "SCALING.json")
    if "--scaling" in args:
        # N=2, 4N=8 cores: stays within the box's 16 physical cores AND low
        # enough that the two legs see comparable per-core memory bandwidth —
        # the closest sandbox analog of separate executor hosts. local[8] vs
        # local[32] crosses into SMT siblings, which caps ANY workload (incl.
        # pure multiprocessing) well below 4x; 4-vs-16 is membw-capped at
        # ~0.79 even for pure codegen. See BENCH/BASELINE.md.
        #
        # PRIMARY statistic: median of SAME-EXECUTION N/4N pairings — both
        # legs of a pairing run back-to-back in one execution window, so a
        # noisy box interval hits both legs of that pairing rather than
        # inflating/deflating the ratio. Secondary: pooled-min per leg
        # across executions — the least-interfered reading of each leg,
        # NOT a conservative bound (a min 2-core anchor lowers the ratio
        # but a min 8-core anchor raises it).
        execs = []
        for _ in range(3):
            l2 = one_leg(2, FRONTIER_N * 2)
            l8 = one_leg(8, FRONTIER_N * 2)
            execs.append({
                "n": l2, "four_n": l8,
                "efficiency": round(
                    (l8["urls_per_sec"] / l2["urls_per_sec"]) / 4.0, 3),
            })
        per_exec = sorted(e["efficiency"] for e in execs)
        median_eff = per_exec[len(per_exec) // 2]
        pooled = {}
        for c, key in ((2, "n"), (8, "four_n")):
            best = min((e[key] for e in execs), key=lambda l: l["sec"])
            pooled[key] = best
        pooled_eff = round((pooled["four_n"]["urls_per_sec"]
                            / pooled["n"]["urls_per_sec"]) / 4.0, 3)
        # full 2/4/8/16 curve for context (4/16 measured once; 2/8 reuse
        # the pooled-min legs); the official N-vs-4N pair stays 2-vs-8
        # for the membw reasons above
        curve_legs = {2: pooled["n"], 8: pooled["four_n"],
                      4: one_leg(4, FRONTIER_N * 2),
                      16: one_leg(16, FRONTIER_N * 2)}
        out["scaling"] = {
            "efficiency": median_eff,
            "statistic": "median same-execution N/4N pairing",
            "per_execution_efficiency": [e["efficiency"] for e in execs],
            "executions": execs,
            "n": pooled["n"], "four_n": pooled["four_n"],
            "pooled_min_efficiency": pooled_eff,
            "pooled_min_note": (
                "secondary view: least-interfered reading per leg, not a "
                "conservative bound"),
            "curve": {str(c): {"sec": curve_legs[c]["sec"],
                               "urls_per_sec": curve_legs[c]["urls_per_sec"]}
                      for c in sorted(curve_legs)},
            "measured": "this run",
            "measured_at_commit": _git_head(),
        }
        try:
            os.makedirs(os.path.dirname(scaling_path), exist_ok=True)
            with open(scaling_path, "w") as f:
                json.dump({**out["scaling"], "measured": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
        except OSError:
            pass
    elif os.path.exists(scaling_path):
        # default (per-round) runs carry the most recent measured N-vs-4N
        # evidence so the scaling number travels with every BENCH_r{N}.json;
        # "measured" stamps when that run happened (rerun: --scaling)
        try:
            with open(scaling_path) as f:
                out["scaling"] = json.load(f)
        except (OSError, ValueError):
            pass

    # Evidence hand-off (round-4 fix): the driver captures only the LAST
    # 2,000 chars of stdout, so the full evidence object (executions, runs
    # arrays, curve, notes) goes to a file and the final printed line is a
    # compact summary guaranteed to fit the tail capture.
    commit = _git_head()
    full_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH")
    try:
        os.makedirs(full_dir, exist_ok=True)
        full_path = os.path.join(full_dir, f"BENCH_full_{commit}.json")
        with open(full_path, "w") as f:
            json.dump({**out, "commit": commit}, f, indent=1)
        with open(os.path.join(full_dir, "BENCH_full_latest.json"), "w") as f:
            json.dump({**out, "commit": commit}, f, indent=1)
    except OSError:
        full_path = None

    sc = out.get("scaling") or {}
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        "frontier_urls": out["frontier_urls"],
        "frontier_sec": out["frontier_sec"],
        "frontier_urls_per_sec": out["frontier_urls_per_sec"],
        "cpus": out["cpus"],
        "lsh_sec": ann["lsh_sec"],
        "lsh_recall_at_5": ann["recall_at_5"],
        "ivf_sec": ann["ivf"]["ivf_sec"],
        "broken_link": {k: broken[k] for k in
                        ("recall", "precision", "sec", "sf")},
        "corpus_build_sec": corpus["sec"],
        "scaling_efficiency": sc.get("efficiency"),
        "scaling_statistic": sc.get("statistic"),
        "scaling_commit": sc.get("measured_at_commit"),
        "commit": commit,
        "full": (os.path.relpath(full_path,
                                 os.path.dirname(os.path.abspath(__file__)))
                 if full_path else None),
    }
    line = json.dumps(compact)
    if len(line) > 1500:  # hard guard: never outgrow the driver tail again
        for k in ("scaling_statistic", "broken_link", "full"):
            compact.pop(k, None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
