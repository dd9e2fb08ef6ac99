#!/usr/bin/env python
"""Physical-plan audit: capture .explain("formatted") for the engine's key
dataflows and grep them for the properties that matter at 100 TB —
PushedFilters / ReadSchema (scan pruning), BroadcastHashJoin vs SortMerge,
WholeStageCodegen coverage, exchange count. Writes PLANS.md.
"""
from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "read_schema_cols": (
            re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1).count(":") + 1
            if re.search(r"ReadSchema: struct<[^>]", plan) else 0
        ),
    }


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from linkinator_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", master="local[8]",
                      shuffle_partitions=16)
    qs = E.queries()
    targets = [
        ("extract_links", "Arrow extraction + explode (E1-E7)"),
        ("frontier_dedup", "URL-seen anti-join (J2)"),
        ("dedup_bloom_exact", "Bloom pre-filter + exact anti-join (J2 fast path)"),
        ("politeness_schedule", "per-host window scheduler (§2.6)"),
        ("host_delay_maxwins", "429 delay max-wins agg (A4/J3)"),
        ("dup_broken_rereport", "duplicate-BROKEN re-report join (J1)"),
        ("dedup_minhash_lsh", "MinHash LSH band self-join"),
        ("ann_cosine_topk", "brute-force cosine top-k"),
        ("text_quality", "single-pass quality features"),
        ("span_flatten", "interleaved span derivation"),
        ("events_windowed", "tumbling-window agg"),
        ("robots_gate", "robots rules broadcast join"),
        ("redirect_resolve",
         "chain resolver (Arrow batch) + landing re-request join (S2)"),
        ("dedup_cc_canonical",
         "near-dup clustering tail (CC components + cluster-size window; "
         "pair generation materialized upstream via localCheckpoint)"),
        ("doc_split", "deterministic hash split (pure codegen, no shuffle)"),
        ("doc_sample_stratified",
         "exact-count stratified sample (hierarchical stratum rank)"),
        ("text_repetition",
         "repetition signals (codegen line stats; bigram mode via "
         "explode + map-side partial combine, doc-scoped keys)"),
        ("text_pii",
         "PII detect/redact (single codegen project, zero shuffles)"),
        ("decontaminate",
         "eval 8-gram broadcast probe (no corpus-sized shuffle)"),
        ("corpus_build",
         "end-to-end corpus assembly (dedup keeper + broadcast "
         "decontamination + codegen gates/split)"),
        ("ann_ivf_topk",
         "IVF ANN (broadcast codebook, map-side-combined argmax "
         "assignment, nprobe candidate join, exact re-rank)"),
        ("link_pagerank",
         "5-iteration power method (uniform-key joins + map-side-combined "
         "contribution aggregate; rank vector localCheckpoint-ed/round)"),
        ("domain_cap",
         "per-domain quota (two-phase stripe top-K; no hot-domain "
         "single-task window)"),
        ("bm25_topk",
         "BM25 retrieval (broadcast query-term prune before any shuffle; "
         "int64 micro-point scores; two-phase per-query top-k)"),
        ("vocab_topk",
         "vocabulary build (map-side-combined term counts; TakeOrdered "
         "cut bounded by v)"),
        ("dedup_substring_clean",
         "duplicate-span removal (uniform gram keys; per-doc bounded "
         "collect_set; codegen array-filter cut)"),
        ("dedup_incremental",
         "incremental dedup (batch buckets hash-join persistable corpus "
         "buckets; candidate-driven Jaccard; corpus never self-paired)"),
        ("lm_score",
         "bigram LM scoring (map-side-combined training counts; "
         "distinct-gram probe joins; uniform doc-id rollup)"),
        ("tfidf_sparse",
         "hashing-trick TF-IDF (map-side-combined tf/df; token-keyed "
         "idf join; no vocabulary object)"),
        ("ppl_bucket",
         "CCNet tercile filter (bounded per-lang histogram window; "
         "broadcast threshold table)"),
        ("doc_mixture",
         "temperature mixture sampling (broadcast quota table; "
         "hierarchical striped rank — hot domain never one task)"),
        ("dedup_semantic",
         "SemDeDup (broadcast codebook -> Arrow-GEMM cell assignment; "
         "ONE list_id shuffle for the within-cell pairwise prune; "
         "cluster size bounds the quadratic term, n_lists controls it)"),
        ("corpus_build_v2",
         "FineWeb-order curation chain (Gopher + C4 gates in ONE codegen "
         "projection — no gate joins; broadcast suffix blocklist; only "
         "corpus-sized shuffles are the keeper's uniform md5 pair; AQE "
         "broadcasts the small blocked-hits side at runtime)"),
        ("kmeans_train",
         "engine-exact Lloyd (per round: broadcast codebook + map-side-"
         "combined argmax, k*dim partial-combined exact integer mean; "
         "plan truncated at the per-round localCheckpoint)"),
        ("span_captions",
         "media-caption pairing (one uniform doc-keyed collect; the "
         "alignment is a codegen array fold, no second shuffle)"),
        ("url_traps",
         "crawl-trap detection (projection + ONE map-side-combined "
         "groupBy on (host, template); hot template keys partial-"
         "aggregate, never shuffle as rows)"),
        ("doc_pack_multimodal",
         "interleaved packing (span-cost rollup on uniform doc keys + "
         "the bucketed pack cumsum; no global sort)"),
        ("line_dedup",
         "corpus line dedup (composite-key distinct keeps hot banner "
         "lines uniform; boilerplate-sized dup set broadcasts as 8-byte "
         "hashes; ONE doc-keyed reassembly shuffle)"),
        ("anchor_agg",
         "anchor-text profiles (Arrow SAX edges; both aggregates "
         "map-side-combined; hot target URL spreads across its distinct "
         "anchors before the struct-max argmax)"),
        ("quality_classifier",
         "hashed linear classifier gate (broadcast model table; ONE "
         "map-side-combined groupBy(doc); integer micro scores, "
         "cross-multiplied threshold — no float division)"),
        ("media_dedup",
         "cross-document media dedup (ONE map-side-combined groupBy on "
         "the uniform ref key; struct-min keeper is an aggregate, not a "
         "per-ref window — no hot-ref single task)"),
        ("frontier_priority",
         "authority-weighted scheduling (PageRank micro-priority; "
         "skew-salted per-host top-K; range-partitioned global emission "
         "rank — no single-task global sort)"),
        ("revisit_schedule",
         "freshness recrawl scheduling (uniform URL-key history fold in "
         "codegen array ops — no lag window; micro-nat change rate x "
         "integer age; same politeness top-K + global rank as "
         "discovery)"),
        ("interleave_gate",
         "interleaved-document gate (ONE map-side-combined groupBy(doc); "
         "ordered codegen CASE verdict; cross-multiplied ratio — no "
         "float division)"),
        ("corpus_build_mm",
         "interleaved corpus chain (gate -> post-gate media dedup on the "
         "uniform ref key -> cleaned re-cost -> bucket-cumsum pack; no "
         "global sort, no driver state)"),
        ("crawl_diff",
         "snapshot diff (ONE full-outer join on the unique uniform URL "
         "key + codegen transition CASE; co-locatable via url bucketing)"),
        ("host_health",
         "host circuit breaker (two map-side-combined host aggregates; "
         "trailing pass re-aggregates FAILED rows only against the "
         "last-success table — AQE skew-join shape, no per-host window)"),
        ("domain_quality",
         "domain blocklist builder (ONE map-side-combined scan; integer "
         "cross-multiplied verdicts — no float mean, no second shuffle)"),
        ("warc_roundtrip",
         "WARC archive write->read (codegen record build; ONE shard-key "
         "shuffle for file assembly; Arrow-batched Content-Length "
         "scanner map stage — no delimiter split)"),
        ("extract_main_text",
         "boilerplate removal (ONE codegen projection: regexp block "
         "split + higher-order-function features; zero shuffles, zero "
         "UDFs)"),
        ("span_attributes",
         "standoff paragraph attributes (codegen projection + one "
         "explode; zero shuffles; output co-partitioned with its "
         "documents)"),
        ("text_normalize",
         "unicode normalization (zero-shuffle codegen regexp chain, "
         "fuses into the scan)"),
        ("url_strip_tracking",
         "tracking-param folding (codegen split + HOF filter; zero "
         "shuffles)"),
        ("jsonl_export",
         "JSONL shard export->ingest (codegen to_json; ONE shard-key "
         "shuffle; Arrow reader map stage)"),
        ("warc_cdx",
         "archive->index composition (shard shuffle + Arrow parse + "
         "per-URL lag window + range-partition rank; no global "
         "single-task sort)"),
        ("corpus_build_v4",
         "extraction-first curation chain (codegen gates end-to-end; "
         "ONE corpus-sized shuffle: the uniform md5 keeper groupBy; "
         "split as expression, not join)"),
        ("revalidate_plan",
         "conditional-request planning (ONE uniform url-key groupBy, "
         "struct-max latest-non-null validators; outcome equi-join)"),
        ("jsonl_export_packed",
         "packing->export composition (doc_pack's bucket-cumsum shard "
         "assignment keys the JSONL writer; pack shuffle + shard "
         "shuffle + Arrow reader)"),
        ("link_spam",
         "link-farm detection (ONE src-keyed groupBy; exact "
         "count-distincts via expand; integer cross-multiplied "
         "thresholds)"),
        ("link_communities",
         "label propagation (per round one node-keyed join + two "
         "map-side-combinable aggregates; struct-min argmax state is "
         "one entry per distinct label, not per edge; label vector "
         "localCheckpoint-ed — plan truncated at the last round)"),
        ("link_trustrank",
         "TrustRank (pagerank's per-iteration shape with a broadcast "
         "seed dim; teleport+dangling mass over seeds; O(1) driver "
         "rows per round)"),
        ("politeness_ip",
         "per-server budget (codegen DNS-hash projection; "
         "hierarchical (ip, host)-stripe rank + group-count offsets — "
         "no single-task hot-IP window)"),
        ("link_opic",
         "OPIC cash distribution (pagerank's per-round skeleton; "
         "plan truncated at the last localCheckpoint)"),
        ("crawl_coverage",
         "coverage estimation (two map-side-combined aggregates + "
         "one-row rollup; no windows, no joins)"),
        ("host_delay_adaptive",
         "AIMD delay (ONE map-side-combined groupBy(host); codegen "
         "higher-order fold over the per-host flag array)"),
        ("robots_wildcards",
         "RFC 9309 wildcard gate (per-rule patterns precomputed on "
         "the broadcast dim; startswith fast path for plain prefixes)"),
        ("text_license",
         "license classification (single codegen contains() chain — "
         "zero regex, zero shuffles)"),
        ("frontier_opic",
         "OPIC-cash scheduling (unrolled cash rounds; skew-salted "
         "per-host top-K; range-partition emission rank)"),
        ("degree_powerlaw",
         "power-law fit (one map-side-combined groupBy + one-row "
         "rollup; codegen log-sum)"),
        ("host_graph_stats",
         "host interlinking report (two host aggregates + one "
         "host-sized full join)"),
        ("host_mirror_groups",
         "mirror-closure canonical election (fp-equi-join pairing -> "
         "host-scale CC -> struct-min keeper AGGREGATE, no "
         "per-component window)"),
        ("doc_pack_bpe",
         "BPE-budgeted packing (Arrow-batched memoized tokenizer UDF; "
         "doc_pack's single uniform bucket-cumsum shuffle)"),
    ]
    lines = [
        "# PLANS — physical-plan audit of the query surface",
        "",
        f"Generated by tools/explain_audit.py at {SF_DIR} "
        "(plan shapes are scale-independent; AQE re-plans sizes at runtime).",
        "",
        "Summary per operator (exchange count = shuffles before AQE "
        "coalescing; broadcast vs sort-merge is the join-strategy check; "
        "codegen spans shows how much of the plan runs in whole-stage "
        "codegen; pushed filters / read-schema confirm parquet scan "
        "pruning):",
        "",
        "| query | exchanges | broadcast joins | sort-merge joins | "
        "codegen spans | pushed filters | scan cols |",
        "|---|---|---|---|---|---|---|",
    ]
    details = []
    for name, desc in targets:
        df = qs[name](spark, SF_DIR)
        plan = plan_of(df)
        s = summarize(plan)
        lines.append(
            f"| {name} | {s['exchanges']} | {s['broadcast_joins']} | "
            f"{s['sortmerge_joins']} | {s['codegen_spans']} | "
            f"{'yes' if s['pushed_filters'] else 'n/a'} | "
            f"{s['read_schema_cols']} |"
        )
        details.append(f"\n## {name} — {desc}\n\n```\n"
                       + "\n".join(plan.splitlines()[:60]) + "\n```\n")
    lines += [
        "",
        "Notes:",
        "- every dimension-sized join (host_delays, robots rules, bloom "
        "verify, frontier stats) plans as BroadcastHashJoin — no shuffle of "
        "the big side on the build-side key;",
        "- parquet scans read only the projected columns (scan cols) and "
        "receive pushed filters where a predicate reaches the source;",
        "- the extraction / shingling stages sit behind round-robin "
        "repartitions so interpreted higher-order transforms and Arrow UDFs "
        "spread across all cores regardless of input file partitioning;",
        "- at this scale every join fits the 64 MB broadcast threshold; at "
        "100 TB the LSH band self-join and the URL-seen anti-join become "
        "SortMergeJoins keyed on uniform hash-distributed keys (band_hash, "
        "url_hash — no skew; AQE skew-split enabled as backstop) while the "
        "dimension joins stay broadcast.",
        "- link_pagerank's summary row reflects only the final projection: "
        "the rank vector is localCheckpoint-ed per iteration (lineage "
        "truncation is the point of an iterative loop), so the audited "
        "plan starts at the last checkpoint. Each iteration's live plan is "
        "one broadcast/SMJ contribution join + one map-side-combined "
        "aggregate — the same shapes audited in dedup_cc_canonical's star "
        "rounds;",
        "- ann_ivf_topk's two SortMergeJoins are the corpus-sized "
        "candidate/re-rank joins keyed on uniform vec ids — exactly the "
        "joins that MUST be SMJ at 100 TB; the codebook and query joins "
        "stay broadcast.",
    ]
    out = "\n".join(lines) + "\n" + "\n".join(details)
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(out)
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
