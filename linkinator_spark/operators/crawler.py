"""LinkChecker — the BFS wave-loop crawl engine.

Re-creates the reference's event-loop crawl (check/crawl,
/root/reference/src/index.ts:215-927) as a bulk-synchronous iterative
DataFrame job. Each wave:

    frontier --politeness/delay gates--> ready
      --fetch join (+405/last-gasp fallbacks, redirect follow)-->
      --429 retry-after + error-backoff requeues-->
      --classify (OK/BROKEN/SKIPPED)--> results ∪=
      --extract (Arrow UDF) --> candidates
      --relationship dedup + URL-seen anti-join--> frontier(w+1)

Distribution of the reference's five shared mutable caches
(src/index.ts:260-265):

  cache (URL-seen Set)      -> `seen` table + left-anti join (J2), optional
                               partitioned Bloom pre-filter at scale
  relationshipCache         -> `relationships` table + anti-join
  pendingChecks (dup wait)  -> `dup_edges` table joined against results at
                               the end; re-emits only BROKEN (J1,
                               src/index.ts:840-875)
  delayCache (per-host 429) -> `host_delays` table, broadcast-joined gate,
                               max-wins merge (J3, src/index.ts:1035-1043)
  retryErrorsCache          -> `retry_errors_n` column carried on the
                               frontier row itself

Time is a per-wave virtual clock (seconds, starting at 0): retry delays set
`not_before`; a wave only takes rows whose `not_before` has passed, and the
clock jumps to the earliest pending deadline when a wave would otherwise be
empty — the distributed equivalent of the reference queue's earliest-wakeup
timer (src/queue.ts:115-145) and of its fake-timer tests.

Scale posture: every shuffle is keyed on `host` (politeness partition = fetch
affinity); hot hosts can be salted for the fetch stage; the seen anti-join is
the only frontier-sized shuffle per wave; all custom logic (extraction,
anchors) runs in Arrow-batched mapInPandas. State is checkpointed per wave
(WaveStore) which both enables resume and truncates iterative lineage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)
from pyspark.sql.window import Window

from linkinator_spark.config import CheckOptions, LinkState
from linkinator_spark.functions.extract import (
    ANCHORS_SCHEMA, CANDIDATE_SCHEMA, make_anchors_udf, make_candidate_links_udf,
)
from linkinator_spark.functions.urls import parse_link, url_host_py
from linkinator_spark.operators import fetch as fetchmod
from linkinator_spark.operators.classify import classify
from linkinator_spark.operators.fetch import (
    FETCH_COLS, fetch_once, prepare_pages_dim, with_body_flag,
)
from linkinator_spark.operators.skiprules import (
    make_fragment_skip_match, make_skip_match,
)
from linkinator_spark.sources.tableio import WaveStore

RESULT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("status", IntegerType()),
    StructField("state", StringType()),
    StructField("parent", StringType()),
    StructField("failure_details", ArrayType(StringType())),
    StructField("wave", IntegerType()),
    StructField("host", StringType()),
    StructField("seq", LongType()),
])

FRONTIER_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("host", StringType()),
    StructField("parent", StringType()),
    StructField("crawl", BooleanType()),
    StructField("root_path", StringType()),
    StructField("attempt", IntegerType()),
    StructField("retry_errors_n", IntegerType()),
    StructField("not_before", DoubleType()),
    StructField("wave", IntegerType()),
    StructField("seq", LongType()),
])

EVENT_SCHEMA = "kind string, url string, status int, detail string, wave int"

_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]
_EPS = 1e-9
_HTML_RE = "text/html|application/xhtml\\+xml"
_CSS_RE = "text/css"


@dataclass
class CrawlResult:
    passed: bool
    results: DataFrame     # the LinkResult fact table
    events: DataFrame      # retry/redirect/statusCodeWarning/httpInsecure
    waves: int
    clock: float


def retry_after_seconds(col, clock: float):
    """parseRetryAfter (src/index.ts:993-1009): plain seconds | HTTP-date |
    '30s'/'1m30s'. Returns the absolute virtual deadline (seconds) or null.
    HTTP-dates are interpreted on the virtual epoch (1970-01-01 = t0)."""
    num = F.when(col.rlike(r"^\d+(\.\d+)?$"), col.cast("double") + F.lit(clock))
    dur = F.when(
        col.rlike(r"^(\d+m)?\d+s$"),
        F.coalesce(F.regexp_extract(col, r"^(\d+)m", 1).cast("double"), F.lit(0.0)) * 60
        + F.regexp_extract(col, r"(\d+)s$", 1).cast("double")
        + F.lit(clock),
    )
    date = F.to_timestamp(col, "EEE, dd MMM yyyy HH:mm:ss zzz").cast("double")
    return F.coalesce(num, dur, date)


class LinkChecker:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ------------------------------------------------------------------ API
    def check(
        self,
        cfg: CheckOptions,
        pages: DataFrame,
        documents: DataFrame,
        resume: bool = False,
    ) -> CrawlResult:
        spark = self.spark
        store = WaveStore(cfg.checkpoint_dir) if cfg.checkpoint_dir else None

        pages_dim = prepare_pages_dim(pages)
        docs = documents.select(
            F.col("doc_id").alias("body_doc_id"), F.col("spans")
        )
        skip_match = make_skip_match(cfg.links_to_skip)
        frag_skip_match = make_fragment_skip_match(cfg.fragments_to_skip)
        candidates_udf = make_candidate_links_udf(cfg.check_css, cfg.markdown)
        anchors_udf = make_anchors_udf(cfg.markdown)

        empty = lambda schema: spark.createDataFrame([], schema)  # noqa: E731

        if resume and store and store.latest_wave() is not None:
            manifest, state = store.load(spark, store.latest_wave())
            clock = float(manifest["clock"])
            wave = int(manifest["wave"]) + 1
            frontier = state["frontier"]
            seen = state["seen"]
            results = state["results"]
            relationships = state["relationships"]
            dup_edges = state["dup_edges"]
            pending_fragments = state["pending_fragments"]
            host_delays = state["host_delays"]
            events = state["events"]
        else:
            seeds = self._seed_frontier(cfg)
            frontier = spark.createDataFrame(seeds, FRONTIER_SCHEMA)
            seen = frontier.select("url").distinct()
            results = empty(RESULT_SCHEMA)
            relationships = empty("child_url string, parent_url string")
            dup_edges = empty("url string, parent string")
            pending_fragments = empty("target_url string, fragment string")
            host_delays = empty("host string, not_before double")
            events = empty(EVENT_SCHEMA)
            clock = 0.0
            wave = 0

        while wave < cfg.max_waves:
            if frontier.isEmpty():
                break
            # ---- virtual-clock advance (earliest-wakeup, queue.ts:115-145)
            ready_cond = F.col("not_before") <= F.lit(clock + _EPS)
            if frontier.filter(ready_cond).isEmpty():
                clock = frontier.agg(F.min("not_before")).collect()[0][0]
                ready_cond = F.col("not_before") <= F.lit(clock + _EPS)

            ready = frontier.filter(ready_cond)
            deferred = frontier.filter(~ready_cond)

            # ---- per-host politeness budget (window = the min-heap order)
            if cfg.per_host_budget:
                w = Window.partitionBy("host").orderBy("not_before", "seq")
                ranked = ready.withColumn("_rk", F.row_number().over(w))
                deferred = deferred.unionByName(
                    ranked.filter(F.col("_rk") > cfg.per_host_budget).drop("_rk")
                )
                ready = ranked.filter(F.col("_rk") <= cfg.per_host_budget).drop("_rk")

            (wave_results, wave_events, requeued, new_frontier,
             new_seen, new_rel, new_dups, pending_fragments, host_delays) = self._run_wave(
                ready, pages_dim, docs, cfg, clock, wave,
                skip_match, frag_skip_match, candidates_udf, anchors_udf,
                seen, relationships, pending_fragments, host_delays,
            )

            results = results.unionByName(wave_results)
            events = events.unionByName(wave_events)
            relationships = relationships.unionByName(new_rel)
            dup_edges = dup_edges.unionByName(new_dups)
            seen = seen.unionByName(new_seen)
            frontier = deferred.select(_FRONTIER_COLS).unionByName(
                requeued.select(_FRONTIER_COLS)
            ).unionByName(new_frontier.select(_FRONTIER_COLS))

            state = {
                "frontier": frontier, "seen": seen, "results": results,
                "relationships": relationships, "dup_edges": dup_edges,
                "pending_fragments": pending_fragments,
                "host_delays": host_delays, "events": events,
            }
            if store:
                metrics = {
                    "wave": wave,
                    "fetched_hosts": {
                        r["host"]: r["n"]
                        for r in wave_results.groupBy("host").agg(
                            F.count("*").alias("n")
                        ).collect()
                    },
                }
                state = store.commit(wave, clock, state, metrics)
            else:
                # truncate iterative lineage even without durable checkpoints
                state = {k: v.localCheckpoint(eager=True) for k, v in state.items()}
            (frontier, seen, results, relationships, dup_edges,
             pending_fragments, host_delays, events) = (
                state["frontier"], state["seen"], state["results"],
                state["relationships"], state["dup_edges"],
                state["pending_fragments"], state["host_delays"], state["events"],
            )
            wave += 1

        # ---- duplicate-link BROKEN re-report (J1, src/index.ts:840-875)
        broken = results.filter(
            (F.col("state") == LinkState.BROKEN) & ~F.col("url").contains("#")
        ).select("url", "status", "state", "failure_details")
        dup_broken = (
            dup_edges.join(broken, "url", "inner")
            .select(
                "url", "status", "state",
                F.col("parent"), "failure_details",
                F.lit(wave).alias("wave"),
                F.lit("").alias("host"),
                F.lit(0).cast("long").alias("seq"),
            )
        )
        results = results.unionByName(dup_broken)

        passed = results.filter(F.col("state") == LinkState.BROKEN).isEmpty()
        return CrawlResult(passed=passed, results=results, events=events,
                           waves=wave, clock=clock)

    # ---------------------------------------------------------------- seeds
    def _seed_frontier(self, cfg: CheckOptions) -> list:
        rows = []
        seen_urls = set()
        for i, path in enumerate(cfg.paths):
            parsed = parse_link(path, None)
            url = parsed["resolved_url"] or path
            if url in seen_urls:
                continue
            seen_urls.add(url)
            rows.append((
                url, url_host_py(url), None, True, url,
                1, 0, 0.0, 0, int(i + 1),
            ))
        return rows

    # ----------------------------------------------------------------- wave
    def _run_wave(
        self, ready, pages_dim, docs, cfg: CheckOptions, clock: float, wave: int,
        skip_match, frag_skip_match, candidates_udf, anchors_udf,
        seen, relationships, pending_fragments, host_delays,
    ):
        spark = self.spark
        empty_results = spark.createDataFrame([], RESULT_SCHEMA)
        empty_events = spark.createDataFrame([], EVENT_SCHEMA)
        empty_frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
        results_parts = [empty_results]
        events_parts = [empty_events]
        requeue_parts = [empty_frontier]

        # ---- URL rewrite (src/index.ts:310-318)
        for pattern, replacement in cfg.url_rewrite:
            ready = ready.withColumn(
                "url", F.regexp_replace("url", pattern, replacement)
            )
        if cfg.url_rewrite:
            from linkinator_spark.functions.urls import url_host
            ready = ready.withColumn("host", url_host(F.col("url")))

        # ---- pre-fetch skip (src/index.ts:320-323,973-985)
        non_http = ~F.col("url").rlike("^https?://")
        skip_cond = non_http
        if skip_match is not None:
            skip_cond = skip_cond | skip_match(F.col("url"))
        skipped = ready.filter(skip_cond)
        results_parts.append(
            skipped.select(
                "url",
                F.when(non_http, F.lit(0)).otherwise(F.lit(None)).cast("int").alias("status"),
                F.lit(LinkState.SKIPPED).alias("state"),
                "parent",
                F.array().cast("array<string>").alias("failure_details"),
                F.lit(wave).alias("wave"), "host", "seq",
            )
        )
        ready = ready.filter(~skip_cond)

        # ---- per-host delay gate (J3, src/index.ts:325-342)
        if not host_delays.isEmpty():
            gated = ready.join(F.broadcast(host_delays.withColumnRenamed(
                "not_before", "_host_nb")), "host", "left")
            blocked = gated.filter(F.col("_host_nb") > clock + _EPS)
            requeue_parts.append(
                blocked.withColumn("not_before", F.col("_host_nb"))
                .select(_FRONTIER_COLS)
            )
            ready = gated.filter(
                F.col("_host_nb").isNull() | (F.col("_host_nb") <= clock + _EPS)
            ).drop("_host_nb")

        # ---- fetch: HEAD for leaves, GET when crawling (src/index.ts:344-369)
        method = F.when(F.col("crawl"), F.lit("GET")).otherwise(F.lit("HEAD"))
        cur = fetch_once(ready, pages_dim, method, cfg, skip_match)

        # 405 -> retry as GET (src/index.ts:378-388)
        c405 = (F.col("status") == 405) & F.col("redirect_skipped").isNull()
        fb = cur.filter(c405)
        if not fb.isEmpty():
            fb_re = fetch_once(
                fb.withColumn("_prev_failures", F.col("fetch_failures"))
                .drop(*FETCH_COLS),
                pages_dim, F.lit("GET"), cfg, skip_match,
            )
            fb_re = fb_re.withColumn(
                "fetch_failures",
                F.concat(F.col("_prev_failures"), F.col("fetch_failures")),
            ).drop("_prev_failures")
            cur = cur.filter(~c405).unionByName(fb_re)

        # last-gasp GET for non-2xx leaf checks (src/index.ts:396-417)
        lg_cond = (
            (~F.col("has_response") | (F.col("status") < 200) | (F.col("status") >= 300))
            & ~F.col("crawl")
            & F.col("redirect_skipped").isNull()
        )
        lg = cur.filter(lg_cond)
        if not lg.isEmpty():
            lg_re = fetch_once(
                lg.withColumn("_prev_failures", F.col("fetch_failures"))
                .drop(*FETCH_COLS),
                pages_dim, F.lit("GET"), cfg, skip_match,
            )
            lg_re = lg_re.withColumn(
                "fetch_failures",
                F.concat(F.col("_prev_failures"), F.col("fetch_failures")),
            ).drop("_prev_failures")
            cur = cur.filter(~lg_cond).unionByName(lg_re)

        # ---- redirect-skipped -> SKIPPED (src/index.ts:370-373)
        rs = cur.filter(F.col("redirect_skipped").isNotNull())
        results_parts.append(
            rs.select(
                "url", F.lit(None).cast("int").alias("status"),
                F.lit(LinkState.SKIPPED).alias("state"), "parent",
                F.array().cast("array<string>").alias("failure_details"),
                F.lit(wave).alias("wave"), "host", "seq",
            )
        )
        cur = cur.filter(F.col("redirect_skipped").isNull())

        # ---- 429 + retry-after -> host delay + requeue (src/index.ts:1019-1060)
        if cfg.retry:
            deadline = retry_after_seconds(F.col("retry_after"), clock)
            r429 = cur.filter(
                (F.col("status") == 429) & F.col("retry_after").isNotNull()
            ).withColumn("_deadline", deadline).filter(F.col("_deadline").isNotNull())
            r429 = r429.persist()
            if not r429.isEmpty():
                # max-wins per host (src/index.ts:1035-1043)
                new_delays = r429.groupBy("host").agg(
                    F.max("_deadline").alias("not_before")
                )
                host_delays = (
                    host_delays.unionByName(new_delays)
                    .groupBy("host").agg(F.max("not_before").alias("not_before"))
                )
                requeue_parts.append(
                    r429.withColumn("not_before", F.col("_deadline"))
                    .withColumn("attempt", F.col("attempt") + 1)
                    .select(_FRONTIER_COLS)
                )
                events_parts.append(
                    r429.select(
                        F.lit("retry").alias("kind"), "url", "status",
                        F.round(F.col("_deadline") - clock).cast("string").alias("detail"),
                        F.lit(wave).alias("wave"),
                    )
                )
                cur = cur.join(r429.select("url"), "url", "left_anti")
            r429.unpersist()

        # ---- content sniff
        cur = with_body_flag(cur).withColumn(
            "_is_html", F.col("content_type").rlike(_HTML_RE)
        ).withColumn("_is_css", F.col("content_type").rlike(_CSS_RE))

        # ---- fragment-target body re-GET for HEAD-fetched pages
        # (src/index.ts:450-473): a leaf page with pending fragments needs its
        # body to validate them.
        if cfg.check_fragments and not pending_fragments.isEmpty():
            frag_targets = pending_fragments.select(
                F.col("target_url").alias("url")
            ).distinct()
            need_body = (
                cur.join(F.broadcast(frag_targets), "url", "semi")
                .filter(F.col("_is_html") & ~F.col("has_body") & F.col("has_response"))
            )
            if not need_body.isEmpty():
                re_got = fetch_once(
                    need_body.withColumn("_prev_failures", F.col("fetch_failures"))
                    .drop(*FETCH_COLS, "_is_html", "_is_css", "has_body"),
                    pages_dim, F.lit("GET"), cfg, skip_match,
                )
                re_got = (
                    with_body_flag(
                        re_got.withColumn(
                            "fetch_failures",
                            F.concat(F.col("_prev_failures"), F.col("fetch_failures")),
                        ).drop("_prev_failures")
                    )
                    .withColumn("_is_html", F.col("content_type").rlike(_HTML_RE))
                    .withColumn("_is_css", F.col("content_type").rlike(_CSS_RE))
                    .filter(F.col("redirect_skipped").isNull())
                )
                cur = cur.join(need_body.select("url"), "url", "left_anti").unionByName(
                    re_got.select(*cur.columns)
                )

        # ---- error retry with exponential backoff (src/index.ts:1069-1109)
        if cfg.retry_errors:
            err_cond = (
                ((F.col("status") == 0) | (F.col("status") >= 500) | (F.col("status") == 429))
                & (F.col("retry_errors_n") < cfg.retry_errors_count)
            )
            err = cur.filter(err_cond).persist()
            if not err.isEmpty():
                n1 = F.col("retry_errors_n") + 1
                jitter_s = (
                    F.pmod(F.xxhash64(F.col("url"), n1, F.lit(cfg.seed)), F.lit(10000))
                    / 10000.0 * cfg.retry_errors_jitter / 1000.0
                )
                backoff = F.pow(F.lit(2.0), n1.cast("double")) + jitter_s
                requeued = (
                    err.withColumn("not_before", F.lit(clock) + backoff)
                    .withColumn("retry_errors_n", n1)
                    .withColumn("attempt", F.col("attempt") + 1)
                )
                requeue_parts.append(requeued.select(_FRONTIER_COLS))
                events_parts.append(
                    err.select(
                        F.lit("retry").alias("kind"), "url", "status",
                        F.round(backoff).cast("string").alias("detail"),
                        F.lit(wave).alias("wave"),
                    )
                )
                cur = cur.filter(~err_cond)
            err.unpersist()

        # ---- classification (src/index.ts:482-604)
        classified = classify(cur, cfg).persist()

        results_parts.append(
            classified.select(
                "url", F.col("status").cast("int"), "state", "parent",
                "failure_details", F.lit(wave).alias("wave"), "host", "seq",
            )
        )
        for kind, flag in (
            ("statusCodeWarning", "event_status_warn"),
            ("redirect", "event_redirect"),
            ("httpInsecure", "event_http_insecure"),
        ):
            events_parts.append(
                classified.filter(F.col(flag)).select(
                    F.lit(kind).alias("kind"), "url", "status",
                    F.coalesce(F.col("final_url"), F.col("location")).alias("detail"),
                    F.lit(wave).alias("wave"),
                )
            )

        # ---- extraction (E1-E11) for recursing pages
        should_recurse = F.col("_is_html") | (F.col("_is_css") & F.lit(cfg.check_css))
        ext_pages = classified.filter(
            F.col("crawl") & should_recurse & F.col("has_body")
        ).select(
            F.col("url").alias("page_url"),
            F.coalesce(F.col("final_url"), F.col("url")).alias("base_url"),
            F.when(F.col("_is_css"), F.lit("css")).otherwise(F.lit("html")).alias("content_kind"),
            "body_doc_id", "root_path", "host",
            F.col("seq").alias("parent_seq"),
        )
        candidates = (
            ext_pages.join(docs, "body_doc_id", "left")
            .select("page_url", "base_url", "content_kind", "spans")
            .mapInPandas(candidates_udf, CANDIDATE_SCHEMA)
            .join(
                ext_pages.select("page_url", "root_path", "parent_seq"),
                "page_url",
            )
        )

        (cand_results, cand_events, new_frontier, new_seen, new_rel,
         new_dups, new_pending) = self._process_candidates(
            candidates, cfg, clock, wave, skip_match, frag_skip_match,
            seen, relationships,
        )
        results_parts.append(cand_results)
        events_parts.append(cand_events)

        # ---- fragment validation (src/index.ts:616-673,878-920 + E9/E10)
        pending_all = pending_fragments.unionByName(new_pending)
        if cfg.check_fragments and not pending_all.isEmpty():
            frag_results, pending_all = self._validate_fragments(
                classified, docs, pending_all, anchors_udf, wave
            )
            results_parts.append(frag_results)

        wave_results = results_parts[0]
        for p in results_parts[1:]:
            wave_results = wave_results.unionByName(p)
        wave_events = events_parts[0]
        for p in events_parts[1:]:
            wave_events = wave_events.unionByName(p)
        requeued = requeue_parts[0]
        for p in requeue_parts[1:]:
            requeued = requeued.unionByName(p)

        return (wave_results, wave_events, requeued, new_frontier,
                new_seen, new_rel, new_dups, pending_all, host_delays)

    # ---------------------------------------------------- candidate pipeline
    def _process_candidates(
        self, candidates, cfg: CheckOptions, clock: float, wave: int,
        skip_match, frag_skip_match, seen, relationships,
    ):
        spark = self.spark
        empty_results = spark.createDataFrame([], RESULT_SCHEMA)
        empty_events = spark.createDataFrame([], EVENT_SCHEMA)
        results_parts = [empty_results]

        candidates = candidates.persist()

        # malformed hrefs -> BROKEN status 0 (src/index.ts:720-730)
        malformed = candidates.filter(F.col("parse_error").isNotNull())
        results_parts.append(
            malformed.select(
                F.col("raw_link").alias("url"), F.lit(0).alias("status"),
                F.lit(LinkState.BROKEN).alias("state"),
                F.col("page_url").alias("parent"),
                F.array(F.col("parse_error")).alias("failure_details"),
                F.lit(wave).alias("wave"),
                F.lit("").alias("host"), F.col("parent_seq").alias("seq"),
            )
        )
        cand = candidates.filter(F.col("parse_error").isNull())

        # skip rules see the fragment-bearing URL (src/index.ts:732-752)
        if skip_match is not None:
            sk_cond = F.col("url_with_fragment").rlike("^https?://") & skip_match(
                F.col("url_with_fragment")
            )
            sk = cand.filter(sk_cond)
            results_parts.append(
                sk.select(
                    F.col("url_with_fragment").alias("url"),
                    F.lit(None).cast("int").alias("status"),
                    F.lit(LinkState.SKIPPED).alias("state"),
                    F.col("page_url").alias("parent"),
                    F.array().cast("array<string>").alias("failure_details"),
                    F.lit(wave).alias("wave"),
                    F.lit("").alias("host"), F.col("parent_seq").alias("seq"),
                )
            )
            cand = cand.filter(~sk_cond)

        # fragment bookkeeping (src/index.ts:754-784)
        new_pending = spark.createDataFrame([], "target_url string, fragment string")
        if cfg.check_fragments:
            has_frag = F.col("fragment").isNotNull() & (F.length("fragment") > 0)
            frag_rows = cand.filter(has_frag)
            if frag_skip_match is not None:
                fsk_cond = frag_skip_match(F.col("fragment"), F.col("url_with_fragment"))
                fsk = frag_rows.filter(fsk_cond)
                results_parts.append(
                    fsk.select(
                        F.col("url_with_fragment").alias("url"),
                        F.lit(None).cast("int").alias("status"),
                        F.lit(LinkState.SKIPPED).alias("state"),
                        F.col("page_url").alias("parent"),
                        F.array().cast("array<string>").alias("failure_details"),
                        F.lit(wave).alias("wave"),
                        F.lit("").alias("host"), F.col("parent_seq").alias("seq"),
                    )
                )
                frag_rows = frag_rows.filter(~fsk_cond)
            new_pending = frag_rows.select(
                F.col("resolved_url").alias("target_url"), "fragment"
            ).distinct()

        # recurse predicate (src/index.ts:786-798)
        from linkinator_spark.functions.urls import url_host

        root_host = url_host(F.col("root_path"))
        child_host = url_host(F.col("resolved_url"))
        crawl_flag = (
            F.lit(bool(cfg.recurse))
            & F.col("resolved_url").startswith(F.col("root_path"))
            & (child_host == root_host)
        )
        cand = cand.withColumn("_crawl", crawl_flag).withColumn("_child_host", child_host)

        # relationship dedup (src/index.ts:800-810): first occurrence per
        # (child, parent) edge, across the whole crawl
        w_edge = Window.partitionBy("resolved_url", "page_url").orderBy(
            "parent_seq", "ordinal"
        )
        edges = (
            cand.withColumn("_rn", F.row_number().over(w_edge))
            .filter(F.col("_rn") == 1).drop("_rn")
            .join(
                relationships,
                (F.col("resolved_url") == relationships["child_url"])
                & (F.col("page_url") == relationships["parent_url"]),
                "left_anti",
            )
        ).persist()
        new_rel = edges.select(
            F.col("resolved_url").alias("child_url"),
            F.col("page_url").alias("parent_url"),
        )

        # URL-seen: first edge per URL enqueues; the rest (and anything
        # already seen) become duplicate edges (J2/J4, src/index.ts:812-875)
        w_url = Window.partitionBy("resolved_url").orderBy("parent_seq", "ordinal")
        firsts = edges.withColumn("_rn", F.row_number().over(w_url))
        primary = firsts.filter(F.col("_rn") == 1).drop("_rn")
        extra_dups = firsts.filter(F.col("_rn") > 1).select(
            F.col("resolved_url").alias("url"), F.col("page_url").alias("parent")
        )

        enqueue = primary.join(
            seen, primary["resolved_url"] == seen["url"], "left_anti"
        )
        seen_dups = primary.join(
            seen, primary["resolved_url"] == seen["url"], "semi"
        ).select(F.col("resolved_url").alias("url"), F.col("page_url").alias("parent"))
        new_dups = extra_dups.unionByName(seen_dups)

        # politeness ordering: per-host FIFO sequence for the next wave
        # (SURVEY §2.6 — row_number over host partition)
        w_host = Window.partitionBy("_child_host").orderBy("parent_seq", "ordinal")
        new_frontier = enqueue.select(
            F.col("resolved_url").alias("url"),
            F.col("_child_host").alias("host"),
            F.col("page_url").alias("parent"),
            F.col("_crawl").alias("crawl"),
            F.col("root_path").alias("root_path"),
            F.lit(1).alias("attempt"),
            F.lit(0).alias("retry_errors_n"),
            F.lit(float(clock)).alias("not_before"),
            F.lit(wave + 1).alias("wave"),
            (
                F.lit((wave + 1) * 1_000_000_000)
                + F.row_number().over(
                    Window.partitionBy(F.col("_child_host")).orderBy(
                        "parent_seq", "ordinal"
                    )
                )
            ).cast("long").alias("seq"),
        )
        new_seen = new_frontier.select("url").distinct()

        out_results = results_parts[0]
        for p in results_parts[1:]:
            out_results = out_results.unionByName(p)
        return (out_results, empty_events, new_frontier, new_seen, new_rel,
                new_dups, new_pending)

    # ------------------------------------------------------------ fragments
    def _validate_fragments(self, classified, docs, pending_all, anchors_udf, wave: int):
        """E9/E10: anchors per fetched OK html page; missing fragments ->
        BROKEN with the reference's exact message (src/index.ts:657-660);
        soft-404 pages skip validation (src/index.ts:632-635)."""
        targets = classified.filter(
            F.col("has_body") & F.col("_is_html") & (F.col("state") == LinkState.OK)
        ).select(
            F.col("url").alias("page_url"), "body_doc_id", "status", "parent",
            "host", "seq",
        ).join(
            F.broadcast(pending_all.select(F.col("target_url").alias("page_url")).distinct()),
            "page_url", "semi",
        )
        anchors = (
            targets.join(docs, "body_doc_id", "left")
            .select("page_url", "spans")
            .mapInPandas(anchors_udf, ANCHORS_SCHEMA)
        )
        joined = (
            pending_all.join(
                targets.select("page_url", "status", "parent", "host", "seq"),
                pending_all["target_url"] == targets["page_url"],
                "inner",
            )
            .join(anchors, "page_url")
            .withColumn(
                "_soft404",
                F.col("body_text").contains('content="noindex')
                & F.col("body_text").contains("nofollow"),
            )
            .persist()
        )
        missing = joined.filter(
            ~F.col("_soft404") & ~F.array_contains(F.col("anchors"), F.col("fragment"))
        )
        frag_results = missing.select(
            F.concat(F.col("target_url"), F.lit("#"), F.col("fragment")).alias("url"),
            F.col("status").cast("int"),
            F.lit(LinkState.BROKEN).alias("state"),
            "parent",
            F.array(
                F.concat(
                    F.lit("Error: Fragment identifier '#"),
                    F.col("fragment"),
                    F.lit("' not found on page"),
                )
            ).alias("failure_details"),
            F.lit(wave).alias("wave"), "host", "seq",
        )
        # everything joined to a fetched page is now resolved (validated or
        # reported); the rest stays pending
        remaining = pending_all.join(
            joined.select("target_url").distinct(), "target_url", "left_anti"
        )
        return frag_results, remaining


def check(spark: SparkSession, cfg: CheckOptions, pages: DataFrame,
          documents: DataFrame, resume: bool = False) -> CrawlResult:
    """Convenience wrapper (reference export `check`, src/index.ts:1116-1120)."""
    return LinkChecker(spark).check(cfg, pages, documents, resume=resume)
