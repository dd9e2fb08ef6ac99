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

Scale/efficiency posture:
* one driver aggregate gates the whole wave (frontier stats) and one more
  gates the fallback paths — no per-branch isEmpty() round-trips;
* per-wave outputs are localCheckpoint'ed individually (small) and the
  cumulative state is a union of checkpointed parts, so iterative lineage
  stays O(waves) and nothing cumulative is re-materialized each wave;
* every shuffle is keyed on `host` (politeness partition = fetch affinity);
* all custom logic (extraction, anchors) is Arrow-batched mapInPandas;
* with a checkpoint_dir, WaveStore commits give durable resume instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)
from pyspark.sql.window import Window

from linkinator_spark.config import (CheckOptions, LinkState,
                                     SEQ_WAVE_STRIDE)
from linkinator_spark.functions.extract import (
    ANCHORS_SCHEMA, CANDIDATE_SCHEMA, make_anchors_udf, make_candidate_links_udf,
)
from linkinator_spark.functions.urls import parse_link, url_host, url_host_py
from linkinator_spark.operators.classify import classify
from linkinator_spark.operators.fetch import (
    FETCH_COLS, build_chain_map, fetch_once, fetch_wave_fused,
    prepare_pages_dim, with_body_flag,
)
from linkinator_spark.operators.bloom import (
    BloomFilter, bloom_prefilter, broadcast_bloom, build_bloom,
)
from linkinator_spark.operators.cuckoo import (
    CuckooFilter, broadcast_cuckoo, build_cuckoo, cuckoo_prefilter,
)
from linkinator_spark.operators.politeness import politeness_budget_split
from linkinator_spark.plans.treefold import tree_fold
from linkinator_spark.operators.skiprules import (
    make_fragment_skip_match, make_skip_match,
)
from linkinator_spark.sources.tableio import make_wave_store

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
REL_SCHEMA = "child_url string, parent_url string"
DUP_SCHEMA = "url string, parent string"
PENDING_SCHEMA = "target_url string, fragment string"
DELAY_SCHEMA = "host string, not_before double"

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
    # persisted frames backing results/events (per-wave leaf caches + the
    # final results cache). SQL-cache entries are NOT garbage-collected by
    # Spark's ContextCleaner — they live until unpersist or session end —
    # so a long-lived application running many crawls must release each
    # crawl's caches when done reading the result (measured: a ~500-crawl
    # session pinned ~15 GB of driver heap and full-GC-thrashed without
    # this). Safe to call after collecting; the frames stay usable
    # afterwards (lazy recompute roots at the wave checkpoints).
    cached: list = field(default_factory=list)

    def release(self) -> None:
        """Unpersist every cache this crawl created."""
        for df in self.cached:
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass
        self.cached = []


def retry_after_seconds(col, clock: float):
    """parseRetryAfter (src/index.ts:993-1009): plain seconds | HTTP-date |
    '30s'/'1m30s'. Returns the absolute virtual deadline (seconds) or null.
    HTTP-dates are interpreted on the virtual epoch (1970-01-01 = t0)."""
    num = F.when(col.rlike(r"^\d+(\.\d+)?$"), col.cast("double") + F.lit(clock))
    minutes = F.when(
        col.rlike(r"^\d+m"), F.regexp_extract(col, r"^(\d+)m", 1).cast("double")
    ).otherwise(F.lit(0.0))
    dur = F.when(
        col.rlike(r"^(\d+m)?\d+s$"),
        minutes * 60 + F.regexp_extract(col, r"(\d+)s$", 1).cast("double") + F.lit(clock),
    )
    # HTTP-date ("Thu, 01 Jan 1970 00:00:09 GMT"): Spark's formatter rejects
    # EEE-day patterns, so strip the weekday and parse the GMT remainder
    date = F.try_to_timestamp(
        F.regexp_extract(col, r"^[A-Za-z]{3}, (.+) GMT$", 1),
        F.lit("dd MMM yyyy HH:mm:ss"),
    ).cast("double")
    return F.coalesce(num, dur, date)


class LinkChecker:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _union(self, parts: list, schema) -> DataFrame:
        if not parts:
            return self._empty(schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------------ API
    def check(
        self,
        cfg: CheckOptions,
        pages: DataFrame,
        documents: DataFrame,
        resume: bool = False,
    ) -> CrawlResult:
        spark = self.spark
        store = make_wave_store(spark, cfg)

        live = pages is None
        if live:
            from linkinator_spark.operators.http_fetch import make_live_requester

            requester = make_live_requester(cfg)
        ctx = {
            # both dims are re-broadcast by every wave's plan; the eager
            # checkpoint makes each broadcast job a cached-partition scan
            # instead of a recompute from source — matters when the scripted
            # table is a real parquet scan, not a 3-row fixture. They are
            # ONLY used by the staged wave loop, so materialization is
            # deferred until the fully-fused attempt has NOT short-
            # circuited the crawl (two wasted checkpoint jobs otherwise).
            "pages_dim": None,
            # live mode: page bodies arrive as _live_spans on the fetch rows
            # and each wave derives its own docs dim (_run_wave)
            "docs": None,
            "requester": requester if live else None,
            # table mode: redirect chains resolve against this broadcast map
            # in ONE batch per wave (no per-hop driver barriers). The map is
            # built executor-side (tree_fold of per-partition dict
            # fragments — no driver row materialization), but the merged
            # dict still lives on the driver to broadcast, so it's gated on
            # chain_map_max_rows and falls back to the iterative hop loop
            "chain_bc": None if live or (
                pages.limit(cfg.chain_map_max_rows + 1).count()
                > cfg.chain_map_max_rows
            ) else spark.sparkContext.broadcast(build_chain_map(pages)),
            "skip_match": make_skip_match(cfg.links_to_skip),
            "frag_skip_match": make_fragment_skip_match(cfg.fragments_to_skip),
            "candidates_udf": make_candidate_links_udf(cfg.check_css, cfg.markdown),
            "anchors_udf": make_anchors_udf(cfg.markdown),
            "host_rules": None,
            # modeled static server: default any unscripted URL on its host
            # to 404 (local-path mode, sources/localfs.py)
            "host_defaults": _host_defaults(spark, cfg),
            # URL-seen Bloom pre-filter: built lazily once the frontier
            # crosses cfg.bloom_min_frontier, then maintained incrementally
            # by the per-wave touch job (no extra barriers)
            "bloom": None,
            "bloom_bc": None,
        }
        if cfg.respect_robots and not live:
            # robots.txt fetched once per host up front (the wave-0 robots
            # fetch, north_star politeness) and broadcast as a rules dim
            from linkinator_spark.operators.robots import host_rules_from_pages

            ctx["host_rules"] = host_rules_from_pages(
                pages, documents, cfg.user_agent
            ).localCheckpoint(eager=True)
        elif cfg.respect_robots and live:
            # live mode: the rules dim starts empty and grows per wave —
            # each wave fetches /robots.txt over the network for hosts it
            # is meeting for the first time (incremental step in the wave
            # loop below). Missing robots parse to empty rules, so the
            # host is recorded and never refetched.
            from linkinator_spark.operators.robots import RULES_SCHEMA

            ctx["host_rules"] = self._empty(RULES_SCHEMA)
            ctx["host_rules_parts"] = [ctx["host_rules"]]
            ctx["live_robots"] = True

        # fusion capability (operators/wave_fused.py): scripted tables
        # small enough to broadcast, no robots dim, no URL rewrite.
        from linkinator_spark.operators.wave_fused import (
            build_docs_map, docs_bytes_ok,
        )

        fused_maps_ok = bool(
            ctx["chain_bc"] is not None
            and not cfg.url_rewrite
            and documents is not None
            and documents.limit(cfg.chain_map_max_rows + 1).count()
            <= cfg.chain_map_max_rows
            and docs_bytes_ok(documents, cfg.fused_docs_max_bytes)
        )
        # per-wave Arrow fusion inside the STAGED loop additionally
        # excludes robots and the retry/delay + fragment families — their
        # cross-wave state (rules dim, virtual clock, host delays, pending
        # fragments) lives in the staged machinery. The FULLY-fused gear
        # runs all three via python twins.
        ctx["wave_fused_capable"] = fused_maps_ok and not (
            cfg.check_fragments or cfg.retry or cfg.retry_errors
            or ctx.get("host_rules") is not None)
        # fully-fused gear: when nothing requires per-wave DataFrame state
        # (no checkpoint commits, no per-host budget windows, no resume),
        # the gate-bounded maps make the whole loop a Python computation —
        # the reference's own single-node shape, applied exactly where the
        # input is single-node sized. Retry and fragment crawls DO take
        # this gear: their state twins (429/backoff requeues with bit-exact
        # jitter, pending-fragment validation) are asserted equal to the
        # staged branches by tests/test_wave_fused.py.
        full_fused_ok = (fused_maps_ok and store is None and not resume
                         and not cfg.per_host_budget)
        if full_fused_ok or ctx["wave_fused_capable"]:
            ctx["docs_bc"] = spark.sparkContext.broadcast(
                build_docs_map(documents))
        if full_fused_ok:
            from linkinator_spark.operators.wave_fused import FusedCapExceeded

            try:
                return self._check_full_fused(cfg, ctx)
            except FusedCapExceeded:
                # the crawl DISCOVERED more edges/results than the fused
                # gear's driver-side cap — restart on the staged loop,
                # which holds that state as DataFrames (the fused loop has
                # no side effects, so the re-run is clean)
                pass

        # staged loop from here on: materialize the per-wave broadcast
        # dims it re-reads every wave (deferred past the fully-fused
        # short-circuit above)
        if not live:
            ctx["pages_dim"] = prepare_pages_dim(pages).localCheckpoint(
                eager=True)
            ctx["docs"] = documents.select(
                F.col("doc_id").alias("body_doc_id"), F.col("spans")
            ).localCheckpoint(eager=True)

        if resume and store and store.latest_wave() is not None:
            manifest, state = store.load(spark, store.latest_wave())
            clock = float(manifest["clock"])
            wave = int(manifest["wave"]) + 1
            frontier = state["frontier"]
            seen_parts = [state["seen"]]
            results_parts = [state["results"]]
            rel_parts = [state["relationships"]]
            dup_parts = [state["dup_edges"]]
            events_parts = [state["events"]]
            pending = state["pending_fragments"]
            host_delays = state["host_delays"]
            if ctx.get("live_robots") and "host_rules" in state:
                # live robots rules ride the wave commit — resume must
                # not re-contact every known host for robots.txt
                ctx["host_rules"] = state["host_rules"]
                ctx["host_rules_parts"] = [state["host_rules"]]
        else:
            seeds = self._seed_frontier(cfg)
            frontier = (
                spark.createDataFrame(seeds, FRONTIER_SCHEMA)
                if seeds else self._empty(FRONTIER_SCHEMA)
            )
            seen_parts = [frontier.select("url")]
            results_parts, events_parts, rel_parts, dup_parts = [], [], [], []
            pending = self._empty(PENDING_SCHEMA)
            host_delays = self._empty(DELAY_SCHEMA)
            clock = 0.0
            wave = 0

        # mid-wave fetch journal (north_rule "resumes mid-wave without
        # re-fetching"): live crawls publish each fetch stage's output
        # durably as it materializes; a resume into the crashed wave
        # replays it instead of re-requesting. Table-join crawls are
        # pure compute — no journal, wave-boundary resume suffices.
        ctx["journal_store"] = store if (
            live and store is not None
            and hasattr(store, "commit_partial")) else None
        if ctx["journal_store"] is not None and resume:
            ctx["journal_wave"] = wave
            ctx["fetch_journal"] = ctx["journal_store"].load_partials(
                spark, wave)

        next_stats = None  # (n_total, min_nb, n_ready) piggybacked on touch
        while wave < cfg.max_waves:
            # ---- wave stats + earliest-wakeup clock: computed inside the
            # previous wave's touch job; a standalone aggregate only on the
            # first wave (or after a checkpoint-store reload)
            if next_stats is None:
                n_total, min_nb, n_ready = frontier.agg(
                    F.count("*"),
                    F.min("not_before"),
                    F.sum(F.when(F.col("not_before") <= clock + _EPS, 1).otherwise(0)),
                ).collect()[0]
            else:
                n_total, min_nb, n_ready = next_stats
                next_stats = None
            if not n_total:
                break

            # ---- URL-seen Bloom pre-filter (J2 scale path). Built once the
            # frontier crosses the activation threshold (one pass over the
            # seen set, tree_fold — no driver rows), then maintained
            # incrementally by the touch job. Each wave broadcasts a bits
            # snapshot; candidates the filter proves unseen skip the exact
            # anti-join shuffle entirely (bloom.py docstring for why false
            # positives stay exact).
            if (cfg.use_bloom and ctx["bloom"] is None
                    and n_total >= cfg.bloom_min_frontier):
                seen_all = self._union(seen_parts, "url string")
                if cfg.seen_filter == "cuckoo":
                    ctx["bloom"] = build_cuckoo(
                        seen_all, expected=cfg.bloom_expected)
                else:
                    ctx["bloom"] = build_bloom(
                        seen_all, expected=cfg.bloom_expected,
                        fpp=cfg.bloom_fpp)
            if ctx["bloom"] is not None:
                if ctx["bloom_bc"] is not None:
                    ctx["bloom_bc"].unpersist(blocking=False)
                ctx["bloom_bc"] = (
                    broadcast_cuckoo(spark, ctx["bloom"])
                    if isinstance(ctx["bloom"], CuckooFilter)
                    else broadcast_bloom(spark, ctx["bloom"]))

            if not n_ready:
                # advance to the earliest deadline; its rows become ready by
                # construction, no recount needed. In LIVE mode the wait is
                # REAL (the reference's setTimeout semantics): retry-after
                # and Crawl-delay politeness must hold in wall-clock time
                # against a remote server, not only in virtual ordering
                if live and min_nb > clock:
                    import time as _time

                    _time.sleep(min_nb - clock)
                clock = float(min_nb)

            # adaptive layout: tail waves (and fixture-sized crawls) collapse
            # to one partition — scheduling 4+ tasks per 4-row stage costs
            # more than the work; big waves keep the host-keyed partitioning
            small_wave = n_total < 10_000
            ctx["small_wave"] = small_wave

            ready_cond = F.col("not_before") <= F.lit(clock + _EPS)
            ready = frontier.filter(ready_cond)
            deferred = frontier.filter(~ready_cond)

            # ---- per-host politeness budget. Small waves: plain window over
            # one coalesced partition (cheap). Big waves: the skew-salted
            # two-phase split — a Zipf-hot host would otherwise serialize the
            # whole wave inside one window task (politeness.py docstring).
            if cfg.per_host_budget:
                if small_wave:
                    w = Window.partitionBy("host").orderBy("not_before", "seq")
                    ranked = ready.withColumn("_rk", F.row_number().over(w))
                    deferred = deferred.unionByName(
                        ranked.filter(F.col("_rk") > cfg.per_host_budget).drop("_rk")
                    )
                    ready = ranked.filter(
                        F.col("_rk") <= cfg.per_host_budget).drop("_rk")
                else:
                    ready, overflow = politeness_budget_split(
                        ready, cfg.per_host_budget, cfg.salt_hot_host_threshold
                    )
                    deferred = deferred.unionByName(overflow)

            seen = self._union(seen_parts, "url string")
            relationships = self._union(rel_parts, REL_SCHEMA)

            (wave_results, wave_events, requeued, new_frontier,
             new_rel, new_dups, pending, host_delays) = self._run_wave(
                ready, cfg, clock, wave, ctx, seen, relationships,
                pending, host_delays,
            )

            # ---- materialize this wave's outputs (small), keep cumulative
            # state as unions of checkpointed parts. Each part is a LAZY
            # localCheckpoint; one union-count at the end of the wave
            # materializes them all in a single job (an eager checkpoint per
            # part costs a driver-blocking job each — the dominant wall-clock
            # term on many-wave crawls), while still truncating lineage
            # before the next wave plans on top.
            wave_parts: list[DataFrame] = []

            def _part(df):
                # localCheckpoint: ONLY for state that chains wave-over-wave
                # (frontier, seen feed, pending, delays) — each lazy
                # checkpoint call pays a full physical-planning pass
                # driver-side (~0.5 s at fixture scale), so it's reserved
                # for where lineage must be cut
                out = (df.coalesce(1) if small_wave else df).localCheckpoint(
                    eager=False
                )
                wave_parts.append(out)
                return out

            def _leaf(df):
                # per-wave output parts (results/events/rel/dups) are only
                # ever UNIONED in parallel, never chained — persist() is
                # O(1) driver-side and the wave's touch job materializes the
                # cache; their lineage roots at this wave's cached frames
                out = (df.coalesce(1) if small_wave else df).persist()
                wave_parts.append(out)
                return out

            new_frontier = _part(new_frontier.select(_FRONTIER_COLS))
            frontier = _part(
                deferred.select(_FRONTIER_COLS)
                .unionByName(requeued.select(_FRONTIER_COLS))
                .unionByName(new_frontier)
            )
            # rebind: downstream consumers (store metrics) must read the
            # cached frame, not recompute the fetch/classify lineage
            wave_results = _leaf(wave_results)
            results_parts.append(wave_results)
            events_parts.append(_leaf(wave_events))
            # rel is NOT a leaf: every later wave anti-joins the running
            # relationships union, so an uncut lineage would nest unions
            # exponentially across waves
            rel_parts.append(_part(new_rel))
            dup_parts.append(_leaf(new_dups))
            seen_parts.append(new_frontier.select("url"))
            if cfg.check_fragments:
                pending = _part(pending)
            if cfg.retry or ctx.get("host_rules") is not None:
                # host_delays mutates per wave under retry AND under robots
                # Crawl-delay arming — both need the lineage cut
                host_delays = _part(host_delays)

            # the one forcing action: touch every lazy checkpoint AND
            # compute the next wave's frontier stats in the same job. The
            # frontier part carries (not_before, marker); n_total counts the
            # always-non-null marker so it cannot silently drop a row whose
            # not_before is null. When the Bloom filter is active, the same
            # job also folds the new-frontier url hashes into per-partition
            # bitmaps (tree_fold OR-merge) — incremental maintenance
            # with zero extra barriers.
            bloom = ctx["bloom"]
            touch = None
            for p in wave_parts:
                is_frontier = p is frontier
                is_new = p is new_frontier
                sel = p.select(
                    (F.col("not_before") if is_frontier
                     else F.lit(None).cast("double")).alias("nb"),
                    (F.lit(1) if is_frontier
                     else F.lit(None).cast("int")).alias("isf"),
                    (F.xxhash64("url") if (is_new and bloom is not None)
                     else F.lit(None).cast("long")).alias("h"),
                )
                touch = sel if touch is None else touch.unionByName(sel)
            if bloom is None:
                srow = touch.agg(
                    F.count("isf"),
                    F.min("nb"),
                    F.sum(F.when(F.col("nb") <= clock + _EPS, 1).otherwise(0)),
                ).collect()[0]
                next_stats = (srow[0], srow[1], srow[2] or 0)
            elif isinstance(bloom, CuckooFilter):
                next_stats = self._touch_stats_with_cuckoo(touch, bloom, clock)
            else:
                next_stats = self._touch_stats_with_bloom(touch, bloom, clock)

            if store:
                full = {
                    "frontier": frontier,
                    "seen": self._union(seen_parts, "url string").distinct(),
                    "results": self._union(results_parts, RESULT_SCHEMA),
                    "relationships": self._union(rel_parts, REL_SCHEMA),
                    "dup_edges": self._union(dup_parts, DUP_SCHEMA),
                    "pending_fragments": pending,
                    "host_delays": host_delays,
                    "events": self._union(events_parts, EVENT_SCHEMA),
                }
                # per-host fetch metrics travel as a parquet table through
                # the same atomic commit — never a host-cardinality driver
                # dict (at 10^6+ distinct hosts that collect would be a
                # multi-MB manifest entry plus an extra driver job per
                # wave). Totals land in manifest["lineage"]["host_metrics"]
                # via the per-part footer pass, so the manifest stays O(1).
                full["host_metrics"] = wave_results.groupBy("host").agg(
                    F.count("*").alias("n_fetched"))
                if ctx.get("live_robots"):
                    # live robots rules ride the commit so resume never
                    # re-contacts a known host for robots.txt
                    full["host_rules"] = ctx["host_rules"]
                metrics = {"wave": wave, "clock": clock}
                state = store.commit(wave, clock, full, metrics)
                frontier = state["frontier"]
                seen_parts = [state["seen"]]
                results_parts = [state["results"]]
                rel_parts = [state["relationships"]]
                dup_parts = [state["dup_edges"]]
                events_parts = [state["events"]]
                pending = state["pending_fragments"]
                host_delays = state["host_delays"]
                if ctx.get("live_robots") and "host_rules" in state:
                    ctx["host_rules"] = state["host_rules"]
                    ctx["host_rules_parts"] = [state["host_rules"]]

            # wave outputs are materialized (touch + store both ran) —
            # release the wave-scoped caches (fetch/classify/candidates),
            # else a long crawl accumulates one set of persisted frames per
            # wave
            for df in ctx.pop("wave_cached", []):
                df.unpersist(blocking=False)
            if store and ctx.get("journal_store") is not None:
                # the wave's full commit supersedes its intra-wave fetch
                # journal (and every derived frame was re-read from the
                # committed wave dir above) — drop the journal now
                ctx["journal_store"].clear_partials(wave)
            wave += 1

        results = self._union(results_parts, RESULT_SCHEMA)
        dup_edges = self._union(dup_parts, DUP_SCHEMA)
        events = self._union(events_parts, EVENT_SCHEMA)
        return self._finalize(cfg, results, dup_edges, events, wave, clock,
                              cached=results_parts + dup_parts
                              + events_parts)

    def _finalize(self, cfg: CheckOptions, results, dup_edges, events,
                  wave: int, clock: float,
                  cached: list | None = None) -> CrawlResult:
        """Crawl-end assembly shared by every execution gear: duplicate-link
        BROKEN re-report, mapUrl display restoration, 'link' events, pass
        verdict."""
        # ---- duplicate-link BROKEN re-report (J1, src/index.ts:840-875)
        broken = results.filter(
            (F.col("state") == LinkState.BROKEN) & ~F.col("url").contains("#")
        ).select("url", "status", "state", "failure_details")
        dup_broken = dup_edges.join(broken, "url", "inner").select(
            "url", "status", "state", F.col("parent"), "failure_details",
            F.lit(wave).alias("wave"), F.lit("").alias("host"),
            F.lit(0).cast("long").alias("seq"),
        )
        results = results.unionByName(dup_broken)
        # P6 mapUrl: restore filesystem-path display for local-path crawls
        # (reference src/index.ts:1148-1176, applied on result emission)
        if cfg.static_http_server_host:
            from linkinator_spark.sources.localfs import map_url_expr

            results = results.withColumn(
                "url", map_url_expr(F.col("url"), cfg)
            ).withColumn("parent", map_url_expr(F.col("parent"), cfg))
        results = results.persist()
        # 'link' event per emitted result (reference src/index.ts:614,984 —
        # every LinkResult is also observable as an event), with mapUrl
        # already applied, matching the reference's emission point
        events = events.unionByName(
            results.select(
                F.lit("link").alias("kind"), "url",
                F.col("status").cast("int"),
                F.col("state").alias("detail"),
                F.col("wave").cast("int"),
            )
        )

        passed = results.filter(F.col("state") == LinkState.BROKEN).isEmpty()
        return CrawlResult(passed=passed, results=results, events=events,
                           waves=wave, clock=clock,
                           cached=list(cached or []) + [results])

    def _check_full_fused(self, cfg: CheckOptions, ctx: dict) -> CrawlResult:
        """Fully-fused gear (operators/wave_fused.run_crawl_fused): the
        whole wave loop as Python over the gate-bounded broadcast maps —
        zero Spark jobs between seed and finalization. Taken only for
        scripted crawls already small enough to broadcast, with no
        checkpointing / politeness budget (crawler gate in check());
        retry, fragment and robots crawls run their state twins here —
        result-identical to the staged loop (tests/test_wave_fused.py)."""
        from linkinator_spark.operators.wave_fused import (
            _make_py_frag_skip, run_crawl_fused,
        )

        robots_rules = None
        if ctx.get("host_rules") is not None:
            # per-host rule dim, bounded by the scripted table's hosts
            # (itself under the chain-map gate) — broadcast-sized
            robots_rules = {
                r["host"]: (list(r["disallow"] or []), list(r["allow"] or []),
                            r["crawl_delay"])
                for r in ctx["host_rules"].collect()
            }
        # executor-side extraction for LARGE waves: the per-page link
        # extraction (HTML parse + URL resolution) is the fused loop's
        # dominant cost and is per-page pure, so a big wave ships slim
        # (page_url, base_url, kind, doc_id) rows to the executors and
        # resolves span bodies from the docs broadcast there — the
        # driver never serializes bodies, and extraction runs on every
        # core. Small waves stay inline (a Spark job per tail wave would
        # cost more than it saves).
        candidates_fn = ctx["candidates_udf"]
        docs_bc = ctx["docs_bc"]
        spark = self.spark

        def _extract_distributed(pages):
            import pyarrow as pa

            tbl = pa.table({
                "page_url": pa.array([p[0] for p in pages], pa.string()),
                "base_url": pa.array([p[1] for p in pages], pa.string()),
                "content_kind": pa.array([p[2] for p in pages], pa.string()),
                "doc_id": pa.array([p[3] for p in pages], pa.string()),
            })

            def fn(batches):
                import pandas as pd

                docs = docs_bc.value
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    ext = pd.DataFrame({
                        "page_url": pdf["page_url"],
                        "base_url": pdf["base_url"],
                        "content_kind": pdf["content_kind"],
                        "spans": pdf["doc_id"].map(docs.get),
                    })
                    yield from candidates_fn([ext])

            # createDataFrame(pa.Table) already slices into
            # defaultParallelism partitions — no shuffle needed
            out = spark.createDataFrame(tbl).mapInPandas(
                fn, CANDIDATE_SCHEMA)
            return out.toArrow().to_pylist()

        res_rows, ev_rows, dup_rows, waves, clock = run_crawl_fused(
            self._seed_frontier(cfg), ctx["chain_bc"].value,
            ctx["docs_bc"].value, cfg, ctx["candidates_udf"],
            anchors_fn=ctx["anchors_udf"],
            frag_skip_fn=_make_py_frag_skip(cfg.fragments_to_skip),
            robots_rules=robots_rules,
            parallel_extract={"min_pages": 3000,
                              "run": _extract_distributed},
        )
        # Arrow-table ingestion: the tuple createDataFrame path pickles
        # row-by-row through py4j (~4.2s for 50k result rows); building
        # pyarrow arrays column-wise and handing Spark the Table is ~4x
        # faster with the identical schema
        import pyarrow as pa

        def _c(i, rows):
            return [r[i] for r in rows]

        results = self.spark.createDataFrame(pa.table({
            "url": pa.array(_c(0, res_rows), pa.string()),
            "status": pa.array(_c(1, res_rows), pa.int32()),
            "state": pa.array(_c(2, res_rows), pa.string()),
            "parent": pa.array(_c(3, res_rows), pa.string()),
            "failure_details": pa.array(
                _c(4, res_rows), pa.list_(pa.string())),
            "wave": pa.array(_c(7, res_rows), pa.int32()),
            "host": pa.array(_c(5, res_rows), pa.string()),
            "seq": pa.array(_c(6, res_rows), pa.int64()),
        }), RESULT_SCHEMA)
        events = self.spark.createDataFrame(pa.table({
            "kind": pa.array(_c(0, ev_rows), pa.string()),
            "url": pa.array(_c(1, ev_rows), pa.string()),
            "status": pa.array(_c(2, ev_rows), pa.int32()),
            "detail": pa.array(_c(3, ev_rows), pa.string()),
            "wave": pa.array(_c(4, ev_rows), pa.int32()),
        }), EVENT_SCHEMA)
        dup_edges = self.spark.createDataFrame(pa.table({
            "url": pa.array(_c(0, dup_rows), pa.string()),
            "parent": pa.array(_c(1, dup_rows), pa.string()),
        }), DUP_SCHEMA)
        return self._finalize(cfg, results, dup_edges, events, waves, clock)

    # ---------------------------------------------------------------- seeds
    def _touch_stats_with_bloom(self, touch, bloom: BloomFilter, clock: float):
        """Bloom-maintaining form of the wave's single forcing job: per
        partition, fold the frontier stats AND the new-frontier url hashes
        into a local numpy bitmap; a depth-2 ``tree_fold`` merges
        executor-side, so the driver receives a handful of bitmaps and zero
        rows. Folds the merged bits into `bloom` (rebinding, not mutating —
        broadcast snapshots of earlier waves stay valid) and returns
        ``(n_total, min_nb, n_ready)``."""
        import numpy as np
        import pandas as pd

        n_bits, k = bloom.n_bits, bloom.k
        size = n_bits // 8
        deadline = clock + _EPS

        def fn(batches):
            bf = BloomFilter.__new__(BloomFilter)
            bf.bits = np.zeros(size, dtype=np.uint8)
            bf.n_bits, bf.k = n_bits, k
            n, mn, nr = 0, np.nan, 0
            for pdf in batches:
                n += int(pdf["isf"].count())
                nb = pdf["nb"].to_numpy(dtype="float64", na_value=np.nan)
                valid = nb[~np.isnan(nb)]
                if len(valid):
                    m = float(valid.min())
                    mn = m if np.isnan(mn) else min(mn, m)
                    nr += int((valid <= deadline).sum())
                h = pdf["h"].dropna()
                if len(h):
                    bf.add_many(h.to_numpy(dtype=np.int64))
            yield pd.DataFrame(
                {"n": [n], "mn": [mn], "nr": [nr], "bits": [bf.bits.tobytes()]}
            )

        rows = touch.mapInPandas(fn, "n long, mn double, nr long, bits binary")

        def fold(acc, pdf):
            n, mn, nr, bits = acc
            for rn, rmn, rnr, rbits in zip(
                    pdf["n"], pdf["mn"], pdf["nr"], pdf["bits"]):
                if rmn is not None and rmn == rmn:  # non-null, non-NaN
                    rmn = float(rmn)
                    mn = rmn if mn is None else min(mn, rmn)
                np.bitwise_or(bits, np.frombuffer(rbits, dtype=np.uint8),
                              out=bits)
                n += int(rn)
                nr += int(rnr)
            return (n, mn, nr, bits)

        def comb(a, b):
            mns = [x for x in (a[1], b[1]) if x is not None]
            np.bitwise_or(a[3], b[3], out=a[3])
            return (a[0] + b[0], min(mns) if mns else None, a[2] + b[2], a[3])

        n, mn, nr, new_bits = tree_fold(
            rows, lambda: (0, None, 0, np.zeros(size, dtype=np.uint8)),
            fold, comb)
        bloom.bits = np.bitwise_or(bloom.bits, new_bits)
        return (n, mn, nr)

    def _touch_stats_with_cuckoo(self, touch, cf: CuckooFilter, clock: float):
        """Cuckoo-maintaining form of the wave's single forcing job: the
        stats fold is identical to the Bloom twin, but the new-frontier url
        hashes come back as sparse (bucket, fingerprint) pairs — O(new keys
        this wave) bytes on the wire, not a dense table snapshot — merged
        executor-side by concatenation via ``tree_fold`` and relocated
        into `cf` with one vectorized ``insert_pairs`` on the driver.
        In-place mutation is safe: ``broadcast_cuckoo`` snapshots the table
        bytes, so earlier waves' broadcasts stay valid. At 10^10-frontier
        scale the filter is sharded by url_hash range across executors
        (SCALE.md §2); this single-object gear is the broadcastable
        mid-scale path, exactly like the Bloom default."""
        import numpy as np
        import pandas as pd

        from linkinator_spark.operators.cuckoo import derive_pairs

        m = cf.m
        deadline = clock + _EPS

        def fn(batches):
            n, mn, nr = 0, np.nan, 0
            idxs, fps = [], []
            for pdf in batches:
                n += int(pdf["isf"].count())
                nb = pdf["nb"].to_numpy(dtype="float64", na_value=np.nan)
                valid = nb[~np.isnan(nb)]
                if len(valid):
                    mv = float(valid.min())
                    mn = mv if np.isnan(mn) else min(mn, mv)
                    nr += int((valid <= deadline).sum())
                h = pdf["h"].dropna()
                if len(h):
                    i1, fp = derive_pairs(m, h.to_numpy(dtype=np.int64))
                    idxs.append(i1)
                    fps.append(fp)
            idx = np.concatenate(idxs) if idxs else np.empty(0, dtype=np.int64)
            fp = np.concatenate(fps) if fps else np.empty(0, dtype=np.uint16)
            if len(idx):
                # one slot per distinct key — the filter holds a set
                _, first = np.unique(
                    (idx << np.int64(16)) | fp.astype(np.int64),
                    return_index=True)
                idx, fp = idx[first], fp[first]
            yield pd.DataFrame({
                "n": [n], "mn": [mn], "nr": [nr],
                "idx": [idx.tobytes()], "fp": [fp.tobytes()],
            })

        rows = touch.mapInPandas(
            fn, "n long, mn double, nr long, idx binary, fp binary")

        def fold(acc, pdf):
            n, mn, nr, idxs, fps = acc
            for rn, rmn, rnr, ridx, rfp in zip(
                    pdf["n"], pdf["mn"], pdf["nr"], pdf["idx"], pdf["fp"]):
                if rmn is not None and rmn == rmn:  # non-null, non-NaN
                    rmn = float(rmn)
                    mn = rmn if mn is None else min(mn, rmn)
                idxs.append(np.frombuffer(ridx, dtype=np.int64))
                fps.append(np.frombuffer(rfp, dtype=np.uint16))
                n += int(rn)
                nr += int(rnr)
            return (n, mn, nr, idxs, fps)

        def comb(a, b):
            mns = [x for x in (a[1], b[1]) if x is not None]
            return (a[0] + b[0], min(mns) if mns else None, a[2] + b[2],
                    a[3] + b[3], a[4] + b[4])

        n, mn, nr, idxs, fps = tree_fold(
            rows, lambda: (0, None, 0, [], []), fold, comb)
        idxs = [a for a in idxs if len(a)]
        fps = [a for a in fps if len(a)]
        if idxs:
            cf.insert_pairs(np.concatenate(idxs), np.concatenate(fps))
        return (n, mn, nr)

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

    # ---------------------------------------------------------- fused wave
    def _journal_fetch(self, ctx: dict, wave: int, stage: str, inp,
                       fetch_fn, key: str = "url"):
        """Mid-wave resume without re-fetching (north_rule): on live
        checkpointed crawls, publish this fetch stage's output to the
        store's intra-wave journal the moment it materializes (atomic
        per-stage publish, per-partition lineage in the sidecar), and on
        a resume into the same wave replay journaled rows per-`key` —
        only rows the journal misses hit the network. Pure-compute
        crawls (table-join fetch) skip the journal entirely:
        re-deriving a join has no side effects to avoid, so the
        wave-boundary commit already gives byte-identical resume there.
        """
        store = ctx.get("journal_store")
        if store is None:
            return fetch_fn(inp)
        replay = (ctx.get("fetch_journal", {}).get(stage)
                  if ctx.get("journal_wave") == wave else None)
        if replay is None:
            out = fetch_fn(inp)
        else:
            hits = replay.join(inp.select(key).distinct(), key, "semi")
            miss = inp.join(replay.select(key), key, "left_anti")
            out = hits.unionByName(fetch_fn(miss))
        # the write job scans the old journal while writing .tmp; the
        # atomic rename happens only after it finishes, so replay-over-
        # rewrite is safe. Returned frame re-reads the published stage.
        return store.commit_partial(wave, stage, out)

    def _run_wave_fused(
        self, ready, cfg: CheckOptions, clock: float, wave: int, ctx: dict,
        seen, relationships, pending_fragments, host_delays,
    ):
        """Small-wave fast path: the wave's per-row pipeline (pre-fetch
        skip, scripted fetch choreography, classify, extraction,
        within-wave edge dedup) collapses into ONE Arrow stage
        (operators/wave_fused.py); only the cross-wave relational tail
        (seen/relationship anti-joins, politeness rank) stays as
        DataFrame ops. Result-identical to the staged wave — asserted by
        tests/test_wave_fused.py path-equivalence and the crawl oracles."""
        from linkinator_spark.operators.wave_fused import run_wave_fused

        wave_cached: list[DataFrame] = ctx.setdefault("wave_cached", [])
        tagged = run_wave_fused(
            ready.coalesce(1), ctx["chain_bc"], ctx["docs_bc"], cfg,
            ctx["candidates_udf"],
        ).persist()
        wave_cached.append(tagged)
        results = tagged.filter(F.col("t") == "res").select(
            "url", "status", "state", "parent", "failure_details",
            F.lit(wave).alias("wave"), "host", "seq",
        )
        events = tagged.filter(F.col("t") == "ev").select(
            "kind", "url", "status", "detail", F.lit(wave).alias("wave"),
        )
        cand = tagged.filter(F.col("t") == "cand").select(
            "resolved_url", "page_url",
            F.col("cand_crawl").alias("_crawl"),
            F.col("child_host").alias("_child_host"),
            "parent_seq", "ordinal", "root_path",
        )
        new_frontier, new_rel, new_dups = self._candidates_tail(
            cand, clock, wave, seen, relationships,
            bloom_bc=ctx.get("bloom_bc"), small_wave=True,
        )
        return (results, events, self._empty(FRONTIER_SCHEMA), new_frontier,
                new_rel, new_dups, pending_fragments, host_delays)

    # ----------------------------------------------------------------- wave
    def _run_wave(
        self, ready, cfg: CheckOptions, clock: float, wave: int, ctx: dict,
        seen, relationships, pending_fragments, host_delays,
    ):
        if ctx.get("small_wave") and ctx.get("wave_fused_capable"):
            return self._run_wave_fused(
                ready, cfg, clock, wave, ctx, seen, relationships,
                pending_fragments, host_delays,
            )
        pages_dim = ctx["pages_dim"]
        skip_match = ctx["skip_match"]
        wave_cached: list[DataFrame] = ctx.setdefault("wave_cached", [])
        results_parts: list[DataFrame] = []
        events_parts: list[DataFrame] = []
        requeue_parts: list[DataFrame] = []

        # (staged wave; small waves of fused-capable crawls took the
        # single-stage path above)

        # ---- URL rewrite (src/index.ts:310-318)
        for pattern, replacement in cfg.url_rewrite:
            ready = ready.withColumn(
                "url", F.regexp_replace("url", pattern, replacement)
            )
        if cfg.url_rewrite:
            ready = ready.withColumn("host", url_host(F.col("url")))

        # ---- pre-fetch skip (src/index.ts:320-323,973-985)
        non_http = ~F.col("url").rlike("^https?://")
        skip_cond = non_http
        if skip_match is not None:
            skip_cond = skip_cond | skip_match(F.col("url"))
        results_parts.append(
            ready.filter(skip_cond).select(
                "url",
                F.when(non_http, F.lit(0)).otherwise(F.lit(None)).cast("int").alias("status"),
                F.lit(LinkState.SKIPPED).alias("state"),
                "parent",
                F.array().cast("array<string>").alias("failure_details"),
                F.lit(wave).alias("wave"), "host", "seq",
            )
        )
        ready = ready.filter(~skip_cond)

        # ---- live robots: fetch rules for hosts this wave meets for the
        # first time. Placed AFTER url_rewrite and the pre-fetch skip so
        # (a) rules key on the post-rewrite hosts the gate will look up,
        # and (b) hosts the user skip-ruled out of the crawl are never
        # contacted, not even for robots.txt.
        if ctx.get("live_robots"):
            from linkinator_spark.operators.robots import (
                RULES_SCHEMA, host_rules_live,
            )

            hosts_new = (
                ready.groupBy("host").agg(F.min("url").alias("url_sample"))
                .join(ctx["host_rules"].select("host"), "host", "left_anti")
            )
            # each wave's NEW rules are checkpointed once and the dim is a
            # union of parts (seen_parts pattern) — re-checkpointing the
            # cumulative dim would rewrite O(hosts) rows per wave; waves
            # that meet no new hosts append nothing
            new_rules = self._journal_fetch(
                ctx, wave, "robots", hosts_new,
                lambda d: host_rules_live(
                    d, cfg, cfg.user_agent).localCheckpoint(eager=True),
                key="host",
            )
            if not new_rules.isEmpty():
                ctx["host_rules_parts"].append(new_rules)
                ctx["host_rules"] = self._union(
                    ctx["host_rules_parts"], RULES_SCHEMA)

        # ---- robots.txt gate (north_star politeness; no reference analog)
        if ctx.get("host_rules") is not None:
            from linkinator_spark.operators.robots import robots_filter

            ready, disallowed = robots_filter(ready, ctx["host_rules"])
            results_parts.append(
                disallowed.select(
                    "url", F.lit(None).cast("int").alias("status"),
                    F.lit(LinkState.SKIPPED).alias("state"), "parent",
                    F.array(F.lit("robots.txt disallow")).alias("failure_details"),
                    F.lit(wave).alias("wave"), "host", "seq",
                )
            )

        # ---- per-host delay gate (J3, src/index.ts:325-342). Active for
        # 429 retry-after deadlines (cfg.retry) AND for robots Crawl-delay
        # pacing (rules dim present) — both families merge max-wins into
        # the same host_delays table
        if cfg.retry or ctx.get("host_rules") is not None:
            gated = ready.join(
                F.broadcast(host_delays.withColumnRenamed("not_before", "_host_nb")),
                "host", "left",
            )
            blocked = gated.filter(F.col("_host_nb") > clock + _EPS)
            requeue_parts.append(
                blocked.withColumn("not_before", F.col("_host_nb"))
                .select(_FRONTIER_COLS)
            )
            ready = gated.filter(
                F.col("_host_nb").isNull() | (F.col("_host_nb") <= clock + _EPS)
            ).drop("_host_nb")

        # ---- robots Crawl-delay -> per-host pacing (north_star
        # politeness; the reference has no robots at all): every host
        # fetched this wave admits no further fetches until
        # clock + crawl_delay. Wave-granular pacing — combine with
        # per_host_budget=1 for strict one-fetch-per-delay pacing.
        if ctx.get("host_rules") is not None:
            delay_rules = ctx["host_rules"].filter(
                F.col("crawl_delay").isNotNull()).select("host", "crawl_delay")
            armed = (
                ready.select("host").distinct()
                .join(F.broadcast(delay_rules), "host")
                .select("host", (F.lit(float(clock)) + F.col("crawl_delay"))
                        .alias("not_before"))
            )
            host_delays = (
                host_delays.unionByName(armed)
                .groupBy("host").agg(F.max("not_before").alias("not_before"))
            )

        # ---- fetch: HEAD for leaves, GET when crawling (src/index.ts:344-369)
        fused = (ctx.get("small_wave") and ctx.get("chain_bc") is not None
                 and ctx.get("requester") is None)
        if fused:
            # small waves: the whole request choreography (incl. the 405
            # and last-gasp fallbacks) in ONE mapInPandas stage over one
            # partition — tail/fixture waves are driver-latency-bound and
            # the staged plan's ~30 stages + 2 aggregates dominate
            cur = fetch_wave_fused(
                ready.coalesce(1), ctx["chain_bc"], cfg).persist()
            wave_cached.append(cur)
        else:
            method = F.when(F.col("crawl"), F.lit("GET")).otherwise(F.lit("HEAD"))
            cur = self._journal_fetch(
                ctx, wave, "fetch", ready,
                lambda d: fetch_once(
                    d, pages_dim, method, cfg, skip_match,
                    ctx.get("host_defaults"), requester=ctx.get("requester"),
                    chain_bc=ctx.get("chain_bc"), cache_into=wave_cached),
            ).persist()
            wave_cached.append(cur)

        c405 = (F.col("status") == 405) & F.col("redirect_skipped").isNull()
        lg_cond = (
            (~F.col("has_response") | (F.col("status") < 200) | (F.col("status") >= 300))
            & ~F.col("crawl")
            & F.col("redirect_skipped").isNull()
            & (F.col("status") != 405)
        )
        # retry-family conditions (src/index.ts:1019-1109), built up front so
        # ONE aggregate gates the fallback paths AND both retry families;
        # they are re-counted only when a fallback refetch changed statuses
        no_rskip = F.col("redirect_skipped").isNull()
        deadline = retry_after_seconds(F.col("retry_after"), clock)
        c429 = (
            (F.col("status") == 429) & F.col("retry_after").isNotNull()
            & deadline.isNotNull() & no_rskip
        ) if cfg.retry else F.lit(False)
        err_base = (
            (F.col("status") == 0) | (F.col("status") >= 500) | (F.col("status") == 429)
        ) & (F.col("retry_errors_n") < cfg.retry_errors_count) & no_rskip
        cerr = (err_base & ~c429) if cfg.retry_errors else F.lit(False)

        def _retry_counts(df):
            return df.agg(
                F.sum(F.when(c429, 1).otherwise(0)),
                F.sum(F.when(cerr, 1).otherwise(0)),
            ).collect()[0]

        if fused:
            # the fused stage already applied the 405 + last-gasp passes;
            # the retry branches below are built unconditionally (-1 is a
            # build-it marker): their filters are empty when nothing
            # matched, so skipping the gating aggregate saves a per-wave
            # driver job at zero result difference
            n405 = nlg = 0
            n429 = -1 if cfg.retry else 0
            nerr = -1 if cfg.retry_errors else 0
        else:
            n405, nlg, n429, nerr = cur.agg(
                F.sum(F.when(c405, 1).otherwise(0)),
                F.sum(F.when(lg_cond, 1).otherwise(0)),
                F.sum(F.when(c429, 1).otherwise(0)),
                F.sum(F.when(cerr, 1).otherwise(0)),
            ).collect()[0]

        def _refetch(subset: DataFrame, stage: str) -> DataFrame:
            def _go(sub: DataFrame) -> DataFrame:
                re = fetch_once(
                    sub.withColumn("_prev_failures", F.col("fetch_failures"))
                    .drop(*FETCH_COLS),
                    pages_dim, F.lit("GET"), cfg, skip_match,
                    ctx.get("host_defaults"), requester=ctx.get("requester"),
                    chain_bc=ctx.get("chain_bc"), cache_into=wave_cached,
                )
                return re.withColumn(
                    "fetch_failures",
                    F.concat(F.col("_prev_failures"), F.col("fetch_failures")),
                ).drop("_prev_failures")

            return self._journal_fetch(ctx, wave, stage, subset, _go)

        # 405 -> retry as GET (src/index.ts:378-388)
        if n405:
            cur = cur.filter(~c405).unionByName(
                _refetch(cur.filter(c405), "fetch405")).persist()
            wave_cached.append(cur)
            nlg = cur.agg(F.sum(F.when(lg_cond, 1).otherwise(0))).collect()[0][0]

        # last-gasp GET for non-2xx leaf checks (src/index.ts:396-417);
        # lg_cond excludes 405 rows (those took the fallback above), matching
        # the reference's sequential flow
        if nlg:
            lg_full = (
                (~F.col("has_response") | (F.col("status") < 200) | (F.col("status") >= 300))
                & ~F.col("crawl") & F.col("redirect_skipped").isNull()
            )
            cur = cur.filter(~lg_full).unionByName(
                _refetch(cur.filter(lg_full), "fetchlg")).persist()
            wave_cached.append(cur)

        if n405 or nlg:
            # a refetch changed statuses; the retry counters must see them
            if cfg.retry or cfg.retry_errors:
                n429, nerr = _retry_counts(cur)

        # ---- redirect-skipped -> SKIPPED (src/index.ts:370-373)
        results_parts.append(
            cur.filter(F.col("redirect_skipped").isNotNull()).select(
                "url", F.lit(None).cast("int").alias("status"),
                F.lit(LinkState.SKIPPED).alias("state"), "parent",
                F.array().cast("array<string>").alias("failure_details"),
                F.lit(wave).alias("wave"), "host", "seq",
            )
        )
        cur = cur.filter(F.col("redirect_skipped").isNull())

        # ---- retry gating: counters were computed in the shared aggregate
        # above (and re-counted after any fallback refetch)

        # ---- 429 + retry-after -> host delay + requeue (src/index.ts:1019-1060)
        if n429:
            r429 = cur.filter(c429).withColumn("_deadline", deadline)
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
            cur = cur.filter(~c429)

        # ---- error retry with exponential backoff (src/index.ts:1069-1109)
        if nerr:
            err = cur.filter(cerr)
            n1 = F.col("retry_errors_n") + 1
            jitter_s = (
                F.pmod(F.xxhash64(F.col("url"), n1, F.lit(cfg.seed)), F.lit(10000))
                / 10000.0 * cfg.retry_errors_jitter / 1000.0
            )
            backoff = F.pow(F.lit(2.0), n1.cast("double")) + jitter_s
            requeue_parts.append(
                err.withColumn("not_before", F.lit(clock) + backoff)
                .withColumn("retry_errors_n", n1)
                .withColumn("attempt", F.col("attempt") + 1)
                .select(_FRONTIER_COLS)
            )
            events_parts.append(
                err.select(
                    F.lit("retry").alias("kind"), "url", "status",
                    F.round(backoff).cast("string").alias("detail"),
                    F.lit(wave).alias("wave"),
                )
            )
            cur = cur.filter(~cerr)

        # ---- content sniff
        cur = with_body_flag(cur).withColumn(
            "_is_html", F.col("content_type").rlike(_HTML_RE)
        ).withColumn("_is_css", F.col("content_type").rlike(_CSS_RE))

        # ---- fragment-target body re-GET for HEAD-fetched pages
        # (src/index.ts:450-473)
        if cfg.check_fragments:
            frag_targets = pending_fragments.select(
                F.col("target_url").alias("url")
            ).distinct()
            need_cond = F.col("_is_html") & ~F.col("has_body") & F.col("has_response")
            need_body = cur.join(F.broadcast(frag_targets), "url", "semi").filter(need_cond)
            n_need = need_body.count()
            if n_need:
                re_got = (
                    with_body_flag(
                        _refetch(need_body.drop("_is_html", "_is_css", "has_body"),
                                 "fetchfrag")
                    )
                    .withColumn("_is_html", F.col("content_type").rlike(_HTML_RE))
                    .withColumn("_is_css", F.col("content_type").rlike(_CSS_RE))
                    .filter(F.col("redirect_skipped").isNull())
                )
                cur = cur.join(
                    need_body.select("url"), "url", "left_anti"
                ).unionByName(re_got.select(*cur.columns))

        # ---- classification (src/index.ts:482-604)
        classified = classify(cur, cfg).persist()
        wave_cached.append(classified)

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
        # live mode: the wave's own fetched bodies ARE the docs dim
        docs_dim = ctx["docs"]
        if docs_dim is None:
            docs_dim = classified.filter(F.col("has_body")).select(
                "body_doc_id", F.col("_live_spans").alias("spans")
            )
        # 'pagestart' event per page entering link extraction
        # (reference src/index.ts:677)
        events_parts.append(
            ext_pages.select(
                F.lit("pagestart").alias("kind"),
                F.col("page_url").alias("url"),
                F.lit(None).cast("int").alias("status"),
                F.lit("").alias("detail"),
                F.lit(wave).alias("wave"),
            )
        )
        candidates = (
            ext_pages.join(docs_dim, "body_doc_id", "left")
            .select("page_url", "base_url", "content_kind", "spans")
            .mapInPandas(ctx["candidates_udf"], CANDIDATE_SCHEMA)
            .join(
                ext_pages.select("page_url", "root_path", "parent_seq"),
                "page_url",
            )
        )

        candidates = candidates.persist()
        wave_cached.append(candidates)
        (cand_results, new_frontier, new_rel, new_dups, new_pending) = \
            self._process_candidates(
                candidates, cfg, clock, wave, skip_match,
                ctx["frag_skip_match"], seen, relationships,
                bloom_bc=ctx.get("bloom_bc"),
                small_wave=ctx.get("small_wave", True),
            )
        results_parts.append(cand_results)

        # ---- fragment validation (src/index.ts:616-673,878-920 + E9/E10)
        pending_all = pending_fragments.unionByName(new_pending)
        if cfg.check_fragments:
            frag_results, pending_all = self._validate_fragments(
                classified, docs_dim, pending_all, ctx["anchors_udf"], wave
            )
            results_parts.append(frag_results)

        return (
            self._union(results_parts, RESULT_SCHEMA),
            self._union(events_parts, EVENT_SCHEMA),
            self._union(requeue_parts, FRONTIER_SCHEMA),
            new_frontier,
            new_rel,
            new_dups,
            pending_all,
            host_delays,
        )

    # ---------------------------------------------------- candidate pipeline
    def _process_candidates(
        self, candidates, cfg: CheckOptions, clock: float, wave: int,
        skip_match, frag_skip_match, seen, relationships, bloom_bc=None,
        small_wave=True,
    ):
        results_parts: list[DataFrame] = []

        # malformed hrefs -> BROKEN status 0 (src/index.ts:720-730)
        results_parts.append(
            candidates.filter(F.col("parse_error").isNotNull()).select(
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
            results_parts.append(
                cand.filter(sk_cond).select(
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
        new_pending = self._empty(PENDING_SCHEMA)
        if cfg.check_fragments:
            has_frag = F.col("fragment").isNotNull() & (F.length("fragment") > 0)
            frag_rows = cand.filter(has_frag)
            if frag_skip_match is not None:
                fsk_cond = frag_skip_match(F.col("fragment"), F.col("url_with_fragment"))
                results_parts.append(
                    frag_rows.filter(fsk_cond).select(
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
        deduped = (
            cand.withColumn("_rn", F.row_number().over(w_edge))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
        new_frontier, new_rel, new_dups = self._candidates_tail(
            deduped, clock, wave, seen, relationships,
            bloom_bc=bloom_bc, small_wave=small_wave,
        )
        out_results = self._union(results_parts, RESULT_SCHEMA)
        return out_results, new_frontier, new_rel, new_dups, new_pending

    def _candidates_tail(self, deduped, clock: float, wave: int, seen,
                         relationships, bloom_bc=None, small_wave=True):
        """The relational tail shared by the staged and fused wave paths:
        cross-wave relationship anti-join, per-URL first-edge selection,
        URL-seen dedup (+Bloom fast path), politeness ranking, and the
        next-wave frontier rows. Input: within-wave-deduped candidate
        edges with columns (resolved_url, page_url, _crawl, _child_host,
        parent_seq, ordinal, root_path)."""
        edges = deduped.join(
            relationships,
            (F.col("resolved_url") == relationships["child_url"])
            & (F.col("page_url") == relationships["parent_url"]),
            "left_anti",
        )
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

        if bloom_bc is not None:
            # Bloom fast path: rows the filter proves unseen enqueue without
            # touching the anti-join shuffle; the (small) maybe-seen slice
            # goes through the exact join, which also restores exactness for
            # false positives. Output set is identical to the plain path.
            pre = (cuckoo_prefilter
                   if bloom_bc.value.get("kind") == "cuckoo"
                   else bloom_prefilter)
            def_new, maybe = pre(
                primary, None, url_col="resolved_url", payload=bloom_bc
            )
            enqueue = def_new.unionByName(
                maybe.join(seen, maybe["resolved_url"] == seen["url"],
                           "left_anti")
            )
            seen_dups = maybe.join(
                seen, maybe["resolved_url"] == seen["url"], "semi"
            ).select(F.col("resolved_url").alias("url"),
                     F.col("page_url").alias("parent"))
        else:
            enqueue = primary.join(
                seen, primary["resolved_url"] == seen["url"], "left_anti"
            )
            seen_dups = primary.join(
                seen, primary["resolved_url"] == seen["url"], "semi"
            ).select(F.col("resolved_url").alias("url"),
                     F.col("page_url").alias("parent"))
        new_dups = extra_dups.unionByName(seen_dups)

        # queue ordering: seq is the GLOBAL reference-FIFO discovery rank
        # within the wave (the reference queue's position, src/queue.ts
        # FIFO append order), not a per-host rank — per-host seq ranks tie
        # across hosts (two same-wave parents on different hosts share a
        # seq), and a tie-broken row_number diverges from the reference's
        # per-host fetch order on multi-host-seed crawls. (parent_seq,
        # ordinal) is globally unique, so the global rank is deterministic;
        # its per-host restriction is exactly the reference's per-host FIFO
        # (SURVEY §2.6). Small waves: one plain window. Big waves: the
        # range-partitioned exact rank (politeness.global_fifo_rank; values
        # identical, no single-task global sort).
        if small_wave:
            w_g = Window.orderBy("parent_seq", "ordinal")
            ranked_enq = enqueue.withColumn(
                "_hrn", F.row_number().over(w_g).cast("long"))
        else:
            from linkinator_spark.operators.politeness import (
                global_fifo_rank,
            )

            ranked_enq = global_fifo_rank(
                enqueue, "parent_seq", "ordinal", out_col="_hrn")
        new_frontier = ranked_enq.select(
            F.col("resolved_url").alias("url"),
            F.col("_child_host").alias("host"),
            F.col("page_url").alias("parent"),
            F.col("_crawl").alias("crawl"),
            F.col("root_path").alias("root_path"),
            F.lit(1).alias("attempt"),
            F.lit(0).alias("retry_errors_n"),
            F.lit(float(clock)).alias("not_before"),
            F.lit(wave + 1).alias("wave"),
            (F.lit((wave + 1) * SEQ_WAVE_STRIDE) + F.col("_hrn"))
            .cast("long").alias("seq"),
        )
        return new_frontier, new_rel, new_dups

    # ------------------------------------------------------------ fragments
    def _validate_fragments(self, classified, docs, pending_all, anchors_udf, wave: int):
        """E9/E10: anchors per fetched OK html page; missing fragments ->
        BROKEN with the reference's exact message (src/index.ts:657-660);
        soft-404 pages skip validation (src/index.ts:632-635).

        Visibility rule: a pending fragment resolves when its target page
        is fetched OK-with-body in a wave AT OR AFTER the fragment's
        registration wave (same-wave works because pending_all includes
        this wave's new pending — the reference's same-page special case,
        src/index.ts:888-918, falls out of this). A fragment registered
        AFTER its target's only fetch stays pending forever — which is
        the reference's behavior too: it registers fragments at
        extraction (src/index.ts:779-782) but validates only at the
        target's own check time (src/index.ts:618-673), and a cached URL
        is never re-checked (src/index.ts:814), so under its concurrency
        pool late-registered fragments silently never validate. The wave
        model is a deterministic refinement of that race."""
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


def check_live(spark: SparkSession, cfg: CheckOptions,
               resume: bool = False) -> CrawlResult:
    """Live-HTTP crawl: same engine, with the fetch join swapped for the
    batched network stage (operators/http_fetch.py). Honors timeout, proxy
    env, and insecure-cert options (reference src/index.ts:14-78,
    src/cli.ts:118-119)."""
    return LinkChecker(spark).check(cfg, None, None, resume=resume)


def check_local(spark: SparkSession, cfg: CheckOptions,
                resume: bool = False) -> CrawlResult:
    """Local-path / glob mode (`linkinator ./docs --recurse`): expand glob
    seeds, model the static file server from the directory tree as scripted
    tables, crawl, and map result URLs back to filesystem paths (reference
    src/options.ts:117-190 + src/index.ts:223-250,1148-1176)."""
    from linkinator_spark.sources.localfs import (
        process_local_paths, serve_directory,
    )

    cfg = process_local_paths(cfg)
    pages, documents = serve_directory(spark, cfg.server_root, cfg)
    return LinkChecker(spark).check(cfg, pages, documents, resume=resume)


def _host_defaults(spark: SparkSession, cfg: CheckOptions):
    from linkinator_spark.sources.localfs import host_defaults_for

    return host_defaults_for(spark, cfg)
