"""Per-host politeness scheduling, skew-aware.

Semantics: each wave fetches at most `budget` URLs per host, in per-host FIFO
order (not_before, seq) — the distributed equivalent of the reference queue's
per-host ordering (src/queue.ts:69-97 + SURVEY §2.6).

A naive `row_number() OVER (PARTITION BY host ...)` puts every row of a host
into ONE task — a Zipf-hot host serializes the whole wave. This module uses
the classic two-phase distributed top-K instead:

  phase 1: salt hot hosts (pmod(url_hash, salt_factor)), rank within
           (host, salt) stripes — parallel across stripes — and keep only
           `budget` rows per stripe;
  phase 2: re-rank the survivors per host (at most budget x salt_factor
           rows per host — tiny) and keep `budget`.

Correctness: any row in the true per-host top-budget is in the top-budget of
its stripe, so phase 1 never drops a winner. The selected set equals the
single-window answer exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkinator_spark.sources.webgraph import hot_host_salts, with_salt


def politeness_take(
    frontier: DataFrame,
    budget: int,
    salt_threshold: int = 100_000,
    order_cols: tuple = ("not_before", "seq"),
) -> DataFrame:
    """Rows to fetch this wave: per-host FIFO top-`budget`, skew-parallel.
    Output = input columns + `host_rank`."""
    if "url_hash" not in frontier.columns:
        frontier = frontier.withColumn("url_hash", F.xxhash64("url"))
    # the salt-count aggregation and the ranking both consume the frontier;
    # cache it so the upstream pipeline (anti-join etc.) runs once
    frontier = frontier.persist()
    salts = hot_host_salts(frontier, salt_threshold)
    salted = with_salt(frontier, salts)

    w1 = Window.partitionBy("host", "salt").orderBy(*[F.col(c) for c in order_cols])
    local = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= budget)
        .drop("_r1")
    )
    w2 = Window.partitionBy("host").orderBy(*[F.col(c) for c in order_cols])
    return (
        local.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= budget)
        .drop("salt")
    )


def politeness_take_heap(
    frontier: DataFrame,
    budget: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """The literal priority-queue form of the scheduler: `applyInPandas`
    over host-hash buckets with an explicit per-host min-heap keyed on
    (not_before, seq), popping each host's next `budget` fetches in
    deadline order — the distributed analog of the reference queue's
    earliest-deadline scan (src/queue.ts:69-97,115-145).

    Output set and host_rank are identical to `politeness_take` (asserted
    by tests). Use the window form for Zipf-skewed frontiers (it salts hot
    hosts); this form keeps each host's rows in one task, which is the
    right shape when per-host state must stay together (live fetching with
    connection reuse / crawl-delay pacing)."""
    import heapq

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = frontier.sparkSession
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism * 2
    bucketed = frontier.withColumn(
        "_bucket", F.pmod(F.xxhash64("host"), F.lit(n_buckets))
    )
    out_schema = StructType(
        list(bucketed.schema.fields) + [StructField("host_rank", IntegerType())]
    )

    def sched(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in pdf.groupby("host", sort=False):
            heap = list(zip(g["not_before"].to_numpy(),
                            g["seq"].to_numpy(), g.index))
            heapq.heapify(heap)
            idx, ranks = [], []
            while heap and len(idx) < budget:
                _, _, i = heapq.heappop(heap)
                idx.append(i)
                ranks.append(len(idx))
            sel = g.loc[idx].copy()
            sel["host_rank"] = pd.Series(ranks, index=idx, dtype="int32")
            frames.append(sel)
        if not frames:
            return pdf.head(0).assign(
                host_rank=pd.Series([], dtype="int32"))
        return pd.concat(frames)

    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(sched, out_schema)
        .drop("_bucket")
    )


def hierarchical_row_number(
    df: DataFrame,
    part_col: str,
    coarse_col: str,
    fine_col: str,
    out_col: str = "_hrn",
) -> DataFrame:
    """Exact `row_number() OVER (PARTITION BY part ORDER BY coarse, fine)`
    with bounded task sizes: rank within (part, coarse) by fine (partitions
    bounded by rows per coarse group — e.g. links per page), then add a
    per-(part, coarse) offset computed as a prefix sum over the GROUP COUNT
    table (one row per coarse group — orders of magnitude smaller than the
    data, so its window task is tiny even for a host holding 10^7 new
    URLs). Output values are IDENTICAL to the single-window form (asserted
    by tests), without putting any whole `part` group in one task."""
    w_fine = Window.partitionBy(part_col, coarse_col).orderBy(fine_col)
    ranked = df.withColumn("_r_fine", F.row_number().over(w_fine))
    counts = df.groupBy(part_col, coarse_col).agg(F.count("*").alias("_n"))
    w_pre = (
        Window.partitionBy(part_col).orderBy(coarse_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_pre), F.lit(0))
    ).select(part_col, coarse_col, "_off")
    return (
        ranked.join(F.broadcast(offsets), [part_col, coarse_col])
        .withColumn(out_col, (F.col("_off") + F.col("_r_fine")).cast("long"))
        .drop("_r_fine", "_off")
    )


def politeness_split(
    frontier: DataFrame, budget: int, salt_threshold: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """(take, deferred): the wave's fetch set and the rows that wait."""
    take = politeness_take(frontier, budget, salt_threshold)
    deferred = frontier.join(take.select("url"), "url", "left_anti")
    return take.drop("host_rank", "url_hash"), deferred


def politeness_budget_split(
    ready: DataFrame,
    budget: int,
    salt_threshold: int,
    order_cols: tuple = ("not_before", "seq"),
) -> tuple[DataFrame, DataFrame]:
    """Join-free (take, overflow) split used by the crawl loop's per-host
    budget gate — the skew-safe replacement for a bare
    ``row_number() OVER (PARTITION BY host)``.

    Both outputs are derived from the same two-phase ranking, so no anti-join
    is needed to recover the overflow set:

      overflow = stripe rows ranked past `budget` in phase 1 (never winners,
                 see module docstring) ∪ phase-2 rows ranked past `budget`.

    The take set is exactly the naive single-window answer (asserted by
    tests/test_politeness.py equivalence tests)."""
    cols = ready.columns
    # no persist here: the crawl loop's `ready` is a filter over a
    # checkpointed frontier, so the three consumers (salt counts, phase-1
    # rank, phase-2 rank) re-scan cheap materialized state
    df = ready.withColumn("url_hash", F.xxhash64("url"))
    salts = hot_host_salts(df, salt_threshold)
    salted = with_salt(df, salts)

    order = [F.col(c) for c in order_cols]
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    ranked1 = salted.withColumn("_r1", F.row_number().over(w1))
    overflow1 = ranked1.filter(F.col("_r1") > budget).select(*cols)
    survivors = ranked1.filter(F.col("_r1") <= budget)

    w2 = Window.partitionBy("host").orderBy(*order)
    ranked2 = survivors.withColumn("_r2", F.row_number().over(w2))
    take = ranked2.filter(F.col("_r2") <= budget).select(*cols)
    overflow2 = ranked2.filter(F.col("_r2") > budget).select(*cols)
    return take, overflow1.unionByName(overflow2)


def global_fifo_rank(
    df: DataFrame,
    coarse_col: str,
    fine_col: str,
    out_col: str = "_grn",
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY coarse, fine)`` — a GLOBAL rank —
    without the global window's single-task sort: range-partition on the
    key, rank within each range partition, then add per-partition offsets.

    The offsets table has one row per PARTITION (bounded by cluster size,
    not data size), so the prefix sum is trivially small; range partitions
    are ordered by key, so partition id order == key order. This is the
    frontier's reference-FIFO discovery rank: (coarse, fine) =
    (parent_seq, ordinal) is globally unique (parents have unique global
    seq; ordinals are distinct within a parent), making the rank — and
    therefore the crawl ordering — deterministic at any parallelism."""
    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 1)
    parted = (
        df.repartitionByRange(n, F.col(coarse_col), F.col(fine_col))
        .withColumn("_gpid", F.spark_partition_id())
        # one materialization shared by the rank and the counts subtrees:
        # range-bound sampling must not run twice with different answers
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_gpid").orderBy(coarse_col, fine_col)
    ranked = parted.withColumn("_lrn", F.row_number().over(w_local))
    counts = parted.groupBy("_gpid").agg(F.count("*").alias("_n"))
    w_pre = (
        Window.orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_pre), F.lit(0))
    ).select("_gpid", "_off")
    return (
        ranked.join(F.broadcast(offsets), "_gpid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_gpid", "_lrn", "_off")
    )


# ---------------------------------------------------------------------------
# IP-level (per-server) politeness
# ---------------------------------------------------------------------------

# Multi-label public suffixes, vendored from the Mozilla Public Suffix
# List (publicsuffix.org — public data): the common ccTLD second levels
# plus the big shared-hosting/private-section suffixes. Under any of
# these, the registrable domain is the LAST THREE labels, not two —
# without this, every site under co.uk (or github.io) shares one
# synthetic server IP and one politeness budget. A full 10k-entry PSL
# (wildcard/exception rules included) slots in via
# `registrable_domain_psl` as a broadcast dim join; this static subset
# keeps the hot path a pure codegen expression with an exact SQL twin.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    # United Kingdom / Ireland
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    # Japan / Korea / Taiwan / Hong Kong / Singapore / SE Asia
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "lg.jp", "gr.jp",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id", "sch.id",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "co.th", "in.th", "or.th", "go.th", "ac.th",
    # China / India
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "res.in", "nic.in",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "co.ve", "com.cl", "com.ec", "com.uy", "com.bo",
    # Europe / Middle East / Africa
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.eg", "com.sa", "com.ae", "com.qa", "com.kw", "com.lb",
    "com.pk", "com.bd", "com.np", "com.lk",
    "com.ng", "com.gh", "co.ke", "or.ke", "ac.ke", "co.tz", "co.ug",
    "com.et", "co.zw", "com.na", "co.bw",
    # shared-hosting / private-section suffixes (each tenant is an
    # independent site and deserves its own budget only if the HOSTER
    # does; grouping tenants under one IP budget matches reality —
    # they DO share servers — but the PSL private section marks these
    # as per-tenant registrable, and mirroring it keeps host-level
    # analytics (mirrors, domain caps) from merging unrelated sites)
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "pages.dev", "workers.dev", "wordpress.com", "readthedocs.io",
    "onrender.com", "fly.dev", "neocities.org",
)


def registrable_domain(host: "F.Column") -> "F.Column":
    """Registrable domain of a hostname: last two dot-labels, or last
    THREE when the two-label tail is a known multi-label public suffix
    ('shop.foo.co.uk' -> 'foo.co.uk', 'a.b.site.test' -> 'site.test');
    single-label hosts pass through. The suffix check is a static InSet
    over MULTI_LABEL_SUFFIXES — one codegen projection, no join; swap
    in `registrable_domain_psl` for a full user-supplied PSL table."""
    # strip a trailing root-label dot first: 'a.example.com.' must group
    # with 'b.example.com' (an FQDN-spelling farm would otherwise get a
    # budget per subdomain)
    host_nd = F.regexp_replace(host, r"\.$", "")
    ext2 = F.regexp_extract(host_nd, r"([^.]+\.[^.]+)$", 1)
    ext3 = F.regexp_extract(host_nd, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    # fall back to the (dot-stripped) host whenever the extract misses
    # (single-label hosts, empty labels): mapping every miss to ''
    # would collapse unrelated hosts onto ONE synthetic server ip — and
    # one shared politeness budget
    return (
        F.when(ext2.isin(*MULTI_LABEL_SUFFIXES) & (ext3 != ""), ext3)
        .when(ext2 != "", ext2)
        .otherwise(host_nd)
    )


def registrable_domain_psl(
    frontier: DataFrame, psl: DataFrame, host_col: str = "host",
    out_col: str = "registrable_domain", max_labels: int = 5,
) -> DataFrame:
    """Full-PSL registrable domains via broadcast dim join — the scale
    path for a user-vendored publicsuffix.org table `psl(suffix string,
    is_exception boolean)` (wildcard rules pre-expanded or listed as
    their literal parents; exception rules flagged). Longest-match
    semantics: each host emits its last 1..max_labels label tails, the
    tails broadcast-join the suffix dim, and the registrable domain is
    one label more than the longest matching suffix (the PSL algorithm).
    Exception rules match as themselves. The domain is a pure function
    of the host, so it is computed once per DISTINCT host and joined
    back onto the frontier — duplicate frontier rows keep their
    multiplicity and non-groupable column types (maps) pass through
    untouched (round-5 ADVICE #2; the previous all-columns groupBy
    collapsed duplicates and failed on map columns), and the explode +
    dim join run over the host dimension, not the full frontier."""
    host_nd = F.regexp_replace(F.col(host_col), r"\.$", "")
    labels = F.split(host_nd, r"\.")
    n = F.size(labels)
    # tails[k] = last (k+1) labels joined, k = 0..max_labels-1
    tails = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda k: F.array_join(
            F.slice(labels, n - k + 1, k), "."),
    )
    hosts = frontier.select(F.col(host_col)).distinct()
    exploded = hosts.withColumn("_host_nd", host_nd).withColumn(
        "_tail", F.explode(tails))
    hit = exploded.join(
        F.broadcast(psl.select(F.col("suffix").alias("_tail"),
                               "is_exception")),
        "_tail", "left")
    # PSL prevailing-rule order: ANY matching exception beats every
    # regular rule (so a pre-expanded wildcard row for the same suffix
    # cannot out-rank its exception); among regular rules the longest
    # wins; no match at all -> the implicit '*' rule (suffix length 1).
    # Encoded as max(struct(exception?, matched-tail labels)).
    mlen = F.size(F.split(F.col("_tail"), r"\."))
    cand = (F.when(F.col("is_exception").isNull(),
                   F.struct(F.lit(0).alias("exc"), F.lit(1).alias("len")))
            .when(F.col("is_exception"),
                  F.struct(F.lit(1).alias("exc"), mlen.alias("len")))
            .otherwise(F.struct(F.lit(0).alias("exc"), mlen.alias("len"))))
    scored = hit.withColumn("_cand", cand)
    best = (scored.groupBy(host_col, "_host_nd")
            .agg(F.max("_cand").alias("_best")))
    labels_b = F.split(F.col("_host_nd"), r"\.")
    n_b = F.size(labels_b)
    # an exception rule IS the registrable domain (its public suffix is
    # the exception minus its leftmost label); a regular/implicit match
    # keeps one label more than the suffix
    take = F.when(F.col("_best.exc") == 1, F.col("_best.len")).otherwise(
        F.least(F.col("_best.len") + 1, n_b))
    dom = best.withColumn(
        out_col,
        F.array_join(F.slice(labels_b, n_b - take + 1, take), "."),
    ).drop("_best", "_host_nd")
    # inner join: a host that produced no tail rows (null host) dropped
    # out of the old explode too — multiplicity of every surviving
    # frontier row is preserved exactly
    return frontier.join(dom, host_col)


def resolve_server_ips(
    frontier: DataFrame, host_col: str = "host",
    out_col: str = "server_ip",
) -> DataFrame:
    """Deterministic DNS stand-in: every registrable domain maps to one
    synthetic IPv4 in 10/8, so sibling subdomains (cdn1.x.test,
    www.x.test) land on the SAME server address — the shared-hosting
    shape real crawlers must throttle on (politeness per server, not
    just per hostname, or 100 vanity subdomains hammer one box with
    100x the budget). Pure codegen projection (one md5 + integer
    arithmetic), no network; a real resolver would replace this column
    via a broadcast host->ip dim without touching downstream operators.
    The arithmetic is bit-exact in DuckDB (portable_hash64) so the
    scheduler's oracle replays it."""
    from linkinator_spark.functions.text import portable_hash64

    h = portable_hash64(registrable_domain(F.col(host_col)), prefix="dns:")
    v = F.pmod(h, F.lit(1 << 24))
    ip = F.concat_ws(
        ".", F.lit("10"),
        F.floor(v / 65536).cast("int").cast("string"),
        F.pmod(F.floor(v / 256).cast("bigint"), F.lit(256))
         .cast("int").cast("string"),
        F.pmod(v, F.lit(256)).cast("int").cast("string"),
    )
    return frontier.withColumn(out_col, ip)


def registrable_domain_sql(host_expr: str) -> str:
    """DuckDB twin of `registrable_domain` (shared definition site:
    both walk MULTI_LABEL_SUFFIXES)."""
    nd = f"regexp_replace({host_expr}, '\\.$', '')"
    e2 = f"regexp_extract({nd}, '([^.]+\\.[^.]+)$', 1)"
    e3 = f"regexp_extract({nd}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    suf = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    return (f"case when {e2} in ({suf}) and {e3} <> '' then {e3} "
            f"when {e2} <> '' then {e2} else {nd} end")


def server_ip_sql(host_expr: str) -> str:
    """DuckDB twin of `resolve_server_ips`' ip column."""
    from linkinator_spark.functions.text import portable_hash64_sql

    rdom = registrable_domain_sql(host_expr)
    h = portable_hash64_sql(rdom, prefix="dns:")
    v = f"(({h}) % 16777216)"
    return (f"concat('10.', cast(cast(floor({v} / 65536) as int) as varchar),"
            f" '.', cast(cast(floor({v} / 256) as bigint) % 256 as varchar),"
            f" '.', cast({v} % 256 as varchar))")


def politeness_take_ip(
    frontier: DataFrame, budget: int,
    host_col: str = "host", url_col: str = "url",
) -> DataFrame:
    """Per-SERVER fetch budget: rank candidates within each resolved
    server IP by (host, url) FIFO and keep `budget` per IP. The rank
    runs through `hierarchical_row_number` (rank within (ip, host)
    stripes + per-host offsets), so a server fronting thousands of
    subdomains — the hot-key case this operator exists for — never
    serializes into one window task. Output = input + server_ip +
    ip_rank, identical to the naive single-window answer."""
    df = resolve_server_ips(frontier, host_col=host_col)
    ranked = hierarchical_row_number(
        df, "server_ip", host_col, url_col, out_col="ip_rank")
    return ranked.filter(F.col("ip_rank") <= budget)


# ---------------------------------------------------------------------------
# AIMD adaptive per-host delay
# ---------------------------------------------------------------------------

def adaptive_host_delay(
    fetches: DataFrame, base_ms: int = 1000, max_ms: int = 60_000,
    dec_ms: int = 250,
    host_col: str = "host", seq_col: str = "seq",
    throttle_col: str = "throttle",
) -> DataFrame:
    """Congestion-controlled per-host delay from the fetch history:
    multiplicative increase on throttle signals (429/5xx — delay
    doubles, capped at `max_ms`), additive decrease on success (minus
    `dec_ms`, floored at `base_ms`) — TCP's AIMD shape inverted for
    politeness, replayed deterministically over each host's fetch
    sequence. The output feeds the same per-host delay gate as
    retry-after and robots Crawl-delay (max-wins), turning a static
    budget into one that backs off from struggling servers and recovers
    on sustained success.

    Input contract: one row per fetch with an integer 0/1
    `throttle_col` and a PER-HOST-UNIQUE `seq_col` ordering the events
    (ties would make the fold nondeterministic). Output per host:
    (host, delay_ms, n_throttle, n_events).

    Scale shape: ONE map-side-combined groupBy(host); the fold runs as
    a codegen higher-order aggregate over the collected event-flag
    array — sequential semantics genuinely need the host's history in
    one place, and that history is bounded by the politeness budget x
    epochs (the same bound as politeness_take_heap's per-host group),
    NOT by frontier size. A host's array holds 1-byte flags; 10^6
    fetches against one host is a ~1 MB array. The DuckDB twin replays
    the identical fold via list_reduce.
    """
    t = F.col(throttle_col).cast("int")
    ev = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col(seq_col).alias("s"), t.alias("t")))),
        lambda s: s["t"])
    base, mx = F.lit(int(base_ms)).cast("long"), F.lit(int(max_ms))
    fold = F.aggregate(
        ev, base,
        lambda acc, x: F.when(x == 1, F.least(mx.cast("long"), acc * 2))
        .otherwise(F.greatest(base, acc - F.lit(int(dec_ms)))))
    return (fetches.groupBy(F.col(host_col).alias("host"))
            .agg(fold.alias("delay_ms"),
                 F.sum(t).cast("long").alias("n_throttle"),
                 F.count(F.lit(1)).cast("long").alias("n_events")))


def adaptive_host_delay_sql(
    fetches_rel: str, base_ms: int = 1000, max_ms: int = 60_000,
    dec_ms: int = 250,
) -> str:
    """DuckDB twin of :func:`adaptive_host_delay`: `fetches_rel` must
    yield (host, s, t) with t an integer 0/1 throttle flag and s the
    per-host-unique order."""
    return f"""
        select host,
               list_reduce(
                 list_prepend(cast({base_ms} as bigint),
                              list(cast(t as bigint) order by s, t)),
                 (a, b) -> case when b = 1
                                then least({max_ms}, a * 2)
                                else greatest({base_ms}, a - {dec_ms}) end
               ) as delay_ms,
               cast(sum(t) as bigint) as n_throttle,
               cast(count(*) as bigint) as n_events
        from ({fetches_rel}) group by host
    """
