"""Deterministic corpus splitting and sampling for training pipelines.

Reproducibility is the contract: both operators key on the portable
60-bit hash (functions/text.portable_hash64, bit-exact in DuckDB), so a
split/sample computed on one cluster — or recomputed after a reshuffle,
repartition, or re-ingest — selects exactly the same documents. Spark's
`sample`/`sampleBy` cannot promise that (partition-dependent RNG
streams); hash gating costs one codegen expression per row and no
shuffle at all for `hash_split`.

Scale notes: `hash_split` is pure whole-stage-codegen projection.
`stratified_sample_exact` needs a per-stratum rank; a hot stratum
(e.g. one language holding half a 10^10-doc corpus) would serialize a
naive `row_number() OVER (PARTITION BY stratum)` into one task, so the
rank runs through politeness.hierarchical_row_number over hash-bucket
stripes — bounded tasks, values identical to the naive window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import portable_hash64

DEFAULT_WEIGHTS = (("train", 98), ("val", 1), ("test", 1))


def split_expr(
    id_col: str = "doc_id", weights=DEFAULT_WEIGHTS, salt: str = "split",
):
    """The (bucket, split) column pair behind hash_split, as expressions —
    composable into a wider projection without a join."""
    total = sum(w for _, w in weights)
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    bucket = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), prefix=f"{salt}:"),
        F.lit(100),
    ).cast("int")
    expr = None
    edge = 0
    for name, w in weights:
        edge += w
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return bucket, expr


def hash_split(
    docs: DataFrame, id_col: str = "doc_id",
    weights=DEFAULT_WEIGHTS, salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label by hash bucket.

    `weights` are integer percents summing to 100, consumed in order:
    with the default 98/1/1, buckets 0-97 -> train, 98 -> val,
    99 -> test. Changing `salt` re-deals the split without touching the
    data. Output: input id column + (bucket int, split string)."""
    bucket, expr = split_expr(id_col, weights, salt)
    return docs.select(
        id_col, bucket.alias("bucket"), expr.alias("split"))


def stratified_sample_exact(
    docs: DataFrame, stratum_col: str, fraction: float,
    id_col: str = "doc_id", salt: str = "sample", stripes: int = 1024,
) -> DataFrame:
    """Exact-count stratified sample: from every stratum, keep exactly
    ceil(fraction * stratum_count) rows — the ones ranked first by the
    deterministic hash order. Unlike a per-row hash threshold (binomial
    counts) or `sampleBy` (nondeterministic under reshuffle), the chosen
    set is exact per stratum and bit-reproducible.

    The per-stratum rank is hierarchical (rank within hash-bucket
    stripes + per-stripe offsets), so a stratum holding most of the
    corpus never lands in one task. Output: (id, stratum, sample_rank).
    """
    from linkinator_spark.operators.politeness import hierarchical_row_number

    h = portable_hash64(F.col(id_col).cast("string"), prefix=f"{salt}:")
    keyed = docs.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        h.alias("_h"),
        F.pmod(h, F.lit(stripes)).alias("_stripe"),
    )
    ranked = hierarchical_row_number(
        keyed, "stratum", "_stripe", "_h", out_col="sample_rank")
    counts = keyed.groupBy("stratum").agg(F.count("*").alias("_n"))
    quota = F.ceil(F.col("_n") * F.lit(float(fraction))).cast("long")
    return (
        ranked.join(F.broadcast(counts.select("stratum", quota.alias("_q"))),
                    "stratum")
        .filter(F.col("sample_rank") <= F.col("_q"))
        .select("id", "stratum", "sample_rank")
    )


def pack_shards(
    docs: DataFrame, max_tokens: int, n_buckets: int = 1024,
    id_col: str = "doc_id", tokens_col: str = "n_tokens",
    salt: str = "pack",
) -> DataFrame:
    """Deterministic token-budget sharding (sequence-packing layout):
    assign each document to a shard so every shard's documents total
    roughly `max_tokens`, reproducibly across reshuffles and clusters.

    Documents are dealt into `n_buckets` independent streams by portable
    hash, ordered within the bucket by the same hash, and cut greedily:
    a document belongs to the shard where its running token sum starts
    (`floor((cumsum - tokens) / max_tokens)`), so shards are contiguous
    hash ranges and the whole layout is a pure function of (ids, token
    counts, salt).

    Scale: one shuffle, keyed by the hash bucket — 10^10 docs spread
    over n_buckets tasks of ~equal size (hash-uniform); the window
    cumsum is a single ordered pass per bucket, never a global sort.
    Output: (id, bucket, shard_seq, shard_id) where shard_id is unique
    across buckets (bucket * 2^48 + shard_seq: collision-free while a
    bucket totals < 2^48 * max_tokens tokens — at max_tokens=512 that is
    ~1.4e17 tokens per bucket, far past any corpus; n_buckets is capped
    at 2^15 so the product stays inside int64).
    """
    from pyspark.sql import Window

    if n_buckets > 32768:
        raise ValueError(
            f"n_buckets must be <= 32768 to keep shard_id in int64, "
            f"got {n_buckets}")
    h = portable_hash64(F.col(id_col).cast("string"), prefix=f"{salt}:")
    keyed = docs.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("_tok"),
        h.alias("_h"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("_h", "id")
    cum = F.sum("_tok").over(w)
    shard_seq = F.floor((cum - F.col("_tok"))
                        / F.lit(int(max_tokens))).cast("long")
    return keyed.select(
        "id", "bucket",
        shard_seq.alias("shard_seq"),
        (F.col("bucket").cast("long") * F.lit(2 ** 48)
         + shard_seq).alias("shard_id"),
    )


def domain_cap(
    docs: DataFrame, cap: int, domain_col: str = "source",
    id_col: str = "doc_id", score_col: str | None = None,
    salt: str = "cap", stripes: int = 64,
) -> DataFrame:
    """Per-domain quota: keep at most `cap` documents per domain — the
    C4/RefinedWeb-style rule that stops one boilerplate-heavy host from
    dominating a training corpus. With `score_col` (any numeric column,
    e.g. a quality score or n_chars) the `cap` BEST rows per domain
    survive (score desc); without it the choice is the deterministic
    portable-hash order (random-but-reproducible, like a hash-seeded
    reservoir). Ties always break on the hash, so the kept set is a pure
    function of (ids, scores, salt) — bit-stable across reshuffles and
    clusters, which `Window.orderBy(rand())` cannot promise.

    Scale shape — two-phase exact top-K, same family as the politeness
    budget: a naive `row_number() OVER (PARTITION BY domain)` serializes
    a hot domain (10^7 docs from one host) into one task. Phase 1 ranks
    within (domain, hash-stripe) and keeps `cap` per stripe — tasks
    bounded by the stripe share of the domain; phase 2 ranks the
    survivors, at most cap*stripes rows per domain — bounded regardless
    of domain size. Any row with true rank <= cap has stripe-local rank
    <= cap, so phase 1 never evicts a winner and the output is IDENTICAL
    to the single-window form (asserted by tests).

    Output: (id, domain, cap_rank) for the kept rows, cap_rank in
    [1, cap] — join back on id to materialize the capped corpus.
    """
    from pyspark.sql import Window

    h = portable_hash64(F.col(id_col).cast("string"), prefix=f"{salt}:")
    keyed = docs.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        *([F.col(score_col).alias("_s")] if score_col else []),
        h.alias("_h"),
        F.pmod(h, F.lit(stripes)).alias("_stripe"),
    )
    order = ([F.desc("_s")] if score_col else []) + [F.asc("_h"), F.asc("id")]
    w1 = Window.partitionBy("domain", "_stripe").orderBy(*order)
    local = (keyed.withColumn("_r1", F.row_number().over(w1))
             .filter(F.col("_r1") <= cap))
    w2 = Window.partitionBy("domain").orderBy(*order)
    return (
        local.withColumn("cap_rank",
                         F.row_number().over(w2).cast("long"))
        .filter(F.col("cap_rank") <= cap)
        .select("id", "domain", "cap_rank")
    )


def exact_int_quantiles(
    df: DataFrame, value_col: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Exact discrete quantiles of an integer-valued column (doc lengths,
    token counts) — the thresholds a curation pass cuts on. For each q,
    the smallest value v whose cumulative count reaches ceil(q * n)
    (type-1 / lower discrete quantile). Exact, not approximate:
    `approx_percentile` drifts with sketch size and is not
    engine-reproducible; a global sort is the naive exact route and
    unaffordable.

    Scale shape: groupBy(value) partial-aggregates map-side, so the
    shuffle carries one partial count per (task, distinct value); the
    cumulative window then runs over the DISTINCT-VALUE table, bounded
    by the value domain (doc lengths, token counts ≈ 10^6 distinct),
    not the corpus — same bounded-single-task argument as the vocab
    top-v cut. Callers with genuinely unbounded domains bucket first.

    Output: (q double, value bigint), one row per requested quantile.
    """
    from pyspark.sql import Window

    counts = (
        df.groupBy(F.col(value_col).cast("bigint").alias("v"))
        .agg(F.count("*").alias("_c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("_cum", F.sum("_c").over(w))
    total = counts.agg(F.sum("_c").alias("_n"))
    q_lit = F.explode(F.array(
        *[F.lit(float(q)).cast("double") for q in qs])).alias("q")
    targets = total.select(q_lit, F.col("_n")).select(
        "q", F.ceil(F.col("q") * F.col("_n")).cast("bigint").alias("_t"))
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("_cum") >= F.col("_t"))
        .groupBy("q").agg(F.min("v").alias("value"))
    )


def mixture_sample(
    docs: DataFrame, target_rows: int, alpha: float = 0.5,
    domain_col: str = "lang", id_col: str = "doc_id",
    salt: str = "mix", stripes: int = 1024,
    with_replacement: bool = False,
) -> DataFrame:
    """Temperature-based domain mixture sampling: resample a corpus so
    domain d contributes ~ count_d^alpha / sum(count^alpha) of
    `target_rows` — the multilingual-LM mixing rule (Conneau & Lample
    2019 "Cross-lingual Language Model Pretraining" §3.1; mC4/T5 use the
    same exponent form). alpha=1 keeps natural proportions, alpha=0
    forces a uniform mixture, 0<alpha<1 up-weights rare domains without
    letting any one dominate.

    Determinism is exact end to end: the only float step is the
    per-domain micro-weight w_d = round(count_d^alpha * 1e6) (isolated
    per domain — no cross-domain float sum); W = sum(w_d) and the quota
    q_d = min(count_d, (target_rows * w_d) div W) are pure int64/decimal
    arithmetic, so quotas are bit-identical across engines, partition
    layouts, and reruns. Row selection inside a domain is the
    deterministic portable-hash order (the stratified-sample contract).

    Scale shape (100-TB lens): counts are a map-side-combined aggregate;
    the (domain, w, quota) table is one row per domain and broadcasts;
    the per-domain rank runs through hierarchical_row_number over hash
    stripes, so a domain holding half a 10^10-doc corpus never
    serializes into one task. One uniform (domain, stripe) shuffle, no
    global sort, nothing driver-side.

    Output without replacement (default): (id, domain, mix_rank, quota)
    for kept rows, mix_rank in [1, quota]; quotas sum to <= target_rows
    (floor division) and a rare domain is capped at its own size. With
    `with_replacement=True`: (id, domain, mix_rank, copy_idx) where an
    upsampled domain repeats — floor(target/count) full epochs plus one
    extra copy for the first (target mod count) rows in hash order — so
    each domain emits EXACTLY its target row count (the epoch-repeat
    materialization of temperature upsampling).
    """
    from linkinator_spark.operators.politeness import hierarchical_row_number

    h = portable_hash64(F.col(id_col).cast("string"), prefix=f"{salt}:")
    keyed = docs.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        h.alias("_h"),
        F.pmod(h, F.lit(stripes)).alias("_stripe"),
    )
    counts = keyed.groupBy("domain").agg(F.count("*").alias("_c"))
    weights = counts.withColumn(
        "_w", F.expr(f"cast(round(pow(_c, {float(alpha)!r}) * 1e6) as bigint)"))
    tot = weights.agg(F.sum("_w").alias("_tw"))
    targets = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn("_target", F.expr(
            f"cast((cast({int(target_rows)} as decimal(38,0)) *"
            " cast(_w as decimal(38,0))) div"
            " cast(_tw as decimal(38,0)) as bigint)"))
        .select("domain", "_c", "_target")
    )
    ranked = hierarchical_row_number(
        keyed, "domain", "_stripe", "_h", out_col="mix_rank")
    if not with_replacement:
        quota = targets.select(
            "domain", F.least("_c", "_target").alias("quota"))
        return (
            ranked.join(F.broadcast(quota), "domain")
            .filter(F.col("mix_rank") <= F.col("quota"))
            .select("id", "domain", "mix_rank", "quota")
        )
    # with replacement: a domain whose target exceeds its size repeats —
    # every row gets floor(target / count) epoch copies, and the first
    # (target mod count) rows in hash order get one more, so the emitted
    # row count equals the target EXACTLY (the standard epoch-repeat
    # materialization of temperature upsampling). copy_idx numbers a
    # row's copies 0..n-1; downsampled domains behave as before with
    # every kept row at copy_idx 0.
    reps = targets.select(
        "domain",
        (F.col("_target") / F.col("_c")).cast("bigint").alias("_epochs"),
        F.pmod("_target", F.col("_c")).alias("_rem"),
    )
    return (
        ranked.join(F.broadcast(reps), "domain")
        .withColumn("n_copies", F.col("_epochs") + F.when(
            F.col("mix_rank") <= F.col("_rem"), 1).otherwise(0))
        .filter(F.col("n_copies") > 0)
        .select("id", "domain", "mix_rank",
                F.explode(F.sequence(
                    F.lit(0).cast("bigint"),
                    F.col("n_copies") - 1)).alias("copy_idx"))
    )


def grouped_int_quantiles(
    df: DataFrame, group_col: str, value_col: str,
    qs=(0.25, 0.5, 0.75), resolution: int = 1,
) -> DataFrame:
    """Per-group exact discrete quantiles — `exact_int_quantiles` with a
    GROUP BY (per-language perplexity terciles, per-domain length cuts).
    For each (group, q): the smallest value v whose cumulative count
    within the group reaches ceil(q * n_group), after integer-dividing
    values by `resolution` (thresholds then live at that resolution —
    the knob that BOUNDS the distinct-value domain when the raw column
    is near-unique, e.g. micro-nat LM scores -> resolution=1000 caps
    the histogram at ~30k milli-nat buckets per group).

    Scale shape: the (group, bucket) histogram partial-aggregates
    map-side; the cumulative window partitions BY GROUP over the
    distinct-bucket table, so its tasks are bounded by the bucket
    domain (resolution-controlled), never by group row count — a
    language holding half the corpus costs the same window task as a
    rare one. Output: (group, q double, value bigint) where value is in
    resolution units (multiply back by `resolution` for a raw-scale
    threshold floor).
    """
    from pyspark.sql import Window

    counts = (
        df.groupBy(
            F.col(group_col).alias("grp"),
            # `div` is exact integral division (a double `/` + cast
            # loses precision past 2^53 and truncates instead of
            # flooring); values are required non-negative
            F.expr(f"cast({value_col} as bigint) div {int(resolution)}")
            .alias("v"),
        ).agg(F.count("*").alias("_c"))
    )
    w = (Window.partitionBy("grp").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = counts.withColumn("_cum", F.sum("_c").over(w))
    totals = counts.groupBy("grp").agg(F.sum("_c").alias("_n"))
    q_lit = F.explode(F.array(
        *[F.lit(float(q)).cast("double") for q in qs])).alias("q")
    targets = totals.select("grp", q_lit, "_n").select(
        "grp", "q", F.ceil(F.col("q") * F.col("_n")).cast("bigint").alias("_t"))
    return (
        cum.join(F.broadcast(targets), "grp")
        .filter(F.col("_cum") >= F.col("_t"))
        .groupBy("grp", "q").agg(F.min("v").alias("value"))
        .select(F.col("grp").alias(group_col), "q", "value")
    )
