"""BM25 keyword retrieval over a document corpus.

The text-side complement of the ANN operators (similarity.py): given a
small set of keyword queries, return the top-k documents per query under
BM25 (Robertson/Sparck Jones; the Lucene-style `ln(1 + (N-df+.5)/(df+.5))`
idf that stays positive). This is the lexical retrieval step a training
pipeline uses for targeted corpus audits ("show me the docs about X"),
eval-set curation, and hard-negative mining next to embedding search.

Scale shape (100-TB lens):
- The query-term dictionary is broadcast and semi-joins the exploded
  corpus tokens BEFORE any aggregation, so the only shuffled rows are
  (doc, term) pairs for terms that appear in some query — the corpus
  vocabulary never shuffles.
- Document frequency and corpus stats (N, avgdl) are one tiny aggregate
  each, broadcast back; no corpus-sized join keys off the uniform doc id.
- Scores are integer micro-points: each per-term contribution rounds to
  1e-6 before the sum, so the total is an exact int64 — summation order
  (and therefore the top-k cut) is identical on any engine or partition
  layout, which a float sum cannot promise.
- The per-query top-k is the two-phase stripe rank (same family as
  sampling.domain_cap / the politeness budget): a query matching 10^8
  docs never serializes into one window task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import portable_hash64

WORD_RE = "[a-z0-9]+"


def bm25_topk(
    docs: DataFrame, queries: DataFrame, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
    id_col: str = "doc_id", text_col: str = "text",
    query_id_col: str = "query_id", term_col: str = "term",
    stripes: int = 64,
) -> DataFrame:
    """Top-k docs per query by BM25.

    `queries` is (query_id, term) — one row per query term (duplicate
    terms within a query are deduplicated; BM25 term saturation already
    handles within-doc repetition). Output: (query_id, doc_id,
    score_micro, rank) with rank in [1, k]; `score_micro` is the BM25
    score in integer micro-points (sum of per-term contributions each
    rounded at 1e-6 — exact, order-independent, rank-stable).
    """
    from pyspark.sql import Window

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.lower(F.col(term_col)).alias("term"),
    ).distinct()
    vocab = qterms.select("term").distinct()

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        .alias("_toks"),
    ).select("id", "_toks", F.size("_toks").alias("dl"))

    # broadcast-prune to query terms BEFORE the (doc, term) aggregation:
    # the corpus vocabulary never reaches a shuffle
    tf = (
        toks.select("id", "dl", F.explode("_toks").alias("term"))
        .join(F.broadcast(vocab), "term", "semi")
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = toks.agg(F.count("*").alias("n"),
                     F.avg("dl").alias("avgdl"))

    idf = F.log(F.lit(1.0)
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    contrib = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select("id", "term",
                F.round(idf * tf_norm * 1e6, 0).cast("long").alias("_c"))
    )
    scored = (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "id")
        .agg(F.sum("_c").alias("score_micro"))
    )

    # two-phase exact top-k per query (see module doc): identical output
    # to row_number() OVER (PARTITION BY query_id ORDER BY score desc, id)
    h = F.pmod(portable_hash64(F.col("id").cast("string"), prefix="bm25:"),
               F.lit(stripes))
    order = [F.desc("score_micro"), F.asc("id")]
    w1 = Window.partitionBy("query_id", "_stripe").orderBy(*order)
    local = (scored.withColumn("_stripe", h)
             .withColumn("_r1", F.row_number().over(w1))
             .filter(F.col("_r1") <= k))
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("doc_id"),
                "score_micro", "rank")
    )


def vocab_topk(
    docs: DataFrame, v: int = 10_000,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the `v` most frequent word tokens with term
    frequency and document frequency — the tokenizer-training /
    stopword-curation primitive. Output: (term, freq, doc_freq, rank),
    rank 1..v by freq desc (ties: term asc).

    Scale shape: token counting is explode -> groupBy(term) with map-side
    partial aggregation, so a Zipf-hot term ("the" in 10^10 docs)
    arrives at its reducer as one partial count per upstream task, never
    as raw rows; doc_freq goes through a distinct (doc, term) pass keyed
    on the uniform pair. The top-v cut is TakeOrdered (per-partition
    heaps merged on the driver, bounded by v), never a global sort; the
    rank window then runs over <= v rows — driver and single-task state
    are bounded by the requested vocabulary size, not the corpus.
    """
    from pyspark.sql import Window

    terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(WORD_RE), 0)).alias("term"),
    )
    counts = (
        terms.groupBy("term")
        .agg(F.count("*").alias("freq"),
             F.countDistinct("id").alias("doc_freq"))
    )
    top = counts.orderBy(F.desc("freq"), F.asc("term")).limit(v)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))  # <= v rows
    return top.select(
        "term", "freq", "doc_freq",
        F.row_number().over(w).cast("long").alias("rank"))


def inverted_index(
    docs: DataFrame, min_df: int = 1, salt: int = 16,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Positional inverted index: one row per term with its full posting
    list — the index-construction primitive behind BM25 serving, corpus
    audit tooling, and phrase search. Output: (term, df, total_tf,
    postings array<string>) where each entry is
    ``%012d@p1.p2.p3`` — the zero-padded doc id, '@', the ascending
    0-based token positions '.'-joined — and the array is in ascending
    doc order (zero padding makes lexical order == numeric order, so the
    merge is a plain `array_sort`).

    Scale shape (100-TB lens): the classic MapReduce index-build hot-key
    problem is the stopword — "the" appears in ~every doc, so a naive
    groupBy(term).collect_list serializes a corpus-sized posting list
    through one reducer. Three phases avoid that:
      1. (term, doc) partial aggregate — keys are uniform pairs, map-side
         combined, and each group is one doc's positions (bounded by
         doc length);
      2. (term, hash(doc) % salt) bucket collect — a hot term's postings
         spread across `salt` reducers, each holding 1/salt of the list;
      3. per-term merge of <= `salt` pre-built arrays — the only
         term-keyed shuffle moves one partial array per bucket, not one
         row per posting.
    The final per-term array is necessarily materialized (that IS the
    output format); for serving, shard the index by `pmod(hash(term),
    n_shards)` instead of merging to one row — phase 3 then becomes the
    shard writer. `min_df` prunes hapax noise before the merge.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(WORD_RE), 0)).alias("pos", "term"),
    )
    per_doc = (
        toks.groupBy("term", "id")
        .agg(F.count("*").alias("tf"),
             F.array_sort(F.collect_list("pos")).alias("_ps"))
        .withColumn("_e", F.concat(
            F.format_string("%012d", F.col("id")), F.lit("@"),
            F.array_join(F.transform(
                F.col("_ps"), lambda p: p.cast("string")), ".")))
    )
    bucketed = per_doc.withColumn(
        "_b", F.pmod(portable_hash64(F.col("id").cast("string"),
                                     prefix="inv:"), F.lit(salt)))
    partial = (
        bucketed.groupBy("term", "_b")
        .agg(F.count("*").alias("_df"), F.sum("tf").alias("_tf"),
             F.array_sort(F.collect_list("_e")).alias("_pl"))
    )
    merged = (
        partial.groupBy("term")
        .agg(F.sum("_df").alias("df"), F.sum("_tf").alias("total_tf"),
             F.array_sort(F.flatten(F.collect_list("_pl")))
             .alias("postings"))
    )
    return merged.filter(F.col("df") >= min_df)


def phrase_search(
    docs: DataFrame, phrases: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    phrase_id_col: str = "phrase_id", phrase_col: str = "phrase",
) -> DataFrame:
    """Exact phrase query over positional tokens: (phrase_id, doc_id,
    n_hits, first_pos) for every document containing the phrase's terms
    consecutively, in order. The positional complement of bm25_topk —
    the "find this exact passage" primitive behind corpus audits,
    quotation tracing, and contamination spot-checks.

    Algorithm: a token at (doc, pos) matching phrase term at offset k
    votes for candidate start `pos - k`; a start where the number of
    DISTINCT matched offsets equals the phrase length is a hit (repeated
    terms inside a phrase work: each position can vote for several
    offsets, but a full hit still needs every offset present).

    Scale shape (100-TB lens): the exploded phrase-term dictionary is
    tiny and broadcast; the semi-join keeps only corpus tokens whose
    term appears in some phrase, so the corpus vocabulary never
    shuffles. The (phrase, doc, start) group key is uniform (doc ids
    dominate), both aggregates partial-combine map-side, and nothing is
    driver-side or per-row Python.
    """
    pterms = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(phrase_col)),
                                 F.lit(WORD_RE), 0)).alias("k", "term"),
    )
    plens = pterms.groupBy("phrase_id").agg(
        F.count_distinct("k").alias("_plen"))
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(WORD_RE), 0)).alias("pos", "term"),
    )
    votes = toks.join(F.broadcast(pterms), "term").select(
        "phrase_id", "doc_id", (F.col("pos") - F.col("k")).alias("start"),
        "k",
    ).filter(F.col("start") >= 0)
    hits = (
        votes.groupBy("phrase_id", "doc_id", "start")
        .agg(F.count_distinct("k").alias("_nk"))
        .join(F.broadcast(plens), "phrase_id")
        .filter(F.col("_nk") == F.col("_plen"))
    )
    return (
        hits.groupBy("phrase_id", "doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"),
             F.min("start").cast("long").alias("first_pos"))
    )


def phrase_search_oracle_sql(docs_rel: str, phrases_rel: str) -> str:
    """DuckDB twin of `phrase_search`: `docs_rel` yields (doc_id, text),
    `phrases_rel` yields (phrase_id, phrase)."""
    return f"""
        with pterms as (
          select phrase_id, ts[i] as term, i - 1 as k
          from (select phrase_id,
                       regexp_extract_all(lower(phrase), '[a-z0-9]+') as ts
                from ({phrases_rel})),
               lateral (select unnest(range(1, len(ts) + 1)) as i)
        ),
        plens as (
          select phrase_id, count(distinct k) as plen
          from pterms group by phrase_id
        ),
        toks as (
          select doc_id, ts[i] as term, i - 1 as pos
          from (select doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') as ts
                from ({docs_rel})),
               lateral (select unnest(range(1, len(ts) + 1)) as i)
        ),
        votes as (
          select pterms.phrase_id, toks.doc_id,
                 toks.pos - pterms.k as start, pterms.k
          from toks join pterms using (term)
          where toks.pos - pterms.k >= 0
        ),
        hits as (
          select phrase_id, doc_id, start
          from votes
          group by phrase_id, doc_id, start
          having count(distinct k) = (select plen from plens
                                      where plens.phrase_id = votes.phrase_id)
        )
        select phrase_id, doc_id,
               cast(count(*) as bigint) as n_hits,
               cast(min(start) as bigint) as first_pos
        from hits group by phrase_id, doc_id
    """
