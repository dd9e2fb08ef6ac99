"""BM25 lexical retrieval: scoring sanity, two-phase top-k equivalence,
determinism under reshuffle, OOV behavior."""

from pyspark.sql import functions as F

from linkinator_spark.functions.search import bm25_topk


def _corpus(spark):
    rows = [
        (0, "spark shuffle join spark spark"),
        (1, "spark window"),
        (2, "window window window sort"),
        (3, "totally unrelated words here"),
        (4, "spark"),
        (5, "sort merge sort merge join join join"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_ranks_rare_term_and_saturates(spark):
    docs = _corpus(spark)
    q = spark.createDataFrame(
        [("a", "spark"), ("b", "merge"), ("c", "nosuchterm")],
        "query_id string, term string")
    got = bm25_topk(docs, q, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    # OOV query returns nothing
    assert "c" not in by_q
    # 'merge' appears only in doc 5
    assert [r["doc_id"] for r in by_q["b"]] == [5]
    # 'spark' docs rank by tf with length normalization: doc 4 (tf=1 but
    # dl=1) beats doc 1 (tf=1, dl=2); doc 0 (tf=3 of dl=5) is first
    a = [r["doc_id"] for r in by_q["a"]]
    assert len(a) == 3 and a[0] == 0 and set(a) == {0, 1, 4}
    # ranks are 1..k and score_micro weakly decreasing
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score_micro"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_bm25_two_phase_equals_naive_window(spark):
    from pyspark.sql import Window

    # 400 docs from a tiny vocab so queries match many docs with ties
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.when(F.col("id") % 2 == 0, "alpha").otherwise("beta"),
            F.when(F.col("id") % 3 == 0, "alpha alpha").otherwise("gamma"),
            F.lit("filler"),
        ).alias("text"),
    )
    q = spark.createDataFrame(
        [("q", "alpha"), ("q", "gamma")], "query_id string, term string")
    got = bm25_topk(docs, q, k=17, stripes=5)
    # naive single-window form over the same integer scores
    scored = bm25_topk(docs, q, k=10**9, stripes=1)  # rank == naive rank
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id"))
    naive = (scored.select("query_id", "doc_id", "score_micro")
             .withColumn("rank", F.row_number().over(w).cast("long"))
             .filter(F.col("rank") <= 17))
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(got) == key(naive)
    # deterministic under physical layout
    again = bm25_topk(docs.repartition(7), q, k=17, stripes=64)
    assert key(again) == key(got)


def test_vocab_topk_counts_and_cut(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b c"), (1, "a b b z"), (2, "b c d")],
        "doc_id bigint, text string")
    from linkinator_spark.functions.search import vocab_topk

    got = {r["term"]: (r["freq"], r["doc_freq"], r["rank"])
           for r in vocab_topk(docs, v=3).collect()}
    assert got == {"a": (4, 2, 1), "b": (4, 3, 2), "c": (2, 2, 3)}


def test_exact_int_quantiles_match_sorted_definition(spark):
    import math

    from linkinator_spark.functions.sampling import exact_int_quantiles

    vals = [1] * 10 + [5] * 30 + [9] * 50 + [100] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["q"]: r["value"]
           for r in exact_int_quantiles(df, "x",
                                        qs=(0.05, 0.1, 0.4, 0.9, 1.0)).collect()}
    s = sorted(vals)
    expect = {q: s[math.ceil(q * len(s)) - 1] for q in (0.05, 0.1, 0.4, 0.9, 1.0)}
    assert got == expect


def test_phrase_search_basic_and_repeats(spark):
    from linkinator_spark.functions.search import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown cat then the quick brown fox again"),
            (2, "brown quick fox"),                 # right terms, wrong order
            (3, "the quick BROWN   fox!"),          # case/punct normalize
            (4, "buffalo buffalo buffalo"),         # repeated-term phrase
            (5, "buffalo buffalo"),                 # too short for it
        ],
        "doc_id bigint, text string")
    phrases = spark.createDataFrame(
        [(10, "quick brown fox"), (11, "buffalo buffalo buffalo")],
        "phrase_id bigint, phrase string")
    got = {(r["phrase_id"], r["doc_id"]): (r["n_hits"], r["first_pos"])
           for r in phrase_search(docs, phrases).collect()}
    assert got == {
        (10, 0): (1, 1),   # 'quick' at pos 1
        (10, 1): (1, 5),
        (10, 3): (1, 1),
        (11, 4): (1, 0),
    }


def test_phrase_search_multiple_hits_counted(spark):
    from linkinator_spark.functions.search import phrase_search

    docs = spark.createDataFrame(
        [(0, "a b a b a b")], "doc_id bigint, text string")
    phrases = spark.createDataFrame(
        [(1, "a b")], "phrase_id bigint, phrase string")
    [r] = phrase_search(docs, phrases).collect()
    assert (r["n_hits"], r["first_pos"]) == (3, 0)
