"""Bigram LM perplexity filter contract (functions/lm.lm_nll):

* hand-computed micro-nat scores on a tiny corpus match exactly
  (training counts, add-alpha smoothing, rounding, tf-weighted sum)
* unseen contexts degrade to the uniform prior, never divide by zero
* fluent (in-domain) text scores lower nll than out-of-vocabulary text
* short docs (<2 tokens) yield the zero row, not a dropped row
* every input doc appears exactly once; ppl == exp(avg_nll)
"""

import math

import pyspark.sql.functions as F
import pytest

from linkinator_spark.functions import lm as LM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "z z"), (12, "a")], "doc_id long, text string")
    return train, docs


def test_hand_computed_micro_nats(tiny):
    train, docs = tiny
    rows = {r.doc_id: r for r in LM.lm_nll(train, docs, alpha=0.5).collect()}
    # train: unigrams a:3 b:2 c:1 (V=3); bigrams "a b":2 "b a":1 "a c":1
    # doc 10 "a b": p = (2+.5)/(3+.5*3) = 2.5/4.5
    exp10 = round(-math.log(2.5 / 4.5) * 1e6)
    assert rows[10].n_bigrams == 1 and rows[10].nll_micro == exp10
    assert rows[10].avg_nll_micro == exp10
    # doc 11 "z z": unseen context -> p = .5/(0+1.5) = 1/3 (uniform 1/V)
    exp11 = round(-math.log(0.5 / 1.5) * 1e6)
    assert rows[11].nll_micro == exp11
    # doc 12 "a": no bigrams -> zero row, ppl 1
    assert (rows[12].n_bigrams, rows[12].nll_micro,
            rows[12].avg_nll_micro, rows[12].ppl) == (0, 0, 0, 1.0)


def test_likely_bigram_scores_below_oov(spark):
    # the synthetic documents are a 31-word soup, so "fluent English"
    # means nothing to this LM — probe with its own most frequent
    # training bigram (high p) vs fully OOV tokens (uniform 1/V)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    top = (
        train.select(F.explode(
            LM.word_bigrams(F.col("text"))).alias("g"))
        .groupBy("g").count().orderBy(F.desc("count"), "g").limit(1)
        .collect()[0].g
    )
    probe = spark.createDataFrame(
        [(900001, top), (900002, "zqx vbnk")], "doc_id long, text string")
    rows = {r.doc_id: r for r in LM.lm_nll(train, probe).collect()}
    assert rows[900001].avg_nll_micro < rows[900002].avg_nll_micro
    # OOV context degrades to exactly the uniform prior ln(V)
    import math
    v = (train.select(F.explode(F.split(
        LM.normalize_text(F.col("text")), " ")).alias("w"))
         .select("w").distinct().count())
    assert rows[900002].avg_nll_micro == round(math.log(v) * 1e6)


def test_covers_all_docs_and_ppl_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = LM.lm_nll(docs.filter(F.col("doc_id") % 2 == 0), docs).cache()
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    bad = out.filter(
        F.abs(F.col("ppl") - F.exp(F.col("avg_nll_micro") / 1e6)) > 1e-9)
    assert bad.isEmpty()
    # tf weighting: every scored doc has n_bigrams = token count - 1
    toks = docs.select(
        "doc_id",
        (F.size(F.split(F.trim(F.regexp_replace(F.lower("text"),
                                                r"\s+", " ")), " ")) - 1
         ).alias("want"))
    joined = out.join(toks, "doc_id").filter(
        (F.col("want") > 0) & (F.col("n_bigrams") != F.col("want")))
    assert joined.isEmpty()


# ------------------------------------------------------- ppl_bucket (CCNet)


def test_grouped_int_quantiles_matches_python(spark):
    from linkinator_spark.functions.sampling import grouped_int_quantiles

    rows = [("en", v) for v in range(100)] + [("de", v * 3) for v in range(10)]
    df = spark.createDataFrame(rows, "lang string, v long")
    got = {(r["lang"], r["q"]): r["value"]
           for r in grouped_int_quantiles(df, "lang", "v",
                                          qs=(0.33, 0.67)).collect()}
    import math

    def twin(vals, q):
        vals = sorted(vals)
        return vals[math.ceil(q * len(vals)) - 1]

    en = list(range(100))
    de = [v * 3 for v in range(10)]
    assert got[("en", 0.33)] == twin(en, 0.33)
    assert got[("en", 0.67)] == twin(en, 0.67)
    assert got[("de", 0.33)] == twin(de, 0.33)
    assert got[("de", 0.67)] == twin(de, 0.67)
    # resolution buckets values before the quantile
    got_r = {(r["lang"], r["q"]): r["value"]
             for r in grouped_int_quantiles(df, "lang", "v", qs=(0.5,),
                                            resolution=10).collect()}
    assert got_r[("en", 0.5)] == twin([v // 10 for v in en], 0.5)


def test_ppl_bucket_terciles_and_per_language_cut(spark):
    # two languages with disjoint vocab; within each, planted repetitive
    # (fluent-to-the-LM) docs and OOV docs
    import itertools

    rows = []
    i = 0
    for lang, base in (("en", "the cat sat on the mat"),
                       ("de", "der hund lief im park")):
        for rep, suffix in itertools.product(
                range(10), ["", " xq" + "z", " vv ww"]):
            rows.append((i, f"{base} {rep % 3}{suffix}", lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    out = LM.ppl_bucket(train, docs, alpha=0.5).collect()
    assert len(out) == len(rows)
    per = {}
    for r in out:
        per.setdefault((r["lang"], r["bucket"]), 0)
        per[(r["lang"], r["bucket"])] += 1
    # every language has all three buckets, split ~evenly (exact terciles
    # up to threshold ties at milli-nat resolution)
    for lang in ("en", "de"):
        counts = [per.get((lang, b), 0) for b in ("head", "middle", "tail")]
        assert sum(counts) == 30
        assert all(c > 0 for c in counts)
        # head must hold at least its tercile (ties can only grow it)
        assert counts[0] >= 10
    # the cut is per-language: buckets exist in BOTH languages even though
    # all de docs are OOV-heavier under a shared threshold this would skew
    assert per.get(("de", "head"), 0) > 0


def test_ppl_bucket_head_is_more_fluent(spark):
    # fluent docs = repeats of the training phrase; junk docs = unique
    # token soup. The head bucket must contain fluent docs only.
    rows = [(i, "alpha beta gamma delta", "en") for i in range(12)]
    rows += [(100 + i, f"junk{i} tok{i * 7} w{i * 13} q{i * 31}", "en")
             for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = docs.filter(F.col("doc_id") < 6)  # train on fluent half only
    out = {r["doc_id"]: r["bucket"]
           for r in LM.ppl_bucket(train, docs, alpha=0.5).collect()}
    assert all(out[i] == "head" for i in range(12))
    assert all(out[100 + i] != "head" for i in range(12))
