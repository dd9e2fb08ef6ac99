"""Distributed BPE merge-table training (functions/tokenize.py
bpe_train): learned merges vs an independent pure-Python reference
trainer, the unrolled DuckDB oracle twin, determinism, and composition
with the apply side (bpe_token_count).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from linkinator_spark.functions import tokenize as TK

CORPUS = [
    "the cat sat on the mat",
    "the cats eat the fish",
    "a cat and a rat ate the oats",
    "that hat is the cat's hat",
    "rats and cats chat",
]


def ref_train(texts, n_merges):
    """Independent reference: dict-based Sennrich trainer."""
    import re
    from collections import Counter
    vocab = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    out = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += vocab[w]
        if not pairs:
            break
        # count desc, then pair lexicographic asc
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, l + r, cnt))
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out, syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(CORPUS)], "doc_id string, text string")


def test_matches_reference_trainer(spark, docs):
    merges, vocab = TK.bpe_train(TK.word_vocab(docs), n_merges=12)
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    want, ref_syms = ref_train(CORPUS, 12)
    assert got == want
    # final symbolization agrees word-for-word
    got_syms = {r["word"]: list(r["sym"]) for r in vocab.collect()}
    assert got_syms == ref_syms


def test_oracle_sql_twin(spark, docs):
    merges, _ = TK.bpe_train(TK.word_vocab(docs), n_merges=8)
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    con = duckdb.connect()
    con.execute("create table documents(doc_id varchar, text varchar)")
    con.executemany("insert into documents values (?, ?)",
                    [(str(i), t) for i, t in enumerate(CORPUS)])
    oracle = con.execute(TK.bpe_train_oracle_sql(8)).fetchall()
    assert [tuple(r) for r in oracle] == got


def test_deterministic_under_repartition(spark, docs):
    a, _ = TK.bpe_train(TK.word_vocab(docs), n_merges=6)
    b, _ = TK.bpe_train(
        TK.word_vocab(docs.repartition(7).orderBy(F.rand(3))), n_merges=6)
    assert a.orderBy("rank").collect() == b.orderBy("rank").collect()


def test_learned_merges_compress(spark, docs):
    """Applying the learned table through the existing apply side
    yields fewer tokens than characters and no fewer than words."""
    merges, _ = TK.bpe_train(TK.word_vocab(docs), n_merges=12)
    table = tuple((r["left"], r["right"])
                  for r in merges.orderBy("rank").collect())
    counted = docs.select(
        TK.bpe_token_count(F.col("text"), merges=table).alias("bpe"),
        F.size(F.split(F.regexp_replace(F.lower("text"), "[^a-z]", ""),
                       "")).alias("chars"),
        F.size(F.expr(
            "regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("words"),
    ).agg(F.sum("bpe").alias("b"), F.sum("chars").alias("c"),
          F.sum("words").alias("w")).collect()[0]
    assert counted["w"] <= counted["b"] < counted["c"]


def test_exhausted_pairs_stop_early(spark):
    tiny = spark.createDataFrame([("0", "ab ab")], "doc_id string, text string")
    merges, vocab = TK.bpe_train(TK.word_vocab(tiny), n_merges=10)
    assert merges.count() == 1  # only (a,b) exists; loop stops when dry
    assert [list(r["sym"]) for r in vocab.collect()] == [["ab"]]


def test_bpe_word_tokens_sql_matches_python_loop():
    """The rank-ordered replace() chain (bpe_word_tokens_sql) replays the
    greedy lowest-rank-first merge loop exactly — fuzzed over adversarial
    words (adjacent repeats, punctuation, digits, empty) plus 2000 random
    words drawn from the merge alphabet."""
    import random

    import duckdb

    from linkinator_spark.functions.tokenize import (
        DEFAULT_MERGES, bpe_word_tokens, bpe_word_tokens_sql)

    ranks = {p: i for i, p in enumerate(DEFAULT_MERGES)}
    rng = random.Random(7)
    words = ["the", "thing", "international", "aaa", "aaaa", "x", "",
             "station", "conditioning", "a1b2", "don't", "th-e", "prothe"]
    words += ["".join(rng.choice("theinorastx")
                      for _ in range(rng.randint(1, 12)))
              for _ in range(2000)]
    con = duckdb.connect()
    con.execute("create table t(w varchar)")
    con.executemany("insert into t values (?)", [(w,) for w in words])
    got = con.execute(
        f"select w, strlen(x) - strlen(replace(x, chr(1), '')) from "
        f"(select w, {bpe_word_tokens_sql('w')} as x from t)").fetchall()
    assert len(got) == len(words)
    for w, n in got:
        assert n == bpe_word_tokens(w, ranks), w


def test_bpe_train_merges_per_round_k1_exact(spark):
    """merges_per_round=1 is byte-identical to the canonical
    one-pair-per-round loop (the oracle configuration)."""
    from linkinator_spark.functions.tokenize import bpe_train, word_vocab

    docs = spark.createDataFrame(
        [("the theory of the thing",), ("in the inn thing ing",),
         ("there the then than",)], "text string")
    vocab = word_vocab(docs)
    m1, _ = bpe_train(vocab, n_merges=6, merges_per_round=1)
    rows1 = [(r["rank"], r["left"], r["right"], r["pair_count"])
             for r in m1.orderBy("rank").collect()]
    # canonical loop = the default signature
    m0, _ = bpe_train(word_vocab(docs), n_merges=6)
    rows0 = [(r["rank"], r["left"], r["right"], r["pair_count"])
             for r in m0.orderBy("rank").collect()]
    assert rows1 == rows0 and len(rows1) == 6


def test_bpe_train_batched_rounds_disjoint_and_exact_counts(spark):
    """merges_per_round=3 learns the same TOTAL number of merges in
    fewer driver rounds; within each batch the pairs are symbol-disjoint
    and each selected count equals the true pre-batch adjacency count
    (verified against the k=1 replay's first round)."""
    from linkinator_spark.functions.tokenize import bpe_train, word_vocab

    docs = spark.createDataFrame(
        [("aa bb cc aa bb cc dd",), ("aa bb dd ee ff",),
         ("cc dd ee ff gg hh",)], "text string")
    mk, _ = bpe_train(word_vocab(docs), n_merges=6, merges_per_round=3)
    rows = [(r["left"], r["right"], r["pair_count"])
            for r in mk.orderBy("rank").collect()]
    assert len(rows) == 6
    # batch 1 = ranks 1-3: pairwise symbol-disjoint (incl. products)
    syms: set = set()
    for left, right, _ in rows[:3]:
        assert left not in syms and right not in syms
        syms.update((left, right, left + right))
    # rank-1 selection matches the canonical loop's first pick exactly
    m1, _ = bpe_train(word_vocab(docs), n_merges=1)
    assert rows[0] == tuple(
        (r["left"], r["right"], r["pair_count"])
        for r in m1.collect())[0]
