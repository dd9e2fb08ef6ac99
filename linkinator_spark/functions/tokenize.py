"""Pluggable tokenization for token-budget operators.

`pack_shards` (functions/sampling.py) budgets shards by whatever
`tokens_col` the caller supplies; the default pipeline feeds it
whitespace counts (functions/text.token_count — pure codegen). Real
training pipelines pack by BPE tokens, and the shard layout changes
materially: BPE fragments rare words into several tokens, so documents
heavy in rare vocabulary consume more budget than their word count
suggests.

This module supplies that path as a deterministic, dependency-free BPE
twin: a vendored merge table (GPT-2-style lowest-rank-first greedy
merges — Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") applied per word. No external vocab file, no
network: the merge list below IS the vocabulary, so counts are
bit-reproducible across clusters and rounds.

Scale shape: an Arrow-batched scalar pandas UDF (never row-at-a-time
Python) with a per-batch word-level memo — natural text repeats words
heavily (Zipf), so the merge loop runs once per DISTINCT word per
batch, not once per occurrence. The UDF maps over the corpus with no
shuffle; the downstream pack keeps its single uniform-hash exchange.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

# Vendored merge ranks: common English digram/trigram merges, most
# frequent first. Small on purpose — the point is a deterministic twin
# with real BPE *semantics* (greedy lowest-rank adjacent merge), not
# linguistic fidelity; swap in a production merge table (e.g. a
# tiktoken export) without touching the algorithm.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("s", "t"), ("e", "n"),
    ("o", "r"), ("a", "r"), ("an", "d"), ("in", "g"), ("o", "u"),
    ("i", "t"), ("e", "s"), ("a", "l"), ("t", "o"), ("o", "f"),
    ("i", "s"), ("e", "d"), ("a", "s"), ("l", "e"), ("h", "e"),
    ("s", "e"), ("t", "i"), ("ti", "on"), ("c", "h"), ("l", "l"),
    ("r", "o"), ("u", "r"), ("c", "on"), ("d", "e"), ("m", "e"),
    ("w", "h"), ("s", "h"), ("l", "y"), ("p", "ro"), ("b", "e"),
)


# ASCII whitespace (space, \t, \n, \r, \f, \v): the word-split contract
# shared by the tokenizer UDF and its SQL twin. chr-coded so the Python
# regex class and the DuckDB e-string class are generated from ONE tuple.
_WS_CHARS = (0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B)
_WS_CLASS = "".join(chr(c) for c in _WS_CHARS)
_WS_CLASS_SQL = "".join(f"\\x{c:02x}" for c in _WS_CHARS)


def bpe_word_tokens(word: str, ranks: dict) -> int:
    """Number of BPE tokens for one word: start from characters, then
    repeatedly merge the adjacent pair with the LOWEST rank until no
    mergeable pair remains (the canonical greedy BPE apply loop)."""
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return len(parts)


def bpe_token_count_udf(merges=DEFAULT_MERGES):
    """Arrow-batched pandas UDF: BPE token count of a text column.

    Whitespace pre-splits (BPE merges never cross word boundaries, as in
    GPT-2's pretokenizer); each distinct word's merge loop runs once per
    batch via the memo, then counts sum per document. Nulls count 0.
    """
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}
    # explicit ASCII whitespace class, NOT str.split(): Python's split
    # breaks on unicode whitespace (\xa0,  , ...) that DuckDB RE2's
    # \s does not, which would silently desync the SQL twin on non-ASCII
    # corpora (both sides share _WS_CLASS as the definition site)
    word_re = re.compile(f"[^{_WS_CLASS}]+")

    @F.pandas_udf(IntegerType())
    def _count(texts: pd.Series) -> pd.Series:
        memo: dict = {}

        def doc_tokens(text):
            if text is None:
                return 0
            total = 0
            for w in word_re.findall(text.lower()):
                n = memo.get(w)
                if n is None:
                    n = bpe_word_tokens(w, ranks)
                    memo[w] = n
                total += n
            return total

        return texts.map(doc_tokens).astype("int32")

    return _count


def bpe_token_count(col: Column, merges=DEFAULT_MERGES) -> Column:
    """BPE token count of `col` under the vendored merge table — the
    drop-in alternative to text.token_count for token-budget sharding
    (pass its output as pack_shards' `tokens_col`)."""
    return bpe_token_count_udf(merges)(col)


def bpe_word_tokens_sql(word_expr: str, merges=DEFAULT_MERGES) -> str:
    """DuckDB scalar twin of :func:`bpe_word_tokens`: a rank-ordered
    chain of plain `replace()` calls over a delimiter-wrapped symbol
    string (chr(1) + symbol + chr(2) per symbol, so a merge pattern can
    never match across a symbol boundary or consume the next symbol's
    delimiter).

    Equivalence to the greedy lowest-rank-first loop: in a valid merge
    table every compound symbol is created at exactly one rank, so a
    pair's elements both exist before its rank and the pair can never
    REAPPEAR after its own replace pass (a later merge's product would
    have to equal one of the elements — impossible when product strings
    are unique, asserted below). Replaying merges rank-by-rank,
    all-occurrences-left-to-right therefore reaches the same final
    segmentation as merging one lowest-rank occurrence at a time — the
    standard fast-BPE replay. Returns an expression: the wrapped symbol
    string after all merges; count tokens with
    `strlen(x) - strlen(replace(x, chr(1), ''))`."""
    products = [left + right for left, right in merges]
    assert len(set(products)) == len(products), (
        "rank-by-rank replay requires unique merge products")
    assert all(s.isalnum() for p in merges for s in p), (
        "symbols must not contain SQL quotes/delimiters")

    def sym(s: str) -> str:
        return f"chr(1)||'{s}'||chr(2)"

    expr = f"regexp_replace({word_expr}, '(.)', chr(1) || '\\1' || chr(2), 'g')"
    for left, right in merges:
        expr = (f"replace({expr}, {sym(left)}||{sym(right)}, "
                f"{sym(left + right)})")
    return expr


def bpe_token_count_sql(docs_table: str = "documents",
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        merges=DEFAULT_MERGES) -> str:
    """Per-document DuckDB twin of :func:`bpe_token_count`: ASCII
    whitespace pre-split (the UDF's shared _WS_CLASS contract — NOT \\S+,
    whose Python/RE2 unicode semantics differ), per-word merge replay
    (bpe_word_tokens_sql), counts summed per document; wordless/null
    docs count 0 exactly like the UDF. Unicode `lower()` edge cases
    outside ASCII remain engine-defined on both sides. Yields
    ({id_col}, n_tokens)."""
    merged = bpe_word_tokens_sql("w", merges)
    return f"""
        with _bpe_words as (
          select {id_col},
                 unnest(regexp_extract_all(lower({text_col}),
                        e'[^{_WS_CLASS_SQL}]+')) as w
          from {docs_table}),
        _bpe_m as (select {id_col}, {merged} as m from _bpe_words),
        _bpe_cnt as (
          select {id_col},
                 sum(strlen(m) - strlen(replace(m, chr(1), ''))) as n
          from _bpe_m group by {id_col})
        select d.{id_col},
               cast(coalesce(c.n, 0) as bigint) as n_tokens
        from {docs_table} d
        left join _bpe_cnt c using ({id_col})
    """


# ---------------------------------------------------------------------------
# BPE TRAINING — learn the merge table from the corpus (Sennrich et al.
# 2016 §3.2). The vendored DEFAULT_MERGES above is the *apply* side's
# stand-in vocabulary; this is the side that produces such a table.
#
# Scale shape: the corpus is touched exactly once (the word-count
# aggregation — one shuffle on the word, Zipf-uniform enough, partial
# aggregation map-side). Every merge round thereafter runs on the
# DISTINCT-WORD table only (vocabulary scale, millions of rows at 100 TB,
# never corpus scale): one pair-count shuffle + a codegen array fold to
# apply the winning merge, with exactly ONE row collected per round
# (the argmax pair). Lineage is truncated per round via localCheckpoint,
# the same cage the connected-components star rounds use.
# ---------------------------------------------------------------------------

def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) vocabulary: lowercase [a-z]+ runs, summed corpus-wide.
    The single corpus-scale stage of BPE training."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    return (
        spread_small_scan(docs.select(F.col(text_col)))
        .select(F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    )


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-pair merge over a symbol array as a
    codegen fold: append each symbol unless the accumulator's last
    element is `left` and the incoming one is `right`, in which case
    replace the last element with the concatenation."""
    merged = left + right
    return F.aggregate(
        sym,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left) & (x == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(words: DataFrame, n_merges: int,
              word_col: str = "word", count_col: str = "n",
              merges_per_round: int = 1):
    """Learn `n_merges` BPE merges from a (word, count) vocabulary.

    Per round: count adjacent symbol pairs weighted by word frequency
    (groupBy — partial-aggregates map-side), pick the most frequent
    pair with a total deterministic tie-break (count desc, then pair
    lexicographic asc), apply it to every word's symbol array, repeat.

    SCALE BOUNDARY: each round costs one driver argmax (`head`) plus a
    localCheckpoint — exact and fine at oracle-scale vocabularies, but
    a real 30k-merge tokenizer would schedule 30k rounds.
    `merges_per_round=k` lifts it the standard way: take the top-k
    SYMBOL-DISJOINT pairs per round (a pair is skipped when either
    element — or an earlier-selected product, which may collide with an
    existing symbol string — was touched this round; such pairs' counts
    would be stale after the earlier merge). Disjoint pairs' counts are
    provably unaffected by each other's application, so every selected
    count stays exact; the learned TABLE can still differ from k=1
    order beyond the first round (the classic batched-BPE
    approximation). k=1 reproduces the canonical sequence exactly and
    stays the oracle configuration.

    Returns (merges DataFrame with columns rank/left/right/merged/
    pair_count, final symbolized-vocab DataFrame). The merges table is
    metadata-sized (one row per round) — feed `[(l, r), ...]` into
    :func:`bpe_token_count` to tokenize with the learned vocabulary.
    """
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    spark = words.sparkSession
    vocab = words.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("long").alias("n"),
        F.split(word_col, "").alias("sym"),
    ).localCheckpoint(eager=True)

    learned: list[tuple[int, str, str, str, int]] = []
    while len(learned) < n_merges:
        sz = F.size("sym")
        pairs = (
            vocab.filter(sz >= 2)
            .select("n", F.explode(F.arrays_zip(
                F.slice("sym", 1, sz - 1).alias("l"),
                F.slice("sym", 2, sz - 1).alias("r"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
        )
        want = min(merges_per_round, n_merges - len(learned))
        # over-fetch: disjointness filtering may reject candidates
        top = (pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
               .head(want if want == 1 else want * 4))
        if not top:
            break
        used: set = set()
        # batched mode also rejects candidates whose product collides
        # with a PRIOR round's product (round-5 ADVICE #3: the
        # unique-products invariant is otherwise only tripped far
        # downstream at apply time). k=1 stays the canonical greedy
        # argmax — never skipped — so the oracle configuration is
        # untouched.
        prior_products: set = (
            {m[3] for m in learned} if merges_per_round > 1 else set())
        batch: list[tuple[str, str, int]] = []
        for row in top:
            l, r = row["l"], row["r"]
            # skip when an element was touched this round (stale count)
            # OR the PRODUCT collides with a symbol/product already in
            # the batch or a previously learned product — (ab,c) then
            # (a,bc) would both mint 'abc', breaking the unique-products
            # invariant the SQL replay asserts on
            if (l in used or r in used or (l + r) in used
                    or (l + r) in prior_products):
                continue
            batch.append((l, r, int(row["cnt"])))
            used.update((l, r, l + r))
            if len(batch) >= want:
                break
        col = F.col("sym")
        for l, r, cnt in batch:
            learned.append((len(learned) + 1, l, r, l + r, cnt))
            col = _apply_merge(col, l, r)
        # lazy checkpoint: the next round's argmax job materializes it —
        # one job per round instead of two (plan still truncated here)
        vocab = vocab.withColumn("sym", col).localCheckpoint(eager=False)

    merges = spark.createDataFrame(
        learned, "rank int, left string, right string, merged string, "
                 "pair_count long")
    return merges, vocab


def bpe_train_oracle_sql(n_merges: int, docs_table: str = "documents",
                         text_col: str = "text") -> str:
    """DuckDB twin of word_vocab → bpe_train: the merge rounds unrolled
    into chained CTEs (the kmeans_oracle_sql pattern). Symbol arrays are
    chr(1)-joined strings; the greedy fold is list_reduce with an
    ends-with check — byte-identical semantics to `_apply_merge` because
    vocabulary words are [a-z]+ only, so the separator never collides."""
    sep = "chr(1)"
    sql = [f"""
        with v0 as (
          select word, cast(count(*) as bigint) as n,
                 substr(regexp_replace(word, '(.)', '\\1' || {sep}, 'g'),
                        1, 2 * strlen(word) - 1) as sym
          from (
            select unnest(regexp_extract_all(lower({text_col}),
                                             '[a-z]+', 0)) as word
            from {docs_table}
          ) group by word
        )"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        sql.append(f"""
        , p{k} as (
          select s[j] as l, s[j + 1] as r, sum(n) as cnt
          from (select n, string_split(sym, {sep}) as s from v{p}
                where strlen(sym) > strlen(replace(sym, {sep}, ''))),
               unnest(generate_series(1, len(s) - 1)) as t(j)
          group by 1, 2
        )
        , b{k} as (
          select l, r, cast(cnt as bigint) as cnt from p{k}
          order by cnt desc, l, r limit 1
        )
        , v{k} as (
          -- the winning pair rides in as plain columns (DuckDB lambdas
          -- may capture row columns but not subqueries)
          select word, n,
                 list_reduce(
                   string_split(sym, {sep}),
                   (acc, x) -> case
                     when x = b_r
                      and (acc = b_l or ends_with(acc, {sep} || b_l))
                     then substr(acc, 1, strlen(acc) - strlen(b_l))
                          || b_l || x
                     else acc || {sep} || x end) as sym
          from v{p}, (select l as b_l, r as b_r from b{k})
        )""")
    picks = "\nunion all\n".join(
        f"select {k} as rank, l as left, r as right, l || r as merged, "
        f"cnt as pair_count from b{k}" for k in range(1, n_merges + 1))
    return "".join(sql) + f"\nselect * from ({picks}) order by rank"
