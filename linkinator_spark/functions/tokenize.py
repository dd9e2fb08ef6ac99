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
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(IntegerType())
    def _count(texts: pd.Series) -> pd.Series:
        memo: dict = {}

        def doc_tokens(text):
            if text is None:
                return 0
            total = 0
            for w in text.lower().split():
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
