"""C4-style line-level corpus cleaning (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", §2.2 — the C4 heuristics).

Where the Gopher gate (functions/gopher.py) accepts or rejects whole
documents, C4 cleans INSIDE the document first: it keeps only lines that
look like prose sentences, then drops pages that are left with too
little, or that carry boilerplate markers. The rules implemented, per
the paper:

- keep only lines ending in terminal punctuation (. ! ? or a closing
  quote);
- keep only lines with at least `min_words` words (paper: 3);
- drop lines containing the word "javascript" (any case);
- drop pages containing "{" (code) or "lorem ipsum" (placeholder text);
- drop pages with fewer than `min_kept_lines` surviving lines (the
  paper cuts at 5 sentences; line-approximated here, parameterized).

Everything is a single whole-stage-codegen projection per row — a
higher-order `filter` over the line array with regexp/word-count
predicates, plus doc-level `contains` gates. No shuffle, no Python, no
state; a 10^10-doc corpus cleans at parquet scan speed. The DuckDB twin
(`c4_clean_oracle_sql`) replays every predicate with `list_filter`, so
the kept-line sets are engine-exact (all counts are integers; the
cleaned text is compared by md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean", "kept_lines", "page_kept", "c4_clean_oracle_sql",
           "TERMINAL_PUNCT_RE"]

# line ends with . ! ? or a closing quote (straight or curly), with
# optional trailing whitespace — same pattern under Java regex and RE2
TERMINAL_PUNCT_RE = '[.!?"”]\\s*$'


def _kept_lines(text: Column, min_words: int) -> Column:
    """The surviving-line array: terminal punctuation, >= min_words
    words, and no 'javascript' mention."""
    return F.filter(
        F.split(text, "\n"),
        lambda l: l.rlike(TERMINAL_PUNCT_RE)
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
        & ~F.lower(l).contains("javascript"),
    )


def kept_lines(text: Column, min_words: int = 3) -> Column:
    """Public alias of the surviving-line array — for composing the C4
    line cut into a wider projection (e.g. carrying the cleaned text
    into downstream gates without a join)."""
    return _kept_lines(text, min_words)


def page_kept(
    text: Column, min_words: int = 3, min_kept_lines: int = 3,
) -> Column:
    """The page-level C4 gate as a single boolean Column over the raw
    text: enough surviving lines, no '{', no 'lorem ipsum'."""
    return (
        (F.size(_kept_lines(text, min_words)) >= min_kept_lines)
        & ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
    )


def c4_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 3, min_kept_lines: int = 3,
) -> DataFrame:
    """Apply the C4 line + page filters to `docs`.

    Output, one row per input doc:
      (id_col, n_lines, n_kept, doc_kept:int, cleaned_md5)
    where n_kept counts surviving lines, doc_kept is 1 iff the page
    survives (enough kept lines, no '{', no 'lorem ipsum'), and
    cleaned_md5 fingerprints the kept lines joined by newline (empty
    string when nothing survives). Materialize the cleaned corpus with
    `array_join(kept, '\\n')` via this module's `_kept_lines` — the md5
    keeps the oracle comparison value-checked without shipping the full
    text through the hash harness."""
    text = F.col(text_col)
    kept = _kept_lines(text, min_words)
    n_lines = F.size(F.split(text, "\n"))
    n_kept = F.size(kept)
    page_ok = (
        (n_kept >= min_kept_lines)
        & ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
    )
    return docs.select(
        id_col,
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        page_ok.cast("int").alias("doc_kept"),
        F.md5(F.array_join(kept, "\n")).alias("cleaned_md5"),
    )


def c4_clean_oracle_sql(
    docs_table: str = "documents", text_expr: str = "text",
    id_col: str = "doc_id", min_words: int = 3, min_kept_lines: int = 3,
) -> str:
    """DuckDB twin of `c4_clean` — identical line predicates and page
    gates over `list_filter`."""
    line_pred = (
        f"regexp_matches(l, '{TERMINAL_PUNCT_RE}') "
        f"and len(string_split_regex(trim(l), '\\s+')) >= {min_words} "
        "and not contains(lower(l), 'javascript')"
    )
    return f"""
        with base as (
          select {id_col}, {text_expr} as raw,
                 list_filter(string_split({text_expr}, chr(10)),
                             l -> {line_pred}) as kept
          from {docs_table}
        )
        select {id_col},
               len(string_split(raw, chr(10)))::bigint as n_lines,
               len(kept)::bigint as n_kept,
               case when len(kept) >= {min_kept_lines}
                         and not contains(raw, '{{')
                         and not contains(lower(raw), 'lorem ipsum')
                    then 1 else 0 end as doc_kept,
               md5(coalesce(list_aggregate(kept, 'string_agg', chr(10)),
                            '')) as cleaned_md5
        from base
    """
