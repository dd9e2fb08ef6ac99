"""Gopher-rule document quality gate (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", table A1).

The seven classic per-document filters web-scale corpora cut on before
training: word count, mean word length, symbol-to-word ratio, bullet- and
ellipsis-line fractions, alpha-word fraction, and a required-stopword
floor. MassiveWeb applies these after language ID and before dedup; this
module is that stage for the pipeline here (compose with `text.lang_id`,
`dedup.*`, `lm.ppl_bucket`).

Determinism is the contract, same as the rest of functions/: every rule
threshold is a RATIO test rewritten as an integer cross-multiplication
(e.g. mean word length in [3, 10] becomes `3*n_words <= n_chars <=
10*n_words`), so no float division ever happens — the pass/fail bits are
exact int64 comparisons that Spark and the DuckDB oracle cannot disagree
on, regardless of summation order or libm.

Scale shape (100-TB lens): the whole gate is one whole-stage-codegen
projection per row — splits, higher-order array filters, and regexp
counts over the document's own text. No shuffle, no join, no UDF, no
state; filters and column pruning push to the parquet scan. A 10^10-doc
corpus gates at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import normalize_text

__all__ = ["GOPHER_RULES", "gopher_features", "gopher_gate",
           "gopher_pass", "gopher_gate_oracle_sql", "REQUIRED_STOPWORDS"]

# Rae et al. 2021 A1.1 requires >= 2 of these "must-have" English words.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^\s*[-*•]"          # line starts with -, * or •
_ELLIPSIS_LINE_RE = r"(\.\.\.|…)\s*$"  # line ends with ... or …

# (rule name, human threshold) in gate order — fail_reason reports the
# FIRST violated rule in this order.
GOPHER_RULES = (
    ("word_count", "50 <= n_words <= 100000"),
    ("mean_word_len", "3 <= mean word length <= 10"),
    ("symbol_ratio", "(# + ellipsis) / n_words <= 0.1"),
    ("bullet_lines", "bullet-start lines <= 90%"),
    ("ellipsis_lines", "ellipsis-end lines <= 30%"),
    ("alpha_words", ">= 80% words contain a letter"),
    ("stopwords", ">= 2 required stopwords present"),
)


def gopher_features(text: Column) -> dict[str, Column]:
    """The integer measurements behind the seven rules, as codegen
    expressions over one text column. All counts; no ratios."""
    norm = normalize_text(text)
    words = F.split(norm, " ")
    n_words = F.size(words)
    # sum(len(word)) == len(norm) - (n_words - 1) separators
    n_word_chars = F.length(norm) - (n_words - F.lit(1))
    n_hash = F.length(norm) - F.length(F.regexp_replace(norm, "#", ""))
    n_ellipsis = F.size(
        F.regexp_extract_all(norm, F.lit(r"\.\.\.|…"), 0))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike(_BULLET_RE)))
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(_ELLIPSIS_LINE_RE)))
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]")))
    n_req_stop = sum(
        (F.when(norm.rlike(rf"\b{w}\b"), 1).otherwise(0)
         for w in REQUIRED_STOPWORDS),
        start=F.lit(0),
    )
    return {
        "n_words": n_words.cast("long"),
        "n_word_chars": n_word_chars.cast("long"),
        "n_symbols": (n_hash + n_ellipsis).cast("long"),
        "n_lines": n_lines.cast("long"),
        "n_bullet_lines": n_bullet_lines.cast("long"),
        "n_ellipsis_lines": n_ellipsis_lines.cast("long"),
        "n_alpha_words": n_alpha_words.cast("long"),
        "n_req_stopwords": n_req_stop.cast("long"),
    }


def _rule_bits(f: dict[str, Column]) -> dict[str, Column]:
    """The seven pass bits as integer cross-multiplication tests."""
    return {
        "word_count": (f["n_words"] >= 50) & (f["n_words"] <= 100000),
        # 3 <= n_word_chars / n_words <= 10
        "mean_word_len": (f["n_word_chars"] >= 3 * f["n_words"])
        & (f["n_word_chars"] <= 10 * f["n_words"]),
        # n_symbols / n_words <= 0.1
        "symbol_ratio": 10 * f["n_symbols"] <= f["n_words"],
        # n_bullet_lines / n_lines <= 0.9
        "bullet_lines": 10 * f["n_bullet_lines"] <= 9 * f["n_lines"],
        # n_ellipsis_lines / n_lines <= 0.3
        "ellipsis_lines": 10 * f["n_ellipsis_lines"] <= 3 * f["n_lines"],
        # n_alpha_words / n_words >= 0.8
        "alpha_words": 5 * f["n_alpha_words"] >= 4 * f["n_words"],
        "stopwords": f["n_req_stopwords"] >= 2,
    }


def _fold_gate(bits: dict[str, Column]) -> Column:
    """AND the seven rule bits in GOPHER_RULES order — the single gate
    fold shared by gopher_pass and gopher_gate, so a rule change can
    never desynchronize the two."""
    gate = None
    for name, _ in GOPHER_RULES:
        gate = bits[name] if gate is None else (gate & bits[name])
    return gate


def gopher_pass(text: Column) -> Column:
    """The all-seven-rules gate as a single boolean Column — for
    composing the Gopher cut into a wider projection (one codegen pass,
    no intermediate DataFrame). `gopher_gate` is this plus the feature
    columns and the fail reason."""
    return _fold_gate(_rule_bits(gopher_features(text)))


def gopher_gate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Gate `docs` through the seven Gopher rules.

    Output, one row per input doc:
      (id_col, n_words, n_word_chars, n_symbols, n_lines, n_bullet_lines,
       n_ellipsis_lines, n_alpha_words, n_req_stopwords,
       gopher_pass:int, fail_reason:string)
    gopher_pass is 1/0 (int — portable; DuckDB booleans hash differently)
    and fail_reason names the first violated rule in GOPHER_RULES order,
    or 'pass'. Keep the survivors with `.filter("gopher_pass = 1")`.
    """
    f = gopher_features(F.col(text_col))
    bits = _rule_bits(f)
    reason = F.lit("pass")
    for name, _ in reversed(GOPHER_RULES):
        reason = F.when(~bits[name], F.lit(name)).otherwise(reason)
    gate = _fold_gate(bits)
    return docs.select(
        id_col,
        *[f[k].alias(k) for k in f],
        gate.cast("int").alias("gopher_pass"),
        reason.alias("fail_reason"),
    )


def gopher_gate_oracle_sql(
    docs_table: str = "documents", text_expr: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `gopher_gate`: identical normalization, counts, and
    integer cross-multiplication tests. RE2 and Java regex agree on every
    pattern used (classes, anchors, \\b — no lookaround)."""
    norm = f"trim(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g'))"
    stop_sum = " + ".join(
        f"case when regexp_matches(norm, '\\b{w}\\b') then 1 else 0 end"
        for w in REQUIRED_STOPWORDS)
    checks = {
        "word_count": "(n_words >= 50 and n_words <= 100000)",
        "mean_word_len": "(n_word_chars >= 3 * n_words "
                         "and n_word_chars <= 10 * n_words)",
        "symbol_ratio": "(10 * n_symbols <= n_words)",
        "bullet_lines": "(10 * n_bullet_lines <= 9 * n_lines)",
        "ellipsis_lines": "(10 * n_ellipsis_lines <= 3 * n_lines)",
        "alpha_words": "(5 * n_alpha_words >= 4 * n_words)",
        "stopwords": "(n_req_stopwords >= 2)",
    }
    reason = "'pass'"
    for name, _ in reversed(GOPHER_RULES):
        reason = f"case when not {checks[name]} then '{name}' else {reason} end"
    gate = " and ".join(checks[name] for name, _ in GOPHER_RULES)
    return f"""
        with base as (
          select {id_col}, {norm} as norm, {text_expr} as raw
          from {docs_table}
        ),
        feats as (
          select {id_col},
            len(string_split(norm, ' '))::bigint as n_words,
            (length(norm) - (len(string_split(norm, ' ')) - 1))::bigint
              as n_word_chars,
            ((length(norm) - length(replace(norm, '#', '')))
             + len(regexp_extract_all(norm, '\\.\\.\\.|…')))::bigint
              as n_symbols,
            len(string_split(raw, chr(10)))::bigint as n_lines,
            len(list_filter(string_split(raw, chr(10)),
                l -> regexp_matches(l, '^\\s*[-*•]')))::bigint
              as n_bullet_lines,
            len(list_filter(string_split(raw, chr(10)),
                l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))::bigint
              as n_ellipsis_lines,
            len(list_filter(string_split(norm, ' '),
                w -> regexp_matches(w, '[a-z]')))::bigint as n_alpha_words,
            ({stop_sum})::bigint as n_req_stopwords
          from base
        )
        select {id_col}, n_words, n_word_chars, n_symbols, n_lines,
               n_bullet_lines, n_ellipsis_lines, n_alpha_words,
               n_req_stopwords,
               case when {gate} then 1 else 0 end as gopher_pass,
               {reason} as fail_reason
        from feats
    """
