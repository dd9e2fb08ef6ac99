"""Standoff span-attribute tagging — the Dolma "attributes" model
(Soldaini et al. 2024): quality and PII signals are computed per
PARAGRAPH and stored as a separate standoff table keyed by
(doc_id, span offsets), so downstream curation recipes mix and match
taggers without re-running them or mutating the source text.

Document-level gates (functions/gopher.py, text.py) answer "keep this
doc?"; the attribute table answers "which parts, and why" — the shape
real pipelines (Dolma, RefinedWeb ablations) persist alongside the
corpus. All signals here are exact integers/booleans (no float ratios)
so the table is hash-stable across engines.

Scale shape: one codegen projection building the per-paragraph struct
array (offsets via an index-aware transform; the prefix-length sum is
an in-array aggregate over a slice — paragraph counts per doc are
small, so the quadratic term is bounded by document shape, not corpus
size), then ONE explode. No UDF, no shuffle, no driver state. The PII
regexes are text.py's Java ∩ RE2-safe constants — one definition
point with the doc-level pass and the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkinator_spark.functions.text import (
    PII_EMAIL_RE, PII_PHONE_RE, STOPWORDS_EN,
)

PARA_SEP = "\n\n"
TERMINAL_RE = "[.!?][\"')\\]]?$"


def paragraph_attributes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per paragraph: (doc_id, span_idx, start, end, n_chars,
    n_words, n_stop, terminal_punct, n_emails, n_phones).

    ``start``/``end`` are character offsets into the ORIGINAL text
    (end exclusive), so a consumer can slice the source without
    re-splitting — the standoff contract.
    """
    paras = F.split(F.col(text_col), PARA_SEP)
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS_EN])

    def attr(p, i):
        # prefix length of paragraphs before i, plus the 2-char joiners
        start = (
            F.aggregate(F.slice(paras, 1, i), F.lit(0),
                        lambda acc, x: acc + F.length(x))
            + i * F.lit(len(PARA_SEP)))
        words = F.when(F.trim(p) == "",
                       F.expr("cast(array() as array<string>)")
                       ).otherwise(F.split(F.lower(F.trim(p)), "\\s+"))
        return F.struct(
            i.alias("span_idx"),
            start.cast("int").alias("start"),
            (start + F.length(p)).cast("int").alias("end"),
            F.length(p).alias("n_chars"),
            F.size(words).alias("n_words"),
            F.size(F.filter(
                words, lambda w: F.array_contains(stop_lit, w))
            ).alias("n_stop"),
            (F.regexp_count(F.trim(p), F.lit(TERMINAL_RE)) > 0
             ).alias("terminal_punct"),
            F.size(F.regexp_extract_all(p, F.lit(PII_EMAIL_RE), F.lit(0))
                   ).alias("n_emails"),
            F.size(F.regexp_extract_all(p, F.lit(PII_PHONE_RE), F.lit(0))
                   ).alias("n_phones"),
        )

    from linkinator_spark.functions.partitioning import spread_small_scan

    # the per-paragraph transform (nested regex + stoplist scans) is an
    # interpreted expression; spread a narrow scan across the cores first
    # (no-op when the input is already wide)
    docs = spread_small_scan(docs.select(F.col(id_col), F.col(text_col)))
    tagged = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.transform(paras, attr),
                     lambda s: s["n_chars"] > 0)).alias("a"),
    )
    return tagged.select(id_col, "a.*")


def paragraph_attributes_oracle_sql(
    text_expr: str = "text",
    id_expr: str = "doc_id",
    from_clause: str = "documents",
) -> str:
    """DuckDB twin — same constants, lateral unnest over the paragraph
    index with a list-slice prefix sum for offsets."""
    stoplist = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"
    sep = "chr(10) || chr(10)"
    term_re = TERMINAL_RE.replace("'", "''")
    return f"""
      with src as (
        select {id_expr} as doc_id,
               string_split({text_expr}, {sep}) as ps
        from {from_clause}
      ),
      ex as (
        select doc_id,
               cast(j - 1 as int) as span_idx,
               ps[j] as p,
               cast(coalesce(list_sum(list_transform(
                        ps[1:j-1], q -> length(q))), 0)
                    + (j - 1) * 2 as int) as start
        from src, unnest(generate_series(1, len(ps))) as t(j)
      )
      select doc_id, span_idx, start,
             cast(start + length(p) as int) as "end",
             cast(length(p) as int) as n_chars,
             cast(case when trim(p) = '' then 0
                  else len(string_split_regex(lower(trim(p)), '\\s+'))
                  end as int) as n_words,
             cast(case when trim(p) = '' then 0
                  else len(list_filter(
                      string_split_regex(lower(trim(p)), '\\s+'),
                      w -> list_contains({stoplist}, w)))
                  end as int) as n_stop,
             regexp_matches(trim(p), '{term_re}') as terminal_punct,
             cast(len(regexp_extract_all(p, '{PII_EMAIL_RE}', 0))
                  as int) as n_emails,
             cast(len(regexp_extract_all(p, '{PII_PHONE_RE}', 0))
                  as int) as n_phones
      from ex
      where length(p) > 0
    """
