"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is built from JVM-side `pyspark.sql.functions` expressions
(whole-stage codegen, no Python in the hot path) and is deliberately
*engine-portable*: each builder has an exact ANSI-SQL twin used as the DuckDB
oracle in __spark_entry__.py. The shared primitive is a 60-bit hash derived
from md5 hex — identical in Spark (`conv(substr(md5(x),1,15),16,10)`) and
DuckDB (`cast('0x'||substr(md5(x),1,15) as ubigint)`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column, prefix: str = "") -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB (see module doc)."""
    keyed = F.concat(F.lit(prefix), col) if prefix else col
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, prefix: str = "") -> str:
    """The DuckDB twin of portable_hash64 (for oracle construction)."""
    keyed = f"concat('{prefix}', {expr})" if prefix else expr
    return f"cast(('0x' || substr(md5({keyed}), 1, 15)) as ubigint)::bigint"


# ---------------------------------------------------------------- tokenize

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(col: Column) -> Column:
    """BPE-ish regex token count: words | number runs | punctuation marks."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), r"\s+"))


# ---------------------------------------------------------------- quality

STOPWORDS_EN = ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"]


def _word_matches(col: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def quality_features(col: Column) -> dict[str, Column]:
    """Length/punctuation/stopword heuristics (C4/Gopher-style quality
    signals), all as single-pass expressions."""
    n_chars = F.length(col)
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    n_tokens = token_count(col)
    n_stop = _word_matches(col, STOPWORDS_EN)
    safe = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tok = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": (n_alpha / safe),
        "digit_ratio": (n_digit / safe),
        "punct_ratio": (n_punct / safe),
        "stopword_ratio": (n_stop / safe_tok),
        "mean_token_len": (n_alpha.cast("double") / safe_tok),
    }


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score; weights chosen so prose scores high and
    boilerplate/noise scores low. Deterministic, portable."""
    f = quality_features(col)
    score = (
        F.least(f["alpha_ratio"] * 1.25, F.lit(1.0)) * 0.4
        + F.least(f["stopword_ratio"] * 5.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(f["punct_ratio"] * 4.0, F.lit(1.0))) * 0.2
        + F.when((f["n_chars"] >= 100) & (f["n_chars"] <= 100000), 1.0).otherwise(0.0) * 0.1
    )
    return F.round(score, 6)


# ---------------------------------------------------------------- lang id

LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "con", "para", "como"],
}


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: _word_matches(col, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column) -> Column:
    """Argmax of per-language stopword hits; ties break by language code
    order; zero hits -> 'und'. n-gram-free but deterministic and portable."""
    scores = lang_scores(col)
    langs = sorted(scores)  # de, en, es, fr — deterministic tie order
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def lang_id_sql(expr: str) -> str:
    """DuckDB twin of lang_id."""
    scores = {
        lg: (
            f"len(regexp_extract_all(lower({expr}), "
            f"'\\b(?:{'|'.join(w)})\\b'))"
        )
        for lg, w in LANG_STOPWORDS.items()
    }
    langs = sorted(scores)
    best = f"greatest({', '.join(scores[lg] for lg in langs)})"
    chain = "'und'"
    for lg in reversed(langs):
        chain = f"case when {scores[lg]} = best then '{lg}' else {chain} end"
    return f"(select case when best > 0 then {chain} else 'und' end from (select {best} as best))"


# ------------------------------------------------------------- repetition

def repetition_line_features(col: Column) -> dict[str, Column]:
    """Gopher-style repetition signals over lines (Rae et al. 2021 §A1.1):
    the fraction of duplicated lines is a strong boilerplate indicator.
    Pure codegen — array ops over the split, no shuffle, no Python."""
    lines = F.split(col, "\n")
    n_lines = F.size(lines)
    n_dup = n_lines - F.size(F.array_distinct(lines))
    return {
        "n_lines": n_lines,
        "dup_line_frac": F.round(
            n_dup.cast("double") / F.greatest(n_lines, F.lit(1)), 6),
    }


def word_ngrams_of(w: Column, n: int) -> Column:
    """Word n-grams over an ALREADY-BOUND word-array column. Catalyst
    does no CSE inside transform() lambdas, so callers must bind the
    split to a real column in its own projection first — passing
    `split(normalize(text))` inline re-evaluates the regexp+split once
    per element_at, O(grams * n * doclen) instead of O(doclen + grams)
    (the word_ngram_hashes lesson; measured 70-150s legs at sf1.0).
    Guarded by a CASE: Spark's sequence(1, 0) would *descend* ([1, 0]),
    so <n-word docs short-circuit to an empty array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return (F.when(F.size(w) < n, F.array().cast("array<string>"))
            .otherwise(grams))


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of normalized text as an array column. NOTE: inline
    form — fine for occasional use, but hot paths should bind the word
    array to a column and use `word_ngrams_of` / `word_ngram_rows` (see
    word_ngrams_of docstring for why)."""
    return word_ngrams_of(F.split(normalize_text(col), " "), n)


def word_ngram_rows(df: DataFrame, text_col: str, n: int,
                    keep_cols: tuple = ()) -> DataFrame:
    """(keep_cols..., gram string) — one exploded row per word n-gram,
    with the word array bound to a real column first and the narrow
    scan spread (the fast-gram shape of word_ngram_hashes, for callers
    that need gram STRINGS). Same values as
    explode(word_ngrams(text_col, n))."""
    from linkinator_spark.functions.partitioning import spread_small_scan

    base = spread_small_scan(
        df.select(*keep_cols, F.col(text_col)))
    return (
        base.select(*keep_cols,
                    F.split(normalize_text(F.col(text_col)), " ").alias("_w"))
        .select(*keep_cols,
                F.explode(word_ngrams_of(F.col("_w"), n)).alias("gram"))
    )


def word_bigrams(col: Column) -> Column:
    """Word 2-grams (see word_ngrams)."""
    return word_ngrams(col, 2)


def word_ngram_hashes(df: DataFrame, text_col: str, n: int,
                      id_col: str = "doc_id") -> DataFrame:
    """(id_col, gram:bigint) — one row per word n-gram of `text_col`,
    hashed to xxhash64 of the n-word tuple. This is the FAST gram path:

    - the word array is bound to a real column in its own projection
      first. Catalyst does no CSE inside transform() lambdas, so building
      grams directly off ``split(normalize(text))`` re-evaluates the
      regexp+split once per element_at — O(grams * n * doclen) instead of
      O(doclen + grams * n). Measured 26.5s -> 2.9s over sf0.1 documents
      (236k 8-grams). CollapseProject keeps the projection separate
      because the alias is referenced n+2 times.
    - the gram is hashed as an n-column xxhash64 tuple, never
      materialized as a concatenated string.
    """
    w = F.col("_w")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.xxhash64(*[F.element_at(w, i + j) for j in range(n)]))
    grams = (F.when(F.size(w) < n, F.array().cast("array<bigint>"))
             .otherwise(grams))
    from linkinator_spark.functions.partitioning import spread_small_scan

    # the gram transform + explode is the heaviest map stage of the
    # decontamination family; a single-row-group parquet scan would pin it
    # onto 1-2 tasks (spread is a no-op on already-wide inputs)
    base = spread_small_scan(df.select(id_col, F.col(text_col)))
    return (
        base.select(id_col,
                    F.split(normalize_text(F.col(text_col)), " ").alias("_w"))
        .select(id_col, F.explode(grams).alias("gram"))
    )


# -------------------------------------------------------------------- PII

# Conservative regexes that parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + bounded repeats only — no lookaround,
# no backrefs. Both engines match greedy leftmost, so counts agree.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9][0-9()\- ]{6,}[0-9]"
# SSN-shaped: ddd-dd-dddd with hard word boundaries
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# card-shaped: 13-19 digits with optional single space/dash group
# separators (too few digits for a phone match to pre-empt it; SSNs are
# 9 digits so the classes cannot overlap)
PII_CARD_RE = r"\b[0-9](?:[ -]?[0-9]){12,18}\b"


def pii_counts(col: Column) -> dict[str, Column]:
    """Occurrence counts per PII class — single-pass codegen expressions."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(col, F.lit(PII_IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PII_PHONE_RE), 0)),
        "n_ssns": F.size(F.regexp_extract_all(col, F.lit(PII_SSN_RE), 0)),
        "n_cards": F.size(F.regexp_extract_all(col, F.lit(PII_CARD_RE), 0)),
    }


def redact_pii(col: Column) -> Column:
    """Replace PII spans with typed placeholders. Email first (its local
    part can contain digits), then IPv4 (dots would otherwise feed the
    phone class), then phone, then SSN (9 digits — never card-shaped),
    then card last (longest digit runs; earlier passes have already
    consumed the digit spans of the other classes)."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    out = F.regexp_replace(out, PII_SSN_RE, "<SSN>")
    return F.regexp_replace(out, PII_CARD_RE, "<CARD>")


# ------------------------------------------------------------- fingerprint

def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form for dedup keys."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def content_fingerprint(col: Column) -> Column:
    """Whole-document fingerprint over normalized text."""
    return portable_hash64(normalize_text(col))


def shingles(col: Column, k: int = 5) -> Column:
    """Character k-gram shingles, JVM-side: transform over a sequence."""
    n = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, k))


def kgram_min_fingerprint(col: Column, k: int = 8) -> Column:
    """Min-hash over k-gram shingles of normalized text: a 1-permutation
    rolling-hash document fingerprint (robust to small edits)."""
    norm = normalize_text(col)
    return F.array_min(F.transform(shingles(norm, k), lambda s: portable_hash64(s)))


# ---------------------------------------------------------------- license

# Substring markers per license class, matched on lowercased text with
# plain `contains` (no regex at all — cheapest codegen predicate, and
# trivially identical in Spark and DuckDB). Each class matches if ANY of
# its markers occurs; classification picks the FIRST matching class in
# LICENSE_CLASSES order (most-restrictive-variant-first within the CC
# family, so "by-nc-sa" never misreads as plain "by").
LICENSE_CLASSES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("cc-by-nc", ("creativecommons.org/licenses/by-nc", "cc by-nc")),
    # by-nd must precede the generic cc-by markers: a no-derivatives URL
    # contains "licenses/by" and would otherwise classify as permissive
    ("cc-by-nd", ("creativecommons.org/licenses/by-nd", "cc by-nd")),
    ("cc-by-sa", ("creativecommons.org/licenses/by-sa", "cc by-sa")),
    ("cc-by", ("creativecommons.org/licenses/by", "cc by 4.0",
               "cc by 3.0")),
    ("cc0", ("creativecommons.org/publicdomain", "cc0 1.0",
             "public domain dedication")),
    ("mit", ("mit license", "licensed under the mit")),
    ("apache", ("apache license",)),
    ("gpl", ("gnu general public license", "gnu gpl")),
    ("all-rights-reserved", ("all rights reserved",)),
)


def license_detect(col: Column) -> Column:
    """Document license classification from in-text markers — the gate a
    license-aware corpus build filters on (keep permissive, drop
    NC/all-rights-reserved). Returns the first matching class name in
    LICENSE_CLASSES order, or 'none'. One lower() + a chain of contains
    ORs — a single whole-stage-codegen projection, zero regex."""
    lowered = F.lower(col)
    expr = F.lit("none")
    for name, markers in reversed(LICENSE_CLASSES):
        hit = F.lit(False)
        for m in markers:
            hit = hit | lowered.contains(m)
        expr = F.when(hit, F.lit(name)).otherwise(expr)
    return expr


def license_detect_sql(expr: str) -> str:
    """DuckDB twin of :func:`license_detect` (shared definition site:
    both engines walk LICENSE_CLASSES in order)."""
    sql = "'none'"
    for name, markers in reversed(LICENSE_CLASSES):
        cond = " or ".join(
            f"contains(lower({expr}), '{m}')" for m in markers)
        sql = f"case when {cond} then '{name}' else {sql} end"
    return sql
