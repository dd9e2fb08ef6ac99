"""Main-content extraction: HTML boilerplate removal by block-level
link-density and stopword-density classification.

The jusText family of heuristics (Pomikálek 2011; the same signals
trafilatura uses, which RefinedWeb §3.1 adopts for its text-extraction
stage): split markup into block-level segments, score each block on

* word count (short fragments are menus/buttons),
* link density (chars of anchor text / chars of text — navigation is
  mostly links),
* stopword density (real prose in a known language is stopword-rich;
  cookie banners and breadcrumbs are not),

and keep only prose-like blocks. The reference (JustinBeckwith/
linkinator) parses HTML solely to *extract links* (src/links.ts); a
training-data pipeline needs the complementary projection — the text
with the link furniture removed.

Scale shape: one pure codegen projection — a regexp block split, then
per-block features inside ``F.transform`` lambdas (string functions
stay in whole-stage codegen inside higher-order functions), then an
array filter + join. No UDF, no shuffle, no driver state; the DuckDB
twin below shares the regex and threshold constants so the oracle and
the engine have one definition point (the graphgen/cdx pattern). All
regexes sit in the Java ∩ RE2-safe subset (no backrefs/lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level boundaries: opening OR closing forms of structural tags
BLOCK_SPLIT_RE = (
    "</?(p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|table|tr|td|nav|footer|header|"
    "section|article|aside|blockquote|br)[^>]*>"
)
TAG_RE = "<[^>]*>"
ANCHOR_TEXT_RE = "<a[^>]*>([^<]*)</a>"

# the classification thresholds (jusText-lite)
MIN_WORDS = 5           # blocks shorter than this are furniture
MAX_LINK_DENSITY = 0.3  # more anchor text than this => navigation
MIN_STOPWORD_DENSITY = 0.1  # prose in-language is stopword-rich

# small high-frequency English function-word list — enough signal for
# the density test; swap per-language lists at the call site
STOPWORDS = (
    "the a an and or of to in is are was were it this that for on "
    "with as at be by from has have not but").split()


def _block_features(block: Column, stop_lit: Column):
    """(text, n_words, link_chars) of one raw block — codegen only."""
    anchor_join = F.array_join(
        F.regexp_extract_all(block, F.lit(ANCHOR_TEXT_RE), F.lit(1)), "")
    text = F.trim(F.regexp_replace(block, TAG_RE, " "))
    text = F.regexp_replace(text, "\\s+", " ")
    words = F.when(text == "", F.expr("cast(array() as array<string>)")
                   ).otherwise(F.split(F.lower(text), " "))
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_lit, w)))
    return text, n_words, n_stop, F.length(anchor_join)


def main_content(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = MIN_WORDS,
    max_link_density: float = MAX_LINK_DENSITY,
    min_stopword_density: float = MIN_STOPWORD_DENSITY,
) -> DataFrame:
    """doc → (doc_id, main_text, n_blocks, n_kept, removed_chars).

    ``main_text`` is the newline-join of blocks classified as prose;
    ``removed_chars`` counts text characters the filter dropped — the
    boilerplate mass, a useful per-domain quality signal.
    """
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    blocks = F.split(F.col(html_col), BLOCK_SPLIT_RE)

    def featurize(b):
        text, n_words, n_stop, link_chars = _block_features(b, stop_lit)
        keep = (
            (n_words >= min_words)
            & (link_chars <= max_link_density * F.length(text))
            & (n_stop >= min_stopword_density * n_words)
        )
        return F.struct(text.alias("text"), n_words.alias("n_words"),
                        keep.alias("keep"))

    feats = F.filter(F.transform(blocks, featurize),
                     lambda s: s["text"] != "")
    kept = F.filter(feats, lambda s: s["keep"])
    from linkinator_spark.functions.partitioning import spread_small_scan

    # the block featurization is a deep interpreted higher-order tree;
    # spread a narrow scan so it uses every core (no-op on wide inputs)
    docs = spread_small_scan(docs.select(id_col, html_col))
    return docs.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["text"]), "\n")
         .alias("main_text"),
        F.size(feats).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        (F.aggregate(feats, F.lit(0),
                     lambda acc, s: acc + F.length(s["text"]))
         - F.aggregate(kept, F.lit(0),
                       lambda acc, s: acc + F.length(s["text"])))
        .alias("removed_chars"),
    )


def main_content_oracle_sql(
    html_expr: str,
    id_expr: str = "doc_id",
    from_clause: str = "documents",
    min_words: int = MIN_WORDS,
    max_link_density: float = MAX_LINK_DENSITY,
    min_stopword_density: float = MIN_STOPWORD_DENSITY,
) -> str:
    """DuckDB twin of :func:`main_content` over the same constants —
    list_transform/list_filter mirror the codegen lambdas."""
    stoplist = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return f"""
      with src as (
        select {id_expr} as doc_id, {html_expr} as html from {from_clause}
      ),
      blk as (
        select doc_id,
               list_transform(
                 string_split_regex(html, '{BLOCK_SPLIT_RE}'),
                 b -> struct_pack(
                   text := regexp_replace(trim(
                       regexp_replace(b, '{TAG_RE}', ' ', 'g')),
                       '\\s+', ' ', 'g'),
                   link_chars := length(coalesce(array_to_string(
                       regexp_extract_all(b, '{ANCHOR_TEXT_RE}', 1), ''),
                       ''))
                 )) as feats0
        from src
      ),
      feat as (
        select doc_id,
               list_filter(
                 list_transform(feats0, s -> struct_pack(
                   text := s.text,
                   n_words := case when s.text = '' then 0
                              else len(string_split(lower(s.text), ' '))
                              end,
                   n_stop := case when s.text = '' then 0
                             else len(list_filter(
                                 string_split(lower(s.text), ' '),
                                 w -> list_contains({stoplist}, w)))
                             end,
                   link_chars := s.link_chars)),
                 s -> s.text <> '') as feats
        from blk
      ),
      cls as (
        select doc_id, feats,
               list_filter(feats, s ->
                   s.n_words >= {min_words}
                   and s.link_chars <= {max_link_density} * length(s.text)
                   and s.n_stop >= {min_stopword_density} * s.n_words
               ) as kept
        from feat
      )
      select doc_id,
             coalesce(array_to_string(
                 list_transform(kept, s -> s.text), chr(10)), '')
               as main_text,
             cast(len(feats) as int) as n_blocks,
             cast(len(kept) as int) as n_kept,
             cast(coalesce(list_sum(list_transform(feats, s -> length(s.text))), 0)
                  - coalesce(list_sum(
                        list_transform(kept, s -> length(s.text))), 0)
                  as int) as removed_chars
      from cls
    """
