"""Interleaved text+media sequence assembly — the step that turns the
span table (the north-rule input shape: doc_id, spans array of
(kind, text, media_ref, offset)) back into a model-ready token stream.

A multimodal training pipeline stores documents as interleaved spans
(text chunks and media references in reading order, e.g. Flamingo /
MMC4-style corpora); before tokenization each document is RENDERED: the
spans sorted by offset, media spans replaced by a typed placeholder
token carrying the reference (`<|media:REF|>`), text spans passed
through, all joined in order. This module does that over the EXPLODED
span table — the shape the extraction and crawl stages emit — so it is
the reassembly half of span_flatten's invariant.

Determinism: reassembly is `array_sort` over (offset, piece) structs
after a collect_list — collect_list order is partition-dependent, the
sort makes the result a pure function of the span set (offsets are
unique per doc by the span invariant). Counts are exact int64; the
rendered stream is value-checked by md5.

Scale shape (100-TB lens): one shuffle, keyed by the doc id — uniform,
no hot key at any corpus size; per-task memory is bounded by a single
document's span list (the same bound any per-doc operation carries).
Everything else is whole-stage-codegen array ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["render_spans", "render_spans_oracle_sql",
           "caption_pairs", "caption_pairs_oracle_sql",
           "gate_interleaved"]


def render_spans(
    spans: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Reassemble rendered sequences from an exploded span table with
    columns (id_col, kind, text, media_ref, offset).

    Output, one row per document:
      (id_col, n_spans, n_text_spans, n_media_spans, n_chars,
       rendered_md5)
    where the rendered stream is the offset-ordered concatenation of
    text pieces and `<|media:REF|>` placeholders, n_chars its length,
    and rendered_md5 its fingerprint (the md5 keeps the oracle
    comparison value-checked without shipping full text through the
    hash harness)."""
    piece = F.when(
        F.col("kind") == "media_ref",
        F.concat(F.lit("<|media:"), F.col("media_ref"), F.lit("|>")),
    ).otherwise(F.col("text"))
    keyed = spans.select(
        F.col(id_col).alias("id"),
        F.col("kind"),
        F.struct(F.col("offset").alias("o"), piece.alias("p")).alias("sp"),
    )
    agg = keyed.groupBy("id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
        .alias("n_text_spans"),
        F.sum(F.when(F.col("kind") == "media_ref", 1).otherwise(0))
        .alias("n_media_spans"),
        F.array_sort(F.collect_list("sp")).alias("sps"),
    )
    rendered = F.array_join(
        F.transform(F.col("sps"), lambda s: s.getField("p")), "")
    return agg.select(
        F.col("id").alias(id_col),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_text_spans").cast("long").alias("n_text_spans"),
        F.col("n_media_spans").cast("long").alias("n_media_spans"),
        F.length(rendered).cast("long").alias("n_chars"),
        F.md5(rendered).alias("rendered_md5"),
    )


def render_spans_oracle_sql(
    spans_sql: str, id_col: str = "doc_id",
) -> str:
    """DuckDB twin of render_spans over a span-table subquery with the
    same columns; ordered string_agg replays the offset sort."""
    return f"""
        with spans as ({spans_sql}),
        pieces as (
          select {id_col}, kind, "offset",
                 case when kind = 'media_ref'
                      then '<|media:' || media_ref || '|>'
                      else text end as p
          from spans
        )
        select {id_col},
               count(*)::bigint as n_spans,
               sum(case when kind = 'text' then 1 else 0 end)::bigint
                 as n_text_spans,
               sum(case when kind = 'media_ref' then 1 else 0 end)::bigint
                 as n_media_spans,
               length(string_agg(p, '' order by "offset"))::bigint
                 as n_chars,
               md5(string_agg(p, '' order by "offset")) as rendered_md5
        from pieces
        group by {id_col}
    """


def caption_pairs(
    spans: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """MMC4/OBELICS-style media-text alignment: pair every media span
    with its best caption — the nearest text span by span offset, ties
    to the EARLIER text (the preceding-caption convention).

    Input: the exploded span table (id_col, kind, text, media_ref,
    offset). Output, one row per media span that has at least one
    non-empty text span in its document:
      (id_col, media_ref, media_offset, caption_offset, caption)

    Everything after the one doc-keyed collect is whole-stage-codegen
    array work: texts and medias are filtered views of the sorted span
    array, and the best caption is a sequential `aggregate` fold over
    the texts (strict less-than on the distance, so the first — lowest
    offset — wins ties). Per-task memory is bounded by a single
    document's span list; the only shuffle keys on the uniform doc id.
    DuckDB twin: caption_pairs_oracle_sql (join + rank form — same
    pairs, proven by the strict-tie argument above)."""
    agg = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("offset").alias("o"), F.col("kind").alias("k"),
            F.col("text").alias("t"), F.col("media_ref").alias("m"),
        ))).alias("sps"))
    texts = F.filter(
        F.col("sps"),
        lambda s: (s.getField("k") == "text")
        & (F.length(s.getField("t")) > 0))
    medias = F.filter(F.col("sps"), lambda s: s.getField("k") == "media_ref")
    big = F.lit(1 << 62).cast("long")

    def best_for(m):
        init = F.struct(
            big.alias("d"),
            F.lit(-1).cast("int").alias("o"),
            F.lit("").alias("t"))
        return F.aggregate(
            texts, init,
            lambda acc, t: F.when(
                F.abs(t.getField("o") - m.getField("o")).cast("long")
                < acc.getField("d"),
                F.struct(
                    F.abs(t.getField("o") - m.getField("o")).cast("long")
                    .alias("d"),
                    t.getField("o").alias("o"),
                    t.getField("t").alias("t")),
            ).otherwise(acc))

    pairs = F.transform(
        medias,
        lambda m: F.struct(
            m.getField("m").alias("media_ref"),
            m.getField("o").alias("media_offset"),
            best_for(m).alias("best")))
    return (
        agg.select(id_col, F.explode(pairs).alias("p"))
        .filter(F.col("p.best.o") >= 0)
        .select(
            id_col,
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.media_offset").cast("int").alias("media_offset"),
            F.col("p.best.o").cast("int").alias("caption_offset"),
            F.col("p.best.t").alias("caption"),
        )
    )


def caption_pairs_oracle_sql(spans_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of caption_pairs: media x text join per doc, rank by
    (|offset diff|, text offset, text) within each (doc, media offset,
    media_ref) — identical pairs to the fold form, whose array_sort
    orders texts by (offset, kind, text) and whose strict less-than
    keeps the first. Two media spans sharing BOTH offset and media_ref
    (a violation of the span uniqueness invariant) would emit one row
    here but two identical rows from the fold."""
    return f"""
        with spans as ({spans_sql}),
        texts as (
          select {id_col}, "offset" as to_, text
          from spans where kind = 'text' and length(text) > 0),
        medias as (
          select {id_col}, "offset" as mo, media_ref
          from spans where kind = 'media_ref'),
        ranked as (
          select m.{id_col}, m.media_ref, m.mo, t.to_, t.text,
                 row_number() over (
                   partition by m.{id_col}, m.mo, m.media_ref
                   order by abs(t.to_ - m.mo), t.to_, t.text) as rn
          from medias m join texts t using ({id_col}))
        select {id_col}, media_ref,
               cast(mo as int) as media_offset,
               cast(to_ as int) as caption_offset,
               text as caption
        from ranked where rn = 1
    """


def gate_interleaved(
    spans: DataFrame,
    id_col: str = "doc_id",
    min_media: int = 1,
    max_media: int = 32,
    min_tokens: int = 32,
    min_tokens_per_media: int = 8,
) -> DataFrame:
    """OBELICS-style document gate for interleaved corpora (Laurencon et
    al. 2023 §3.3: multimodal web documents are kept only when the image
    count and the text/image balance sit inside sane bounds — a gallery
    page of 200 thumbnails or a document whose only text is a nav bar is
    crawl noise, not training signal).

    One row per document with exact integer stats and the gate verdict:
    (id_col, n_spans, n_media, n_text, n_tokens, keep, reject_reason).
    Rules, checked in order (the FIRST failure is the reason, '' = keep):

    * ``too_few_media``  — n_media < min_media
    * ``too_many_media`` — n_media > max_media
    * ``too_few_tokens`` — n_tokens < min_tokens (regex token count over
      text spans, functions/text.TOKEN_RE — the same tokenizer the
      quality and packing stages use)
    * ``low_text_media_ratio`` — n_tokens < min_tokens_per_media * n_media
      (the cross-multiplied form: no float division)

    Scale shape: ONE groupBy on the uniform doc id whose conditional
    sums all partial-aggregate map-side; the verdict is a codegen CASE
    chain. No window, no join, no Python.
    """
    from linkinator_spark.functions.text import token_count

    is_media = F.col("kind") == "media_ref"
    is_text = F.col("kind") == "text"
    stats = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(is_media.cast("long")).alias("n_media"),
        F.sum(is_text.cast("long")).alias("n_text"),
        F.sum(F.when(is_text, token_count(F.col("text")))
              .otherwise(F.lit(0)).cast("long")).alias("n_tokens"),
    )
    reason = (
        F.when(F.col("n_media") < min_media, F.lit("too_few_media"))
        .when(F.col("n_media") > max_media, F.lit("too_many_media"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens"))
        .when(F.col("n_tokens") < F.col("n_media") * min_tokens_per_media,
              F.lit("low_text_media_ratio"))
        .otherwise(F.lit(""))
    )
    return stats.withColumn("reject_reason", reason).withColumn(
        "keep", F.col("reject_reason") == "")
