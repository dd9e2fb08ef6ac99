"""Corpus-level exact line deduplication (CCNet / RefinedWeb style).

Where C4 (functions/c4.py) filters lines by their own shape, this pass
removes lines BECAUSE they repeat across the corpus: navigation bars,
cookie banners, footers and other boilerplate appear verbatim on many
pages, and per-paragraph/per-line duplicate removal is the published
fix — CCNet deduplicates paragraphs by hash across shards (Wenzek et
al., LREC 2020, §3.1) and RefinedWeb's line-wise filter drops lines
repeated across documents (Penedo et al. 2023, §3.2). The reference
crawler has no corpus store, so this is new surface for the
training-data pipeline, not reference parity.

Line identity follows CCNet's normalization: lowercase, trim, and fold
every digit to '0' before hashing, so "© 2023 Example" and
"© 2024 Example" are the same boilerplate line.

Scale shape (100-TB lens):
  1. `posexplode(split(text))` — pure map stage, no shuffle.
  2. duplicated-line detection: distinct on the COMPOSITE
     (line_key, doc_id) — uniform even when one banner sits in every
     document, because the doc id spreads the hot line — then a
     map-side-combined count per line_key with `HAVING >= min_dup_docs`.
  3. the surviving duplicate set is boilerplate-sized (≪ corpus lines)
     and ships as a broadcast of 8-byte xxhash64 keys; lines probe it
     map-side (same degrade path as decontamination: flip to a shuffle
     hash join if a pathological corpus outgrows the broadcast — AQE
     skew-join splits the hot banner key there).
  4. per-doc reassembly is ONE shuffle keyed on the uniform doc id;
     per-key state is bounded by a single document's own line count.
No driver-side state, no global sort, no per-row Python anywhere.

A 64-bit hash collision could only drop an innocent line whose xxhash64
equals a boilerplate line's (≈ n_keys * n_dups / 2^64 — vanishing); the
DuckDB twin joins on the normalized string itself, which the per-round
oracle run would surface as a value mismatch if it ever fired.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["line_key", "duplicated_line_keys", "line_dedup",
           "line_dedup_oracle_sql", "LINE_KEY_SQL"]


def line_key(line: Column) -> Column:
    """CCNet-normalized line identity: lowercase, trim, digits -> '0'.
    Same expression under Java regex and RE2/DuckDB."""
    return F.regexp_replace(F.lower(F.trim(line)), "[0-9]", "0")


# DuckDB twin of `line_key` over a line expression named `l`
LINE_KEY_SQL = "regexp_replace(lower(trim(l)), '[0-9]', '0', 'g')"


def _exploded_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from linkinator_spark.functions.partitioning import spread_small_scan

    # spread a narrow scan under the line explode (no-op on wide inputs)
    return spread_small_scan(docs.select(id_col, text_col)).select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("line_hash", F.xxhash64(line_key(F.col("line"))))


def duplicated_line_keys(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_dup_docs: int = 2,
) -> DataFrame:
    """One column `line_hash`: the xxhash64 of every normalized line
    that appears in >= `min_dup_docs` DISTINCT documents. Built with a
    composite-key distinct (hot banner lines stay uniform) and a
    map-side-combined count."""
    lines = _exploded_lines(docs, id_col, text_col)
    return (
        lines.select("line_hash", id_col).distinct()
        .groupBy("line_hash").count()
        .filter(F.col("count") >= min_dup_docs)
        .select("line_hash")
    )


def line_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_dup_docs: int = 2,
) -> DataFrame:
    """Remove every line that occurs in >= `min_dup_docs` distinct
    documents; one output row per input doc:

      (id_col, n_lines, n_removed, cleaned_md5)

    where cleaned_md5 fingerprints the surviving lines joined by
    newline in original order (md5 of '' when nothing survives), so the
    oracle comparison is value-checked without shipping full text
    through the hash harness."""
    lines = _exploded_lines(docs, id_col, text_col)
    dups = duplicated_line_keys(
        docs, id_col, text_col, min_dup_docs
    ).withColumn("_dup", F.lit(1))
    marked = lines.join(F.broadcast(dups), "line_hash", "left")
    kept_sorted = F.transform(
        F.array_sort(F.collect_list(
            F.when(F.col("_dup").isNull(), F.struct("pos", "line")))),
        lambda s: s.line,
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_removed"),
            F.md5(F.array_join(kept_sorted, "\n")).alias("cleaned_md5"),
        )
    )


def line_dedup_oracle_sql(
    docs_table: str = "documents", text_expr: str = "text",
    id_col: str = "doc_id", min_dup_docs: int = 2,
) -> str:
    """DuckDB twin of `line_dedup` — identical normalization and
    duplicate rule, joined on the normalized STRING (no hash), so the
    comparison also cross-checks the Spark side's 64-bit-hash probe."""
    key_of = LINE_KEY_SQL
    return f"""
        with split as (
          select {id_col}, string_split({text_expr}, chr(10)) as ls
          from {docs_table}
        ),
        lines as (
          select {id_col}, j as pos, ls[j + 1] as l
          from split, lateral (select unnest(range(0, len(ls))) as j)
        ),
        keyed as (
          select {id_col}, pos, l, {key_of} as key from lines
        ),
        dups as (
          select key
          from (select distinct key, {id_col} from keyed)
          group by key having count(*) >= {min_dup_docs}
        ),
        marked as (
          select k.{id_col}, k.pos, k.l, (d.key is not null) as dup
          from keyed k left join dups d using (key)
        )
        select {id_col},
               count(*)::bigint as n_lines,
               sum(case when dup then 1 else 0 end)::bigint as n_removed,
               md5(coalesce(string_agg(case when not dup then l end,
                                       chr(10) order by pos), ''))
                 as cleaned_md5
        from marked
        group by {id_col}
    """
