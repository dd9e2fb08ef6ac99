"""JSONL training-shard export — the interchange format LLM data
pipelines feed to trainers and exchange between curation stages (one
JSON object per line; sharded .jsonl.gz files, e.g. the Dolma /
RedPajama / FineWeb release layout).

The reference's JSON sink (src/cli.ts --format json) serializes one
report for a human; this is the corpus-scale counterpart: documents →
deterministic per-shard line files, and the inverse reader for
re-ingesting shards written by us or by other tools.

Scale shape: the per-row JSON build is codegen (``to_json`` over a
struct); shard assembly is ONE shuffle on the caller's shard key with
in-shard order fixed by ``array_sort`` (same input → byte-identical
shards, the warc_files discipline); gzip members are mtime-0
deterministic. The reader is an Arrow-batched map stage over blobs.
A shard must fit one task — callers size shards like any output file
(doc_pack's layout keys slot in directly as ``shard_col``).
"""

from __future__ import annotations

import gzip
import io
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

READ_SCHEMA = ("shard string, line_no int, doc_id string, text string, "
               "meta string")


def jsonl_shards(
    docs: DataFrame,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = (),
    gzip_blob: bool = True,
) -> DataFrame:
    """(shard, n_docs, jsonl binary): one blob per shard, one JSON
    object per line, lines ordered by ``id_col``. ``meta_cols`` ride
    along under a ``meta`` object."""
    fields = [F.col(id_col).cast("string").alias("id"),
              F.col(text_col).alias("text")]
    if meta_cols:
        fields.append(
            F.struct(*[F.col(c) for c in meta_cols]).alias("meta"))
    line = F.to_json(F.struct(*fields))
    grouped = (
        docs.select(F.col(shard_col).alias("shard"),
                    F.col(id_col).cast("string").alias("_id"),
                    line.alias("_line"))
        .groupBy("shard")
        .agg(
            F.array_sort(F.collect_list(
                F.struct(F.col("_id"), F.col("_line")))).alias("_ls"),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
        )
        .withColumn(
            "_text",
            F.concat(
                F.array_join(
                    F.transform(F.col("_ls"), lambda s: s["_line"]),
                    "\n"),
                F.lit("\n")))
    )
    if not gzip_blob:
        return grouped.select(
            "shard", "n_docs", F.encode("_text", "UTF-8").alias("jsonl"))

    def gz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for text in pdf["_text"]:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(text.encode("utf-8"))
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"shard": pdf["shard"],
                                "n_docs": pdf["n_docs"],
                                "jsonl": blobs})

    return grouped.select("shard", "n_docs", "_text").mapInPandas(
        gz, "shard string, n_docs int, jsonl binary")


def read_jsonl_shards(files: DataFrame,
                      blob_col: str = "jsonl") -> DataFrame:
    """Inverse of :func:`jsonl_shards`: blobs → one row per line with
    its in-file ordinal. Unknown/extra keys land in ``meta`` as a JSON
    string (round-trips foreign shards losslessly)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf["shard"], pdf[blob_col]):
                raw = bytes(blob)
                if raw[:2] == b"\x1f\x8b":
                    raw = gzip.decompress(raw)
                for i, ln in enumerate(
                        raw.decode("utf-8").splitlines()):
                    if not ln.strip():
                        continue
                    obj = json.loads(ln)
                    rows.append({
                        "shard": shard, "line_no": i,
                        "doc_id": str(obj.pop("id", "")),
                        "text": obj.pop("text", None),
                        "meta": (json.dumps(obj["meta"], sort_keys=True)
                                 if "meta" in obj else
                                 (json.dumps(obj, sort_keys=True)
                                  if obj else None)),
                    })
            yield pd.DataFrame(
                rows, columns=["shard", "line_no", "doc_id", "text",
                               "meta"])

    return files.select("shard", blob_col).mapInPandas(fn, READ_SCHEMA)
