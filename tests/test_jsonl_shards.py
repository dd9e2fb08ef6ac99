"""JSONL shard export/ingest (sources/jsonl.py): roundtrip, ordering,
determinism, foreign-shard ingestion."""

import gzip
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkinator_spark.sources import jsonl as JL


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:02d}", f"text {i} with \"quotes\" and\nnewline",
             "en" if i % 2 else "de", i) for i in range(10)]
    return spark.createDataFrame(
        rows, "doc_id string, text string, lang string, n int"
    ).withColumn("shard", F.concat(F.lit("s"), (F.col("n") % 3).cast("string")))


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(spark, docs, gz):
    files = JL.jsonl_shards(docs, meta_cols=("lang", "n"), gzip_blob=gz)
    back = JL.read_jsonl_shards(files).toPandas()
    src = docs.toPandas()
    assert len(back) == len(src)
    merged = back.merge(src, on="doc_id", suffixes=("_rt", ""))
    assert (merged["text_rt"] == merged["text"]).all()
    for _, r in merged.iterrows():
        meta = json.loads(r["meta"])
        assert meta == {"lang": r["lang"], "n": r["n"]}
        assert r["shard_rt"] == r["shard"]


def test_lines_sorted_by_id(spark, docs):
    files = JL.jsonl_shards(docs, gzip_blob=False)
    back = JL.read_jsonl_shards(files, blob_col="jsonl").toPandas()
    for shard, grp in back.groupby("shard"):
        ordered = grp.sort_values("line_no")["doc_id"].tolist()
        assert ordered == sorted(ordered)


def test_deterministic_bytes(spark, docs):
    a = {r["shard"]: bytes(r["jsonl"]) for r in
         JL.jsonl_shards(docs).collect()}
    b = {r["shard"]: bytes(r["jsonl"]) for r in
         JL.jsonl_shards(docs.repartition(5).orderBy(F.rand(11))).collect()}
    assert a == b
    assert all(v[:2] == b"\x1f\x8b" for v in a.values())


def test_foreign_shard_ingest(spark):
    """A shard written by another tool: extra top-level keys survive in
    meta; missing text tolerated."""
    lines = [
        {"id": "x1", "text": "hello", "source": "cc", "score": 0.5},
        {"id": "x2", "text": "world"},
    ]
    blob = gzip.compress(
        ("\n".join(json.dumps(o) for o in lines) + "\n").encode())
    files = spark.createDataFrame(
        pd.DataFrame({"shard": ["f0"], "jsonl": [blob]}))
    back = JL.read_jsonl_shards(files).toPandas().sort_values("line_no")
    assert list(back.doc_id) == ["x1", "x2"]
    assert json.loads(back.meta.iloc[0]) == {"source": "cc", "score": 0.5}
    assert back.meta.iloc[1] is None or pd.isna(back.meta.iloc[1])
