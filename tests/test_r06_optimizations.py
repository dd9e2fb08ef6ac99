"""Round-6 optimization invariants: every rewritten internal must be
result-identical to the shape it replaced.

* cosine_topk: the GEMM-prune + exact-re-rank gear == the brute-force
  gear, row for row, including duplicate-vector ties (the exact window
  orders ties; the prune only needs to capture them).
* jaccard_pairs: codegen position-explode shingle sets give the same
  pairs/values as the interpreted array form (pinned via the public
  function against hand-built docs with dup shingles + short docs).
* WARC _inflate: linear member loop == gzip.decompress on multi-member,
  single-member and non-gzip blobs.
* spread_small_scan: row-preserving, and a no-op on already-wide inputs.
"""

import gzip
import io

import pytest
from pyspark.sql import functions as F

from linkinator_spark.functions.similarity import cosine_topk


def test_cosine_gears_identical_with_ties(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    # 5 exact duplicates of vector 3: cosine ties at 1.0 for query 3,
    # ordered by neighbor_id in the exact window
    for j in range(5):
        rows.append((100 + j, [float(x) for x in base[3]]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = vecs.filter("vec_id in (0, 3, 7)").select(
        F.col("vec_id").alias("query_id"), "embedding")
    a = sorted(tuple(r) for r in
               cosine_topk(vecs, queries, k=4, gear="arrow").collect())
    b = sorted(tuple(r) for r in
               cosine_topk(vecs, queries, k=4, gear="sql").collect())
    assert a == b
    # the tie block for query 3 resolves to the smallest neighbor ids
    q3 = [r for r in a if r[0] == 3]
    assert [n for (_, n, _, _) in sorted(q3, key=lambda t: t[3])][:2] == [3, 100]


def test_jaccard_codegen_shingles_match_expression_form(spark):
    from linkinator_spark.functions.dedup import jaccard_pairs
    from linkinator_spark.functions.text import normalize_text, shingles

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "abcabcabcabcabc"),          # duplicate shingles
         (4, "abcabcabcabcabc"),
         (5, "tiny"),                      # shorter than k
         (6, "tiny")],
        "doc_id long, text string")
    cands = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (1, 5)], "doc_a long, doc_b long")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs(docs, cands, threshold=0.0, k=5).collect()}
    # expected via the original interpreted array form
    sh = docs.select(
        "doc_id",
        F.array_distinct(shingles(normalize_text(F.col("text")), 5)).alias("sh"))
    arr = {r["doc_id"]: set(r["sh"]) for r in sh.collect()}
    for (a, b) in [(1, 2), (3, 4), (5, 6), (1, 5)]:
        inter = len(arr[a] & arr[b])
        union = len(arr[a] | arr[b])
        assert got[(a, b)] == pytest.approx(
            round(inter / max(union, 1.0), 6), abs=0), (a, b)
    assert got[(3, 4)] == 1.0 and got[(5, 6)] == 1.0


def test_warc_inflate_matches_gzip_decompress():
    from linkinator_spark.sources.warc import _inflate

    members = [b"alpha" * 40, b"", b"b" * 10000, b"tail"]
    buf = io.BytesIO()
    for m in members:
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(m)
    blob = buf.getvalue()
    assert _inflate(blob) == gzip.decompress(blob) == b"".join(members)
    one = io.BytesIO()
    with gzip.GzipFile(fileobj=one, mode="wb", mtime=0) as g:
        g.write(b"solo")
    assert _inflate(one.getvalue()) == b"solo"
    assert _inflate(b"not gzip") == b"not gzip"
    with pytest.raises(EOFError):
        _inflate(blob[:-4])


def test_spread_small_scan_row_preserving_and_noop_when_wide(spark):
    from linkinator_spark.functions.partitioning import spread_small_scan

    df = spark.range(1000).toDF("id")
    narrow = df.coalesce(1)
    spread = spread_small_scan(narrow)
    assert spread.rdd.getNumPartitions() >= \
        spark.sparkContext.defaultParallelism
    assert sorted(r["id"] for r in spread.collect()) == list(range(1000))
    wide = df.repartition(spark.sparkContext.defaultParallelism * 2)
    assert spread_small_scan(wide) is wide


def test_registrable_domain_psl_preserves_multiplicity_and_map_cols(spark):
    """Round-5 ADVICE #2: duplicate frontier rows must keep their
    multiplicity and non-groupable column types must pass through."""
    from linkinator_spark.operators.politeness import registrable_domain_psl

    psl = spark.createDataFrame(
        [("co.uk", False)], "suffix string, is_exception boolean")
    df = spark.createDataFrame(
        [("foo.co.uk", {"a": 1}), ("foo.co.uk", {"a": 1}),
         ("bar.example", {"b": 2})],
        "host string, props map<string,int>")
    out = registrable_domain_psl(df, psl).collect()
    assert len(out) == 3  # duplicates preserved
    doms = sorted(r["registrable_domain"] for r in out)
    assert doms == ["bar.example", "foo.co.uk", "foo.co.uk"]
    assert all(r["props"] is not None for r in out)
