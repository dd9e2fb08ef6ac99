"""corpus_build_mm — the interleaved (multimodal) assembly chain
(gate -> post-gate cross-doc media dedup -> cleaned re-cost -> pack).

The oracle harness value-checks the full result against DuckDB; these
tests pin the chain-shape claims a hash match alone would not
distinguish: dedup runs AFTER the gate (a ref whose other copies were
gated away is not a duplicate), a doc that loses all media to dedup is
still packed (the gate saw the pre-dedup counts), and the dropped-span
accounting balances corpus-wide.
"""

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from linkinator_spark.functions.interleave import gate_interleaved
from linkinator_spark.functions.media import drop_dup_media

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = "doc_id long, kind string, text string, media_ref string, offset int"


def _spans(doc_id, refs, n_text=4, words=10):
    rows = [(doc_id, "text", " ".join(["tok"] * words), "", j)
            for j in range(n_text)]
    rows += [(doc_id, "media_ref", "", r, n_text + j)
             for j, r in enumerate(refs)]
    return rows


def test_dedup_is_post_gate(spark):
    # m_shared is in doc 1 (survivor) and doc 3 (gated: one 5-token text
    # span). Post-gate, doc 1's copy is unique and MUST survive. m_dup is
    # in two survivors; doc 2's copy drops (doc 1 is the keeper).
    rows = (
        _spans(1, ["m_shared", "m_dup"])
        + _spans(2, ["m_dup"])
        + _spans(3, ["m_shared"], n_text=1, words=5)
    )
    spans = spark.createDataFrame(rows, SCHEMA)
    gate = gate_interleaved(spans, min_media=1, max_media=4,
                            min_tokens=30, min_tokens_per_media=10)
    kept = {r["doc_id"] for r in gate.filter("keep").collect()}
    assert kept == {1, 2}
    cleaned = drop_dup_media(
        spans.join(gate.filter("keep").select("doc_id"),
                   "doc_id", "left_semi"))
    media = [(r["doc_id"], r["media_ref"])
             for r in cleaned.filter("kind = 'media_ref'").collect()]
    assert sorted(media) == [(1, "m_dup"), (1, "m_shared")]


def test_doc_losing_all_media_is_still_packed(spark):
    out = {r["doc_id"]: r.asDict()
           for r in entrymod.q_corpus_build_mm(spark, SF_DIR).collect()}
    assert out, "chain produced no rows at sf0.001"
    # every survivor has a shard assignment, including any doc whose
    # media were all deduped away
    assert all(r["shard_id"] >= 0 for r in out.values())
    zero_media = [r for r in out.values() if r["n_media_kept"] == 0]
    for r in zero_media:
        assert r["n_media_dropped"] > 0  # had media pre-dedup (gate min 1)


def test_dropped_accounting_balances(spark):
    out = entrymod.q_corpus_build_mm(spark, SF_DIR).cache()
    spans = entrymod.q_span_flatten(spark, SF_DIR)
    survivors = out.select("doc_id")
    n_orig = (
        spans.join(survivors, "doc_id", "left_semi")
        .filter(F.col("kind") == "media_ref").count())
    agg = out.agg(
        F.sum("n_media_kept").alias("kept"),
        F.sum("n_media_dropped").alias("dropped")).collect()[0]
    assert agg["kept"] + agg["dropped"] == n_orig
    assert agg["dropped"] > 0  # the dedup stage binds at this SF
    # cost floor: every doc re-costs >= 64 * kept media
    bad = out.filter(
        F.col("n_tokens") < F.col("n_media_kept") * 64).count()
    assert bad == 0


def test_domain_quality_verdicts(spark):
    """domain_quality: the PII plant hits domains d0/d1 (50% of docs);
    precedence gives low_quality priority when both rules hold, and the
    pii_heavy flag only ever appears on a planted domain."""
    out = {r["domain"]: r.asDict()
           for r in entrymod.q_domain_quality(spark, SF_DIR).collect()}
    assert set(out) == {f"d{k}" for k in range(11)}
    pii_flagged = {d for d, r in out.items()
                   if r["flag_reason"] == "pii_heavy"}
    assert pii_flagged <= {"d0", "d1"}
    # planted domains carry PII in ~half their docs; others have none
    for d, r in out.items():
        if d in ("d0", "d1"):
            assert r["pii_docs"] * 4 > r["n_docs"]
        else:
            assert r["pii_docs"] == 0
    # a planted domain that ALSO fails quality must report low_quality
    for d in ("d0", "d1"):
        assert out[d]["flag_reason"] in ("low_quality", "pii_heavy")
