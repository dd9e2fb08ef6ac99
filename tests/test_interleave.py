"""Interleaved-sequence rendering (functions/interleave.py): order
reconstruction, media placeholders, and partition-order independence."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.functions.interleave import render_spans  # noqa: E402

SCHEMA = "doc_id long, kind string, text string, media_ref string, offset int"


def _render(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["doc_id"]: r.asDict() for r in render_spans(df).collect()}


def test_renders_in_offset_order_with_placeholders(spark):
    rows = [
        (1, "text", "hello ", "", 0),
        (1, "media_ref", "", "http://m/x.png", 1),
        (1, "text", " world", "", 2),
    ]
    out = _render(spark, rows)
    expect = "hello <|media:http://m/x.png|> world"
    assert out[1]["rendered_md5"] == hashlib.md5(expect.encode()).hexdigest()
    assert out[1]["n_chars"] == len(expect)
    assert out[1]["n_spans"] == 3
    assert out[1]["n_text_spans"] == 2
    assert out[1]["n_media_spans"] == 1


def test_out_of_order_input_renders_identically(spark):
    rows = [
        (1, "text", "b", "", 1),
        (1, "text", "a", "", 0),
        (1, "text", "c", "", 2),
    ]
    out = _render(spark, rows)
    assert out[1]["rendered_md5"] == hashlib.md5(b"abc").hexdigest()


def test_partition_order_independent(spark):
    rows = [(1, "text", f"w{i} ", "", i) for i in range(50)]
    df1 = spark.createDataFrame(rows, SCHEMA)
    df2 = spark.createDataFrame(list(reversed(rows)), SCHEMA).repartition(7)
    a = render_spans(df1).collect()[0]["rendered_md5"]
    b = render_spans(df2).collect()[0]["rendered_md5"]
    assert a == b


def test_media_only_document(spark):
    rows = [(1, "media_ref", "", "ref1", 0), (1, "media_ref", "", "ref2", 1)]
    out = _render(spark, rows)
    expect = "<|media:ref1|><|media:ref2|>"
    assert out[1]["rendered_md5"] == hashlib.md5(expect.encode()).hexdigest()
    assert out[1]["n_text_spans"] == 0
    assert out[1]["n_media_spans"] == 2


def test_multiple_documents_grouped(spark):
    rows = [(1, "text", "x", "", 0), (2, "text", "y", "", 0),
            (2, "text", "z", "", 1)]
    out = _render(spark, rows)
    assert out[1]["n_spans"] == 1 and out[2]["n_spans"] == 2
    assert out[2]["rendered_md5"] == hashlib.md5(b"yz").hexdigest()


def _pairs(spark, rows):
    from linkinator_spark.functions.interleave import caption_pairs
    df = spark.createDataFrame(
        rows, "doc_id int, kind string, text string, media_ref string, offset int")
    return {(r.doc_id, r.media_offset): (r.caption_offset, r.caption)
            for r in caption_pairs(df).collect()}


def test_caption_nearest_text_wins(spark):
    rows = [(1, "text", "far", "", 0), (1, "media_ref", "", "m1", 5),
            (1, "text", "near", "", 6)]
    assert _pairs(spark, rows) == {(1, 5): (6, "near")}


def test_caption_tie_prefers_preceding_text(spark):
    rows = [(1, "text", "before", "", 4), (1, "media_ref", "", "m1", 5),
            (1, "text", "after", "", 6)]
    assert _pairs(spark, rows) == {(1, 5): (4, "before")}


def test_caption_skips_docs_without_text(spark):
    rows = [(1, "media_ref", "", "m1", 0),
            (2, "media_ref", "", "m2", 0), (2, "text", "t", "", 3)]
    assert _pairs(spark, rows) == {(2, 0): (3, "t")}


def test_caption_empty_text_spans_ignored(spark):
    rows = [(1, "text", "", "", 4), (1, "media_ref", "", "m1", 5),
            (1, "text", "real", "", 9)]
    assert _pairs(spark, rows) == {(1, 5): (9, "real")}


# ------------------------------------------------------------- gate


def _gate(spark, rows, **kw):
    from linkinator_spark.functions.interleave import gate_interleaved
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["doc_id"]: r.asDict()
            for r in gate_interleaved(df, **kw).collect()}


def _doc(doc_id, n_text, n_media, words_per_text=10):
    """n_text text spans of `words_per_text` words, then n_media media."""
    rows = []
    for j in range(n_text):
        rows.append((doc_id, "text", " ".join(["tok"] * words_per_text),
                     "", j))
    for j in range(n_media):
        rows.append((doc_id, "media_ref", "",
                     f"http://m.example/{doc_id}/{j}", n_text + j))
    return rows


def test_gate_rule_order_and_counts(spark):
    rows = (
        _doc(1, n_text=3, n_media=1)        # 30 tokens, 1 media -> keep
        + _doc(2, n_text=3, n_media=0)      # no media
        + _doc(3, n_text=3, n_media=5)      # too many media
        + _doc(4, n_text=1, n_media=1)      # 10 tokens < min 20
        + _doc(5, n_text=2, n_media=2)      # 20 tokens but < 2*15 ratio
    )
    out = _gate(spark, rows, min_media=1, max_media=4,
                min_tokens=20, min_tokens_per_media=15)
    assert out[1]["keep"] and out[1]["reject_reason"] == ""
    assert out[1]["n_tokens"] == 30 and out[1]["n_media"] == 1
    assert out[2]["reject_reason"] == "too_few_media"
    assert out[3]["reject_reason"] == "too_many_media"
    assert out[4]["reject_reason"] == "too_few_tokens"
    assert out[5]["reject_reason"] == "low_text_media_ratio"
    assert not any(out[d]["keep"] for d in (2, 3, 4, 5))


def test_gate_first_failure_wins(spark):
    # 0 media AND 0 tokens: media rule is checked first
    rows = [(9, "text", "", "", 0)]
    out = _gate(spark, rows, min_media=1, max_media=4,
                min_tokens=20, min_tokens_per_media=15)
    assert out[9]["reject_reason"] == "too_few_media"
    assert out[9]["n_spans"] == 1 and out[9]["n_tokens"] == 0


def test_gate_ratio_is_cross_multiplied_not_float(spark):
    # 45 tokens, 3 media, threshold 15/media: 45 >= 45 keeps (no float
    # rounding at the boundary)
    rows = _doc(7, n_text=3, n_media=3, words_per_text=15)
    out = _gate(spark, rows, min_media=1, max_media=4,
                min_tokens=20, min_tokens_per_media=15)
    assert out[7]["n_tokens"] == 45
    assert out[7]["keep"]
