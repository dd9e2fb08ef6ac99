"""Cross-document media dedup contract (functions/media.py):

* keeper is the lexicographically first (doc_id, offset) occurrence
* min_refs filters unique refs out of the stats
* drop_dup_media removes exactly the non-keeper media spans, keeps text
  spans untouched, and preserves the row schema
* the keeper choice is reshuffle-stable
"""

from linkinator_spark.functions.media import (
    dedup_media_spans,
    drop_dup_media,
)

SCHEMA = "doc_id long, kind string, text string, media_ref string, offset int"


def _spans(spark):
    rows = [
        # ref A: in docs 2 and 1 — keeper must be (1, 5), not input order
        (2, "media_ref", "", "http://m/a.png", 0),
        (1, "media_ref", "", "http://m/a.png", 5),
        (1, "media_ref", "", "http://m/a.png", 9),  # same doc, later offset
        # ref B: unique — no stats row, survives drop
        (3, "media_ref", "", "http://m/b.png", 1),
        # text spans must be ignored / pass through
        (1, "text", "hello", "", 0),
        (3, "text", "world", "", 0),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_keeper_and_counts(spark):
    out = {r["media_ref"]: r for r in dedup_media_spans(_spans(spark)).collect()}
    assert set(out) == {"http://m/a.png"}
    a = out["http://m/a.png"]
    assert a["n_refs"] == 3 and a["n_docs"] == 2
    assert (a["keeper_doc_id"], a["keeper_offset"]) == (1, 5)


def test_min_refs_threshold(spark):
    out = dedup_media_spans(_spans(spark), min_refs=1).collect()
    assert {r["media_ref"] for r in out} == {"http://m/a.png", "http://m/b.png"}


def test_drop_dup_media(spark):
    kept = drop_dup_media(_spans(spark)).collect()
    media = sorted((r["doc_id"], r["offset"]) for r in kept
                   if r["kind"] == "media_ref")
    # keeper of A + unique B survive; (2,0) and (1,9) dropped
    assert media == [(1, 5), (3, 1)]
    text = sorted(r["text"] for r in kept if r["kind"] == "text")
    assert text == ["hello", "world"]
    assert kept[0].asDict().keys() == {
        "doc_id", "kind", "text", "media_ref", "offset"}


def test_reshuffle_stable(spark):
    base = _spans(spark)
    a = dedup_media_spans(base).collect()
    b = dedup_media_spans(base.repartition(7, "offset")).collect()
    key = lambda r: r["media_ref"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
