"""Standoff paragraph attributes (functions/attributes.py): offset
contract, signal values, and the DuckDB twin."""

import duckdb
import pandas as pd
import pytest

from linkinator_spark.functions import attributes as AT

DOCS = [
    ("d1", "The cat is on the mat.\n\nBuy now!!! click here\n\n"
           "Mail me at a.b@test.org and +1 (555) 123-4567 today."),
    ("d2", "single paragraph, no terminal"),
    ("d3", "one\n\n\n\nfour"),     # empty middle paragraph is dropped
]


@pytest.fixture(scope="module")
def tagged(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    return AT.paragraph_attributes(docs).collect()


def test_offsets_slice_source(tagged):
    """The standoff contract: text[start:end] IS the paragraph."""
    by_doc = dict(DOCS)
    for r in tagged:
        src = by_doc[r["doc_id"]]
        assert len(src[r["start"]:r["end"]]) == r["n_chars"]
        assert "\n\n" not in src[r["start"]:r["end"]]
    d1 = sorted([r for r in tagged if r["doc_id"] == "d1"],
                key=lambda r: r["span_idx"])
    assert by_doc["d1"][d1[0]["start"]:d1[0]["end"]] == \
        "The cat is on the mat."


def test_signco(tagged):
    d1 = {r["span_idx"]: r for r in tagged if r["doc_id"] == "d1"}
    assert d1[0]["terminal_punct"] and d1[0]["n_stop"] >= 2
    assert not d1[1]["terminal_punct"] or d1[1]["n_stop"] == 0
    assert d1[2]["n_emails"] == 1 and d1[2]["n_phones"] == 1
    # empty paragraphs dropped
    d3 = [r for r in tagged if r["doc_id"] == "d3"]
    assert {r["span_idx"] for r in d3} == {0, 2}


def test_oracle_twin(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = sorted(tuple(r) for r in
                 AT.paragraph_attributes(docs).collect())
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(
        AT.paragraph_attributes_oracle_sql(from_clause="docs_pd")
    ).fetchall())
    assert got == want
