"""Unicode normalization (functions/normalize.py): behavior and the
DuckDB twin. All non-ASCII test data uses explicit escapes so the
intended codepoints are unambiguous."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkinator_spark.functions import normalize as NM

DOCS = [
    ("d1", "caf\u00e9 menu \u2014 \u201cfancy\u201d \u2018q\u2019 \u2026 end"),
    ("d2", "tabs\t\tand     spaces"),
    ("d3", "ctrl\x07chars\x1bkept\x0b?"),
    ("d4", "  lines \n\n\n\n many  \n  trailing \n"),
    ("d5", "zero\u200bwidth thin\u2009space nbsp\u00a0ideographic\u3000end"),
    ("d6", "en\u2013dash em\u2014dash minus\u2212sign"),
]


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    return {r["doc_id"]: r["c"] for r in
            df.select("doc_id", NM.clean_text(F.col("text")).alias("c"))
              .collect()}


def test_punctuation_folds(cleaned):
    assert cleaned["d1"] == "caf\u00e9 menu - \"fancy\" 'q' ... end"
    assert cleaned["d6"] == "en-dash em-dash minus-sign"


def test_whitespace_collapses(cleaned):
    assert cleaned["d2"] == "tabs and spaces"
    assert cleaned["d5"] == "zero width thin space nbsp ideographic end"
    assert cleaned["d4"] == "lines\n\nmany\ntrailing"


def test_control_chars_stripped(cleaned):
    assert cleaned["d3"] == "ctrlcharskept?"


def test_oracle_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = sorted(
        (r["doc_id"], r["c"]) for r in
        df.select("doc_id", NM.clean_text(F.col("text")).alias("c"))
          .collect())
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(
        f"select doc_id, {NM.clean_text_sql('text')} as c from docs_pd"
    ).fetchall())
    assert got == want


def test_idempotent(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    once = df.select("doc_id", NM.clean_text(F.col("text")).alias("c"))
    twice = once.select("doc_id", NM.clean_text(F.col("c")).alias("c"))
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))
