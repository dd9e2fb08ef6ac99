"""Main-content extraction (functions/boilerplate.py): block
classification behavior and the DuckDB oracle twin.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkinator_spark.functions import boilerplate as BP

DOCS = [
    ("d1",
     '<html><body>'
     '<nav><ul><li><a href="/">Home</a></li>'
     '<li><a href="/about">About</a></li></ul></nav>'
     '<p>The quick brown fox jumps over the lazy dog and it was not '
     'even tired after that run in the park.</p>'
     '<p>It is a truth universally acknowledged that a reader of this '
     'page has seen the sentence before.</p>'
     '<div class="share"><a href="/share">Share this page now</a></div>'
     '<footer><a href="/privacy">Privacy</a> '
     '<a href="/terms">Terms</a></footer>'
     '</body></html>'),
    # all-links page: nothing survives
    ("d2",
     '<ul><li><a href="/a">one two three four five six</a></li>'
     '<li><a href="/b">seven eight nine ten eleven twelve</a></li></ul>'),
    # plain prose, no markup at all: single block survives whole
    ("d3",
     "This is the only block and it has plenty of words in it to pass "
     "the word count gate easily."),
    # short fragments only
    ("d4", "<p>Menu</p><p>Login</p><p>Search</p>"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, html string")


@pytest.fixture(scope="module")
def result(docs):
    return {r["doc_id"]: r for r in BP.main_content(docs).collect()}


def test_nav_and_footer_removed(result):
    r = result["d1"]
    assert "Home" not in r["main_text"]
    assert "Privacy" not in r["main_text"]
    assert "Share this page" not in r["main_text"]
    assert "quick brown fox" in r["main_text"]
    assert "truth universally acknowledged" in r["main_text"]
    assert r["n_kept"] == 2
    assert r["removed_chars"] > 0


def test_link_farm_fully_dropped(result):
    assert result["d2"]["main_text"] == ""
    assert result["d2"]["n_kept"] == 0


def test_plain_prose_kept_whole(result):
    r = result["d3"]
    assert r["n_blocks"] == r["n_kept"] == 1
    assert r["main_text"].startswith("This is the only block")
    assert r["removed_chars"] == 0


def test_short_fragments_dropped(result):
    assert result["d4"]["n_kept"] == 0
    assert result["d4"]["n_blocks"] == 3


def test_oracle_twin(spark, docs):
    got = sorted(
        tuple(r) for r in BP.main_content(docs).collect())
    con = duckdb.connect()
    con.register("docs_pd", pd.DataFrame(DOCS, columns=["doc_id", "html"]))
    want = sorted(tuple(r) for r in con.execute(
        BP.main_content_oracle_sql("html", from_clause="docs_pd")
    ).fetchall())
    assert got == want


def test_stopword_gate(spark):
    """In-language prose passes; a stopword-free token soup of the same
    length fails the stopword-density gate."""
    rows = [
        ("soup", "alpha bravo charlie delta echo foxtrot golf hotel "
                 "india juliet kilo lima mike november oscar papa"),
        ("prose", "the fox is in the park and it has not been seen "
                  "by the dog for a while now"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, html string")
    out = {r["doc_id"]: r["n_kept"] for r in BP.main_content(df).collect()}
    assert out == {"soup": 0, "prose": 1}
