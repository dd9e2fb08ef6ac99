"""Crawl-trap detection: URL-template normalization and family counts."""

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.functions.traps import detect_traps, url_template


def _templates(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.t for r in df.select(url_template(F.col("url")).alias("t")).collect()]


def test_template_collapses_digits_and_query_values(spark):
    got = _templates(spark, [
        "http://h.example/cal/2024/06/17?sess=abc123&page=2",
        "http://h.example/cal/1999/12/31?page=9&sess=zzz",
    ])
    # digit runs -> N, query values -> *, keys sorted: both meet in one family
    assert got[0] == got[1] == "http://h.example/cal/N/N/N?page=*&sess=*"


def test_template_keeps_letter_paths_and_drops_fragments(spark):
    got = _templates(spark, [
        "http://h.example/docs/intro",
        "http://h.example/docs/intro#section-3",
        "http://h.example/docs/intro?x=1",
    ])
    assert got[0] == "http://h.example/docs/intro"
    assert got[1] == "http://h.example/docs/intro"      # fragment ignored
    assert got[2] == "http://h.example/docs/intro?x=*"


def test_threshold_boundary_and_distinct_count(spark):
    rows = (
        [("h", f"http://h/cal/{i}") for i in range(5)]
        + [("h", "http://h/cal/0")]          # duplicate URL: not re-counted
        + [("h", "http://h/about")]
    )
    df = spark.createDataFrame(rows, "host string, url string")
    out = {r.template: (r.n_urls, r.is_trap)
           for r in detect_traps(df, threshold=5).collect()}
    assert out["http://h/cal/N"] == (5, 1)   # >= threshold, dup collapsed
    assert out["http://h/about"] == (1, 0)


def test_template_preserves_digit_bearing_hosts(spark):
    # the authority is kept verbatim — site1/site2 must NOT collapse
    # into one cross-host family
    got = _templates(spark, [
        "http://site1.example/cal/5",
        "http://site2.example:8080/cal/7",
    ])
    assert got[0] == "http://site1.example/cal/N"
    assert got[1] == "http://site2.example:8080/cal/N"
