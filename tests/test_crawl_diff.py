"""Crawl snapshot diff contract (operators/diff.py):

* every transition class from a planted pair of snapshots
* still_broken beats changed when the status code moves within BROKEN
* SKIPPED flows through the state rules (OK -> SKIPPED is 'changed',
  SKIPPED -> BROKEN is 'newly_broken')
* new/gone rows carry NULLs on the absent side
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.operators.diff import crawl_diff

SCHEMA = "url string, status int, state string"


def _diff(spark, prev_rows, curr_rows):
    prev = spark.createDataFrame(prev_rows, SCHEMA)
    curr = spark.createDataFrame(curr_rows, SCHEMA)
    return {r["url"]: r.asDict() for r in crawl_diff(prev, curr).collect()}


def test_all_transitions(spark):
    prev = [
        ("u/ok", 200, "OK"),
        ("u/breaks", 200, "OK"),
        ("u/fixes", 404, "BROKEN"),
        ("u/stays404", 404, "BROKEN"),
        ("u/moves", 404, "BROKEN"),       # 404 -> 503, both BROKEN
        ("u/redirects", 200, "OK"),       # 200 -> 301, both OK
        ("u/gone", 200, "OK"),
    ]
    curr = [
        ("u/ok", 200, "OK"),
        ("u/breaks", 500, "BROKEN"),
        ("u/fixes", 200, "OK"),
        ("u/stays404", 404, "BROKEN"),
        ("u/moves", 503, "BROKEN"),
        ("u/redirects", 301, "OK"),
        ("u/new", 200, "OK"),
    ]
    out = _diff(spark, prev, curr)
    assert out["u/ok"]["transition"] == "unchanged"
    assert out["u/breaks"]["transition"] == "newly_broken"
    assert out["u/fixes"]["transition"] == "fixed"
    assert out["u/stays404"]["transition"] == "still_broken"
    assert out["u/moves"]["transition"] == "still_broken"  # not 'changed'
    assert out["u/redirects"]["transition"] == "changed"
    assert out["u/gone"]["transition"] == "gone"
    assert out["u/new"]["transition"] == "new"
    assert out["u/new"]["prev_status"] is None
    assert out["u/new"]["prev_state"] is None
    assert out["u/gone"]["curr_status"] is None


def test_skipped_state_flows(spark):
    prev = [("u/a", 200, "OK"), ("u/b", 0, "SKIPPED")]
    curr = [("u/a", 0, "SKIPPED"), ("u/b", 404, "BROKEN")]
    out = _diff(spark, prev, curr)
    assert out["u/a"]["transition"] == "changed"
    assert out["u/b"]["transition"] == "newly_broken"
