"""Conditional-request planning + 304 accounting
(operators/revalidate.py)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkinator_spark.operators import revalidate as RV

HIST = [
    # url, fetch_ts, etag, last_modified, digest
    ("http://a.x/1", 100, 'W/"v1"', None, "d1"),
    ("http://a.x/1", 200, 'W/"v2"', None, "d2"),       # latest etag wins
    ("http://a.x/2", 100, None, "Mon, 01 Jan", "d3"),  # only last-modified
    ("http://a.x/3", 100, None, None, "d4"),           # no validators
    # etag known only on an OLD capture: still usable (latest non-null)
    ("http://a.x/4", 100, 'W/"old"', None, "d5"),
    ("http://a.x/4", 200, None, "Tue, 02 Jan", "d6"),
]

FETCH = [
    # url, digest, length
    ("http://a.x/1", "d2", 1000),   # unchanged -> 304
    ("http://a.x/2", "dX", 2000),   # changed -> 200
    ("http://a.x/3", "d4", 3000),   # unchanged but no validator -> 200
    ("http://a.x/4", "d6", 4000),   # unchanged vs latest digest -> 304
]


@pytest.fixture(scope="module")
def plan(spark):
    h = spark.createDataFrame(
        HIST, "url string, fetch_ts long, etag string, "
              "last_modified string, digest string")
    return RV.conditional_plan(h)


def test_plan_validators(plan):
    p = {r["url"]: r for r in plan.collect()}
    assert p["http://a.x/1"]["cond_type"] == "if-none-match"
    assert p["http://a.x/1"]["validator"] == 'W/"v2"'
    assert p["http://a.x/1"]["prior_digest"] == "d2"
    assert p["http://a.x/2"]["cond_type"] == "if-modified-since"
    assert p["http://a.x/3"]["cond_type"] == "unconditional"
    assert p["http://a.x/3"]["validator"] is None
    # an older capture's ETag outranks a newer Last-Modified
    assert p["http://a.x/4"]["cond_type"] == "if-none-match"
    assert p["http://a.x/4"]["validator"] == 'W/"old"'
    assert p["http://a.x/4"]["prior_digest"] == "d6"


def test_outcome_304_accounting(spark, plan):
    f = spark.createDataFrame(FETCH, "url string, digest string, length long")
    out = {r["url"]: r for r in
           RV.revalidation_outcome(plan, f).collect()}
    assert out["http://a.x/1"]["status"] == 304
    assert out["http://a.x/1"]["saved_bytes"] == 1000
    assert out["http://a.x/2"]["status"] == 200
    assert out["http://a.x/2"]["changed"]
    assert out["http://a.x/3"]["status"] == 200   # nothing to validate
    assert out["http://a.x/3"]["saved_bytes"] == 0
    assert out["http://a.x/4"]["status"] == 304


def test_plan_sql_twin(spark, plan):
    got = sorted(tuple(r) for r in plan.collect())
    con = duckdb.connect()
    con.register("hist_pd", pd.DataFrame(
        HIST, columns=["url", "fetch_ts", "etag", "last_modified",
                       "digest"]))
    want = sorted(tuple(r) for r in con.execute(
        "with h as (select * from hist_pd) " + RV.plan_sql("h")
    ).fetchall())
    assert got == want
