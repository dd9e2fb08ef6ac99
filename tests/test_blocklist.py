"""Domain-blocklist URL filtering (functions/blocklist.py): suffix
semantics, longest-match attribution, and the broadcast-join shape."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from linkinator_spark.functions.blocklist import (  # noqa: E402
    apply_blocklist,
    host_suffixes,
)


def _verdicts(spark, hosts, rules, **kw):
    urls = spark.createDataFrame(
        [(f"http://{h}/x", h) for h in hosts], "url string, host string")
    rdf = spark.createDataFrame([(r,) for r in rules], "domain string")
    return {r["host"]: (r["blocked"], r["matched_domain"])
            for r in apply_blocklist(urls, rdf, **kw).collect()}


def test_suffixes(spark):
    df = spark.createDataFrame([("a.b.c.d",)], "h string")
    out = df.select(host_suffixes(F.col("h")).alias("s")).collect()
    assert out[0]["s"] == ["a.b.c.d", "b.c.d", "c.d", "d"]


def test_exact_and_subdomain_block(spark):
    v = _verdicts(spark, ["ads.example", "cdn.ads.example", "ok.example"],
                  ["ads.example"])
    assert v["ads.example"] == (1, "ads.example")
    assert v["cdn.ads.example"] == (1, "ads.example")
    assert v["ok.example"] == (0, None)


def test_no_substring_false_positive(spark):
    # 'bads.example' is NOT under 'ads.example' — label-boundary matters
    v = _verdicts(spark, ["bads.example"], ["ads.example"])
    assert v["bads.example"] == (0, None)


def test_longest_match_attribution(spark):
    rules = ["example", "bad.example", "very.bad.example"]
    v = _verdicts(spark, ["x.very.bad.example", "y.bad.example",
                          "z.example"], rules)
    assert v["x.very.bad.example"] == (1, "very.bad.example")
    assert v["y.bad.example"] == (1, "bad.example")
    assert v["z.example"] == (1, "example")


def test_all_original_columns_survive(spark):
    urls = spark.createDataFrame(
        [("http://a.b/x", "a.b", 7)], "url string, host string, extra int")
    rdf = spark.createDataFrame([("a.b",)], "domain string")
    row = apply_blocklist(urls, rdf).collect()[0]
    assert row["extra"] == 7 and row["blocked"] == 1


def test_rules_join_is_broadcast(spark):
    urls = spark.createDataFrame(
        [("http://a.b/x", "a.b")], "url string, host string")
    rdf = spark.createDataFrame([("a.b",)], "domain string")
    plan = apply_blocklist(urls, rdf)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_shuffle_fallback_matches_broadcast(spark):
    hosts = [f"s{i}.dom{i % 5}.example" for i in range(30)]
    rules = ["dom1.example", "dom3.example", "s2.dom2.example"]
    a = _verdicts(spark, hosts, rules, broadcast_rules=True)
    b = _verdicts(spark, hosts, rules, broadcast_rules=False)
    assert a == b
