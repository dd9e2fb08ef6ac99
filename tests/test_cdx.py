"""SURT keys + the CDX capture index (functions/cdx.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linkinator_spark.functions import cdx

ADVERSARIAL_URLS = [
    "http://Site3.Example:80/Page/7?b=2&a=1#frag",   # default port + unsorted q
    "https://WWW.Example.com:443/",                  # www + https default port
    "https://www2.sub.Example.com:8443/a/b?z&y=9&y=1",  # wwwN + kept port
    "http://user:pw@example.com/secret?b=2",         # userinfo stripped
    "http://example.com",                            # empty path -> '/'
    "http://example.com/?",                          # trailing empty query
    "http://a.b.c.d.example.org/x/y/z.html?q=Hello%20World&a=",
    "https://example.com:80/keepport",               # 80 NOT default for https
    "http://example.com/UPPER/Case?A=b&a=B#x",       # lowercased everywhere
    "http://www.example.com/a?x=1&x=1&",             # dup params + empty tail
]


def test_surt_known_values(spark):
    df = spark.createDataFrame([(u,) for u in ADVERSARIAL_URLS], "url string")
    got = {r["url"]: r["s"]
           for r in df.select("url", cdx.surt_key("url").alias("s")).collect()}
    assert got["http://Site3.Example:80/Page/7?b=2&a=1#frag"] == \
        "example,site3)/page/7?a=1&b=2"
    assert got["https://WWW.Example.com:443/"] == "com,example)/"
    assert got["https://www2.sub.Example.com:8443/a/b?z&y=9&y=1"] == \
        "com,example,sub:8443)/a/b?y=1&y=9&z"
    assert got["http://user:pw@example.com/secret?b=2"] == \
        "com,example)/secret?b=2"
    assert got["http://example.com"] == "com,example)/"
    assert got["https://example.com:80/keepport"] == "com,example:80)/keepport"


def test_surt_sql_twin_matches_spark(spark):
    """The DuckDB twin and the Spark Column agree on every adversarial URL
    — the property the url_surt oracle hash rests on."""
    df = spark.createDataFrame([(u,) for u in ADVERSARIAL_URLS], "url string")
    got = {r["url"]: r["s"]
           for r in df.select("url", cdx.surt_key("url").alias("s")).collect()}
    con = duckdb.connect()
    for u in ADVERSARIAL_URLS:
        want = con.sql(f"select {cdx.surt_sql(repr(u))} as s").fetchone()[0]
        assert got[u] == want, u


def test_surt_groups_a_domain_together(spark):
    """The point of SURT: one domain's URLs (any subdomain casing / www
    noise) sort adjacently under a common reversed-host prefix."""
    urls = [
        "http://example.com/a", "http://WWW.example.com/b",
        "https://sub.example.com/c", "http://other.org/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    keys = sorted(r["s"] for r in
                  df.select(cdx.surt_key("url").alias("s")).collect())
    assert keys == ["com,example)/a", "com,example)/b",
                    "com,example,sub)/c", "org,other)/x"]
    # the org,* key does NOT interleave with the com,example,* block
    assert all(k.startswith("com,example") for k in keys[:3])


def _captures(spark):
    rows = [
        # url, ts, status, digest, length
        ("http://a.example/p", 0, 200, "d1", 100),
        ("http://a.example/p", 100, 200, "d1", 100),   # revisit (same digest)
        ("http://a.example/p", 200, 200, "d2", 120),   # changed -> response
        ("http://a.example/p", 300, 200, "d2", 120),   # revisit again
        ("http://b.example/q", 50, 404, "e1", 10),     # single capture
    ]
    return spark.createDataFrame(
        rows, "url string, fetch_ts long, status int, digest string, "
              "length long")


def test_cdx_revisit_classification(spark):
    idx = cdx.cdx_index(_captures(spark)).collect()
    by = {(r["url"], r["fetch_ts"]): r for r in idx}
    assert by[("http://a.example/p", 0)]["record_type"] == "response"
    assert by[("http://a.example/p", 100)]["record_type"] == "revisit"
    assert by[("http://a.example/p", 100)]["saved_bytes"] == 100
    assert by[("http://a.example/p", 200)]["record_type"] == "response"
    assert by[("http://a.example/p", 200)]["saved_bytes"] == 0
    assert by[("http://a.example/p", 300)]["record_type"] == "revisit"
    assert by[("http://b.example/q", 50)]["record_type"] == "response"


def test_cdx_rank_is_surt_ts_order(spark):
    idx = cdx.cdx_index(_captures(spark)).collect()
    ordered = sorted(idx, key=lambda r: (r["surt"], r["fetch_ts"]))
    assert [r["idx_rank"] for r in ordered] == list(range(1, len(idx) + 1))
    # a.example sorts before b.example under host reversal
    assert ordered[0]["surt"] == "example,a)/p"
    assert ordered[-1]["surt"] == "example,b)/q"


def test_cdx_rank_stable_across_parallelism(spark):
    """Range-partition rank == single-window rank at any shuffle width."""
    caps = _captures(spark).repartition(7)
    a = {(r["url"], r["fetch_ts"]): r["idx_rank"]
         for r in cdx.cdx_index(caps).collect()}
    b = {(r["url"], r["fetch_ts"]): r["idx_rank"]
         for r in cdx.cdx_index(caps.coalesce(1)).collect()}
    assert a == b


def test_cdx_no_rank_mode(spark):
    cols = cdx.cdx_index(_captures(spark), with_rank=False).columns
    assert "idx_rank" not in cols and "record_type" in cols
