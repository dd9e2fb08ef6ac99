"""Authority-weighted (priority-queue) frontier scheduling contract:
politeness_take with a descending-priority sort key + global_fifo_rank
emission order (the q_frontier_priority composition).

* within a host, the budget keeps the HIGHEST-priority URLs
* across hosts, emit_rank is globally ordered by priority
* identical output at different parallelism (reshuffle-stable)
"""

import pyspark.sql.functions as F

from linkinator_spark.operators.politeness import (
    global_fifo_rank,
    politeness_take,
)

SCHEMA = "url string, host string, priority_micro long"


def _frontier(spark):
    rows = [
        ("http://a/1", "a", 900),
        ("http://a/2", "a", 100),
        ("http://a/3", "a", 500),
        ("http://b/1", "b", 700),
        ("http://b/2", "b", 800),
    ]
    return (spark.createDataFrame(rows, SCHEMA)
            .withColumn("_negp", -F.col("priority_micro")))


def _schedule(spark, budget):
    took = politeness_take(_frontier(spark), budget=budget,
                           order_cols=("_negp", "url"))
    return (global_fifo_rank(took, "_negp", "url", out_col="emit_rank")
            .select("url", "host", "priority_micro", "host_rank",
                    "emit_rank"))


def test_budget_keeps_highest_priority(spark):
    out = {r["url"]: r for r in _schedule(spark, budget=2).collect()}
    # host a drops its priority-100 URL, not a FIFO tail
    assert set(out) == {"http://a/1", "http://a/3",
                        "http://b/1", "http://b/2"}
    assert out["http://a/1"]["host_rank"] == 1
    assert out["http://a/3"]["host_rank"] == 2


def test_emission_order_is_global_priority(spark):
    rows = sorted(_schedule(spark, budget=2).collect(),
                  key=lambda r: r["emit_rank"])
    assert [r["url"] for r in rows] == [
        "http://a/1", "http://b/2", "http://b/1", "http://a/3"]
    assert [r["emit_rank"] for r in rows] == [1, 2, 3, 4]


def test_reshuffle_stable(spark):
    a = sorted(_schedule(spark, budget=2).collect(), key=lambda r: r["url"])
    took = politeness_take(
        _frontier(spark).repartition(5, "url"), budget=2,
        order_cols=("_negp", "url"))
    b = sorted(
        global_fifo_rank(took, "_negp", "url", out_col="emit_rank")
        .select("url", "host", "priority_micro", "host_rank", "emit_rank")
        .collect(), key=lambda r: r["url"])
    assert a == b


# ---------------------------------------------------------------- per-IP

def test_ip_politeness_groups_sibling_subdomains(spark):
    """Subdomains of one registrable domain share a server IP and one
    budget; a different domain gets its own IP and budget."""
    from linkinator_spark.operators.politeness import politeness_take_ip

    rows = [(f"s{i}.alpha.test", f"http://s{i}.alpha.test/") for i in range(6)]
    rows += [("www.beta.test", "http://www.beta.test/")]
    df = spark.createDataFrame(rows, "host string, url string")
    out = politeness_take_ip(df, budget=4).collect()
    by_ip = {}
    for r in out:
        by_ip.setdefault(r.server_ip, []).append(r)
    assert len(by_ip) == 2
    sizes = sorted(len(v) for v in by_ip.values())
    assert sizes == [1, 4]  # alpha capped at 4 of 6; beta keeps its 1


def test_ip_politeness_rank_matches_naive_window(spark):
    """ip_rank equals row_number() over (partition by ip order by
    host, url) — the hierarchical rank is exact."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from linkinator_spark.operators.politeness import (
        politeness_take_ip,
        resolve_server_ips,
    )

    rows = [(f"s{i % 5}.dom{i % 3}.test",
             f"http://s{i % 5}.dom{i % 3}.test/p/{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = sorted((r.server_ip, r.host, r.url, r.ip_rank)
                 for r in politeness_take_ip(df, budget=100).collect())
    w = Window.partitionBy("server_ip").orderBy("host", "url")
    want = sorted(
        (r.server_ip, r.host, r.url, r.ip_rank)
        for r in resolve_server_ips(df)
        .withColumn("ip_rank", F.row_number().over(w).cast("long"))
        .collect())
    assert got == want


def test_registrable_domain_single_label_passthrough(spark):
    from pyspark.sql import functions as F

    from linkinator_spark.operators.politeness import registrable_domain

    df = spark.createDataFrame(
        [("localhost",), ("a.b.c.example.org",), ("a.example.org.",),
         ("localhost.",), ("weird..",)], "host string")
    out = [r.d for r in
           df.select(registrable_domain(F.col("host")).alias("d"))
           .orderBy("host").collect()]
    # trailing root-label dots strip (FQDN spellings group with their
    # non-FQDN siblings); residual misses pass through non-empty — never
    # collapsing distinct hosts onto '' (one shared server ip)
    assert out == ["example.org", "example.org", "localhost",
                   "localhost", "weird."]


def test_registrable_domain_multi_label_suffixes(spark):
    """Hosts under multi-label public suffixes keep THREE labels: two
    .co.uk registrants must land on different registrable domains (and
    so different per-server politeness budgets), and each github.io
    tenant is its own registrable domain. The DuckDB twin agrees."""
    import duckdb
    from pyspark.sql import functions as F

    from linkinator_spark.operators.politeness import (
        registrable_domain, registrable_domain_sql)

    cases = [
        ("foo.co.uk", "foo.co.uk"),
        ("bar.co.uk", "bar.co.uk"),
        ("www.foo.co.uk", "foo.co.uk"),
        ("deep.cdn.bar.co.uk", "bar.co.uk"),
        ("shop.example.com.au.", "example.com.au"),
        ("alice.github.io", "alice.github.io"),
        ("www.alice.github.io", "alice.github.io"),
        ("co.uk", "co.uk"),          # the bare suffix passes through
        ("plain.example.com", "example.com"),
        ("example.com", "example.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r.d for r in
           df.select(registrable_domain(F.col("host")).alias("d")).collect()]
    assert got == [want for _, want in cases]
    # two .co.uk registrants -> distinct groups (separate budgets)
    assert got[0] != got[1]

    con = duckdb.connect()
    con.execute("create table hosts(host varchar)")
    con.executemany("insert into hosts values (?)",
                    [(h,) for h, _ in cases])
    sql_got = [r[0] for r in con.execute(
        f"select {registrable_domain_sql('host')} from hosts").fetchall()]
    assert sql_got == got


def test_registrable_domain_psl_broadcast(spark):
    """The full-PSL broadcast-join variant: longest-suffix match, one
    extra label kept; exception rules match as themselves; hosts with no
    PSL hit keep their last label + 1... i.e. fall back to two labels."""
    from linkinator_spark.operators.politeness import registrable_domain_psl

    psl = spark.createDataFrame(
        [("uk", False), ("co.uk", False), ("sch.uk", False),
         ("kobe.jp", False),          # stand-in for the *.kobe.jp wildcard
         ("b.kobe.jp", False),        # the wildcard PRE-EXPANDED for b
         ("city.kobe.jp", False),     # ...and (wrongly reachable) for city
         ("city.kobe.jp", True),      # the !city.kobe.jp exception
         ("com", False)],
        "suffix string, is_exception boolean")
    rows = [("a.foo.co.uk",), ("bar.co.uk",), ("x.example.com",),
            ("a.b.kobe.jp",), ("www.city.kobe.jp",), ("noache.zz",)]
    df = spark.createDataFrame(rows, "host string")
    got = {r.host: r.registrable_domain
           for r in registrable_domain_psl(df, psl).collect()}
    assert got == {
        "a.foo.co.uk": "foo.co.uk",
        "bar.co.uk": "bar.co.uk",
        "x.example.com": "example.com",
        "a.b.kobe.jp": "a.b.kobe.jp",        # expanded wildcard: suffix
                                             # is b.kobe.jp, keep 4
        # the exception must PREVAIL over the same-suffix expanded
        # wildcard row (PSL prevailing-rule order), not lose the
        # longest-match to it
        "www.city.kobe.jp": "city.kobe.jp",
        "noache.zz": "noache.zz",
    }


# ---------------------------------------------------------------- AIMD

def test_aimd_delay_fold(spark):
    """Hand-walked AIMD: base 1000, x2 on throttle (cap 60000),
    -250 on success (floor 1000)."""
    from linkinator_spark.operators.politeness import adaptive_host_delay

    rows = [
        # h0: ok, throttle, throttle, ok -> 1000-250->1000, 2000, 4000,
        # 3750
        ("h0", 1, 0), ("h0", 2, 1), ("h0", 3, 1), ("h0", 4, 0),
        # h1: all success stays at the floor
        ("h1", 1, 0), ("h1", 2, 0),
        # h2: repeated throttling saturates at the cap
        *[("h2", i, 1) for i in range(1, 9)],
    ]
    df = spark.createDataFrame(rows, "host string, seq long, throttle int")
    out = {r.host: r for r in adaptive_host_delay(df).collect()}
    assert out["h0"].delay_ms == 3750
    assert (out["h0"].n_throttle, out["h0"].n_events) == (2, 4)
    assert out["h1"].delay_ms == 1000
    assert out["h2"].delay_ms == 60_000


def test_aimd_order_matters_and_is_seq_driven(spark):
    """The fold follows seq order, not row arrival order."""
    from linkinator_spark.operators.politeness import adaptive_host_delay

    # throttle FIRST then successes: 2000 -> 1750 -> 1500
    fwd = [("h", 1, 1), ("h", 2, 0), ("h", 3, 0)]
    shuffled = [fwd[2], fwd[0], fwd[1]]
    for rows in (fwd, shuffled):
        df = spark.createDataFrame(
            rows, "host string, seq long, throttle int")
        assert adaptive_host_delay(df).collect()[0].delay_ms == 1500
