"""robots.txt politeness, result sinks, CLI parsing, salted politeness."""

import tempfile

import pyspark.sql.functions as F

from linkinator_spark.cli import build_parser, merge_config
from linkinator_spark.operators.politeness import politeness_take
from linkinator_spark.operators.robots import (
    host_rules_from_pages,
    parse_robots_txt,
    robots_allowed,
    robots_filter,
)
from linkinator_spark.sources.fixtures import SiteBuilder
from linkinator_spark.sources.sinks import filter_by_verbosity, text_report, write_csv
from linkinator_spark.sources.webgraph import synth_frontier


# ------------------------------------------------------------------ robots

ROBOTS = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok/
Crawl-delay: 2

User-agent: evilbot
Disallow: /
"""


def test_parse_robots_txt():
    rules = parse_robots_txt(ROBOTS, "linkinator")
    assert rules["disallow"] == ["/private/", "/tmp"]
    assert rules["allow"] == ["/private/ok/"]
    assert rules["crawl_delay"] == 2.0
    evil = parse_robots_txt(ROBOTS, "evilbot/1.0")
    assert evil["disallow"] == ["/"]


def test_robots_allowed_longest_prefix():
    dis, allow = ["/private/", "/tmp"], ["/private/ok/"]
    assert robots_allowed("/public/x", dis, allow)
    assert not robots_allowed("/private/secret", dis, allow)
    assert robots_allowed("/private/ok/page", dis, allow)  # allow wins (longer)
    assert not robots_allowed("/tmpfile", dis, allow)      # prefix match


def test_robots_filter_dataflow(spark):
    site = SiteBuilder()
    site.page("http://polite.test/robots.txt",
              html=None, content_type="text/plain",
              spans=[{"kind": "text", "text": ROBOTS, "media_ref": "", "offset": 0}])
    pages, docs = site.build(spark)
    rules = host_rules_from_pages(pages, docs)
    got = rules.collect()
    assert len(got) == 1 and got[0]["host"] == "polite.test"

    frontier = spark.createDataFrame(
        [("http://polite.test/public/a", "polite.test"),
         ("http://polite.test/private/b", "polite.test"),
         ("http://polite.test/private/ok/c", "polite.test"),
         ("http://other.test/x", "other.test")],
        "url string, host string",
    )
    allowed, disallowed = robots_filter(frontier, rules)
    a = {r["url"] for r in allowed.collect()}
    d = {r["url"] for r in disallowed.collect()}
    assert d == {"http://polite.test/private/b"}
    assert "http://other.test/x" in a  # hosts without rules pass


# ---------------------------------------------------------------- politeness

def test_politeness_take_matches_naive_window(spark):
    from pyspark.sql.window import Window

    frontier = synth_frontier(spark, 5000, n_hosts=20, skew=3.0)
    naive = (
        frontier.withColumn(
            "host_rank",
            F.row_number().over(Window.partitionBy("host").orderBy("not_before", "seq")),
        )
        .filter(F.col("host_rank") <= 7)
    )
    # tiny salt threshold forces the salted two-phase path
    fast = politeness_take(frontier, budget=7, salt_threshold=50)
    a = {(r["url"], r["host_rank"]) for r in naive.select("url", "host_rank").collect()}
    b = {(r["url"], r["host_rank"]) for r in fast.select("url", "host_rank").collect()}
    assert a == b


def test_politeness_heap_matches_window_form(spark):
    # the min-heap applyInPandas scheduler (north-star form) selects the
    # same rows with the same per-host ranks as the salted window form
    from linkinator_spark.operators.politeness import politeness_take_heap

    frontier = synth_frontier(spark, 5000, n_hosts=20, skew=3.0)
    win = politeness_take(frontier, budget=7, salt_threshold=50)
    heap = politeness_take_heap(frontier, budget=7, n_buckets=8)
    a = {(r["url"], r["host_rank"]) for r in win.select("url", "host_rank").collect()}
    b = {(r["url"], r["host_rank"]) for r in heap.select("url", "host_rank").collect()}
    assert a == b
    # deadline order: within a host, rank follows (not_before, seq)
    rows = heap.select("host", "host_rank", "not_before", "seq").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host_rows in by_host.values():
        host_rows.sort(key=lambda r: r["host_rank"])
        keys = [(r["not_before"], r["seq"]) for r in host_rows]
        assert keys == sorted(keys)


# -------------------------------------------------------------------- sinks

def _results_df(spark):
    rows = [
        ("http://a/", 200, "OK", None, [], 0, "a", 1),
        ("http://a/x", 404, "BROKEN", "http://a/", ["HttpResponse(status=404)"], 1, "a", 2),
        ("http://b/skip", None, "SKIPPED", "http://a/", [], 1, "b", 3),
    ]
    from linkinator_spark.operators.crawler import RESULT_SCHEMA

    return spark.createDataFrame(rows, RESULT_SCHEMA)


def test_verbosity_filter(spark):
    res = _results_df(spark)
    assert {r["state"] for r in filter_by_verbosity(res, "WARNING").collect()} == {"OK", "BROKEN"}
    assert {r["state"] for r in filter_by_verbosity(res, "INFO").collect()} == {"OK", "BROKEN", "SKIPPED"}
    assert {r["state"] for r in filter_by_verbosity(res, "ERROR").collect()} == {"BROKEN"}


def test_csv_sink(spark):
    import glob

    res = _results_df(spark)
    with tempfile.TemporaryDirectory() as d:
        write_csv(res, f"{d}/out", verbosity="INFO")
        files = glob.glob(f"{d}/out/*.csv")
        assert files
        content = open(files[0]).read()
        assert "url,status,state,parent,failureDetails" in content
        assert "http://a/x,404,BROKEN,http://a/" in content


def test_text_report(spark):
    rep = text_report(_results_df(spark), "INFO")
    assert "ERROR: Detected 1 broken links. Scanned 2 links" in rep
    assert "http://a/x" in rep


# ---------------------------------------------------------------------- cli

def test_cli_config_merge(tmp_path):
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text('{"recurse": true, "retry": true, "concurrency": 5}')
    args = build_parser().parse_args([
        "http://seed/", "--pages", "p", "--documents", "d",
        "--config", str(cfg_file),
        "--skip", "foo\\.com, bar\\.org",
        "--status-codes", "403:ok,4xx:warn",
        "--redirects", "error",
    ])
    cfg = merge_config(args)
    assert cfg["recurse"] is True                      # from file
    assert cfg["retry"] is True                        # from file
    assert cfg["redirects"] == "error"                 # CLI
    assert cfg["links_to_skip"] == ["foo\\.com", "bar\\.org"]  # split on comma/space
    assert cfg["status_codes"] == {"403": "ok", "4xx": "warn"}


def test_cli_headers_silent_port_markdown():
    """--header/--silent/--port/--no-markdown parity
    (reference src/cli.ts:146-176,220-233,607-620)."""
    import pytest

    from linkinator_spark.cli import resolve_verbosity

    args = build_parser().parse_args([
        "http://seed/", "--header", "X-K: v1", "--header", "Auth:tok",
        "--silent", "--port", "8080", "--no-markdown",
        "--allow-insecure-certs",
    ])
    cfg = merge_config(args)
    assert cfg["headers"] == {"X-K": "v1", "Auth": "tok"}
    assert cfg["port"] == 8080
    assert cfg["markdown"] is False
    assert cfg["insecure"] is True
    assert resolve_verbosity(args) == "ERROR"

    # colon in the value is fine; empty name/value are rejected
    ok = build_parser().parse_args(
        ["http://seed/", "--header", "Auth: Bearer a:b:c"])
    assert merge_config(ok)["headers"] == {"Auth": "Bearer a:b:c"}
    for bad_hdr in ("NoColon", ": v", "Name:", "Name:   "):
        bad = build_parser().parse_args(
            ["http://seed/", "--header", bad_hdr])
        with pytest.raises(SystemExit):
            merge_config(bad)
    both = build_parser().parse_args(
        ["http://seed/", "--silent", "--verbosity", "INFO"])
    with pytest.raises(SystemExit):
        resolve_verbosity(both)


def test_local_mode_port_in_synthetic_origin(tmp_path):
    """cfg.port pins the modeled server origin (reference options.ts:15)."""
    from linkinator_spark.config import CheckOptions
    from linkinator_spark.sources.localfs import process_local_paths

    (tmp_path / "index.html").write_text("<p>hi</p>")
    cfg = process_local_paths(CheckOptions(
        paths=[str(tmp_path)], port=9999))
    assert cfg.paths == ["http://127.0.0.1:9999/"]
    assert cfg.static_http_server_host == "http://127.0.0.1:9999/"


def test_cli_end_to_end(spark, tmp_path):
    from linkinator_spark.cli import main

    site = SiteBuilder()
    site.page("http://cli.test/", html='<a href="missing.html">x</a>')
    pages, docs = site.build(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    docs.write.parquet(str(tmp_path / "docs"))
    rc = main([
        "http://cli.test/",
        "--pages", str(tmp_path / "pages"),
        "--documents", str(tmp_path / "docs"),
        "--format", "csv", "--output", str(tmp_path / "out"),
        "--verbosity", "INFO",
    ])
    assert rc == 1  # broken link -> exit 1 (reference src/cli.ts:446)
    import glob

    content = open(glob.glob(str(tmp_path / "out" / "*.csv"))[0]).read()
    assert "missing.html" in content and "BROKEN" in content


def test_crawler_respects_robots(spark):
    from linkinator_spark.config import CheckOptions
    from linkinator_spark.operators.crawler import LinkChecker

    site = SiteBuilder()
    site.page("http://polite.test/robots.txt", content_type="text/plain",
              spans=[{"kind": "text", "text": "User-agent: *\nDisallow: /private/",
                      "media_ref": "", "offset": 0}])
    site.page("http://polite.test/",
              html='<a href="/private/x.html">p</a><a href="/public/y.html">q</a>')
    site.page("http://polite.test/private/x.html", html="<p>secret</p>")
    site.page("http://polite.test/public/y.html", html="<p>open</p>")
    pages, docs = site.build(spark)
    res = LinkChecker(spark).check(
        CheckOptions(paths=["http://polite.test/"], recurse=True,
                     respect_robots=True),
        pages, docs,
    )
    st = {r["url"]: r["state"] for r in res.results.collect()}
    assert st["http://polite.test/private/x.html"] == "SKIPPED"
    assert st["http://polite.test/public/y.html"] == "OK"
    assert res.passed
