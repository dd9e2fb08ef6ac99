"""Local-path / glob mode parity (S4 + P6).

Replicates the reference's `local` and `markdown` fixtures in a temp tree
and asserts the reference test suite's golden counts and URL displays
(/root/reference/test/test.index.ts:451-612, fixtures under
test/fixtures/{local,markdown}).
"""

import os

import pytest

from linkinator_spark.config import CheckOptions
from linkinator_spark.operators.crawler import check_local
from linkinator_spark.sources.localfs import process_local_paths

README = """# Say hello to my README
This has [a link](LICENSE.md) to something.

Also here is my cat.
![booboobadkitteh](boo.jpg)
"""

LICENSE = """The MIT License (MIT)

Copyright (c) Justin Beckwith <justin.beckwith@gmail.com> (jbeckwith.com)
"""

DEEP = """# i am in a folder
This has [a link](../LICENSE.md) to something.
"""

UNLINKED = """# just hanging out
This has [a link](LICENSE.md) to something.
"""

LOCAL_INDEX = '<html><body><a href="page2.html">just follow a link</a></body></html>'
LOCAL_PAGE2 = "<html><body>nothing to see here</body></html>"


@pytest.fixture()
def site_dir(tmp_path, monkeypatch):
    md = tmp_path / "markdown"
    (md / "deep").mkdir(parents=True)
    (md / "README.md").write_text(README)
    (md / "LICENSE.md").write_text(LICENSE)
    (md / "unlinked.md").write_text(UNLINKED)
    (md / "deep" / "deep.md").write_text(DEEP)
    (md / "boo.jpg").write_bytes(b"\xff\xd8\xff\xe0fakejpg")
    local = tmp_path / "local"
    local.mkdir()
    (local / "index.html").write_text(LOCAL_INDEX)
    (local / "page2.html").write_text(LOCAL_PAGE2)
    # the reference tests run with fixture paths relative to the repo cwd;
    # mirror that so multi-path mode's serverRoot=cwd inference works
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _urls(res):
    return sorted(r["url"] for r in res.results.select("url").collect())


def test_markdown_single_file(spark, site_dir):
    # test.index.ts:451-458 'should handle markdown' -> 3 links, passed
    res = check_local(spark, CheckOptions(paths=["markdown/README.md"]))
    assert res.passed
    urls = _urls(res)
    assert len(urls) == 3
    assert any(u.endswith("README.md") for u in urls)
    assert any(u.endswith("LICENSE.md") for u in urls)
    assert any(u.endswith("boo.jpg") for u in urls)
    # mapUrl restored filesystem-style paths (no synthetic host leaks)
    assert not any(u.startswith("http://127.0.0.1") for u in urls)


def test_server_root_override(spark, site_dir):
    # test.index.ts:468-484: serverRoot + relative path, ±trailing slash
    for root in ("markdown", "markdown/"):
        res = check_local(
            spark, CheckOptions(paths=["README.md"], server_root=root))
        assert res.passed
        assert len(_urls(res)) == 3


def test_glob_expansion_counts(spark, site_dir):
    # test.index.ts:566-590 'should respect globs' -> 6 links; LICENSE.md
    # reported exactly once (OK links dedup across parents)
    res = check_local(spark, CheckOptions(paths=["markdown/**/*.md"]))
    assert res.passed
    urls = _urls(res)
    assert len(urls) == 6
    assert sum(1 for u in urls if u.endswith("LICENSE.md")) == 1
    assert any(u.startswith("mailto:") for u in urls)
    rows = {(r["url"], r["state"]) for r in
            res.results.select("url", "state").collect()}
    mailto = [s for (u, s) in rows if u.startswith("mailto:")]
    assert mailto == ["SKIPPED"]


def test_glob_zero_results_raises(spark, site_dir):
    with pytest.raises(ValueError, match="returned 0 results"):
        check_local(spark, CheckOptions(paths=["markdown/*.nope"]))


def test_mixed_paths_raise(site_dir):
    with pytest.raises(ValueError, match="cannot be mixed"):
        process_local_paths(
            CheckOptions(paths=["https://jbeckwith.com", "markdown"]))
    with pytest.raises(ValueError, match="cannot be defined"):
        process_local_paths(
            CheckOptions(paths=["https://jbeckwith.com"],
                         server_root=os.getcwd()))
    with pytest.raises(ValueError, match="At least one path"):
        process_local_paths(CheckOptions(paths=[]))


def test_local_directory_seed(spark, site_dir):
    # directory seed: serverRoot=dir, path='/', index.html served for the
    # root URL; recurse follows page2.html (fixtures/local)
    res = check_local(spark, CheckOptions(paths=["local"], recurse=True))
    assert res.passed
    urls = _urls(res)
    assert len(urls) == 2
    # synthetic root restores the directory path in the display
    assert "local" in urls
    assert os.path.join("local", "page2.html") in urls


def test_broken_local_link_is_404(spark, site_dir):
    # the modeled server 404s unknown paths (return404) instead of the
    # scripted-web 'network error' status 0
    (site_dir / "broken").mkdir()
    (site_dir / "broken" / "index.html").write_text(
        '<a href="missing.html">gone</a>')
    res = check_local(spark, CheckOptions(paths=["broken"], recurse=True))
    assert not res.passed
    by_url = {r["url"]: (r["status"], r["state"])
              for r in res.results.select("url", "status", "state").collect()}
    missing = [v for u, v in by_url.items() if u.endswith("missing.html")]
    assert missing == [(404, "BROKEN")]


def test_query_strings_ignored_by_static_server(spark, site_dir):
    """Query strings never affect file resolution, and a directory
    redirect preserves them in its Location (reference server tests
    'should ignore query strings' / 'should handle query strings when
    path requires redirect to directory', src/server.ts:77-116)."""
    d = site_dir / "qs"
    (d / "sub").mkdir(parents=True)
    (d / "index.html").write_text(
        '<a href="page.html?foo=1&bar=2">q</a><a href="sub?x=1">d</a>')
    (d / "page.html").write_text("<p>ok</p>")
    (d / "sub" / "index.html").write_text("<p>sub index</p>")
    res = check_local(spark, CheckOptions(paths=["qs"], recurse=True))
    rows = {r["url"]: (r["status"], r["state"])
            for r in res.results.select("url", "status", "state").collect()}
    assert res.passed, rows
    q = [v for u, v in rows.items() if "page.html" in u]
    assert q == [(200, "OK")]
    dirq = [v for u, v in rows.items() if u.rstrip("/").endswith("sub")
            or "sub?x=1" in u]
    assert dirq and all(v == (200, "OK") for v in dirq)


def test_path_escape_does_not_leave_server_root(spark, site_dir):
    """Links that traverse above the server root must not reach real files
    or leak filesystem details — they 404 like any unknown path (reference
    test.server.ts 'should protect against path escape attacks' /
    'should not leak filesystem details in 404 responses')."""
    d = site_dir / "escape"
    d.mkdir()
    # a real file OUTSIDE the served root that a traversal would reach
    (site_dir / "secret.txt").write_text("top secret")
    (d / "index.html").write_text(
        '<a href="../secret.txt">up</a>'
        '<a href="..%2Fsecret.txt">enc</a>')
    res = check_local(spark, CheckOptions(paths=["escape"], recurse=True))
    assert not res.passed
    rows = res.results.select("url", "status", "state").collect()
    escaped = [r for r in rows if "secret" in r["url"]]
    assert escaped and all(
        r["state"] == "BROKEN" and r["status"] in (0, 404) for r in escaped)
    # nothing served leaks the file's content or absolute path
    assert all("top secret" not in (r["url"] or "") for r in rows)


def test_directory_listing_crawl(spark, site_dir):
    # directoryListing=true serves <li><a> readdir listings
    # (src/server.ts:172-184); nested dirs 301 to their slash form
    d = site_dir / "listing"
    (d / "sub").mkdir(parents=True)
    (d / "a.html").write_text("<p>a</p>")
    (d / "sub" / "b.html").write_text("<p>b</p>")
    res = check_local(spark, CheckOptions(
        paths=["listing"], recurse=True, directory_listing=True))
    assert res.passed
    urls = _urls(res)
    assert any(u.endswith("a.html") for u in urls)
    assert any(u.endswith("b.html") for u in urls)


def test_encoded_url_patterns(spark, site_dir):
    # reference test/fixtures/urlpatterns + test.index.ts:953-959: a link
    # to funky%2Bpath.html reaches the file funky+path.html (the server
    # decodeURIComponents path parts); a raw funky+path.html link works too
    d = site_dir / "urlpatterns"
    d.mkdir()
    (d / "index.html").write_text(
        '<a href="funky%2Bpath.html">url with a +</a>'
        '<a href="funky+path.html">raw</a>')
    (d / "funky+path.html").write_text("<html><body>:waves:</body></html>")
    res = check_local(spark, CheckOptions(
        paths=["index.html"], server_root="urlpatterns"))
    assert res.passed
    states = {r["url"]: r["state"]
              for r in res.results.select("url", "state").collect()}
    assert all(s == "OK" for s in states.values())
    assert len(states) == 3  # index + both spellings of the funky link


def test_clean_urls(spark, site_dir):
    d = site_dir / "clean"
    d.mkdir()
    (d / "index.html").write_text('<a href="about">about</a>')
    (d / "about.html").write_text("<p>hi</p>")
    ok = check_local(spark, CheckOptions(
        paths=["clean"], recurse=True, clean_urls=True))
    assert ok.passed
    bad = check_local(spark, CheckOptions(
        paths=["clean"], recurse=True, clean_urls=False))
    assert not bad.passed
