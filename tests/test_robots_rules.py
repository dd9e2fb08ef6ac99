"""RFC 9309 §2.2.2-2.2.3 rule matching: '*' wildcards, '$' end-anchor,
most-specific (longest raw rule) wins, Allow wins ties — pinned on the
Python matcher and differentially against the JVM robots_filter twin."""

import pytest

from linkinator_spark.operators.robots import robots_allowed


@pytest.mark.parametrize("path,disallow,allow,want", [
    # prefix basics unchanged
    ("/page/1", ["/page/"], [], False),
    ("/other/1", ["/page/"], [], True),
    # '*' matches any character run, anywhere in the rule
    ("/fishheads/yummy.html", ["/fish*"], [], False),
    ("/fish.php?id=anything", ["/*.php"], [], False),
    ("/a/b/c", ["/a/*/c"], [], False),
    ("/a/c", ["/a/*/c"], [], True),
    # trailing '$' anchors at end-of-path
    ("/filename.php", ["/*.php$"], [], False),
    ("/filename.php?parameters", ["/*.php$"], [], True),
    ("/filename.php5", ["/*.php$"], [], True),
    # most-specific match: longer raw rule wins
    ("/page/special/x", ["/page/"], ["/page/special/"], True),
    ("/page/plain", ["/page/"], ["/page/special/"], False),
    # Allow wins exact-length ties
    ("/x/y", ["/x/"], ["/x/"], True),
    # wildcard length counts toward specificity (Googlebot tie rule)
    ("/ab", ["/ab"], ["/a*"], True),
    # regex metacharacters in rules are literal
    ("/price(usd)/1", ["/price(usd)/"], [], False),
    ("/priceXusdY/1", ["/price(usd)/"], [], True),
    ("/a.b/x", ["/a.b/"], [], False),
    ("/aXb/x", ["/a.b/"], [], True),
    # no matching rule at all -> allowed
    ("/free", ["/paid/"], [], True),
])
def test_robots_allowed_rfc9309(path, disallow, allow, want):
    assert robots_allowed(path, disallow, allow) is want


def test_jvm_filter_matches_python_matcher(spark):
    """robots_filter's codegen rule arithmetic agrees with robots_allowed
    for every (path, ruleset) pair, wildcards included."""
    from pyspark.sql import functions as F

    from linkinator_spark.operators.robots import robots_filter

    rulesets = {
        "h0": ([], []),
        "h1": (["/page/"], ["/page/special/"]),
        "h2": (["/fish*", "/*.php$"], []),
        "h3": (["/a/*/c", "/price(usd)/"], ["/a/b*"]),
        "h4": (["/"], ["/public*"]),
    }
    paths = ["/", "/page/1", "/page/special/1", "/fishheads", "/x.php",
             "/x.php?q=1", "/a/b/c", "/a/c", "/price(usd)/9", "/public/x",
             "/private/x", "/a/bzz/c"]
    frontier = spark.createDataFrame(
        [(h, f"http://{h}.test{p}") for h in rulesets for p in paths],
        "host string, url string")
    rules = spark.createDataFrame(
        [(h, d, a, None) for h, (d, a) in rulesets.items()],
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay double")
    allowed, disallowed = robots_filter(frontier, rules)
    got = {r.url: True for r in allowed.collect()}
    got.update({r.url: False for r in disallowed.collect()})
    for h, (d, a) in rulesets.items():
        for p in paths:
            url = f"http://{h}.test{p}"
            assert got[url] is robots_allowed(p, d, a), (h, p, d, a)


def test_hostile_wildcard_rules_bounded():
    """Untrusted robots rules with many '*'s must not compile to
    backtracking-heavy regexes: consecutive runs collapse (semantics
    unchanged), and over-cap rules degrade to a literal-prefix match
    that still evaluates in microseconds."""
    import time

    from linkinator_spark.operators.robots import _rule_regex, robots_allowed

    # collapsed runs keep wildcard semantics
    assert _rule_regex("/a***b") == _rule_regex("/a*b")
    assert robots_allowed("/aXXb", ["/a***b"], []) is False
    assert robots_allowed("/c", ["/a***b"], []) is True

    # 100 interleaved wildcards: over the cap -> prefix fallback, and the
    # non-matching probe (worst backtracking case) returns immediately
    hostile = "/p" + "*x" * 100 + "$"
    path = "/p" + "x" * 300 + "y"
    t0 = time.time()
    for _ in range(50):
        robots_allowed(path, [hostile], [])
    assert time.time() - t0 < 1.0
    assert _rule_regex(hostile) == "^/p"  # prefix of text before first '*'
    assert robots_allowed("/px", [hostile], []) is False
    assert robots_allowed("/q", [hostile], []) is True

    # direction-aware degrade: an over-cap ALLOW rule is dropped (its
    # prefix superset would otherwise win the longest-raw-rule tie-break
    # and re-open paths the site disallowed) — /private stays blocked
    assert robots_allowed("/private/x", ["/private"], [hostile]) is False
    # while an under-cap allow still wins normally
    assert robots_allowed("/private/ok", ["/private"], ["/private/ok"]) is True


def test_jvm_hostile_rules_match_python(spark):
    """The JVM rule-struct path applies the same collapse + prefix-fallback
    bound as _rule_regex."""
    from linkinator_spark.operators.robots import robots_allowed, robots_filter

    hostile = "/p" + "*x" * 100
    rulesets = {
        "h0": (["/a***b"], []),
        "h1": ([hostile], []),
        "h2": (["/private"], [hostile]),   # over-cap Allow must be dropped
    }
    paths = ["/aXXb", "/ab", "/c", "/px", "/p", "/q", "/private/x"]
    frontier = spark.createDataFrame(
        [(h, f"http://{h}.test{p}") for h in rulesets for p in paths],
        "host string, url string")
    rules = spark.createDataFrame(
        [(h, d, a, None) for h, (d, a) in rulesets.items()],
        "host string, disallow array<string>, allow array<string>, "
        "crawl_delay double")
    allowed, disallowed = robots_filter(frontier, rules)
    got = {r.url: True for r in allowed.collect()}
    got.update({r.url: False for r in disallowed.collect()})
    for h, (d, a) in rulesets.items():
        for p in paths:
            assert got[f"http://{h}.test{p}"] is robots_allowed(p, d, a), (h, p)
