"""Property-based tests (hypothesis) over the pure-Python matchers and
their DuckDB SQL twins — no SparkSession needed, so hundreds of random
examples run in seconds. Each property pins an invariant a fixed-case
test can only sample:

- robots_allowed agrees with an independent brute-force RFC 9309
  reference on arbitrary rule sets (under the wildcard cap, where
  semantics are exact rather than degraded);
- _rule_regex never emits more than the bounded number of '.*' groups,
  for ANY input (the ReDoS bound is a total guarantee, not a happy-path
  one);
- registrable_domain_sql (the DuckDB twin) agrees with an independent
  Python reference of the PSL rule on arbitrary label structures;
- bpe_word_tokens_sql (the rank-ordered replace chain) agrees with the
  canonical greedy lowest-rank-first loop on arbitrary words.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------- robots

_path_st = st.text(
    alphabet="abpx/.*$-", min_size=0, max_size=24).map(lambda s: "/" + s)
_rule_st = st.text(alphabet="abpx/*$.-", min_size=1, max_size=16)
_rules_st = st.lists(_rule_st, min_size=0, max_size=5)


def _ref_match(rule: str, path: str) -> bool:
    """Independent RFC 9309 §2.2.3 matcher: translate and re.match,
    written from the spec without reference to the implementation."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.match("^" + pat + ("$" if anchored else ""), path) is not None


def _ref_allowed(path: str, disallow: list[str], allow: list[str]) -> bool:
    """Most-specific-match reference: longest raw matching rule wins,
    Allow wins exact ties (spec-following brute force)."""
    best_d = max((len(r) for r in disallow if _ref_match(r, path)),
                 default=-1)
    best_a = max((len(r) for r in allow if _ref_match(r, path)), default=-1)
    return best_a >= best_d


@settings(deadline=None, max_examples=300)
@given(path=_path_st, disallow=_rules_st, allow=_rules_st)
def test_robots_allowed_matches_spec_reference(path, disallow, allow):
    from linkinator_spark.operators.robots import (
        _rule_over_cap, robots_allowed)

    # under the cap the engine is exact; over it the engine deliberately
    # degrades (prefix/drop), so exclude those inputs from the property
    if any(_rule_over_cap(r) for r in disallow + allow):
        return
    assert robots_allowed(path, disallow, allow) is _ref_allowed(
        path, disallow, allow)


@settings(deadline=None, max_examples=300)
@given(rule=st.text(alphabet="ab/*$.", min_size=0, max_size=200))
def test_rule_regex_wildcard_bound_is_total(rule):
    """For ANY rule — including hundreds of wildcards — the compiled
    pattern carries at most _MAX_WILDCARDS '.*' groups."""
    from linkinator_spark.operators.robots import _MAX_WILDCARDS, _rule_regex

    assert _rule_regex(rule).count(".*") <= _MAX_WILDCARDS


# --------------------------------------------------- registrable domains

_label_st = st.text(alphabet="abcz0", min_size=1, max_size=4)
_host_st = st.one_of(
    st.lists(_label_st, min_size=1, max_size=5).map(".".join),
    st.lists(_label_st, min_size=1, max_size=3).map(
        lambda ls: ".".join(ls) + ".co.uk"),
    st.lists(_label_st, min_size=1, max_size=2).map(
        lambda ls: ".".join(ls) + ".github.io"),
).flatmap(lambda h: st.sampled_from([h, h + "."]))  # FQDN spelling too


def _ref_registrable(host: str) -> str:
    from linkinator_spark.operators.politeness import MULTI_LABEL_SUFFIXES

    host = host[:-1] if host.endswith(".") else host
    labels = host.split(".")
    if len(labels) >= 3 and ".".join(labels[-2:]) in MULTI_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    if len(labels) >= 2 and labels[-2] != "" and labels[-1] != "":
        return ".".join(labels[-2:])
    return host


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(deadline=None, max_examples=300)
@given(host=_host_st)
def test_registrable_domain_sql_matches_reference(host):
    from linkinator_spark.operators.politeness import registrable_domain_sql

    con = duckdb.connect()
    con.execute("create table h(host varchar)")
    con.execute("insert into h values (?)", [host])
    got = con.execute(
        f"select {registrable_domain_sql('host')} from h").fetchone()[0]
    assert got == _ref_registrable(host), host


# --------------------------------------------------------------- BPE

_word_st = st.text(alphabet="theinorast'1-", min_size=0, max_size=16)


@settings(deadline=None, max_examples=60)
@given(words=st.lists(_word_st, min_size=1, max_size=12))
def test_bpe_sql_replay_matches_greedy_loop(words):
    from linkinator_spark.functions.tokenize import (
        DEFAULT_MERGES, bpe_word_tokens, bpe_word_tokens_sql)

    ranks = {p: i for i, p in enumerate(DEFAULT_MERGES)}
    con = duckdb.connect()
    con.execute("create table t(w varchar)")
    con.executemany("insert into t values (?)", [(w,) for w in words])
    got = con.execute(
        f"select w, strlen(x) - strlen(replace(x, chr(1), '')) from "
        f"(select w, {bpe_word_tokens_sql('w')} as x from t)").fetchall()
    for w, n in got:
        assert n == bpe_word_tokens(w, ranks), w
