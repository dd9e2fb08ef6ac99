"""Gopher-rule quality gate (functions/gopher.py): pin each of the seven
rules on crafted documents, the fail_reason order, and the integer
(no-float-division) contract."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.functions.gopher import (  # noqa: E402
    GOPHER_RULES,
    REQUIRED_STOPWORDS,
    gopher_gate,
)

# 60 stopword-bearing prose words: passes every rule.
GOOD = ("the quick brown fox jumps over that lazy dog to be sure of it "
        "and we have agreed with every careful reader that plain text "
        "like this should clear the gate without any trouble at all "
        "because it is ordinary fluent english prose written by people "
        "for people and that is exactly what the filters keep")


def _gate(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in gopher_gate(df).collect()}


def test_good_doc_passes(spark):
    out = _gate(spark, [(1, GOOD)])
    assert out[1]["gopher_pass"] == 1
    assert out[1]["fail_reason"] == "pass"


def test_word_count_bounds(spark):
    short = "the of and that have with to be"  # 8 words, < 50
    out = _gate(spark, [(1, short)])
    assert out[1]["fail_reason"] == "word_count"
    assert out[1]["n_words"] == 8


def test_mean_word_len(spark):
    # 60 words, mean length > 10; stopwords present so only this fires
    doc = " ".join(["honorificabilitudinitatibus the of"] * 20)
    out = _gate(spark, [(1, doc)])
    assert out[1]["fail_reason"] == "mean_word_len"


def test_symbol_ratio(spark):
    # good doc + enough hashes to push symbols past 10% of words
    doc = GOOD + " " + "#" * 12
    out = _gate(spark, [(1, doc)])
    assert out[1]["fail_reason"] == "symbol_ratio"
    assert out[1]["n_symbols"] >= 12


def test_ellipsis_counts_both_forms(spark):
    doc = GOOD + " so... it goes… on"
    out = _gate(spark, [(1, doc)])
    assert out[1]["n_symbols"] == 2  # one ascii ..., one unicode …


def test_bullet_lines(spark):
    doc = "\n".join(
        f"- bullet item number {i} from the official listing"
        for i in range(50))
    out = _gate(spark, [(1, doc)])
    assert out[1]["fail_reason"] == "bullet_lines"
    assert out[1]["n_bullet_lines"] == 50
    assert out[1]["n_lines"] == 50


def test_ellipsis_lines(spark):
    lines = [GOOD] + [f"read more about topic {i}..." for i in range(9)]
    out = _gate(spark, [(1, "\n".join(lines))])
    # 9 of 10 lines end with ... -> 90% > 30%
    assert out[1]["fail_reason"] == "ellipsis_lines"
    assert out[1]["n_ellipsis_lines"] == 9


def test_alpha_words(spark):
    doc = GOOD + " " + " ".join(str(i) for i in range(100, 130))
    out = _gate(spark, [(1, doc)])
    # 30 numeric words out of ~90 -> alpha fraction < 0.8
    assert out[1]["fail_reason"] == "alpha_words"


def test_stopword_floor(spark):
    # 60 content words with only ONE required stopword ('the')
    doc = " ".join(["galaxy cluster nebula quasar the comet"] * 10)
    out = _gate(spark, [(1, doc)])
    assert out[1]["fail_reason"] == "stopwords"
    assert out[1]["n_req_stopwords"] == 1


def test_fail_reason_reports_first_rule_in_order(spark):
    # violates word_count AND stopwords; word_count is first in the order
    out = _gate(spark, [(1, "xyzzy plugh")])
    assert out[1]["fail_reason"] == "word_count"
    assert [n for n, _ in GOPHER_RULES][0] == "word_count"


def test_empty_text(spark):
    out = _gate(spark, [(1, "")])
    assert out[1]["gopher_pass"] == 0
    assert out[1]["fail_reason"] == "word_count"


def test_required_stopword_list_pinned():
    assert REQUIRED_STOPWORDS == (
        "the", "be", "to", "of", "and", "that", "have", "with")


@pytest.mark.parametrize("col", ["n_words", "n_word_chars", "n_symbols",
                                 "n_lines", "n_bullet_lines",
                                 "n_ellipsis_lines", "n_alpha_words",
                                 "n_req_stopwords"])
def test_all_feature_columns_are_long(spark, col):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    schema = {f.name: f.dataType.simpleString()
              for f in gopher_gate(df).schema.fields}
    assert schema[col] == "bigint"
