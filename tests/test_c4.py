"""C4 line-level cleaning (functions/c4.py): pin each line predicate and
page gate from Raffel et al. 2020 §2.2."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.functions.c4 import c4_clean  # noqa: E402

GOOD_LINES = [
    "this sentence ends with a period.",
    "does this one end with a question mark?",
    "yes and this one with an exclamation!",
    'a quoted ending works too."',
    "curly closing quotes also count.”",
]


def _clean(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_clean(df, **kw).collect()}


def test_terminal_punctuation_forms_all_kept(spark):
    out = _clean(spark, [(1, "\n".join(GOOD_LINES))])
    assert out[1]["n_kept"] == 5
    assert out[1]["doc_kept"] == 1
    expect = hashlib.md5("\n".join(GOOD_LINES).encode()).hexdigest()
    assert out[1]["cleaned_md5"] == expect


def test_unterminated_line_dropped(spark):
    doc = "\n".join(GOOD_LINES + ["this line just trails off"])
    out = _clean(spark, [(1, doc)])
    assert out[1]["n_lines"] == 6
    assert out[1]["n_kept"] == 5


def test_short_line_dropped(spark):
    doc = "\n".join(GOOD_LINES + ["two words.", "ok."])
    out = _clean(spark, [(1, doc)])
    assert out[1]["n_kept"] == 5  # 2-word and 1-word lines fail min_words=3


def test_javascript_line_dropped_any_case(spark):
    doc = "\n".join(GOOD_LINES + [
        "please enable JavaScript to see this page.",
        "PLEASE ENABLE JAVASCRIPT NOW OR ELSE."])
    out = _clean(spark, [(1, doc)])
    assert out[1]["n_kept"] == 5


def test_curly_brace_drops_page(spark):
    doc = "\n".join(GOOD_LINES + ["function f() { return 1; }"])
    out = _clean(spark, [(1, doc)])
    assert out[1]["doc_kept"] == 0
    assert out[1]["n_kept"] == 5  # lines still counted; the PAGE is cut


def test_lorem_ipsum_drops_page(spark):
    doc = "\n".join(GOOD_LINES + ["Lorem Ipsum dolor sit amet, of course."])
    out = _clean(spark, [(1, doc)])
    assert out[1]["doc_kept"] == 0


def test_min_kept_lines_gate(spark):
    doc = "\n".join(GOOD_LINES[:2])
    out = _clean(spark, [(1, doc)])
    assert out[1]["n_kept"] == 2
    assert out[1]["doc_kept"] == 0  # below default min_kept_lines=3
    out = _clean(spark, [(1, doc)], min_kept_lines=2)
    assert out[1]["doc_kept"] == 1


def test_empty_text(spark):
    out = _clean(spark, [(1, "")])
    assert out[1]["n_kept"] == 0
    assert out[1]["doc_kept"] == 0
    assert out[1]["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_min_words_parameter(spark):
    doc = "\n".join(GOOD_LINES + ["two words."])
    strict = _clean(spark, [(1, doc)], min_words=6)
    assert strict[1]["n_kept"] == 3  # only the 6+-word lines survive
    loose = _clean(spark, [(1, doc)], min_words=2)
    assert loose[1]["n_kept"] == 6
