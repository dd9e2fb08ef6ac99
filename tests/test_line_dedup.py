"""Corpus-level exact line dedup (functions/linededup.py): pin the CCNet
normalization, the distinct-document duplicate rule, order-preserving
reassembly, and the all-removed edge case."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.functions.linededup import (  # noqa: E402
    duplicated_line_keys,
    line_dedup,
)


def _dedup(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in line_dedup(df, **kw).collect()}


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_cross_doc_boilerplate_removed_unique_kept(spark):
    rows = [
        (1, "unique opener one\nSubscribe to our newsletter!\nunique tail one"),
        (2, "unique opener two\nSubscribe to our newsletter!\nunique tail two"),
        (3, "all original content here\nnothing shared at all"),
    ]
    out = _dedup(spark, rows)
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[1]["cleaned_md5"] == _md5("unique opener one\nunique tail one")
    assert out[2]["cleaned_md5"] == _md5("unique opener two\nunique tail two")
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_md5"] == _md5(
        "all original content here\nnothing shared at all")


def test_ccnet_normalization_folds_case_space_digits(spark):
    # "© 2023 …" vs "© 2024 …" and case/whitespace variants are ONE line
    rows = [
        (1, "keep me one\nCopyright 2023 Example Corp"),
        (2, "keep me two\n  copyright 2024 example corp  "),
    ]
    out = _dedup(spark, rows)
    assert out[1]["n_removed"] == 1 and out[2]["n_removed"] == 1
    assert out[1]["cleaned_md5"] == _md5("keep me one")


def test_repeat_within_one_doc_is_not_corpus_duplicate(spark):
    # duplicate rule counts DISTINCT documents, not occurrences
    rows = [
        (1, "echo line\necho line\necho line"),
        (2, "completely different text"),
    ]
    out = _dedup(spark, rows)
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_md5"] == _md5("echo line\necho line\necho line")


def test_min_dup_docs_threshold(spark):
    rows = [
        (1, "shared by two\nshared by three"),
        (2, "shared by two\nshared by three"),
        (3, "shared by three\nown line three"),
    ]
    out = _dedup(spark, rows, min_dup_docs=3)
    assert out[1]["n_removed"] == 1  # only the 3-doc line crosses
    assert out[1]["cleaned_md5"] == _md5("shared by two")
    assert out[3]["cleaned_md5"] == _md5("own line three")


def test_all_lines_removed_yields_empty_md5(spark):
    rows = [(1, "the only line"), (2, "the only line")]
    out = _dedup(spark, rows)
    assert out[1]["n_removed"] == 1
    assert out[1]["cleaned_md5"] == _md5("")


def test_order_preserved_around_removed_lines(spark):
    banner = "cookie banner text"
    rows = [
        (1, f"alpha\n{banner}\nbravo\n{banner}\ncharlie"),
        (2, banner),
    ]
    out = _dedup(spark, rows)
    assert out[1]["n_removed"] == 2
    assert out[1]["cleaned_md5"] == _md5("alpha\nbravo\ncharlie")


def test_duplicated_line_keys_is_boilerplate_sized(spark):
    rows = [
        (1, "a\nb\nc\nshared"),
        (2, "d\ne\nf\nshared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicated_line_keys(df).count() == 1
