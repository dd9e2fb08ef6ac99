"""corpus_build_v2 — the FineWeb-style curation chain (blocklist -> C4 ->
Gopher -> exact-dedup keeper -> split) composed as one dataflow.

The oracle harness (test_entry_oracle) already value-checks the full
result against DuckDB; these tests pin the pipeline-shape claims that a
hash match alone would not distinguish: the planted duplicate copies
actually REACH the dedup stage (the gates don't separate the pairs
first) and the keeper collapses every pair onto the original doc_id.
"""

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_v2_copies_survive_gates_and_collapse(spark):
    out = entrymod.q_corpus_build_v2(spark, SF_DIR).cache()
    rows = out.collect()
    assert len(rows) > 0
    # every planted copy was collapsed onto its original (keeper = min id)
    assert all(r.doc_id < entrymod._V2_SHIFT for r in rows)

    # and the copies genuinely reached the dedup stage: rerun the gate
    # stack over the dup-planted input and count surviving copies
    from linkinator_spark.functions import blocklist as BL
    from linkinator_spark.functions import c4 as C4
    from linkinator_spark.functions import gopher as GP

    dd = entrymod._docs_v2(spark, SF_DIR)
    gated = dd.select(
        "doc_id",
        GP.gopher_pass(entrymod._gopher_demo_text()).alias("g"),
        C4.page_kept(entrymod._c4_demo_text()).alias("c"),
    ).filter("g and c")
    rules = spark.createDataFrame(
        [(r,) for r in entrymod._BLOCKLIST_RULES], "domain string")
    host = F.concat(
        F.lit("sub"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".site"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".example"))
    surv = BL.apply_blocklist(
        gated.select("doc_id", host.alias("host")), rules,
        url_col="doc_id").filter("blocked = 0")
    n_copies = surv.filter(
        F.col("doc_id") >= entrymod._V2_SHIFT).count()
    assert n_copies > 0
    # final row count = survivors minus the collapsed copies
    assert len(rows) == surv.count() - n_copies


def test_v2_shift_preserves_every_planting_modulus():
    # the copy shift must be ≡ 0 under every doc_id modulus the v2 gate
    # plantings key on, or a copy's gate text would diverge from its
    # original's and the pair could never co-survive
    for mod in (3, 4, 5, 6, 7, 11, 19, 20, 23):
        assert entrymod._V2_SHIFT % mod == 0


def test_v2_reshuffle_stable(spark):
    """The v2 chain is a pure function of the input rows: recomputing on
    a repartitioned source must select exactly the same corpus with the
    same split labels."""
    a = {r.doc_id: (r.host, r.n_words, r.n_kept, r.split)
         for r in entrymod.q_corpus_build_v2(spark, SF_DIR).collect()}

    import linkinator_spark.functions.blocklist as BL
    import linkinator_spark.functions.c4 as C4
    import linkinator_spark.functions.gopher as GP
    import linkinator_spark.functions.sampling as SMP
    from linkinator_spark.functions import text as T

    dd = entrymod._docs_v2(spark, SF_DIR).repartition(17)
    d = F.col("doc_id")
    host = F.concat(F.lit("sub"), (d % 3).cast("string"),
                    F.lit(".site"), (d % 20).cast("string"),
                    F.lit(".example"))
    gated = dd.select(
        "doc_id", "text", host.alias("host"),
        GP.gopher_features(entrymod._gopher_demo_text())["n_words"]
        .alias("n_words"),
        GP.gopher_pass(entrymod._gopher_demo_text()).alias("_gok"),
        F.size(C4.kept_lines(entrymod._c4_demo_text())).cast("long")
        .alias("n_kept"),
        C4.page_kept(entrymod._c4_demo_text()).alias("_cok"),
    ).filter(F.col("_gok") & F.col("_cok"))
    rules = spark.createDataFrame(
        [(r,) for r in entrymod._BLOCKLIST_RULES], "domain string")
    surv = (
        BL.apply_blocklist(gated, rules, url_col="doc_id")
        .filter(F.col("blocked") == 0)
        .select("doc_id", "host", "n_words", "n_kept",
                F.md5(T.normalize_text(F.col("text"))).alias("ck"))
    )
    keepers = surv.groupBy("ck").agg(F.min("doc_id").alias("doc_id"))
    _, split = SMP.split_expr("doc_id")
    b = {r.doc_id: (r.host, r.n_words, r.n_kept, r.split)
         for r in surv.join(keepers, ["ck", "doc_id"])
         .select("doc_id", "host", "n_words", "n_kept",
                 split.alias("split")).collect()}
    assert a == b


def test_v3_line_dedup_composes_without_breaking_the_keeper(spark):
    """corpus_build_v3: min_dup_docs=3 line dedup removes the >=3-doc
    boilerplate from every doc but leaves the multiplicity-2 planted
    copies intact for the DOCUMENT dedup keeper."""
    out = entrymod.q_corpus_build_v3(spark, SF_DIR).cache()
    rows = out.collect()
    assert len(rows) > 0
    # the keeper still collapses every planted copy onto the original
    assert all(r.doc_id < entrymod._V2_SHIFT for r in rows)
    # boilerplate was actually removed: the c4 demo text carries four
    # non-prose lines shared corpus-wide, so every doc loses at least 4;
    # a handful lose more when their prose slices repeat in the
    # synthetic corpus (observed: one doc at sf0.001)
    assert all(r.n_line_removed >= 4 for r in rows)
    assert sum(r.n_line_removed == 4 for r in rows) >= len(rows) * 4 // 5
    # the surviving prose slices are doc-specific: a copy pair shares a
    # line_md5, but the corpus doesn't collapse to one fingerprint
    assert out.select("line_md5").distinct().count() > len(rows) // 2

    # v3 == v2 on the shared columns (line dedup adds features, it must
    # not change WHICH docs survive at this threshold)
    v2 = entrymod.q_corpus_build_v2(spark, SF_DIR)
    assert (out.select("doc_id", "host", "n_words", "n_kept", "split")
            .exceptAll(v2).count() == 0)
    assert v2.exceptAll(
        out.select("doc_id", "host", "n_words", "n_kept", "split")
    ).count() == 0
