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
