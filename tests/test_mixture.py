"""Temperature-based domain mixture sampling (sampling.mixture_sample).

Pins the exact integer quota arithmetic against a pure-Python twin, the
alpha extremes (1 = natural proportions, 0 = uniform mixture), the
without-replacement cap on upsampled rare domains, and bit-stability
under repartition.
"""

import pytest
from pyspark.sql import functions as F

from linkinator_spark.functions.sampling import mixture_sample


def _expected_quotas(counts: dict[str, int], target: int, alpha: float):
    w = {d: round((c ** alpha) * 1e6) for d, c in counts.items()}
    tw = sum(w.values())
    return {d: min(counts[d], (target * w[d]) // tw) for d in counts}


def _docs(spark, counts: dict[str, int]):
    rows, i = [], 0
    for d, c in sorted(counts.items()):
        for _ in range(c):
            rows.append((i, d))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mixture_quotas_match_python_twin(spark):
    counts = {"en": 800, "de": 150, "sw": 40, "yo": 10}
    docs = _docs(spark, counts)
    got = mixture_sample(docs, target_rows=400, alpha=0.5).collect()
    exp = _expected_quotas(counts, 400, 0.5)
    per = {}
    for r in got:
        per.setdefault(r["domain"], set()).add(r["id"])
        assert r["quota"] == exp[r["domain"]]
        assert 1 <= r["mix_rank"] <= r["quota"]
    assert {d: len(v) for d, v in per.items()} == {
        d: q for d, q in exp.items() if q > 0}
    # alpha=0.5 up-weights the tail: sw's share of the sample beats its
    # share of the corpus, en's share shrinks
    assert len(per["sw"]) / 400 > counts["sw"] / 1000
    assert len(per["en"]) / 400 < counts["en"] / 1000


def test_mixture_alpha_one_is_proportional_and_zero_is_uniform(spark):
    counts = {"a": 600, "b": 300, "c": 100}
    docs = _docs(spark, counts)
    nat = {r["domain"]: r["quota"]
           for r in mixture_sample(docs, 500, alpha=1.0).collect()}
    assert nat == {"a": 300, "b": 150, "c": 50}
    uni = {r["domain"]: r["quota"]
           for r in mixture_sample(docs, 90, alpha=0.0).collect()}
    assert uni == {"a": 30, "b": 30, "c": 30}


def test_mixture_rare_domain_capped_at_own_size(spark):
    # alpha=0 wants 100 docs from each, but "tiny" only has 5
    counts = {"big": 1000, "tiny": 5}
    docs = _docs(spark, counts)
    got = mixture_sample(docs, 200, alpha=0.0).collect()
    per = {}
    for r in got:
        per.setdefault(r["domain"], set()).add(r["id"])
    assert len(per["tiny"]) == 5
    assert len(per["big"]) == 100


def test_mixture_bit_stable_under_repartition(spark):
    counts = {"en": 300, "fr": 120, "zh": 60}
    docs = _docs(spark, counts)
    a = {(r["id"], r["mix_rank"])
         for r in mixture_sample(docs, 250, alpha=0.7).collect()}
    b = {(r["id"], r["mix_rank"])
         for r in mixture_sample(docs.repartition(13), 250, alpha=0.7).collect()}
    assert a == b and len(a) > 0


def test_mixture_with_replacement_exact_targets(spark):
    # alpha=0, target 300 over 3 domains -> 100 each; "tiny" (5 docs)
    # upsamples to exactly 100 via 20 full epochs; "mid" (40) gets
    # 2 epochs + 20 remainder copies; "big" (200) downsamples to 100
    counts = {"big": 200, "mid": 40, "tiny": 5}
    docs = _docs(spark, counts)
    got = mixture_sample(docs, 300, alpha=0.0,
                         with_replacement=True).collect()
    per, copies = {}, {}
    for r in got:
        per.setdefault(r["domain"], 0)
        per[r["domain"]] += 1
        copies.setdefault((r["domain"], r["id"]), set()).add(r["copy_idx"])
    assert per == {"big": 100, "mid": 100, "tiny": 100}
    # every tiny doc appears exactly 20x with dense copy_idx 0..19
    tiny_sets = [v for (d, _), v in copies.items() if d == "tiny"]
    assert all(v == set(range(20)) for v in tiny_sets)
    # downsampled domain never repeats
    assert all(v == {0} for (d, _), v in copies.items() if d == "big")
    # remainder epoch: mid docs have either 2 or 3 copies, dense from 0
    mid_sizes = sorted(len(v) for (d, _), v in copies.items() if d == "mid")
    assert mid_sizes == [2] * 20 + [3] * 20
    for (d, _), v in copies.items():
        assert v == set(range(len(v)))


def test_mixture_with_replacement_stable_under_repartition(spark):
    counts = {"a": 120, "b": 30}
    docs = _docs(spark, counts)
    key = lambda rows: sorted((r["id"], r["copy_idx"]) for r in rows)
    a = key(mixture_sample(docs, 200, alpha=0.3,
                           with_replacement=True).collect())
    b = key(mixture_sample(docs.repartition(11), 200, alpha=0.3,
                           with_replacement=True).collect())
    assert a == b and len(a) > 0
