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
