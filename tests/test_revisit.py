"""Recrawl scheduling contract (operators/revisit.py):

* n_changes counts hash TRANSITIONS in fetch time order — an A-B-A
  revert counts twice (count(distinct) would say 1)
* a never-changed page has rate 0 and is NOT scheduled
* a just-fetched page (age 0) is NOT scheduled, whatever its rate
* rate is monotone in the observed change fraction at fixed history
* the per-host budget binds with deterministic priority-desc order and
  the global emission rank follows (-priority, url)
* a single-observation URL (no intervals) is rate 0, not an error
"""

import pyspark.sql.functions as F

from linkinator_spark.operators.revisit import (
    revisit_priorities,
    revisit_schedule,
)


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, fetch_ts long, content_hash string")


def test_change_count_and_rates(spark):
    rows = [
        # ABA revert: 2 transitions over 2 intervals
        ("u/aba", "h1", 0, "A"), ("u/aba", "h1", 100, "B"),
        ("u/aba", "h1", 200, "A"),
        # constant: 0 transitions over 2 intervals
        ("u/const", "h1", 0, "X"), ("u/const", "h1", 100, "X"),
        ("u/const", "h1", 200, "X"),
        # one change over 2 intervals
        ("u/half", "h1", 0, "X"), ("u/half", "h1", 100, "X"),
        ("u/half", "h1", 200, "Y"),
        # single fetch: no intervals
        ("u/one", "h1", 0, "X"),
    ]
    out = {
        r["url"]: r
        for r in revisit_priorities(
            _hist(spark, rows), now_ts=400, interval=100).collect()
    }
    assert out["u/aba"]["n_changes"] == 2
    assert out["u/const"]["n_changes"] == 0
    assert out["u/half"]["n_changes"] == 1
    assert out["u/one"]["n_fetches"] == 1 and out["u/one"]["rate_micro"] == 0
    # -ln((I - X + .5)/(I + .5)) at I=2: X=0 -> 0, monotone in X
    assert out["u/const"]["rate_micro"] == 0
    assert 0 < out["u/half"]["rate_micro"] < out["u/aba"]["rate_micro"]
    # age: last fetch at 200, now 400, interval 100 -> 2 (0 for u/one? no:
    # u/one last fetch 0 -> age 4, but rate 0 zeroes the priority)
    assert out["u/aba"]["age_intervals"] == 2
    assert out["u/one"]["priority_micro"] == 0
    assert out["u/const"]["priority_micro"] == 0


def test_schedule_excludes_fresh_and_static(spark):
    rows = [
        # changes often but fetched right now -> age 0 -> not scheduled
        ("u/fresh", "h1", 0, "A"), ("u/fresh", "h1", 100, "B"),
        ("u/fresh", "h1", 400, "C"),
        # never changes -> rate 0 -> not scheduled
        ("u/static", "h1", 0, "X"), ("u/static", "h1", 100, "X"),
        # changed and stale -> scheduled
        ("u/due", "h1", 0, "A"), ("u/due", "h1", 100, "B"),
    ]
    sched = revisit_schedule(
        _hist(spark, rows), now_ts=400, interval=100, budget=5).collect()
    assert [r["url"] for r in sched] == ["u/due"]
    assert sched[0]["emit_rank"] == 1 and sched[0]["host_rank"] == 1


def test_budget_and_emission_order(spark):
    rows = []
    # host h1: three URLs, staleness priority strictly ordered by age
    for k, last in [("a", 100), ("b", 200), ("c", 300)]:
        rows += [(f"u/{k}", "h1", 0, "A"), (f"u/{k}", "h1", last, "B")]
    # host h2: one stale URL, same shape as u/a
    rows += [("u/z", "h2", 0, "A"), ("u/z", "h2", 100, "B")]
    sched = revisit_schedule(
        _hist(spark, rows), now_ts=600, interval=100, budget=2).collect()
    by_url = {r["url"]: r for r in sched}
    # h1 budget 2: oldest-last-fetch (= highest age) two kept, u/c dropped
    assert set(by_url) == {"u/a", "u/b", "u/z"}
    # equal rates; ages: u/a 5, u/b 4, u/z 5 -> priorities tie u/a == u/z,
    # tie broken by url asc ("u/a" < "u/z")
    order = [r["url"] for r in sorted(sched, key=lambda r: r["emit_rank"])]
    assert order == ["u/a", "u/z", "u/b"]
    assert by_url["u/a"]["host_rank"] == 1 and by_url["u/b"]["host_rank"] == 2
