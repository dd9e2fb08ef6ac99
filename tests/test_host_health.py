"""Host circuit-breaker contract (operators/health.py):

* trailing failures count only fetches AFTER the last success — a
  recovered host does not trip even at a high overall error rate
* a fresh outage trips on trailing even below the rate threshold
* the rate rule needs min_fetches observations (no tripping a host on
  its first failed fetch)
* rate boundary is cross-multiplied (>= at exactly the threshold trips)
* a host with zero successes counts ALL its failures as trailing
* error_rate beats trailing_failures when both hold
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkinator_spark.operators.health import host_health

SCHEMA = "host string, ts long, failed boolean"


def _health(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["host"]: r.asDict() for r in host_health(df, **kw).collect()}


def test_recovered_host_does_not_trip_on_trailing(spark):
    # 6 failures then a success: high rate history but trailing = 0
    rows = [("h1", t, True) for t in range(6)] + [("h1", 6, False)]
    out = _health(spark, rows, rate_micro=900_000, min_fetches=20,
                  max_trailing=5)
    assert out["h1"]["trailing_failures"] == 0
    assert not out["h1"]["tripped"]


def test_fresh_outage_trips_on_trailing(spark):
    # 20 successes then 5 failures: rate 20% < 30% but trailing trips
    rows = [("h1", t, False) for t in range(20)]
    rows += [("h1", 20 + t, True) for t in range(5)]
    out = _health(spark, rows, rate_micro=300_000, min_fetches=20,
                  max_trailing=5)
    assert out["h1"]["trailing_failures"] == 5
    assert out["h1"]["trip_reason"] == "trailing_failures"


def test_min_fetches_gates_the_rate_rule(spark):
    rows = [("h1", 0, True), ("h1", 1, True)]  # 100% rate but n=2
    out = _health(spark, rows, rate_micro=300_000, min_fetches=20,
                  max_trailing=5)
    assert not out["h1"]["tripped"]
    # all failures, no success: everything is trailing
    assert out["h1"]["trailing_failures"] == 2


def test_rate_boundary_and_precedence(spark):
    # exactly 30%: 6 errors / 20 fetches, errors spread so trailing < 5
    rows = []
    for t in range(20):
        rows.append(("h1", t, t % 3 == 0))  # 7 of 20 fail -> 35%
    out = _health(spark, rows, rate_micro=300_000, min_fetches=20,
                  max_trailing=1)
    # both rules hold (last fetch t=18 fails -> trailing >= 1): rate wins
    assert out["h1"]["trip_reason"] == "error_rate"
    # exact boundary: 6/20 == 30% trips with >=
    rows2 = [("h2", t, t < 6) for t in range(20)]
    out2 = _health(spark, rows2, rate_micro=300_000, min_fetches=20,
                   max_trailing=50)
    assert out2["h2"]["error_rate_micro"] == 300_000
    assert out2["h2"]["trip_reason"] == "error_rate"
