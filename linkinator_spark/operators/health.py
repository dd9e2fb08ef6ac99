"""Per-host circuit breaker — quarantine hosts that are failing.

Production crawlers (Heritrix's host quarantine, Nutch's fetch-status
host backoff) stop scheduling a host whose recent fetches keep failing:
hammering a dead or rate-limiting host wastes politeness budget and
invites blocks. The reference retries per URL (src/queue.ts retry
logic) but has no host-level view; at 10^10-URL frontier scale host
health IS the scheduling signal that keeps dead hosts from occupying
wave slots.

Two trip conditions, either sufficient:

* error rate:  n_errors / n_fetches >= rate threshold with at least
  ``min_fetches`` observations (cross-multiplied — no float division);
* trailing failures: every fetch AFTER the host's last success failed,
  and there are >= ``max_trailing`` of them (a 30%-error host that just
  recovered should NOT trip; a 10%-error host in a fresh outage should).

Scale shape: pass 1 is one map-side-combined groupBy(host) (counts and
the MAX success timestamp — max combines, so a hot host is skew-safe);
pass 2 re-aggregates only the FAILED fetches against the broadcast-or-
shuffled last-success table (host joins are the known skewed shape —
AQE skew-join splits a hot host, and the failed-side input is already
a small fraction of traffic). No window over a host's fetch list: a
10^8-URL host never buffers in one task.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["host_health"]


def host_health(
    fetches: DataFrame,
    rate_micro: int = 300_000,
    min_fetches: int = 20,
    max_trailing: int = 5,
) -> DataFrame:
    """Per-host health rollup + trip verdict.

    ``fetches`` has one row per fetch attempt: (host, ts:long,
    failed:boolean). Output, one row per host:
    (host, n_fetches, n_errors, error_rate_micro, trailing_failures,
    tripped, trip_reason) — trip_reason in ('error_rate',
    'trailing_failures', '') with error_rate checked first.
    """
    base = fetches.groupBy("host").agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.col("failed").cast("long")).alias("n_errors"),
        F.max(F.when(~F.col("failed"), F.col("ts"))).alias("_last_ok"),
    )
    trailing = (
        fetches.filter(F.col("failed"))
        .join(base.select("host", "_last_ok"), "host", "left")
        .filter(F.col("_last_ok").isNull()
                | (F.col("ts") > F.col("_last_ok")))
        .groupBy("host")
        .agg(F.count("*").alias("trailing_failures"))
    )
    out = (
        base.join(trailing, "host", "left")
        .withColumn("trailing_failures",
                    F.coalesce("trailing_failures", F.lit(0)))
        .withColumn(
            "error_rate_micro",
            F.floor(F.col("n_errors") * 1_000_000 / F.col("n_fetches")))
    )
    rate_trips = (
        (F.col("n_fetches") >= min_fetches)
        & (F.col("n_errors") * 1_000_000
           >= F.lit(int(rate_micro)) * F.col("n_fetches"))
    )
    trail_trips = F.col("trailing_failures") >= max_trailing
    reason = (
        F.when(rate_trips, F.lit("error_rate"))
        .when(trail_trips, F.lit("trailing_failures"))
        .otherwise(F.lit(""))
    )
    return out.select(
        "host", "n_fetches", "n_errors", "error_rate_micro",
        "trailing_failures",
    ).withColumn("trip_reason", reason).withColumn(
        "tripped", F.col("trip_reason") != "")
