"""Crawl snapshot diffing — the report a CI user actually reads.

The reference checker is one-shot: every run prints the full result
list (reference: src/index.ts LinkChecker.check returns all links each
time). A user running it in CI diffs runs by hand to find what BROKE
SINCE LAST TIME. With crawl results checkpointed as tables (WaveStore),
that diff is a first-class operator: full-outer-join the previous and
current result tables on the canonical URL and classify every URL's
transition.

Transitions, first match wins:

* ``new``          — URL appears only in the current crawl
* ``gone``         — URL appears only in the previous crawl
* ``newly_broken`` — was not BROKEN, is now (the CI alert line)
* ``fixed``        — was BROKEN, is not any more
* ``still_broken`` — BROKEN in both (even if the status code moved,
  e.g. 404 -> 503: still one broken link, not a new incident)
* ``changed``      — state or status code moved within non-broken
  (e.g. OK 200 -> OK 301-resolved, OK -> SKIPPED by a new rule)
* ``unchanged``    — same state and status

Scale shape (10^10 URLs): ONE full-outer join keyed on the canonical
URL — globally unique and hash-uniform, so no skew; both sides prune to
(url, status, state) at the scan. Everything else is a codegen CASE.
On a standing corpus both snapshots can be bucketed by url at write
time (WaveStore), making the join co-located with zero shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["crawl_diff"]


def crawl_diff(prev: DataFrame, curr: DataFrame) -> DataFrame:
    """Classify every URL's transition between two crawl result tables.

    Inputs both have (url, status:int, state:string) — extra columns are
    ignored. Output: (url, prev_status, prev_state, curr_status,
    curr_state, transition); prev_*/curr_* are NULL on new/gone rows.
    """
    p = prev.select(
        "url",
        F.col("status").cast("int").alias("prev_status"),
        F.col("state").alias("prev_state"),
    )
    c = curr.select(
        "url",
        F.col("status").cast("int").alias("curr_status"),
        F.col("state").alias("curr_state"),
    )
    j = p.join(c, "url", "full_outer")
    in_prev = F.col("prev_state").isNotNull()
    in_curr = F.col("curr_state").isNotNull()
    was_broken = F.col("prev_state") == "BROKEN"
    is_broken = F.col("curr_state") == "BROKEN"
    transition = (
        F.when(~in_prev, F.lit("new"))
        .when(~in_curr, F.lit("gone"))
        .when(~was_broken & is_broken, F.lit("newly_broken"))
        .when(was_broken & ~is_broken, F.lit("fixed"))
        .when(was_broken & is_broken, F.lit("still_broken"))
        .when(
            (F.col("prev_status") != F.col("curr_status"))
            | (F.col("prev_state") != F.col("curr_state")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.withColumn("transition", transition)
