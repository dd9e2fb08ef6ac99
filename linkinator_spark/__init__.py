"""linkinator_spark — a from-scratch PySpark-native re-creation of
JustinBeckwith/linkinator's recursive broken-link checker as a distributed
URL-frontier + fetch scheduler.

Reference semantics: /root/reference (linkinator, TypeScript). This package is
NOT a port — it re-expresses what the reference computes (link extraction,
URL canonicalization + fetch-once dedup, OK/BROKEN/SKIPPED classification,
retry taxonomy, per-host politeness) as idiomatic Spark DataFrame dataflow:
BFS waves, anti-join dedup, broadcast dimension joins, vectorized Arrow UDFs.
"""

from linkinator_spark.config import CheckOptions, LinkState

__all__ = ["CheckOptions", "LinkState"]
__version__ = "0.1.0"
