"""Result sinks: CSV / JSON / grouped text report.

Reference: CSV rows with quote-when-needed escaping (src/cli.ts:318-341),
JSON full-result dump (src/cli.ts:443-448), and the by-parent grouped console
report with per-state verbosity filtering (src/cli.ts:466-589,647-665).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# verbosity levels (reference src/logger.ts / cli.ts:607-645)
LEVELS = {"DEBUG": 0, "INFO": 1, "WARNING": 2, "ERROR": 3, "NONE": 4}


def filter_by_verbosity(results: DataFrame, verbosity: str = "WARNING") -> DataFrame:
    """shouldShowResult (src/cli.ts:647-665): OK shown at <=WARNING, SKIPPED
    at <=INFO, BROKEN at <=ERROR."""
    level = LEVELS[verbosity.upper()]
    keep = []
    if level <= LEVELS["WARNING"]:
        keep.append("OK")
    if level <= LEVELS["INFO"]:
        keep.append("SKIPPED")
    if level <= LEVELS["ERROR"]:
        keep.append("BROKEN")
    return results.filter(F.col("state").isin(keep))


def write_csv(results: DataFrame, path: str, verbosity: str = "WARNING") -> None:
    """Columns url,status,state,parent,failureDetails like the reference CSV
    (src/cli.ts:248-251); Spark's CSV writer handles the quoting rules the
    reference implements by hand (src/cli.ts:325-336)."""
    out = filter_by_verbosity(results, verbosity).select(
        "url",
        F.coalesce(F.col("status").cast("string"), F.lit("")).alias("status"),
        "state",
        F.coalesce("parent", F.lit("")).alias("parent"),
        F.concat_ws("; ", "failure_details").alias("failureDetails"),
    )
    out.coalesce(1).write.mode("overwrite").option("header", True).option(
        "quoteAll", False
    ).csv(path)


def write_json(results: DataFrame, path: str, verbosity: str = "WARNING") -> None:
    filter_by_verbosity(results, verbosity).coalesce(1).write.mode(
        "overwrite"
    ).json(path)


def text_report(results: DataFrame, verbosity: str = "WARNING",
                elapsed_sec: float | None = None) -> str:
    """Grouped-by-parent console report (src/cli.ts:466-589). Driver-side
    render — report output is human-scale by definition."""
    shown = filter_by_verbosity(results, verbosity).select(
        "url", "status", "state", "parent"
    ).collect()
    by_parent: dict[str, list] = {}
    for r in shown:
        by_parent.setdefault(r["parent"] or "", []).append(r)

    lines: list[str] = []
    for parent in sorted(by_parent):
        if parent:
            lines.append(parent)
        for r in sorted(by_parent[parent], key=lambda x: x["url"]):
            mark = {"OK": "[200]", "BROKEN": "[404]", "SKIPPED": "[SKP]"}.get(r["state"])
            status = r["status"] if r["status"] is not None else ""
            lines.append(f"  [{status or '...'}] {r['url']} ({r['state']})")
        lines.append("")

    total = results.count()
    broken = results.filter("state = 'BROKEN'").count()
    skipped = results.filter("state = 'SKIPPED'").count()
    scanned = total - skipped
    suffix = f" in {elapsed_sec:.3f} seconds" if elapsed_sec is not None else ""
    if broken:
        lines.append(f"ERROR: Detected {broken} broken links. "
                     f"Scanned {scanned} links{suffix}.")
    else:
        lines.append(f"Successfully scanned {scanned} links{suffix}.")
    return "\n".join(lines)
