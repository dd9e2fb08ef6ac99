#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement; this file holds the guide-§1 instrumentation).

Times individual declared queries with the noop sink (computes every column
of every row, discards the result — no sink cost, no count() pruning), with
job descriptions so the UI/event log is readable, and can dump
`.explain("formatted")` for any query into plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (noop, best-of-N)
  python bench_extra.py --explain q1 ...     # write plans/r06/<q>_<tag>.txt
  REPS=3 SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SF_DIR", os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))
TAG = os.environ.get("TAG", "before")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]

    import __spark_entry__ as E
    from linkinator_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-bench",
                                  "spark.driver.memory": "32g"})
    qs = E.queries()
    names = args or list(qs)
    out: dict[str, dict] = {}
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        # warm pass at the smallest sf (JIT/codegen cold start)
        if os.path.isdir(warm_dir):
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(REPS):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name}: min={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": out}))


def dump_plans(names: list[str], tag: str = TAG, sf_dir: str = SF_DIR) -> None:
    """Write .explain('formatted') for each query to plans/r06/."""
    import __spark_entry__ as E
    from linkinator_spark.session import get_spark

    spark = get_spark(app_name="explain", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-bench"})
    qs = E.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = f"plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    if "--explain" in sys.argv:
        dump_plans([a for a in sys.argv[1:] if not a.startswith("--")])
    else:
        main()
