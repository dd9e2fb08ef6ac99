"""SparkSession factory tuned for the frontier workload.

Scale posture: these configs are what we would ship to a 1000-executor
cluster reading 100 TB — AQE on (skew-join splitting + partition coalescing),
Arrow batching for the extraction UDFs, shuffle partitions sized to cores
locally (overridable for cluster runs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linkinator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # make the package importable inside Python UDF workers regardless of the
    # caller's cwd (spark-submit --py-files provides this on a real cluster)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # Under spark-submit the PythonRunner driver already owns a JVM gateway
    # (PYSPARK_GATEWAY_PORT is exported) carrying the submitted --master and
    # --conf; forcing a master here would fight the deployment. Defer to it
    # unless the caller passed one explicitly.
    submitted = master is None and "PYSPARK_GATEWAY_PORT" in os.environ
    if not submitted:
        master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None and not submitted:
        # local[k] → k; a real cluster would set 2-3x total cores.
        inside = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inside in ("*", "") else int(inside)

    builder = SparkSession.builder.appName(app_name)
    if not submitted:
        builder = builder.master(master)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if (
        submitted
        and shuffle_partitions is None
        and not (extra_conf and "spark.sql.shuffle.partitions" in extra_conf)
        and not spark.sparkContext.getConf().contains(
            "spark.sql.shuffle.partitions")
    ):
        # size shuffles to the cluster the submit actually gave us
        # (runtime-settable; a real deploy overrides via --conf)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )
    return spark
