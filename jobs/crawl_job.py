"""spark-submit entry point for the crawl.

The north-star deployment (BASELINE.json "north_star") runs the checker as

    spark-submit --master <cluster> \
        --py-files dist/linkinator_spark.zip \
        jobs/crawl_job.py http://seed/ --pages pages.parquet \
        --documents docs.parquet --recurse --format json --output out/

This script is deliberately a thin shim over ``linkinator_spark.cli.main``:
every flag the CLI accepts works identically under spark-submit. The only
deployment-specific behavior lives in ``linkinator_spark.session.get_spark``,
which detects the spark-submit-launched JVM gateway (``PYSPARK_GATEWAY_PORT``
in the environment) and defers to the submitted ``--master`` / ``--conf``
instead of forcing a local master.

Build the --py-files archive with ``python tools/make_pyfiles.py``
(writes ``dist/linkinator_spark.zip``). End-to-end coverage:
``tests/test_spark_submit.py`` runs this exact command line against a
scripted fixture site and checks results + exit-code semantics.
"""

import sys

from linkinator_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
