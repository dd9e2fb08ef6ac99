import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from linkinator_spark.session import get_spark

    spark = get_spark(
        app_name="linkinator-tests",
        master=os.environ.get("LK_TEST_MASTER", "local[4]"),
        shuffle_partitions=int(os.environ.get("LK_TEST_SHUFFLE", "4")),
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/lkspark-warehouse",
            # fixture crawls are a handful of rows over many waves: per-query
            # planning overhead dominates, so AQE re-planning is pure cost here
            "spark.sql.adaptive.enabled": os.environ.get("LK_TEST_AQE", "false"),
        },
    )
    yield spark
