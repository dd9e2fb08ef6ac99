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
            # measured (round 2): AQE ON is ~10% faster even for fixture-
            # sized many-wave crawls (empty-relation propagation prunes the
            # fallback branches faster than its re-planning costs)
            "spark.sql.adaptive.enabled": os.environ.get("LK_TEST_AQE", "true"),
        },
    )
    yield spark
