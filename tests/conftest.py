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
            # the suite keeps ONE session alive across ~200 tests; driver
            # heap accumulates broadcast + localCheckpoint blocks between
            # JVM GCs, and an hour-long run at 8g has died mid-suite.
            # Bigger heap + frequent ContextCleaner GC keeps it bounded.
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "16g"),
            "spark.cleaner.periodicGC.interval": "5min",
            # measured (round 2): AQE ON is ~10% faster even for fixture-
            # sized many-wave crawls (empty-relation propagation prunes the
            # fallback branches faster than its re-planning costs)
            "spark.sql.adaptive.enabled": os.environ.get("LK_TEST_AQE", "true"),
        },
    )
    yield spark


@pytest.fixture(autouse=True)
def _clear_sql_cache(request):
    """Session hygiene: SQL-cache entries (df.persist) are NOT touched by
    Spark's ContextCleaner — they live until unpersist/clearCache. Across
    ~500 tests in one JVM the accumulated cached plans + batches pinned
    ~15 GB of old-gen and full-GC-thrashed the suite to a standstill.
    Clearing after every Spark-using test keeps the heap flat; frames are
    lazily recomputable, so module-scoped fixtures stay valid."""
    yield
    if "spark" in request.fixturenames:
        try:
            request.getfixturevalue("spark").catalog.clearCache()
        except Exception:
            pass
