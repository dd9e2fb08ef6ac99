"""Local replica of the driver's correctness harness: run every
__spark_entry__ query AND its DuckDB oracle on the same parquet, compare
row count + order-insensitive values (floats rounded).
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.4f}"
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rowset(rows, cols):
    ordered = sorted(cols)
    return sorted(
        tuple(_norm(r[c]) for c in ordered) for r in rows
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from '{path}'")
    return con


def _assert_atomic_schema(name, sdf):
    """Driver-gate guard: the correctness harness hashes cells via pandas,
    which cannot hash list/map/struct cells — every driver-facing query
    must project only atomic columns (see round-4 span_anchors failure)."""
    from pyspark.sql import types as T
    bad = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    assert not bad, f"{name}: non-atomic output columns {bad}"


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
CHECKED = sorted(set(QUERIES) & set(ORACLES))
UNCHECKED = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    _assert_atomic_schema(name, sdf)
    spark_rows = [r.asDict() for r in sdf.collect()]
    cols = sdf.columns

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in res.fetchall()]

    assert sorted(cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s, d = _rowset(spark_rows, cols), _rowset(duck_rows, cols)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:5]
    assert s == d, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"spark={s[i]} duck={d[i]}" for i in mism
    )


@pytest.mark.parametrize("name", UNCHECKED)
def test_uncheckable_query_runs(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    _assert_atomic_schema(name, sdf)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
