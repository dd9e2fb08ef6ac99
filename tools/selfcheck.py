#!/usr/bin/env python
"""Self-run the driver's correctness gate: every queries() entry vs its
oracle_sql() on DuckDB at sf0.01 — row count, sorted-column schema, value hash.
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def value_hash(rows, cols):
    # normalize: sort columns by name, stringify floats at 6dp, sort rows
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = []
    for r in rows:
        parts = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                parts.append(f"{v:.6f}")
            elif isinstance(v, bool):
                parts.append(str(int(v)))
            elif v is None:
                parts.append("NULL")
            else:
                parts.append(str(v))
        lines.append("|".join(parts))
    lines.sort()
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import duckdb

    import __spark_entry__ as E
    from linkinator_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="selfcheck", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            sr = df.collect()
            scols = df.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sr)} rows, no oracle)")
            continue
        try:
            rel = con.execute(oracles[name])
            orows = rel.fetchall()
            ocols = [d[0] for d in rel.description]
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        problems = []
        if len(sr) != len(orows):
            problems.append(f"rows {len(sr)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh = value_hash([tuple(r) for r in sr], scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            fails.append(name)
        else:
            print(f"PASS {name} ({len(sr)} rows, {time.time() - t0:.2f}s)")
    spark.stop()
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
