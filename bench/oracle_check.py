#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries() entry at sf0.01 and compares row count,
column names, and sorted value tuples against oracle_sql() executed by
DuckDB over the same parquet tables. Usage:

    python bench/oracle_check.py [query ...]   # default: all
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import duckdb

    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8)
    E.entry(spark)  # materializes the sequences parquet the oracles read

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:42s} rows={len(srows):6d}  (no oracle)")
            continue
        ocols = None
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"{name:42s} ORACLE ERROR: {e}")
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        s_sorted = sorted(
            tuple(_norm(r[c]) for c in sorted(scols)) for r in srows
        )
        o_by = [dict(zip(ocols, r)) for r in orows]
        o_sorted = sorted(
            tuple(_norm(r[c]) for c in sorted(ocols)) for r in o_by
        )
        ok_hash = s_sorted == o_sorted
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append((name, (ok_rows, ok_schema, ok_hash)))
        print(
            f"{name:42s} {status}  rows={ok_rows} schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL" and len(s_sorted) <= 30:
            print("  spark :", s_sorted[:6])
            print("  oracle:", o_sorted[:6])
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("\nall checked queries match")


if __name__ == "__main__":
    main()
