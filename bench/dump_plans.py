#!/usr/bin/env python
"""Dump .explain('formatted') for declared queries to per-query text files.

Usage:
    python bench/dump_plans.py OUT_DIR SUFFIX [query ...]   # default: all

Writes OUT_DIR/<query>_<SUFFIX>.txt. Used by the optimization rounds to
capture plan evidence (plans/rNN/<query>_before.txt / _after.txt): run it
once from the round-start tree (a git worktree) and once from the current
tree. Queries whose returned DataFrame is a driver-built literal still get
their (trivial) final plan — the eager phases behind them are documented in
the round's OPTIMIZATION notes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark(app="dump-plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    E.entry(spark)  # materialize the sequences parquet the queries read

    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
