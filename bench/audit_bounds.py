#!/usr/bin/env python
"""Audit every driver query's boolean contracts at an arbitrary SF.

The harness's correctness gate runs at sf0.01; this sweeps ALL queries at
any scale (default sf0.1) and fails loudly if any boolean column in any
result row is False — the check that caught the round-3 heavy-hitter
containment fragility, kept runnable for future scales.

Usage: python bench/audit_bounds.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument(
        "--only", default=None, help="comma-separated query names (default: all)"
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark(
        app="sketchlib-audit", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    fails: list = []
    checked = 0
    for name, fn in E.queries().items():
        if only is not None and name not in only:
            continue
        try:
            rows = fn(spark, args.sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            fails.append({"query": name, "error": str(e)[:200]})
            continue
        bad = sum(
            1
            for r in rows
            for v in r.asDict().values()
            if isinstance(v, bool) and v is False
        )
        checked += 1
        if bad:
            fails.append({"query": name, "false_booleans": bad, "rows": len(rows)})
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "queries_checked": checked,
                "all_contracts_hold": not fails,
                "fails": fails,
            }
        )
    )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
