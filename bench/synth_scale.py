#!/usr/bin/env python
"""Synthesize a larger 'sfN-shaped' dataset from an existing sf dir.

Perf smoke-testing only (no oracle claims): k copies of each heavy table
with shifted keys, written as ONE single-row-group parquet file per table
to mirror the driver layout (the shape that makes scans unsplittable —
exactly what the input-skew rescue exists for). Document texts are
perturbed per copy ('... vK') so the dedup structure stays plausible
rather than 10x exact duplicates; note the near-dup DENSITY is still far
above a real corpus (every doc gains k-1 planted near-copies), which
inflates the LSH pair queries relative to organic data.

Usage: python bench/synth_scale.py [--src /root/testdata/sf0.1]
                                   [--dst /root/testdata_syn/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/testdata_syn/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    src, dst, k = args.src, args.dst, args.k
    os.makedirs(dst, exist_ok=True)

    import duckdb

    con = duckdb.connect()

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 100000000, COMPRESSION ZSTD)"
        )
        print(name, os.path.getsize(f"{dst}/{name}.parquet") // 1024, "KB", flush=True)

    K = f"(SELECT UNNEST(range({k})) AS k)"
    write(
        "documents",
        f"""SELECT doc_id + k * 1000000 AS doc_id,
               CASE WHEN k = 0 THEN text ELSE text || ' v' || k::VARCHAR END AS text,
               lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet'), {K}""",
    )
    write(
        "events",
        f"""SELECT event_id + k * 10000000 AS event_id, ts,
               user_id + (k % 5) * 100000 AS user_id, event_type, value, props
            FROM read_parquet('{src}/events.parquet'), {K}""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + k * 10000000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'), {K}""",
    )
    write(
        "orders",
        f"""SELECT o_orderkey + k * 10000000 AS o_orderkey,
               o_custkey + (k % 5) * 1000000 AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{src}/orders.parquet'), {K}""",
    )
    write(
        "embeddings",
        f"""SELECT vec_id + k * 100000 AS vec_id,
               list_transform(embedding, x -> x + (k * 0.001)::FLOAT) AS embedding,
               label
            FROM read_parquet('{src}/embeddings.parquet'),
                 (SELECT UNNEST(range({max(1, k // 2)})) AS k)""",
    )
    for t in ("part", "customer", "supplier", "nation", "region"):
        write(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")
    open(f"{dst}/_DONE", "w").close()


if __name__ == "__main__":
    main()
