#!/usr/bin/env python
"""One leg of the N-vs-4N scaling evidence: run the flagship sketch job at a

fixed core count and print a JSON line with throughput + a content hash of
the final sketches.

The job (identical at every parallelism level, per BASELINE.md protocol):
  sequences parquet scan -> HLL partial build (p=14, seed=314)
  -> per-source tree merge -> global rollup merge -> estimates.

Usage: spark-submit --py-files sketchlib.zip scaling_job.py --cores N
       [--rows 4000000] [--data-root /tmp/sketchlib_scaling]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--data-root", default="/tmp/sketchlib_scaling")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from sketchlib.agg import HllAggregator
    from sketchlib.data import gen_sequences_pandas, SEQUENCES_SCHEMA, sequences_parquet
    from sketchlib.hll import HllSketch
    from sketchlib.session import get_spark

    # identical configs at both levels except master (BASELINE.md protocol)
    spark = get_spark(
        app=f"scaling-{args.cores}", master=f"local[{args.cores}]", shuffle_partitions=32
    )

    path = sequences_parquet(spark, args.rows, cache_root=args.data_root)

    # warm JVM + python workers + pyarrow imports
    warm = spark.createDataFrame(gen_sequences_pandas(512), schema=SEQUENCES_SCHEMA)
    HllAggregator(p=8, key_cols=["source"]).estimates(warm.repartition(args.cores)).collect()

    def _warm_imports(it):
        import pyarrow.dataset  # noqa: F401
        import pyarrow.parquet  # noqa: F401

        yield from it

    spark.range(args.cores * 4, numPartitions=args.cores).mapInArrow(
        _warm_imports, "id long"
    ).collect()

    agg = HllAggregator(p=14, key_cols=["source"])
    n_items = 0
    best = float("inf")
    digest = None
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        per_source = agg.merged(path, spark=spark).collect()
        blobs = sorted((r["source"], bytes(r["sketch"])) for r in per_source)
        global_sketch = HllSketch.merge_blobs([b for _, b in blobs], 14)
        wall = time.perf_counter() - t0
        best = min(best, wall)
        n_items = sum(r["n_items"] for r in per_source)
        h = hashlib.sha256()
        for src, blob in blobs:
            h.update(src.encode())
            h.update(blob)
        h.update(global_sketch.to_bytes())
        digest = h.hexdigest()

    # byte-determinism law extended to the order-SENSITIVE sketches
    # (VERDICT r02 #7): per-row-group partials (parallelism-independent
    # grain) + content-seeded KLL parity + canonical sorted-blob merges must
    # produce the same bytes at every core count. Not part of the timed
    # throughput job — it is the invariance evidence.
    from sketchlib.agg import KllAggregator, TDigestAggregator

    qh = hashlib.sha256()
    for qagg in (
        KllAggregator(k=200, key_cols=["source"], value_col="n_tok", value_kind="int32"),
        TDigestAggregator(
            delta=200, key_cols=["source"], value_col="n_tok", value_kind="int32"
        ),
    ):
        parts = qagg.partials_from_parquet(spark, path, per_shard=True)
        for src, blob in sorted(
            (r["source"], bytes(r["sketch"]))
            for r in qagg.merged(parts, is_partials=True).collect()
        ):
            qh.update(src.encode())
            qh.update(blob)

    out = {
        "cores": args.cores,
        "rows": args.rows,
        "tokens": n_items,
        "wall_sec": round(best, 3),
        "tokens_per_sec": round(n_items / best),
        "sketch_sha256": digest,
        "quantile_sketch_sha256": qh.hexdigest(),
        "global_estimate": global_sketch.cardinality(),
    }
    spark.stop()
    print("SCALING_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
