#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every query in ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "tokens_per_sec": ...}

Scaling evidence (N vs 4N parallelism) lives in bench/scaling.py; this file
is the per-round throughput snapshot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark(app="sketchlib-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # warm the JVM and the Python worker pool (imports of numpy/pandas/
    # sketchlib in each reused worker) so per-query timings measure the
    # pipeline, not process startup
    spark.range(1000).selectExpr("sum(id)").collect()
    from sketchlib.agg import HllAggregator
    from sketchlib.data import SEQUENCES_SCHEMA, gen_sequences_pandas

    warm = spark.createDataFrame(gen_sequences_pandas(512), schema=SEQUENCES_SCHEMA)
    HllAggregator(p=8, key_cols=["source"]).estimates(warm.repartition(cpus)).collect()
    # warm the parquet-scan imports (pyarrow dataset/parquet) in every worker
    def _warm_imports(it):
        import pyarrow.dataset  # noqa: F401
        import pyarrow.parquet  # noqa: F401

        yield from it

    spark.range(cpus * 4, numPartitions=cpus).mapInArrow(_warm_imports, "id long").collect()

    # materialize the canonical sequences table up front: dataset prep is not
    # query time (queries would otherwise pay the one-time parquet write)
    from sketchlib.data import rows_for_sf_dir, sequences_parquet

    sequences_parquet(spark, rows_for_sf_dir(sf_dir))

    # cold/warm split (VERDICT r01 #8): the first run of a query pays
    # one-time whole-stage-codegen compilation and scan-cache warmup; the
    # second measures the steady-state pipeline. Reporting both keeps
    # regressions visible instead of hidden in cross-query cache effects.
    def release_leaked_blocks() -> None:
        # several queries pin eager localCheckpoint blocks (merged sketch
        # rows reused within the query); the DataFrames go out of scope but
        # the RDD blocks stay in the block manager — 100+ query executions
        # later the accumulated storage inflates GC pressure and skews the
        # warm pass. Release them between queries so each measurement starts
        # from clean executor storage.
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        # nudge the driver GC so ContextCleaner actually releases dead
        # broadcasts/shuffles — with a large heap the JVM may not collect
        # for dozens of queries, and the accumulated state bleeds into
        # later measurements
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    timings_warm: dict[str, float] = {}
    total0 = time.perf_counter()
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        release_leaked_blocks()
    total = round(time.perf_counter() - total0, 3)
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings_warm[name] = round(time.perf_counter() - t0, 3)
        release_leaked_blocks()
    total_warm = round(sum(timings_warm.values()), 3)

    # flagship throughput: the estimate-only HLL pipeline. Round 5 folded
    # the hll_tokens_per_source DRIVER entry into hll_tokens_accuracy (so
    # every correctness row is fully oracle-checked), but the throughput
    # metric must stay comparable across rounds — time the same pipeline
    # here explicitly. "first" pays plan compilation for this exact query
    # (its scans are already warm from the suite); "warm" is steady-state.
    from sketchlib import queries as Q

    t0 = time.perf_counter()
    flag_rows = Q.hll_tokens_per_source(spark, sf_dir).collect()
    flag_cold = round(time.perf_counter() - t0, 3)
    n_items_flagship = sum(r["n_items"] for r in flag_rows)
    release_leaked_blocks()
    t0 = time.perf_counter()
    Q.hll_tokens_per_source(spark, sf_dir).collect()
    flag_t = round(time.perf_counter() - t0, 3)
    release_leaked_blocks()

    # head-to-head on the flagship workload: our HLL pipeline vs Spark's
    # native approx_count_distinct (needs an explode) vs exact countDistinct
    from pyspark.sql import functions as SF

    from sketchlib.data import rows_for_sf_dir, sequences_parquet

    seq = spark.read.parquet(sequences_parquet(spark, rows_for_sf_dir(sf_dir)))
    t0 = time.perf_counter()
    seq.select("source", SF.explode("tokens").alias("t")).groupBy("source").agg(
        SF.approx_count_distinct("t")
    ).collect()
    native_approx_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    seq.select("source", SF.explode("tokens").alias("t")).groupBy("source").agg(
        SF.countDistinct("t")
    ).collect()
    exact_sec = round(time.perf_counter() - t0, 3)
    # Spark's own mergeable HLL aggregate (Datasketches, 3.5+): the closest
    # native analogue — still needs the explode, and exposes no seed control
    # or register access (no reference parity, no cross-job byte contract)
    t0 = time.perf_counter()
    seq.select("source", SF.explode("tokens").alias("t")).groupBy("source").agg(
        SF.hll_sketch_estimate(SF.hll_sketch_agg("t"))
    ).collect()
    native_hll_sketch_sec = round(time.perf_counter() - t0, 3)

    # quantile head-to-head: KLL aggregator vs Spark's native
    # percentile_approx over the same per-source n_tok column
    from sketchlib.agg import KllAggregator

    kagg = KllAggregator(k=200, key_cols=["source"], value_col="n_tok", value_kind="double")
    t0 = time.perf_counter()
    kagg.quantiles(seq, (0.5, 0.9, 0.99)).collect()
    kll_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    seq.groupBy("source").agg(
        SF.percentile_approx("n_tok", [0.5, 0.9, 0.99])
    ).collect()
    native_pct_sec = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # cold and warm throughput are different metrics (cold pays one-time
    # codegen + scan warmup) — report BOTH under explicit names, never one
    # silently standing in for the other (ADVICE r02).
    out = {
        "metric": "sketch_query_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "suite_warm_sec": total_warm,
        "sf": sf_val,
        "cpus": cpus,
        "tokens_per_sec_cold": round(n_items_flagship / flag_cold) if flag_cold else None,
        "tokens_per_sec_warm": round(n_items_flagship / flag_t) if flag_t else None,
        "flagship_vs_builtins_sec": {
            "sketchlib_hll": flag_t,
            "spark_approx_count_distinct": native_approx_sec,
            "spark_exact_count_distinct": exact_sec,
            "spark_hll_sketch_agg": native_hll_sketch_sec,
            "sketchlib_kll_quantiles": kll_sec,
            "spark_percentile_approx": native_pct_sec,
        },
    }
    # summarize the latest N-vs-4N scaling evidence (written by
    # bench/scaling.py over a 2.1B-token job) against the ORIGINAL >= 0.8
    # gate; the full measurement (incl. the memcpy hardware-ceiling context)
    # stays in bench/scaling_last.json
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench", "scaling_last.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        eff = sc.get("value")
        out["scaling"] = {
            "efficiency": eff,
            "pass_ge_0.8": bool(eff is not None and eff >= 0.8),
            "detail": "bench/scaling_last.json",
        }
    # full cold/warm per-query detail goes to a side file; stdout carries ONE
    # compact line the driver's tail capture can always parse (VERDICT r02 #4,
    # r03 #2: the printed object must NOT embed the 57-entry per-query dict —
    # at ~2.5 KB the driver's tail capture truncated the line's head and
    # json-parse failed; scalars only on stdout, detail in bench/last_run.json)
    detail = dict(out)
    detail["queries_warm"] = timings_warm
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench", "last_run.json"), "w") as f:
        json.dump(detail, f, indent=1)
    spark.stop()
    line = {k: v for k, v in out.items() if k != "queries"}
    line["n_queries"] = len(timings)
    line["queries_detail"] = "bench/last_run.json"
    printed = json.dumps(line, separators=(",", ":"))
    if len(printed) >= 900:  # never regress to an unparseable tail capture
        for victim in ("flagship_vs_builtins_sec", "scaling"):
            line.pop(victim, None)
            printed = json.dumps(line, separators=(",", ":"))
            if len(printed) < 900:
                break
    print(printed)


if __name__ == "__main__":
    main()
