#!/usr/bin/env python
"""Orchestrate the two-parallelism scaling evidence (BASELINE.md protocol).

Runs bench/scaling_job.py via spark-submit at local[N] and local[4N] on the
SAME deterministic dataset, then reports throughput at both, scaling
efficiency T_4N/(4*T_N), and asserts the final sketches are byte-identical
across parallelism levels. Writes BENCH_SCALING.md at the repo root.

Usage: python bench/scaling.py [--n 8] [--rows 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip() -> str:
    zpath = os.path.join(tempfile.mkdtemp(), "sketchlib.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sketchlib")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_leg(cores: int, rows: int, zpath: str, repeats: int = 2) -> dict:
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cores}]",
        # spark.driver.memory set via SparkSession.builder is ignored under
        # spark-submit (the JVM is already up) — must be a launch flag
        "--driver-memory",
        os.environ.get("SKETCHLIB_DRIVER_MEM", "24g"),
        "--py-files",
        zpath,
        os.path.join(REPO, "bench", "scaling_job.py"),
        "--cores",
        str(cores),
        "--rows",
        str(rows),
        "--repeats",
        str(repeats),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT ") :])
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise RuntimeError(f"no SCALING_RESULT from local[{cores}] leg")


def pipeline_ceiling(procs: int, rows: int, data_root: str = "/tmp/sketchlib_scaling") -> dict:
    """Hardware ceiling for the EXACT same work, zero orchestration: the
    identical decode+build pipeline under bare multiprocessing, each proc
    streaming its own distinct file subset once (no cache-reuse flattery).
    This is the number Spark's leg should be judged against on a single
    shared-bus box: if the bare pipeline itself scales < 0.8 from N to 4N,
    no orchestration layer can beat it (VERDICT r03 #3 ceiling study)."""
    import glob
    import multiprocessing as mp
    import time

    files = sorted(glob.glob(os.path.join(data_root, f"sequences_{rows}", "*.parquet")))
    if not files:
        raise RuntimeError(f"no dataset for rows={rows}; run a Spark leg first")

    def worker(fs, q):
        import pyarrow.parquet as papq

        sys.path.insert(0, REPO)
        from sketchlib.agg import HllAggregator

        build = HllAggregator(p=14, key_cols=["source"])._make_build_fn()
        ntok = 0
        for f in fs:
            pf = papq.ParquetFile(f)
            out = list(
                build(pf.iter_batches(batch_size=1024, columns=["source", "tokens"]))
            )
            ntok += sum(out[0].column("n_items").to_pylist())
        q.put(ntok)

    if procs > len(files):
        raise RuntimeError(
            f"ceiling probe needs >= {procs} files (got {len(files)}): "
            f"an empty slice would report 0 tokens/s and poison the ratio"
        )
    # round-robin: every file is assigned (no dropped remainder), slices
    # differ in size by at most one file
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(files[i::procs], q)) for i in range(procs)]
    t0 = time.perf_counter()
    [p.start() for p in ps]
    ntok = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    wall = time.perf_counter() - t0
    return {"procs": procs, "wall_sec": round(wall, 2), "tokens_per_sec": round(ntok / wall)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism; big = 4n")
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--curve",
        action="store_true",
        help="also measure local[1,2,4,16] and record EVERY N->4N quadrupling",
    )
    ap.add_argument(
        "--ceiling",
        action="store_true",
        help="also measure the bare-multiprocessing pipeline ceiling at n and 4n",
    )
    args = ap.parse_args()

    zpath = make_zip()
    curve: dict[int, dict] = {}
    if args.curve:
        # ensure the protocol legs (--n and 4n) are measured even when they
        # fall outside the standard curve levels
        levels = sorted({1, 2, 4, 8, 16, 32} | {args.n, args.n * 4})
        for cores in levels:
            curve[cores] = run_leg(cores, args.rows, zpath, args.repeats)
        small, big = curve[args.n], curve[args.n * 4]
    else:
        small = run_leg(args.n, args.rows, zpath, args.repeats)
        big = run_leg(args.n * 4, args.rows, zpath, args.repeats)

    eff = big["tokens_per_sec"] / (4.0 * small["tokens_per_sec"])
    identical = small["sketch_sha256"] == big["sketch_sha256"] and small.get(
        "quantile_sketch_sha256"
    ) == big.get("quantile_sketch_sha256")
    # the attainable ceiling on ONE box: parallel memcpy itself scales 0.47
    # from 8 to 32 procs here (shared memory bus; measured, BENCH_SCALING.md)
    memcpy_ceiling = 0.47
    result = {
        "metric": "scaling_efficiency_Nx4",
        "value": round(eff, 3),
        "pass": eff >= 0.8 and identical,
        "sketches_identical": identical,
        "relative_to_hardware_ceiling": round(eff / memcpy_ceiling, 3),
        "note": (
            "single 32-core box proxy: raw N->4N bounded by the shared "
            "memory bus (parallel memcpy itself scales 0.47 from 8->32 "
            "procs); on a real N->4N executor scale-out each node adds its "
            "own bus. See BENCH_SCALING.md for the full curve + methodology."
        ),
        "small": small,
        "big": big,
    }
    if args.ceiling:
        ceil_small = pipeline_ceiling(args.n, args.rows)
        ceil_big = pipeline_ceiling(args.n * 4, args.rows)
        ceil_eff = ceil_big["tokens_per_sec"] / (4.0 * ceil_small["tokens_per_sec"])
        result["pipeline_ceiling"] = {
            "small": ceil_small,
            "big": ceil_big,
            "efficiency": round(ceil_eff, 3),
            "engine_vs_ceiling_small": round(
                small["tokens_per_sec"] / ceil_small["tokens_per_sec"], 3
            ),
            "engine_vs_ceiling_big": round(
                big["tokens_per_sec"] / ceil_big["tokens_per_sec"], 3
            ),
            "engine_eff_vs_ceiling_eff": round(eff / ceil_eff, 3),
            "note": (
                "bare-multiprocessing identical pipeline, each proc streaming "
                "distinct files once — the attainable N->4N on this shared-bus "
                "box with ZERO orchestration; if this is < 0.8 the raw gate "
                "exceeds the hardware"
            ),
        }
    if curve:
        assert len({c["sketch_sha256"] for c in curve.values()}) == 1, "sha drift"
        result["curve"] = {
            str(k): {"wall_sec": v["wall_sec"], "tokens_per_sec": v["tokens_per_sec"]}
            for k, v in curve.items()
        }
        result["quadrupling_efficiencies"] = {
            f"{n}->{4*n}": round(
                curve[4 * n]["tokens_per_sec"] / (4.0 * curve[n]["tokens_per_sec"]), 3
            )
            for n in (1, 2, 4, 8)
        }
    print(json.dumps(result))

    md = f"""# BENCH_SCALING — N vs 4N parallelism evidence

Protocol (BASELINE.md): same spark-submit job, same deterministic input
({args.rows:,} rows, {small['tokens']:,} tokens), identical configs except
`--master`. Sandbox proxy for N vs 4N executors per the task directive.

| leg | master | wall (s) | tokens/s |
|---|---|---|---|
| N | local[{args.n}] | {small['wall_sec']} | {small['tokens_per_sec']:,} |
| 4N | local[{args.n * 4}] | {big['wall_sec']} | {big['tokens_per_sec']:,} |

- **Scaling efficiency** T_4N / (4 x T_N) = **{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- **Parallelism invariance**: per-source + global HLL sketch bytes sha256
  AND the KLL + t-digest (per-row-group partials, content-seeded parity,
  canonical merges) sha256 {"IDENTICAL" if identical else "MISMATCH"}
  across both legs (`{small['sketch_sha256'][:16]}...`,
  quantile `{small.get('quantile_sketch_sha256', '?')[:16]}...`)
- Global distinct-token estimate: {small['global_estimate']:,}

Job: parquet scan -> HLL partial build (p=14, seed=314) -> per-source tree
merge -> global rollup. Reproduce: `python bench/scaling.py --n {args.n} --rows {args.rows}`.
"""
    # single-run snapshot; the curated multi-level analysis lives in
    # BENCH_SCALING.md at the repo root
    with open(os.path.join(REPO, "bench", "scaling_last_run.md"), "w") as f:
        f.write(md)
    # machine-readable copy: bench.py embeds this in its JSON line so the
    # per-round BENCH_r{N}.json carries the scaling evidence too
    with open(os.path.join(REPO, "bench", "scaling_last.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
