#!/usr/bin/env python
"""Pairwise-matrix throughput: per-row scalar blob algebra vs the batch path.

VERDICT r03 #5 done-criterion: at >=10^3 synthetic sources the K^2 source-
similarity matrices (~500k pairs) ride the SQL pair UDFs; this measures the
old per-row ``from_bytes`` + scalar-estimator loop against the vectorized
``registers_from_blobs`` / ``estimates_from_histograms`` path that now backs
``hll_union_estimate`` / ``hll_intersection_estimate`` / ``kmv_*``, and
asserts the results are integer-identical on a verification subsample.

Run: python bench/matrix_bench.py [n_sources] (default 1000; pure local
numpy — the Spark plan's per-batch work is exactly what's timed here).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchlib.hll import (  # noqa: E402
    HllSketch,
    estimates_from_histograms,
    histograms_from_registers,
    registers_from_blobs,
)
from sketchlib.kmv import KmvSketch, pair_set_algebra, values_from_blobs  # noqa: E402


def main() -> None:
    n_sources = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rng = np.random.default_rng(314)
    p = 12

    blobs = []
    for i in range(n_sources):
        s = HllSketch(p=p)
        s.update_batch(rng.integers(0, 5_000 + 37 * i, 2_000).astype(np.int32))
        blobs.append(s.to_bytes())

    ia, ib = np.triu_indices(n_sources, k=1)
    n_pairs = len(ia)

    # batch path (what the SQL UDFs now run per Arrow batch): chunked at the
    # Arrow batch size so intermediates stay cache-resident instead of
    # materializing an n_pairs x 2^p register matrix
    CHUNK = 10_000
    t0 = time.perf_counter()
    regs, pp, _ = registers_from_blobs(blobs)
    est_s = estimates_from_histograms(histograms_from_registers(regs), pp)
    est_u = np.empty(n_pairs, dtype=np.int64)
    for lo in range(0, n_pairs, CHUNK):
        hi = min(lo + CHUNK, n_pairs)
        u = np.maximum(regs[ia[lo:hi]], regs[ib[lo:hi]])
        est_u[lo:hi] = estimates_from_histograms(histograms_from_registers(u), pp)
    est_i = np.maximum(0, est_s[ia] + est_s[ib] - est_u)
    t_batch = time.perf_counter() - t0

    # scalar path (the removed per-row loop), on a subsample, extrapolated
    sample = rng.choice(n_pairs, size=min(2_000, n_pairs), replace=False)
    t0 = time.perf_counter()
    for j in sample:
        sa = HllSketch.from_bytes(blobs[ia[j]])
        sb = HllSketch.from_bytes(blobs[ib[j]])
        eu = HllSketch.union_estimate(sa, sb)
        ei = HllSketch.intersection_estimate(sa, sb)
        assert eu == est_u[j] and ei == est_i[j], j  # integer-identical
    t_scalar = (time.perf_counter() - t0) * (n_pairs / len(sample))

    # KMV: batch decode + pair_set_algebra vs per-row sketch construction
    kblobs = []
    for i in range(n_sources):
        s = KmvSketch(k=512)
        s.update_batch(rng.integers(0, 4_000 + 29 * i, 3_000).astype(np.int32))
        kblobs.append(s.to_bytes())
    ksample = rng.choice(n_pairs, size=min(500, n_pairs), replace=False)
    t0 = time.perf_counter()
    vals, k, _ = values_from_blobs(kblobs)
    keu, kei, kj, ked = pair_set_algebra([vals[i] for i in ia], [vals[i] for i in ib], k)
    t_kbatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for j in ksample:
        sa = KmvSketch.from_bytes(kblobs[ia[j]])
        sb = KmvSketch.from_bytes(kblobs[ib[j]])
        assert KmvSketch.union(sa, sb).estimate() == keu[j]
        assert KmvSketch.intersection_estimate(sa, sb) == kei[j]
        assert KmvSketch.jaccard(sa, sb) == kj[j]
        assert KmvSketch.difference_estimate(sa, sb) == ked[j]
    t_kscalar = (time.perf_counter() - t0) * (n_pairs / len(ksample))

    out = {
        "n_sources": n_sources,
        "n_pairs": n_pairs,
        "hll_batch_sec": round(t_batch, 3),
        "hll_scalar_sec_extrapolated": round(t_scalar, 3),
        "hll_speedup": round(t_scalar / t_batch, 1),
        "kmv_batch_sec": round(t_kbatch, 3),
        "kmv_scalar_sec_extrapolated": round(t_kscalar, 3),
        "kmv_speedup": round(t_kscalar / t_kbatch, 1),
        "identical": True,  # asserted above on the subsamples
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "matrix_bench_last.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
