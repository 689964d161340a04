"""Vectorized shingle/SimHash builders must be byte-identical to the
per-doc reference implementations (token_shingles / simhash64) on ragged
batches including empty and shorter-than-n docs (VERDICT r01 #5)."""

import numpy as np
import pytest

from sketchlib.minhash import (
    shingles_flat,
    simhash64,
    simhash64_batch,
    token_shingles,
)


def ragged_batch(seed=3, n_docs=200):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        mode = i % 7
        if mode == 0:
            docs.append(np.empty(0, dtype=np.int64))  # empty
        elif mode == 1:
            docs.append(rng.integers(0, 5000, rng.integers(1, 3)).astype(np.int64))  # short
        else:
            docs.append(rng.integers(0, 5000, rng.integers(3, 400)).astype(np.int64))
    return docs


@pytest.mark.parametrize("n", [2, 3, 5])
def test_shingles_flat_matches_per_doc(n):
    docs = ragged_batch()
    flat = np.concatenate(docs) if docs else np.empty(0, dtype=np.int64)
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    got_elems, got_codes = shingles_flat(flat, lengths, n)
    exp_elems, exp_codes = [], []
    for i, d in enumerate(docs):
        sh = token_shingles(d, n)
        exp_elems.append(sh)
        exp_codes.append(np.full(len(sh), i, dtype=np.int64))
    exp_elems = np.concatenate(exp_elems)
    exp_codes = np.concatenate(exp_codes)
    assert np.array_equal(got_codes, exp_codes)
    assert np.array_equal(got_elems, exp_elems)


def test_shingles_flat_empty_batch():
    elems, codes = shingles_flat(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), 3)
    assert len(elems) == 0 and len(codes) == 0


def test_simhash_batch_matches_per_doc():
    docs = ragged_batch(seed=11)
    flat = np.concatenate(docs)
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    elems, codes = shingles_flat(flat, lengths, 2)
    got = simhash64_batch(elems, codes, len(docs), seed=314)
    for i, d in enumerate(docs):
        exp = simhash64(token_shingles(d, 2), seed=314)
        assert int(got[i]) == exp, i


def test_simhash_batch_empty_doc_is_zero_free():
    # a doc with zero tokens still yields one shingle (prefix hash 0), so its
    # fingerprint is simhash64([0]) — same as the per-doc path, not 0
    elems, codes = shingles_flat(np.empty(0, dtype=np.int64), np.array([0]), 3)
    got = simhash64_batch(elems, codes, 1, seed=314)
    assert int(got[0]) == simhash64(token_shingles(np.empty(0, dtype=np.int64), 3), seed=314)


def test_builder_throughput_vectorized_vs_loop():
    """From an Arrow batch (the real input), the offsets-based builder must
    beat the round-1 to_pylist + per-doc loop clearly (measured ~13x; assert
    >=5x with slack)."""
    import time

    import pyarrow as pa
    import pyarrow.compute as pc

    rng = np.random.default_rng(1)
    docs = [rng.integers(0, 50_000, 200).astype(np.int32) for _ in range(2_000)]
    col = pa.array([d.tolist() for d in docs], type=pa.list_(pa.int32()))

    def old_path():
        elems, codes = [], []
        for i, t in enumerate(col.to_pylist()):
            sh = token_shingles(np.asarray(t or [], dtype=np.int64), 3)
            elems.append(sh)
            codes.append(np.full(len(sh), i, dtype=np.int64))
        return np.concatenate(elems), np.concatenate(codes)

    def new_path():
        lengths = (
            pc.fill_null(pc.list_value_length(col), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        return shingles_flat(flat, lengths, 3)

    a, b = old_path(), new_path()
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    t0 = time.perf_counter()
    for _ in range(3):
        new_path()
    vec = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        old_path()
    loop = time.perf_counter() - t0
    assert vec * 5 < loop, (vec, loop)


def test_vectorized_hll_estimator_bit_parity():
    """estimates_from_histograms must be bit-identical to the scalar
    reference-parity estimator for every regime (empty, linear-counting,
    mid, near-saturated) — the vectorized sigma/tau series keep iterating
    past an element's own fixed point, which must be a no-op."""
    import numpy as np

    from sketchlib.hll import (
        estimate_from_histogram,
        estimates_from_histograms,
        histograms_from_registers,
    )

    rng = np.random.default_rng(7)
    for p in (4, 10, 12, 14):
        m = 1 << p
        regs = rng.integers(0, 64 - p + 2, size=(200, m)).astype(np.uint8)
        regs[0] = 0
        regs[1, : m // 2] = 0
        regs[2, :] = 1
        regs[2, 0] = 64 - p + 1
        hists = histograms_from_registers(regs)
        vec = estimates_from_histograms(hists, p)
        scalar = np.array([estimate_from_histogram(h, p) for h in hists])
        assert (vec == scalar).all(), (p, np.flatnonzero(vec != scalar)[:5])


def test_registers_from_blobs_all_modes():
    """Batch blob decode must reproduce per-row from_bytes registers for
    dense, sparse, packed6, and mixed-mode batches; mixed p raises."""
    import numpy as np
    import pytest as _pytest

    from sketchlib.hll import HllSketch, registers_from_blobs

    rng = np.random.default_rng(17)
    sk = []
    for i in range(30):
        s = HllSketch(p=11)
        s.update_batch(rng.integers(0, 40 * (i + 1) + 5, 60 * (i + 1)).astype(np.int32))
        sk.append(s)
    dense = [s.to_bytes(mode="dense") for s in sk]
    auto = [s.to_bytes() for s in sk]
    p6 = [s.to_bytes(mode="packed6") for s in sk]
    mixed = dense[:10] + auto[10:20] + p6[20:]
    for blobs in (dense, auto, p6, mixed):
        regs, p, seed = registers_from_blobs(blobs)
        assert p == 11
        for i, s in enumerate(sk):
            assert np.array_equal(regs[i], s.registers), i
    other = HllSketch(p=9)
    with _pytest.raises(ValueError, match="mixed"):
        registers_from_blobs([dense[0], other.to_bytes(mode="dense")])
