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
