"""Bloom: zero false negatives; fpp near the published formula; OR merge."""

import numpy as np
import pytest

from sketchlib.bloom import BloomFilter, optimal_params


def test_no_false_negatives():
    rng = np.random.default_rng(0)
    members = rng.choice(10**7, size=50_000, replace=False).astype(np.int32)
    b = BloomFilter.empty(m_log2=20, k=7)
    b.update_batch(members)
    assert b.contains_batch(members).all()


def test_fpp_close_to_formula():
    rng = np.random.default_rng(1)
    n = 100_000
    members = np.arange(n, dtype=np.int32)
    b = BloomFilter.empty(m_log2=20, k=7)
    b.update_batch(members)
    probes = np.arange(n, n + 200_000, dtype=np.int32)  # disjoint
    observed = b.contains_batch(probes).mean()
    expected = (1 - np.exp(-b.k * n / b.m)) ** b.k
    assert observed < 3 * expected + 1e-4, (observed, expected)
    assert abs(b.fpp_estimate() - expected) < 0.01


def test_merge_is_union():
    a = BloomFilter.empty(14, 5)
    b = BloomFilter.empty(14, 5)
    a.update_batch(np.arange(0, 500, dtype=np.int32))
    b.update_batch(np.arange(500, 1000, dtype=np.int32))
    whole = BloomFilter.empty(14, 5)
    whole.update_batch(np.arange(0, 1000, dtype=np.int32))
    a.merge(b)
    assert np.array_equal(a.bits, whole.bits)


def test_roundtrip():
    b = BloomFilter.empty(16, 6, seed=7)
    b.update_batch(np.arange(1000, dtype=np.int32))
    r = BloomFilter.from_bytes(b.to_bytes())
    assert (r.m_log2, r.k, r.seed) == (16, 6, 7)
    assert np.array_equal(r.bits, b.bits)


def test_optimal_params_sane():
    n, target = 1_000_000, 0.01
    m_log2, k = optimal_params(n, target)
    m = 2**m_log2
    assert m >= 9_000_000 and 1 <= k <= 16
    achieved = (1 - np.exp(-k * n / m)) ** k
    assert achieved <= target


def test_config_mismatch_raises():
    with pytest.raises(ValueError):
        BloomFilter.empty(14, 5).merge(BloomFilter.empty(15, 5))


def test_sparse_at_rest_codec():
    """Near-empty filters serialize as set-bit indices; round-trip is exact
    in both modes and mixed-mode merges agree."""
    import numpy as np

    from sketchlib.bloom import BloomFilter

    sparse = BloomFilter.empty(m_log2=20, k=7)
    sparse.update_batch(np.arange(100, dtype=np.int64), kind="int64")
    dense = BloomFilter.empty(m_log2=8, k=3)
    dense.update_batch(np.arange(500, dtype=np.int64), kind="int64")
    b_sparse, b_dense = sparse.to_bytes(), dense.to_bytes()
    assert len(b_sparse) < (1 << 20) // 8 // 10  # far below the bitmap size
    for s, b in ((sparse, b_sparse), (dense, b_dense)):
        r = BloomFilter.from_bytes(b)
        assert np.array_equal(r.bits, s.bits)
        assert (r.m_log2, r.k, r.seed) == (s.m_log2, s.k, s.seed)
    other = BloomFilter.empty(m_log2=20, k=7)
    other.update_batch(np.arange(50, 150, dtype=np.int64), kind="int64")
    merged = BloomFilter.from_bytes(b_sparse).merge(BloomFilter.from_bytes(other.to_bytes()))
    assert np.array_equal(merged.bits, sparse.bits | other.bits)
