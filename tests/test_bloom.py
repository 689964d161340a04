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
