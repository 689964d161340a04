"""KLL: rank-error bound, merge ~ single-pass equivalence, codec round-trip."""

import numpy as np
import pytest

from sketchlib.kll import KllSketch


def exact_rank(data: np.ndarray, x: float) -> float:
    return float((data <= x).mean())


def test_rank_error_bound_uniform():
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, 100_000)
    s = KllSketch.empty(k=200, seed=1)
    for chunk in np.array_split(data, 10):
        s.update_batch(chunk)
    assert s.n == len(data)
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est = s.quantile(q)
        err = abs(exact_rank(data, est) - q)
        assert err < 0.025, f"q={q}: rank err {err:.4f}"


def test_merge_statistically_equivalent():
    rng = np.random.default_rng(1)
    data = rng.normal(100, 15, 80_000)
    parts = np.array_split(data, 8)
    merged = KllSketch.empty(k=200, seed=2)
    for i, part in enumerate(parts):
        s = KllSketch.empty(k=200, seed=10 + i)
        s.update_batch(part)
        merged.merge(s)
    assert merged.n == len(data)
    for q in [0.1, 0.5, 0.9]:
        est = merged.quantile(q)
        err = abs(exact_rank(data, est) - q)
        assert err < 0.03, f"q={q}: rank err {err:.4f}"
    assert merged.min_v == data.min() and merged.max_v == data.max()


def test_extremes_exact():
    s = KllSketch.empty(k=64)
    s.update_batch(np.arange(1000, dtype=np.float64))
    assert s.quantile(0.0) == 0.0
    assert s.quantile(1.0) == 999.0


def test_rank_query():
    s = KllSketch.empty(k=200, seed=3)
    data = np.arange(10_000, dtype=np.float64)
    s.update_batch(data)
    assert abs(s.rank(2_500.0) - 0.25) < 0.03


def test_roundtrip():
    rng = np.random.default_rng(4)
    s = KllSketch.empty(k=128, seed=5)
    s.update_batch(rng.exponential(3.0, 50_000))
    r = KllSketch.from_bytes(s.to_bytes())
    assert r.n == s.n and r.k == s.k
    assert [lv.tolist() for lv in r.levels] == [lv.tolist() for lv in s.levels]
    for q in [0.1, 0.5, 0.9]:
        assert r.quantile(q) == s.quantile(q)


def test_determinism_same_seed():
    data = np.random.default_rng(6).uniform(0, 1, 30_000)
    a = KllSketch.empty(k=100, seed=7)
    b = KllSketch.empty(k=100, seed=7)
    a.update_batch(data)
    b.update_batch(data)
    assert [x.tolist() for x in a.levels] == [x.tolist() for x in b.levels]


def test_space_bounded():
    s = KllSketch.empty(k=200, seed=8)
    rng = np.random.default_rng(8)
    for _ in range(20):
        s.update_batch(rng.uniform(0, 1, 100_000))
    stored = sum(len(lv) for lv in s.levels)
    assert stored < 3_000, f"stored {stored} items for n={s.n}"  # ~O(k log(n/k))


def test_nan_dropped_and_k_mismatch():
    s = KllSketch.empty(k=64)
    s.update_batch(np.array([1.0, np.nan, 3.0]))
    assert s.n == 2
    with pytest.raises(ValueError):
        s.merge(KllSketch.empty(k=65))
