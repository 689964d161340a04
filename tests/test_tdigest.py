"""t-digest: quantile accuracy (tight at tails), merge equivalence, codec."""

import numpy as np
import pytest

from sketchlib.tdigest import TDigest


def exact_rank(data: np.ndarray, x: float) -> float:
    return float((data <= x).mean())


def test_quantile_accuracy_uniform():
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 1, 200_000)
    td = TDigest.empty(delta=200)
    for chunk in np.array_split(data, 20):
        td.update_batch(chunk)
    for q, tol in [(0.001, 0.001), (0.01, 0.002), (0.5, 0.02), (0.99, 0.002), (0.999, 0.001)]:
        est = td.quantile(q)
        err = abs(exact_rank(data, est) - q)
        assert err < tol, f"q={q}: rank err {err:.5f}"


def test_tails_tighter_than_middle():
    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 300_000)
    td = TDigest.empty(delta=100)
    td.update_batch(data)
    tail_err = abs(exact_rank(data, td.quantile(0.999)) - 0.999)
    assert tail_err < 0.0005


def test_merge_statistically_equivalent():
    rng = np.random.default_rng(2)
    data = rng.lognormal(0, 1, 100_000)
    merged = TDigest.empty(delta=200)
    for part in np.array_split(data, 16):
        t = TDigest.empty(delta=200)
        t.update_batch(part)
        merged.merge(t)
    assert abs(merged.n - len(data)) < 1e-6
    for q in [0.05, 0.5, 0.95]:
        err = abs(exact_rank(data, merged.quantile(q)) - q)
        assert err < 0.02, f"q={q}: {err:.4f}"


def test_extremes_and_cdf():
    data = np.arange(10_000, dtype=np.float64)
    td = TDigest.empty(delta=100)
    td.update_batch(data)
    assert td.quantile(0.0) == 0.0
    assert td.quantile(1.0) == 9999.0
    assert td.cdf(-1) == 0.0 and td.cdf(10_000) == 1.0
    assert abs(td.cdf(5_000) - 0.5) < 0.02


def test_centroid_count_bounded():
    rng = np.random.default_rng(3)
    td = TDigest.empty(delta=100)
    for _ in range(10):
        td.update_batch(rng.uniform(0, 1, 100_000))
    td._flush()
    assert len(td.means) <= 2 * 100, f"{len(td.means)} centroids for delta=100"


def test_roundtrip():
    rng = np.random.default_rng(4)
    td = TDigest.empty(delta=150)
    td.update_batch(rng.exponential(2.0, 50_000))
    r = TDigest.from_bytes(td.to_bytes())
    assert r.delta == 150 and abs(r.n - td.n) < 1e-9
    for q in [0.1, 0.5, 0.9]:
        assert r.quantile(q) == td.quantile(q)


def test_delta_mismatch_and_nan():
    td = TDigest.empty(delta=100)
    td.update_batch(np.array([1.0, np.nan]))
    assert td.n == 1
    with pytest.raises(ValueError):
        td.merge(TDigest.empty(delta=200))
