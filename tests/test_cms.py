"""Count-min: never undercounts; overcount within eps*N w.h.p.; exact merge."""

import numpy as np
import pytest

from sketchlib.cms import CountMinSketch


def test_never_undercounts_and_bound():
    rng = np.random.default_rng(0)
    # zipf-ish token stream with known exact counts
    tokens = rng.zipf(1.3, size=200_000).astype(np.int32)
    tokens = tokens[tokens < 1_000_000]
    s = CountMinSketch.empty(width_log2=16, depth=5)
    s.update_batch(tokens)
    uniq, exact = np.unique(tokens, return_counts=True)
    est = s.query_batch(uniq)
    assert (est >= exact.astype(np.uint64)).all(), "count-min undercounted"
    n = len(tokens)
    eps_bound = s.epsilon * n
    overcount = est.astype(np.int64) - exact
    # e/w bound holds per-query with prob 1-e^-d; assert 99.9%+ comfortably
    assert (overcount <= eps_bound).mean() > 0.999
    assert s.total == n


def test_merge_is_elementwise_add_and_order_free():
    rng = np.random.default_rng(1)
    a_t = rng.integers(0, 10_000, 50_000).astype(np.int32)
    b_t = rng.integers(0, 10_000, 50_000).astype(np.int32)
    whole = CountMinSketch.empty(12, 4)
    whole.update_batch(np.concatenate([a_t, b_t]))
    a = CountMinSketch.empty(12, 4)
    a.update_batch(a_t)
    b = CountMinSketch.empty(12, 4)
    b.update_batch(b_t)
    a.merge(b)
    assert np.array_equal(a.counters, whole.counters)


def test_weighted_updates():
    s = CountMinSketch.empty(10, 3)
    s.update_batch(np.array([7, 8], dtype=np.int32), weights=np.array([5, 2]))
    est = s.query_batch(np.array([7, 8, 9], dtype=np.int32))
    assert int(est[0]) >= 5 and int(est[1]) >= 2
    # float weights would silently floor fractional mass -> rejected
    import pytest as _pytest

    with _pytest.raises(TypeError):
        s.update_batch(np.array([7], dtype=np.int32), weights=np.array([1.5]))


def test_roundtrip():
    rng = np.random.default_rng(2)
    s = CountMinSketch.empty(12, 5, seed=99)
    s.update_batch(rng.integers(0, 1000, 10_000).astype(np.int32))
    r = CountMinSketch.from_bytes(s.to_bytes())
    assert r.width_log2 == 12 and r.depth == 5 and r.seed == 99
    assert np.array_equal(r.counters, s.counters)


def test_config_mismatch_raises():
    with pytest.raises(ValueError):
        CountMinSketch.empty(10, 4).merge(CountMinSketch.empty(11, 4))
    with pytest.raises(ValueError):
        CountMinSketch.empty(10, 4).merge(CountMinSketch.empty(10, 5))


def test_int64_and_string_kinds():
    s = CountMinSketch.empty(12, 4)
    s.update_batch(np.array([10**12, 10**12, 5], dtype=np.int64), kind="int64")
    assert int(s.query_batch(np.array([10**12], dtype=np.int64), kind="int64")[0]) >= 2
    s2 = CountMinSketch.empty(12, 4)
    s2.update_batch(["a", "a", "a", "b"], kind="string")
    assert int(s2.query_batch(["a"], kind="string")[0]) >= 3


def test_sparse_at_rest_codec():
    """Partials serialize sparse when mostly zeros; round-trip is exact in
    both modes and mixed-mode merges agree with dense-only merges."""
    import numpy as np

    from sketchlib.cms import CountMinSketch

    sparse = CountMinSketch.empty(width_log2=16, depth=5)
    sparse.update_batch(np.arange(100, dtype=np.int64), kind="int64")
    dense = CountMinSketch.empty(width_log2=4, depth=3)
    dense.update_batch(np.arange(5000, dtype=np.int64), kind="int64")
    b_sparse, b_dense = sparse.to_bytes(), dense.to_bytes()
    # the sparse partial is far smaller than its dense form
    assert len(b_sparse) < 5 * (1 << 16) * 8 / 4
    for s, b in ((sparse, b_sparse), (dense, b_dense)):
        r = CountMinSketch.from_bytes(b)
        assert np.array_equal(r.counters, s.counters)
        assert (r.width_log2, r.depth, r.seed) == (s.width_log2, s.depth, s.seed)
    # merge across modes == element-wise add regardless of encoding
    a = CountMinSketch.empty(width_log2=16, depth=5)
    a.update_batch(np.arange(50_000, dtype=np.int64), kind="int64")  # dense-ish
    expect = a.counters + sparse.counters
    merged = CountMinSketch.from_bytes(a.to_bytes()).merge(
        CountMinSketch.from_bytes(b_sparse)
    )
    assert np.array_equal(merged.counters, expect)


def test_inner_product_guarantees():
    """Inner-product estimate: >= true sum f_a*f_b; <= + eps*Na*Nb; exact on
    collision-free data; config mismatch raises."""
    import numpy as np
    import pytest as _pytest

    from sketchlib.cms import CountMinSketch

    rng = np.random.default_rng(2)
    a_vals = rng.zipf(1.6, 30_000).clip(max=5_000).astype(np.int64)
    b_vals = rng.zipf(1.6, 20_000).clip(max=5_000).astype(np.int64)
    ca = CountMinSketch.empty(width_log2=16, depth=5)
    ca.update_batch(a_vals, kind="int64")
    cb = CountMinSketch.empty(width_log2=16, depth=5)
    cb.update_batch(b_vals, kind="int64")
    fa = np.bincount(a_vals)
    fb = np.bincount(b_vals)
    n = max(len(fa), len(fb))
    true_ip = int(np.dot(np.pad(fa, (0, n - len(fa))), np.pad(fb, (0, n - len(fb)))))
    est = CountMinSketch.inner_product(ca, cb)
    eps = np.e / (1 << 16)
    assert true_ip <= est <= true_ip + eps * len(a_vals) * len(b_vals)
    # self-join size
    true_self = int(np.dot(fa.astype(np.float64), fa.astype(np.float64)))
    est_self = CountMinSketch.inner_product(ca, ca)
    assert true_self <= est_self <= true_self + eps * len(a_vals) ** 2
    with _pytest.raises(ValueError):
        CountMinSketch.inner_product(ca, CountMinSketch.empty(width_log2=14, depth=5))


def test_merge_blobs_sparse_scatter_equals_dense_path():
    """The sparse scatter-add fast path in merge_blobs must produce counters
    byte-identical to decode-then-merge, and reject config mismatches."""
    import pytest

    rng = np.random.default_rng(17)
    parts = []
    for i in range(6):
        c = CountMinSketch.empty(width_log2=14, depth=5)
        c.update_batch(rng.integers(0, 3000, 5000).astype(np.int64), kind="int64")
        blob = c.to_bytes()
        parts.append((blob, c))
    # mix sparse and dense encodings: force one dense by saturating it
    dense = CountMinSketch.empty(width_log2=14, depth=5)
    dense.update_batch(rng.integers(0, 100_000, 200_000).astype(np.int64), kind="int64")
    parts.append((dense.to_bytes(), dense))
    fast = CountMinSketch.merge_blobs([b for b, _ in parts], 14, 5)
    slow = CountMinSketch.empty(14, 5)
    for _, c in parts:
        slow.merge(c)
    assert np.array_equal(fast.counters, slow.counters)
    with pytest.raises(ValueError):
        CountMinSketch.merge_blobs([parts[0][0]], 13, 5)


def test_inner_product_exact_past_2_53():
    """ADVICE r03: float64 accumulation rounds (and can round BELOW truth)
    once a row dot exceeds 2^53 — the never-undercounts guarantee must hold
    unconditionally, so accumulation is exact integer math."""
    import numpy as np

    from sketchlib.cms import CountMinSketch

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 62, 4096, dtype=np.uint64)
    y = rng.integers(0, 1 << 62, 4096, dtype=np.uint64)
    exact = sum(int(a) * int(b) for a, b in zip(x, y))
    assert CountMinSketch._exact_dot_u64(x, y) == exact
    # float64 demonstrably diverges here (the bug this pins against)
    assert int(np.dot(x.astype(np.float64), y.astype(np.float64))) != exact


def test_width_sizing_rule():
    """width_log2_for_eps: smallest width whose e/width bound meets eps,
    clamped to the codec's [4, 30] range."""
    import math

    import pytest

    from sketchlib.agg import CmsAggregator

    for eps in (0.1, 1e-2, 2e-4, 1e-6):
        w = CmsAggregator.width_log2_for_eps(eps)
        assert math.e / (1 << w) <= eps
        if w > 4:
            assert math.e / (1 << (w - 1)) > eps  # smallest such width
    assert CmsAggregator.width_log2_for_eps(0.9) == 4  # clamp low
    with pytest.raises(ValueError):
        CmsAggregator.width_log2_for_eps(0.0)
    # unachievable eps must RAISE, not silently degrade to the codec max
    with pytest.raises(ValueError, match="beyond the codec max"):
        CmsAggregator.width_log2_for_eps(1e-10)


def test_aggregator_eps_constructor():
    """CmsAggregator(eps=...) sizes the width from the rule; mixing both
    parameters is rejected."""
    import pytest

    from sketchlib.agg import CmsAggregator

    a = CmsAggregator(eps=2e-4)
    assert a.width_log2 == CmsAggregator.width_log2_for_eps(2e-4) == 14
    assert CmsAggregator().width_log2 == 16  # historical default
    with pytest.raises(ValueError, match="not both"):
        CmsAggregator(width_log2=12, eps=1e-3)
