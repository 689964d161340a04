"""HLL parity + law tests, mirroring the reference suite

(/root/reference/test.py) plus golden values from FIXTURES.md §3.2-3.4.
"""

import numpy as np
import pytest

from sketchlib.hll import HllSketch, estimate_from_histogram


def _sketch_of_range(p: int, n: int, seed: int = 314) -> HllSketch:
    s = HllSketch.empty(p, seed)
    s.update_batch(np.arange(n, dtype=np.int32))
    return s


# ---- constructor contract (test.py:44-76) ----------------------------------


@pytest.mark.parametrize("p", [-1, 0, 1, 64])
def test_p_out_of_range_raises(p):
    with pytest.raises(ValueError):
        HllSketch.empty(p)


def test_fresh_sketch_zeroed():
    s = HllSketch.empty(6)
    assert s.size == 64
    assert not s.registers.any()
    assert int(s.histogram().sum()) == 64
    assert s.cardinality() == 0


def test_seed_changes_hash():
    a, b = HllSketch(p=4, seed=1), HllSketch(p=4, seed=2)
    assert a.hash("flibbertigibbet") != b.hash("flibbertigibbet")


def test_get_register_bounds():
    s = HllSketch.empty(4)
    s.get_register(15)
    with pytest.raises(IndexError):
        s.get_register(16)


# ---- golden register state & cardinalities (FIXTURES.md §3.2-3.3) ----------


def test_golden_registers_p4():
    s = _sketch_of_range(4, 10)
    assert s.registers.tolist() == [0, 3, 2, 2, 0, 1, 0, 1, 6, 3, 0, 0, 0, 4, 0, 0]
    assert s.cardinality() == 11


GOLDEN_CARDS = [
    (12, 10_000, 10_274),
    (12, 100_000, 98_833),
    (12, 1_000_000, 1_002_475),
    (14, 10_000, 10_137),
    (14, 100_000, 98_279),
    (14, 1_000_000, 1_002_746),
    (14, 2_000_000, 1_994_876),
]


@pytest.mark.parametrize("p,n,expect", GOLDEN_CARDS)
def test_golden_cardinalities(p, n, expect):
    assert _sketch_of_range(p, n).cardinality() == expect


def test_scalar_add_matches_batch():
    import struct

    batch = _sketch_of_range(12, 500)
    one = HllSketch.empty(12)
    for t in range(500):
        one.add(struct.pack("<i", t))
    assert np.array_equal(batch.registers, one.registers)
    # int add uses the same convention
    one2 = HllSketch.empty(12)
    for t in range(500):
        one2.add(t)
    assert np.array_equal(batch.registers, one2.registers)


def test_add_returns_changed_flag():
    s = HllSketch.empty(12)
    assert s.add(b"asdf") is True
    assert s.add(b"asdf") is False  # same register/rank -> no change


# ---- merge laws (test.py:78-142) --------------------------------------------


def test_merge_size_mismatch_raises():
    with pytest.raises(ValueError):
        HllSketch.empty(4).merge(HllSketch.empty(5))


def test_merge_seed_mismatch_raises():
    with pytest.raises(ValueError):
        HllSketch(p=4, seed=1).merge(HllSketch(p=4, seed=2))


def test_merge_is_elementwise_max():
    rng = np.random.default_rng(0)
    a = HllSketch.empty(10)
    b = HllSketch.empty(10)
    a.update_batch(rng.integers(0, 10_000, 5_000).astype(np.int32))
    b.update_batch(rng.integers(5_000, 20_000, 5_000).astype(np.int32))
    expect = np.maximum(a.registers, b.registers)
    a.merge(b)
    assert np.array_equal(a.registers, expect)


def test_merge_laws_assoc_comm_idem_identity():
    rng = np.random.default_rng(1)
    parts = []
    for _ in range(3):
        s = HllSketch.empty(8)
        s.update_batch(rng.integers(0, 50_000, 2_000).astype(np.int32))
        parts.append(s)
    a, b, c = parts
    ab_c = (a | b) | c
    a_bc = a | (b | c)
    assert np.array_equal(ab_c.registers, a_bc.registers)
    assert np.array_equal((a | b).registers, (b | a).registers)
    assert np.array_equal((a | a).registers, a.registers)
    assert np.array_equal((a | HllSketch.empty(8)).registers, a.registers)


def test_split_merge_equals_single_pass():
    """Partition-order independence: the distributed-safety property."""
    tokens = np.random.default_rng(2).integers(0, 10**6, 100_000).astype(np.int32)
    whole = HllSketch.empty(14)
    whole.update_batch(tokens)
    merged = HllSketch.empty(14)
    for chunk in np.array_split(tokens, 17):
        part = HllSketch.empty(14)
        part.update_batch(chunk)
        merged.merge(part)
    assert np.array_equal(whole.registers, merged.registers)
    assert whole.cardinality() == merged.cardinality()


# ---- serialization round-trip (test.py:145-279) ------------------------------


def test_bytes_roundtrip():
    s = _sketch_of_range(14, 50_000, seed=271)
    blob = s.to_bytes()
    assert len(blob) == 16 + 1 + (1 << 14)  # header + mode byte + dense registers
    r = HllSketch.from_bytes(blob)
    assert r.p == 14 and r.seed == 271
    assert np.array_equal(r.registers, s.registers)
    assert r.cardinality() == s.cardinality()
    assert r.histogram().tolist() == s.histogram().tolist()


def test_roundtrip_then_merge_equals_control():
    """Mirror of the reference's issue-#46 regression (test.py:170-258)."""
    rng = np.random.default_rng(0)
    control = HllSketch.empty(12)
    restored = HllSketch.empty(12)
    for _ in range(5):
        batch = rng.integers(0, 10**6, 10_000).astype(np.int32)
        part = HllSketch.empty(12)
        part.update_batch(batch)
        control.merge(part)
        restored = HllSketch.from_bytes(restored.to_bytes())
        restored.merge(HllSketch.from_bytes(part.to_bytes()))
    assert np.array_equal(control.registers, restored.registers)
    assert control.cardinality() == restored.cardinality()


def test_from_bytes_rejects_garbage():
    with pytest.raises(ValueError):
        HllSketch.from_bytes(b"\x00" * 40)


# ---- accuracy bound (FIXTURES.md §3.4; BASELINE.md 1-sigma semantics) --------


def test_error_bound_over_seed_ensemble():
    n, p = 20_000, 12
    bound = HllSketch.std_error(p)
    within = 0
    for seed in range(20):
        s = HllSketch.empty(p, seed=seed)
        s.update_batch(np.arange(n, dtype=np.int32))
        rel = abs(s.cardinality() - n) / n
        assert rel < 3 * bound, f"seed {seed}: {rel:.4f} > 3 sigma"
        within += rel <= bound
    assert within >= 12  # ~65% expected within 1 sigma; 12/20 is a safe floor


def test_estimator_histogram_only():
    # estimator consumes only the histogram — spot-check pure function
    s = _sketch_of_range(12, 10_000)
    assert estimate_from_histogram(s.histogram(), 12) == 10_274


def test_sparse_at_rest_codec():
    """Near-empty sketches store (idx, rank) pairs; round-trip identical."""
    s = HllSketch.empty(16)
    s.update_batch(np.arange(100, dtype=np.int32))
    blob = s.to_bytes()
    assert len(blob) < 1000  # vs 65536 dense
    r = HllSketch.from_bytes(blob)
    assert np.array_equal(r.registers, s.registers)
    assert r.cardinality() == s.cardinality()
    # dense sketches stay dense and round-trip too
    d = _sketch_of_range(10, 50_000)
    rd = HllSketch.from_bytes(d.to_bytes())
    assert np.array_equal(rd.registers, d.registers)
    # boundary: empty sketch
    e = HllSketch.from_bytes(HllSketch.empty(12).to_bytes())
    assert not e.registers.any()


def test_add_accepts_buffer_objects():
    """Reference add() parses any buffer via 's#' (test.py:15-25 semantics)."""
    a, b, c = HllSketch.empty(10), HllSketch.empty(10), HllSketch.empty(10)
    a.add(b"payload")
    b.add(bytearray(b"payload"))
    c.add(memoryview(b"payload"))
    assert np.array_equal(a.registers, b.registers)
    assert np.array_equal(a.registers, c.registers)


def test_packed6_codec_roundtrip_and_merge_law():
    """mode=2: 6-bit packed registers (reference src/hll.c:44-254 storage
    semantics) roundtrip byte-exactly and obey the merge law across all
    three encodings; packed size is 25% below dense."""
    import numpy as np

    from sketchlib.codec import HEADER_LEN

    rng = np.random.default_rng(7)
    for p in (4, 10, 14):
        a = HllSketch.empty(p)
        a.update_batch(rng.integers(0, 1 << 20, 5000).astype(np.int32))
        packed = a.to_bytes(mode="packed6")
        assert len(packed) - HEADER_LEN - 1 == -(-6 * (1 << p) // 8)
        r = HllSketch.from_bytes(packed)
        assert np.array_equal(r.registers, a.registers)
        # merge law holds across mixed encodings
        b = HllSketch.empty(p)
        b.update_batch(rng.integers(0, 1 << 20, 3000).astype(np.int32))
        via_packed = HllSketch.from_bytes(a.to_bytes(mode="packed6")).merge(
            HllSketch.from_bytes(b.to_bytes())
        )
        direct = HllSketch.from_bytes(a.to_bytes()).merge(b)
        assert np.array_equal(via_packed.registers, direct.registers)
        # auto mode unchanged (mode byte 0 or 1, never 2)
        assert a.to_bytes()[HEADER_LEN] in (0, 1)


def test_packed6_rejects_unknown_mode():
    import pytest as _pytest

    s = HllSketch.empty(8)
    with _pytest.raises(ValueError):
        s.to_bytes(mode="wat")


def test_sparse_repr_large_p():
    """p > 26 is held sparse: the reference's [2,63] ctor contract
    (src/hll.c:708-712) without ever allocating 2^p registers — the same
    role its sparse linked list plays (src/hll.c:36-40)."""
    import pytest as _pytest

    s = HllSketch.empty(63)
    assert s.is_sparse and s.registers is None and s.size == 1 << 63
    assert s.add(b"hello") is True
    assert s.add(b"hello") is False  # no register growth on repeat
    s.update_batch(np.arange(1000, dtype=np.int32))
    t = HllSketch.empty(63)
    t.update_batch(np.arange(500, 1500, dtype=np.int32))

    # merge commutativity on the sparse representation
    ab, ba = s | t, t | s
    assert np.array_equal(ab.sparse_indices, ba.sparse_indices)
    assert np.array_equal(ab.sparse_ranks, ba.sparse_ranks)

    # codec roundtrip (mode-3 sparse64 blob)
    r = HllSketch.from_bytes(ab.to_bytes())
    assert r.is_sparse
    assert np.array_equal(r.sparse_indices, ab.sparse_indices)
    assert np.array_equal(r.sparse_ranks, ab.sparse_ranks)

    # register access semantics
    i0 = int(ab.sparse_indices[0])
    assert ab.get_register(i0) == int(ab.sparse_ranks[0])
    with _pytest.raises(IndexError):
        ab.get_register(1 << 63)
    # dense register arrays are rejected at sparse-only p
    with _pytest.raises(ValueError):
        HllSketch(p=63, registers=np.zeros(8, dtype=np.uint8))
    # p out of contract still raises
    with _pytest.raises(ValueError):
        HllSketch.empty(64)


def test_sparse_repr_estimate_accuracy_p30():
    """At p=30 (sparse repr, float histogram still exact) the estimate must
    hold the published bound."""
    s = HllSketch.empty(30)
    s.update_batch_int64(np.arange(100_000, dtype=np.int64))
    assert abs(s.cardinality() / 100_000 - 1) < 3 * HllSketch.std_error(30) + 0.01


def test_mode3_blob_decodes_into_dense_at_small_p():
    import struct as st

    from sketchlib.codec import KIND_HLL, pack_header

    d = HllSketch.empty(12)
    d.update_batch(np.arange(5000, dtype=np.int32))
    nz = np.flatnonzero(d.registers)
    blob3 = (
        pack_header(KIND_HLL, 12, 314)
        + b"\x03"
        + st.pack("<Q", len(nz))
        + nz.astype(np.int64).tobytes()
        + d.registers[nz].tobytes()
    )
    assert np.array_equal(HllSketch.from_bytes(blob3).registers, d.registers)


def test_batch_estimator_raises_like_scalar_on_saturation():
    """All-registers-saturated histograms overflow identically in the batch
    and scalar estimators (ADVICE r04) instead of wrapping to INT64_MIN."""
    import pytest as _pytest

    from sketchlib.hll import (
        estimate_from_histogram,
        estimates_from_histograms,
        histograms_from_registers,
    )

    full = np.full(1 << 12, 64, dtype=np.uint8)
    hists = histograms_from_registers(full[None, :])
    with _pytest.raises(ZeroDivisionError):
        estimates_from_histograms(hists, 12)
    with _pytest.raises(ZeroDivisionError):
        estimate_from_histogram(hists[0], 12)


def test_jaccard_empty_set_convention():
    """Unified empty-set algebra (ADVICE r04): jaccard of two empty sketches
    is 1.0 for both HLL and KMV."""
    from sketchlib.kmv import KmvSketch

    assert HllSketch.jaccard_estimate(HllSketch.empty(12), HllSketch.empty(12)) == 1.0
    assert KmvSketch.jaccard(KmvSketch.empty(64), KmvSketch.empty(64)) == 1.0
    # non-empty vs empty stays 0.0
    s = HllSketch.empty(12)
    s.update_batch(np.arange(1000, dtype=np.int32))
    assert HllSketch.jaccard_estimate(s, HllSketch.empty(12)) == 0.0


def test_difference_estimate():
    from sketchlib.hll import HllSketch
    import numpy as np

    a = HllSketch.empty(14)
    a.update_batch(np.arange(0, 60_000, dtype=np.int32))
    b = HllSketch.empty(14)
    b.update_batch(np.arange(30_000, 90_000, dtype=np.int32))
    d = HllSketch.difference_estimate(a, b)
    # |A\B| = 30k; three estimates combine, so allow 3 sigma on the union
    assert abs(d - 30_000) <= 3 * HllSketch.std_error(14) * 90_000
    assert HllSketch.difference_estimate(a, a) == 0
    empty = HllSketch.empty(14)
    assert HllSketch.difference_estimate(empty, a) == 0
    assert HllSketch.difference_estimate(a, empty) == a.cardinality()


def test_sparse_runtime_lifecycle_small_p():
    """sparse=True at dense-representable p (reference ctor default,
    src/hll.c:696-760): buffered adds, flush-on-read, representation-
    agnostic at-rest bytes, and the sparse->dense transform at
    max_sparse_list_size (src/hll.c:409-455, 513-524)."""
    s = HllSketch(p=12, sparse=True)
    d = HllSketch.empty(12)
    toks = np.arange(400, dtype=np.int32)
    import struct as st

    for t in toks.tolist():
        s.add(st.pack("<i", t))
    d.update_batch(toks)
    assert s.is_sparse
    assert s.cardinality() == d.cardinality()
    assert s.to_bytes() == d.to_bytes()  # byte-identical to the dense twin
    assert s.to_bytes(mode="dense") == d.to_bytes(mode="dense")
    assert s.to_bytes(mode="packed6") == d.to_bytes(mode="packed6")
    assert [s.get_register(i) for i in range(0, 1 << 12, 37)] == [
        int(d.registers[i]) for i in range(0, 1 << 12, 37)
    ]
    # crossing max_sparse_list_size (default 2^12/4 = 1024) densifies
    more = np.arange(400, 20_000, dtype=np.int32)
    s.update_batch(more)
    d.update_batch(more)
    assert not s.is_sparse
    assert np.array_equal(s.registers, d.registers)


def test_sparse_buffer_semantics():
    """The insertion buffer defers list folds until it fills or a read
    arrives; add() still reports growth exactly (checked against the
    buffer + sorted list, never stale)."""
    s = HllSketch(p=8, sparse=True, max_sparse_list_size=200, max_sparse_buffer_size=4)
    assert s.add(b"x") is True
    assert s.add(b"x") is False  # pending entry dominates: repeat not growth
    assert len(s._pending) == 1 and len(s.sparse_indices) == 0
    s.get_register(0)  # any read flushes (reference getSparseRegister)
    assert len(s._pending) == 0 and len(s.sparse_indices) == 1
    assert s.add(b"x") is False  # now found in the sorted list
    # fill the buffer: 4th distinct pending entry triggers the flush
    grew = [s.add(f"k{i}".encode()) for i in range(8)]
    assert all(grew) and len(s._pending) < 4
    assert s.is_sparse  # well under max_sparse_list_size


def test_sparse_dense_merge_combos():
    """merge()/| handle all four representation combinations with identical
    final register state (reference merge walks get/setRegister,
    src/hll.c:791-811), and a sparse self densifies mid-merge when the
    merged list crosses the threshold."""
    ta = np.arange(300, dtype=np.int32)
    tb = np.arange(150, 450, dtype=np.int32)
    builds = {}
    for name, toks in (("a", ta), ("b", tb)):
        sp = HllSketch(p=10, sparse=True)
        sp.update_batch(toks)
        dn = HllSketch.empty(10)
        dn.update_batch(toks)
        builds[name] = (sp, dn)
    expect = np.maximum(builds["a"][1].registers, builds["b"][1].registers)
    for left in builds["a"]:
        for right in builds["b"]:
            out = left | right  # non-mutating: copies under the hood
            got = out.registers if not out.is_sparse else out._dense_registers()
            assert np.array_equal(got, expect)
            mid = left.copy().merge(right)  # in-place form
            gotm = mid.registers if not mid.is_sparse else mid._dense_registers()
            assert np.array_equal(gotm, expect)
    # mid-merge densify: two sparse halves (each ~560 distinct indices at
    # p=12, under the 1024 threshold) whose union crosses it
    h1 = HllSketch(p=12, sparse=True)
    h2 = HllSketch(p=12, sparse=True)
    h1.update_batch(np.arange(600, dtype=np.int32))
    h2.update_batch(np.arange(5_000, 5_600, dtype=np.int32))
    assert h1.is_sparse and h2.is_sparse
    h1.merge(h2)
    full = HllSketch.empty(12)
    full.update_batch(np.concatenate([np.arange(600), np.arange(5_000, 5_600)]).astype(np.int32))
    assert not h1.is_sparse  # union nnz >= 1024 triggered the transform
    assert np.array_equal(h1.registers, full.registers)
