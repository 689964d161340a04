"""LIVE parity against the reference C extension itself.

Builds ascv/HyperLogLog from the read-only reference checkout into a temp
directory (no repo files are copied anywhere) and compares our numpy
implementation register-for-register and estimate-for-estimate at runtime —
the strongest possible parity evidence, not just recorded golden values.
Skips cleanly when no C toolchain is available.
"""

import shutil
import struct
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from sketchlib.hll import HllSketch

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_hll():
    build_dir = tempfile.mkdtemp(prefix="refbuild_")
    try:
        shutil.copytree(REF, f"{build_dir}/ref")
    except Exception:
        pytest.skip("reference checkout unavailable")
    proc = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=f"{build_dir}/ref",
        capture_output=True,
        text=True,
        timeout=300,
    )
    if proc.returncode != 0:
        pytest.skip(f"cannot build reference extension: {proc.stderr[-200:]}")
    sys.path.insert(0, f"{build_dir}/ref")
    try:
        import HLL  # noqa: F401

        yield HLL
    except ImportError:
        pytest.skip("built extension failed to import")
    finally:
        sys.path.remove(f"{build_dir}/ref")
        shutil.rmtree(build_dir, ignore_errors=True)


@pytest.mark.parametrize("p,seed,n", [(12, 314, 20_000), (14, 314, 100_000), (10, 7, 5_000)])
def test_live_register_and_estimate_parity(ref_hll, p, seed, n):
    rng = np.random.default_rng(p * 1000 + seed)
    tokens = rng.integers(-(2**31), 2**31, n).astype(np.int32)

    ref = ref_hll.HyperLogLog(p=p, seed=seed, sparse=False)
    for t in tokens.tolist():
        ref.add(struct.pack("<i", t))

    ours = HllSketch.empty(p, seed)
    ours.update_batch(tokens)

    ref_regs = np.array([ref.get_register(i) for i in range(1 << p)], dtype=np.uint8)
    assert np.array_equal(ours.registers, ref_regs), "register mismatch vs live reference"
    assert ours.cardinality() == ref.cardinality(), "estimate mismatch vs live reference"


def test_live_hash_parity(ref_hll):
    ref = ref_hll.HyperLogLog(p=4, seed=314)
    ours = HllSketch.empty(4, seed=314)
    for key in [b"", b"a", b"hello world", b"12345678", b"123456789", "unicode-éè"]:
        if isinstance(key, str):
            assert ref.hash(key) == ours.hash(key), key
        else:
            assert ref.hash(key) == ours.hash(key), key


def test_live_sparse_mode_equivalence(ref_hll):
    """Reference sparse-start sketches land on the same registers we compute

    (our build is always dense in flight; external semantics must agree)."""
    rng = np.random.default_rng(99)
    tokens = rng.integers(0, 10_000, 3_000).astype(np.int32)
    ref = ref_hll.HyperLogLog(p=12, seed=314, sparse=True)
    for t in tokens.tolist():
        ref.add(struct.pack("<i", t))
    ours = HllSketch.empty(12, 314)
    ours.update_batch(tokens)
    ref_regs = np.array([ref.get_register(i) for i in range(1 << 12)], dtype=np.uint8)
    assert np.array_equal(ours.registers, ref_regs)
    assert ours.cardinality() == ref.cardinality()


def test_live_merge_parity(ref_hll):
    """merge() semantics: reference in-place max-merge == our merge."""
    rng = np.random.default_rng(5)
    a_t = rng.integers(0, 50_000, 4_000).astype(np.int32)
    b_t = rng.integers(25_000, 75_000, 4_000).astype(np.int32)

    ref_a = ref_hll.HyperLogLog(p=12, seed=314, sparse=False)
    ref_b = ref_hll.HyperLogLog(p=12, seed=314, sparse=False)
    for t in a_t.tolist():
        ref_a.add(struct.pack("<i", t))
    for t in b_t.tolist():
        ref_b.add(struct.pack("<i", t))
    ref_a.merge(ref_b)

    ours_a = HllSketch.empty(12, 314)
    ours_a.update_batch(a_t)
    ours_b = HllSketch.empty(12, 314)
    ours_b.update_batch(b_t)
    ours_a.merge(ours_b)

    ref_regs = np.array([ref_a.get_register(i) for i in range(1 << 12)], dtype=np.uint8)
    assert np.array_equal(ours_a.registers, ref_regs)
    assert ours_a.cardinality() == ref_a.cardinality()


def test_live_sparse_lifecycle_parity(ref_hll):
    """Drive the built reference and our sparse-runtime sketch through the
    full sparse lifecycle with the SAME add() sequence: buffered sparse
    phase, flush-on-read, and the sparse->dense transform. Registers,
    estimates, and the sparse-mode add()-returns-False quirk must agree at
    every checkpoint (repr-transition timing is each impl's own business;
    state parity is what the contract requires)."""
    from sketchlib.compat import HyperLogLog as Shim

    p, seed = 10, 314
    rng = np.random.default_rng(42)
    tokens = rng.integers(0, 5_000, 2_000).astype(np.int32)
    ref = ref_hll.HyperLogLog(p=p, seed=seed, sparse=True)
    ours = Shim(p=p, seed=seed, sparse=True)

    checkpoints = (30, 120, len(tokens))  # mid-sparse, later, post-transform
    done = 0
    for stop in checkpoints:
        for t in tokens[done:stop].tolist():
            buf = struct.pack("<i", t)
            r_ret = ref.add(buf)
            o_ret = ours.add(buf)
            # each side returns False for every add made while IT is sparse
            if ref._get_meta()["is_sparse"]:
                assert r_ret is False
            if ours._get_meta()["is_sparse"]:
                assert o_ret is False
        done = stop
        ref_regs = [ref.get_register(i) for i in range(1 << p)]
        our_regs = [ours.get_register(i) for i in range(1 << p)]
        assert ref_regs == our_regs, f"register divergence at add #{stop}"
        assert ref.cardinality() == ours.cardinality()

    # both must have crossed the transform by the end (default max list
    # size is 2^p/4 = 256 and ~1800 distinct indices were touched)
    assert ref._get_meta()["is_sparse"] == 0
    assert ours._get_meta()["is_sparse"] == 0
    # post-transform adds report growth again, identically
    fresh = struct.pack("<i", 1 << 30)
    assert ref.add(fresh) == ours.add(fresh)
