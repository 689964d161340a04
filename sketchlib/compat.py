"""Drop-in emulation of the reference `HyperLogLog` class surface.

A user of the reference extension (``from HLL import HyperLogLog``) can
switch to ``from sketchlib.compat import HyperLogLog`` and keep their code:
same constructor signature (src/hll.c:694-771), same method set
(src/hll.c:1000-1032), same pickle round-trip semantics. Internally it is
the library's vectorized dense HllSketch — the reference's sparse in-flight
machinery is an object-local memory optimization that vectorization
supersedes (SURVEY.md §4.1), so ``sparse``/``max_sparse_list_size``/
``max_sparse_buffer_size`` are accepted, remembered for ``_get_meta()``
fidelity, and otherwise no-ops. Estimates, hashes, register contents and
merge results are bit-identical to the reference (tests/test_reference_live
locks that for the core; test_compat locks this shim).
"""

from __future__ import annotations

import sys

from .hll import HllSketch

_HLL_VERSION = "2.3.0"  # reference version whose semantics we match (setup.py)


class HyperLogLog:
    """Reference-API shim over :class:`sketchlib.hll.HllSketch`."""

    def __init__(
        self,
        p: int = 12,
        seed: int = 314,
        sparse: bool = True,
        max_sparse_list_size: int = 0,
        max_sparse_buffer_size: int = 0,
    ):
        self._sketch = HllSketch.empty(int(p), int(seed))
        self._added = 0
        # remembered for _get_meta parity; dense-vectorized in flight
        self._is_sparse = bool(sparse)
        if max_sparse_list_size > 0:
            self._max_list_size = int(max_sparse_list_size)
        else:
            # reference default sizing (src/hll.c:729-744)
            default = (1 << int(p)) // 4
            if default > (1 << 20):
                self._max_list_size = 1 << 20
            elif default <= 4:
                self._max_list_size = 2
            else:
                self._max_list_size = default
        if max_sparse_buffer_size > 0:
            self._max_buffer_size = int(max_sparse_buffer_size)
        else:
            self._max_buffer_size = min(self._max_list_size // 2, 200_000)

    # -- reference methods (src/hll.c:1000-1032) ------------------------------

    def add(self, value) -> bool:
        """Add a str/bytes/buffer element; True iff a register grew."""
        self._added += 1
        return self._sketch.add(value)

    def cardinality(self) -> int:
        return self._sketch.cardinality()

    def merge(self, other: "HyperLogLog") -> None:
        """In-place merge; the other object is unaffected (returns None,
        exactly like the reference). ``added`` grows by the number of
        registers the merge actually updated: the reference's merge loop
        (src/hll.c:795-811) calls setRegister only where other > self, and
        setRegister increments the counter once per call (src/hll.c:516)."""
        a, b = self._sketch, other._sketch
        if a.is_sparse:
            # other's pairs that beat self's current value
            grown = sum(
                1
                for i, r in zip(b.sparse_indices, b.sparse_ranks)
                if int(r) > a.get_register(int(i))
            )
            self._added += grown
        else:
            self._added += int((b.registers > a.registers).sum())
        a.merge(b)

    def hash(self, value) -> int:
        return self._sketch.hash(value)

    def seed(self) -> int:
        return self._sketch.seed

    def size(self) -> int:
        return self._sketch.size

    def get_register(self, i: int) -> int:
        return self._sketch.get_register(i)

    def _histogram(self) -> list[int]:
        return [int(x) for x in self._sketch.histogram()]

    def _get_meta(self) -> dict:
        """Reference debug-metadata dict (src/hll.c:569-591): same keys; the
        sparse/cache internals report the dense-vectorized reality (0)."""
        v = sys.version_info
        return {
            "added": self._added,
            "list_size": 0,
            "buffer_size": 0,
            "cache": 0,
            "is_cached": 0,
            "is_sparse": int(self._is_sparse),
            "max_list_size": self._max_list_size,
            # the reference reports maxListSize under both keys (src/hll.c:586)
            "max_buffer_size": self._max_list_size,
            "node_cache_index": 0,
            "node_cache_value": 0,
            "py_version": f"{v.major}.{v.minor}.{v.micro}",
            "hll_version": _HLL_VERSION,
        }

    # -- pickle (reference __reduce__/__setstate__, src/hll.c:826-985) --------

    def __getstate__(self) -> dict:
        return {
            "blob": self._sketch.to_bytes(),
            "added": self._added,
            "is_sparse": self._is_sparse,
            "max_list_size": self._max_list_size,
            "max_buffer_size": self._max_buffer_size,
        }

    def __setstate__(self, state: dict) -> None:
        self._sketch = HllSketch.from_bytes(state["blob"])
        self._added = state["added"]
        self._is_sparse = state["is_sparse"]
        self._max_list_size = state["max_list_size"]
        self._max_buffer_size = state["max_buffer_size"]
