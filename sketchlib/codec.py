"""Shared at-rest binary codec for all sketches.

Every sketch serializes to a BinaryType cell as::

    magic u32 | version u16 | kind u8 | p u8 | seed u64 (little-endian)
    + kind-specific payload

This replaces the reference's pickle protocol (src/hll.c:826-985) with an
explicit, versioned, language-agnostic layout suitable for checkpoint tables
(SURVEY.md §3.4). Derivable state (histograms, caches) is never persisted.
"""

from __future__ import annotations

import struct

MAGIC = 0x534B4C53  # "SKLS"
VERSION = 1

KIND_HLL = 1
KIND_CMS = 2
KIND_BLOOM = 3
KIND_KLL = 4
KIND_TDIGEST = 5
KIND_KMV = 6
KIND_PROFILE = 7
KIND_FI = 8

_HEADER = struct.Struct("<IHBBq")  # magic, version, kind, p, seed
HEADER_LEN = _HEADER.size


def pack_header(kind: int, p: int, seed: int) -> bytes:
    return _HEADER.pack(MAGIC, VERSION, kind, p, seed)


def unpack_header(blob: bytes, expect_kind: int) -> tuple[int, int, bytes]:
    """Return (p, seed, payload); raises ValueError on corrupt/mismatched blobs."""
    if len(blob) < HEADER_LEN:
        raise ValueError(f"blob too short ({len(blob)} bytes) for sketch header")
    magic, version, kind, p, seed = _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic 0x{magic:08x}")
    if version != VERSION:
        raise ValueError(f"unsupported codec version {version}")
    if kind != expect_kind:
        raise ValueError(f"kind mismatch: blob has {kind}, expected {expect_kind}")
    return p, seed, blob[HEADER_LEN:]
