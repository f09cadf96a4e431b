"""SipHash-1-3 with Rust ``DefaultHasher`` semantics — index interop.

The reference's type index keys are ``DefaultHasher`` hashes of the
bracketed subject string (``src/index.rs:27-31``:
``DefaultHasher::new()`` → SipHash-1-3 with zero keys;
``s.hash(&mut hasher)`` for a ``String`` feeds the UTF-8 bytes plus a
trailing ``0xff`` length-prefix-free terminator per Rust's ``Hash for
str``; ``finish().to_le()`` is the SipHash finalization, identity on
little-endian). Reproducing those u64s is what lets this engine read and
write the reference's ``{types, map}`` JSON (``src/index.rs:20-24``,
``src/io.rs:58-63``) interchangeably with the Rust binary.

SipHash is a public algorithm (Aumasson & Bernstein, 2012); this is a
from-scratch implementation of the 1-3 variant (1 compression round, 3
finalization rounds). Pure Python — config/interop path only, never the
per-triple hot path (probes hash UNIQUE term keys per batch, deduped
first).
"""

from __future__ import annotations

import numpy as np

_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _MASK


def siphash13(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-1-3 of ``data`` under (k0, k1) — returns u64."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    def sipround(v0, v1, v2, v3):
        v0 = (v0 + v1) & _MASK
        v1 = _rotl(v1, 13) ^ v0
        v0 = _rotl(v0, 32)
        v2 = (v2 + v3) & _MASK
        v3 = _rotl(v3, 16) ^ v2
        v0 = (v0 + v3) & _MASK
        v3 = _rotl(v3, 21) ^ v0
        v2 = (v2 + v1) & _MASK
        v1 = _rotl(v1, 17) ^ v2
        v2 = _rotl(v2, 32)
        return v0, v1, v2, v3

    n = len(data)
    full = n - (n % 8)
    for i in range(0, full, 8):
        m = int.from_bytes(data[i : i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)  # c = 1
        v0 ^= m
    # final block: remaining bytes + (len mod 256) in the top byte
    m = (n & 0xFF) << 56
    m |= int.from_bytes(data[full:], "little")
    v3 ^= m
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(3):  # d = 3
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _MASK


def rust_default_hash_str(s: str) -> int:
    """``DefaultHasher::new(); s.hash(&mut h); h.finish()`` for a Rust str:
    UTF-8 bytes + the 0xff terminator Rust's ``Hash for str`` appends."""
    return siphash13(s.encode("utf-8") + b"\xff")


def hash_term_keys(keys: np.ndarray) -> np.ndarray:
    """Vector helper: u64 DefaultHasher values for unique term-key strings."""
    uniq, inv = np.unique(keys.astype(object), return_inverse=True)
    hashed = np.fromiter(
        (rust_default_hash_str(str(k)) for k in uniq), dtype=np.uint64, count=len(uniq)
    )
    return hashed[inv]
