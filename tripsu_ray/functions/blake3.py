"""BLAKE3 (keyed + plain), pure Python — reference-digest conformance mode.

The reference pseudonymizes with ``blake3::keyed_hash(key, bytes)`` and
derives ``key = blake3(secret)[..32]`` (``src/crypto.rs:97-119``). No
blake3 wheel exists in this environment, so this is a from-scratch
implementation of the PUBLIC algorithm (Aumasson, Neves, O'Connor,
Wilcox-O'Hearn — the BLAKE3 paper/spec, 2020): 7-round compression on a
16-word state, 1 KiB chunks, binary Merkle tree whose left subtree holds
the largest power-of-two chunk count < total, domain flags
CHUNK_START/END, PARENT, ROOT, KEYED_HASH.

Validated against the published test vectors this environment can carry
(empty / 1-byte inputs) plus chunk/block-boundary self-consistency tests;
with it, ``Blake3Keyed`` (functions/crypto.py) emits digests
byte-identical to the Rust binary for the same secret.

Scalar core is pure Python (config-path speed); ``blake3_keyed_many``
vectorizes the common pseudonymization case — many short (≤ 1 KiB)
values — across numpy lanes, one G-function evaluation per block for the
whole batch.
"""

from __future__ import annotations

import struct

import numpy as np

IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
MSG_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3
KEYED_HASH = 1 << 4

BLOCK_LEN = 64
CHUNK_LEN = 1024
_M32 = 0xFFFFFFFF


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _M32


def _g(v: list[int], a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    v[a] = (v[a] + v[b] + mx) & _M32
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = (v[c] + v[d]) & _M32
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = (v[a] + v[b] + my) & _M32
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = (v[c] + v[d]) & _M32
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(cv, block_words, counter: int, block_len: int, flags: int) -> list[int]:
    v = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & _M32, (counter >> 32) & _M32, block_len, flags,
    ]
    m = list(block_words)
    for r in range(7):
        _g(v, 0, 4, 8, 12, m[0], m[1])
        _g(v, 1, 5, 9, 13, m[2], m[3])
        _g(v, 2, 6, 10, 14, m[4], m[5])
        _g(v, 3, 7, 11, 15, m[6], m[7])
        _g(v, 0, 5, 10, 15, m[8], m[9])
        _g(v, 1, 6, 11, 12, m[10], m[11])
        _g(v, 2, 7, 8, 13, m[12], m[13])
        _g(v, 3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[MSG_PERM[i]] for i in range(16)]
    # 16 words: [0:8] = next CV; [8:16] = XOF tail (upper state ^ input CV)
    return [v[i] ^ v[i + 8] for i in range(8)] + [v[i + 8] ^ cv[i] for i in range(8)]


def _words(block: bytes) -> list[int]:
    block = block.ljust(BLOCK_LEN, b"\x00")
    return list(struct.unpack("<16I", block))


def _chunk_cv(chunk: bytes, key_words, counter: int, flags: int):
    """Chaining value of one ≤1024-byte chunk; returns the args of its LAST
    compression so a root caller can re-run it with the ROOT flag."""
    cv = list(key_words)
    blocks = [chunk[i : i + BLOCK_LEN] for i in range(0, len(chunk), BLOCK_LEN)] or [b""]
    for i, blk in enumerate(blocks):
        f = flags
        if i == 0:
            f |= CHUNK_START
        if i == len(blocks) - 1:
            f |= CHUNK_END
        args = (cv, _words(blk), counter, len(blk), f)
        cv = _compress(*args)[:8]
    return cv, args  # noqa: F821 — args always bound (blocks non-empty)


def _left_len(total_chunks: int) -> int:
    p = 1
    while p * 2 < total_chunks:
        p *= 2
    return p


def _subtree(data: bytes, key_words, chunk_counter: int, flags: int):
    """CV of a subtree; also returns the final-compression args for ROOT."""
    n_chunks = max(1, (len(data) + CHUNK_LEN - 1) // CHUNK_LEN)
    if n_chunks == 1:
        return _chunk_cv(data, key_words, chunk_counter, flags)
    left_chunks = _left_len(n_chunks)
    split = left_chunks * CHUNK_LEN
    l_cv, _ = _subtree(data[:split], key_words, chunk_counter, flags)
    r_cv, _ = _subtree(data[split:], key_words, chunk_counter + left_chunks, flags)
    block = struct.pack("<8I", *l_cv) + struct.pack("<8I", *r_cv)
    args = (list(key_words), _words(block), 0, BLOCK_LEN, flags | PARENT)
    return _compress(*args)[:8], args


def _digest(data: bytes, key_words, flags: int, out_len: int = 32) -> bytes:
    _, root_args = _subtree(data, key_words, 0, flags)
    cv, words, _counter, block_len, f = root_args
    out = b""
    counter = 0
    while len(out) < out_len:  # root XOF: counter strides output blocks
        stream = _compress(cv, words, counter, block_len, f | ROOT)
        out += struct.pack("<16I", *stream)
        counter += 1
    return out[:out_len]


def blake3(data: bytes, out_len: int = 32) -> bytes:
    return _digest(data, IV, 0, out_len)


def blake3_keyed(key: bytes, data: bytes, out_len: int = 32) -> bytes:
    if len(key) != 32:
        raise ValueError("blake3 keyed hash requires a 32-byte key")
    key_words = struct.unpack("<8I", key)
    return _digest(data, key_words, KEYED_HASH, out_len)


# ---------------------------------------------------------------------------
# vectorized batch path: many independent short (≤ 1 chunk) messages
# ---------------------------------------------------------------------------


def _g_vec(v, a, b, c, d, mx, my):
    v[a] += v[b] + mx
    v[d] = np.bitwise_xor(v[d], v[a])
    v[d] = (v[d] >> np.uint32(16)) | (v[d] << np.uint32(16))
    v[c] += v[d]
    v[b] = np.bitwise_xor(v[b], v[c])
    v[b] = (v[b] >> np.uint32(12)) | (v[b] << np.uint32(20))
    v[a] += v[b] + my
    v[d] = np.bitwise_xor(v[d], v[a])
    v[d] = (v[d] >> np.uint32(8)) | (v[d] << np.uint32(24))
    v[c] += v[d]
    v[b] = np.bitwise_xor(v[b], v[c])
    v[b] = (v[b] >> np.uint32(7)) | (v[b] << np.uint32(25))


def _compress_vec(cv: np.ndarray, m: np.ndarray, block_len: np.ndarray, flags: np.ndarray) -> np.ndarray:
    """Lane-parallel compression: cv (8, N), m (16, N) → (16, N)."""
    n = cv.shape[1]
    v = [None] * 16
    for i in range(8):
        v[i] = cv[i].copy()
    for i in range(4):
        v[8 + i] = np.full(n, IV[i], dtype=np.uint32)
    v[12] = np.zeros(n, dtype=np.uint32)  # counter: single-chunk → 0
    v[13] = np.zeros(n, dtype=np.uint32)
    v[14] = block_len.astype(np.uint32)
    v[15] = flags.astype(np.uint32)
    mm = [m[i] for i in range(16)]
    for r in range(7):
        _g_vec(v, 0, 4, 8, 12, mm[0], mm[1])
        _g_vec(v, 1, 5, 9, 13, mm[2], mm[3])
        _g_vec(v, 2, 6, 10, 14, mm[4], mm[5])
        _g_vec(v, 3, 7, 11, 15, mm[6], mm[7])
        _g_vec(v, 0, 5, 10, 15, mm[8], mm[9])
        _g_vec(v, 1, 6, 11, 12, mm[10], mm[11])
        _g_vec(v, 2, 7, 8, 13, mm[12], mm[13])
        _g_vec(v, 3, 4, 9, 14, mm[14], mm[15])
        if r < 6:
            mm = [mm[MSG_PERM[i]] for i in range(16)]
    # callers need only the 8-word CV / first 32 output bytes per lane
    return np.stack([v[i] ^ v[i + 8] for i in range(8)])


def blake3_keyed_many(key: bytes, values: list[bytes]) -> list[str]:
    """Keyed BLAKE3 hex digests for many messages, numpy-lane-parallel.

    Messages > 1 chunk (1024 B) fall back to the scalar tree path; the
    ≤ 1-chunk majority (IRIs, literals) runs all lanes together, one
    vectorized compression per 64-byte block index with per-lane
    block_len/flags masks — this is what keeps ``blake3-keyed`` usable as
    a batch pseudonymization algorithm, not just a conformance check.
    """
    if len(key) != 32:
        raise ValueError("blake3 keyed hash requires a 32-byte key")
    out: list[str | None] = [None] * len(values)
    short_idx = [i for i, v in enumerate(values) if len(v) <= CHUNK_LEN]
    for i, v in enumerate(values):
        if len(v) > CHUNK_LEN:
            out[i] = blake3_keyed(key, v).hex()
    if not short_idx:
        return out  # type: ignore[return-value]

    key_words = np.frombuffer(key, dtype=np.uint32)
    n = len(short_idx)
    lens = np.array([len(values[i]) for i in short_idx], dtype=np.int64)
    n_blocks = np.maximum(1, (lens + BLOCK_LEN - 1) // BLOCK_LEN)
    max_blocks = int(n_blocks.max())
    # (N, max_blocks*64) zero-padded byte matrix → per-block word lanes
    buf = np.zeros((n, max_blocks * BLOCK_LEN), dtype=np.uint8)
    for j, i in enumerate(short_idx):
        v = values[i]
        buf[j, : len(v)] = np.frombuffer(v, dtype=np.uint8)
    words = buf.view(np.uint32).reshape(n, max_blocks, 16)

    cv = np.repeat(key_words[:, None], n, axis=1).astype(np.uint32)
    # we need the ROOT re-compression of each lane's LAST block: track the
    # inputs of that compression per lane and re-run with ROOT
    last_cv = np.zeros((8, n), dtype=np.uint32)
    last_m = np.zeros((16, n), dtype=np.uint32)
    last_len = np.zeros(n, dtype=np.uint32)
    last_flags = np.zeros(n, dtype=np.uint32)
    for b in range(max_blocks):
        active = n_blocks > b
        is_first = b == 0
        is_last = n_blocks == (b + 1)
        blk_len = np.clip(lens - b * BLOCK_LEN, 0, BLOCK_LEN).astype(np.uint32)
        flags = np.full(n, KEYED_HASH, dtype=np.uint32)
        if is_first:
            flags |= CHUNK_START
        flags = np.where(is_last, flags | CHUNK_END, flags)
        m = words[:, b, :].T.copy()  # (16, N)
        # record last-block inputs for lanes ending here
        sel = active & is_last
        if sel.any():
            last_cv[:, sel] = cv[:, sel]
            last_m[:, sel] = m[:, sel]
            last_len[sel] = blk_len[sel]
            last_flags[sel] = flags[sel]
        if (active & ~is_last).any():
            res = _compress_vec(cv, m, blk_len, flags)
            upd = active & ~is_last
            cv[:, upd] = res[:8, upd]
    root = _compress_vec(last_cv, last_m, last_len, last_flags | ROOT)
    # little-endian hex of the first 8 words per lane
    root_bytes = root[:8].T.astype("<u4").tobytes()
    for j, i in enumerate(short_idx):
        out[i] = root_bytes[j * 32 : (j + 1) * 32].hex()
    return out  # type: ignore[return-value]
