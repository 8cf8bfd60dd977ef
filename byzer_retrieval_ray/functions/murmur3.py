"""MurmurHash3 x86_32 (public-domain algorithm by Austin Appleby) + the reference's
shard-routing semantics.

The reference routes documents to shards with ``Utils.route`` (Utils.java:137-145):
long ids use ``id % numWorkers`` (Java %, sign of dividend); other ids are stringified,
hashed with murmur3_x86_32 (seed 0, UTF-8 bytes), negated if negative (Java int
negation, so Integer.MIN_VALUE stays negative), then ``% numWorkers``. We replicate
those exact semantics (test vector: route(10, 3) == 1, UtilsTest.java:21-31).

Both a scalar port and a numpy-vectorized batch version are provided; the vectorized
one is what build pipelines use for per-batch partition assignment.
"""

from __future__ import annotations

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _i32(x: int) -> int:
    """Wrap to signed 32-bit."""
    x &= _M32
    return x - (1 << 32) if x >= 1 << 31 else x


def _rotl32(x: int, r: int) -> int:
    x &= _M32
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Signed-int32 murmur3_x86_32 of a byte string (little-endian block loads)."""
    length = len(data)
    h1 = seed & _M32
    rounded_end = length & 0xFFFFFFFC
    for i in range(0, rounded_end, 4):
        k1 = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k1 = (k1 * _C1) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _M32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _M32
    k1 = 0
    rem = length & 0x03
    if rem == 3:
        k1 = data[rounded_end + 2] << 16
    if rem >= 2:
        k1 |= data[rounded_end + 1] << 8
    if rem >= 1:
        k1 |= data[rounded_end]
        k1 = (k1 * _C1) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _M32
        h1 ^= k1
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return _i32(h1)


def murmur3_string(s: str) -> int:
    """Reference string hash: murmur3 of UTF-8 bytes, Java-int negated if negative."""
    v = murmur3_x86_32(s.encode("utf-8"))
    if v < 0:
        v = _i32(-v)  # Integer.MIN_VALUE negates to itself in Java
    return v


def route(doc_id, num_workers: int) -> int:
    """Shard routing with the reference's exact semantics (Utils.route)."""
    if isinstance(doc_id, (int, np.integer)) and not isinstance(doc_id, bool):
        v = int(doc_id) % num_workers
        # Java % keeps the dividend's sign
        if int(doc_id) < 0 and v != 0:
            v -= num_workers
        return v
    v = murmur3_string(str(doc_id)) % num_workers
    if murmur3_string(str(doc_id)) < 0 and v != 0:
        v -= num_workers
    return v


def murmur3_np(strings: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 over an array of python/numpy strings.

    Encodes each string to UTF-8, right-pads into a (n, max_len) uint8 matrix and runs
    the block mixing across the batch with uint32 numpy arithmetic. Returns signed
    int32, identical to the scalar port.
    """
    encoded = [s.encode("utf-8") for s in strings]
    n = len(encoded)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    max_len = int(lens.max()) if n else 0
    padded_len = (max_len + 3) & ~3
    buf = np.zeros((n, max(padded_len, 4)), dtype=np.uint8)
    for i, b in enumerate(encoded):
        buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)

    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    h1 = np.full(n, seed, dtype=np.uint32)
    n_blocks = padded_len // 4
    # little-endian 4-byte blocks for every row at once
    blocks = buf[:, : n_blocks * 4].reshape(n, n_blocks, 4).astype(np.uint32)
    k_all = blocks[:, :, 0] | (blocks[:, :, 1] << 8) | (blocks[:, :, 2] << 16) | (blocks[:, :, 3] << 24)
    full_blocks = lens // 4  # number of complete blocks per row
    with np.errstate(over="ignore"):
        for j in range(n_blocks):
            active = full_blocks > j
            if not active.any():
                break
            k1 = k_all[:, j] * c1
            k1 = (k1 << 15) | (k1 >> 17)
            k1 = k1 * c2
            h1_new = h1 ^ k1
            h1_new = (h1_new << 13) | (h1_new >> 19)
            h1_new = h1_new * np.uint32(5) + np.uint32(0xE6546B64)
            h1 = np.where(active, h1_new, h1)
        # tail bytes
        rem = (lens & 3).astype(np.int64)
        tail_start = (full_blocks * 4).astype(np.int64)
        rows = np.arange(n)
        k1 = np.zeros(n, dtype=np.uint32)
        has3 = rem == 3
        k1[has3] = buf[rows[has3], tail_start[has3] + 2].astype(np.uint32) << 16
        has2 = rem >= 2
        k1[has2] |= buf[rows[has2], tail_start[has2] + 1].astype(np.uint32) << 8
        has1 = rem >= 1
        k1[has1] |= buf[rows[has1], tail_start[has1]].astype(np.uint32)
        k1t = k1 * c1
        k1t = (k1t << 15) | (k1t >> 17)
        k1t = k1t * c2
        h1 = np.where(has1, h1 ^ k1t, h1)
        h1 ^= lens.astype(np.uint32)
        h1 ^= h1 >> 16
        h1 = h1 * np.uint32(0x85EBCA6B)
        h1 ^= h1 >> 13
        h1 = h1 * np.uint32(0xC2B2AE35)
        h1 ^= h1 >> 16
    return h1.astype(np.int32)


def route_np(ids: np.ndarray, num_workers: int) -> np.ndarray:
    """Vectorized route() for string ids (abs-with-overflow then non-negative %)."""
    h = murmur3_np(ids).astype(np.int64)
    h = np.where(h < 0, (-h) & _M32, h)  # Java -Integer.MIN_VALUE wraps
    h = np.where(h >= 1 << 31, h - (1 << 32), h)
    out = h % num_workers
    out = np.where((h < 0) & (out != 0), out - num_workers, out)
    return out.astype(np.int64)
