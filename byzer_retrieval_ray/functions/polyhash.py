"""Polynomial string hashes with SQL-replicable arithmetic.

``poly_hash_np`` computes the classic Horner hash h = h·31 + codepoint over each
string, with exact wrap-around semantics (mod 2^64, or mod 2^32 per step):

    h_0 = 0;  h_{i+1} = (h_i * 31 + cp_i) mod 2^bits

The same fold is expressible in DuckDB as
``list_reduce(list_transform(range(1, len(s)+1), i -> unicode(s[i])),
(a, b) -> (a*31 + b) % 2^bits)`` (list_reduce seeds with the first element, which
equals Horner with h_0 = 0), which is what makes gate pipelines built on these
hashes oracle-checkable — unlike murmur3, which has no practical SQL equivalent.

Vectorized: all strings are joined with a separator, decoded to a codepoint array
once (utf-32), and the per-string Horner folds advance in lock-step over character
positions (max-string-length iterations of whole-array numpy ops — no per-string
Python loop).
"""

from __future__ import annotations

import numpy as np

_MASK32 = np.uint64(0xFFFFFFFF)


def poly_hash_np(strs, bits: int = 64, mult: int = 31) -> np.ndarray:
    """Horner hash of each string (uint64 array; values < 2^bits).

    ``strs`` is a sequence of Python strings that must not contain the "\\n"
    separator (whitespace-split tokens and space-joined shingles never do).
    """
    n = len(strs)
    if n == 0:
        return np.empty(0, np.uint64)
    joined = "\n".join(strs)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    seps = np.flatnonzero(cps == 10)
    starts = np.concatenate([np.zeros(1, np.int64), seps + 1])
    ends = np.concatenate([seps, np.array([cps.size], np.int64)])
    lens = ends - starts
    h = np.zeros(n, dtype=np.uint64)
    m = np.uint64(mult)
    maxlen = int(lens.max()) if n else 0
    for i in range(maxlen):
        active = lens > i
        h[active] = h[active] * m + cps[starts[active] + i]
        if bits == 32:
            h[active] &= _MASK32
    return h


def fold_u64(values: np.ndarray, mult: int = 1000003, axis: int | None = None) -> np.ndarray:
    """Horner fold over uint64 values (wrap mod 2^64): g = g·mult + v.

    For a 2-D array with ``axis=1`` folds each row. Matches the DuckDB fold
    ``list_reduce(l, (a,b) -> (a*mult + b) % 2^64)`` seeded with the first element.
    """
    vals = np.asarray(values, dtype=np.uint64)
    m = np.uint64(mult)
    if vals.ndim == 1:
        g = np.uint64(0)
        for v in vals:
            g = g * m + v
        return g
    out = np.zeros(vals.shape[0], dtype=np.uint64)
    for j in range(vals.shape[1]):
        out = out * m + vals[:, j]
    return out


def fmix32_np(h: np.ndarray) -> np.ndarray:
    """MurmurHash3's 32-bit finalizer (public avalanche constants) over a
    uint64 array holding values < 2^32 — xor-shift/multiply steps only, so
    it is exactly expressible in DuckDB:

        xor(h, h >> 16), CAST((CAST(. AS HUGEINT) * 2246822507) % 4294967296
        AS BIGINT), xor(. , . >> 13), * 3266489909, xor(. , . >> 16)

    Use after poly_hash_np(bits=32) when the hash keys a modulo partition
    (shards/buckets): Horner hashes of near-sequential strings are uniform
    as VALUES but correlated in their low bits; the finalizer avalanches
    them (ops/export.py shard keys).
    """
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & _MASK32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & _MASK32
    h ^= h >> np.uint64(16)
    return h
