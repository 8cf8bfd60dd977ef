"""Distributed Bloom seen-set — the incremental-crawl membership primitive.

A 100 TB ingest pipeline rarely re-deduplicates the world per run; it keeps
a fixed-size SEEN-SET of keys (canonical urls, doc hashes) and asks each new
batch "which of these have I seen?". A Bloom filter is the standard answer:
``m`` bits, ``k`` hash probes per key, no false negatives, a known
false-positive rate ~(1-e^{-kn/m})^k. The reference engine has no membership
structure (SURVEY.md §2) — extension, same family as ops/dedup.py.

Hashing is the repo's SQL-replicable family (functions/polyhash.py):

    pos_i(key) = fmix32( Horner31(str(key) + '#' + str(i)) ) mod m,  i < k

so the EXACT bit array — false positives included — is reproducible in
DuckDB, and the gate value-checks every membership verdict rather than just
the true positives.

100 TB shape:

* **build** (``build_bloom``) — per-batch combiner computes each batch's
  DISTINCT probe positions (vectorized hash + np.unique); ONE narrow
  exchange of int64 positions (bounded: after per-batch dedup the global
  distinct stream is ≤ m rows TOTAL regardless of corpus size) and the
  driver ORs ≤ m bits into the bitmap. No key strings ever shuffle.
* **probe** (``bloom_members`` / ``bloom_filter_seen``) — the bitmap
  (m/8 bytes, e.g. 128 MB for m = 2^30) is ``ray.put`` ONCE and read
  zero-copy by every probe task; membership is a vectorized bit-gather per
  batch, zero shuffle, zero driver state.

Sizing is the caller's contract (documented, standard Bloom math):
m ≥ 1.44·k·n for ~50 % per-probe load; the build warns when the realized
load factor exceeds 0.5 (false-positive blow-up).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.polyhash import fmix32_np, poly_hash_np


def _positions(keys, m_bits: int, k: int) -> np.ndarray:
    """(len(keys)·k) int64 probe positions, row-major [key0_i0..key0_ik-1,...]."""
    strs = [f"{x}#{i}" for x in keys for i in range(k)]
    h = fmix32_np(poly_hash_np(strs, bits=32))
    return (h % np.uint64(m_bits)).astype(np.int64)


def build_bloom(ds, key_col: str, m_bits: int = 1 << 20, k: int = 3):
    """Bloom bitmap (numpy uint8 array of m_bits/8 bytes) over a key column.

    See module docstring for the exchange shape. Returns the bitmap; wrap in
    ``ray.put`` to share across probe tasks.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].cast(pa.string()).to_pylist()
        pos = np.unique(_positions(keys, m_bits, k))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    # per-batch distinct positions stream to the driver; total distinct
    # volume is bounded by m_bits, not by corpus size
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        pos = b["pos"].to_numpy()
        np.bitwise_or.at(bitmap, pos >> 3,
                         np.left_shift(1, (pos & 7)).astype(np.uint8))
    load = float(np.unpackbits(bitmap).sum()) / m_bits
    if load > 0.5:
        import logging
        logging.getLogger(__name__).warning(
            "bloom load factor %.2f > 0.5 — false-positive rate degrades; "
            "increase m_bits", load)
    return bitmap


def bloom_members(ds, key_col: str, bitmap_ref, m_bits: int, k: int = 3):
    """Streaming membership verdicts: (key columns..., member int64 0/1)."""
    import ray

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bitmap_ref) if not isinstance(bitmap_ref, np.ndarray) \
            else bitmap_ref
        keys = batch[key_col].cast(pa.string()).to_pylist()
        pos = _positions(keys, m_bits, k).reshape(-1, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        member = bits.all(axis=1).astype(np.int64)
        return batch.append_column("member", pa.array(member, pa.int64()))

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_filter_seen(ds, key_col: str, bitmap_ref, m_bits: int, k: int = 3,
                      keep_seen: bool = False):
    """Drop (default) or keep the rows whose key is (probably) in the set."""
    def g(batch: pa.Table) -> pa.Table:
        import ray
        bm = ray.get(bitmap_ref) if not isinstance(bitmap_ref, np.ndarray) \
            else bitmap_ref
        keys = batch[key_col].cast(pa.string()).to_pylist()
        pos = _positions(keys, m_bits, k).reshape(-1, k)
        bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        member = bits.all(axis=1)
        return batch.filter(pa.array(member if keep_seen else ~member))

    return ds.map_batches(g, batch_format="pyarrow")
