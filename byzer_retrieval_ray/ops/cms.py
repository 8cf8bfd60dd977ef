"""Count–Min sketch point-frequency estimates (Cormode & Muthukrishnan
2005) — "how often does each of THESE keys occur in the corpus?" without a
corpus-wide (key, count) shuffle. The natural companion to ops/hll.py
(how MANY distinct) and ops/bloom.py (HAS this been seen): a 100 TB
pipeline uses it to track frequencies of a watchlist (contamination
probes, blocklist terms, canary strings) in one streaming pass. The
reference engine has no frequency sketch (SURVEY.md §2) — extension.

Sketch: ``depth`` rows × ``width`` counters. Row i increments counter

    col_i(key) = fmix32( Horner31(str(key) + '#' + str(i)) ) mod width

(the repo's SQL-replicable hash family, the exact composition
ops/bloom.py uses), and the estimate for a key is the MIN over rows of its
counters — an overestimate with err ≤ 2n/width at probability 1-2^-depth,
never an underestimate. Counters are integer SUMS, so the sketch is
order-independent, exactly mergeable, and the DuckDB oracle reproduces
every counter — realized collisions included — not just an error band.

100 TB shape: per-batch combiner hashes the batch's DISTINCT keys
(np.unique + counts) and emits only its NONZERO cells as (slot, count)
rows — ≤ depth·distinct(batch), independent of row count; the driver sums
them into the dense depth×width matrix (the only state, e.g. 4×2^20 int64
= 32 MB). No key strings move. Estimates for the watchlist are then a
driver-side gather.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.polyhash import fmix32_np, poly_hash_np


def _cols(keys: list[str], width: int, depth: int) -> np.ndarray:
    """(depth, len(keys)) int64 column indices for each key and row."""
    out = np.empty((depth, len(keys)), np.int64)
    for i in range(depth):
        h = fmix32_np(poly_hash_np([k + "#" + str(i) for k in keys], bits=32))
        out[i] = (h % np.uint64(width)).astype(np.int64)
    return out


def cms_build(ds, key_col: str, width: int = 1 << 16, depth: int = 4) -> np.ndarray:
    """One streaming pass → the dense (depth, width) int64 counter matrix.
    Every occurrence counts (multiplicity, not distinct). Matrices from
    separate runs/partitions add element-wise (``a + b``)."""
    if depth < 1 or width < 1:
        raise ValueError("need depth >= 1 and width >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        keys, cnt = np.unique(
            batch[key_col].cast(pa.string()).to_pylist(), return_counts=True)
        if keys.size == 0:
            return pa.table({"slot": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        cols = _cols(list(keys), width, depth)          # (depth, nkeys)
        rows = np.arange(depth, dtype=np.int64)[:, None]
        slot = (rows * width + cols).ravel()
        cnt = np.broadcast_to(cnt.astype(np.int64), (depth, keys.size)).ravel()
        # combine duplicate slots within the batch before emitting
        uslot, inv = np.unique(slot, return_inverse=True)
        ucnt = np.zeros(uslot.size, np.int64)
        np.add.at(ucnt, inv, cnt)
        return pa.table({"slot": pa.array(uslot, pa.int64()),
                         "cnt": pa.array(ucnt, pa.int64())})

    mat = np.zeros(depth * width, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        # iter_batches may coalesce several partial blocks into one batch,
        # so slots repeat — scatter-add, never fancy-index +=
        np.add.at(mat, b["slot"].to_numpy(), b["cnt"].to_numpy())
    return mat.reshape(depth, width)


def cms_estimate(mat: np.ndarray, keys: list[str]) -> np.ndarray:
    """Point estimates (int64, one per key): min over rows of the key's
    counters. Overestimates only."""
    depth, width = mat.shape
    cols = _cols([str(k) for k in keys], width, depth)
    gathered = mat[np.arange(depth)[:, None], cols]     # (depth, nkeys)
    return gathered.min(axis=0)


def cms_counts(ds, key_col: str, watch_keys: list[str],
               width: int = 1 << 16, depth: int = 4) -> dict[str, int]:
    """Build the sketch over ``ds[key_col]`` and estimate each watch key."""
    mat = cms_build(ds, key_col, width=width, depth=depth)
    est = cms_estimate(mat, watch_keys)
    return {k: int(v) for k, v in zip(watch_keys, est)}
