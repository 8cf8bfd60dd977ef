"""HyperLogLog approximate distinct count (Flajolet et al. 2007) — the
cardinality primitive a 100 TB pipeline uses where an exact
``groupby(key).count()`` shuffle is not worth it (distinct urls / domains /
shingles per snapshot). The reference engine has no aggregate beyond
termstats (SURVEY.md §2) — extension, same bounded-fold family as
ops/quantiles.py (histograms) and ops/dsir.py (count vectors).

Deterministic and SQL-replicable by construction:

* h = fmix32(Horner31(str(key))) — the repo's oracle-checkable hash family;
* register index j = h mod m (m = 2^p), remainder w = h >> p;
* rho = (32 - p) - floor(log2(w)) for w > 0 (leading-zero count + 1 in the
  (32-p)-bit remainder), rho = 33 - p for w = 0; M[j] = max rho;
* raw estimate E = alpha_m · m² / Σ_j 2^(-M[j]).  The Σ is computed as an
  INTEGER — Σ_j 2^(S - M[j]) with S = 33 - p — so it is EXACT and
  independent of summation order (float Σ 2^-M would differ between numpy
  and SQL in the last ulp); E is then a single float division.
* small-range (linear-counting) correction: E ≤ 2.5·m with empty registers
  → m·ln(m / zeros).  (The 32-bit large-range correction is omitted —
  documented; at E > 2^32/30 use p ≥ 16 or exact counting.)

100 TB shape: one streaming ``map_batches`` pass emits each batch's m-byte
register vector; the driver max-folds them (m bytes of state total, like
the quantiles histogram fold) — ZERO shuffle, no key strings move. Register
vectors merge associatively, so sketches from different runs/partitions can
be combined (``merge_registers``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.polyhash import fmix32_np, poly_hash_np


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _registers(keys, p: int) -> np.ndarray:
    """m-long int64 register vector (max rho per bucket) for one key batch."""
    m = 1 << p
    h = fmix32_np(poly_hash_np([str(x) for x in keys], bits=32))
    j = (h % np.uint64(m)).astype(np.int64)
    w = (h >> np.uint64(p)).astype(np.int64)
    # exact floor(log2(w)) + 1 via frexp's exponent (ints < 2^53 are exact)
    bitlen = np.frexp(w.astype(np.float64))[1]
    rho = np.where(w > 0, (32 - p) - (bitlen - 1), 33 - p).astype(np.int64)
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, j, rho)
    return regs


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Associative sketch merge (element-wise max)."""
    return np.maximum(a, b)


def _estimate(regs: np.ndarray, p: int) -> dict:
    m = 1 << p
    scale = 33 - p                                  # max possible register
    s_int = int(np.left_shift(np.int64(1), scale - regs).sum())
    raw = _alpha(m) * m * m * float(1 << scale) / float(s_int)
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)               # linear counting
        branch = "linear"
    else:
        est = raw
        branch = "hll"
    return {"estimate": est, "raw": raw, "zeros": zeros, "m": m,
            "branch": branch}


def hll_distinct(ds, key_col: str, p: int = 12) -> dict:
    """Approximate distinct count of ``ds[key_col]`` (module docstring).

    Returns {estimate, raw, zeros, m, branch}; relative error ~1.04/sqrt(m).
    """
    if not 4 <= p <= 20:
        raise ValueError("need 4 <= p <= 20")
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].cast(pa.string()).to_pylist()
        return pa.table({"regs": pa.array([_registers(keys, p)],
                                          pa.list_(pa.int64(), m))})

    regs = np.zeros(m, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for row in b["regs"].to_pylist():
            regs = merge_registers(regs, np.asarray(row, dtype=np.int64))
    return _estimate(regs, p)


def hll_by_key(ds, key_col: str, group_col: str, p: int = 8,
               num_buckets: int = 64):
    """Approximate distinct ``key_col`` PER ``group_col`` value (distinct
    urls per domain, distinct tokens per language, ...). Returns a Dataset
    of (group, estimate, raw, zeros, m, branch) rows, one per group.

    100 TB shape: the per-batch combiner emits ONE packed register vector
    per (group, batch) — m bytes (int8 registers: rho ≤ 33-p < 128), never
    key strings — and one hash-bucketed exchange groups them; the max-fold
    and estimate run vectorized per bucket. Default p=8 keeps a partial at
    256 bytes/group/batch; groups per bucket only need Σ m bytes of heap.
    """
    import ray.data

    if not 4 <= p <= 20:
        raise ValueError("need 4 <= p <= 20")
    m = 1 << p
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].cast(pa.string()).to_pylist()
        grps = batch[group_col].cast(pa.string()).to_pylist()
        order = np.argsort(np.asarray(grps, object), kind="stable")
        gs = np.asarray(grps, object)[order]
        ks = np.asarray(keys, object)[order]
        out_g, out_r = [], []
        i = 0
        while i < len(gs):
            j = i
            while j < len(gs) and gs[j] == gs[i]:
                j += 1
            out_g.append(gs[i])
            out_r.append(_registers(list(ks[i:j]), p).astype(np.int8).tobytes())
            i = j
        gh = fmix32_np(poly_hash_np([str(g) for g in out_g], bits=32))
        return pa.table({
            "group": pa.array(out_g, pa.string()),
            "regs": pa.array(out_r, pa.binary(m)),
            "gb": pa.array((gh % np.uint64(nb)).astype(np.int32)),
        })

    def fold(group_tbl: pa.Table) -> pa.Table:
        g = np.asarray(group_tbl["group"].to_pylist(), object)
        packed = np.frombuffer(
            b"".join(group_tbl["regs"].to_pylist()), np.int8).reshape(-1, m)
        order = np.argsort(g, kind="stable")
        g, packed = g[order], packed[order]
        first = np.ones(g.size, bool)
        first[1:] = g[1:] != g[:-1]
        gid = np.cumsum(first) - 1
        merged = np.zeros((int(gid[-1]) + 1, m), np.int64)
        np.maximum.at(merged, gid, packed.astype(np.int64))
        rows = [_estimate(merged[k], p) for k in range(merged.shape[0])]
        ug = g[first]
        return pa.table({
            "group": pa.array(list(ug), pa.string()),
            "estimate": pa.array([r["estimate"] for r in rows], pa.float64()),
            "raw": pa.array([r["raw"] for r in rows], pa.float64()),
            "zeros": pa.array([r["zeros"] for r in rows], pa.int64()),
            "m": pa.array([r["m"] for r in rows], pa.int64()),
            "branch": pa.array([r["branch"] for r in rows], pa.string()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gb").map_groups(fold, batch_format="pyarrow")
