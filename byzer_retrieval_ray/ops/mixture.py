"""Domain-mixture resampling — the pretraining data-recipe primitive.

Public LLM data recipes (GPT-3 Table 2.2, LLaMA Table 1, The Pile) assign
each source/domain a SAMPLING WEIGHT: Wikipedia might be seen ~3 epochs per
training run while Common Crawl is sub-sampled to ~0.4. This operator turns
a cleaned corpus plus a ``{domain: weight}`` table into the materialized
mixture: every row is emitted ``k`` times where

    k = floor(w) + Bernoulli(frac(w))            (w = weight of its domain)

so ``w = 2.5`` emits every row twice and half the rows a third time, and
``w = 0.25`` keeps a quarter of the rows. The Bernoulli draw is a
DETERMINISTIC hash coin, not an RNG: ``u = fmix32(Horner31(str(id)))`` and
the row wins iff ``u < floor(frac(w) · 2^32)`` (functions/polyhash.py
arithmetic — SQL-replicable, so the gate value-checks every emitted copy;
fmix32 avalanches the sequential-id correlation in the raw Horner hash).
Each emitted copy carries an ``epoch`` column (0..k-1) so downstream
shuffles (ops/export.py keyed on (id, epoch)) spread repeats across shards.

The reference engine has no corpus operations (SURVEY.md §2) — extension,
same family as ops/stratified.py / ops/dsir.py (which select; this one
REPLICATES, the part a selector cannot express).

100 TB shape: a single stateless streaming ``map_batches`` flat-map — the
weight table is a tiny plain dict captured in the closure (broadcast with
the function, never shipped per batch), the coin and the repeat are
vectorized (``np.repeat`` on the batch indices), zero shuffle, zero driver
state. Partition- and batch-boundary-invariant by construction (the coin
depends only on the row's own id). Deliberate row multiplication: output
bytes ≈ sum(w_d · bytes_d) — the caller's recipe, not an engine artifact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.polyhash import fmix32_np, poly_hash_np

_TWO32 = float(2 ** 32)


def _copies(batch: pa.Table, domain_col: str, key_col: str,
            weights: dict[str, float], default_weight: float) -> np.ndarray:
    """k (int64 emit count) per row of ``batch``."""
    doms = batch[domain_col].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(doms, return_inverse=True)
    w_uniq = np.array([float(weights.get(d, default_weight)) for d in uniq],
                      dtype=np.float64)
    w = w_uniq[inv]
    if (w < 0).any():
        raise ValueError("mixture weights must be >= 0")
    base = np.floor(w)
    frac = w - base
    ids = batch[key_col].to_numpy(zero_copy_only=False)
    u = fmix32_np(poly_hash_np([str(x) for x in ids], bits=32))
    thr = np.floor(frac * _TWO32).astype(np.uint64)
    return (base.astype(np.int64) + (u < thr).astype(np.int64))


def mixture_resample(ds, domain_col: str, weights: dict[str, float],
                     key_col: str, default_weight: float = 1.0,
                     epoch_col: str = "epoch"):
    """Materialize a domain-weighted mixture of ``ds`` (see module docstring).

    Rows whose domain weight rounds them to k=0 are dropped; every other row
    appears k times with ``epoch_col`` = 0..k-1 appended.
    """
    wts = dict(weights)

    def f(batch: pa.Table) -> pa.Table:
        k = _copies(batch, domain_col, key_col, wts, default_weight)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), k)
        out = batch.take(pa.array(idx))
        starts = np.repeat(np.cumsum(k) - k, k)
        epoch = np.arange(len(idx), dtype=np.int64) - starts
        return out.append_column(epoch_col, pa.array(epoch, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def mixture_plan(ds, domain_col: str, weights: dict[str, float],
                 key_col: str, default_weight: float = 1.0):
    """Dry-run accounting: per-domain input rows, emitted rows and realized
    weight (emitted/input) without materializing the mixture — one streaming
    pass emitting per-batch partial (domain, n_in, n_out) rows plus a tiny
    final groupby."""
    wts = dict(weights)

    def partial(batch: pa.Table) -> pa.Table:
        k = _copies(batch, domain_col, key_col, wts, default_weight)
        doms = batch[domain_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doms, return_inverse=True)
        n_in = np.bincount(inv)
        n_out = np.bincount(inv, weights=k.astype(np.float64))
        return pa.table({
            "domain": pa.array(uniq, pa.string()),
            "n_in": pa.array(n_in, pa.int64()),
            "n_out": pa.array(n_out.astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("domain")
             .sum(["n_in", "n_out"]))
    t = agg.to_arrow_refs()
    import ray as _ray
    tabs = [x for x in _ray.get(t) if x.num_rows]
    out = pa.concat_tables(tabs).rename_columns(["domain", "n_in", "n_out"])
    realized = out["n_out"].to_numpy().astype(np.float64) / np.maximum(
        out["n_in"].to_numpy(), 1)
    return out.append_column("realized_weight",
                             pa.array(np.round(realized, 4), pa.float64()))
