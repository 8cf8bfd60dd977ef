"""Stratified (per-group quota) sampling: keep exactly min(n, |group|) rows
per group, chosen deterministically — the training-data mixing primitive
("20k docs per language/domain") that plain Bernoulli sampling can't give.

Selection order is (hash(key), key) ascending with the same Horner·Knuth hash
`hash_sample` uses (functions/polyhash.py — SQL-replicable, so the exact
selected id set has a DuckDB ROW_NUMBER oracle), making the result partition-,
rerun- and execution-order-invariant, and MONOTONE in n (the n=10 sample is a
prefix of the n=20 sample — quotas can be raised without resampling churn).

Scale shape: the combiner pattern. Each batch pre-selects its ≤ n smallest
(hash, key) rows per group (one lexsort per batch), so the single groupby
moves at most n · num_batches rows per group — never the corpus; the final
per-group selection is a tiny map_groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.polyhash import poly_hash_np

_MULT = np.uint64(2654435761)
_MASK = np.uint64(0xFFFFFFFF)


def _sel_hash(keys) -> np.ndarray:
    return (poly_hash_np([str(k) for k in keys], bits=32) * _MULT) & _MASK


def _take_n_per_group(batch: pa.Table, group_col: str, key_col: str,
                      n: int) -> pa.Table:
    if len(batch) == 0:
        return batch
    h = batch["_strat_h"].to_numpy() if "_strat_h" in batch.column_names \
        else _sel_hash(batch[key_col].to_pylist())
    if "_strat_h" not in batch.column_names:
        batch = batch.append_column("_strat_h", pa.array(h, pa.uint64()))
    # factorize group/key to int codes (np.unique is sorted, so codes preserve
    # the value order — lexsort can't take object/string arrays directly)
    g = np.unique(batch[group_col].to_numpy(zero_copy_only=False),
                  return_inverse=True)[1]
    k = np.unique(batch[key_col].to_numpy(zero_copy_only=False),
                  return_inverse=True)[1]
    # one lexsort: (group, hash, key); rank-within-group via run boundaries
    order = np.lexsort((k, h, g))
    gs = g[order]
    new_grp = np.concatenate([[True], gs[1:] != gs[:-1]])
    run_start = np.flatnonzero(new_grp)
    rank = np.arange(len(gs)) - np.repeat(run_start, np.diff(
        np.concatenate([run_start, [len(gs)]])))
    return batch.take(pa.array(np.sort(order[rank < n]), pa.int64()))


def stratified_sample(ds, group_col: str, n_per_group: int,
                      key_col: str = "doc_id", drop_hash: bool = True):
    """min(n, |group|) rows per group, deterministic by (hash(key), key)."""

    def combine(batch: pa.Table) -> pa.Table:
        return _take_n_per_group(batch, group_col, key_col, n_per_group)

    def finish(group: pa.Table) -> pa.Table:
        out = _take_n_per_group(group, group_col, key_col, n_per_group)
        return out.drop_columns(["_strat_h"]) if drop_hash else out

    pre = ds.map_batches(combine, batch_format="pyarrow")
    return pre.groupby(group_col).map_groups(finish, batch_format="pyarrow")
