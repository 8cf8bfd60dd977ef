"""Repetition / self-similarity quality metrics (Gopher-rule family).

Per document: the fraction of duplicated tokens, the share of the single most
frequent token, and the share of the single most frequent word bigram —
the standard screens for boilerplate, keyword-stuffed and generator-looped web
text (Rae et al. 2021 "Gopher" §A1.1 repetition filters; the reference engine
has no quality operators at all).

Scale shape: a stateless vectorized ``map_batches`` stage. Tokens are exploded
once per batch with the Arrow whitespace kernel, identified by 32-bit poly
hashes (functions/polyhash.py — SQL-replicable, so the gate oracle computes
the *same* hash values; a 2^-32 hash collision would merely perturb a quality
score, and the oracle would perturb identically). Per-doc distinct/max-count
reductions are one lexsort + run-length pass over the whole batch — no per-row
Python, no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.polyhash import poly_hash_np
from byzer_retrieval_ray.ops.dedup import _poly_shingle_hashes

_SHIFT = np.uint64(32)


def _per_doc_distinct_and_max(keys32: np.ndarray, parents: np.ndarray,
                              n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """(distinct values per doc, max multiplicity per doc) for uint64 values
    < 2^32 grouped by parent doc index — one sort over the batch."""
    if keys32.size == 0:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, z.copy()
    combo = (parents.astype(np.uint64) << _SHIFT) | keys32
    combo.sort()
    starts = np.concatenate([[0], np.flatnonzero(np.diff(combo)) + 1])
    run_len = np.diff(np.concatenate([starts, [combo.size]]))
    run_parent = (combo[starts] >> _SHIFT).astype(np.int64)
    distinct = np.bincount(run_parent, minlength=n_docs).astype(np.int64)
    mx = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(mx, run_parent, run_len)
    return distinct, mx


def add_repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append float64 columns ``frac_dup_tokens``, ``top_token_share``,
    ``top_bigram_share`` (all 0.0 for empty docs)."""
    from byzer_retrieval_ray.ops.text import _explode_tokens
    col = batch[text_col]
    texts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(texts)
    flat, parents, n_tok = _explode_tokens(texts)
    th = poly_hash_np(flat.to_pylist(), bits=32)
    distinct, top_tok = _per_doc_distinct_and_max(th, parents, n)

    texts_np = texts.to_numpy(zero_copy_only=False)
    bi, bi_offs = _poly_shingle_hashes(texts_np, 2)
    n_bi = np.diff(bi_offs)
    bi_parents = np.repeat(np.arange(n, dtype=np.int64), n_bi)
    _, top_bi = _per_doc_distinct_and_max(bi, bi_parents, n)

    with np.errstate(divide="ignore", invalid="ignore"):
        frac_dup = np.where(n_tok > 0, 1.0 - distinct / n_tok, 0.0)
        tok_share = np.where(n_tok > 0, top_tok / n_tok, 0.0)
        bi_share = np.where(n_bi > 0, top_bi / n_bi, 0.0)
    return (batch
            .append_column("frac_dup_tokens", pa.array(frac_dup, pa.float64()))
            .append_column("top_token_share", pa.array(tok_share, pa.float64()))
            .append_column("top_bigram_share", pa.array(bi_share, pa.float64())))


class RepetitionStats:
    """Actor-pool form for symmetry with the other text stages."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return add_repetition_stats(batch, self.text_col)


def filter_repetitive(ds, text_col: str = "text",
                      max_frac_dup_tokens: float = 0.3,
                      max_top_bigram_share: float = 0.18):
    """Gopher-style screen: drop documents above the repetition thresholds
    (defaults are the published Gopher bigram/duplicate cut-offs)."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        b = add_repetition_stats(batch, text_col)
        m = pc.and_(pc.less_equal(b["frac_dup_tokens"], max_frac_dup_tokens),
                    pc.less_equal(b["top_bigram_share"], max_top_bigram_share))
        return batch.filter(m)

    return ds.map_batches(keep, batch_format="pyarrow")
