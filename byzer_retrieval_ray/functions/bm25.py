"""Okapi BM25 scoring kernels, faithful to Lucene 9's ``BM25Similarity`` defaults.

The reference never overrides Lucene's similarity (repo-wide grep, SURVEY.md §6), so
its scores are Lucene BM25 with k1=1.2, b=0.75:

    idf       = ln(1 + (N - df + 0.5) / (df + 0.5))
    avgdl     = sumTotalTermFreq / docCount
    dl        = byte4-quantized analyzed-field length (smallfloat.LENGTH_TABLE)
    weight    = boost * idf * (k1 + 1)
    normInv   = 1 / (k1 * ((1 - b) + b * dl / avgdl))       (256-entry cache)
    score     = weight - weight / (1 + tf * normInv)

Two precision modes:
- ``float32`` mirrors Lucene's float arithmetic step-for-step (cache and weight held
  as float32) — used by the engine's serving path and the Lucene-parity tests.
- ``float64`` runs the identical formula in doubles — used for the DuckDB oracle
  comparison where the SQL side also computes in doubles.

Vectorized throughout (numpy); no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np

from byzer_retrieval_ray.functions.smallfloat import LENGTH_TABLE

K1 = 1.2
B = 0.75


def idf(n_docs: int, df, dtype=np.float32):
    """Lucene idfExplain: ln(1 + (N - df + 0.5)/(df + 0.5)). df may be an array."""
    df = np.asarray(df, dtype=np.float64)
    out = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return out.astype(dtype)


def avg_field_length(sum_total_term_freq: int, doc_count: int, dtype=np.float32):
    if doc_count <= 0:
        return dtype(1.0)
    return dtype(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avgdl, k1: float = K1, b: float = B, dtype=np.float32) -> np.ndarray:
    """cache[norm_byte] = 1 / (k1 * ((1-b) + b * LENGTH_TABLE[byte] / avgdl))."""
    table = LENGTH_TABLE.astype(dtype)
    one = dtype(1.0)
    return (one / (dtype(k1) * ((one - dtype(b)) + dtype(b) * table / dtype(avgdl)))).astype(dtype)


def score_tf_norm(tf: np.ndarray, norm_bytes: np.ndarray, cache: np.ndarray,
                  weight, dtype=np.float32) -> np.ndarray:
    """score = weight - weight / (1 + tf * cache[norm_byte]) for posting vectors."""
    tf = np.asarray(tf, dtype=dtype)
    norm_inv = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    w = dtype(weight)
    return (w - w / (dtype(1.0) + tf * norm_inv)).astype(dtype)


def term_weight(n_docs: int, df: int, boost: float = 1.0,
                k1: float = K1, dtype=np.float32):
    """weight = boost * idf * (k1 + 1) (Lucene BM25Scorer constructor)."""
    return dtype(dtype(boost) * idf(n_docs, df, dtype=dtype) * dtype(k1 + 1.0))


def max_block_score_bound(max_tf: np.ndarray, min_norm_byte: np.ndarray,
                          cache: np.ndarray, weight, dtype=np.float32) -> np.ndarray:
    """Upper bound of the per-doc score within a posting block.

    score(tf, dl) is increasing in tf and decreasing in dl, so
    score(max_tf_in_block, min_dl_in_block) bounds every doc in the block. Storing
    (max_tf, min_norm_byte) per block at build time keeps the bound independent of the
    collection stats, which are only final after the global aggregate.
    """
    return score_tf_norm(max_tf, min_norm_byte, cache, weight, dtype=dtype)
