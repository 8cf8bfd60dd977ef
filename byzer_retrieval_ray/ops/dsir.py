"""DSIR-style data selection via hashed-n-gram importance weights.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") selects pretraining documents whose hashed-n-gram feature
distribution looks like a small TARGET corpus rather than the RAW crawl:
fit two bag-of-hashed-n-grams multinomials, score every raw document by the
log importance ratio of its features, keep the head. The reference engine
has no model-based selection operator (SURVEY.md §2) — extension.

Features are word unigrams + bigrams hashed into ``num_buckets`` buckets
with the repo's SQL-replicable poly hashes (functions/polyhash.py — token
Horner(31) mod 2^32, bigram Horner(1000003) fold; docs with a single token
contribute their token hash as the one "bigram", mirroring
ops/dedup._poly_shingle_hashes and the ``_sql_shingles`` oracle CTE).
With additive smoothing ``a`` over B buckets, a document with feature
multiset F gets

    logw(doc) = Σ_{f∈F} [ ln(c_t[f] + a) − ln(T + a·B)
                        − ln(c_r[f] + a) + ln(R + a·B) ]

where ``c_t``/``c_r`` are target/raw bucket counts and T/R their totals —
every term exactly reproducible in SQL (the gate value-checks logw).

100 TB shape — both halves are exchange-free or zero-shuffle:

* ``fit_hashed_ngram_dist`` — one streaming ``map_batches`` pass emits a
  per-batch B-long int64 count vector (B=4096 → 32 KB/batch); the driver
  folds them (the ops/quantiles.py counts pattern). No shuffle, no token
  ever leaves its batch.
* ``dsir_log_weights`` — actor-pool scoring stage: the B-long float64
  log-ratio vector ships via ``ray.put`` once and is fetched once per actor
  in the constructor; per batch everything is bincount/searchsorted-free
  fancy indexing + ``np.add.reduceat`` per-doc folds. Zero shuffle.
* ``dsir_select`` — global keep-fraction threshold found with
  ops/quantiles.exact_quantiles (exchange-free counting passes), then one
  streaming filter. Ties AT the threshold are kept (documented; determinism
  over "exactly n" — a tie-exact top-n would need to move tied ids).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.ops.dedup import _poly_shingle_hashes


@dataclass
class HashedNgramDist:
    """Bucket counts of hashed unigram+bigram features over a corpus."""

    counts: np.ndarray  # (num_buckets,) int64
    total: int
    num_buckets: int


def _feature_buckets(texts: np.ndarray, num_buckets: int) \
        -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat bucket ids, per-doc unigram offsets, per-doc bigram offsets)."""
    uni, uoffs = _poly_shingle_hashes(texts, 1)
    big, boffs = _poly_shingle_hashes(texts, 2)
    nb = np.uint64(num_buckets)
    return (np.concatenate([uni % nb, big % nb]).astype(np.int64),
            uoffs, boffs)


def fit_hashed_ngram_dist(ds, text_col: str,
                          num_buckets: int = 4096) -> HashedNgramDist:
    """Count hashed unigram+bigram features over ``ds[text_col]``.

    Exchange-free: each batch emits one B-long count vector; the driver
    folds ~8·B bytes per batch and nothing else moves.
    """
    idx = np.arange(num_buckets, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        f, _, _ = _feature_buckets(texts, num_buckets)
        c = np.bincount(f, minlength=num_buckets)
        return pa.table({"i": pa.array(idx, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    total = np.zeros(num_buckets, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        np.add.at(total, b["i"].to_numpy(), b["c"].to_numpy())
    return HashedNgramDist(counts=total, total=int(total.sum()),
                           num_buckets=num_buckets)


def log_ratio_vector(target: HashedNgramDist, raw: HashedNgramDist,
                     alpha: float = 0.5) -> np.ndarray:
    """Per-bucket ln p_target − ln p_raw under additive smoothing ``alpha``.

    The normalizer constants are folded into each bucket's value so a
    per-doc sum over features equals the per-term SQL sum exactly (up to
    float addition order, absorbed by the gate's ROUND 4).
    """
    if target.num_buckets != raw.num_buckets:
        raise ValueError("target and raw distributions use different "
                         f"num_buckets ({target.num_buckets} vs "
                         f"{raw.num_buckets})")
    a = float(alpha)
    bb = a * target.num_buckets
    const = math.log(raw.total + bb) - math.log(target.total + bb)
    return (np.log(target.counts + a) - np.log(raw.counts + a)) + const


class DsirScorer:
    """Actor-pool stage: per-doc log importance weight over hashed features.

    Emits (id, n_features, logw); documents with zero tokens have no
    features and are dropped (mirrored in the SQL oracle).
    """

    def __init__(self, logratio_ref, text_col: str, id_col: str):
        if isinstance(logratio_ref, np.ndarray):
            self.lr = logratio_ref
        else:
            import ray
            self.lr = ray.get(logratio_ref)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        nb = self.lr.size
        f, uoffs, boffs = _feature_buckets(texts, nb)
        n_docs = len(texts)
        id_type = batch[self.id_col].type
        if f.size == 0:
            return pa.table({"id": pa.array([], id_type),
                             "n_features": pa.array([], pa.int64()),
                             "logw": pa.array([], pa.float64())})
        vals = self.lr[f]
        n_uni = np.diff(uoffs)
        n_big = np.diff(boffs)
        # unigram values occupy vals[:U], bigram values vals[U:] — fold each
        # half per doc with reduceat (empty segments yield 0 via the mask)
        u_total = int(uoffs[-1])
        sums = np.zeros(n_docs, dtype=np.float64)
        for seg_vals, offs, n_seg in (
                (vals[:u_total], uoffs, n_uni),
                (vals[u_total:], boffs, n_big)):
            nz = np.flatnonzero(n_seg)
            if nz.size and seg_vals.size:
                s = np.add.reduceat(seg_vals, offs[nz])
                sums[nz] += s
        keep = (n_uni + n_big) > 0
        ids = batch[self.id_col].filter(pa.array(keep))
        return pa.table({
            "id": ids,
            "n_features": pa.array((n_uni + n_big)[keep], pa.int64()),
            "logw": pa.array(sums[keep], pa.float64()),
        })


def dsir_log_weights(ds, target: HashedNgramDist, raw: HashedNgramDist,
                     text_col: str, id_col: str, alpha: float = 0.5,
                     concurrency: int = 2):
    """Score every document of ``ds``: (id, n_features, logw). Streaming;
    the B-long log-ratio vector ships via the object store once per actor."""
    import ray
    ref = ray.put(log_ratio_vector(target, raw, alpha))
    return ds.map_batches(
        DsirScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"logratio_ref": ref, "text_col": text_col,
                               "id_col": id_col})


def dsir_select(ds, target: HashedNgramDist, raw: HashedNgramDist,
                text_col: str, id_col: str, keep_frac: float,
                alpha: float = 0.5, concurrency: int = 2):
    """Keep the ``keep_frac`` head of ``ds`` by log importance weight.

    The cut point is the exact (1−keep_frac) quantile of logw
    (ops/quantiles.py — exchange-free counting passes); every doc with
    logw >= threshold is kept, so float-tied weights at the boundary are
    all kept rather than split nondeterministically. Returns the filtered
    weights Dataset (id, n_features, logw).
    """
    from byzer_retrieval_ray.ops.quantiles import exact_quantiles

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    w = dsir_log_weights(ds, target, raw, text_col, id_col, alpha,
                         concurrency)
    if keep_frac == 1.0:
        return w
    q = 1.0 - keep_frac
    thr = exact_quantiles(w, "logw", [q])[q]

    def keep(batch: pa.Table) -> pa.Table:
        lw = batch["logw"].to_numpy()
        return batch.filter(pa.array(lw >= thr))

    return w.map_batches(keep, batch_format="pyarrow")
