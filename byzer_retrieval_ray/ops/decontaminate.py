"""Benchmark decontamination: flag corpus documents that share a word n-gram
with a (small) evaluation/benchmark set.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM-style 8- to
13-gram overlap): any document containing an n-gram that also appears in a
held-out benchmark is contaminated and must be dropped or split. The reference
has no such operator; at 100 TB it is a core pipeline stage.

Scale shape: the benchmark side is SMALL by definition (eval sets are a few
MB), so this is a broadcast semi-join — the sorted benchmark n-gram hash array
is put in the object store ONCE (`ray.put`) and fetched ONCE PER ACTOR in the
stage constructor, never re-shipped per batch. Each batch computes its
documents' n-gram hashes with the same vectorized Horner fold the dedup family
uses (`_poly_shingle_hashes` — no per-row Python) and counts membership via
`np.searchsorted` against the broadcast array: O(G log B) per batch, zero
shuffle, zero driver state. The poly hash family is SQL-replicable
(functions/polyhash.py), which makes the gate entry value-checkable in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.ops.dedup import _poly_shingle_hashes


def benchmark_ngram_hashes(texts, k: int = 8) -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark texts (driver-side; the
    benchmark is small). Same tokenization + fold as the document side."""
    arr = np.asarray(list(texts), dtype=object)
    flat, _ = _poly_shingle_hashes(arr, k)
    return np.unique(flat)  # sorted


def _membership_counts(texts: np.ndarray, bench_sorted: np.ndarray,
                       k: int) -> np.ndarray:
    """Per-doc count (with multiplicity) of n-grams whose hash is in the set."""
    flat, offs = _poly_shingle_hashes(texts, k)
    if flat.size == 0:
        return np.zeros(len(texts), dtype=np.int64)
    loc = np.searchsorted(bench_sorted, flat)
    ok = loc < bench_sorted.size
    ok[ok] = bench_sorted[loc[ok]] == flat[ok]
    parents = np.repeat(np.arange(len(texts)), np.diff(offs))
    return np.bincount(parents[ok], minlength=len(texts)).astype(np.int64)


class ContaminationCheck:
    """Actor-pool stage: fetches the broadcast benchmark hash array once per
    actor (constructor), appends ``n_contaminated_ngrams`` and ``contaminated``
    per batch."""

    def __init__(self, bench_ref, text_col: str = "text", k: int = 8):
        import ray
        self.bench = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) \
            else bench_ref
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        hits = _membership_counts(texts, self.bench, self.k)
        return (batch
                .append_column("n_contaminated_ngrams", pa.array(hits, pa.int64()))
                .append_column("contaminated", pa.array(hits > 0)))


def decontaminate(ds, benchmark_texts, text_col: str = "text", k: int = 8,
                  concurrency: int = 2, keep_flagged: bool = True):
    """Flag (keep_flagged) or drop (not keep_flagged) documents sharing any
    word ``k``-gram with ``benchmark_texts``. Returns a streaming Dataset.
    (An actor-pool stage always needs a concurrency; size it to the cluster.)"""
    import ray
    bench_ref = ray.put(benchmark_ngram_hashes(benchmark_texts, k))
    out = ds.map_batches(
        ContaminationCheck, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"bench_ref": bench_ref, "text_col": text_col,
                               "k": k})
    if not keep_flagged:
        import pyarrow.compute as pc
        out = out.map_batches(
            lambda b: b.filter(pc.invert(b["contaminated"])).drop_columns(
                ["n_contaminated_ngrams", "contaminated"]),
            batch_format="pyarrow")
    return out
