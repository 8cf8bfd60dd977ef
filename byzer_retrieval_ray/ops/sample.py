"""Deterministic sampling and corpus-level n-gram statistics.

Both are Ray-Data-first and oracle-checkable:

* ``hash_sample`` keeps a row iff Horner-hash(key) mod M < rate·M — a
  deterministic, partition-invariant Bernoulli sample (the training-data way to
  subsample reproducibly: re-running, resharding or resuming yields the SAME
  sample, unlike random_sample). The poly hash (functions/polyhash.py) is
  SQL-replicable, so the exact sampled id set has a DuckDB oracle.

* ``top_ngrams`` counts word n-grams corpus-wide with the combiner pattern: each
  batch pre-aggregates its n-gram counts (map_batches), ONE hash-bucket groupby
  moves (ngram, partial_count) rows — never token streams — and per-bucket
  vectorized sums + a driver top-k merge finish the job.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.polyhash import poly_hash_np

_MOD = np.uint64(1 << 32)


def hash_sample(ds, key_col: str, rate: float):
    """Deterministic keep-iff-hash(key) < rate sample over a string or int key.

    hash = (Horner(31)(str(key)) · 2654435761) mod 2^32 — the Knuth
    multiplicative finalizer scatters short keys (a bare Horner hash of "0".."99"
    stays tiny and would land every short key under the threshold); keep iff
    hash < rate · 2^32. Partition- and execution-order-invariant; the same key
    always makes the same decision (so derived tables stay aligned across
    pipelines).
    """
    thr = np.uint64(int(rate * float(_MOD)))
    mult = np.uint64(2654435761)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].cast(pa.string()).to_pylist()
        h = (poly_hash_np(keys, bits=32) * mult) & np.uint64(0xFFFFFFFF)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def top_ngrams(ds, text_col: str, n: int = 2, k: int = 20, num_buckets: int = 64):
    """Top-k word n-grams by corpus frequency.

    map_batches combiner: tokenize (Arrow), build n-grams via shifted views,
    partial-count per batch with Arrow group_by; shuffle carries (ngram, count,
    bucket) partials only; per-bucket vectorized sum; driver merges bucket
    top-k candidates (each bucket owns its ngrams exclusively, so taking k per
    bucket then k overall is exact). Returns a pandas DataFrame
    (ngram, count) ranked by (count desc, ngram asc).
    """

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        col = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        toks = pc.utf8_split_whitespace(col)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        words = pc.filter(flat, mask).to_numpy(zero_copy_only=False)
        par = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
        total = words.size
        if total < n:
            return pa.table({"ngram": pa.array([], pa.large_string()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        # valid gram start positions: all n tokens inside the same doc
        valid = np.ones(total - n + 1, dtype=bool)
        for j in range(1, n):
            valid &= par[j:total - n + 1 + j] == par[: total - n + 1]
        starts = np.flatnonzero(valid)
        if starts.size == 0:
            return pa.table({"ngram": pa.array([], pa.large_string()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        grams = words[starts].astype(object)
        for j in range(1, n):
            grams = grams + " " + words[starts + j].astype(object)
        t = pa.table({"ngram": pa.array(grams, pa.large_string())})
        agg = t.group_by("ngram").aggregate([("ngram", "count")])
        names = agg["ngram"]
        h = poly_hash_np(names.to_pylist(), bits=32)
        return pa.table({
            "ngram": names,
            "cnt": agg["ngram_count"].cast(pa.int64()),
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    def bucket_topk(group: pa.Table) -> pa.Table:
        agg = group.group_by("ngram").aggregate([("cnt", "sum")])
        agg = agg.rename_columns(["ngram", "count"])
        agg = agg.sort_by([("count", "descending"), ("ngram", "ascending")])
        return agg.slice(0, k)

    cand = ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("__b").map_groups(bucket_topk, batch_format="pyarrow") \
             .to_pandas()
    cand = cand.sort_values(["count", "ngram"], ascending=[False, True])
    return cand.head(k).reset_index(drop=True)
