"""SemDeDup-style semantic deduplication over an embedding column.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") removes SEMANTIC duplicates —
re-encodings, templated rewrites, translations-of-boilerplate — that no
lexical dedup (exact / MinHash / n-gram) can see: k-means-cluster the
embedding space, then compare pairs only WITHIN a cluster and drop one of
every pair whose cosine exceeds the threshold. The reference engine has no
model-space dedup (SURVEY.md §2) — extension.

Deviation from the paper, documented: the paper keeps the example with the
LOWEST similarity to the cluster centroid in each duplicate group; this op
keeps the LOWEST id (the repo-wide dedup convention — deterministic under
any partitioning, and the keeper choice is a policy, not a correctness,
decision). ``dup_of`` is the earlier-id member with the highest cosine.

100 TB shape (the whole point of the clustering — pairwise cosine over the
corpus is O(n²), within clusters it is Σ|c|²):

* centroids come from the ops/ann.py codebook machinery (hash-spread
  sample + distributed k-means refinement) or are supplied explicitly —
  either way a (k × d) array broadcast once per actor via ``ray.put``;
* assignment is a streaming actor-pool pass (normalize + one matmul per
  batch, argmax ties to the lowest centroid index);
* the only shuffle carries (id, cluster, f32 embedding) rows keyed by
  cluster — one row per vector, no pair ever moves;
* per-cluster resolution sorts by id and compares each vector against the
  earlier members (one matmul per cluster). Partitioning assumption: a
  CLUSTER must fit a worker's heap — size ``num_clusters`` ≥ n·d·4 /
  worker_heap, and raise it for skewed spaces (documented in SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, flat.size // n) if n else flat.reshape(0, 0)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _Assign:
    """Actor-pool stage: cluster = argmax cosine(vec, centroid)."""

    def __init__(self, cent_ref, emb_col: str, id_col: str, num_buckets: int):
        if isinstance(cent_ref, np.ndarray):
            cent = cent_ref
        else:
            import ray
            cent = ray.get(cent_ref)
        self.cnorm = _normalize(np.asarray(cent, dtype=np.float64)).T
        self.emb_col = emb_col
        self.id_col = id_col
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.emb_col]
        mat = _normalize(_as_matrix(col))
        cluster = np.argmax(mat @ self.cnorm, axis=1).astype(np.int32)
        return pa.table({
            "id": batch[self.id_col],
            "cluster": pa.array(cluster),
            "emb": (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                    else col).cast(pa.list_(pa.float32())),
            "__b": pa.array(cluster % np.int32(self.num_buckets)),
        })


def _resolve(threshold: float):
    def f(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        ids_out, clusters_out, dups_out, dup_valid = [], [], [], []
        for cl, g in df.groupby("cluster"):
            g = g.sort_values("id")
            ids = g["id"].to_numpy()
            n = len(ids)
            mat = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in g["emb"]]))
            sim = mat @ mat.T
            # earlier-id candidates only: mask the diagonal and upper
            # triangle, then one argmax per row
            sim[np.triu_indices(n)] = -np.inf
            j = np.argmax(sim, axis=1)
            best = sim[np.arange(n), j]
            is_dup = best >= threshold
            ids_out.append(ids)
            clusters_out.append(np.full(n, cl, dtype=np.int64))
            dups_out.append(np.where(is_dup, ids[j], 0))
            dup_valid.append(is_dup)
        ids_all = np.concatenate(ids_out) if ids_out else np.array([], np.int64)
        dup_arr = pa.array(
            np.concatenate(dups_out) if dups_out else np.array([], np.int64),
            pa.int64(),
            mask=~(np.concatenate(dup_valid) if dup_valid
                   else np.array([], bool)))
        return pa.table({
            "id": pa.array(ids_all, pa.int64()),
            "cluster": pa.array(np.concatenate(clusters_out) if clusters_out
                                else np.array([], np.int64), pa.int64()),
            "dup_of": dup_arr,
        })
    return f


def semantic_dedup(ds, emb_col: str, id_col: str, threshold: float = 0.95,
                   centroids: np.ndarray | None = None,
                   num_clusters: int = 256, sample_size: int = 65_536,
                   refine_iters: int = 1, num_buckets: int = 64,
                   concurrency: int = 2):
    """(id, cluster, dup_of) for every vector; ``dup_of`` is null for kept
    representatives. Pass ``centroids`` to pin the clustering (the gate
    does); otherwise a codebook is sampled and k-means-refined in-cluster
    (ops/ann.py)."""
    import ray

    if centroids is None:
        from byzer_retrieval_ray.ops.ann import (refine_codebook,
                                                 sample_vectors,
                                                 train_codebook)
        sample = sample_vectors(ds, emb_col, id_col, sample_size)
        centroids = train_codebook(sample, num_clusters)
        centroids = refine_codebook(ds, emb_col, centroids,
                                    iters=refine_iters)
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    nb = min(num_buckets, len(centroids)) or 1
    return ds.map_batches(
        _Assign, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"cent_ref": cent_ref, "emb_col": emb_col,
                               "id_col": id_col, "num_buckets": nb}) \
        .groupby("__b").map_groups(_resolve(threshold),
                                   batch_format="pyarrow")
