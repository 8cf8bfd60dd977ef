"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), every batch computes a vectorized matmul and emits only its local
  top-k candidates (the combiner), and the driver merges the tiny candidate set.
  This is the correctness baseline and is exactly what the oracle SQL computes.

* ``ivf_topk`` — the scale path: a coarse k-means codebook broadcast to all
  batches; each batch scores only rows whose centroid is among the query's
  ``nprobe`` nearest. Approximate (recall controlled by nprobe), same merge.
  Codebook sizing/training is built for 10^9-row columns: centroid count
  defaults to √n, the training sample is a deterministic hash-spread sample
  over the whole dataset (not the first blocks), and the sampled codebook is
  refined by ``refine_iters`` distributed k-means assignment passes (per-batch
  partial sums → tiny driver fold — the combiner shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, flat.size // n) if n else flat.reshape(0, 0)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(ds, emb_col: str, id_col: str, queries: np.ndarray, k: int):
    """Exact cosine top-k for each query row. Returns a pandas DataFrame
    (query_id, id, score) with score = cosine similarity, ranked per query by
    (score desc, id asc).

    The query matrix rides the object store once; each batch emits ≤ q×k candidate
    rows, so the driver-side merge is O(batches × q × k), independent of n.
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_to_matrix(batch[emb_col]))
        sims = mat @ q.T                       # (n, q)
        n = sims.shape[0]
        kk = min(k, n)
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if n > kk else np.arange(n)
            out_q.append(np.full(idx.size, qi, dtype=np.int32))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int32()),
            "id": pa.array(np.concatenate(out_id), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in cand.groupby("query_id"):
        g = g.sort_values(["score", "id"], ascending=[False, True]).head(k)
        out.append(g)
    import pandas as pd
    return pd.concat(out, ignore_index=True) if out else cand


def train_codebook(sample: np.ndarray, n_centroids: int, iters: int = 8,
                   seed: int = 3) -> np.ndarray:
    """Tiny k-means on a sample (driver-side numpy) → (c, d) codebook."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(sample.shape[0], size=min(n_centroids, sample.shape[0]),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def sample_vectors(ds, emb_col: str, id_col: str, sample_size: int) -> np.ndarray:
    """Deterministic hash-spread sample of ~``sample_size`` embedding rows.

    Selection is by Knuth-hash of the id column (the ops/sample.py scheme), so
    the sample covers the WHOLE dataset independent of block order — a
    ``ds.limit(n)`` sample sees only the first blocks and trains a codebook
    blind to the tail's clusters."""
    n = ds.count()
    if n <= sample_size:
        rows = ds.to_pandas()
        return np.stack([np.asarray(v, dtype=np.float64) for v in rows[emb_col]])
    # keep ids whose 32-bit Knuth hash falls under the sampling threshold
    thr = np.uint64(int(sample_size / n * (1 << 32)) + 1)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return batch.filter(pa.array(h < thr)).select([emb_col])

    rows = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    if not len(rows):
        rows = ds.limit(min(n, sample_size)).to_pandas()
    return np.stack([np.asarray(v, dtype=np.float64) for v in rows[emb_col]])


def refine_codebook(ds, emb_col: str, cent: np.ndarray, iters: int = 1):
    """Distributed k-means assignment passes: each batch emits per-centroid
    partial (sum, count); the driver folds the tiny (c × d) aggregates and
    recenters. One pass over 10^9 rows costs one map_batches sweep — the
    sampled codebook stops being blind to the sample's gaps."""
    import ray

    for _ in range(max(iters, 0)):
        cent_ref = ray.put(cent)
        c_n = cent.shape[0]

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            mat = _normalize(_to_matrix(batch[emb_col]))
            assign = np.argmax(mat @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0], dtype=np.int32)),
                "count": pa.array(counts, pa.int64()),
                "vsum": pa.array(sums.tolist(),
                                 pa.list_(pa.float64(), c.shape[1])),
            })

        agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cent)
        counts = np.zeros(c_n, dtype=np.int64)
        for cid, cnt, vs in zip(agg["cid"], agg["count"], agg["vsum"]):
            counts[cid] += cnt
            sums[cid] += np.asarray(vs, dtype=np.float64)
        live = counts > 0
        cent = cent.copy()
        cent[live] = sums[live] / counts[live, None]
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, emb_col: str, id_col: str, queries: np.ndarray, k: int,
             n_centroids: int | None = 16, nprobe: int = 4,
             sample_size: int | None = 2048, refine_iters: int = 0):
    """IVF-style approximate cosine top-k: probe only the nprobe nearest cells.

    ``n_centroids=None`` sizes the codebook √n (the 10^9-row default);
    ``sample_size=None`` scales the training sample to 64 rows per centroid;
    ``refine_iters`` adds distributed assignment passes after the driver-side
    k-means on the sample."""
    import ray

    if n_centroids is None:
        n_centroids = max(1, int(np.sqrt(ds.count())))
    if sample_size is None:
        sample_size = max(64 * n_centroids, 2048)
    sample = sample_vectors(ds, emb_col, id_col, sample_size)
    cent = train_codebook(sample, n_centroids)
    if refine_iters:
        cent = refine_codebook(ds, emb_col, cent, refine_iters)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]   # (q, nprobe)
    state = ray.put((qm, cent, probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, c, pr = ray.get(state)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_to_matrix(batch[emb_col]))
        assign = np.argmax(mat @ c.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            s = mat[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k, s.size)
            idx = np.argpartition(-s, kk - 1)[:kk] if s.size > kk else np.arange(s.size)
            out_q.append(np.full(idx.size, qi, dtype=np.int32))
            out_id.append(sub_ids[idx])
            out_s.append(s[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int32()),
            "id": pa.array(np.concatenate(out_id), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    import pandas as pd
    out = []
    for qi, g in cand.groupby("query_id"):
        out.append(g.sort_values(["score", "id"], ascending=[False, True]).head(k))
    return pd.concat(out, ignore_index=True) if out else cand
