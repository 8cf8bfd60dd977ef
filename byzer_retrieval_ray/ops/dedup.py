"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-first: vectorized hashing/sketching inside ``map_batches``
(the combiner), one hash-bucket ``groupby`` as the only shuffle, and per-bucket
vectorized resolution inside ``map_groups`` (one call per bucket, not per key). The
reference engine has no dedup beyond upsert-by-_id (SURVEY.md §2.6); these extend it.

Scale notes: every operator shuffles only (hash, id[, signature]) rows — never the
documents themselves; the winner sets are joined back broadcast-style. Buckets are
``hash % num_buckets`` so group count (and per-group memory) is a tunable constant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.murmur3 import murmur3_np

_M61 = (1 << 61) - 1


def _content_hash(texts: np.ndarray, seed: int = 0) -> np.ndarray:
    """128-ish-bit content hash as two independent murmur32 passes → int64."""
    h1 = murmur3_np(texts).astype(np.int64) & 0xFFFFFFFF
    h2 = murmur3_np(np.array([t + "\x01" for t in texts], dtype=object)).astype(np.int64) & 0xFFFFFFFF
    return (h1 << 32) | h2


def exact_dedup(ds, text_col: str, id_col: str, num_buckets: int = 64):
    """Exact duplicate removal: keep the smallest id per identical text.

    hash-partition (bucket = content_hash % B) → per-bucket vectorized first-per-hash.
    Returns the deduplicated Dataset (all original columns).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        h = _content_hash(texts)
        batch = batch.append_column("__h", pa.array(h, pa.int64()))
        return batch.append_column("__b", pa.array(
            (h % num_buckets).astype(np.int32)))

    def keep_first(group: pa.Table) -> pa.Table:
        group = group.sort_by([("__h", "ascending"), (id_col, "ascending")])
        h = group["__h"].to_numpy()
        keep = np.empty(len(h), dtype=bool)
        keep[0] = True
        keep[1:] = h[1:] != h[:-1]
        return group.filter(pa.array(keep)).drop_columns(["__h", "__b"])

    return ds.map_batches(add_hash, batch_format="pyarrow") \
             .groupby("__b").map_groups(keep_first, batch_format="pyarrow")


# ---------------- MinHash + LSH near-dup ----------------

def _word_shingles(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signatures(texts: np.ndarray, num_perm: int, shingle_k: int,
                       seed: int = 7) -> np.ndarray:
    """(n, num_perm) int64 MinHash signatures over word shingles (vectorized).

    Shingles are hashed once with murmur3; the permutation family is the standard
    (a_i * x + b_i) mod p universal hashes over a Mersenne prime.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _M61, size=num_perm, dtype=np.int64)
    out = np.full((len(texts), num_perm), np.iinfo(np.int64).max, dtype=np.int64)
    # flatten all shingles across the batch, hash once, then segment-min
    all_shingles: list[str] = []
    offsets = [0]
    for t in texts:
        sh = _word_shingles(t.split(), shingle_k)
        all_shingles.extend(sh)
        offsets.append(len(all_shingles))
    if not all_shingles:
        return out
    base = murmur3_np(np.array(all_shingles, dtype=object)).astype(np.int64) & 0xFFFFFFFF
    for j in range(num_perm):
        hj = (a[j] * base + b[j]) % _M61
        for i in range(len(texts)):
            lo, hi = offsets[i], offsets[i + 1]
            if hi > lo:
                out[i, j] = hj[lo:hi].min()
    return out


def minhash_lsh_dedup(ds, text_col: str, id_col: str, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3, jaccard: float = 0.8,
                      num_buckets: int = 64):
    """MinHash+LSH near-duplicate detection.

    map_batches: shingle → minhash → (band_id, band_hash, id, signature) rows;
    groupby(bucket of band hash): per-bucket candidate groups; pairs sharing a band
    bucket are verified by estimated Jaccard (signature agreement rate ≥ ``jaccard``);
    each verified duplicate maps to the smallest id it matched ("min-label", one
    round — transitively-chained near-dups beyond one hop are kept, documented).

    Returns a Dataset of (id, dup_of) rows for ids that should be dropped.
    """
    rows_per_band = num_perm // bands

    def emit_bands(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        sig = minhash_signatures(texts, num_perm, shingle_k)
        n = len(texts)
        band_hash = np.empty((n, bands), dtype=np.int64)
        for bnd in range(bands):
            seg = sig[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.int64)
            for c in range(rows_per_band):
                h = (h * np.int64(1000003) + seg[:, c]) % _M61
            band_hash[:, bnd] = h
        out_ids = np.repeat(ids, bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n)
        out_hash = band_hash.reshape(-1)
        sig_rep = np.repeat(sig.astype(np.int64), bands, axis=0)
        return pa.table({
            "id": pa.array(out_ids, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bh": pa.array(out_hash, pa.int64()),
            "sig": pa.array(list(sig_rep), pa.list_(pa.int64(), num_perm)),
            "__b": pa.array(((out_hash + out_band) % num_buckets).astype(np.int32)),
        })

    def resolve(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = group.to_pandas()
        dup_rows = []
        for (_, _), g in df.groupby(["band", "bh"]):
            if len(g) < 2:
                continue
            g = g.sort_values("id")
            sigs = np.stack(g["sig"].to_numpy())
            ids = g["id"].to_numpy()
            anchor = sigs[0]
            agree = (sigs[1:] == anchor).mean(axis=1)
            for i, frac in enumerate(agree):
                if frac >= jaccard:
                    dup_rows.append((int(ids[i + 1]), int(ids[0])))
        if not dup_rows:
            return pa.table({"id": pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64())})
        d, o = zip(*dup_rows)
        return pa.table({"id": pa.array(d, pa.int64()), "dup_of": pa.array(o, pa.int64())})

    dups = ds.map_batches(emit_bands, batch_format="pyarrow") \
             .groupby("__b").map_groups(resolve, batch_format="pyarrow")

    def min_label(group: pa.Table) -> pa.Table:
        g = group.sort_by([("id", "ascending"), ("dup_of", "ascending")])
        ids = g["id"].to_numpy()
        keep = np.empty(len(ids), dtype=bool)
        if len(ids):
            keep[0] = True
            keep[1:] = ids[1:] != ids[:-1]
        return g.filter(pa.array(keep))

    return dups.groupby("id").map_groups(min_label, batch_format="pyarrow")


# ---------------- SimHash ----------------

def simhash_values(texts: np.ndarray, seed: int = 0) -> np.ndarray:
    """64-bit SimHash per text over whitespace tokens (uint64), vectorized."""
    out = np.zeros(len(texts), dtype=np.uint64)
    all_toks: list[str] = []
    offsets = [0]
    for t in texts:
        toks = t.split()
        all_toks.extend(toks)
        offsets.append(len(all_toks))
    if not all_toks:
        return out
    h32a = murmur3_np(np.array(all_toks, dtype=object)).astype(np.int64) & 0xFFFFFFFF
    h32b = murmur3_np(np.array([t + "\x02" for t in all_toks], dtype=object)).astype(np.int64) & 0xFFFFFFFF
    h64 = ((h32a << 32) | h32b).astype(np.uint64)
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    contrib = bits * 2 - 1  # +1 / -1 per bit
    for i in range(len(texts)):
        lo, hi = offsets[i], offsets[i + 1]
        if hi > lo:
            v = contrib[lo:hi].sum(axis=0)
            bits = (v > 0).astype(np.uint64)
            out[i] = (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    return out


def simhash_dedup(ds, text_col: str, id_col: str, num_buckets: int = 64):
    """Near-dup by identical 64-bit SimHash (keep smallest id per hash)."""

    def add(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        h = simhash_values(texts).astype(np.int64)
        return pa.table({
            "id": batch[id_col],
            "simhash": pa.array(h, pa.int64()),
            "__b": pa.array((h % num_buckets).astype(np.int32)),
        })

    def resolve(group: pa.Table) -> pa.Table:
        g = group.sort_by([("simhash", "ascending"), ("id", "ascending")])
        h = g["simhash"].to_numpy()
        dup = np.zeros(len(h), dtype=bool)
        dup[1:] = h[1:] == h[:-1]
        return g.filter(pa.array(dup)).drop_columns(["__b"])

    return ds.map_batches(add, batch_format="pyarrow") \
             .groupby("__b").map_groups(resolve, batch_format="pyarrow")


# ---------------- n-gram Jaccard verify ----------------

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity of two texts (verification kernel)."""
    sa = set(_word_shingles(a.split(), n))
    sb = set(_word_shingles(b.split(), n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------- embedding cosine near-dup ----------------

def embedding_dedup(ds, emb_col: str, id_col: str, threshold: float = 0.98,
                    num_planes: int = 12, seed: int = 11, num_buckets: int = 64,
                    dim: int | None = None):
    """Near-dup by embedding cosine ≥ threshold within random-hyperplane LSH buckets.

    map_batches: sign-sketch each embedding with ``num_planes`` random hyperplanes →
    (sketch, id, vec); groupby(sketch bucket): exact pairwise cosine within bucket
    (buckets are small by construction), emit (id, dup_of=min matching id). Pairs in
    different sketch buckets are missed with probability (1-θ/π)^planes — documented
    recall/cost dial.
    """

    def emit(batch: pa.Table) -> pa.Table:
        col = batch[emb_col].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        d = flat.size // n if n else (dim or 0)
        mat = flat.reshape(n, d)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, num_planes))
        signs = (mat @ planes) > 0
        sk = np.zeros(n, dtype=np.int64)
        for j in range(num_planes):
            sk = sk * 2 + signs[:, j]
        return pa.table({
            "id": batch[id_col],
            "sketch": pa.array(sk, pa.int64()),
            "emb": col.cast(pa.list_(pa.float32())),
            "__b": pa.array((sk % num_buckets).astype(np.int32)),
        })

    def resolve(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = group.to_pandas()
        out_id, out_dup = [], []
        for _, g in df.groupby("sketch"):
            if len(g) < 2:
                continue
            g = g.sort_values("id")
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["emb"]])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
            sim = mat @ mat.T
            ids = g["id"].to_numpy()
            for i in range(1, len(ids)):
                j = np.argmax(sim[i, :i])
                if sim[i, j] >= threshold:
                    out_id.append(int(ids[i]))
                    out_dup.append(int(ids[j]))
        return pa.table({"id": pa.array(out_id, pa.int64()),
                         "dup_of": pa.array(out_dup, pa.int64())})

    return ds.map_batches(emit, batch_format="pyarrow") \
             .groupby("__b").map_groups(resolve, batch_format="pyarrow")
