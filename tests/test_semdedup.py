"""SemDeDup-style semantic dedup (ops/semdedup.py) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from byzer_retrieval_ray.ops.semdedup import semantic_dedup

D = 16
K = 4


def _corpus():
    """4 well-separated direction clusters + in-cluster near-dups."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((K, D))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    for i in range(80):
        c = i % K
        v = base[c] + 0.05 * rng.standard_normal(D)   # tight around centroid
        if i >= 60:                                    # last 20: near-copies
            v = vecs[i - 60] + 1e-4 * rng.standard_normal(D)
        vecs.append(v)
        ids.append(i)
    return np.array(vecs), np.array(ids), base


def brute(vecs, ids, cents, threshold):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = np.argmax(vn @ cn.T, axis=1)
    out = {}
    for cl in range(len(cents)):
        members = ids[assign == cl]
        members.sort()
        m = vn[np.searchsorted(ids, members)]
        sim = m @ m.T
        for i in range(len(members)):
            dup = None
            if i:
                j = int(np.argmax(sim[i, :i]))
                if sim[i, j] >= threshold:
                    dup = int(members[j])
            out[int(members[i])] = (cl, dup)
    return out


def _ds(vecs, ids, parallelism=1):
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs),
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


class TestSemanticDedup:
    def test_matches_brute_force(self, ray_session):
        vecs, ids, cents = _corpus()
        out = semantic_dedup(_ds(vecs, ids), "embedding", "vec_id",
                             threshold=0.999, centroids=cents).to_pandas()
        want = brute(vecs.astype(np.float32).astype(np.float64), ids, cents,
                     0.999)
        assert len(out) == len(ids)
        for row in out.itertuples():
            cl, dup = want[row.id]
            assert row.cluster == cl
            got_dup = None if row.dup_of is None or (
                isinstance(row.dup_of, float) and np.isnan(row.dup_of)) \
                else int(row.dup_of)
            assert got_dup == dup, (row.id, got_dup, dup)
        # the 20 near-copies are all flagged against their originals
        flagged = out[out["dup_of"].notna()]
        assert len(flagged) >= 20
        copies = out[out["id"] >= 60].sort_values("id")["dup_of"]
        assert list(copies.astype(int)) == list(range(0, 20))

    def test_partition_invariance(self, ray_session):
        vecs, ids, cents = _corpus()
        a = semantic_dedup(_ds(vecs, ids), "embedding", "vec_id",
                           threshold=0.999, centroids=cents).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        b = semantic_dedup(_ds(vecs, ids, parallelism=4), "embedding",
                           "vec_id", threshold=0.999,
                           centroids=cents).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        assert a.equals(b)

    def test_cross_cluster_pairs_never_compared(self, ray_session):
        # two identical vectors forced into different clusters by centroids
        cents = np.eye(2, D)
        v = np.zeros((2, D))
        v[0, 0] = 1.0   # cluster 0
        v[1, 1] = 1.0   # cluster 1
        out = semantic_dedup(_ds(v, np.array([0, 1])), "embedding", "vec_id",
                             threshold=0.0, centroids=cents).to_pandas()
        assert out["dup_of"].isna().all()

    def test_learned_codebook_path(self, ray_session):
        vecs, ids, _ = _corpus()
        out = semantic_dedup(_ds(vecs, ids), "embedding", "vec_id",
                             threshold=0.999, num_clusters=K,
                             sample_size=64).to_pandas()
        # keepers + dups partition the corpus; copies still flagged
        assert len(out) == len(ids)
        assert out["dup_of"].notna().sum() >= 20
