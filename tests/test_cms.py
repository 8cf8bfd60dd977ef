"""cms: never underestimates, exact counter matrix vs brute force,
mergeability, partition invariance, bad params."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.cms import _cols, cms_build, cms_counts, cms_estimate


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


def stream(n=4000, vocab=200, seed=3):
    rng = np.random.default_rng(seed)
    # zipf-ish: key j appears ~ 1/(j+1)
    w = 1.0 / (np.arange(vocab) + 1)
    ks = rng.choice(vocab, size=n, p=w / w.sum())
    return [f"w{j}" for j in ks]


def brute_matrix(keys, width, depth):
    uk, cnt = np.unique(keys, return_counts=True)
    cols = _cols(list(uk), width, depth)
    mat = np.zeros((depth, width), np.int64)
    for i in range(depth):
        np.add.at(mat[i], cols[i], cnt)
    return mat


class TestCMS:
    def test_matrix_matches_brute_force(self, ray_mod):
        ks = stream()
        ds = ray_mod.from_arrow(pa.table({"k": pa.array(ks)})).repartition(7)
        mat = cms_build(ds, "k", width=256, depth=3)
        assert np.array_equal(mat, brute_matrix(ks, 256, 3))

    def test_never_underestimates_and_total_preserved(self, ray_mod):
        ks = stream(seed=11)
        ds = ray_mod.from_arrow(pa.table({"k": pa.array(ks)}))
        mat = cms_build(ds, "k", width=128, depth=4)
        # every row sums to the stream length exactly
        assert (mat.sum(axis=1) == len(ks)).all()
        uk, cnt = np.unique(ks, return_counts=True)
        est = cms_estimate(mat, list(uk))
        assert (est >= cnt).all()
        # absent key still >= 0 (may collide upward)
        assert cms_estimate(mat, ["never-seen"])[0] >= 0

    def test_wide_sketch_is_exact(self, ray_mod):
        ks = stream(n=1000, vocab=50, seed=7)
        ds = ray_mod.from_arrow(pa.table({"k": pa.array(ks)}))
        uk, cnt = np.unique(ks, return_counts=True)
        got = cms_counts(ds, "k", list(uk), width=1 << 16, depth=4)
        assert all(got[k] == c for k, c in zip(uk, cnt))

    def test_merge_is_elementwise_sum(self, ray_mod):
        ks = stream(seed=5)
        half = len(ks) // 2
        t_all = pa.table({"k": pa.array(ks)})
        t_a = pa.table({"k": pa.array(ks[:half])})
        t_b = pa.table({"k": pa.array(ks[half:])})
        m_all = cms_build(ray_mod.from_arrow(t_all), "k", width=256, depth=3)
        m_a = cms_build(ray_mod.from_arrow(t_a), "k", width=256, depth=3)
        m_b = cms_build(ray_mod.from_arrow(t_b), "k", width=256, depth=3)
        assert np.array_equal(m_all, m_a + m_b)

    def test_partition_invariance(self, ray_mod):
        t = pa.table({"k": pa.array(stream(seed=9))})
        a = cms_build(ray_mod.from_arrow(t), "k", width=512, depth=2)
        b = cms_build(ray_mod.from_arrow(t).repartition(13), "k",
                      width=512, depth=2)
        assert np.array_equal(a, b)

    def test_bad_params(self, ray_mod):
        ds = ray_mod.from_arrow(pa.table({"k": pa.array(["a"])}))
        with pytest.raises(ValueError):
            cms_build(ds, "k", width=0, depth=3)
        with pytest.raises(ValueError):
            cms_build(ds, "k", width=8, depth=0)
