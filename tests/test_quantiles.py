"""exact_quantiles: exactness vs numpy sort, narrowing rounds, tie handling."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.quantiles import exact_quantiles


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


QS = [0.0, 0.01, 0.2, 0.5, 0.9, 0.99, 1.0]


def want_of(v, qs=QS):
    sv = np.sort(v)
    return {q: float(sv[int(np.floor(q * (len(v) - 1)))]) for q in qs}


class TestExactQuantiles:
    def test_mixed_distribution_exact(self, ray_mod):
        rng = np.random.default_rng(7)
        v = np.concatenate([rng.normal(0, 1, 30000), np.full(3000, 3.25),
                            rng.exponential(2, 10000)])
        ds = ray_mod.from_arrow(pa.table({"x": pa.array(v)})).repartition(8)
        # collect_limit 500 forces several narrowing rounds
        got = exact_quantiles(ds, "x", QS, n_candidates=64, collect_limit=500)
        assert got == want_of(v)

    def test_single_pass_when_small(self, ray_mod):
        v = np.arange(100, dtype=np.float64)
        ds = ray_mod.from_arrow(pa.table({"x": pa.array(v)}))
        got = exact_quantiles(ds, "x", [0.5, 1.0])
        assert got == {0.5: 49.0, 1.0: 99.0}

    def test_all_equal_tie_shortcut(self, ray_mod):
        ds = ray_mod.from_arrow(pa.table({"x": pa.array(np.full(5000, 7.5))}))
        got = exact_quantiles(ds, "x", [0.0, 0.5, 1.0], n_candidates=8,
                              collect_limit=10)
        assert got == {0.0: 7.5, 0.5: 7.5, 1.0: 7.5}

    def test_nan_and_null_ignored(self, ray_mod):
        v = pa.array([1.0, None, float("nan"), 2.0, 3.0], pa.float64())
        ds = ray_mod.from_arrow(pa.table({"x": v}))
        got = exact_quantiles(ds, "x", [0.5])
        assert got == {0.5: 2.0}

    def test_empty(self, ray_mod):
        ds = ray_mod.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
        got = exact_quantiles(ds, "x", [0.5])
        assert np.isnan(got[0.5])
