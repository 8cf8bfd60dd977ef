"""pagerank: vs a dense numpy reference, mass conservation, dangling
redistribution, isolated nodes, partition invariance, multi-edges."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.pagerank import pagerank


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


def ref_pagerank(edges, n, d=0.85, iters=8):
    """Dense reference with the exact module semantics."""
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[deg == 0].sum()
        csum = np.zeros(n)
        for s, t in edges:
            csum[t] += r[s] / deg[s]
        r = (1.0 - d) / n + d * (csum + dang / n)
    return r


def run(ray_mod, edges, n, **kw):
    e = pa.table({"src": pa.array([s for s, _ in edges], pa.int64()),
                  "dst": pa.array([t for _, t in edges], pa.int64())})
    nodes = pa.table({"id": pa.array(range(n), pa.int64())})
    out = pagerank(ray_mod.from_arrow(e), ray_mod.from_arrow(nodes),
                   **kw).to_pandas().sort_values("id")
    assert list(out["id"]) == list(range(n))
    return out["rank"].to_numpy()


class TestPageRank:
    def test_matches_dense_reference(self, ray_mod):
        rng = np.random.default_rng(5)
        n = 200
        edges = [(int(s), int(t)) for s, t in
                 zip(rng.integers(0, n, 800), rng.integers(0, n, 800))
                 if s != t]
        got = run(ray_mod, edges, n, num_buckets=16)
        want = ref_pagerank(edges, n)
        assert np.allclose(got, want, rtol=0, atol=1e-12)
        assert abs(got.sum() - 1.0) < 1e-9

    def test_star_graph_hubs_beat_leaves(self, ray_mod):
        # B,C,D → A; A → B. The A↔B cycle holds nearly all mass; C,D (no
        # in-links) sit at the (1-d)/N floor. (A vs B oscillates with the
        # 2-cycle parity, so no argmax assert — the dense ref pins values.)
        edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
        got = run(ray_mod, edges, 4)
        assert min(got[0], got[1]) > 4 * max(got[2], got[3])
        assert np.allclose(got[2:], 0.15 / 4)
        assert np.allclose(got, ref_pagerank(edges, 4), atol=1e-12)

    def test_dangling_mass_conserved(self, ray_mod):
        # node 2 dangles; total mass must stay 1
        edges = [(0, 1), (1, 2)]
        got = run(ray_mod, edges, 3)
        assert abs(got.sum() - 1.0) < 1e-12
        assert np.allclose(got, ref_pagerank(edges, 3), atol=1e-12)

    def test_isolated_node_gets_base_share(self, ray_mod):
        # node 3 has no edges at all but is in the node set
        edges = [(0, 1), (1, 0)]
        got = run(ray_mod, edges, 4)
        want = ref_pagerank(edges, 4)
        assert np.allclose(got, want, atol=1e-12)
        assert got[3] > 0

    def test_multi_edges_count_twice(self, ray_mod):
        once = run(ray_mod, [(0, 1), (0, 2)], 3)
        twice = run(ray_mod, [(0, 1), (0, 1), (0, 2)], 3)
        # doubled edge shifts mass toward node 1
        assert twice[1] > once[1]
        assert np.allclose(twice, ref_pagerank([(0, 1), (0, 1), (0, 2)], 3),
                           atol=1e-12)

    def test_partition_invariance(self, ray_mod):
        rng = np.random.default_rng(9)
        n = 300
        edges = [(int(s), int(t)) for s, t in
                 zip(rng.integers(0, n, 1500), rng.integers(0, n, 1500))
                 if s != t]
        e = pa.table({"src": pa.array([s for s, _ in edges], pa.int64()),
                      "dst": pa.array([t for _, t in edges], pa.int64())})
        nodes = pa.table({"id": pa.array(range(n), pa.int64())})
        a = pagerank(ray_mod.from_arrow(e), ray_mod.from_arrow(nodes),
                     num_buckets=8).to_pandas().sort_values("id")
        b = pagerank(ray_mod.from_arrow(e).repartition(11),
                     ray_mod.from_arrow(nodes).repartition(3),
                     num_buckets=32).to_pandas().sort_values("id")
        assert np.allclose(a["rank"].to_numpy(), b["rank"].to_numpy(),
                           atol=1e-12)

    def test_empty_nodes(self, ray_mod):
        e = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        nodes = pa.table({"id": pa.array([], pa.int64())})
        out = pagerank(ray_mod.from_arrow(e), ray_mod.from_arrow(nodes))
        assert out.count() == 0
