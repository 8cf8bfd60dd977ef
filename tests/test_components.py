"""connected_components + near-dup pair-graph clustering."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.components import connected_components
from byzer_retrieval_ray.ops.dedup import ngram_jaccard_dedup


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


def pairs_tbl(pairs):
    return pa.table({"id": pa.array([a for a, _ in pairs], pa.int64()),
                     "dup_of": pa.array([b for _, b in pairs], pa.int64())})


class TestCC:
    PAIRS = [(2, 1), (3, 2), (4, 3), (11, 10), (12, 10), (12, 11), (21, 20)] \
        + [(i + 1, i) for i in range(30, 37)]
    WANT = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
            **{i: 30 for i in range(30, 38)}}

    def test_chains_cliques_pairs(self, ray_mod):
        out = connected_components(
            ray_mod.from_arrow(pairs_tbl(self.PAIRS))).to_pandas()
        assert dict(zip(out["id"], out["cluster"])) == self.WANT

    def test_partition_invariance(self, ray_mod):
        out = connected_components(
            ray_mod.from_arrow(pairs_tbl(self.PAIRS)).repartition(5),
            num_buckets=7).to_pandas()
        assert dict(zip(out["id"], out["cluster"])) == self.WANT

    def test_empty(self, ray_mod):
        out = connected_components(
            ray_mod.from_arrow(pairs_tbl([]))).to_pandas()
        assert len(out) == 0

    def test_max_iters_caps_rounds(self, ray_mod):
        # a 12-node path needs ~11 propagation rounds; max_iters=2 must stop
        # early (labels then only partially converged — just assert it returns)
        chain = [(i + 1, i) for i in range(50, 61)]
        out = connected_components(ray_mod.from_arrow(pairs_tbl(chain)),
                                   max_iters=2).to_pandas()
        assert len(out) == 12


class TestNgramPairGraph:
    def test_return_pairs_and_cluster(self, ray_mod):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        toks = base.split()
        a = " ".join(toks[:8])     # J(base, a) = 8-2 / 10-2 = 0.75 >= 0.6
        b = " ".join(toks[:5])     # J(a, b) = 3/6 = 0.5... pick threshold 0.45
        docs = pa.table({"doc_id": pa.array([1, 2, 3, 50], pa.int64()),
                         "text": [base, a, b,
                                  "totally different words here entirely"]})
        pairs = ngram_jaccard_dedup(ray_mod.from_arrow(docs), "text",
                                    "doc_id", threshold=0.45, shingle_k=3,
                                    return_pairs=True).to_pandas()
        got = set(zip(pairs["id"], pairs["dup_of"]))
        # J(base,a)=0.75, J(a,b)=0.5, J(base,b)=3/8=0.375 < 0.45
        assert got == {(2, 1), (3, 2)}
        out = connected_components(
            ray_mod.from_arrow(pa.Table.from_pandas(pairs))).to_pandas()
        assert dict(zip(out["id"], out["cluster"])) == {1: 1, 2: 1, 3: 1}
