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


class TestSelectCanonical:
    # clusters {1,2,3,4} (scores make 3 win), {10,11,12} (tie on score →
    # smallest id 10 wins), singleton pair cluster {20,21}, plus docs 50/51
    # never seen in a pair (self-clusters, always kept)
    PAIRS = [(2, 1), (3, 2), (4, 3), (11, 10), (12, 10), (21, 20)]
    DOCS = {1: 5.0, 2: 7.0, 3: 9.0, 4: 9.0, 10: 4.0, 11: 4.0, 12: 2.0,
            20: 1.0, 21: 8.0, 50: 0.0, 51: 3.0}

    def _run(self, ray_mod, num_buckets=8, parts=1):
        from byzer_retrieval_ray.ops.components import (connected_components,
                                                        select_canonical)
        docs = pa.table({
            "id": pa.array(sorted(self.DOCS), pa.int64()),
            "score": pa.array([self.DOCS[i] for i in sorted(self.DOCS)],
                              pa.float64())})
        labels = connected_components(
            ray_mod.from_arrow(pairs_tbl(self.PAIRS)))
        ds = ray_mod.from_arrow(docs)
        if parts > 1:
            ds = ds.repartition(parts)
        out = select_canonical(ds, labels, num_buckets=num_buckets).to_pandas()
        return out.sort_values("id").reset_index(drop=True)

    def test_keep_flags(self, ray_mod):
        out = self._run(ray_mod)
        keep = set(out[out["keep"]]["id"])
        # 3 beats 4 on the score tie by smaller id? no — 3 and 4 tie at 9.0,
        # smaller id 3 wins; cluster {10,11,12}: 10 and 11 tie at 4.0 → 10;
        # {20,21}: 21 wins on score; singletons 50, 51 kept
        assert keep == {3, 10, 21, 50, 51}
        assert len(out) == len(self.DOCS)
        cl = dict(zip(out["id"], out["cluster"]))
        assert cl[50] == 50 and cl[51] == 51
        assert cl[1] == cl[2] == cl[3] == cl[4] == 1
        assert cl[20] == cl[21] == 20

    def test_partition_and_bucket_invariance(self, ray_mod):
        a = self._run(ray_mod)
        b = self._run(ray_mod, num_buckets=3, parts=6)
        assert a.equals(b)

    def test_big_ids_survive(self, ray_mod):
        # ids above 2^53 (generation-striped doc ids) must round-trip exactly
        from byzer_retrieval_ray.ops.components import select_canonical
        big = (1 << 54) + 3
        docs = pa.table({"id": pa.array([big, big + 1], pa.int64()),
                         "score": pa.array([1.0, 2.0], pa.float64())})
        labels = ray_mod.from_arrow(pa.table({
            "id": pa.array([big, big + 1], pa.int64()),
            "cluster": pa.array([big, big], pa.int64())}))
        out = select_canonical(ray_mod.from_arrow(docs), labels).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        assert list(out["id"]) == [big, big + 1]
        assert list(out["cluster"]) == [big, big]
        assert list(out["keep"]) == [False, True]
