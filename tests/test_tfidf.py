"""tfidf_topk: per-doc keyword ranking, df correctness, determinism."""

import math

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.tfidf import tfidf_topk


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


DOCS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
    "text": ["apple apple banana common",
             "banana cherry common",
             "cherry cherry cherry common",
             "date common"],
})
# df: apple 1, banana 2, cherry 2, date 1, common 4 ; N = 4


def expected_scores():
    n = 4.0
    return {
        (1, "apple"): 2 * math.log(n / 1),
        (1, "banana"): 1 * math.log(n / 2),
        (1, "common"): 0.0,
        (2, "banana"): 1 * math.log(n / 2),
        (2, "cherry"): 1 * math.log(n / 2),
        (2, "common"): 0.0,
        (3, "cherry"): 3 * math.log(n / 2),
        (3, "common"): 0.0,
        (4, "date"): 1 * math.log(n / 1),
        (4, "common"): 0.0,
    }


class TestTfIdf:
    def test_scores_and_ranks(self, ray_mod):
        out = tfidf_topk(ray_mod.from_arrow(DOCS), "text", "doc_id",
                         k=10).to_pandas()
        got = {(i, t): s for i, t, s in zip(out["id"], out["token"],
                                            out["score"])}
        want = expected_scores()
        assert set(got) == set(want)
        for key in want:
            assert got[key] == pytest.approx(want[key], abs=1e-12)
        ranks = {(i, t): r for i, t, r in zip(out["id"], out["token"],
                                              out["rank"])}
        assert ranks[(1, "apple")] == 1 and ranks[(1, "banana")] == 2
        assert ranks[(3, "cherry")] == 1 and ranks[(3, "common")] == 2
        # doc 2 tie between banana and cherry -> token asc
        assert ranks[(2, "banana")] == 1 and ranks[(2, "cherry")] == 2

    def test_k_truncates(self, ray_mod):
        out = tfidf_topk(ray_mod.from_arrow(DOCS), "text", "doc_id",
                         k=1).to_pandas()
        assert len(out) == 4 and (out["rank"] == 1).all()

    def test_partition_invariance_and_ndocs_override(self, ray_mod):
        rng = np.random.default_rng(3)
        vocab = np.array([f"w{i}" for i in range(50)])
        texts = [" ".join(rng.choice(vocab, rng.integers(5, 40)))
                 for _ in range(300)]
        t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        a = tfidf_topk(ray_mod.from_arrow(t).repartition(1), "text",
                       "doc_id", k=3).to_pandas()
        b = tfidf_topk(ray_mod.from_arrow(t).repartition(8), "text",
                       "doc_id", k=3, n_docs=300).to_pandas()
        key = lambda df: df.sort_values(["id", "rank"]).reset_index(drop=True)
        assert key(a).equals(key(b))
