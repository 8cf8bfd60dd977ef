"""MMR diversified vector retrieval (table/api.py mmr_search): greedy
λ·rel − (1−λ)·max-sim selection over an exact relevance pool, verified
against a brute-force oracle on crafted two-cluster geometry."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

SCHEMA = ("st(field(_id,long),field(text,string,analyze),"
          "field(vec,array(float)))")


@pytest.fixture(scope="module")
def mmr_cluster(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("mmr"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "m", SCHEMA, loc))
    rng = np.random.default_rng(7)
    qdir = np.zeros(8)
    qdir[0] = 1.0
    orth = np.zeros(8)
    orth[1] = 1.0
    docs = []
    for i in range(6):           # cluster 1: nearly parallel to the query
        v = qdir + rng.normal(0, 0.02, 8)
        docs.append({"_id": i, "text": f"a {i}",
                     "vec": [float(x) for x in v]})
    for i in range(6, 10):       # cluster 2: relevant but a different angle
        v = 0.8 * qdir + 0.6 * orth + rng.normal(0, 0.02, 8)
        docs.append({"_id": i, "text": f"b {i}",
                     "vec": [float(x) for x in v]})
    c.build_from_local("db", "m", docs, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)
    return c, docs, [float(x) for x in qdir]


def _oracle(docs, qv, lam, k):
    # stored vectors are array(float) → float32; the engine reads them back,
    # so the oracle mirrors the float32 round-trip
    V = np.array([d["vec"] for d in docs], np.float32).astype(np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    qn = np.array(qv, np.float64)
    qn /= np.linalg.norm(qn)
    rel = (1 + V @ qn) / 2
    order = sorted(range(len(docs)), key=lambda i: (-rel[i], i))
    cand = np.ones(len(docs), bool)
    ms = np.zeros(len(docs))
    out = []
    for _ in range(k):
        obj = lam * rel - (1 - lam) * ms
        bi, bv = None, -np.inf
        for i in order:              # first-in-pool tie-break
            if cand[i] and obj[i] > bv:
                bi, bv = i, obj[i]
        cand[bi] = False
        out.append((bi, bv))
        ms = np.maximum(ms, (1 + V @ V[bi]) / 2)
    return out


class TestMMR:
    def test_diversifies_and_matches_oracle(self, mmr_cluster):
        c, docs, qv = mmr_cluster
        q = SearchQuery("db", "m", vector=qv, vectorField="vec", limit=4)
        plain = [r["_id"] for r in c.search(
            "db", "m", q, precision="float64", vector_algorithm="brute")[0]]
        assert all(i < 6 for i in plain)      # relevance-only: one cluster
        out = c.mmr_search("db", "m", q, mmr_lambda=0.5, pool=10)
        assert any(r["_id"] >= 6 for r in out[:2])   # MMR mixes clusters
        want = _oracle(docs, qv, 0.5, 4)
        for r, (wi, wv) in zip(out, want):
            assert r["_id"] == wi
            assert r["_score"] == pytest.approx(wv, abs=1e-12)
            assert r["_rank"] == want.index((wi, wv))

    def test_lambda_one_is_pure_relevance(self, mmr_cluster):
        c, docs, qv = mmr_cluster
        q = SearchQuery("db", "m", vector=qv, vectorField="vec", limit=4)
        plain = [r["_id"] for r in c.search(
            "db", "m", q, precision="float64", vector_algorithm="brute")[0]]
        out = c.mmr_search("db", "m", q, mmr_lambda=1.0, pool=10)
        assert [r["_id"] for r in out] == plain

    def test_query_equals_doc_vector_exact_tie(self, mmr_cluster):
        # query == doc 0's stored vector: at step 2 every candidate's
        # objective is EXACTLY zero (rel ≡ sim-to-selected computed by the
        # same GEMV kernel), so the pick is the pool's next-best by rel —
        # deterministic, not float noise
        c, docs, qv = mmr_cluster
        # the stored vector is the float32 round-trip of the input — query
        # with exactly THOSE bits so rel ≡ sim-to-doc-0
        qv0 = np.array(docs[0]["vec"], np.float32).astype(np.float64).tolist()
        q = SearchQuery("db", "m", vector=qv0, vectorField="vec", limit=3)
        out = c.mmr_search("db", "m", q, mmr_lambda=0.5, pool=10)
        assert out[0]["_id"] == 0
        want = _oracle(docs, qv0, 0.5, 3)
        assert [r["_id"] for r in out] == [w[0] for w in want]
        assert out[1]["_score"] == 0.0      # exact, not ±1e-16

    def test_duplicate_vectors_tie_break_by_user_key(self, ray_session,
                                                     tmp_path):
        # REGRESSION (round-4 review): exact-duplicate embeddings across
        # DELTA generations tie in rel bit-for-bit; the pick must follow the
        # USER key ascending (the documented contract and the SQL oracle's
        # ORDER BY), not the internal stride id (which sorts gen-1 docs
        # before a later generation's)
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "m", SCHEMA, loc))
        dup = [1.0, 0.5, 0.25, 0.0, 0.0, 0.0, 0.0, 0.0]
        other = [0.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0]
        c.build_from_local("db", "m", [
            {"_id": 5, "text": "dup a", "vec": dup},
            {"_id": 9, "text": "other", "vec": other},
        ], key_field="_id", num_doc_parts=2, num_term_parts=2)
        c.build_from_local("db", "m", [
            {"_id": 1, "text": "dup b", "vec": dup},   # same vector, lower key
        ], key_field="_id", num_doc_parts=2, num_term_parts=2)
        q = SearchQuery("db", "m", vector=dup, vectorField="vec", limit=3)
        out = c.mmr_search("db", "m", q, mmr_lambda=0.5, pool=10)
        assert out[0]["_id"] == 1     # lowest USER key among the rel tie

    def test_keyword_query_rejected(self, mmr_cluster):
        c, _, qv = mmr_cluster
        with pytest.raises(ValueError):
            c.mmr_search("db", "m", SearchQuery("db", "m", keyword="a",
                                                fields=["text"], limit=3))
