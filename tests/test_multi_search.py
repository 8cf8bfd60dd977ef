"""Federated multi-table search (elasticsearch multi-index /
dfs_query_then_fetch shape): blended global stats across tables make
scoring a PARTITIONED corpus byte-identical to scoring the union corpus."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
          "field(src,string))")


def _corpus(n=120, seed=11):
    rng = np.random.default_rng(seed)
    vocab = ["merge", "sort", "scan", "join", "index", "query", "plan",
             "cost", "hash", "tree"]
    docs = []
    for i in range(n):
        words = rng.choice(vocab, size=6 + int(rng.integers(0, 6)))
        docs.append({"_id": i, "content": " ".join(words.tolist()),
                     "src": f"s{i % 4}"})
    return docs


def _build(c, table, docs):
    c.create_table(TableSettings("db", table, SCHEMA, c.location))
    c.build_from_local("db", table, docs, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)


@pytest.fixture(scope="module")
def fed(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("fed"))
    c = RetrievalCluster(loc)
    docs = _corpus()
    _build(c, "full", docs)
    _build(c, "pa", [d for d in docs if d["_id"] % 2 == 0])
    _build(c, "pb", [d for d in docs if d["_id"] % 2 == 1])
    return c, docs


class TestPartitionInvariance:
    """The core federated property: split corpus + blended stats ==
    union-corpus scoring, ids AND float scores."""

    @pytest.mark.parametrize("kw", ["merge", "merge sort", "scan join plan"])
    def test_exact_score_parity(self, fed, kw):
        c, _ = fed
        q = {"keyword": kw, "fields": ["content"], "limit": 25}
        single = c.search("db", "full", q, precision="float64")[0]
        multi = c.multi_search("db", ["pa", "pb"], q, precision="float64")
        assert [(r["_id"], r["_score"]) for r in multi] == \
               [(r["_id"], r["_score"]) for r in single]

    def test_taat_bmw_identical(self, fed):
        c, _ = fed
        q = {"keyword": "merge sort scan", "fields": ["content"],
             "limit": 30}
        bmw = c.multi_search("db", ["pa", "pb"], q, precision="float64",
                             algorithm="bmw")
        taat = c.multi_search("db", ["pa", "pb"], q, precision="float64",
                              algorithm="taat")
        assert bmw == taat

    def test_expansion_queries_federate(self, fed):
        # prefix + fuzzy expansion unions term dictionaries across tables
        c, _ = fed
        for kw in ["mer*", "msrge~1", '"merge sort"']:
            q = {"keyword": kw, "fields": ["content"], "limit": 20}
            single = c.search("db", "full", q, precision="float64")[0]
            multi = c.multi_search("db", ["pa", "pb"], q,
                                   precision="float64")
            assert [(r["_id"], r["_score"]) for r in multi] == \
                   [(r["_id"], r["_score"]) for r in single], kw

    def test_filters_apply_per_table(self, fed):
        c, _ = fed
        q = {"keyword": "merge sort", "fields": ["content"], "limit": 50,
             "filters": {"and": [{"field": "src", "value": "s1"}]}}
        single = c.search("db", "full", q, precision="float64")[0]
        multi = c.multi_search("db", ["pa", "pb"], q, precision="float64")
        assert [(r["_id"], r["_score"]) for r in multi] == \
               [(r["_id"], r["_score"]) for r in single]
        assert all(r["src"] == "s1" for r in multi)


class TestFederationMechanics:
    def test_table_provenance(self, fed):
        c, _ = fed
        q = {"keyword": "merge", "fields": ["content"], "limit": 40}
        rows = c.multi_search("db", ["pa", "pb"], q)
        assert rows
        for r in rows:
            want = "pa" if r["_id"] % 2 == 0 else "pb"
            assert r["_table"] == want

    def test_single_member_matches_plain_search(self, fed):
        c, _ = fed
        q = {"keyword": "merge sort", "fields": ["content"], "limit": 10}
        plain = c.search("db", "pa", q, precision="float64")[0]
        one = c.multi_search("db", ["pa"], q, precision="float64")
        assert [(r["_id"], r["_score"]) for r in one] == \
               [(r["_id"], r["_score"]) for r in plain]

    def test_rebuild_invalidates_fed_cache(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        _build(c, "a", [{"_id": 0, "content": "alpha beta", "src": "x"}])
        _build(c, "b", [{"_id": 1, "content": "alpha gamma", "src": "x"}])
        q = {"keyword": "alpha", "fields": ["content"], "limit": 10}
        before = c.multi_search("db", ["a", "b"], q, precision="float64")
        assert len(before) == 2
        # upsert a new doc into b: N and df(alpha) change -> scores change
        c.build_from_local("db", "b", [
            {"_id": 2, "content": "alpha delta", "src": "y"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        after = c.multi_search("db", ["a", "b"], q, precision="float64")
        assert len(after) == 3
        assert {r["_id"] for r in after} == {0, 1, 2}
        s_before = {r["_id"]: r["_score"] for r in before}
        s_after = {r["_id"]: r["_score"] for r in after}
        assert s_after[0] != s_before[0]      # stale fed stats would keep it

    def test_cross_table_tiebreak_is_doc_id(self, ray_session, tmp_path):
        # identical docs in different tables with distinct ids: equal scores,
        # order must be doc_id asc regardless of table listing order
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        _build(c, "t1", [{"_id": 5, "content": "same text here", "src": "x"}])
        _build(c, "t2", [{"_id": 2, "content": "same text here", "src": "x"}])
        q = {"keyword": "same", "fields": ["content"], "limit": 10}
        for order in (["t1", "t2"], ["t2", "t1"]):
            rows = c.multi_search("db", order, q, precision="float64")
            assert [r["_id"] for r in rows] == [2, 5]
            assert rows[0]["_score"] == rows[1]["_score"]

    def test_bad_inputs(self, fed):
        c, _ = fed
        q = {"keyword": "merge", "fields": ["content"], "limit": 5}
        with pytest.raises(ValueError, match="non-empty LIST"):
            c.multi_search("db", "pa", q)
        with pytest.raises(ValueError, match="distinct"):
            c.multi_search("db", ["pa", "pa"], q)
        with pytest.raises(ValueError, match="keyword-only"):
            c.multi_search("db", ["pa", "pb"],
                           {"vector": [0.1, 0.2], "vectorField": "v",
                            "limit": 3})
