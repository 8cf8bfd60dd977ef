"""End-to-end: Ray Data build → BM25 search vs the brute-force oracle; lifecycle API;
resumability; partition-count invariance. Mirrors the reference's test shape
(LuceneKNNTest.java:23-110, test_retrieval.py:257-289) at sf0.001 scale."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from tests.oracle_bm25 import OracleIndex

DOCS_SCHEMA = ("st(field(doc_id,long),field(text,string,analyze),field(lang,string),"
               "field(source,string),field(n_chars,long,sort))")
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("cluster"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "docs", DOCS_SCHEMA, loc))
    c.build_from_parquet("db", "docs", f"{SF}/documents.parquet", key_field="doc_id",
                         num_doc_parts=4, num_term_parts=4)
    return c


@pytest.fixture(scope="module")
def oracle():
    t = pq.read_table(f"{SF}/documents.parquet")
    return OracleIndex(t["doc_id"].to_pylist(), t["text"].to_pylist()), t


def _engine_topk(cluster, keyword, limit=10, filters=None, algorithm="bmw"):
    q = SearchQuery("db", "docs", filters=filters or {}, keyword=keyword,
                    fields=["text"], limit=limit)
    res = cluster.search("db", "docs", q, algorithm=algorithm)[0]
    return (np.array([r["doc_id"] for r in res], np.int64),
            np.array([r["_score"] for r in res], np.float32))


QUERIES = ["the", "window merge", "scan join order sort", "zzz_absent", "*",
           "customer", "merge merge",
           # SimpleQueryParser operator subset (+must, -must_not, | = OR)
           "+merge window", "window -merge", "window +merge -scan",
           "customer | merge", "+zzz_absent window", "-the",
           # parenthesized groups (SimpleQueryParser precedence subset)
           "+(merge | sort) -scan", "(customer | merge) window",
           "+(scan sort) +window", "window -(merge customer)",
           # sloppy phrases ("a b"~N; ~0 ≡ exact phrase)
           '"window merge"~2', '"scan order"~1 sort', '+"window merge"~3',
           'customer -"window merge"~2', '"window merge"~0']


class TestBM25Parity:
    @pytest.mark.parametrize("keyword", QUERIES)
    @pytest.mark.parametrize("algorithm", ["taat", "bmw"])
    def test_topk_matches_oracle(self, cluster, oracle, keyword, algorithm):
        oidx, _ = oracle
        for limit in (1, 10, 100):
            ids, scores = _engine_topk(cluster, keyword, limit, algorithm=algorithm)
            oids, oscores = oidx.search(keyword, limit)
            np.testing.assert_array_equal(ids, oids, err_msg=f"{keyword!r} k={limit}")
            np.testing.assert_allclose(scores, oscores, rtol=2e-6,
                                       err_msg=f"{keyword!r} k={limit}")

    def test_filtered_search_includes_zero_scores(self, cluster, oracle):
        oidx, t = oracle
        lang = t["lang"].to_pylist()
        cand = [d for d, l in zip(t["doc_id"].to_pylist(), lang) if l == "en"]
        ids, scores = _engine_topk(cluster, "merge sort", limit=500,
                                   filters={"and": [{"field": "lang", "value": "en"}]})
        oids, oscores = oidx.search("merge sort", 500, candidate_ids=cand)
        np.testing.assert_array_equal(ids, oids)
        np.testing.assert_allclose(scores, oscores, rtol=2e-6)
        assert (scores == 0).any()  # SHOULD+FILTER: zero-score filter matches included

    def test_range_filter(self, cluster, oracle):
        oidx, t = oracle
        cand = [d for d, n in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist())
                if 100 <= n <= 300]
        ids, _ = _engine_topk(cluster, "the", limit=50,
                              filters={"and": [{"field": "n_chars", "min": 100, "max": 300}]})
        oids, _ = oidx.search("the", 50, candidate_ids=cand)
        np.testing.assert_array_equal(ids, oids)

    def test_nested_filter(self, cluster, oracle):
        oidx, t = oracle
        langs = t["lang"].to_pylist()
        srcs = t["source"].to_pylist()
        cand = [d for d, l, s in zip(t["doc_id"].to_pylist(), langs, srcs)
                if l == "en" and (s == "src0" or s == "src1")]
        filters = {"and": [{"field": "lang", "value": "en"},
                           {"or": [{"field": "source", "value": "src0"},
                                   {"field": "source", "value": "src1"}]}]}
        ids, _ = _engine_topk(cluster, "data", limit=100, filters=filters)
        oids, _ = oidx.search("data", 100, candidate_ids=cand)
        np.testing.assert_array_equal(ids, oids)

    def test_search_result_shape(self, cluster):
        res = cluster.search("db", "docs", {"keyword": "the", "fields": ["text"],
                                            "limit": 3})[0]
        assert len(res) == 3
        # analyzed fields are not stored (Lucene TextField Store.NO parity)
        assert "text" not in res[0]
        for col in ("doc_id", "lang", "source", "n_chars", "_score"):
            assert col in res[0]


class TestFilterOp:
    def test_filter_sort_limit(self, cluster, oracle):
        _, t = oracle
        rows = sorted(
            ({"doc_id": d, "n_chars": n, "lang": l}
             for d, n, l in zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist(),
                                t["lang"].to_pylist()) if l == "zh"),
            key=lambda r: (-r["n_chars"], r["doc_id"]))[:7]
        got = cluster.filter("db", "docs", {
            "filters": {"and": [{"field": "lang", "value": "zh"}]},
            "sorts": [{"n_chars": "desc"}], "limit": 7})[0]
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in rows]
        assert [r["n_chars"] for r in got] == [r["n_chars"] for r in rows]


class TestActorsServing:
    def test_actor_results_match_local(self, cluster):
        n = cluster.activate("db", "docs")
        assert n == 4
        try:
            for keyword in ("the", "window merge", "*"):
                q = SearchQuery("db", "docs", keyword=keyword, fields=["text"], limit=10)
                got = cluster.search("db", "docs", q)[0]
                cluster_local = RetrievalCluster(cluster.location)
                want = cluster_local.search("db", "docs", q)[0]
                assert [(r["doc_id"], r["_score"]) for r in got] == \
                       [(r["doc_id"], r["_score"]) for r in want]
        finally:
            cluster.deactivate("db", "docs")


class TestLifecycle:
    def test_upsert_delete_truncate(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "t", "st(field(_id,long),field(content,string,analyze),field(name,string))", loc))
        docs = [{"_id": i, "content": f"doc number {i} common", "name": f"n{i}"}
                for i in range(20)]
        assert c.build_from_local("db", "t", docs, key_field="_id",
                                  num_doc_parts=2, num_term_parts=2)
        c.commit("db", "t")
        res = c.search("db", "t", {"keyword": "common", "fields": ["content"], "limit": 30})[0]
        assert len(res) == 20

        # upsert: same _id replaces the old doc (reference M1)
        assert c.build_from_local("db", "t", [{"_id": 3, "content": "replaced text", "name": "n3b"}],
                                  key_field="_id", num_doc_parts=2, num_term_parts=2)
        res = c.search("db", "t", {"keyword": "replaced", "fields": ["content"], "limit": 5})[0]
        assert [r["_id"] for r in res] == [3]
        res = c.search("db", "t", {"keyword": "common", "fields": ["content"], "limit": 30})[0]
        assert len(res) == 19 and 3 not in [r["_id"] for r in res]

        # missing key raises (reference RetrievalMaster.java:116-122)
        with pytest.raises(ValueError):
            c.build_from_local("db", "t", [{"content": "no id"}], key_field="_id")

        # delete_by_ids (M2)
        assert c.delete_by_ids("db", "t", [0, 1])
        res = c.search("db", "t", {"keyword": "common", "fields": ["content"], "limit": 30})[0]
        assert len(res) == 17

        # delete_by_filter (M3)
        assert c.delete_by_filter("db", "t", {"name": "n5"})
        res = c.search("db", "t", {"keyword": "common", "fields": ["content"], "limit": 30})[0]
        assert len(res) == 16 and 5 not in [r["_id"] for r in res]

        # deleted docs must not resurrect through a later upsert rebuild (M2)
        assert c.build_from_local("db", "t", [{"_id": 50, "content": "common new doc",
                                               "name": "n50"}],
                                  key_field="_id", num_doc_parts=2, num_term_parts=2)
        res = c.search("db", "t", {"keyword": "common", "fields": ["content"], "limit": 40})[0]
        got = {r["_id"] for r in res}
        assert 50 in got and not {0, 1, 5} & got

        # truncate (M5)
        assert c.truncate("db", "t")
        with pytest.raises(RuntimeError):
            c.search("db", "t", {"keyword": "common", "fields": ["content"], "limit": 5})

        # close (M6) + cluster_info/restore (M8/M9)
        assert c.close("db", "t")
        info = c.cluster_info()
        assert info["tables"][0]["status"] == "close"
        c2 = RetrievalCluster.restore_from_cluster_info(info)
        assert c2.manifest("db", "t").data["schema"].startswith("st(")


class TestResume:
    def test_partial_rerun_skips_done_partitions(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "docs", DOCS_SCHEMA, loc))
        info1 = c.build_from_parquet("db", "docs", f"{SF}/documents.parquet",
                                     key_field="doc_id", num_doc_parts=4, num_term_parts=4)
        gdir = c.manifest("db", "docs").gen_dir(1)
        part0 = os.path.join(gdir, "docstore", "part-00000.parquet")
        mtime = os.path.getmtime(part0)
        # delete one partial entry; rerun of the same generation rebuilds ONLY it
        os.unlink(os.path.join(gdir, "_partials", "docstore-00001.json"))
        from byzer_retrieval_ray.index.build import build_index
        info2 = build_index(f"{SF}/documents.parquet", c.manifest("db", "docs"),
                            key_field="doc_id", num_doc_parts=4, num_term_parts=4,
                            generation=1)
        assert os.path.getmtime(part0) == mtime          # untouched partition skipped
        assert info2["n_docs"] == info1["n_docs"]
        assert info2["stats"] == info1["stats"]
