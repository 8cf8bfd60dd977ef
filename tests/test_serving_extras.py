"""Round-2 serving additions: IVF vector path (Q2 scale stand-in for HNSW) and
the timed NRT manifest poll (ST2, RetrievalWorker.java:84-89)."""

import time

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

VEC_SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
              "field(vector,array(float)))")


def _vec_cluster(loc, n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "v", VEC_SCHEMA, loc))
    docs = [{"_id": i, "content": f"doc {i}",
             "vector": rng.standard_normal(dim).tolist()} for i in range(n)]
    c.build_from_local("db", "v", docs, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)
    return c, docs


class TestIVFServing:
    def test_exact_when_probing_all_cells(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        q = SearchQuery("db", "v", vector=docs[7]["vector"], vectorField="vector",
                        limit=10)
        brute = c.search("db", "v", q, precision="float64")[0]
        ivf = c.search("db", "v", q, precision="float64",
                       vector_algorithm="ivf", nprobe=8, n_centroids=8)[0]
        assert [(r["_id"], r["_score"]) for r in ivf] == \
               [(r["_id"], r["_score"]) for r in brute]

    def test_recall_improves_with_nprobe(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path), n=400)
        qs = [docs[i]["vector"] for i in (1, 50, 123, 300)]
        recalls = {}
        for nprobe in (1, 4, 16):
            hits = total = 0
            for v in qs:
                q = SearchQuery("db", "v", vector=v, vectorField="vector", limit=10)
                brute = {r["_id"] for r in c.search("db", "v", q)[0]}
                ivf = {r["_id"] for r in c.search(
                    "db", "v", q, vector_algorithm="ivf", nprobe=nprobe,
                    n_centroids=16)[0]}
                hits += len(brute & ivf)
                total += len(brute)
            recalls[nprobe] = hits / total
        assert recalls[16] == 1.0                 # all cells probed ⇒ exact
        assert recalls[4] >= recalls[1]           # recall is monotone in nprobe
        assert recalls[4] >= 0.5                  # probing 1/4 of cells finds most
        # the query's own vector is cosine-1: always in its own probed cell
        q = SearchQuery("db", "v", vector=docs[1]["vector"], vectorField="vector",
                        limit=1)
        top = c.search("db", "v", q, vector_algorithm="ivf", nprobe=1,
                       n_centroids=16)[0]
        assert top[0]["_id"] == 1

    def test_auto_sqrtn_codebook_serving(self, ray_session, tmp_path):
        # n_centroids=0 sizes each bucket's codebook to sqrt(bucket size)
        # trained on all bucket vectors; nprobe >= cells probes everything
        c, docs = _vec_cluster(str(tmp_path), n=400)
        q = SearchQuery("db", "v", vector=docs[7]["vector"], vectorField="vector",
                        limit=10)
        brute = c.search("db", "v", q, precision="float64")[0]
        auto = c.search("db", "v", q, precision="float64",
                        vector_algorithm="ivf", nprobe=1000, n_centroids=0)[0]
        assert [(r["_id"], r["_score"]) for r in auto] == \
               [(r["_id"], r["_score"]) for r in brute]

    def test_actor_mode_ivf(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        q = SearchQuery("db", "v", vector=docs[3]["vector"], vectorField="vector",
                        limit=5)
        local = c.search("db", "v", q, vector_algorithm="ivf", nprobe=8,
                         n_centroids=8)[0]
        c.activate("db", "v", nrt_poll_sec=0)
        try:
            actor = c.search("db", "v", q, vector_algorithm="ivf", nprobe=8,
                             n_centroids=8)[0]
        finally:
            c.deactivate("db", "v")
        assert [(r["_id"], round(r["_score"], 6)) for r in actor] == \
               [(r["_id"], round(r["_score"], 6)) for r in local]


class TestHNSWServing:
    """Round-3: graph ANN behind vector_algorithm="hnsw" (reference Lucene HNSW,
    RetrievalWorker.java:346-366; maxConn=16 / beamWidth=100 defaults)."""

    def test_exact_when_ef_covers_bucket(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        q = SearchQuery("db", "v", vector=docs[7]["vector"], vectorField="vector",
                        limit=10)
        brute = c.search("db", "v", q, precision="float64")[0]
        hnsw = c.search("db", "v", q, precision="float64",
                        vector_algorithm="hnsw", ef=10_000)[0]
        assert [(r["_id"], r["_score"]) for r in hnsw] == \
               [(r["_id"], r["_score"]) for r in brute]

    def test_recall_at_real_ef(self, ray_session, tmp_path):
        # recall@10 >= 0.95 at ef=100 over the sf0.001 embeddings corpus
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        vecs = [list(v) for v in t["embedding"].to_pylist()]
        ids = t["vec_id"].to_pylist()
        loc = str(tmp_path / "emb")
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "e", VEC_SCHEMA, loc))
        c.build_from_local("db", "e", [
            {"_id": i, "content": f"v {i}", "vector": v}
            for i, v in zip(ids, vecs)], key_field="_id",
            num_doc_parts=2, num_term_parts=2)
        hits = total = 0
        for qi in (3, 57, 111, 222, 301):
            q = SearchQuery("db", "e", vector=vecs[qi], vectorField="vector",
                            limit=10)
            brute = {r["_id"] for r in c.search("db", "e", q)[0]}
            hnsw = {r["_id"] for r in c.search("db", "e", q,
                                               vector_algorithm="hnsw", ef=100)[0]}
            hits += len(brute & hnsw)
            total += len(brute)
        assert total > 0 and hits / total >= 0.95, f"recall {hits}/{total}"

    def test_scores_match_brute_on_returned_rows(self, ray_session, tmp_path):
        # approximate path re-scores with brute arithmetic: every returned row's
        # score equals the brute score of that same doc
        c, docs = _vec_cluster(str(tmp_path), n=300)
        q = SearchQuery("db", "v", vector=docs[11]["vector"], vectorField="vector",
                        limit=10)
        brute = {r["_id"]: r["_score"]
                 for r in c.search("db", "v", SearchQuery(
                     "db", "v", vector=docs[11]["vector"], vectorField="vector",
                     limit=300), precision="float64")[0]}
        hnsw = c.search("db", "v", q, precision="float64",
                        vector_algorithm="hnsw", ef=32)[0]
        assert len(hnsw) > 0
        for r in hnsw:
            assert r["_score"] == brute[r["_id"]]

    def test_actor_mode_hnsw(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        q = SearchQuery("db", "v", vector=docs[3]["vector"], vectorField="vector",
                        limit=5)
        local = c.search("db", "v", q, vector_algorithm="hnsw", ef=400)[0]
        c.activate("db", "v", nrt_poll_sec=0)
        try:
            actor = c.search("db", "v", q, vector_algorithm="hnsw", ef=400)[0]
        finally:
            c.deactivate("db", "v")
        assert [(r["_id"], round(r["_score"], 6)) for r in actor] == \
               [(r["_id"], round(r["_score"], 6)) for r in local]


class TestNRTPoll:
    def test_second_process_publish_becomes_visible(self, ray_session, tmp_path):
        """A generation published (and a tombstone written) by ANOTHER
        RetrievalCluster object over the same location becomes visible to a
        running actor pool without an explicit reload (reference: 1 s
        ControlledRealTimeReopenThread)."""
        loc = str(tmp_path)
        c1 = RetrievalCluster(loc)
        c1.create_table(TableSettings(
            "db", "t", "st(field(_id,long),field(content,string,analyze))", loc))
        c1.build_from_local("db", "t", [
            {"_id": i, "content": f"alpha number{i}"} for i in range(6)],
            key_field="_id", num_doc_parts=1, num_term_parts=1)
        c1.activate("db", "t", nrt_poll_sec=0.2)
        try:
            q = {"keyword": "alpha", "fields": ["content"], "limit": 10}
            assert len(c1.search("db", "t", q)[0]) == 6

            # a SECOND cluster object (separate process stand-in) deletes a doc
            c2 = RetrievalCluster(loc)
            assert c2.delete_by_ids("db", "t", [2])
            deadline = time.time() + 5
            while time.time() < deadline:
                res = c1.search("db", "t", q)[0]
                if len(res) == 5:
                    break
                time.sleep(0.1)
            assert len(res) == 5 and 2 not in {r["_id"] for r in res}
        finally:
            c1.deactivate("db", "t")

    def test_second_process_delta_generation_becomes_visible(self, ray_session,
                                                             tmp_path):
        """An APPEND-mode delta generation published by another process must be
        adopted by the polling actor pool (round-2 ADVICE: reload kept the
        original (gen, bucket) pairs, hiding other processes' delta upserts)."""
        loc = str(tmp_path)
        c1 = RetrievalCluster(loc)
        c1.create_table(TableSettings(
            "db", "t", "st(field(_id,string),field(content,string,analyze))", loc))
        c1.build_from_local("db", "t", [
            {"_id": f"d{i}", "content": f"alpha number{i}"} for i in range(6)],
            key_field="_id", num_doc_parts=1, num_term_parts=1)
        c1.activate("db", "t", nrt_poll_sec=0.2)
        try:
            q = {"keyword": "alpha", "fields": ["content"], "limit": 20}
            assert len(c1.search("db", "t", q)[0]) == 6

            # a second cluster object upserts: one replaced key + one new doc,
            # landing as a delta generation (mode="delta" default)
            c2 = RetrievalCluster(loc)
            assert c2.build_from_local("db", "t", [
                {"_id": "d1", "content": "alpha replaced"},
                {"_id": "d9", "content": "alpha fresh"}],
                key_field="_id", num_doc_parts=1, num_term_parts=1)
            deadline = time.time() + 5
            while time.time() < deadline:
                res = c1.search("db", "t", q)[0]
                if len(res) == 7:
                    break
                time.sleep(0.1)
            assert len(res) == 7 and "d9" in {r["_id"] for r in res}
        finally:
            c1.deactivate("db", "t")


TAG_SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
              "field(tag,string),field(vector,array(float)))")


def _tag_cluster(loc, n=600, dim=16, seed=9, mod=3):
    rng = np.random.default_rng(seed)
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "t", TAG_SCHEMA, loc))
    docs = [{"_id": i, "content": f"doc {i}", "tag": f"t{i % mod}",
             "vector": rng.standard_normal(dim).tolist()} for i in range(n)]
    c.build_from_local("db", "t", docs, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)
    return c, docs


class TestFilteredHNSW:
    """Round-4: the filter rides INTO the hnsw traversal as an allowed-mask
    (reference: KnnFloatVectorQuery(field, vec, k, filter),
    RetrievalWorker.java:346-366; flagship filtered-KNN assertion
    LuceneKNNTest.java:104-109), with Lucene's cost-model exact escapes for
    selective filters."""

    def _brute_filtered(self, c, docs, qi, tag, limit=10):
        q = SearchQuery("db", "t", vector=docs[qi]["vector"],
                        vectorField="vector", limit=limit,
                        filters={"and": [{"field": "tag", "value": tag}]})
        return c.search("db", "t", q, precision="float64")[0]

    def test_selective_filter_is_exact(self, ray_session, tmp_path):
        # ~4 passing rows per bucket << ef: the filtered set is scanned
        # directly (Lucene visitedLimit cost model) — ids AND scores equal
        # the brute filtered top-k
        c, docs = _tag_cluster(str(tmp_path), n=600, mod=75)
        for qi in (7, 123, 400):
            brute = self._brute_filtered(c, docs, qi, "t1")
            q = SearchQuery("db", "t", vector=docs[qi]["vector"],
                            vectorField="vector", limit=10,
                            filters={"and": [{"field": "tag", "value": "t1"}]})
            hnsw = c.search("db", "t", q, precision="float64",
                            vector_algorithm="hnsw", ef=64)[0]
            assert [(r["_id"], r["_score"]) for r in hnsw] == \
                   [(r["_id"], r["_score"]) for r in brute]
            assert all(r["_id"] % 75 == 1 for r in hnsw)

    def test_traversal_recall_under_filter(self, ray_session, tmp_path):
        # ~200 passing rows per bucket > ef=48: genuine graph traversal with
        # the allowed-mask; recall@10 vs the filtered brute force stays high
        # and every returned row passes the filter
        c, docs = _tag_cluster(str(tmp_path), n=1200, mod=3)
        hits = total = 0
        for qi in (1, 50, 123, 300, 571):
            brute = {r["_id"] for r in self._brute_filtered(c, docs, qi, "t1")}
            q = SearchQuery("db", "t", vector=docs[qi]["vector"],
                            vectorField="vector", limit=10,
                            filters={"and": [{"field": "tag", "value": "t1"}]})
            hnsw = c.search("db", "t", q, precision="float64",
                            vector_algorithm="hnsw", ef=48)[0]
            assert all(r["_id"] % 3 == 1 for r in hnsw)
            hits += len(brute & {r["_id"] for r in hnsw})
            total += len(brute)
        assert total > 0 and hits / total >= 0.9, f"recall {hits}/{total}"

    def test_scores_match_brute_on_returned_rows(self, ray_session, tmp_path):
        c, docs = _tag_cluster(str(tmp_path), n=1200, mod=3)
        all_scores = {r["_id"]: r["_score"]
                      for r in self._brute_filtered(c, docs, 11, "t2",
                                                    limit=1200)}
        q = SearchQuery("db", "t", vector=docs[11]["vector"],
                        vectorField="vector", limit=10,
                        filters={"and": [{"field": "tag", "value": "t2"}]})
        hnsw = c.search("db", "t", q, precision="float64",
                        vector_algorithm="hnsw", ef=48)[0]
        assert len(hnsw) > 0
        for r in hnsw:
            assert r["_score"] == all_scores[r["_id"]]

    def test_tombstones_excluded_from_traversal(self, ray_session, tmp_path):
        c, docs = _tag_cluster(str(tmp_path), n=400, mod=1)
        q = SearchQuery("db", "t", vector=docs[42]["vector"],
                        vectorField="vector", limit=5)
        top = c.search("db", "t", q, precision="float64",
                       vector_algorithm="hnsw", ef=32)[0]
        victim = top[0]["_id"]
        c.delete_by_ids("db", "t", [victim])
        after = c.search("db", "t", q, precision="float64",
                         vector_algorithm="hnsw", ef=32)[0]
        assert victim not in {r["_id"] for r in after}


class TestSearchAfter:
    """search_after pagination: per-shard cursor filter (Lucene searchAfter)."""

    def _text_cluster(self, loc, n=120):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "p", "st(field(_id,long),field(content,string,analyze))", loc))
        # many score ties (same tf/length classes) to exercise the doc_id
        # tiebreak at page boundaries
        docs = [{"_id": i,
                 "content": ("alpha " * (1 + i % 3) + "beta " * (i % 2)
                             + f"w{i}")}
                for i in range(n)]
        c.build_from_local("db", "p", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_pages_tile_the_full_ranking(self, ray_session, tmp_path):
        c = self._text_cluster(str(tmp_path))
        base = SearchQuery("db", "p", keyword="alpha beta",
                           fields=["content"], limit=120)
        full = c.search("db", "p", base, precision="float64")[0]
        assert len(full) == 120
        pages, cursor = [], None
        while True:
            q = SearchQuery("db", "p", keyword="alpha beta",
                            fields=["content"], limit=25,
                            search_after=cursor)
            page = c.search("db", "p", q, precision="float64")[0]
            if not page:
                break
            pages.extend(page)
            cursor = [float(page[-1]["_score"]), int(page[-1]["doc_id"])]
        assert [(r["doc_id"], r["_score"]) for r in pages] == \
               [(r["doc_id"], r["_score"]) for r in full]

    def test_match_all_and_filter_pages(self, ray_session, tmp_path):
        c = self._text_cluster(str(tmp_path), n=40)
        q1 = SearchQuery("db", "p", keyword="*", limit=15)
        p1 = c.search("db", "p", q1, precision="float64")[0]
        q2 = SearchQuery("db", "p", keyword="*", limit=15,
                         search_after=[float(p1[-1]["_score"]),
                                       int(p1[-1]["doc_id"])])
        p2 = c.search("db", "p", q2, precision="float64")[0]
        ids = [r["doc_id"] for r in p1 + p2]
        assert ids == sorted(ids) and len(set(ids)) == 30

    def test_actor_mode_pages_match_inproc(self, ray_session, tmp_path):
        # the cursor rides q.__dict__ into the serving actors; both modes
        # must return identical pages
        c = self._text_cluster(str(tmp_path), n=60)
        q1 = SearchQuery("db", "p", keyword="alpha beta",
                         fields=["content"], limit=20)
        p1 = c.search("db", "p", q1, precision="float64")[0]
        q2 = SearchQuery("db", "p", keyword="alpha beta",
                         fields=["content"], limit=20,
                         search_after=[float(p1[-1]["_score"]),
                                       int(p1[-1]["doc_id"])])
        inproc = c.search("db", "p", q2, precision="float64")[0]
        c.activate("db", "p")
        actors = c.search("db", "p", q2, precision="float64")[0]
        assert [(r["doc_id"], r["_score"]) for r in actors] == \
               [(r["doc_id"], r["_score"]) for r in inproc]

    def test_vector_cursor_brute_exact_ann_rejected(self, ray_session,
                                                    tmp_path):
        # round-5: cursor pagination works for the EXACT brute vector path
        # (scores are depth-independent, pages tile the global order);
        # approximate ANN paths and hybrid RRF stay rejected
        c, docs = _vec_cluster(str(tmp_path), n=50)
        base = SearchQuery("db", "v", vector=docs[3]["vector"],
                          vectorField="vector", limit=10)
        deep = c.search("db", "v", base, precision="float64")[0]
        last5 = deep[4]
        q2 = SearchQuery("db", "v", vector=docs[3]["vector"],
                         vectorField="vector", limit=5,
                         search_after=[float(last5["_score"]),
                                       int(last5["doc_id"])])
        page2 = c.search("db", "v", q2, precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in page2] == \
               [(r["_id"], r["_score"]) for r in deep[5:10]]
        with pytest.raises(ValueError, match="brute"):
            c.search("db", "v", q2, vector_algorithm="hnsw", ef=8)
        with pytest.raises(ValueError, match="brute"):
            c.search("db", "v", q2, vector_algorithm="ivf", nprobe=2)
        qh = SearchQuery("db", "v", keyword="doc", fields=["content"],
                         vector=docs[3]["vector"], vectorField="vector",
                         limit=5, search_after=[1.0, 0])
        with pytest.raises(ValueError, match="hybrid"):
            c.search("db", "v", qh)


class TestFacets:
    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "f", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string))", loc))
        docs = [{"_id": i, "content": "hit " + ("extra " if i % 5 == 0 else ""),
                 "cat": ["a", "b", "c"][i % 3]}
                for i in range(60)]
        # doc 59 replaced with a null category — must not be counted
        docs[59]["cat"] = None
        c.build_from_local("db", "f", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_counts_whole_match_set(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "f", keyword="hit", fields=["content"], limit=2)
        out = c.facet_counts("db", "f", q, "cat")
        # limit=2 on the QUERY must not bound facet counting: 59 non-null
        # matches, cats a:20 b:20 c:19 (59 % 3 == 2 was the nulled doc)
        assert out == [{"value": "a", "count": 20}, {"value": "b", "count": 20},
                       {"value": "c", "count": 19}]

    def test_filter_and_limit(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "f", keyword="extra", fields=["content"],
                        limit=1)
        out = c.facet_counts("db", "f", q, "cat", limit=2)
        # matches: _id % 5 == 0 → cats of 0,5,...,55 = a,c,b,a,c,b... =
        # {a:4, b:4, c:4} → top-2 by (count desc, value asc)
        assert out == [{"value": "a", "count": 4}, {"value": "b", "count": 4}]

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "f", keyword="hit", fields=["content"], limit=3)
        inproc = c.facet_counts("db", "f", q, "cat")
        c.activate("db", "f")
        assert c.facet_counts("db", "f", q, "cat") == inproc

    def test_vector_rejected(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path), n=30)
        q = SearchQuery("db", "v", vector=docs[1]["vector"],
                        vectorField="vector", limit=5)
        with pytest.raises(ValueError, match="keyword-only"):
            c.facet_counts("db", "v", q, "content")


class TestCollapse:
    """collapse_search: best-scoring hit per distinct stored-field value
    (elasticsearch collapse / Lucene grouping top-1), verified against a
    brute-force python collapse of the FULL ranking."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "g", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string))", loc))
        # vary tf and doc length so scores differ inside every group
        docs = [{"_id": i,
                 "content": " ".join(["hit"] * (1 + i % 4)
                                     + ["pad"] * (i % 7)),
                 "cat": ["a", "b", "c", "d", "e"][i % 5]}
                for i in range(80)]
        docs[17]["cat"] = None
        docs[42]["cat"] = None
        c.build_from_local("db", "g", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    @staticmethod
    def _brute(c, q, field="cat", g=1):
        from collections import Counter
        from dataclasses import replace
        full = c.search("db", "g", replace(q, limit=1_000_000),
                        precision="float64")[0]
        seen, out = Counter(), []
        for r in full:                      # already (score desc, id asc)
            k = r[field]
            if seen[k] >= g:
                continue
            seen[k] += 1
            out.append({"doc_id": r["doc_id"], "_score": r["_score"],
                        field: k})
        return out[: q.limit]

    def test_matches_bruteforce_collapse(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit", fields=["content"],
                        limit=4)
        got = c.collapse_search("db", "g", q, "cat", precision="float64")
        assert got == self._brute(c, q)
        assert len({r["cat"] for r in got}) == len(got)   # distinct keys

    def test_null_keys_form_one_group(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit", fields=["content"],
                        limit=10)
        got = c.collapse_search("db", "g", q, "cat", precision="float64")
        # 5 real cats + exactly one null group (docs 17 and 42 collapse)
        assert len(got) == 6
        assert sum(1 for r in got if r["cat"] is None) == 1
        assert got == self._brute(c, q)

    def test_group_best_below_topk_is_found(self, ray_session, tmp_path):
        # a query whose plain top-limit misses some group entirely: the
        # collapsed result must still surface that group's best doc
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit", fields=["content"],
                        limit=6)
        plain_top = {r["cat"] for r in c.search("db", "g", q,
                                                precision="float64")[0]}
        got = c.collapse_search("db", "g", q, "cat", precision="float64")
        assert {r["cat"] for r in got} >= plain_top | {None} or \
            len({r["cat"] for r in got}) == 6
        assert got == self._brute(c, q)

    def test_group_size_diversified_topk(self, ray_session, tmp_path):
        # group_size > 1 (Lucene DiversifiedTopDocsCollector): limit HITS
        # with at most g per key, rank order preserved
        c = self._cluster(str(tmp_path))
        for g, lim in ((2, 8), (3, 12), (2, 100)):
            q = SearchQuery("db", "g", keyword="hit pad",
                            fields=["content"], limit=lim)
            got = c.collapse_search("db", "g", q, "cat",
                                    precision="float64", group_size=g)
            assert got == self._brute(c, q, g=g), (g, lim)
            from collections import Counter
            mc = Counter(r["cat"] for r in got)
            assert max(mc.values()) <= g

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit pad", fields=["content"],
                        limit=5)
        inproc = c.collapse_search("db", "g", q, "cat", precision="float64")
        c.activate("db", "g")
        assert c.collapse_search("db", "g", q, "cat",
                                 precision="float64") == inproc
        q2 = SearchQuery("db", "g", keyword="hit", fields=["content"],
                         limit=9)
        inproc2 = c.collapse_search("db", "g", q2, "cat",
                                    precision="float64", group_size=2)
        assert inproc2 == self._brute(c, q2, g=2)   # actor-mode diversified

    def test_bad_inputs_rejected(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit", fields=["content"],
                        limit=3)
        with pytest.raises(ValueError, match="not a stored column"):
            c.collapse_search("db", "g", q, "nope")
        v = SearchQuery("db", "g", vector=[1.0] * 4, vectorField="vector",
                        limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.collapse_search("db", "g", v, "cat")


class TestMatrixWeightedRare:
    """Actor-mode parity + input validation for matrix_stats /
    weighted_avg / rare_terms (brute-fold correctness is pinned by the
    aggregation fuzzer, tests/test_agg_fuzz.py)."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "m", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string),field(x,long),field(y,double))", loc))
        docs = [{"_id": i, "content": "hit " + ("rare " if i < 3 else ""),
                 "cat": f"c{i % 9}",
                 "x": None if i % 11 == 0 else i * 3 - 40,
                 "y": float(i % 13) * 1.5 - 4.0}
                for i in range(66)]
        c.build_from_local("db", "m", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "m", keyword="hit", fields=["content"],
                        limit=3)
        ms = c.matrix_stats("db", "m", q, ["x", "y"], precision="float64")
        wa = c.weighted_avg("db", "m", q, "x", "y", precision="float64")
        rt = c.rare_terms("db", "m", q, "cat", max_doc_count=8, limit=10)
        assert ms["doc_count"] == 60          # 66 minus 6 null-x docs
        assert rt and all(o["count"] <= 8 for o in rt)
        named = {"nox": {"field": "x", "exists": False},
                 "neg": {"not": {"field": "y", "min": 0.0}}}
        fa = c.filters_agg("db", "m", q, named, other_bucket=True)
        assert [o["key"] for o in fa] == ["nox", "neg", "_other_"]
        comp = c.composite_agg("db", "m", q, "cat", size=4)
        comp2 = c.composite_agg("db", "m", q, "cat", size=4,
                                after=comp["after_key"])
        assert [b["key"] for b in comp["buckets"]] == \
            ["c0", "c1", "c2", "c3"]
        assert comp2["buckets"][0]["key"] == "c4"
        c.activate("db", "m")
        assert c.matrix_stats("db", "m", q, ["x", "y"],
                              precision="float64") == ms
        assert c.weighted_avg("db", "m", q, "x", "y",
                              precision="float64") == wa
        assert c.rare_terms("db", "m", q, "cat", max_doc_count=8,
                            limit=10) == rt
        assert c.filters_agg("db", "m", q, named, other_bucket=True) == fa
        assert c.composite_agg("db", "m", q, "cat", size=4) == comp

    def test_bad_inputs_rejected(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "m", keyword="hit", fields=["content"],
                        limit=3)
        with pytest.raises(ValueError, match="at least two"):
            c.matrix_stats("db", "m", q, ["x"])
        with pytest.raises(ValueError, match="distinct"):
            c.matrix_stats("db", "m", q, ["x", "x"])
        with pytest.raises(ValueError, match="max_doc_count"):
            c.rare_terms("db", "m", q, "cat", max_doc_count=0)
        v = SearchQuery("db", "m", vector=[1.0] * 4, vectorField="vector",
                        limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.weighted_avg("db", "m", v, "x", "y")


class TestBoosting:
    """boosting_search (elasticsearch boosting query): positive hits also
    matching the negative query are demoted score × β — soft demotion over
    the FULL match set, verified against a brute fold of two plain
    searches."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "b", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string))", loc))
        docs = [{"_id": i,
                 "content": " ".join(["hit"] * (1 + i % 4)
                                     + ["bad"] * (i % 3)
                                     + ["ugly", "worse"] * (i % 2)),
                 "cat": ["a", "b"][i % 2]}
                for i in range(70)]
        c.build_from_local("db", "b", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def _brute(self, c, q, neg_kw, beta):
        from dataclasses import replace
        full = c.search("db", "b", replace(q, limit=1_000_000),
                        precision="float64")[0]
        neg = {r["doc_id"] for r in
               c.search("db", "b",
                        replace(q, keyword=neg_kw, filters={},
                                limit=1_000_000),
                        precision="float64")[0]}
        out = [{"doc_id": r["doc_id"],
                "_score": r["_score"] * beta if r["doc_id"] in neg
                else r["_score"]}
               for r in full]
        out.sort(key=lambda r: (-r["_score"], r["doc_id"]))
        return [(r["doc_id"], r["_score"]) for r in out[: q.limit]]

    def test_matches_brute_demotion(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "b", keyword="hit bad", fields=["content"],
                        limit=10)
        for neg, beta in (("bad", 0.5), ('"ugly worse"', 0.25),
                          ("bad | ugly", 0.0), ("absentterm", 0.7)):
            got = c.boosting_search("db", "b", q, neg, negative_boost=beta,
                                    precision="float64")
            assert [(r["doc_id"], r["_score"]) for r in got] == \
                self._brute(c, q, neg, beta), (neg, beta)

    def test_demotion_is_not_exclusion(self, ray_session, tmp_path):
        # β=0 zeroes demoted docs but keeps them rankable; the match SET
        # equals the plain query's
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "b", keyword="hit", fields=["content"],
                        limit=1_000_000)
        plain = {r["doc_id"] for r in c.search("db", "b", q,
                                               precision="float64")[0]}
        got = c.boosting_search("db", "b", q, "bad", negative_boost=0.0,
                                precision="float64")
        assert {r["doc_id"] for r in got} == plain

    def test_filters_apply_to_positive_only(self, ray_session, tmp_path):
        # the positive query's filter narrows the match set; the negative
        # query never does (demotion ≠ exclusion) — every result must pass
        # the filter, demoted or not
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "b", keyword="hit", fields=["content"],
                        filters={"and": [{"field": "cat", "value": "a"}]},
                        limit=1_000_000)
        got = c.boosting_search("db", "b", q, "bad", negative_boost=0.5,
                                precision="float64")
        assert got and all(r["cat"] == "a" for r in got)
        assert [(r["doc_id"], r["_score"]) for r in got] == \
            self._brute(c, q, "bad", 0.5)

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "b", keyword="hit bad", fields=["content"],
                        limit=7)
        inproc = c.boosting_search("db", "b", q, "ugly",
                                   negative_boost=0.3, precision="float64")
        c.activate("db", "b")
        assert c.boosting_search("db", "b", q, "ugly", negative_boost=0.3,
                                 precision="float64") == inproc

    def test_bad_inputs_rejected(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "b", keyword="hit", fields=["content"],
                        limit=3)
        with pytest.raises(ValueError, match="negative_boost"):
            c.boosting_search("db", "b", q, "bad", negative_boost=1.5)
        v = SearchQuery("db", "b", vector=[1.0] * 4, vectorField="vector",
                        limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.boosting_search("db", "b", v, "bad")


class TestDisMax:
    """dis_max_tie_breaker (Lucene DisjunctionMaxQuery across fields): each
    clause's per-field scores fold as max + tb·(sum − max); verified against
    an explain()-based brute fold (explain lists the sum-path scorers in
    clause order, consecutive per-field runs per clause — the exact grouping
    the engine's TAAT dis_max path uses)."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "d", "st(field(_id,long),field(title,string,analyze),"
            "field(body,string,analyze))", loc))
        docs = [{"_id": i,
                 "title": " ".join(["alpha"] * (1 + i % 2)
                                   + ["beta"] * (i % 3)),
                 "body": " ".join(["alpha"] * (i % 4)
                                  + ["gamma"] * (1 + i % 5)
                                  + ["beta"] * (i % 2))}
                for i in range(90)]
        c.build_from_local("db", "d", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def _brute(self, c, q, tb):
        from dataclasses import replace
        full = c.search("db", "d", replace(q, limit=1_000_000),
                        precision="float64")[0]
        out = []
        for r in full:
            ex = c.explain("db", "d", replace(q, dis_max_tie_breaker=None),
                           r["doc_id"], precision="float64")
            total, i, cl = 0.0, 0, ex["clauses"]
            while i < len(cl):
                j = i
                while j < len(cl) and cl[j]["clause"] == cl[i]["clause"]:
                    j += 1
                gsum, gmax = 0.0, 0.0
                for k in range(i, j):
                    gsum += cl[k]["score"]
                    gmax = max(gmax, cl[k]["score"])
                total += gmax + tb * (gsum - gmax)
                i = j
            out.append({"doc_id": r["doc_id"], "_score": total})
        out.sort(key=lambda r: (-r["_score"], r["doc_id"]))
        return out[: q.limit]

    def test_matches_explain_fold(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        for tb in (0.0, 0.3, 1.0):
            from dataclasses import replace
            q = SearchQuery("db", "d", keyword="alpha beta gamma",
                            fields=["title", "body"], limit=8)
            got = c.search("db", "d", replace(q, dis_max_tie_breaker=tb),
                           precision="float64")[0]
            want = self._brute(c, q, tb)
            assert [r["doc_id"] for r in got] == \
                [r["doc_id"] for r in want], tb
            for g, w in zip(got, want):
                assert g["_score"] == w["_score"], (tb, g, w)

    def test_single_field_unchanged(self, ray_session, tmp_path):
        # one field: max == sum per clause, so any tb reproduces the plain
        # ranking exactly (scores included)
        c = self._cluster(str(tmp_path))
        from dataclasses import replace
        q = SearchQuery("db", "d", keyword="alpha gamma", fields=["body"],
                        limit=10)
        plain = c.search("db", "d", q, precision="float64")[0]
        for tb in (0.0, 0.5):
            assert c.search("db", "d", replace(q, dis_max_tie_breaker=tb),
                            precision="float64")[0] == plain

    def test_gating_unaffected(self, ray_session, tmp_path):
        # +must / -not and phrases gate identically under dis_max — only
        # scores change; the match SET is the sum path's
        c = self._cluster(str(tmp_path))
        from dataclasses import replace
        q = SearchQuery("db", "d", keyword='alpha +beta -"gamma gamma"',
                        fields=["title", "body"], limit=1_000_000)
        sum_ids = {r["doc_id"] for r in c.search("db", "d", q,
                                                 precision="float64")[0]}
        dm_ids = {r["doc_id"]
                  for r in c.search("db", "d",
                                    replace(q, dis_max_tie_breaker=0.2),
                                    precision="float64")[0]}
        assert sum_ids == dm_ids and sum_ids

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "d", keyword="alpha beta gamma",
                        fields=["title", "body"], limit=8,
                        dis_max_tie_breaker=0.4)
        inproc = c.search("db", "d", q, precision="float64")[0]
        c.activate("db", "d")
        assert c.search("db", "d", q, precision="float64")[0] == inproc

    def test_bad_inputs_rejected(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "d", keyword="alpha", fields=["title"],
                        limit=3, dis_max_tie_breaker=1.5)
        with pytest.raises(ValueError, match="must be in"):
            c.search("db", "d", q)
        q2 = SearchQuery("db", "d", keyword="alpha", limit=3,
                         combined_fields=["title", "body"],
                         dis_max_tie_breaker=0.3)
        with pytest.raises(ValueError, match="incompatible"):
            c.search("db", "d", q2)
        q3 = SearchQuery("db", "d", keyword="alpha", fields=["title"],
                         limit=3, dis_max_tie_breaker=0.3)
        with pytest.raises(ValueError, match="does not support dis_max"):
            c.explain("db", "d", q3, 0)


class TestTopHits:
    """top_hits: elasticsearch terms + top_hits two-phase aggregation —
    top num_keys field values by match count (count desc, value asc),
    then per key its top per_key hits (score desc, doc_id asc) — verified
    against a brute-force fold of the FULL ranking."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "g", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string))", loc))
        docs = [{"_id": i,
                 "content": " ".join(["hit"] * (1 + i % 4)
                                     + ["pad"] * (i % 7)),
                 "cat": ["a", "b", "c", "d", "e"][i % 5]}
                for i in range(80)]
        docs[17]["cat"] = None
        docs[42]["cat"] = None
        c.build_from_local("db", "g", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    @staticmethod
    def _brute(c, q, field="cat", num_keys=10, per_key=3):
        from collections import Counter
        from dataclasses import replace
        full = c.search("db", "g", replace(q, limit=1_000_000),
                        precision="float64")[0]
        cnt = Counter(r[field] for r in full if r[field] is not None)
        keys = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:num_keys]
        return [{"key": k, "count": n,
                 "hits": [{"doc_id": r["doc_id"], "_score": r["_score"]}
                          for r in full if r[field] == k][:per_key]}
                for k, n in keys]

    def test_matches_bruteforce(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        for nk, pk in ((3, 2), (5, 1), (2, 4), (10, 100)):
            q = SearchQuery("db", "g", keyword="hit pad",
                            fields=["content"], limit=3)
            got = c.top_hits("db", "g", q, "cat", num_keys=nk, per_key=pk,
                             precision="float64")
            assert got == self._brute(c, q, num_keys=nk, per_key=pk), (nk, pk)

    def test_query_limit_does_not_bound(self, ray_session, tmp_path):
        # the QUERY's limit=1 must not bound either phase: counts cover the
        # whole match set and per-key hits may rank far below the top-1
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit", fields=["content"],
                        limit=1)
        got = c.top_hits("db", "g", q, "cat", num_keys=5, per_key=2,
                         precision="float64")
        assert got == self._brute(c, q, num_keys=5, per_key=2)
        # every doc matches 'hit'; 78 non-null-cat matches split a..e
        assert sum(b["count"] for b in got) == 78
        assert all(len(b["hits"]) == 2 for b in got)

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit pad", fields=["content"],
                        limit=3)
        inproc = c.top_hits("db", "g", q, "cat", num_keys=4, per_key=2,
                            precision="float64")
        assert inproc == self._brute(c, q, num_keys=4, per_key=2)
        c.activate("db", "g")
        assert c.top_hits("db", "g", q, "cat", num_keys=4, per_key=2,
                          precision="float64") == inproc

    def test_bad_inputs_rejected(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "g", keyword="hit", fields=["content"],
                        limit=3)
        v = SearchQuery("db", "g", vector=[1.0] * 4, vectorField="vector",
                        limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.top_hits("db", "g", v, "cat")
        # multi-valued key fields are rejected in phase 2 (a hit would land
        # in several buckets)
        c2 = RetrievalCluster(str(tmp_path) + "_mv")
        c2.create_table(TableSettings(
            "db", "m", "st(field(_id,long),field(content,string,analyze),"
            "field(tags,array(string)))", str(tmp_path) + "_mv"))
        c2.build_from_local(
            "db", "m",
            [{"_id": i, "content": "hit", "tags": ["x", "y"]}
             for i in range(10)],
            key_field="_id", num_doc_parts=2, num_term_parts=1)
        qm = SearchQuery("db", "m", keyword="hit", fields=["content"],
                         limit=3)
        with pytest.raises(ValueError, match="list-typed"):
            c2.top_hits("db", "m", qm, "tags")


class TestFunctionScore:
    """function_search: elasticsearch field_value_factor rescoring —
    score' = bm25 ⊗ modifier(factor × field), verified against a brute
    python rescore of the full ranking."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "fs", "st(field(_id,long),field(content,string,analyze),"
            "field(pop,long))", loc))
        docs = [{"_id": i,
                 "content": " ".join(["hit"] * (1 + i % 3)
                                     + ["pad"] * (i % 5)),
                 "pop": (i * 37) % 100}
                for i in range(50)]
        docs[13]["pop"] = None
        c.build_from_local("db", "fs", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c, docs

    @staticmethod
    def _brute(c, q, docs, spec):
        import numpy as np
        from dataclasses import replace
        full = c.search("db", "fs", replace(q, limit=1_000_000),
                        precision="float64")[0]
        pop = {d["_id"]: d["pop"] for d in docs}
        mods = {"none": lambda v: v, "log1p": lambda v: np.log(1.0 + v),
                "sqrt": np.sqrt, "square": np.square,
                "reciprocal": lambda v: 1.0 / v}
        out = []
        for r in full:
            v = pop.get(r["_id"])
            v = spec.get("missing", 1.0) if v is None else float(v)
            b = float(mods[spec.get("modifier", "none")](
                spec.get("factor", 1.0) * v))
            s = (r["_score"] * b if spec.get("mode", "multiply") == "multiply"
                 else r["_score"] + b)
            out.append((r["_id"], s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[: q.limit]

    @pytest.mark.parametrize("spec", [
        {"field": "pop", "modifier": "log1p", "mode": "multiply"},
        {"field": "pop", "modifier": "sqrt", "factor": 0.5, "mode": "sum"},
        {"field": "pop", "modifier": "square", "factor": 0.01,
         "mode": "multiply", "missing": 3.0},
        {"field": "pop", "mode": "sum"},
    ])
    def test_matches_bruteforce_rescore(self, ray_session, tmp_path, spec):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit pad", fields=["content"],
                        limit=7)
        got = [(r["_id"], r["_score"])
               for r in c.function_search("db", "fs", q, spec,
                                          precision="float64")]
        want = self._brute(c, q, docs, spec)
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), gi

    def test_reorders_vs_plain_bm25(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit", fields=["content"],
                        limit=10)
        plain = [r["_id"] for r in c.search("db", "fs", q,
                                            precision="float64")[0]]
        boosted = [r["_id"] for r in c.function_search(
            "db", "fs", q, {"field": "pop", "modifier": "log1p"},
            precision="float64")]
        assert plain != boosted            # the factor actually reranks

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit pad", fields=["content"],
                        limit=6)
        spec = {"field": "pop", "modifier": "log1p", "mode": "multiply"}
        inproc = c.function_search("db", "fs", q, spec, precision="float64")
        c.activate("db", "fs")
        assert c.function_search("db", "fs", q, spec,
                                 precision="float64") == inproc

    def test_bad_inputs_rejected(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit", fields=["content"],
                        limit=3)
        with pytest.raises(ValueError, match="needs a 'field'"):
            c.function_search("db", "fs", q, {"modifier": "log1p"})
        with pytest.raises(ValueError, match="unknown modifier"):
            c.function_search("db", "fs", q, {"field": "pop",
                                              "modifier": "exp"})
        with pytest.raises(ValueError, match="not a stored column"):
            c.function_search("db", "fs", q, {"field": "nope"})


class TestDecayScore:
    """function_search decay functions (elasticsearch gauss/exp/linear
    shape): score' = bm25 × decay(|v − origin| adjusted by offset/scale),
    nulls decaying to 1.0 — verified against a brute python rescore."""

    _cluster = TestFunctionScore._cluster

    @staticmethod
    def _brute(c, q, docs, spec):
        import numpy as np
        from dataclasses import replace
        full = c.search("db", "fs", replace(q, limit=1_000_000),
                        precision="float64")[0]
        pop = {d["_id"]: d["pop"] for d in docs}
        o, s = float(spec["origin"]), float(spec["scale"])
        off = float(spec.get("offset", 0.0))
        dec = float(spec.get("decay", 0.5))
        out = []
        for r in full:
            v = pop.get(r["_id"])
            if v is None:
                b = 1.0
            else:
                d = max(0.0, abs(float(v) - o) - off)
                rr = d / s
                if spec["decay_function"] == "gauss":
                    b = float(np.exp(np.log(dec) * (rr * rr)))
                elif spec["decay_function"] == "exp":
                    b = float(np.exp(np.log(dec) * rr))
                else:
                    b = max(0.0, 1.0 - (1.0 - dec) * rr)
            s2 = (r["_score"] * b
                  if spec.get("mode", "multiply") == "multiply"
                  else r["_score"] + b)
            out.append((r["_id"], s2))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[: q.limit]

    @pytest.mark.parametrize("spec", [
        {"decay_function": "gauss", "field": "pop", "origin": 50,
         "scale": 25},
        {"decay_function": "exp", "field": "pop", "origin": 0, "scale": 40,
         "decay": 0.3},
        {"decay_function": "linear", "field": "pop", "origin": 80,
         "scale": 30, "offset": 10, "mode": "sum"},
    ])
    def test_matches_bruteforce_rescore(self, ray_session, tmp_path, spec):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit pad", fields=["content"],
                        limit=8)
        got = [(r["_id"], r["_score"])
               for r in c.function_search("db", "fs", q, spec,
                                          precision="float64")]
        want = self._brute(c, q, docs, spec)
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), gi

    def test_null_field_decays_to_one(self, ray_session, tmp_path):
        # doc 13 has pop=None: its decayed score must equal its plain BM25
        c, docs = self._cluster(str(tmp_path))
        from dataclasses import replace
        q = SearchQuery("db", "fs", keyword="hit", fields=["content"],
                        limit=50)
        plain = {r["_id"]: r["_score"]
                 for r in c.search("db", "fs", replace(q, limit=1_000_000),
                                   precision="float64")[0]}
        spec = {"decay_function": "gauss", "field": "pop", "origin": 50,
                "scale": 10}
        rows = c.function_search("db", "fs", q, spec, precision="float64")
        r13 = [r for r in rows if r["_id"] == 13]
        assert r13 and r13[0]["_score"] == plain[13]

    def test_linear_floors_at_zero(self, ray_session, tmp_path):
        # tiny scale: every value except origin decays to exactly 0.0
        c, docs = self._cluster(str(tmp_path))
        spec = {"decay_function": "linear", "field": "pop", "origin": 1,
                "scale": 0.5, "decay": 0.5}
        q = SearchQuery("db", "fs", keyword="hit", fields=["content"],
                        limit=50)
        rows = c.function_search("db", "fs", q, spec, precision="float64")
        zeroed = [r for r in rows if r["pop"] not in (None, 1)]
        assert zeroed and all(r["_score"] == 0.0 for r in zeroed)

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit pad", fields=["content"],
                        limit=6)
        spec = {"decay_function": "exp", "field": "pop", "origin": 30,
                "scale": 20}
        inproc = c.function_search("db", "fs", q, spec, precision="float64")
        c.activate("db", "fs")
        assert c.function_search("db", "fs", q, spec,
                                 precision="float64") == inproc

    def test_bad_specs_rejected(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "fs", keyword="hit", fields=["content"],
                        limit=3)
        with pytest.raises(ValueError, match="unknown decay_function"):
            c.function_search("db", "fs", q, {"decay_function": "log",
                                              "field": "pop", "origin": 0,
                                              "scale": 1})
        with pytest.raises(ValueError, match="'origin' and 'scale'"):
            c.function_search("db", "fs", q, {"decay_function": "gauss",
                                              "field": "pop"})
        with pytest.raises(ValueError, match="must be > 0"):
            c.function_search("db", "fs", q, {"decay_function": "gauss",
                                              "field": "pop", "origin": 0,
                                              "scale": 0})
        with pytest.raises(ValueError, match="in \\(0, 1\\)"):
            c.function_search("db", "fs", q, {"decay_function": "gauss",
                                              "field": "pop", "origin": 0,
                                              "scale": 1, "decay": 1.0})


class TestSignificantTerms:
    """significant_terms: JLH-scored foreground-vs-corpus term skew over the
    full match set, verified against a brute python fold."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "sig", "st(field(_id,long),"
            "field(content,string,analyze))", loc))
        docs = []
        for i in range(90):
            words = ["common", "filler"]
            if i % 3 == 0:
                words += ["hit", "signal"]       # signal rides with hit
            if i % 9 == 0:
                words += ["strong"]              # only ever in hit docs
            if i % 2 == 0:
                words += ["background"]          # uncorrelated
            docs.append({"_id": i, "content": " ".join(words)})
        c.build_from_local("db", "sig", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c, docs

    @staticmethod
    def _brute(docs, match_terms, limit=10, min_doc_count=1):
        toks = {d["_id"]: set(d["content"].split()) for d in docs}
        fg_ids = [i for i, tt in toks.items() if tt & match_terms]
        fgt, n = len(fg_ids), len(docs)
        vocab = set().union(*(toks[i] for i in fg_ids))
        out = []
        for t in vocab:
            fg = sum(1 for i in fg_ids if t in toks[i])
            bg = sum(1 for tt in toks.values() if t in tt)
            if fg < min_doc_count:
                continue
            a, b = fg / fgt, bg / n
            if a <= b:
                continue
            out.append({"term": t, "score": (a - b) * (a / b),
                        "fg_count": fg, "bg_count": bg})
        out.sort(key=lambda r: (-r["score"], r["term"]))
        return out[:limit]

    def test_matches_brute_fold(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "sig", keyword="hit", fields=["content"],
                        limit=3)   # query limit must NOT bound the agg
        got = c.significant_terms("db", "sig", q, "content")
        want = self._brute(docs, {"hit"})
        assert [r["term"] for r in got] == [r["term"] for r in want]
        for g, w in zip(got, want):
            assert g["fg_count"] == w["fg_count"]
            assert g["bg_count"] == w["bg_count"]
            assert g["score"] == pytest.approx(w["score"], rel=1e-12)
        # the engineered skew: hit/signal perfectly foreground, strong too
        top3 = {r["term"] for r in got[:3]}
        assert top3 == {"hit", "signal", "strong"}

    def test_uncorrelated_terms_excluded(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "sig", keyword="hit", fields=["content"],
                        limit=10)
        got = c.significant_terms("db", "sig", q, "content", limit=50)
        terms = {r["term"] for r in got}
        # common/filler appear in EVERY doc: fg rate == bg rate → excluded
        assert "common" not in terms and "filler" not in terms

    def test_min_doc_count(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "sig", keyword="hit", fields=["content"],
                        limit=10)
        lo = c.significant_terms("db", "sig", q, "content", limit=50,
                                 min_doc_count=1)
        hi = c.significant_terms("db", "sig", q, "content", limit=50,
                                 min_doc_count=11)
        assert {r["term"] for r in hi} <= {r["term"] for r in lo}
        assert all(r["fg_count"] >= 11 for r in hi)
        assert hi == self._brute(docs, {"hit"}, limit=50, min_doc_count=11)

    def test_shard_min_doc_count_prunes_before_ship(self, ray_session,
                                                    tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "sig", keyword="hit", fields=["content"],
                        limit=10)
        full = c.significant_terms("db", "sig", q, "content", limit=50)
        cut = c.significant_terms("db", "sig", q, "content", limit=50,
                                  shard_min_doc_count=2)
        assert {r["term"] for r in cut} <= {r["term"] for r in full}
        # hit/signal appear ~10× per bucket — far above the cut, so their
        # rows (including exact fg counts) survive unchanged
        byterm = {r["term"]: r for r in cut}
        fullby = {r["term"]: r for r in full}
        for t in ("hit", "signal"):
            assert byterm[t] == fullby[t]

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "sig", keyword="hit background",
                        fields=["content"], limit=5)
        inproc = c.significant_terms("db", "sig", q, "content")
        c.activate("db", "sig")
        assert c.significant_terms("db", "sig", q, "content") == inproc
        assert c.significant_terms("db", "sig", q, "content",
                                   shard_min_doc_count=2) == \
            c.significant_terms("db", "sig", q, "content",
                                shard_min_doc_count=2)

    def test_vector_rejected(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path), n=30)
        q = SearchQuery("db", "v", vector=docs[1]["vector"],
                        vectorField="vector", limit=5)
        with pytest.raises(ValueError, match="keyword-only"):
            c.significant_terms("db", "v", q, "content")

    def test_non_analyzed_field_rejected(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path), n=30)
        q = SearchQuery("db", "v", keyword="doc", fields=["content"],
                        limit=5)
        with pytest.raises(ValueError, match="must be analyzed"):
            c.significant_terms("db", "v", q, "_id")


class TestCardinality:
    """cardinality: HLL distinct-count of a stored field over the full
    match set — the fold across buckets must equal ONE sketch built from
    the brute-force matched key set (registers merge associatively)."""

    def _cluster(self, loc, n=70):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "cd", "st(field(_id,long),field(content,string,analyze),"
            "field(site,string))", loc))
        docs = [{"_id": i, "content": "hit" if i % 2 == 0 else "miss",
                 "site": None if i % 17 == 0 else f"site-{i % 23}"}
                for i in range(n)]
        c.build_from_local("db", "cd", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c, docs

    @staticmethod
    def _brute(c, docs, p=12):
        from byzer_retrieval_ray.ops.hll import _estimate, _registers
        site = {d["_id"]: d["site"] for d in docs}
        hits = c.search("db", "cd", {"keyword": "hit",
                                     "fields": ["content"],
                                     "limit": 10_000})[0]
        keys = [site[r["_id"]] for r in hits if site[r["_id"]] is not None]
        return _estimate(_registers(keys, p), p)

    def test_fold_equals_single_sketch(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "cd", keyword="hit", fields=["content"],
                        limit=3)     # query limit must not bound the agg
        got = c.cardinality("db", "cd", q, "site")
        want = self._brute(c, docs)
        assert got == want
        # 35 matching docs, sites (i%23 over even non-null i) → small-range
        # branch, estimate within HLL error of the true distinct count
        true = len({d["site"] for d in docs
                    if d["_id"] % 2 == 0 and d["site"] is not None})
        assert got["branch"] == "linear"
        assert abs(got["estimate"] - true) / true < 0.15

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "cd", keyword="hit", fields=["content"],
                        limit=5)
        inproc = c.cardinality("db", "cd", q, "site", p=10)
        c.activate("db", "cd")
        assert c.cardinality("db", "cd", q, "site", p=10) == inproc

    def test_bad_inputs(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path), n=20)
        q = SearchQuery("db", "cd", keyword="hit", fields=["content"],
                        limit=5)
        with pytest.raises(ValueError, match="4 <= p <= 20"):
            c.cardinality("db", "cd", q, "site", p=2)
        with pytest.raises(ValueError, match="not a stored column"):
            c.cardinality("db", "cd", q, "nope")


class TestHighlight:
    """Best-passage snippets (Lucene UnifiedHighlighter shape, simplified):
    the window-token window with the most DISTINCT query terms, ties to the
    earliest start; snippet text joins tokens with single spaces."""

    def test_best_window_unit(self):
        from byzer_retrieval_ray.functions.highlight import (best_window,
                                                             make_snippet)
        toks = "x x merge x x sort merge x".split()
        # window=3: [4,7)='x sort merge' has both distinct terms, earliest
        # window with 2 distinct is [3,6)='x x sort'? no — contains only sort.
        # cum windows: starts 0..5; both terms first co-occur at start 4.
        s, m = best_window(toks, {"merge", "sort"}, 3)
        assert (s, m) == (4, 2)
        # ties → earliest: single term, window 2, first hit at index 2
        s, m = best_window(toks, {"merge"}, 2)
        assert (s, m) == (1, 1)
        # doc shorter than window → whole doc, matched counted once
        snip, m = make_snippet("sort sort", {"sort"}, 8)
        assert snip == "sort sort" and m == 1
        # empty doc / no terms
        assert make_snippet("", {"a"}, 4) == ("", 0)
        assert make_snippet("a b c", set(), 2) == ("a b", 0)

    def _cluster(self, loc, n=80):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "h", "st(field(_id,long),field(text,string,analyze))", loc))
        docs = [{"_id": i,
                 "text": (f"pad{i} filler words here merge happens then "
                          + "x " * (i % 7) + "sort concludes the run "
                          + f"tail{i}")}
                for i in range(n)]
        c.build_from_local("db", "h", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_snippets_and_actor_parity(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "h", keyword="merge sort", fields=["text"],
                        limit=10)
        out = c.highlight("db", "h", q, "text", window=6,
                          precision="float64")
        assert len(out) == 10
        hits = c.search("db", "h", q, precision="float64")[0]
        assert [o["doc_id"] for o in out] == [h["doc_id"] for h in hits]
        for o in out:
            # every snippet is <= 6 tokens from the doc, contains >= 1 term
            toks = o["snippet"].split()
            assert len(toks) <= 6 and o["n_matched"] >= 1
            assert "merge" in toks or "sort" in toks
        # doc 0 has 'merge happens then sort' adjacent (i%7==0 → no x pad):
        # a 6-window catches both
        by_id = {o["doc_id"]: o for o in out}
        if 0 in by_id:
            assert by_id[0]["n_matched"] == 2
        c.activate("db", "h")
        actor_out = c.highlight("db", "h", q, "text", window=6,
                                precision="float64")
        assert actor_out == out

    def test_phrase_members_highlight(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path), n=30)
        q = SearchQuery("db", "h", keyword='"merge happens"', fields=["text"],
                        limit=5)
        out = c.highlight("db", "h", q, "text", window=4,
                          precision="float64")
        assert out and all(o["n_matched"] == 2 for o in out)
        assert all("merge happens" in o["snippet"] for o in out)

    def test_vector_rejected(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path), n=20)
        q = SearchQuery("db", "v", vector=docs[0]["vector"],
                        vectorField="vector", limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.highlight("db", "v", q, "content")


class TestFieldStats:
    """Numeric stats over the ENTIRE match set (Lucene stats-aggregation
    shape): per-bucket (count,min,max,sum) partials, O(buckets) driver fold."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "s", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc))
        docs = [{"_id": i, "content": "hit " + ("extra " if i % 5 == 0 else ""),
                 "n": i * 10}
                for i in range(60)]
        docs[7]["n"] = None          # null must not count
        c.build_from_local("db", "s", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_whole_match_set_and_nulls(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "s", keyword="hit", fields=["content"], limit=2)
        st = c.field_stats("db", "s", q, "n")
        # limit=2 must not bound stats; 60 matches minus the null = 59
        vals = [i * 10 for i in range(60) if i != 7]
        assert st == {"count": 59, "min": 0, "max": 590, "sum": sum(vals),
                      "mean": sum(vals) / 59}
        assert isinstance(st["sum"], int)     # integer fold stays exact

    def test_filterlike_query_and_actor_parity(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "s", keyword="extra", fields=["content"],
                        limit=1)
        inproc = c.field_stats("db", "s", q, "n")
        # matches: _id % 5 == 0 -> n = 0,50,...,550 (12 values, none null)
        vals = [i * 10 for i in range(0, 60, 5)]
        assert inproc == {"count": 12, "min": 0, "max": 550, "sum": sum(vals),
                          "mean": sum(vals) / 12}
        c.activate("db", "s")
        assert c.field_stats("db", "s", q, "n") == inproc

    def test_empty_and_vector_rejected(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "s", keyword="zzz_absent", fields=["content"],
                        limit=5)
        st = c.field_stats("db", "s", q, "n")
        assert st == {"count": 0, "min": None, "max": None, "sum": None,
                      "mean": None}
        c2, docs = _vec_cluster(str(tmp_path) + "/v", n=20)
        qv = SearchQuery("db", "v", vector=docs[0]["vector"],
                         vectorField="vector", limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c2.field_stats("db", "v", qv, "_id")


class TestExtendedStats:
    """extended_stats: field_stats plus Σv², population variance and std
    (the ES naive float64 formula), folded from per-bucket partials."""

    _cluster = TestFieldStats._cluster

    def test_moments_match_numpy(self, ray_session, tmp_path):
        import math
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "s", keyword="hit", fields=["content"], limit=2)
        st = c.extended_stats("db", "s", q, "n")
        vals = np.array([i * 10 for i in range(60) if i != 7], np.float64)
        assert st["count"] == 59 and st["min"] == 0 and st["max"] == 590
        assert st["sum"] == int(vals.sum())
        assert st["sum_of_squares"] == pytest.approx(
            float((vals * vals).sum()), rel=1e-12)
        want_var = float((vals * vals).sum()) / 59 - (vals.sum() / 59) ** 2
        assert st["variance"] == pytest.approx(want_var, rel=1e-9)
        assert st["std_deviation"] == pytest.approx(math.sqrt(want_var),
                                                    rel=1e-9)

    def test_actor_parity_and_empty(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "s", keyword="extra", fields=["content"],
                        limit=1)
        inproc = c.extended_stats("db", "s", q, "n")
        c.activate("db", "s")
        try:
            assert c.extended_stats("db", "s", q, "n") == inproc
        finally:
            c.deactivate("db", "s")
        q0 = SearchQuery("db", "s", keyword="zzz_absent", fields=["content"],
                         limit=5)
        st = c.extended_stats("db", "s", q0, "n")
        assert st["count"] == 0 and st["variance"] is None

    def test_constant_column_zero_variance(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "k", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc))
        c.build_from_local("db", "k", [
            {"_id": i, "content": "hit", "n": 7} for i in range(20)],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        q = SearchQuery("db", "k", keyword="hit", fields=["content"], limit=1)
        st = c.extended_stats("db", "k", q, "n")
        # the max(0, ·) clamp: naive Σv²/n − mean² may round a hair negative
        assert st["variance"] == 0.0 and st["std_deviation"] == 0.0


class TestExportMatches:
    """Search → Dataset bridge: every match streams out; per-bucket match ids
    live in the object store, probed by docstore read tasks."""

    def _cluster(self, loc, n=90):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "e", "st(field(_id,long),field(content,string,analyze),"
            "field(tag,string))", loc))
        docs = [{"_id": i,
                 "content": ("alpha " if i % 3 == 0 else "beta ") + f"w{i}",
                 "tag": f"t{i % 4}"} for i in range(n)]
        c.build_from_local("db", "e", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_full_match_set_streams(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "e", keyword="alpha", fields=["content"],
                        limit=2)   # limit must NOT bound the export
        ds = c.export_matches("db", "e", q, columns=["_id", "tag"])
        df = ds.to_pandas().sort_values("_id").reset_index(drop=True)
        assert list(df["_id"]) == [i for i in range(90) if i % 3 == 0]
        assert list(df.columns) == ["_id", "tag"]

    def test_must_not_and_tombstones(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "e", keyword="alpha -w0", fields=["content"],
                        limit=1)
        got = sorted(c.export_matches("db", "e", q, columns=["_id"])
                     .to_pandas()["_id"])
        assert got == [i for i in range(3, 90, 3)]
        c.delete_by_ids("db", "e", [3, 9])
        got = sorted(c.export_matches("db", "e", q, columns=["_id"])
                     .to_pandas()["_id"])
        assert got == [i for i in range(3, 90, 3) if i not in (3, 9)]

    def test_vector_rejected(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path), n=20)
        q = SearchQuery("db", "v", vector=docs[0]["vector"],
                        vectorField="vector", limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.export_matches("db", "v", q)


class TestRangeFacets:
    """Histogram facet over the ENTIRE match set (LongRangeFacetCounts
    shape): half-open [lo, hi) bins, one count vector per bucket."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "r", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc))
        docs = [{"_id": i, "content": "hit", "n": i} for i in range(50)]
        docs[10]["n"] = None          # null doesn't count
        c.build_from_local("db", "r", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_half_open_bins_and_nulls(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "r", keyword="hit", fields=["content"], limit=3)
        out = c.range_facets("db", "r", q, "n", edges=[0, 10, 20, 45])
        # [0,10)=10, [10,20)=9 (10 is null), [20,45)=25; 45..49 out of range
        assert out == [{"lo": 0, "hi": 10, "count": 10},
                       {"lo": 10, "hi": 20, "count": 9},
                       {"lo": 20, "hi": 45, "count": 25}]

    def test_actor_parity_and_validation(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "r", keyword="hit", fields=["content"], limit=3)
        inproc = c.range_facets("db", "r", q, "n", edges=[0, 25, 50])
        c.activate("db", "r")
        assert c.range_facets("db", "r", q, "n", edges=[0, 25, 50]) == inproc
        with pytest.raises(ValueError, match="increasing"):
            c.range_facets("db", "r", q, "n", edges=[5, 5])
        qv = SearchQuery("db", "r", keyword="hit", vector=[0.1] * 4,
                         vectorField="v", fields=["content"], limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c.range_facets("db", "r", qv, "n", edges=[0, 1])


class TestTermVectorsAndRerank:
    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "tv", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc))
        docs = [{"_id": 0, "content": "a b a c", "n": 5},
                {"_id": 1, "content": "b b b", "n": 9},
                {"_id": 2, "content": "hit a", "n": 7},
                {"_id": 3, "content": "hit c hit", "n": 1}]
        c.build_from_local("db", "tv", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        return c

    def test_term_vectors(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        tv = c.term_vectors("db", "tv", [0, 1], "content")
        rows = list(zip(tv["doc_id"].to_pylist(), tv["term"].to_pylist(),
                        tv["tf"].to_pylist()))
        assert rows == [(0, "a", 2), (0, "b", 1), (0, "c", 1), (1, "b", 3)]
        c.activate("db", "tv")
        tv2 = c.term_vectors("db", "tv", [0, 1], "content")
        assert tv2.equals(tv)
        # unknown ids yield no rows
        assert len(c.term_vectors("db", "tv", [99], "content")) == 0

    def test_rerank(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "tv", keyword="hit a", fields=["content"],
                        limit=2)
        out = c.rerank("db", "tv", q, lambda hits: [h["n"] for h in hits],
                       depth=10, precision="float64")
        # candidates: docs 0,2,3; reranked by n desc -> 1 absent, 2(n=7),
        # 0(n=5) top-2
        assert [(o["doc_id"], o["_score"]) for o in out] == \
               [(2, 7.0), (0, 5.0)]
        assert all("_first_stage_score" in o for o in out)
        # limit defaults to the query's; depth bounds stage 1
        out2 = c.rerank("db", "tv", q, lambda hits: [h["n"] for h in hits],
                        depth=1, precision="float64")
        assert len(out2) == 1
        with pytest.raises(ValueError, match="one score per hit"):
            c.rerank("db", "tv", q, lambda hits: [1.0])


class TestSortByFieldAndSnapshot:
    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "sb", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc))
        docs = [{"_id": i, "content": "hit" if i % 2 == 0 else "miss",
                 "n": (i * 37) % 50} for i in range(40)]
        docs[4]["n"] = None
        c.build_from_local("db", "sb", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_sort_by_field_whole_match_set(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "sb", keyword="hit", fields=["content"],
                        limit=5)
        out = c.search_by_field("db", "sb", q, "n", ascending=False)
        want = sorted(((i, (i * 37) % 50) for i in range(0, 40, 2) if i != 4),
                      key=lambda x: (-x[1], x[0]))[:5]
        assert [(o["doc_id"], o["n"]) for o in out] == \
               [(d, float(v)) for d, v in want]
        asc = c.search_by_field("db", "sb", q, "n", ascending=True)
        want_a = sorted(((i, (i * 37) % 50) for i in range(0, 40, 2)
                         if i != 4), key=lambda x: (x[1], x[0]))[:5]
        assert [(o["doc_id"], o["n"]) for o in asc] == \
               [(d, float(v)) for d, v in want_a]
        c.activate("db", "sb")
        assert c.search_by_field("db", "sb", q, "n", ascending=False) == out

    def test_index_stats(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        st = c.index_stats("db", "sb")
        assert st["n_docs"] == 40 and st["generations"] == [1]
        f = st["fields"]["content"]
        # every doc has one token; dictionary = {hit, miss}
        assert f == {"doc_count": 40, "sum_ttf": 40, "distinct_terms": 2}
        assert st["bytes"]["docstore"] > 0 and st["bytes"]["postings"] > 0

    def test_snapshot_restore_and_immutability(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path) + "/src")
        q = SearchQuery("db", "sb", keyword="hit", fields=["content"],
                        limit=50)
        before = c.search("db", "sb", q, precision="float64")[0]
        dest = str(tmp_path) + "/backup"
        c.snapshot("db", "sb", dest)
        # restore = open a cluster at the destination (M8)
        r = RetrievalCluster(dest)
        got = r.search("db", "sb", q, precision="float64")[0]
        assert [(x["doc_id"], x["_score"]) for x in got] == \
               [(x["doc_id"], x["_score"]) for x in before]
        # mutating the source must not touch the snapshot
        c.delete_by_ids("db", "sb", [0, 2])
        r2 = RetrievalCluster(dest)
        again = r2.search("db", "sb", q, precision="float64")[0]
        assert [(x["doc_id"], x["_score"]) for x in again] == \
               [(x["doc_id"], x["_score"]) for x in before]
        # snapshot after deletes carries the tombstones
        dest2 = str(tmp_path) + "/backup2"
        c.snapshot("db", "sb", dest2)
        r3 = RetrievalCluster(dest2)
        ids = {x["doc_id"] for x in r3.search("db", "sb", q,
                                              precision="float64")[0]}
        assert 0 not in ids and 2 not in ids


class TestDateHistogram:
    """Fixed-interval histogram over the ENTIRE match set (elasticsearch
    date_histogram fixed_interval shape): per-bucket (bucket, cnt) partials,
    floor-division bucket keys, optional gap fill."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "h", "st(field(_id,long),field(content,string,analyze),"
            "field(t,long))", loc))
        # t spans negatives so truncation-vs-floor bugs show: -25..34 step 1
        docs = [{"_id": i, "content": "hit " + ("extra " if i % 5 == 0 else ""),
                 "t": i - 25}
                for i in range(60)]
        docs[3]["t"] = None          # null must not count
        c.build_from_local("db", "h", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_floor_buckets_whole_match_set(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "h", keyword="hit", fields=["content"], limit=2)
        out = c.date_histogram("db", "h", q, "t", interval=10)
        # floor semantics: t=-25..-21 -> bucket -30; -20..-11 -> -20; ...
        # 59 non-null values (t=-22 nulled)
        import collections
        exp = collections.Counter(
            ((i - 25) // 10) * 10 for i in range(60) if i != 3)
        assert out == [{"bucket": b, "count": n}
                       for b, n in sorted(exp.items())]
        assert out[0]["bucket"] == -30          # true floor, not truncation
        assert sum(o["count"] for o in out) == 59

    def test_offset_and_gap_fill(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "h", keyword="extra", fields=["content"],
                        limit=1)
        # matches _id % 5 == 0 -> t = -25,-20,...,30 (12 values, all non-null
        # except none), interval 50: buckets -50 and 0
        out = c.date_histogram("db", "h", q, "t", interval=50)
        assert out == [{"bucket": -50, "count": 5}, {"bucket": 0, "count": 7}]
        # offset shifts the grid: floor((v-25)/50)*50+25
        out2 = c.date_histogram("db", "h", q, "t", interval=50, offset=25)
        assert sum(o["count"] for o in out2) == 12
        assert all((o["bucket"] - 25) % 50 == 0 for o in out2)
        # min_doc_count=0 zero-fills interior gaps
        out3 = c.date_histogram("db", "h", q, "t", interval=7,
                                min_doc_count=0)
        bks = [o["bucket"] for o in out3]
        assert bks == list(range(bks[0], bks[-1] + 7, 7))
        assert sum(o["count"] for o in out3) == 12

    def test_timestamp_column_buckets_as_epoch_us(self, ray_session,
                                                  tmp_path):
        import pyarrow as pa
        import ray.data
        day = 86_400_000_000
        base = 1_700_000_000_000_000        # 2023-11-14T22:13:20Z in us
        t = pa.table({
            "_id": pa.array(range(30), pa.int64()),
            "content": pa.array(["hit"] * 30),
            "ts": pa.array([base + i * (day // 3) for i in range(30)],
                           pa.timestamp("us")),
        })
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "ht", "st(field(_id,long),field(content,string,analyze),"
            "field(ts,date,sort))", loc))
        c.build_from_parquet("db", "ht", ray.data.from_arrow(t),
                             key_field="_id", num_doc_parts=2,
                             num_term_parts=2)
        q = SearchQuery("db", "ht", keyword="hit", fields=["content"],
                        limit=3)
        out = c.date_histogram("db", "ht", q, "ts", interval=day)
        import collections
        exp = collections.Counter(
            ((base + i * (day // 3)) // day) * day for i in range(30))
        assert out == [{"bucket": b, "count": n}
                       for b, n in sorted(exp.items())]

    def test_actor_parity_and_bad_inputs(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "h", keyword="hit", fields=["content"], limit=2)
        inproc = c.date_histogram("db", "h", q, "t", interval=10)
        c.activate("db", "h")
        assert c.date_histogram("db", "h", q, "t", interval=10) == inproc
        with pytest.raises(ValueError, match="positive"):
            c.date_histogram("db", "h", q, "t", interval=0)
        qa = SearchQuery("db", "h", keyword="zzz_absent",
                         fields=["content"], limit=5)
        assert c.date_histogram("db", "h", qa, "t", interval=10) == []
        c2, docs = _vec_cluster(str(tmp_path) + "/v", n=20)
        qv = SearchQuery("db", "v", vector=docs[0]["vector"],
                         vectorField="vector", limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c2.date_histogram("db", "v", qv, "_id", interval=10)


class TestTermsStats:
    """Terms bucket agg + numeric metric sub-agg (elasticsearch terms +
    sum/avg shape): per-key (cnt, mcnt, msum) partials, exact driver fold."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "ts", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string),field(n,long))", loc))
        docs = [{"_id": i, "content": "hit " + ("extra " if i % 5 == 0 else ""),
                 "cat": ["a", "b", "c"][i % 3], "n": i * 10}
                for i in range(60)]
        docs[59]["cat"] = None       # null key: doc doesn't count at all
        docs[7]["n"] = None          # null metric: doc counts, metric doesn't
        c.build_from_local("db", "ts", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    def test_exact_fold_and_null_semantics(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "ts", keyword="hit", fields=["content"],
                        limit=2)
        out = c.terms_stats("db", "ts", q, "cat", "n")
        exp = {}
        for i in range(60):
            if i == 59:
                continue             # nulled key
            k = ["a", "b", "c"][i % 3]
            e = exp.setdefault(k, {"count": 0, "mcnt": 0, "msum": 0})
            e["count"] += 1
            if i != 7:
                e["mcnt"] += 1
                e["msum"] += i * 10
        want = sorted(exp.items(), key=lambda kv: (-kv[1]["count"], kv[0]))
        assert out == [{"key": k, "count": v["count"],
                        "metric_count": v["mcnt"],
                        "metric_sum": float(v["msum"]),
                        "metric_avg": v["msum"] / v["mcnt"]}
                       for k, v in want]

    def test_limit_rank_and_actor_parity(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = SearchQuery("db", "ts", keyword="extra", fields=["content"],
                        limit=1)
        inproc = c.terms_stats("db", "ts", q, "cat", "n", limit=2)
        assert len(inproc) == 2
        # rank: (count desc, key asc) — a,b,c all have 4 matches -> a,b
        assert [o["key"] for o in inproc] == ["a", "b"]
        c.activate("db", "ts")
        assert c.terms_stats("db", "ts", q, "cat", "n", limit=2) == inproc

    def test_all_null_metric_group(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "tn", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string),field(n,long))", loc))
        docs = [{"_id": i, "content": "hit", "cat": "x" if i < 3 else "y",
                 "n": None if i < 3 else i} for i in range(6)]
        c.build_from_local("db", "tn", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        q = SearchQuery("db", "tn", keyword="hit", fields=["content"],
                        limit=1)
        out = c.terms_stats("db", "tn", q, "cat", "n")
        x = [o for o in out if o["key"] == "x"][0]
        assert x == {"key": "x", "count": 3, "metric_count": 0,
                     "metric_sum": 0.0, "metric_avg": None}
        y = [o for o in out if o["key"] == "y"][0]
        assert y["metric_count"] == 3 and y["metric_sum"] == 12.0

    def test_bad_inputs(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        qa = SearchQuery("db", "ts", keyword="zzz_absent",
                         fields=["content"], limit=5)
        assert c.terms_stats("db", "ts", qa, "cat", "n") == []
        q = SearchQuery("db", "ts", keyword="hit", fields=["content"],
                        limit=2)
        with pytest.raises(ValueError, match="not a stored column"):
            c.terms_stats("db", "ts", q, "cat", "nope")
        c2, docs = _vec_cluster(str(tmp_path) + "/v", n=20)
        qv = SearchQuery("db", "v", vector=docs[0]["vector"],
                         vectorField="vector", limit=3)
        with pytest.raises(ValueError, match="keyword-only"):
            c2.terms_stats("db", "v", qv, "content", "_id")


class TestPercentiles:
    """EXACT match-set percentiles via distributed selection (the
    ops/quantiles narrowing run through the searchers): per-round bounded
    count partials, one <=collect_limit value pull at the end."""

    def _cluster(self, loc, vals):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "p", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc))
        docs = [{"_id": i, "content": "hit" if i % 3 else "miss",
                 "n": int(v)} for i, v in enumerate(vals)]
        c.build_from_local("db", "p", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c

    @staticmethod
    def _brute(vals, qs):
        s = np.sort(np.asarray(vals, np.float64))
        return [float(s[int(np.floor(x * (len(s) - 1)))]) for x in qs]

    def test_exact_with_forced_narrowing(self, ray_session, tmp_path):
        rng = np.random.default_rng(11)
        vals = rng.integers(-500, 5000, 900)
        c = self._cluster(str(tmp_path), vals)
        q = {"keyword": "hit", "fields": ["content"], "limit": 1}
        sub = [int(v) for i, v in enumerate(vals) if i % 3]
        qs = [0.0, 0.1, 0.5, 0.9, 1.0]
        got = c.percentiles("db", "p", q, "n", qs, n_candidates=8,
                            collect_limit=16, max_rounds=40)
        assert [o["value"] for o in got] == self._brute(sub, qs)
        assert [o["q"] for o in got] == qs

    def test_tie_endgame_and_all_identical(self, ray_session, tmp_path):
        vals = np.concatenate([np.full(600, 7), np.arange(90)])
        c = self._cluster(str(tmp_path), vals)
        q = {"keyword": "hit", "fields": ["content"], "limit": 1}
        sub = [int(v) for i, v in enumerate(vals) if i % 3]
        qs = [0.05, 0.5, 0.95]
        got = c.percentiles("db", "p", q, "n", qs, n_candidates=4,
                            collect_limit=8, max_rounds=60)
        assert [o["value"] for o in got] == self._brute(sub, qs)

    def test_empty_and_bad_inputs(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path), range(30))
        qa = {"keyword": "zzz_absent", "fields": ["content"], "limit": 1}
        out = c.percentiles("db", "p", qa, "n", [0.5])
        assert len(out) == 1 and np.isnan(out[0]["value"])
        q = {"keyword": "hit", "fields": ["content"], "limit": 1}
        with pytest.raises(ValueError, match="fractions"):
            c.percentiles("db", "p", q, "n", [1.5])
        with pytest.raises(ValueError, match="fractions"):
            c.percentiles("db", "p", q, "n", [])

    def test_actor_parity(self, ray_session, tmp_path):
        rng = np.random.default_rng(13)
        vals = rng.integers(0, 1000, 300)
        c = self._cluster(str(tmp_path), vals)
        q = {"keyword": "hit", "fields": ["content"], "limit": 1}
        qs = [0.25, 0.5, 0.75]
        inproc = c.percentiles("db", "p", q, "n", qs, n_candidates=8,
                               collect_limit=16, max_rounds=40)
        c.activate("db", "p")
        assert c.percentiles("db", "p", q, "n", qs, n_candidates=8,
                             collect_limit=16, max_rounds=40) == inproc


class TestOffsetPagination:
    """Round-5: SearchQuery(offset=N) — the elasticsearch `from` shape for
    EVERY query kind (keyword, vector, hybrid RRF, unscored filter).
    Pages must tile the exact ranking a single deep query produces."""

    def _corpus(self, loc, n=80):
        rng = np.random.default_rng(11)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "o", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long,sort),field(vector,array(float)))", loc))
        docs = [{"_id": i, "content": "hit w%d" % (i % 9), "n": i * 7 % 53,
                 "vector": rng.standard_normal(8).tolist()}
                for i in range(n)]
        c.build_from_local("db", "o", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c, docs

    def test_keyword_pages_tile_deep_ranking(self, ray_session, tmp_path):
        c, _ = self._corpus(str(tmp_path))
        deep = c.search("db", "o", SearchQuery(
            "db", "o", keyword="hit", fields=["content"], limit=30),
            precision="float64")[0]
        pages = []
        for off in (0, 10, 20):
            pages += c.search("db", "o", SearchQuery(
                "db", "o", keyword="hit", fields=["content"], limit=10,
                offset=off), precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in pages] == \
               [(r["_id"], r["_score"]) for r in deep]

    def test_vector_and_hybrid_pages(self, ray_session, tmp_path):
        c, docs = self._corpus(str(tmp_path))
        v = docs[3]["vector"]
        deep_v = c.search("db", "o", SearchQuery(
            "db", "o", vector=v, vectorField="vector", limit=20),
            precision="float64")[0]
        page2_v = c.search("db", "o", SearchQuery(
            "db", "o", vector=v, vectorField="vector", limit=10,
            offset=10), precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in page2_v] == \
               [(r["_id"], r["_score"]) for r in deep_v[10:20]]
        # hybrid RRF: scores depend on the fusion window, so an offset
        # page equals the [off, off+limit) slice of the ranking computed
        # at window off+limit (ES rank_window_size semantics) — NOT of an
        # arbitrarily deeper query
        for off in (0, 8, 16):
            deep_h = c.search("db", "o", SearchQuery(
                "db", "o", keyword="hit", fields=["content"], vector=v,
                vectorField="vector", limit=off + 8),
                precision="float64")[0]
            page = c.search("db", "o", SearchQuery(
                "db", "o", keyword="hit", fields=["content"], vector=v,
                vectorField="vector", limit=8, offset=off),
                precision="float64")[0]
            assert [(r["_id"], r["_score"]) for r in page] == \
                   [(r["_id"], r["_score"]) for r in deep_h[off:off + 8]]

    def test_filter_pages_and_actor_parity(self, ray_session, tmp_path):
        c, _ = self._corpus(str(tmp_path))
        deep = c.filter("db", "o", {"filters": {}, "sorts": [{"n": "desc"}],
                                    "limit": 30})[0]
        page = c.filter("db", "o", {"filters": {}, "sorts": [{"n": "desc"}],
                                    "limit": 10, "offset": 10})[0]
        assert page == deep[10:20]
        q = SearchQuery("db", "o", keyword="hit", fields=["content"],
                        limit=10, offset=15)
        inproc = c.search("db", "o", q, precision="float64")[0]
        c.activate("db", "o")
        try:
            assert c.search("db", "o", q, precision="float64")[0] == inproc
        finally:
            c.deactivate("db", "o")

    def test_offset_conflicts_with_search_after(self, ray_session,
                                                tmp_path):
        c, _ = self._corpus(str(tmp_path), n=20)
        with pytest.raises(ValueError, match="mutually"):
            c.search("db", "o", SearchQuery(
                "db", "o", keyword="hit", fields=["content"], limit=5,
                offset=5, search_after=[1.0, 0]))


class TestPercentileRanksAndMissing:
    """Round-5: exact percentile_ranks (inverse percentiles) and the
    missing aggregation — both O(integers) per-bucket partials."""

    def _cluster(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "pr", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long),field(tag,string))", loc))
        docs = [{"_id": i, "content": "hit", "n": (i * 13) % 97,
                 "tag": None if i % 7 == 0 else f"t{i % 3}"}
                for i in range(70)]
        docs[5]["n"] = None
        c.build_from_local("db", "pr", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        return c, docs

    def test_ranks_match_brute(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "pr", keyword="hit", fields=["content"],
                        limit=5)
        vals = [d["n"] for d in docs if d["n"] is not None]
        xs = [0.0, 25.0, 48.0, 96.0, 200.0]
        out = c.percentile_ranks("db", "pr", q, "n", xs)
        assert [o["value"] for o in out] == xs
        for o in out:
            want = 100.0 * sum(1 for v in vals if v <= o["value"]) / len(vals)
            assert o["rank"] == pytest.approx(want)
        assert out[-1]["rank"] == 100.0

    def test_missing_counts(self, ray_session, tmp_path):
        c, docs = self._cluster(str(tmp_path))
        q = SearchQuery("db", "pr", keyword="hit", fields=["content"],
                        limit=5)
        out = c.missing_count("db", "pr", q, "tag")
        assert out == {"missing": sum(1 for d in docs if d["tag"] is None),
                       "doc_count": len(docs)}
        # absent column: everything is missing
        assert c.missing_count("db", "pr", q, "nope") == \
               {"missing": len(docs), "doc_count": len(docs)}

    def test_actor_parity_and_validation(self, ray_session, tmp_path):
        c, _ = self._cluster(str(tmp_path))
        q = SearchQuery("db", "pr", keyword="hit", fields=["content"],
                        limit=5)
        pr = c.percentile_ranks("db", "pr", q, "n", [10.0, 50.0])
        mc = c.missing_count("db", "pr", q, "tag")
        c.activate("db", "pr")
        try:
            assert c.percentile_ranks("db", "pr", q, "n",
                                      [10.0, 50.0]) == pr
            assert c.missing_count("db", "pr", q, "tag") == mc
        finally:
            c.deactivate("db", "pr")
        with pytest.raises(ValueError, match="at least one value"):
            c.percentile_ranks("db", "pr", q, "n", [])


class TestAutoDateHistogram:
    """Round-5: auto_date_histogram — smallest ladder interval whose
    floor-rounded bucket count fits the target."""

    def _cluster(self, loc, minutes):
        import datetime
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "ah", "st(field(_id,long),field(content,string,analyze),"
            "field(ts,date))", loc))
        docs = [{"_id": i, "content": "hit",
                 "ts": datetime.datetime(2021, 3, 1) +
                 datetime.timedelta(minutes=m)}
                for i, m in enumerate(minutes)]
        c.build_from_local("db", "ah", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        return c

    def test_picks_smallest_fitting_interval(self, ray_session, tmp_path):
        # span 0..95 minutes → 10-minute bins give 10 buckets (fits), 5-min
        # gives 20 (doesn't): pick 600s
        c = self._cluster(str(tmp_path), [0, 7, 23, 48, 95])
        q = SearchQuery("db", "ah", keyword="hit", fields=["content"],
                        limit=5)
        out = c.auto_date_histogram("db", "ah", q, "ts", buckets=10)
        assert out["interval"] == 600_000_000
        bs = out["buckets"]
        assert len(bs) == 10                      # gap-filled range
        assert sum(b["count"] for b in bs) == 5
        assert [b["count"] for b in bs] == [2, 0, 1, 0, 1, 0, 0, 0, 0, 1]

    def test_single_value_and_empty(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path), [42])
        q = SearchQuery("db", "ah", keyword="hit", fields=["content"],
                        limit=5)
        out = c.auto_date_histogram("db", "ah", q, "ts", buckets=10)
        assert out["interval"] == 1_000_000       # smallest rung fits
        assert len(out["buckets"]) == 1
        qa = SearchQuery("db", "ah", keyword="zzz_absent",
                         fields=["content"], limit=5)
        assert c.auto_date_histogram("db", "ah", qa, "ts") == \
               {"interval": None, "buckets": []}


class TestBoxplot:
    """Round-5: exact boxplot (five-number summary + Tukey whiskers
    clamped to observed values)."""

    def test_matches_numpy(self, ray_session, tmp_path):
        c = RetrievalCluster(str(tmp_path))
        c.create_table(TableSettings(
            "db", "bx", "st(field(_id,long),field(content,string,analyze),"
            "field(n,long))", loc := str(tmp_path)))
        vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 200]   # one outlier
        docs = [{"_id": i, "content": "hit", "n": v}
                for i, v in enumerate(vals)]
        c.build_from_local("db", "bx", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        q = SearchQuery("db", "bx", keyword="hit", fields=["content"],
                        limit=5)
        out = c.boxplot("db", "bx", q, "n")
        sv = sorted(vals)
        n = len(sv)
        pick = lambda f: float(sv[int(f * (n - 1))])
        q1, q3 = pick(0.25), pick(0.75)
        iqr = q3 - q1
        assert out["min"] == 1.0 and out["max"] == 200.0
        assert out["q1"] == q1 and out["q3"] == q3
        assert out["median"] == pick(0.5)
        assert out["lower"] == min(v for v in sv if v >= q1 - 1.5 * iqr)
        assert out["upper"] == max(v for v in sv if v <= q3 + 1.5 * iqr)
        assert out["upper"] == 12.0               # the outlier is fenced out
        # actor parity + empty match
        c.activate("db", "bx")
        try:
            assert c.boxplot("db", "bx", q, "n") == out
        finally:
            c.deactivate("db", "bx")
        qa = SearchQuery("db", "bx", keyword="zzz", fields=["content"],
                         limit=5)
        assert c.boxplot("db", "bx", qa, "n")["median"] is None


class TestCumulativeCardinality:
    """Round-5: cumulative distinct-count per time bin — prefix-max HLL
    sketch algebra (cumulative registers = elementwise max of per-bin
    registers, so the cumulative estimate equals the union stream's)."""

    def test_matches_prefix_union_sketches(self, ray_session, tmp_path):
        import datetime
        from byzer_retrieval_ray.ops.hll import _estimate, _registers
        c = RetrievalCluster(str(tmp_path))
        c.create_table(TableSettings(
            "db", "cc", "st(field(_id,long),field(content,string,analyze),"
            "field(ts,date),field(u,string))", str(tmp_path)))
        docs = []
        for i in range(90):
            docs.append({"_id": i, "content": "hit",
                         "ts": datetime.datetime(2022, 5, 1 + i % 3),
                         "u": f"user{i % 37}"})
        c.build_from_local("db", "cc", docs, key_field="_id",
                           num_doc_parts=3, num_term_parts=2)
        q = SearchQuery("db", "cc", keyword="hit", fields=["content"],
                        limit=5)
        out = c.cumulative_cardinality("db", "cc", q, "ts", "u",
                                       interval=86_400_000_000, p=8)
        assert len(out) == 3
        assert [o["bucket"] for o in out] == sorted(o["bucket"]
                                                    for o in out)
        # reference: single-process sketch of each prefix's value union
        day = lambda d: d["ts"].day
        for rank, o in enumerate(out, start=1):
            prefix = [d["u"] for d in docs if day(d) <= rank]
            want = _estimate(_registers(prefix, 8), 8)
            assert o["estimate"] == want["estimate"]
            assert o["branch"] == want["branch"]
        # cumulative estimates are monotone non-decreasing
        ests = [o["estimate"] for o in out]
        assert ests == sorted(ests)
        # actor parity
        c.activate("db", "cc")
        try:
            assert c.cumulative_cardinality(
                "db", "cc", q, "ts", "u",
                interval=86_400_000_000, p=8) == out
        finally:
            c.deactivate("db", "cc")


class TestTopHitsSource:
    def test_source_fields_attach(self, ray_session, tmp_path):
        c = RetrievalCluster(str(tmp_path))
        c.create_table(TableSettings(
            "db", "th", "st(field(_id,long),field(content,string,analyze),"
            "field(cat,string),field(n,long))", str(tmp_path)))
        docs = [{"_id": i, "content": "hit", "cat": ["a", "b"][i % 2],
                 "n": i * 3} for i in range(30)]
        c.build_from_local("db", "th", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        q = SearchQuery("db", "th", keyword="hit", fields=["content"],
                        limit=5)
        out = c.top_hits("db", "th", q, "cat", num_keys=2, per_key=2,
                         source_fields=["n", "cat"])
        assert len(out) == 2
        for b in out:
            for h in b["hits"]:
                assert h["cat"] == b["key"]
                assert h["n"] == ( [d for d in docs
                                    if d["_id"] == h["doc_id"]][0]["n"] )
        # default shape unchanged
        plain = c.top_hits("db", "th", q, "cat", num_keys=2, per_key=2)
        assert all(set(h) == {"doc_id", "_score"}
                   for b in plain for h in b["hits"])
        # actor parity
        c.activate("db", "th")
        try:
            assert c.top_hits("db", "th", q, "cat", num_keys=2, per_key=2,
                              source_fields=["n", "cat"]) == out
        finally:
            c.deactivate("db", "th")
