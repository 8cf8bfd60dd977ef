"""Build-time ANN persistence (index/ann_store.py).

Round-3 verdict item #1: the HNSW graph and IVF codebook used for vector
serving must be built during ``build_index`` and persisted in the generation
(the reference's Lucene builds the graph at flush time —
XLucene95HnswVectorsFormat.java:119,130), so a serving-actor (re)start never
re-pays the per-node insertion loop at query time.
"""

import os

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.index.searcher import BucketSearcher
from byzer_retrieval_ray.ops.hnsw import HNSWIndex

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


class TestHNSWStateRoundtrip:
    def test_from_state_reconstructs_identical_graph(self):
        rng = np.random.default_rng(11)
        unit = rng.standard_normal((300, 12)).astype(np.float32)
        unit /= np.linalg.norm(unit, axis=1, keepdims=True)
        g = HNSWIndex(unit, max_conn=8, beam_width=40)
        g2 = HNSWIndex.from_state(unit, g.state())
        assert g2.entry == g.entry and g2.max_level == g.max_level
        assert g2.max_conn == g.max_conn and g2.m0 == g.m0
        assert np.array_equal(g2.levels, g.levels)
        assert len(g2.adj) == len(g.adj)
        for lvl in range(len(g.adj)):
            assert g2.adj[lvl] == g.adj[lvl]
        for qi in (0, 7, 123):
            assert np.array_equal(g2.search(unit[qi], 10, ef=32),
                                  g.search(unit[qi], 10, ef=32))

    def test_empty_graph_roundtrip(self):
        g = HNSWIndex(np.empty((0, 4), np.float32))
        g2 = HNSWIndex.from_state(np.empty((0, 4), np.float32), g.state())
        assert g2.search(np.zeros(4, np.float32), 5).size == 0


class TestAnnPersistence:
    def test_build_persists_npz_per_bucket(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        info = c.manifest("db", "v").current_gen_info()
        ann = info["ann"]["vector"]
        assert ann["max_conn"] == 16 and ann["beam_width"] == 100
        assert set(ann["buckets"]) == {"0", "1"}
        for b in ann["buckets"].values():
            assert os.path.exists(b["path"]) and b["path"].endswith(".npz")
            assert b["n"] > 0 and b["ivf_n_centroids"] >= 1

    def test_persisted_matches_fresh_build(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        md = c.manifest("db", "v").data
        s = BucketSearcher(md, 0)
        ids, mat, loaded = s._hnsw_state("vector", 16, 100)
        m64 = mat.astype(np.float64)
        norms = np.linalg.norm(m64, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = (m64 / norms).astype(np.float32)
        fresh = HNSWIndex(unit, 16, 100)
        assert loaded.entry == fresh.entry
        assert all(loaded.adj[lvl] == fresh.adj[lvl]
                   for lvl in range(len(fresh.adj)))
        # persisted IVF codebook == what the lazy auto path would train
        from byzer_retrieval_ray.ops.ann import train_codebook
        ids2, mat2, cent, assign = s._ivf_state("vector", 0)
        unit64 = m64 / norms
        n_c = max(1, int(np.sqrt(len(unit64))))
        np.testing.assert_array_equal(cent, train_codebook(unit64, n_c))
        np.testing.assert_array_equal(
            assign, np.argmax(unit64 @ cent.T, axis=1))

    def test_actor_restart_does_not_rebuild(self, ray_session, tmp_path,
                                            monkeypatch):
        """A fresh searcher (= restarted serving actor) over a published
        generation serves hnsw AND auto-ivf queries without ever entering the
        graph insertion loop or the k-means trainer."""
        c, docs = _vec_cluster(str(tmp_path))
        md = c.manifest("db", "v").data

        def boom(*a, **k):
            raise AssertionError("ANN structure rebuilt at query time")

        monkeypatch.setattr(HNSWIndex, "_build", boom)
        import byzer_retrieval_ray.ops.ann as ann_mod
        monkeypatch.setattr(ann_mod, "train_codebook", boom)

        s = BucketSearcher(md, 0)     # the "restarted actor"
        q = SearchQuery("db", "v", vector=docs[7]["vector"],
                        vectorField="vector", limit=5)
        ids, scores = s.search_vector(q, algorithm="hnsw", ef=16)
        assert ids.size > 0
        ids2, scores2 = s.search_vector(q, algorithm="ivf", n_centroids=0,
                                        nprobe=4)
        assert ids2.size > 0

    def test_legacy_generation_falls_back_to_lazy(self, ray_session, tmp_path):
        """A manifest without the ann section (pre-round-4 generation) still
        serves hnsw via the in-actor build."""
        c, docs = _vec_cluster(str(tmp_path))
        m = c.manifest("db", "v")
        g = str(m.data["generation"])
        m.data["generations"][g].pop("ann")
        s = BucketSearcher(m.data, 0)
        q = SearchQuery("db", "v", vector=docs[3]["vector"],
                        vectorField="vector", limit=5)
        ids, _ = s.search_vector(q, algorithm="hnsw", ef=16)
        assert ids.size > 0

    def test_resume_entry_short_circuits(self, ray_session, tmp_path):
        c, docs = _vec_cluster(str(tmp_path))
        info = c.manifest("db", "v").current_gen_info()
        b0 = info["ann"]["vector"]["buckets"]["0"]
        gen_dir = os.path.dirname(os.path.dirname(b0["path"]))
        entry_path = os.path.join(gen_dir, "_partials", "ann-vector-00000.json")
        assert os.path.exists(entry_path)
        mtime = os.path.getmtime(b0["path"])
        from byzer_retrieval_ray.index.ann_store import build_bucket_ann
        ent = build_bucket_ann([], "vector", 0, b0["path"], entry_path)
        assert ent["n"] == b0["n"]
        assert os.path.getmtime(b0["path"]) == mtime   # not rewritten
