"""Incremental upsert via delta generations (M1 scale path).

The reference upserts in place per doc (RetrievalWorker.java:232-238); here an
upsert batch builds a DELTA generation from the new docs only and tombstones the
replaced keys in older generations — base files are never rewritten or re-read.
``compact()`` folds the chain back into one generation (Lucene forceMerge
equivalent)."""

import os

import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings

SCHEMA = "st(field(_id,long),field(content,string,analyze),field(tag,string))"
SCHEMA_STR = "st(field(_id,string),field(content,string,analyze),field(tag,string))"


def _mk(loc, schema=SCHEMA, table="t"):
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", table, schema, loc))
    docs = [{"_id": i, "content": f"base document number{i} shared", "tag": "base"}
            for i in range(12)]
    assert c.build_from_local("db", table, docs, key_field="_id",
                              num_doc_parts=2, num_term_parts=2)
    return c


class TestDeltaUpsert:
    def test_upsert_touches_only_delta_files(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        m = c.manifest("db", "t")
        base_dir = os.path.join(m.gen_dir(1), "docstore")
        before = {f: os.stat(os.path.join(base_dir, f)).st_mtime_ns
                  for f in os.listdir(base_dir)}

        assert c.build_from_local("db", "t", [
            {"_id": 3, "content": "replacement text shared", "tag": "delta"},
            {"_id": 100, "content": "brand new doc shared", "tag": "delta"},
        ], key_field="_id", num_doc_parts=2, num_term_parts=2)

        # base generation files were neither rewritten nor appended
        after = {f: os.stat(os.path.join(base_dir, f)).st_mtime_ns
                 for f in os.listdir(base_dir)}
        assert after == before
        assert m.active_generations() == [1, 2]
        # the delta generation holds ONLY the new docs
        assert m.data["generations"]["2"]["n_docs"] == 2

    def test_query_merges_generations(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        c.build_from_local("db", "t", [
            {"_id": 3, "content": "replacement text shared", "tag": "delta"},
            {"_id": 100, "content": "brand new doc shared", "tag": "delta"},
        ], key_field="_id", num_doc_parts=2, num_term_parts=2)

        res = c.search("db", "t", {"keyword": "shared", "fields": ["content"],
                                   "limit": 50})[0]
        got = {r["_id"]: r["tag"] for r in res}
        assert len(got) == 13                      # 12 base - 1 replaced + 2 new
        assert got[3] == "delta" and got[100] == "delta"
        assert got[0] == "base"
        # the replaced key's old content is gone
        res = c.search("db", "t", {"keyword": "number3", "fields": ["content"],
                                   "limit": 5})[0]
        assert res == []
        # filter op sees the merged view too
        rows = c.filter("db", "t", {"filters": {"and": [{"field": "tag",
                                                         "value": "delta"}]},
                                    "sorts": [], "limit": 10})[0]
        assert sorted(r["_id"] for r in rows) == [3, 100]

    def test_actor_mode_parity_across_generations(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        c.build_from_local("db", "t", [
            {"_id": 3, "content": "replacement text shared", "tag": "delta"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        q = {"keyword": "shared", "fields": ["content"], "limit": 50}
        local = {(r["_id"], round(r["_score"], 6)) for r in c.search("db", "t", q)[0]}
        c.activate("db", "t")
        try:
            actor = {(r["_id"], round(r["_score"], 6)) for r in c.search("db", "t", q)[0]}
        finally:
            c.deactivate("db", "t")
        assert actor == local

    def test_delete_then_upsert_revives(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        assert c.delete_by_ids("db", "t", [5])
        assert c.search("db", "t", {"keyword": "number5", "fields": ["content"],
                                    "limit": 5})[0] == []
        c.build_from_local("db", "t", [
            {"_id": 5, "content": "revived number5 shared", "tag": "delta"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        res = c.search("db", "t", {"keyword": "number5", "fields": ["content"],
                                   "limit": 5})[0]
        assert [r["_id"] for r in res] == [5] and res[0]["tag"] == "delta"

    def test_chained_deltas_and_compact(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        for i in range(3):
            c.build_from_local("db", "t", [
                {"_id": 3, "content": f"rev{i} shared", "tag": f"d{i}"}],
                key_field="_id", num_doc_parts=2, num_term_parts=2)
        m = c.manifest("db", "t")
        assert m.active_generations() == [1, 2, 3, 4]
        res = c.search("db", "t", {"keyword": "shared", "fields": ["content"],
                                   "limit": 50})[0]
        got = {r["_id"]: r["tag"] for r in res}
        assert len(got) == 12 and got[3] == "d2"   # latest delta wins

        info = c.compact("db", "t")
        assert m.active_generations() == [info["generation"]]
        assert m.data["tombstone_files"] == []
        assert info["n_docs"] == 12
        res2 = c.search("db", "t", {"keyword": "shared", "fields": ["content"],
                                    "limit": 50})[0]
        assert {r["_id"]: r["tag"] for r in res2} == got
        # scan sees each live key exactly once
        df = c.scan_table("db", "t").to_pandas()
        assert sorted(df["_id"]) == list(range(12))

    def test_string_keys_delta_ids_disjoint(self, ray_session, tmp_path):
        """Stride-mode synthetic ids: delta generations get a gen namespace in the
        high bits, so base and delta ids can never collide."""
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "s", SCHEMA_STR, loc))
        docs = [{"_id": f"k{i}", "content": f"str doc number{i} shared", "tag": "base"}
                for i in range(8)]
        c.build_from_local("db", "s", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        c.build_from_local("db", "s", [
            {"_id": "k2", "content": "str replacement shared", "tag": "delta"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        res = c.search("db", "s", {"keyword": "shared", "fields": ["content"],
                                   "limit": 50})[0]
        ids = [r["doc_id"] for r in res]
        assert len(ids) == len(set(ids)) == 8
        got = {r["_id"]: r["tag"] for r in res}
        assert got["k2"] == "delta" and got["k0"] == "base"


class TestDeltaPhrases:
    def test_phrase_across_generations(self, ray_session, tmp_path):
        """Positions exist per generation: a phrase query matches docs in the base
        AND in delta generations, and a replaced doc's old phrasing is gone."""
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "t", "st(field(_id,long),field(content,string,analyze))", loc))
        c.build_from_local("db", "t", [
            {"_id": 1, "content": "red fox runs"},
            {"_id": 2, "content": "fox red runs"},
            {"_id": 3, "content": "red fox sleeps"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        # delta: new doc with the phrase + replace doc 3 without it
        c.build_from_local("db", "t", [
            {"_id": 4, "content": "another red fox here"},
            {"_id": 3, "content": "now fox then red"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        res = c.search("db", "t", {"keyword": '"red fox"', "fields": ["content"],
                                   "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [1, 4]
        # prefix across generations too
        res = c.search("db", "t", {"keyword": "sle*", "fields": ["content"],
                                   "limit": 10})[0]
        assert res == []   # the only 'sleeps' doc was replaced

    def test_sloppy_phrase_across_generations(self, ray_session, tmp_path):
        """Sloppy phrases resolve per generation like exact ones: "red fox"~2
        matches in-order pairs within cost 2 in base and delta docs, and a
        replaced doc's old (in-order) phrasing stops matching."""
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "t", "st(field(_id,long),field(content,string,analyze))", loc))
        c.build_from_local("db", "t", [
            {"_id": 1, "content": "red big fox runs"},       # cost 1
            {"_id": 2, "content": "fox red runs"},           # transposed: no match
            {"_id": 3, "content": "red a b c fox"}],         # cost 3: no match at ~2
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        c.build_from_local("db", "t", [
            {"_id": 4, "content": "red so very fox"},        # delta, cost 2
            {"_id": 1, "content": "no pair here"}],          # replaced: gone
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        res = c.search("db", "t", {"keyword": '"red fox"~2', "fields": ["content"],
                                   "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [4]
        res = c.search("db", "t", {"keyword": '"red fox"~3', "fields": ["content"],
                                   "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [3, 4]
