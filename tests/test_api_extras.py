"""Source/sink and serving extras: JSONL ingestion (S1), full-scan export (S5/S6),
multi-query fan-out (Q8), actor generation reload (ST2)."""

import json
import os

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

SCHEMA = "st(field(_id,long),field(content,string,analyze),field(tag,string))"


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    for f in range(3):
        with open(os.path.join(d, f"part-{f}.jsonl"), "w") as fh:
            for i in range(f * 20, (f + 1) * 20):
                fh.write(json.dumps({"_id": i, "content": f"json doc {i} shared",
                                     "tag": f"t{i % 3}"}) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory, jsonl_dir):
    loc = str(tmp_path_factory.mktemp("jcluster"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "j", SCHEMA, loc))
    c.build_from_jsonl("db", "j", jsonl_dir, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)
    return c


class TestJsonlSource:
    def test_build_and_search(self, cluster):
        res = cluster.search("db", "j", {"keyword": "shared", "fields": ["content"],
                                         "limit": 100})[0]
        assert len(res) == 60
        res = cluster.search("db", "j", {"keyword": "shared", "fields": ["content"],
                                         "filters": {"and": [{"field": "tag", "value": "t1"}]},
                                         "limit": 100})[0]
        assert sorted(r["_id"] for r in res) == [i for i in range(60) if i % 3 == 1]


class TestScanTable:
    def test_full_scan(self, cluster):
        ds = cluster.scan_table("db", "j")
        df = ds.to_pandas()
        assert sorted(df["_id"]) == list(range(60))
        assert "__norm_content" not in df.columns

    def test_scan_drops_tombstones(self, ray_session, tmp_path):
        # own table: deleting on the shared module cluster would skew the
        # live-doc bigram counts TestPhraseSuggest pins
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "sc", SCHEMA, loc))
        c.build_from_local("db", "sc", [
            {"_id": i, "content": f"json doc {i} shared", "tag": f"t{i % 3}"}
            for i in range(60)], key_field="_id",
            num_doc_parts=2, num_term_parts=2)
        c.delete_by_ids("db", "sc", [5, 6])
        df = c.scan_table("db", "sc").to_pandas()
        assert 5 not in set(df["_id"]) and len(df) == 58


class TestMultiQuery:
    def test_query_list(self, cluster):
        qs = [
            {"keyword": "shared", "fields": ["content"], "limit": 5},
            {"keyword": "json", "fields": ["content"], "limit": 3},
            {"keyword": "absent_term_zz", "fields": ["content"], "limit": 5},
        ]
        res = cluster.search("db", "j", qs)
        assert len(res) == 3
        assert len(res[0]) == 5 and len(res[1]) == 3 and len(res[2]) == 0

    def test_query_list_actors(self, cluster):
        cluster.activate("db", "j")
        try:
            qs = [{"keyword": "shared", "fields": ["content"], "limit": 4},
                  {"keyword": "json", "fields": ["content"], "limit": 4}]
            res = cluster.search("db", "j", qs)
            assert [len(r) for r in res] == [4, 4]
        finally:
            cluster.deactivate("db", "j")


class TestActorReload:
    def test_reload_sees_new_generation(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "r", SCHEMA, loc))
        c.build_from_local("db", "r", [{"_id": 1, "content": "first gen", "tag": "a"}],
                          key_field="_id", num_doc_parts=2, num_term_parts=2)
        c.activate("db", "r")
        try:
            res = c.search("db", "r", {"keyword": "first", "fields": ["content"], "limit": 5})[0]
            assert len(res) == 1
            # upsert triggers a new generation; _invalidate reloads the actors (ST2)
            c.build_from_local("db", "r", [{"_id": 2, "content": "second gen", "tag": "b"}],
                              key_field="_id", num_doc_parts=2, num_term_parts=2)
            res = c.search("db", "r", {"keyword": "second", "fields": ["content"], "limit": 5})[0]
            assert [r["_id"] for r in res] == [2]
            res = c.search("db", "r", {"keyword": "gen", "fields": ["content"], "limit": 5})[0]
            assert len(res) == 2
        finally:
            c.deactivate("db", "r")


class TestScanColumns:
    def test_scan_column_pruning(self, ray_session, tmp_path):
        from byzer_retrieval_ray import RetrievalCluster, TableSettings
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "t", "st(field(_id,long),field(content,string,analyze),"
                       "field(tag,string))", loc))
        c.build_from_local("db", "t", [
            {"_id": i, "content": f"doc {i}", "tag": f"t{i % 2}"} for i in range(10)],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        c.delete_by_ids("db", "t", [3])
        df = c.scan_table("db", "t", columns=["_id", "tag"]).to_pandas()
        assert sorted(df.columns) == ["_id", "tag"]       # no doc_id leak
        assert sorted(df["_id"]) == [0, 1, 2, 4, 5, 6, 7, 8, 9]
        # requesting doc_id keeps it
        df2 = c.scan_table("db", "t", columns=["doc_id", "_id"]).to_pandas()
        assert sorted(df2.columns) == ["_id", "doc_id"]


class TestSuggest:
    def test_spell_suggest_ranking(self, cluster):
        hits = cluster.suggest("db", "j", "content", "shred", max_edits=2)
        assert hits and hits[0]["term"] == "shared" and hits[0]["dist"] == 1
        assert hits[0]["df"] == 60

    def test_exact_term_excluded(self, cluster):
        hits = cluster.suggest("db", "j", "content", "shared", max_edits=2)
        assert all(h["term"] != "shared" for h in hits)

    def test_transpositions_flag(self, cluster):
        # jsno → json is ONE adjacent swap (OSA) but TWO plain-Levenshtein
        # edits; max_edits=1 separates the metrics
        osa = cluster.suggest("db", "j", "content", "jsno", max_edits=1,
                              transpositions=True)
        assert [h["term"] for h in osa] == ["json"]
        lev = cluster.suggest("db", "j", "content", "jsno", max_edits=1,
                              transpositions=False)
        assert lev == []

    def test_unknown_field_empty(self, cluster):
        assert cluster.suggest("db", "j", "nosuch", "shred") == []


class TestComplete:
    def test_prefix_ranking(self, cluster):
        # corpus terms: json/doc/shared (df 60 each) + the numerals 0..59
        hits = cluster.complete("db", "j", "content", "j")
        assert hits == [{"term": "json", "df": 60}]
        # "5" matches 5,50..59 (df 1 each) -> (df desc, term asc), top 5
        hits = cluster.complete("db", "j", "content", "5", limit=5)
        assert [h["term"] for h in hits] == ["5", "50", "51", "52", "53"]
        assert all(h["df"] == 1 for h in hits)

    def test_exact_term_included(self, cluster):
        assert cluster.complete("db", "j", "content", "shared") == \
               [{"term": "shared", "df": 60}]

    def test_bad_inputs(self, cluster):
        assert cluster.complete("db", "j", "nosuch", "sh") == []
        import pytest as _pytest
        with _pytest.raises(ValueError, match="non-empty"):
            cluster.complete("db", "j", "content", "")

    def test_df_sums_across_delta_generations(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "cg", "st(field(_id,long),field(content,string,analyze))",
            loc))
        c.build_from_local("db", "cg", [
            {"_id": i, "content": "alpha common"} for i in range(10)],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        # delta generation: 5 new docs share the 'common' term
        c.build_from_local("db", "cg", [
            {"_id": 100 + i, "content": "beta common"} for i in range(5)],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        hits = c.complete("db", "cg", "content", "com")
        assert hits == [{"term": "common", "df": 15}]
        assert c.complete("db", "cg", "content", "al") == \
               [{"term": "alpha", "df": 10}]


class TestPhraseSuggest:
    """Whole-query did-you-mean: per-token dictionary candidates + Stupid-
    Backoff bigram LM served from positional postings."""

    def test_correction_and_handscore(self, cluster):
        # corpus: 60 docs "json doc {i} shared" -> ttf(json)=60, total=240,
        # bigram("json","doc")=60
        import math
        out = cluster.phrase_suggest("db", "j", "content", "jsno doc",
                                     max_edits=1)
        assert out[0]["text"] == "json doc"
        assert out[0]["score"] == math.log((60 / 240) * (60 / 60))

    def test_backoff_when_bigram_absent(self, cluster):
        import math
        # "shared json" never occurs adjacently -> backoff step
        out = cluster.phrase_suggest("db", "j", "content", "shared json",
                                     max_edits=0)
        assert out == [{"text": "shared json",
                        "score": math.log((60 / 240) * (0.4 * (60 / 240)))}]

    def test_no_candidate_token_yields_empty(self, cluster):
        assert cluster.phrase_suggest("db", "j", "content",
                                      "json zzzzzzzzzz", max_edits=1) == []

    def test_sequence_cap_and_empty_text(self, cluster):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="at least one token"):
            cluster.phrase_suggest("db", "j", "content", "   ")
        # 7 numeral tokens x up to 10+ candidates each blows the 4096 cap
        with _pytest.raises(ValueError, match="4096"):
            cluster.phrase_suggest("db", "j", "content",
                                   "1 1 1 1 1 1 1", max_edits=1,
                                   max_candidates=4)

    def test_deletes_remove_bigrams_but_not_ttf(self, ray_session, tmp_path):
        import math
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "pb", "st(field(_id,long),field(content,string,analyze))",
            loc))
        docs = [{"_id": i, "content": "x y"} for i in range(4)] + \
               [{"_id": 10 + i, "content": "x z"} for i in range(4)]
        c.build_from_local("db", "pb", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        # before: bigram(x,y)=4 == bigram(x,z); "x y" wins ties alphabetically
        out = c.phrase_suggest("db", "pb", "content", "x y", max_edits=1,
                               max_candidates=3)
        assert out[0]["text"] == "x y"
        # delete every "x y" doc: the bigram vanishes (live-doc counts) but
        # ttf stays build-time (Lucene docFreq convention) -> backoff path
        c.delete_by_ids("db", "pb", [0, 1, 2, 3])
        out2 = c.phrase_suggest("db", "pb", "content", "x y", max_edits=1,
                                max_candidates=3)
        assert out2[0]["text"] == "x z"
        total, ttf_x, ttf_y = 16, 8, 4
        xy = [o for o in out2 if o["text"] == "x y"][0]
        assert xy["score"] == math.log(
            (ttf_x / total) * (0.4 * (ttf_y / total)))

    def test_actor_parity(self, cluster):
        inproc = cluster.phrase_suggest("db", "j", "content", "jsno doc",
                                        max_edits=1)
        cluster.activate("db", "j")
        try:
            assert cluster.phrase_suggest("db", "j", "content", "jsno doc",
                                          max_edits=1) == inproc
        finally:
            cluster.deactivate("db", "j")


class TestSuggestActorCache:
    """Round-5: on an activated table the suggest family serves from
    actor-CACHED termstats slices (round-robin part assignment, shared
    kernels in functions/suggest_kernels.py) instead of launching a Ray
    Data scan per call — results must be identical in both modes and the
    actor cache must actually populate and stick."""

    def test_all_three_match_inproc(self, cluster):
        spell = cluster.suggest("db", "j", "content", "shred", max_edits=2)
        comp = cluster.complete("db", "j", "content", "5", limit=5)
        phrase = cluster.phrase_suggest("db", "j", "content", "jsno doc",
                                        max_edits=1)
        cluster.activate("db", "j")
        try:
            assert cluster.suggest("db", "j", "content", "shred",
                                   max_edits=2) == spell
            assert cluster.complete("db", "j", "content", "5",
                                    limit=5) == comp
            assert cluster.phrase_suggest("db", "j", "content", "jsno doc",
                                          max_edits=1) == phrase
        finally:
            cluster.deactivate("db", "j")

    def test_cache_populates_and_persists(self, cluster):
        import ray
        cluster.activate("db", "j")
        try:
            cluster.complete("db", "j", "content", "j")
            actors = cluster._actors[("db", "j")]
            sizes = ray.get([a.__ray_call__.remote(
                lambda self: len(getattr(self, "_ts_dict_cache", {})))
                for a in actors])
            # every termstats part is cached by exactly one actor
            paths = cluster._termstats_paths("db", "j")
            assert sum(sizes) == len(paths) > 0
            cluster.suggest("db", "j", "content", "shred")
            sizes2 = ray.get([a.__ray_call__.remote(
                lambda self: len(getattr(self, "_ts_dict_cache", {})))
                for a in actors])
            assert sizes2 == sizes          # reused, not reloaded/evicted
        finally:
            cluster.deactivate("db", "j")

    def test_cache_tracks_delta_generations(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "sg", "st(field(_id,long),field(content,string,analyze))",
            loc))
        c.build_from_local("db", "sg", [
            {"_id": i, "content": "alpha common"} for i in range(10)],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        c.activate("db", "sg", nrt_poll_sec=0)
        try:
            assert c.complete("db", "sg", "content", "com") == \
                   [{"term": "common", "df": 10}]
            c.build_from_local("db", "sg", [
                {"_id": 100 + i, "content": "beta common"} for i in range(5)],
                key_field="_id", num_doc_parts=2, num_term_parts=2)
            # build invalidation reloads/respawns the pool; the new
            # generation's termstats parts load on demand and df sums
            assert c.complete("db", "sg", "content", "com") == \
                   [{"term": "common", "df": 15}]
        finally:
            c.deactivate("db", "sg")
