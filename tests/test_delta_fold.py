"""Tiered delta-fold compaction (compact_deltas).

Lucene merges small segments in the background and leaves big ones alone
(TieredMergePolicy); the generation-model analog folds the DELTA generations
into one new delta at O(delta bytes) cost while the base generation's files are
untouched. Fold-time semantics match a Lucene segment merge: deletes inside the
folded segments are physically dropped (and leave the collection stats then),
deletes against the surviving base are preserved."""

import os

import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings

SCHEMA = "st(field(_id,string),field(content,string,analyze),field(tag,string))"


def _mk(loc, table="t"):
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", table, SCHEMA, loc))
    docs = [{"_id": f"b{i}", "content": f"base document number{i} shared",
             "tag": "base"} for i in range(12)]
    assert c.build_from_local("db", table, docs, key_field="_id",
                              num_doc_parts=2, num_term_parts=2)
    return c


def _deltas(c, table="t", n=3, prefix="d", overlap=False):
    for j in range(n):
        key = f"{prefix}0" if overlap else f"{prefix}{j}"
        c.build_from_local("db", table, [
            {"_id": key, "content": f"delta batch{j} payload shared",
             "tag": f"delta{j}"}], key_field="_id",
            num_doc_parts=2, num_term_parts=2)


def _results(c, kw, table="t", limit=50):
    """(key, score, tag) rows, sorted by (score desc, key): the fold renumbers
    doc_ids into the new generation's namespace, so the engine's equal-score
    doc_id tie-break may permute ties — the (id, score) SET is the invariant."""
    res = c.search("db", table, {"keyword": kw, "fields": ["content"],
                                 "limit": limit})[0]
    return sorted(((r["_id"], r["_score"], r["tag"]) for r in res),
                  key=lambda t: (-t[1], t[0]))


class TestDeltaFold:
    def test_fold_disjoint_keys_is_score_invariant(self, ray_session, tmp_path):
        """No cross-delta tombstones → merged stats equal the sum of the folded
        generations' stats, so every query's ids AND float scores are
        byte-identical across the fold."""
        c = _mk(str(tmp_path))
        _deltas(c, n=3)
        m = c.manifest("db", "t")
        assert m.active_generations() == [1, 2, 3, 4]
        before = {kw: _results(c, kw) for kw in ("shared", "payload", "number3")}

        info = c.compact_deltas("db", "t")
        assert info is not None
        assert m.active_generations() == [1, 5]
        assert m.data["generations"]["5"]["n_docs"] == 3
        after = {kw: _results(c, kw) for kw in ("shared", "payload", "number3")}
        assert after == before

    def test_fold_leaves_base_files_untouched(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        m = c.manifest("db", "t")
        base_dir = os.path.join(m.gen_dir(1), "docstore")
        before = {f: os.stat(os.path.join(base_dir, f)).st_mtime_ns
                  for f in os.listdir(base_dir)}
        _deltas(c, n=3)
        c.compact_deltas("db", "t")
        after = {f: os.stat(os.path.join(base_dir, f)).st_mtime_ns
                 for f in os.listdir(base_dir)}
        assert after == before

    def test_fold_drops_cross_delta_replaced_docs(self, ray_session, tmp_path):
        """The same key upserted in every delta batch: after the fold only the
        latest survives, physically (not via tombstones)."""
        c = _mk(str(tmp_path))
        _deltas(c, n=3, overlap=True)
        m = c.manifest("db", "t")
        c.compact_deltas("db", "t")
        assert m.data["generations"]["5"]["n_docs"] == 1
        rows = [r for r in _results(c, "payload")]
        assert [(r[0], r[2]) for r in rows] == [("d0", "delta2")]
        # the folded generations' tombstone files are gone from the manifest
        import json
        gens_left = {json.load(open(p)).get("gen")
                     for p in m.data["tombstone_files"]}
        assert gens_left <= {1}

    def test_fold_preserves_base_tombstones(self, ray_session, tmp_path):
        """A base doc replaced by a delta upsert stays hidden after the fold
        (its tombstone targets the surviving base generation)."""
        c = _mk(str(tmp_path))
        c.build_from_local("db", "t", [
            {"_id": "b3", "content": "replacement text shared", "tag": "delta"}],
            key_field="_id", num_doc_parts=2, num_term_parts=2)
        _deltas(c, n=2)
        c.compact_deltas("db", "t")
        assert c.search("db", "t", {"keyword": "number3", "fields": ["content"],
                                    "limit": 5})[0] == []
        got = {r["_id"]: r["tag"] for r in
               c.search("db", "t", {"keyword": "shared", "fields": ["content"],
                                    "limit": 50})[0]}
        assert got["b3"] == "delta" and got["b0"] == "base"

    def test_fold_single_generation_is_noop(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        m = c.manifest("db", "t")
        assert c.compact_deltas("db", "t") is None
        assert m.active_generations() == [1]

    def test_actor_serving_after_fold(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        _deltas(c, n=3)
        c.compact_deltas("db", "t")
        q = {"keyword": "shared", "fields": ["content"], "limit": 50}
        local = {(r["_id"], round(r["_score"], 6)) for r in c.search("db", "t", q)[0]}
        c.activate("db", "t")
        try:
            actor = {(r["_id"], round(r["_score"], 6))
                     for r in c.search("db", "t", q)[0]}
        finally:
            c.deactivate("db", "t")
        assert actor == local and len(local) == 15


class TestVacuum:
    def test_vacuum_removes_retired_generations(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        _deltas(c, n=3)
        m = c.manifest("db", "t")
        c.compact_deltas("db", "t")
        retired = [2, 3, 4]
        assert all(os.path.isdir(m.gen_dir(g)) for g in retired)

        out = c.vacuum("db", "t")
        assert out["removed_generations"] == retired
        assert out["bytes_freed"] > 0
        assert not any(os.path.isdir(m.gen_dir(g)) for g in retired)
        assert sorted(int(g) for g in m.data["generations"]) == [1, 5]
        # serving is intact after the GC
        got = {r[0] for r in _results(c, "shared")}
        assert len(got) == 15

    def test_vacuum_noop_when_nothing_retired(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        out = c.vacuum("db", "t")
        assert out == {"removed_generations": [], "bytes_freed": 0}
        assert _results(c, "shared")


class TestAutoFold:
    def test_max_delta_generations_triggers_fold(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        m = c.manifest("db", "t")
        for j in range(3):
            c.build_from_local("db", "t", [
                {"_id": f"d{j}", "content": f"delta batch{j} payload shared",
                 "tag": f"delta{j}"}], key_field="_id",
                num_doc_parts=2, num_term_parts=2, max_delta_generations=2)
        # third delta exceeded the threshold → folded back to [base, merged]
        assert len(m.active_generations()) == 2
        got = {r[0] for r in _results(c, "payload")}
        assert got == {"d0", "d1", "d2"}

    def test_under_threshold_no_fold(self, ray_session, tmp_path):
        c = _mk(str(tmp_path))
        m = c.manifest("db", "t")
        for j in range(2):
            c.build_from_local("db", "t", [
                {"_id": f"d{j}", "content": f"delta batch{j} payload shared",
                 "tag": f"delta{j}"}], key_field="_id",
                num_doc_parts=2, num_term_parts=2, max_delta_generations=2)
        assert m.active_generations() == [1, 2, 3]
