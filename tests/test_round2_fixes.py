"""Regression tests for the round-1 ADVICE findings.

1. Term-range boundaries are durable generation state: a resumed rerun of the same
   generation reuses gen-<g>/boundaries.json instead of re-sampling (re-sampling from
   a different source — spill blocks vs docstore partitions — yields different cuts
   and would silently mis-route queries).
2. build_from_parquet clears tombstone_files when publishing a new generation
   (tombstone doc_ids are generation-scoped; stale ids would resurrect deleted keys
   and hide unrelated new docs).
3. Analyzed-field exact-match filters treat ALL whitespace (tabs/newlines) as token
   separators, matching the reference's TermQuery-over-WhitespaceAnalyzer.
4. extract_text: a document whose only <p> lives inside <head> extracts to "" in both
   the scalar oracle and the vectorized batch kernel.
"""

import os

import pyarrow as pa
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

SCHEMA = ("st(field(_id,string),field(body,string,analyze),field(tag,string))")


def _docs_table(rows):
    return pa.table({
        "_id": pa.array([r[0] for r in rows], pa.string()),
        "body": pa.array([r[1] for r in rows], pa.string()),
        "tag": pa.array([r[2] for r in rows], pa.string()),
    })


class TestBoundariesDurable:
    def test_rerun_reuses_boundaries(self, ray_session, tmp_path, monkeypatch):
        import ray.data

        import byzer_retrieval_ray.index.build as B

        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "t", SCHEMA, loc))
        rows = [(f"d{i}", f"alpha beta gamma w{i} w{i % 7}", "a") for i in range(60)]
        src = ray.data.from_arrow(_docs_table(rows))
        info = c.build_from_parquet("db", "t", src, key_field="_id",
                                    num_doc_parts=2, num_term_parts=3)
        gen = info["generation"]
        m = c.manifest("db", "t")
        bpath = os.path.join(m.gen_dir(gen), "boundaries.json")
        assert os.path.exists(bpath)
        saved = info["boundaries"]

        # a rerun of the SAME generation (resume) must not re-sample boundaries
        def boom(*a, **kw):
            raise AssertionError("boundaries were re-sampled on resume")

        monkeypatch.setattr(B, "_sample_boundaries", boom)
        src2 = ray.data.from_arrow(_docs_table(rows))
        info2 = B.build_index(src2, m, key_field="_id", num_doc_parts=2,
                              num_term_parts=3, generation=gen)
        assert info2["boundaries"] == saved


class TestTombstoneGenerationScope:
    def test_rebuild_clears_stale_tombstones(self, ray_session, tmp_path):
        import ray.data

        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "t", SCHEMA, loc))
        rows = [(f"u{i:03d}", f"common token{i}", "x") for i in range(20)]
        src = ray.data.from_arrow(_docs_table(rows))
        c.build_from_parquet("db", "t", src, key_field="_id",
                             num_doc_parts=2, num_term_parts=2)
        assert c.delete_by_ids("db", "t", ["u005"])
        found = c.search("db", "t", {"keyword": "token5", "fields": ["body"],
                                     "limit": 5})[0]
        assert found == []  # deleted

        # full rebuild from a fresh source: u005 replaced, u004a is new
        rows2 = [(f"u{i:03d}", f"common token{i}", "y") for i in range(20)]
        rows2.append(("u004a", "common freshdoc", "y"))
        src2 = ray.data.from_arrow(_docs_table(rows2))
        c.build_from_parquet("db", "t", src2, key_field="_id",
                             num_doc_parts=2, num_term_parts=2)
        assert c.manifest("db", "t").data["tombstone_files"] == []
        # the rebuilt u005 must be searchable again (fresh corpus, no stale delete)
        back = c.search("db", "t", {"keyword": "token5", "fields": ["body"],
                                    "limit": 5})[0]
        assert [r["_id"] for r in back] == ["u005"]
        # and the unrelated new doc must not be hidden by a stale doc_id tombstone
        fresh = c.search("db", "t", {"keyword": "freshdoc", "fields": ["body"],
                                     "limit": 5})[0]
        assert [r["_id"] for r in fresh] == ["u004a"]


class TestAnalyzedFilterWhitespace:
    def test_tab_newline_delimited_tokens_match(self, ray_session, tmp_path):
        import ray.data

        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "t", SCHEMA, loc))
        rows = [("a", "hello\tworld", "x"),
                ("b", "hello\nthere", "x"),
                ("c", "plain hello text", "x"),
                ("d", "nothello here", "x")]
        src = ray.data.from_arrow(_docs_table(rows))
        c.build_from_parquet("db", "t", src, key_field="_id",
                             num_doc_parts=1, num_term_parts=1)
        res = c.filter("db", "t", {
            "filters": {"and": [{"field": "body", "value": "hello"}]},
            "sorts": [], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == ["a", "b", "c"]
        res2 = c.filter("db", "t", {
            "filters": {"and": [{"field": "body", "value": "world"}]},
            "sorts": [], "limit": 10})[0]
        assert sorted(r["_id"] for r in res2) == ["a"]


class TestExtractHeadOnlyP:
    def test_p_only_inside_head_yields_empty(self):
        from byzer_retrieval_ray.functions.extract import extract_text, extract_text_one

        html = b"<html><head><p>head para</p></head><body>no paras here</body></html>"
        assert extract_text_one(html) == ""
        out = extract_text(pa.array([html], pa.binary()))
        assert out.to_pylist() == [""]

    def test_scalar_batch_identity_mixed(self):
        from byzer_retrieval_ray.functions.extract import extract_text, extract_text_one

        htmls = [
            b"<html><head><p>x</p></head><body><p>real</p></body></html>",
            b"<head><p>only head</p></head>",
            b"<body><p>a&amp;b</p><div>skip</div><p>c</p></body>",
            b"no paragraphs at all",
        ]
        expected = [extract_text_one(h) for h in htmls]
        got = extract_text(pa.array(htmls, pa.binary())).to_pylist()
        assert got == expected
