"""Regression tests for the round-2 ADVICE findings.

1. num_serving_buckets with integer-key (mod-routed) tables: doc partitions are
   residue classes (key % num_doc_parts), so grouping consecutive partitions into
   one serving bucket interleaves doc ids across runs — merge_runs must re-sort
   each merged (field, term, bucket) posting (and its per-doc position
   sub-streams) instead of failing the strictly-increasing invariant.
2. _phrase_posting occurrence-key packing must not alias docs with >= 2^21 tokens
   into the next doc's key space.
3. The NRT manifest poll must surface DELTA generations published by another
   process, not just tombstones and replace-mode publishes.
4. expand_prefix/expand_fuzzy: the expansion cap must be deterministic (sorted
   order, not term-range scan order) and signalled, not silent.
"""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

LONG_SCHEMA = "st(field(_id,long),field(content,string,analyze),field(tag,string))"


def _long_docs(n=40):
    rows = []
    for i in range(n):
        phrase = "alpha beta" if i % 3 == 0 else "beta alpha"
        rows.append({"_id": i, "content": f"{phrase} common w{i % 7} tok{i}",
                     "tag": f"t{i % 2}"})
    return pa.table({
        "_id": pa.array([r["_id"] for r in rows], pa.int64()),
        "content": pa.array([r["content"] for r in rows], pa.string()),
        "tag": pa.array([r["tag"] for r in rows], pa.string()),
    })


class TestModKeyServingBuckets:
    """ADVICE #1: long keys + num_serving_buckets < num_doc_parts."""

    @pytest.fixture(scope="class")
    def clusters(self, ray_session, tmp_path_factory):
        import ray.data
        tbl = _long_docs()
        built = {}
        for label, nsb in (("grouped", 2), ("plain", None)):
            loc = str(tmp_path_factory.mktemp(f"modbuckets_{label}"))
            c = RetrievalCluster(loc)
            c.create_table(TableSettings("db", "t", LONG_SCHEMA, loc))
            c.build_from_parquet("db", "t", ray.data.from_arrow(tbl),
                                 key_field="_id", num_doc_parts=4,
                                 num_term_parts=3, num_serving_buckets=nsb)
            built[label] = c
        return built

    @pytest.mark.parametrize("keyword", ["common", "alpha beta", '"alpha beta"',
                                         "+common -w3", "tok7 | tok11"])
    @pytest.mark.parametrize("algorithm", ["taat", "bmw"])
    def test_grouped_matches_ungrouped(self, clusters, keyword, algorithm):
        q = SearchQuery("db", "t", keyword=keyword, fields=["content"], limit=50)
        got = clusters["grouped"].search("db", "t", q, algorithm=algorithm)[0]
        want = clusters["plain"].search("db", "t", q, algorithm=algorithm)[0]
        assert [(r["_id"], r["_score"]) for r in got] == \
            [(r["_id"], r["_score"]) for r in want]

    def test_grouped_bucket_count(self, clusters):
        m = clusters["grouped"].manifest("db", "t")
        from byzer_retrieval_ray.index.searcher import GenerationReader
        g = GenerationReader(m.data)
        assert g.buckets() == [0, 1]
        assert g.bucket_spec == {"mode": "mod", "parts": 4, "group": 2}

    def test_phrase_positions_survive_merge_resort(self, clusters):
        # "alpha beta" docs are exactly i % 3 == 0 with ids interleaved across
        # the two grouped residue classes — exercises the position permutation
        q = SearchQuery("db", "t", keyword='"alpha beta"', fields=["content"],
                        limit=50)
        got = clusters["grouped"].search("db", "t", q)[0]
        assert sorted(r["_id"] for r in got) == [i for i in range(40) if i % 3 == 0]


class TestPhraseKeyPacking:
    """ADVICE #2: occurrence keys must not alias docs with >= 2^21 token positions."""

    def _posting(self, docs, tfs, pos_lists):
        from byzer_retrieval_ray.index.searcher import Posting
        docs = np.array(docs, np.int64)
        tfs = np.array(tfs, np.int64)
        norms = np.full(docs.size, 120, np.uint8)
        starts = np.arange(0, docs.size, 128)
        p = Posting(docs, tfs, norms, docs[starts],
                    np.maximum.reduceat(tfs, starts),
                    np.minimum.reduceat(norms, starts))
        flat = np.concatenate([np.array(pl, np.int64) for pl in pos_lists])
        offs = np.zeros(docs.size + 1, np.int64)
        np.cumsum(tfs, out=offs[1:])
        p._pos = (flat, offs)
        return p

    def test_giant_doc_does_not_alias_into_next_doc(self):
        from byzer_retrieval_ray.index.searcher import BucketSearcher
        BIG = 1 << 21
        # old 2^21 packing: doc0's a@BIG-1 yields start key BIG-1; key+1 == BIG
        # collides with candidate-index-1 (doc1)'s b@0 → false phrase match
        posts = {("f", "a"): self._posting([0, 1], [1, 1], [[BIG - 1], [5]]),
                 ("f", "b"): self._posting([0, 1], [1, 1], [[3], [0]])}
        pp = BucketSearcher._phrase_posting(None, "f", ("a", "b"), posts)
        assert pp is None

    def test_true_match_beyond_2_21(self):
        from byzer_retrieval_ray.index.searcher import BucketSearcher
        BIG = 1 << 21
        posts = {("f", "a"): self._posting([0, 1], [1, 1], [[BIG + 10], [5]]),
                 ("f", "b"): self._posting([0, 1], [1, 1], [[BIG + 11], [99]])}
        pp = BucketSearcher._phrase_posting(None, "f", ("a", "b"), posts)
        assert pp is not None
        assert pp.docs.tolist() == [0] and pp.tfs.tolist() == [1]


class TestParenGroups:
    """VERDICT #6: SimpleQueryParser parenthesized precedence subset."""

    def test_parse_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("+(a | b) -c d")
        assert p.must_groups == [("a", "b")]
        assert p.must_not == ["c"] and p.should == ["d"]
        p = parse_keyword("(a b) c")            # bare OR group flattens
        assert p.should == ["a", "b", "c"] and not p.must_groups
        p = parse_keyword("-(a | b) c")         # NOT(a OR b) == -a -b
        assert p.must_not == ["a", "b"] and p.should == ["c"]
        p = parse_keyword("+(a)")               # single-member group == +a
        assert p.must == ["a"] and not p.must_groups
        p = parse_keyword("+(a b) +(c | d)")    # multiple required groups
        assert p.must_groups == [("a", "b"), ("c", "d")]

    def test_previously_rejected_shapes_now_parse(self):
        # round 4: groups recurse — nesting, operators and multi-term clauses
        # inside groups are flattened by exact boolean algebra
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("+(a (b c))")         # nested OR flattens into the group
        assert p.must_groups == [("a", "b", "c")]
        p = parse_keyword("(a +b)")             # whole-query group splices
        assert p.must == ["b"] and p.should == ["a"]
        p = parse_keyword("(a* b)")             # prefix member of a bare group
        assert p.prefixes == ["a"] and p.should == ["b"]

    def test_parse_non_flat_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        with pytest.raises(ValueError):
            parse_keyword("(a b")               # unbalanced still raises
        # round-4 second wave: the formerly-rejected flat-inexpressible
        # shapes become nested nodes evaluated recursively by the searcher
        p = parse_keyword("foo (bar +baz)")     # scoped requirement
        assert len(p.should_groups) == 1 and p.should_groups[0].must == ["baz"]
        p = parse_keyword("-(+a +b)")           # excluded conjunction
        assert len(p.not_groups) == 1 and p.not_groups[0].must == ["a", "b"]


class TestEscape:
    """SimpleQueryParser ESCAPE: \\X makes a special character literal; the
    whitespace analyzer indexes such tokens verbatim, so escaped queries hit
    real dictionary terms."""

    def test_parser_escapes_specials(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword(r"\+foo bar")
        assert p.should == ["+foo", "bar"] and p.must == []
        p = parse_keyword(r"foo\* baz*")
        assert p.should == ["foo*"] and p.prefixes == ["baz"]
        p = parse_keyword(r"\-x +\-y")
        assert p.should == ["-x"] and p.must == ["-y"]
        p = parse_keyword(r"a\~1 b~1")
        assert p.should == ["a~1"] and p.fuzzies == [("b", 1)]
        p = parse_keyword(r'\"quoted\" word')
        assert p.should == ['"quoted"', "word"]
        # round 4: the recursive scanner emits clauses in DOCUMENT order
        # (the within-list order is part of the fixed float-addition clause
        # order, mirrored by the oracle SQL where it matters)
        p = parse_keyword(r"\(lit\) (or1 | or2)")
        assert p.should == ["(lit)", "or1", "or2"]
        p = parse_keyword(r"back\\slash")
        assert p.should == ["back\\slash"]
        # backslash before a non-special char is dropped (Lucene)
        assert parse_keyword(r"\word").should == ["word"]
        # escapes inside phrases stay literal phrase terms
        p = parse_keyword(r'"\+a b"')
        assert p.phrases == [("+a", "b")]

    def test_escaped_query_hits_literal_tokens(self, ray_session, tmp_path):
        import ray.data
        tbl = pa.table({
            "_id": pa.array([0, 1, 2], pa.int64()),
            "content": pa.array(["the +flag token", "the flag token",
                                 "c~d star* here"], pa.string()),
            "tag": pa.array(["a", "b", "c"], pa.string()),
        })
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "t", LONG_SCHEMA, loc))
        c.build_from_parquet("db", "t", ray.data.from_arrow(tbl),
                             key_field="_id", num_doc_parts=2, num_term_parts=2)
        q = SearchQuery("db", "t", keyword=r"\+flag", fields=["content"], limit=10)
        assert [r["_id"] for r in c.search("db", "t", q)[0]] == [0]
        q = SearchQuery("db", "t", keyword=r"c\~d star\*", fields=["content"],
                        limit=10)
        assert [r["_id"] for r in c.search("db", "t", q)[0]] == [2]
        # unescaped versions keep operator meaning: "star*" is a prefix query
        q = SearchQuery("db", "t", keyword="star*", fields=["content"], limit=10)
        assert [r["_id"] for r in c.search("db", "t", q)[0]] == [2]


class TestBoundedFuzzyExpansion:
    """VERDICT #2: the edit-distance DP must not scan the whole dictionary."""

    def _vocab(self, n=20_000):
        rng = np.random.default_rng(7)
        letters = list("abcdefghijklmnopqrstuvwxyz")
        words = set()
        while len(words) < n:
            ln = int(rng.integers(3, 12))
            words.add("".join(rng.choice(letters, ln)))
        return sorted(words)

    def test_prefilter_small_and_complete_on_20k_vocab(self):
        from byzer_retrieval_ray.functions.fuzzy import (edit_distance_within,
                                                         fuzzy_candidates)
        vocab = self._vocab()
        lens = np.array([len(t) for t in vocab], np.int64)
        q = vocab[1234]
        for n in (1, 2):
            cand = fuzzy_candidates(q, vocab, lens, n)
            # the DP row count is a small fraction of the vocabulary
            assert cand.size < 0.05 * len(vocab), \
                f"n={n}: {cand.size}/{len(vocab)} candidates"
            # and complete: nothing a full-dictionary DP finds is pruned
            full = np.flatnonzero(edit_distance_within(q, vocab, n, True))
            assert set(full.tolist()).issubset(set(cand.tolist()))

    def test_prefilter_handles_empty_and_exact(self):
        from byzer_retrieval_ray.functions.fuzzy import fuzzy_candidates
        assert fuzzy_candidates("abc", [], np.empty(0, np.int64), 1).size == 0
        terms = ["abc", "abd", "xyz"]
        lens = np.array([3, 3, 3], np.int64)
        assert fuzzy_candidates("abc", terms, lens, 0).tolist() == [0]


class TestExpansionCap:
    """ADVICE #4: caps must be deterministic (sorted order) and logged."""

    @pytest.fixture()
    def reader(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "t", "st(field(_id,string),field(content,string,analyze))", loc))
        docs = [{"_id": f"d{i}", "content": f"q{ch}"}
                for i, ch in enumerate("zyxwvutsrq")]
        c.build_from_local("db", "t", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        from byzer_retrieval_ray.index.searcher import GenerationReader
        return GenerationReader(c.manifest("db", "t").data)

    def test_fuzzy_cap(self, reader, caplog):
        import logging
        with caplog.at_level(logging.WARNING,
                             logger="byzer_retrieval_ray.index.searcher"):
            out = reader.expand_fuzzy("content", "q", 1, limit=4)
        assert out == ["qq", "qr", "qs", "qt"]   # smallest matches, sorted
        assert any("cap" in r.message for r in caplog.records)

    def test_prefix_cap(self, reader, caplog):
        import logging
        with caplog.at_level(logging.WARNING,
                             logger="byzer_retrieval_ray.index.searcher"):
            out = reader.expand_prefix("content", "q", limit=3)
        assert out == ["qq", "qr", "qs"]
        assert any("cap" in r.message for r in caplog.records)
        assert reader.expand_prefix("content", "q", limit=100) == \
            sorted(f"q{ch}" for ch in "zyxwvutsrq")
