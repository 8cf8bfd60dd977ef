"""Round-4 second-wave query features across DELTA generations: a table
built base+delta must answer regexp / synonyms / min_should_match / nested
groups / count / explain / BM25F exactly like a fresh single-generation
build of the same final corpus (Lucene multi-segment semantics — StatsView
sums active generations, so collection stats and therefore scores match)."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings

SCHEMA = ("st(field(_id,long),field(title,string,analyze),"
          "field(body,string,analyze))")

BASE = [
    {"_id": 0, "title": "merge sort", "body": "fast stable algorithm"},
    {"_id": 1, "title": "hash join", "body": "merge phase inside"},
    {"_id": 3, "title": "quick sort", "body": "partition exchange swap"},
]
# PURE-ADD delta: no replacements, so collection stats (df / sum_ttf) are
# identical to the fresh build and scores must match exactly. Replacement
# semantics (tombstoned docs still count in stats until compaction — Lucene
# deleted-doc behavior) are covered separately below, membership-only.
DELTA = [
    {"_id": 2, "title": "scan", "body": "merge merge merge"},
    {"_id": 4, "title": "binary search", "body": "sorted array probe"},
]
FINAL = BASE + DELTA


def _mk(loc, docs_steps):
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "t", SCHEMA, loc))
    for docs in docs_steps:
        c.build_from_local("db", "t", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
    return c


QUERIES = [
    {"keyword": "/m.rge/ sort", "fields": ["body", "title"]},
    {"keyword": "merge", "fields": ["body"], "synonyms": {"merge": ["swap"]}},
    {"keyword": "merge sort probe", "fields": ["title", "body"],
     "min_should_match": 2},
    {"keyword": "sort (merge +phase)", "fields": ["title", "body"]},
    {"keyword": "sort -(+merge +stable)", "fields": ["title", "body"]},
    {"keyword": "merge sort", "combined_fields": ["title^2", "body"]},
    {"keyword": "merge sort", "fields": ["title^2", "body"]},
]


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    delta = _mk(str(tmp_path_factory.mktemp("sw_delta")), [BASE, DELTA])
    fresh = _mk(str(tmp_path_factory.mktemp("sw_fresh")), [FINAL])
    return delta, fresh


class TestSecondWaveAcrossDeltas:
    def test_two_generations_active(self, pair):
        delta, _ = pair
        assert delta.manifest("db", "t").active_generations() == [1, 2]

    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_results_match_fresh_build(self, pair, qi):
        delta, fresh = pair
        q = dict(QUERIES[qi], limit=20)
        a = [(r["_id"], r["_score"]) for r in
             delta.search("db", "t", q, precision="float64")[0]]
        b = [(r["_id"], r["_score"]) for r in
             fresh.search("db", "t", q, precision="float64")[0]]
        # same docs in the same order; scores equal to float64 round-off
        assert [x[0] for x in a] == [x[0] for x in b], q
        for (ai, asc), (bi, bsc) in zip(a, b):
            assert asc == pytest.approx(bsc, abs=1e-12), q
        assert a, q   # every query matches something

    def test_count_and_explain_match(self, pair):
        delta, fresh = pair
        q = {"keyword": "merge sort", "fields": ["title", "body"],
             "limit": 20}
        assert delta.count("db", "t", q) == fresh.count("db", "t", q)
        # explain a doc living in the DELTA generation (doc 2, added there)
        res = delta.search("db", "t", q, precision="float64")[0]
        byid = {r["_id"]: r["_score"] for r in res}
        assert 2 in byid   # the delta-added doc (merge ×3) matches
        ex = delta.explain("db", "t", q, 2, precision="float64")
        assert ex["matched"] and ex["score"] == byid[2]

    def test_aggregations_match_fresh_build(self, ray_session,
                                            tmp_path_factory):
        # round-4-late endpoints (collapse / function_score /
        # significant_terms / cardinality) across a PURE-ADD delta: every
        # aggregation must equal the fresh single-generation build
        schema = ("st(field(_id,long),field(body,string,analyze),"
                  "field(cat,string),field(pop,long))")
        base = [{"_id": i, "body": "hit " + ("extra" if i % 4 == 0 else "x"),
                 "cat": ["a", "b", "c"][i % 3], "pop": (i * 13) % 50}
                for i in range(30)]
        delta = [{"_id": 30 + i, "body": "hit deep",
                  "cat": ["c", "d"][i % 2], "pop": 7 + i}
                 for i in range(12)]

        def mk(loc, steps):
            c = RetrievalCluster(loc)
            c.create_table(TableSettings("db", "t", schema, loc))
            for docs in steps:
                c.build_from_local("db", "t", docs, key_field="_id",
                                   num_doc_parts=2, num_term_parts=2)
            return c

        d = mk(str(tmp_path_factory.mktemp("agg_delta")), [base, delta])
        f = mk(str(tmp_path_factory.mktemp("agg_fresh")), [base + delta])
        q = {"keyword": "hit", "fields": ["body"], "limit": 8}
        assert d.collapse_search("db", "t", q, "cat", precision="float64") \
            == f.collapse_search("db", "t", q, "cat", precision="float64")
        assert d.collapse_search("db", "t", q, "cat", precision="float64",
                                 group_size=2) \
            == f.collapse_search("db", "t", q, "cat", precision="float64",
                                 group_size=2)
        spec = {"field": "pop", "modifier": "log1p"}
        a = d.function_search("db", "t", q, spec, precision="float64")
        b = f.function_search("db", "t", q, spec, precision="float64")
        assert [(r["_id"], r["_score"]) for r in a] == \
               [(r["_id"], r["_score"]) for r in b]
        assert d.significant_terms("db", "t", q, "body") == \
            f.significant_terms("db", "t", q, "body")
        assert d.cardinality("db", "t", q, "cat", p=10) == \
            f.cardinality("db", "t", q, "cat", p=10)

    def test_replacement_tombstones_invisible_everywhere(
            self, ray_session, tmp_path):
        # upsert REPLACING a doc: its old body must not match via any new
        # feature (membership-only — replacement shifts stats by design,
        # Lucene deleted-docs-count-until-merge semantics)
        c = _mk(str(tmp_path), [
            BASE + [{"_id": 9, "title": "tomb",
                     "body": "old text to be replaced"}],
            [{"_id": 9, "title": "tomb", "body": "merge merge merge"}],
        ])
        for q in ({"keyword": "/repl.ced/", "fields": ["body"]},
                  {"keyword": "replaced", "fields": ["body"],
                   "synonyms": {"replaced": ["nonexistenttoken"]}},
                  {"keyword": "replaced", "combined_fields": ["body"]},
                  {"keyword": "old (text +replaced)", "fields": ["body"]}):
            res = c.search("db", "t", dict(q, limit=10))[0]
            assert res == [], q
        # the replacement itself is visible through the new features
        res = c.search("db", "t", {"keyword": "/m.rge/", "fields": ["body"],
                                   "limit": 10})[0]
        assert 9 in {r["_id"] for r in res}
