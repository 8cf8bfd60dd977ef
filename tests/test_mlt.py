"""more_like_this: term selection vs brute force, like_text vs stored-field
paths, escape handling, actor/local equality."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings
from byzer_retrieval_ray.functions.queryparser import escape_term

SCHEMA = "st(field(_id,long),field(content,string,analyze),field(tag,string))"

DOCS = [
    {"_id": 0, "content": "alpha beta gamma alpha alpha", "tag": "a"},
    {"_id": 1, "content": "alpha beta delta", "tag": "b"},
    {"_id": 2, "content": "gamma gamma epsilon zeta", "tag": "a"},
    {"_id": 3, "content": "beta beta beta common common", "tag": "b"},
    {"_id": 4, "content": "epsilon zeta eta theta", "tag": "a"},
    {"_id": 5, "content": "common common common iota", "tag": "b"},
]


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("mlt"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "m", SCHEMA, loc))
    c.build_from_local("db", "m", DOCS, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)
    return c


def brute_top_terms(text, docs, k):
    toks = text.split()
    n = len(docs)
    terms, tf = np.unique(toks, return_counts=True)
    df = np.array([sum(1 for d in docs if t in d["content"].split())
                   for t in terms], float)
    score = tf.astype(float) * np.log(n / df)
    order = np.lexsort((terms, -score))
    return [str(t) for t in terms[order[:k]]]


class TestMLT:
    def test_term_selection_matches_brute_force(self, cluster):
        text = DOCS[0]["content"]
        hits, terms = cluster.more_like_this(
            "db", "m", like_text=text, field="content", limit=10,
            max_query_terms=2)
        assert terms == brute_top_terms(text, DOCS, 2)
        # the source doc itself must rank (it contains every query term)
        assert 0 in [h["doc_id"] for h in hits]

    def test_similar_doc_ranks_above_dissimilar(self, cluster):
        hits, _ = cluster.more_like_this(
            "db", "m", like_text=DOCS[2]["content"], field="content",
            limit=10, max_query_terms=3)
        ids = [h["doc_id"] for h in hits]
        # doc 4 shares epsilon+zeta with doc 2; doc 5 shares nothing
        assert 4 in ids
        assert 5 not in ids

    def test_unindexed_terms_dropped(self, cluster):
        # terms absent from the index (df=0) must not be selected (Lucene
        # MLT considers only indexed terms); all-absent → empty result
        hits, terms = cluster.more_like_this(
            "db", "m", like_text="nosuch words here", field="content",
            limit=5, max_query_terms=5)
        assert (hits, terms) == ([], [])
        # mixed: the absent term must not displace the indexed one
        _, terms = cluster.more_like_this(
            "db", "m", like_text="nosuch iota", field="content",
            limit=5, max_query_terms=1)
        assert terms == ["iota"]

    def test_specials_are_escaped(self, cluster):
        # a like_text full of parser specials must not crash the parser;
        # none of these terms are indexed, so the result is empty
        hits, terms = cluster.more_like_this(
            "db", "m", like_text='a+b -c "d (e|f)* g~2 \\h',
            field="content", limit=5, max_query_terms=5)
        assert (hits, terms) == ([], [])

    def test_actor_mode_identical(self, cluster):
        text = DOCS[1]["content"]
        local, t1 = cluster.more_like_this(
            "db", "m", like_text=text, field="content", limit=10,
            max_query_terms=3)
        cluster.activate("db", "m")
        try:
            act, t2 = cluster.more_like_this(
                "db", "m", like_text=text, field="content", limit=10,
                max_query_terms=3)
        finally:
            cluster.deactivate("db", "m")
        assert t1 == t2
        assert [(h["doc_id"], h["_score"]) for h in local] == \
               [(h["doc_id"], h["_score"]) for h in act]


def test_escape_term_roundtrip():
    from byzer_retrieval_ray.functions.queryparser import parse_keyword
    ugly = 'a+b"c*d~(e)|f\\g-h'
    pk = parse_keyword(escape_term(ugly))
    assert pk.should == [ugly]
    assert not (pk.must or pk.must_not or pk.phrases or pk.prefixes
                or pk.fuzzies or pk.must_groups or pk.slop_phrases)
