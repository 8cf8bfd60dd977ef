"""Phrase queries over positional postings (SimpleQueryParser quoted groups,
RetrievalWorker.java:339-341; scoring = Lucene PhraseQuery over BM25: tf = exact
phrase frequency, idf = Σ per-term idf)."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.functions import bm25
from byzer_retrieval_ray.functions.smallfloat import int_to_byte4_np

SCHEMA = "st(field(_id,long),field(content,string,analyze))"

DOCS = [
    (0, "quick brown fox jumps"),
    (1, "brown quick fox"),                       # terms present, wrong order
    (2, "the quick brown dog and quick brown cat"),   # phrase twice
    (3, "quick stop then brown"),                 # not adjacent
    (4, "totally unrelated words here"),
    (5, "prefix quick brown"),                    # phrase at end
    (6, "quick quick quick"),                     # repeated-term doc
]


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("phrase"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "p", SCHEMA, loc))
    docs = [{"_id": i, "content": t} for i, t in DOCS]
    c.build_from_local("db", "p", docs, key_field="_id",
                       num_doc_parts=2, num_term_parts=2)
    return c


def _phrase_oracle(phrase: list[str], limit: int = 10):
    """Brute-force Lucene phrase-BM25 over DOCS (float64)."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    dls = {i: len(tt) for i, tt in toks.items()}
    sum_ttf = sum(dls.values())
    avgdl = bm25.avg_field_length(sum_ttf, n, dtype=np.float64)
    cache = bm25.norm_inverse_cache(avgdl, dtype=np.float64)
    df = {t: sum(1 for tt in toks.values() if t in tt)
          for t in set(w for p in [phrase] for w in p)}
    w = sum(bm25.term_weight(n, df[t], dtype=np.float64) for t in phrase)
    out = []
    for i, tt in toks.items():
        freq = sum(1 for j in range(len(tt) - len(phrase) + 1)
                   if tt[j:j + len(phrase)] == phrase)
        if freq:
            nb = int(int_to_byte4_np(np.array([dls[i]]))[0])
            s = float(bm25.score_tf_norm(np.array([freq]), np.array([nb], np.uint8),
                                         cache, np.float64(w), dtype=np.float64)[0])
            out.append((i, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:limit]


class TestPhrase:
    def test_exact_adjacency_only(self, cluster):
        res = cluster.search("db", "p", {"keyword": '"quick brown"',
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [0, 2, 5]

    def test_scores_match_phrase_oracle(self, cluster):
        res = cluster.search("db", "p", {"keyword": '"quick brown"',
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        got = [(r["_id"], r["_score"]) for r in res]
        want = _phrase_oracle(["quick", "brown"])
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-12)
        # doc 2 has the phrase twice → higher tf than single-occurrence docs
        scores = dict(got)
        assert scores[2] > min(scores[0], scores[5]) or len(DOCS[2][1].split()) > 0

    def test_taat_bmw_parity(self, cluster):
        for kw in ('"quick brown"', '"quick brown" fox', 'dog "brown fox"'):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]

    def test_three_term_phrase_and_repeats(self, cluster):
        res = cluster.search("db", "p", {"keyword": '"quick brown fox"',
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [0]
        res = cluster.search("db", "p", {"keyword": '"quick quick"',
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [6]   # overlapping occurrences: freq 2

    def test_mixed_term_and_phrase(self, cluster):
        # OR of a term clause and a phrase clause: docs matching either qualify
        res = cluster.search("db", "p", {"keyword": 'unrelated "quick brown"',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 2, 4, 5]

    def test_must_and_not_phrases(self, cluster):
        # +"quick brown": phrase required
        res = cluster.search("db", "p", {"keyword": '+"quick brown" fox',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 2, 5]
        # -"quick brown": phrase prohibited
        res = cluster.search("db", "p", {"keyword": 'quick -"quick brown"',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [1, 3, 6]

    def test_positions_off_raises(self, ray_session, tmp_path):
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "np", SCHEMA, loc))
        from byzer_retrieval_ray.index.build import build_index
        import ray.data
        src = ray.data.from_items([{"_id": 1, "content": "a b c"}])
        build_index(src, c.manifest("db", "np"), key_field="_id",
                    num_doc_parts=1, num_term_parts=1, positions=False)
        with pytest.raises(RuntimeError, match="positions"):
            c.search("db", "np", {"keyword": '"a b"', "fields": ["content"],
                                  "limit": 5})


class TestPrefix:
    def test_prefix_matches_constant_score(self, cluster):
        res = cluster.search("db", "p", {"keyword": "qui*", "fields": ["content"],
                                         "limit": 10}, precision="float64")[0]
        # every doc containing a token starting with "qui" scores exactly 1.0
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        assert all(r["_score"] == 1.0 for r in res)

    def test_prefix_mixed_with_term(self, cluster):
        # BM25 term score + 1.0 for the prefix clause
        only_term = {r["_id"]: r["_score"] for r in cluster.search(
            "db", "p", {"keyword": "unrelated", "fields": ["content"], "limit": 10},
            precision="float64")[0]}
        mixed = {r["_id"]: r["_score"] for r in cluster.search(
            "db", "p", {"keyword": "unrelated qui*", "fields": ["content"],
                        "limit": 10}, precision="float64")[0]}
        assert mixed[4] == pytest.approx(only_term[4])          # term only
        assert mixed[0] == 1.0                                   # prefix only
        assert set(mixed) == {0, 1, 2, 3, 4, 5, 6}

    def test_must_and_not_prefix(self, cluster):
        res = cluster.search("db", "p", {"keyword": "+bro* quick",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5]  # must contain bro*
        res = cluster.search("db", "p", {"keyword": "quick -bro*",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [6]

    def test_prefix_taat_bmw_parity(self, cluster):
        for kw in ("qui*", "unrelated qui*", '"quick brown" sto*'):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]

    def test_no_match_prefix(self, cluster):
        res = cluster.search("db", "p", {"keyword": "zzz*", "fields": ["content"],
                                         "limit": 10})[0]
        assert res == []


class TestFuzzy:
    def test_fuzzy_expansion_matches(self, cluster):
        # "quack" ~1 of "quick"? distance 2 (u->u, a->i is 1 sub, ck vs ck) =
        # qu[a]ck vs qu[i]ck -> 1 substitution
        res = cluster.search("db", "p", {"keyword": "quack~1",
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        assert all(r["_score"] == 1.0 for r in res)
        # distance 1 from "fx" finds "fox" (insertion)
        res = cluster.search("db", "p", {"keyword": "fx~1",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1]

    def test_bare_tilde_is_distance_two(self, cluster):
        # "bruwn~" = distance 2 default: matches "brown" (1 sub)
        res = cluster.search("db", "p", {"keyword": "bruwn~",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5]

    def test_transpositions_flag(self, cluster):
        # "borwn" -> "brown" is one transposition: OSA distance 1, Levenshtein 2
        q = {"keyword": "borwn~1", "fields": ["content"], "limit": 10}
        with_t = cluster.search("db", "p", q)[0]
        assert sorted(r["_id"] for r in with_t) == [0, 1, 2, 3, 5]
        without_t = cluster.search("db", "p", q, fuzzy_transpositions=False)[0]
        assert without_t == []

    def test_must_not_fuzzy_and_parity(self, cluster):
        res = cluster.search("db", "p", {"keyword": "quick -fx~1",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [2, 3, 5, 6]   # fox docs excluded
        for kw in ("quack~1", "unrelated fx~1", '+fx~1 "quick brown"'):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]


class TestSloppy:
    """Sloppy phrases "a b"~N: in-order tightest-chain matches with
    cost = span − (len−1) ≤ N, tf = Σ 1/(1+cost) (Lucene sloppy frequency);
    documented divergence: transposed matches don't match."""

    def test_slop_widens_matches(self, cluster):
        # doc 3 "quick stop then brown": quick@0, brown@3 → cost 2
        q1 = cluster.search("db", "p", {"keyword": '"quick brown"~1',
                                        "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in q1) == [0, 2, 5]
        q2 = cluster.search("db", "p", {"keyword": '"quick brown"~2',
                                        "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in q2) == [0, 2, 3, 5]

    def test_in_order_only(self, cluster):
        # doc 1 "brown quick fox" is transposed: never matched (documented)
        for slop in (1, 2, 5):
            res = cluster.search("db", "p", {"keyword": f'"quick brown"~{slop}',
                                             "fields": ["content"], "limit": 10})[0]
            assert 1 not in [r["_id"] for r in res]

    def test_slop_zero_is_exact_phrase(self, cluster):
        exact = cluster.search("db", "p", {"keyword": '"quick brown"',
                                           "fields": ["content"], "limit": 10},
                               precision="float64")[0]
        zero = cluster.search("db", "p", {"keyword": '"quick brown"~0',
                                          "fields": ["content"], "limit": 10},
                              precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in exact] == \
               [(r["_id"], r["_score"]) for r in zero]

    def test_scores_match_oracle(self, cluster):
        from tests.oracle_bm25 import OracleIndex
        oidx = OracleIndex([i for i, _ in DOCS], [t for _, t in DOCS])
        for kw in ('"quick brown"~2', '"quick brown"~1 fox',
                   '+"quick fox"~2', 'jumps -"quick brown"~3',
                   '"quick brown cat"~4', '"quick quick"~3'):
            for algo in ("taat", "bmw"):
                res = cluster.search("db", "p", {"keyword": kw,
                                                 "fields": ["content"],
                                                 "limit": 10}, algorithm=algo)[0]
                ids = np.array([r["_id"] for r in res], np.int64)
                scores = np.array([r["_score"] for r in res], np.float32)
                oids, oscores = oidx.search(kw, 10)
                np.testing.assert_array_equal(ids, oids, err_msg=f"{kw} {algo}")
                np.testing.assert_array_equal(scores, oscores,
                                              err_msg=f"{kw} {algo}")

    def test_tighter_match_outranks_looser(self, cluster):
        # "quick fox": doc 1 has cost 1 (quick@1 fox@2 → wait: span 1, cost 0);
        # doc 0 quick@0 fox@2 → cost 1 → doc 1 (cost 0) must outscore doc 0
        # at equal-ish norms — both 3-4 tokens; assert relative order via tf
        res = cluster.search("db", "p", {"keyword": '"quick fox"~2',
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        scores = {r["_id"]: r["_score"] for r in res}
        assert set(scores) == {0, 1}
        assert scores[1] > scores[0]


class TestUnorderedSlop:
    """SearchQuery(slop_in_order=False): Lucene SloppyPhraseMatcher parity
    for non-repeating terms — out-of-order alignments match (a transposed
    adjacent pair costs 2), tf = Σ 1/(1+matchLength) over the published
    stream enumeration. Expected tfs below are hand-derived from that
    algorithm over the DOCS corpus."""

    @staticmethod
    def _q(kw, slop_in_order):
        return {"keyword": kw, "fields": ["content"], "limit": 10,
                "slop_in_order": slop_in_order}

    def test_transposed_matches_at_cost_two(self, cluster):
        # "brown quick"~2 unordered: doc 0 (quick brown …) matches at
        # matchLength 2; default in-order mode still rejects it
        uo = cluster.search("db", "p", self._q('"brown quick"~2', False))[0]
        assert sorted(r["_id"] for r in uo) == [0, 1, 2, 5]
        o = cluster.search("db", "p", self._q('"brown quick"~2', True))[0]
        assert sorted(r["_id"] for r in o) == [1, 2]
        # slop 1 is not enough for a transposition (cost 2); doc 2's
        # in-order gap match is ALSO length 2 (brown@2 → quick@5), so only
        # doc 1's exact "brown quick" survives
        uo1 = cluster.search("db", "p", self._q('"brown quick"~1', False))[0]
        assert sorted(r["_id"] for r in uo1) == [1]

    def test_superset_of_ordered(self, cluster):
        for kw in ('"quick brown"~0', '"quick brown"~1', '"quick brown"~2',
                   '"quick fox"~2', '"brown fox"~3', '"quick brown fox"~4'):
            o = {r["_id"] for r in cluster.search("db", "p",
                                                  self._q(kw, True))[0]}
            uo = {r["_id"] for r in cluster.search("db", "p",
                                                   self._q(kw, False))[0]}
            assert uo >= o, kw

    def test_scores_match_stream_tfs(self, cluster):
        # "brown quick"~2 unordered expected sloppy freqs (hand-traced):
        # doc 0 quick@0 brown@1 → one match, length 2 → 1/3
        # doc 1 brown@0 quick@1 → in-order for this query, length 0 → 1
        # doc 2 quick@{1,5} brown@{2,6} → three scored matches of length
        #       2, 2, 2... stream trace gives 1/3+1/3+1/3 = 1
        # doc 5 quick@1 brown@2 → one match, length 2 → 1/3
        want_tf = {0: 1.0 / 3.0, 1: 1.0, 2: 1.0, 5: 1.0 / 3.0}
        toks = {i: t.split() for i, t in DOCS}
        n = len(DOCS)
        dls = {i: len(tt) for i, tt in toks.items()}
        sum_ttf = sum(dls.values())
        avgdl = bm25.avg_field_length(sum_ttf, n, dtype=np.float64)
        cache = bm25.norm_inverse_cache(avgdl, dtype=np.float64)
        df = {t: sum(1 for tt in toks.values() if t in tt)
              for t in ("brown", "quick")}
        w = sum(bm25.term_weight(n, df[t], dtype=np.float64)
                for t in ("brown", "quick"))
        res = cluster.search("db", "p", self._q('"brown quick"~2', False),
                             precision="float64")[0]
        got = {r["_id"]: r["_score"] for r in res}
        assert set(got) == set(want_tf)
        for i, tf in want_tf.items():
            nb = int(int_to_byte4_np(np.array([dls[i]]))[0])
            s = float(bm25.score_tf_norm(np.array([tf]),
                                         np.array([nb], np.uint8),
                                         cache, np.float64(w),
                                         dtype=np.float64)[0])
            assert got[i] == pytest.approx(s, abs=1e-12), i

    def test_in_order_text_same_tf_as_ordered(self, cluster):
        # on docs whose terms appear in query order the stream enumeration
        # yields the same tf as the ordered tightest-chain (doc 0 exact,
        # doc 2 twice, doc 3 gap cost 2, doc 5 exact) — scores equal; the
        # unordered result adds doc 1 (transposed) on top
        o = cluster.search("db", "p", self._q('"quick brown"~2', True),
                           precision="float64")[0]
        uo = cluster.search("db", "p", self._q('"quick brown"~2', False),
                            precision="float64")[0]
        os = {r["_id"]: r["_score"] for r in o}
        uos = {r["_id"]: r["_score"] for r in uo}
        assert set(os) == {0, 2, 3, 5}
        assert set(uos) == {0, 1, 2, 3, 5}
        for i in os:
            assert uos[i] == pytest.approx(os[i], abs=1e-12), i

    def test_taat_bmw_parity_unordered(self, cluster):
        for kw in ('"brown quick"~2', '"fox quick"~3 jumps',
                   '+"brown quick"~2 fox', '-"brown quick"~2 quick'):
            a = cluster.search("db", "p", self._q(kw, False),
                               precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", self._q(kw, False),
                               precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b], kw

    def _score_of(self, tf: float, doc_id: int, terms: list[str]) -> float:
        toks = {i: t.split() for i, t in DOCS}
        n = len(DOCS)
        dls = {i: len(tt) for i, tt in toks.items()}
        avgdl = bm25.avg_field_length(sum(dls.values()), n, dtype=np.float64)
        cache = bm25.norm_inverse_cache(avgdl, dtype=np.float64)
        df = {t: sum(1 for tt in toks.values() if t in tt) for t in terms}
        w = sum(bm25.term_weight(n, df[t], dtype=np.float64) for t in terms)
        nb = int(int_to_byte4_np(np.array([dls[doc_id]]))[0])
        return float(bm25.score_tf_norm(np.array([tf]),
                                        np.array([nb], np.uint8), cache,
                                        np.float64(w), dtype=np.float64)[0])

    def test_repeated_terms_hand_traced(self, cluster):
        # round-5: Lucene's repeats grouping (collide/lesser/advanceRpts) —
        # two slots of one term never consume the same token occurrence.
        # "quick quick"~0: doc 6 (quick@0,1,2) has two exact adjacent pairs
        # → stream freq 2; doc 2 (quick@1,5) spans 3 > 0 → no match.
        res = cluster.search("db", "p", self._q('"quick quick"~0', False),
                             precision="float64")[0]
        got = {r["_id"]: r["_score"] for r in res}
        assert set(got) == {6}
        assert got[6] == pytest.approx(
            self._score_of(2.0, 6, ["quick", "quick"]), abs=1e-12)
        # "quick quick"~3 additionally matches doc 2 at matchLength 3
        # (quick@1 + quick@5, adjusted span (5-1)-1 = 3) → weight 1/4
        res3 = cluster.search("db", "p", self._q('"quick quick"~3', False),
                              precision="float64")[0]
        got3 = {r["_id"]: r["_score"] for r in res3}
        assert set(got3) == {2, 6}
        assert got3[2] == pytest.approx(
            self._score_of(0.25, 2, ["quick", "quick"]), abs=1e-12)
        # triple repeat: only doc 6 can place three collision-free slots —
        # exactly one exact occurrence (hand-traced stream: freq 1)
        rt = cluster.search("db", "p",
                            self._q('"quick quick quick"~0', False),
                            precision="float64")[0]
        gt = {r["_id"]: r["_score"] for r in rt}
        assert set(gt) == {6}
        assert gt[6] == pytest.approx(
            self._score_of(1.0, 6, ["quick", "quick", "quick"]), abs=1e-12)

    def test_repeated_terms_fewer_occurrences_never_match(self, cluster):
        # docs with ONE quick (0, 1, 3, 5) can never fill two quick slots
        # at any slop — the collision rule, not a span bound
        res = cluster.search("db", "p", self._q('"quick quick"~100', False),
                             precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [2, 6]

    def test_repeated_terms_taat_bmw_parity(self, cluster):
        for kw in ('"quick quick"~0', '"quick quick"~3',
                   '"quick quick quick"~1'):
            a = cluster.search("db", "p", self._q(kw, False),
                               precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", self._q(kw, False),
                               precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b], kw

    def test_flag_does_not_leak_between_queries(self, cluster):
        # an unordered query followed by a DEFAULT query on the same
        # searchers: the default must be in-order again (per-call attribute)
        cluster.search("db", "p", self._q('"brown quick"~2', False))
        res = cluster.search("db", "p", {"keyword": '"brown quick"~2',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [1, 2]

    def test_actor_mode_roundtrip(self, ray_session, tmp_path_factory):
        # the flag must survive the query-dict round-trip into serving actors
        loc = str(tmp_path_factory.mktemp("uoslop_actors"))
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "u", SCHEMA, loc))
        c.build_from_local("db", "u",
                           [{"_id": i, "content": t} for i, t in DOCS],
                           key_field="_id", num_doc_parts=2, num_term_parts=2)
        direct = c.search("db", "u", self._q('"brown quick"~2', False),
                          precision="float64")[0]
        c.activate("db", "u")
        actor = c.search("db", "u", self._q('"brown quick"~2', False),
                         precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in actor] == \
               [(r["_id"], r["_score"]) for r in direct]
        assert sorted(r["_id"] for r in actor) == [0, 1, 2, 5]


class TestWildcard:
    """Wildcard clauses (extension; Lucene WildcardQuery semantics): ? = one
    char, * = any sequence; constant score 1.0 per matching doc; a single
    trailing * stays a prefix clause."""

    def test_parse_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("qu?ck s*t tail* -f*x +?at")
        assert p.wildcards == ["qu?ck", "s*t"]
        assert p.prefixes == ["tail"]           # single trailing * = prefix
        assert p.not_wildcards == ["f*x"] and p.must_wildcards == ["?at"]
        # escaped wildcards are literal: pattern keeps the backslash so the
        # expansion can tell literal * / ? apart; a fully-escaped token is a
        # plain term
        p2 = parse_keyword(r"te\*t? qu\?ck")
        assert p2.wildcards == [r"te\*t?"] and p2.should == ["qu?ck"]
        p3 = parse_keyword("(f*x | dog)")
        assert p3.wildcards == ["f*x"] and p3.should == ["dog"]

    def test_matches_constant_score(self, cluster):
        res = cluster.search("db", "p", {"keyword": "qu?ck",
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        assert all(r["_score"] == 1.0 for r in res)

    def test_leading_and_infix(self, cluster):
        res = cluster.search("db", "p", {"keyword": "*own",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5]
        res = cluster.search("db", "p", {"keyword": "f*x",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1]
        res = cluster.search("db", "p", {"keyword": "?at",
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [2]    # cat; 3-char tokens only

    def test_must_not_and_mixed(self, cluster):
        res = cluster.search("db", "p", {"keyword": "quick -f*x",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [2, 3, 5, 6]
        res = cluster.search("db", "p", {"keyword": "+?at quick",
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [2]
        # BM25 term + constant 1.0, like the prefix-mixed test
        mixed = {r["_id"]: r["_score"] for r in cluster.search(
            "db", "p", {"keyword": "unrelated qu?ck", "fields": ["content"],
                        "limit": 10}, precision="float64")[0]}
        assert mixed[0] == 1.0 and set(mixed) == {0, 1, 2, 3, 4, 5, 6}

    def test_group_and_parity(self, cluster):
        res = cluster.search("db", "p", {"keyword": "(f*x | dog)",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2]
        for kw in ("qu?ck", "*own unrelated", '+f*x "quick brown"',
                   "unrelated ?at"):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]

    def test_no_match_and_escape(self, cluster):
        res = cluster.search("db", "p", {"keyword": "zz?z*",
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []
        # escaped ? is a literal char: no token "qu?ck" exists in the corpus
        res = cluster.search("db", "p", {"keyword": r"qu\?ck",
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []


class TestRegexp:
    """Regexp clauses /re/ (extension; Lucene RegexpQuery semantics): RE2
    pattern fully anchored (^…$) against dictionary terms; constant score
    1.0 per doc containing ≥1 matching term; | ( ) and spaces are literal
    regex syntax between the delimiters."""

    def test_parse_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("/qu.ck/ -/f.x/ +/c.t/ sort")
        assert p.regexps == ["qu.ck"]
        assert p.not_regexps == ["f.x"] and p.must_regexps == ["c.t"]
        assert p.should == ["sort"]
        # | ( ) and spaces are regex syntax inside the delimiters
        p2 = parse_keyword("/b(r|l)own/ /a b/")
        assert p2.regexps == ["b(r|l)own", "a b"]
        # group member; a term containing a slash stays a plain term
        p3 = parse_keyword("(/f.x/ | dog) path/term /usr")
        assert p3.regexps == ["f.x"]
        assert sorted(p3.should) == ["/usr", "dog", "path/term"]
        # escaped slash inside the pattern is a literal RE2 slash escape
        p4 = parse_keyword(r"/a\/b/")
        assert p4.regexps == [r"a\/b"]

    def test_matches_constant_score(self, cluster):
        res = cluster.search("db", "p", {"keyword": "/qu.ck/",
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        assert all(r["_score"] == 1.0 for r in res)

    def test_full_anchor_semantics(self, cluster):
        # Lucene RegexpQuery fully anchors the pattern: /ow/ matches no
        # 5-char token; /.*ow.*/ matches every doc containing 'brown'
        res = cluster.search("db", "p", {"keyword": "/ow/",
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []
        res = cluster.search("db", "p", {"keyword": "/.*ow.*/",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5]

    def test_alternation_and_literal_prefix_bound(self, cluster):
        res = cluster.search("db", "p", {"keyword": "/(fox|dog)/",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2]
        # literal prefix "qui" bounds the dictionary scan; same result
        res = cluster.search("db", "p", {"keyword": "/qui.*/",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        # a quantified first char must NOT be treated as a literal prefix
        res = cluster.search("db", "p", {"keyword": "/j?umps/",
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [0]

    def test_top_level_alternation_scans_all_branches(self, cluster):
        # REGRESSION (round-4 review): /brown|quick/ must not bound the
        # dictionary scan to the 'brown' literal prefix — the second branch
        # has a different first letter
        res = cluster.search("db", "p", {"keyword": "/brown|quick/",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        # grouped alternation with a shared literal prefix still bounds
        res = cluster.search("db", "p", {"keyword": "/qu(ick|een)/",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5, 6]
        # escaped | is literal (no token matches) — prefix rule unaffected
        res = cluster.search("db", "p", {"keyword": r"/brown\|quick/",
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []

    def test_regexp_inside_group_with_parens(self, cluster):
        # REGRESSION (round-4 review): parens/brackets INSIDE /re/ within a
        # ( ) group are literal regex syntax, not group delimiters
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("(/[)]/ | dog)")
        assert p.regexps == ["[)]"] and p.should == ["dog"]
        p = parse_keyword("(/[(]/ | dog)")
        assert p.regexps == ["[(]"] and p.should == ["dog"]
        res = cluster.search("db", "p", {"keyword": "(/f(o|u)x/ | dog)",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2]

    def test_must_not_and_group(self, cluster):
        res = cluster.search("db", "p", {"keyword": "quick -/f.x/",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [2, 3, 5, 6]
        res = cluster.search("db", "p", {"keyword": "+/c.t/ quick",
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [2]
        res = cluster.search("db", "p", {"keyword": "(/f.x/ | dog)",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2]
        res = cluster.search("db", "p", {"keyword": "+(/f.x/ | dog) quick",
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2]

    def test_taat_bmw_parity(self, cluster):
        for kw in ("/qu.ck/", "/.*ow.*/ unrelated", '+/f.x/ "quick brown"',
                   "unrelated /c.t/"):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64", algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64", algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]

    def test_no_match_and_space_literal(self, cluster):
        res = cluster.search("db", "p", {"keyword": "/zz+/",
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []
        # a space inside /…/ is literal: no single token contains one
        res = cluster.search("db", "p", {"keyword": "/quick brown/",
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []

    def test_mixed_scoring_order(self, cluster):
        # BM25 term + constant 1.0 (regexp added after scored terms)
        mixed = {r["_id"]: r["_score"] for r in cluster.search(
            "db", "p", {"keyword": "unrelated /qu.ck/",
                        "fields": ["content"], "limit": 10},
            precision="float64")[0]}
        assert mixed[0] == 1.0 and set(mixed) == {0, 1, 2, 3, 4, 5, 6}


@pytest.fixture(scope="module")
def fb_cluster(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("fboost"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings(
        "db", "fb",
        "st(field(_id,long),field(title,string,analyze),"
        "field(body,string,analyze))", loc))
    docs = [
        {"_id": 0, "title": "merge sort", "body": "fast stable algorithm"},
        {"_id": 1, "title": "hash join", "body": "merge phase inside"},
        {"_id": 2, "title": "scan", "body": "merge merge merge"},
    ]
    c.build_from_local("db", "fb", docs, key_field="_id",
                       num_doc_parts=1, num_term_parts=1)
    return c


class TestFieldBoost:
    """Per-field query-time boosts (extension; classic Lucene multi-field
    'field^B'): ×B on every clause scored against that field — linear in the
    BM25 weight, the constant for constant-score clauses; gating unchanged."""

    def _s(self, c, fields, kw="merge"):
        return {r["_id"]: r["_score"] for r in c.search(
            "db", "fb", {"keyword": kw, "fields": fields, "limit": 10},
            precision="float64")[0]}

    def test_boost_is_linear_and_scoped(self, fb_cluster):
        plain = self._s(fb_cluster, ["title", "body"])
        b1 = self._s(fb_cluster, ["title^1", "body"])
        b2 = self._s(fb_cluster, ["title^2", "body"])
        assert plain == b1                       # ^1 is a no-op, bit-exact
        assert b2[2] == plain[2]                 # body-only doc unchanged
        # doc 0 has merge only in title → exactly doubles
        assert b2[0] == pytest.approx(2 * plain[0], abs=1e-12)

    def test_constant_clauses_and_phrases(self, fb_cluster):
        got = self._s(fb_cluster, ["title^3", "body"], "mer*")
        assert got[0] == 3.0 and got[1] == 1.0   # title const ×3, body 1.0
        p = self._s(fb_cluster, ["title", "body"], '"merge sort"')
        b = self._s(fb_cluster, ["title^2", "body"], '"merge sort"')
        assert b[0] == pytest.approx(2 * p[0], abs=1e-12)

    def test_parity_and_gating(self, fb_cluster):
        q = {"keyword": "+merge sort", "fields": ["title^2", "body"],
             "limit": 10}
        a = fb_cluster.search("db", "fb", q, precision="float64",
                              algorithm="bmw")[0]
        b = fb_cluster.search("db", "fb", q, precision="float64",
                              algorithm="taat")[0]
        assert [(r["_id"], r["_score"]) for r in a] == \
               [(r["_id"], r["_score"]) for r in b]
        # gating uses the field, not the boost: same match set as unboosted
        q0 = dict(q, fields=["title", "body"])
        assert {r["_id"] for r in fb_cluster.search("db", "fb", q0)[0]} == \
               {r["_id"] for r in a}


class TestBM25F:
    """combined_fields (extension; Lucene sandbox CombinedFieldQuery):
    pseudo-field BM25 — tf = Σ w_f·tf_f, dl = Σ w_f·quantized_len_f,
    avgdl = Σ w_f·sumTTF_f / docCount, df = max over fields."""

    def _oracle(self, docs, terms, weights, limit=10):
        from byzer_retrieval_ray.functions.smallfloat import quantize_length_np
        K1, B = 1.2, 0.75
        names = sorted(weights)
        n = len(docs)
        sum_ttf = sum(weights[f] * sum(len(d[f].split()) for d in docs)
                      for f in names)
        avgdl = sum_ttf / n
        ql = lambda x: float(quantize_length_np(np.array([x]))[0])
        out: dict = {}
        for t in terms:
            df = max(sum(1 for d in docs if t in d[f].split()) for f in names)
            if df == 0:
                continue
            w = 2.2 * np.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, d in enumerate(docs):
                tf = sum(weights[f] * d[f].split().count(t) for f in names)
                if tf == 0:
                    continue
                dl = sum(weights[f] * ql(len(d[f].split())) for f in names)
                inv = 1.0 / (K1 * (1 - B + B * dl / avgdl))
                out[i] = out.get(i, 0.0) + (w - w / (1 + tf * inv))
        return sorted(out.items(), key=lambda x: (-x[1], x[0]))[:limit]

    DOCS_F = [
        {"_id": 0, "title": "merge sort", "body": "fast stable algorithm"},
        {"_id": 1, "title": "hash join", "body": "merge phase inside"},
        {"_id": 2, "title": "scan", "body": "merge merge merge"},
    ]

    def test_matches_bm25f_oracle(self, fb_cluster):
        res = fb_cluster.search("db", "fb", {
            "keyword": "merge sort",
            "combined_fields": ["title^2", "body"], "limit": 10},
            precision="float64")[0]
        got = [(r["_id"], r["_score"]) for r in res]
        want = self._oracle(self.DOCS_F, ["merge", "sort"],
                            {"title": 2.0, "body": 1.0})
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-12)

    def test_equal_weights_and_ops(self, fb_cluster):
        res = fb_cluster.search("db", "fb", {
            "keyword": "+merge -hash sort",
            "combined_fields": ["title", "body"], "limit": 10},
            precision="float64")[0]
        ids = [r["_id"] for r in res]
        assert 1 not in ids and set(ids) == {0, 2}
        want = dict(self._oracle(self.DOCS_F, ["merge", "sort"],
                                 {"title": 1.0, "body": 1.0}))
        for r in res:
            assert r["_score"] == pytest.approx(want[r["_id"]], abs=1e-12)

    def test_unsupported_clauses_raise(self, fb_cluster):
        for kw in ('"merge sort"', "mer*", "merge~1", "/m.rge/",
                   "x (y +z)"):
            with pytest.raises((ValueError, Exception)):
                fb_cluster.search("db", "fb", {
                    "keyword": kw,
                    "combined_fields": ["title", "body"], "limit": 5})

    def test_match_all_falls_through(self, fb_cluster):
        res = fb_cluster.search("db", "fb", {
            "keyword": "*", "combined_fields": ["title", "body"],
            "limit": 10})[0]
        assert len(res) == 3 and all(r["_score"] == 1.0 for r in res)

    def test_explain_bm25f_bitexact(self, fb_cluster):
        q = {"keyword": "+merge sort", "combined_fields": ["title^2", "body"],
             "limit": 10}
        for precision in ("float32", "float64"):
            res = fb_cluster.search("db", "fb", q, precision=precision)[0]
            assert res
            for r in res:
                ex = fb_cluster.explain("db", "fb", q, r["_id"],
                                        precision=precision)
                assert ex["matched"] and ex["score"] == r["_score"]
                assert all(c["kind"] == "bm25f" for c in ex["clauses"])
        # doc 1 fails +merge? no — doc 1 has merge in body; check a gated doc
        ex = fb_cluster.explain("db", "fb",
                                {"keyword": "+sort merge",
                                 "combined_fields": ["title", "body"],
                                 "limit": 10}, 1)
        assert not ex["matched"] and not ex["in_candidates"]  # no 'sort'

    def test_msm_and_synonyms_rejected(self, fb_cluster):
        for extra in ({"min_should_match": 2}, {"synonyms": {"merge": ["x"]}}):
            with pytest.raises(Exception):
                fb_cluster.search("db", "fb", dict(
                    {"keyword": "merge sort",
                     "combined_fields": ["title", "body"], "limit": 5},
                    **extra))

    def test_zero_fill_filter_matches(self, fb_cluster):
        # REGRESSION (round-4 review): SHOULD + FILTER BooleanQuery
        # semantics — a filtered combined query admits zero-score filter
        # matches, exactly like the standard keyword path
        q = {"keyword": "zzznotindexed",
             "combined_fields": ["title", "body"],
             "filters": {"and": [{"field": "_id", "min": 0, "max": 1}]},
             "limit": 10}
        res = fb_cluster.search("db", "fb", q, precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [0, 1]
        assert all(r["_score"] == 0.0 for r in res)


class TestNestedGroups:
    """The two shapes flat boolean algebra can't express, now evaluated as
    nested nodes: `foo (bar +baz)` (inner requirement scopes to the group;
    members score only inside the group match set) and `-(+a +b)` (excluded
    conjunction)."""

    # DOCS: 0 quick brown fox jumps / 1 brown quick fox /
    # 2 the quick brown dog and quick brown cat / 3 quick stop then brown /
    # 4 totally unrelated words here / 5 prefix quick brown / 6 quick³

    def _s(self, cluster, kw, **kw2):
        return cluster.search("db", "p", {"keyword": kw,
                                          "fields": ["content"],
                                          "limit": 10},
                              precision="float64", **kw2)[0]

    def test_parse_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("foo (bar +baz)")
        assert p.should == ["foo"] and len(p.should_groups) == 1
        g = p.should_groups[0]
        assert g.should == ["bar"] and g.must == ["baz"]
        p = parse_keyword("-(+a +b) x")
        assert p.should == ["x"] and len(p.not_groups) == 1
        assert p.not_groups[0].must == ["a", "b"]
        p = parse_keyword("-(a -b)")
        assert p.not_groups[0].should == ["a"]
        assert p.not_groups[0].must_not == ["b"]
        # De Morgan over a nested member: -(y (b +c)) → -y, not_group(b +c)
        p = parse_keyword("-(y (b +c))")
        assert p.must_not == ["y"] and p.not_groups[0].must == ["c"]

    def test_scoped_must_matching(self, cluster):
        # (brown +fox): matches ONLY docs containing fox (0, 1); brown
        # scores inside that set; docs 2/3/5 have brown but no fox
        res = self._s(cluster, "jumps (brown +fox)")
        assert [r["_id"] for r in res][0] == 0
        assert sorted(r["_id"] for r in res) == [0, 1]
        # group-only query via a sibling that matches nothing
        res = self._s(cluster, "zzz (brown +fox)")
        assert sorted(r["_id"] for r in res) == [0, 1]

    def test_scoped_must_scoring(self, cluster):
        # doc 1's score = brown + fox (both members score, masked to the
        # group match set) — equals the flat query's score on that doc
        flat = {r["_id"]: r["_score"] for r in self._s(cluster, "brown fox")}
        res = {r["_id"]: r["_score"] for r in self._s(cluster,
                                                      "zzz (brown +fox)")}
        assert res[1] == pytest.approx(flat[1], abs=1e-12)
        assert res[0] == pytest.approx(flat[0], abs=1e-12)

    def test_excluded_conjunction(self, cluster):
        res = self._s(cluster, "quick -(+brown +fox)")
        assert sorted(r["_id"] for r in res) == [2, 3, 5, 6]
        res = self._s(cluster, "quick -(brown -fox)")
        # exclude docs with brown AND NOT fox → 2, 3, 5 out
        assert sorted(r["_id"] for r in res) == [0, 1, 6]

    def test_required_nested_group(self, cluster):
        res = self._s(cluster, "+((brown +fox)) quick")
        assert sorted(r["_id"] for r in res) == [0, 1]

    def test_group_with_phrase_and_prefix_members(self, cluster):
        # phrase member gates, prefix member scores constant inside the set
        res = self._s(cluster, 'zzz (jum* +"quick brown")')
        assert sorted(r["_id"] for r in res) == [0, 2, 5]
        byid = {r["_id"]: r["_score"] for r in res}
        # doc 0 has jumps → phrase-gated docs with a jum* token add 1.0
        assert byid[0] > byid[5]

    def test_taat_bmw_parity_and_msm(self, cluster):
        for kw in ("jumps (brown +fox)", "quick -(+brown +fox)",
                   'zzz (jum* +"quick brown")', "+((brown +fox)) quick"):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64",
                               algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64",
                               algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b], kw
        # a should_group counts as ONE msm clause
        res = cluster.search("db", "p", {"keyword": "jumps (brown +fox)",
                                         "fields": ["content"], "limit": 10,
                                         "min_should_match": 2},
                             precision="float64")[0]
        assert [r["_id"] for r in res] == [0]   # jumps AND group only in 0

    def test_explain_covers_groups(self, cluster):
        q = {"keyword": "jumps (brown +fox)", "fields": ["content"],
             "limit": 10}
        res = cluster.search("db", "p", q, precision="float64")[0]
        for r in res:
            ex = cluster.explain("db", "p", q, r["_id"], precision="float64")
            assert ex["score"] == r["_score"]


class TestExplain:
    """explain() (extension; Lucene IndexSearcher.explain shape): per-clause
    breakdown built from the same scorers the search uses — the explained
    total equals the doc's search score bit-for-bit in both precisions."""

    QUERIES = [
        'quick brown',
        '"quick brown" fox',
        '+quick -unrelated brow*',
        'qu?ck /f.x/ "quick br*"',
        '"quick brown"~1 jumps^2',
    ]

    @pytest.mark.parametrize("precision", ["float32", "float64"])
    def test_total_matches_search_bitexact(self, cluster, precision):
        for kw in self.QUERIES:
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            res = cluster.search("db", "p", q, precision=precision)[0]
            assert res, kw
            for r in res:
                ex = cluster.explain("db", "p", q, r["_id"],
                                     precision=precision)
                assert ex["matched"], (kw, r)
                assert ex["score"] == r["_score"], (kw, r, ex)
                # clause scores re-sum to the total (f64 accumulation)
                assert ex["clauses"]

    def test_gating_reported(self, cluster):
        q = {"keyword": "quick -jumps", "fields": ["content"], "limit": 10}
        ex = cluster.explain("db", "p", q, 0)   # doc 0 contains jumps
        assert not ex["matched"] and ex["excluded"] and ex["score"] == 0.0
        # clauses still listed so the exclusion is debuggable
        assert any(c["clause"] == "quick" for c in ex["clauses"])
        q = {"keyword": "+brown quick", "fields": ["content"], "limit": 10}
        ex = cluster.explain("db", "p", q, 6)   # doc 6 has quick, no brown
        assert not ex["matched"] and not ex["in_candidates"]

    def test_bm25_clause_detail(self, cluster):
        q = {"keyword": "quick", "fields": ["content"], "limit": 10}
        ex = cluster.explain("db", "p", q, 6, precision="float64")
        cl = ex["clauses"][0]
        assert cl["kind"] == "bm25" and cl["tf"] == 3   # quick quick quick
        assert cl["weight"] > 0 and 0 < cl["score"] <= cl["weight"]

    def test_unknown_doc_and_match_all(self, cluster):
        q = {"keyword": "quick", "fields": ["content"], "limit": 10}
        assert not cluster.explain("db", "p", q, 10 ** 9)["matched"]
        q = {"keyword": "*", "fields": ["content"], "limit": 10}
        ex = cluster.explain("db", "p", q, 3)
        assert ex["matched"] and ex["score"] == 1.0

    def test_synonym_and_msm_visible(self, cluster):
        q = {"keyword": "brown", "fields": ["content"], "limit": 10,
             "synonyms": {"brown": ["quick"]}}
        res = cluster.search("db", "p", q, precision="float64")[0]
        byid = {r["_id"]: r["_score"] for r in res}
        ex = cluster.explain("db", "p", q, 6, precision="float64")
        assert ex["matched"] and ex["score"] == byid[6]
        assert ex["clauses"][0]["tf"] == 3   # merged synonym tf
        q2 = {"keyword": "quick jumps", "fields": ["content"], "limit": 10,
              "min_should_match": 2}
        ex2 = cluster.explain("db", "p", q2, 1)   # quick only → msm fails
        assert not ex2["matched"] and not ex2["in_candidates"]


class TestSynonyms:
    """Query-time synonyms (extension; Lucene SynonymQuery): a term clause
    with a {term: [alts]} entry scores as ONE pseudo-term — tf = Σ variant
    freqs per doc, df = max variant df, norm = the doc's field norm."""

    def _syn_oracle(self, variants: list[str], limit: int = 10):
        toks = {i: t.split() for i, t in DOCS}
        n = len(DOCS)
        dls = {i: len(tt) for i, tt in toks.items()}
        avgdl = bm25.avg_field_length(sum(dls.values()), n, dtype=np.float64)
        cache = bm25.norm_inverse_cache(avgdl, dtype=np.float64)
        df = max(sum(1 for tt in toks.values() if v in tt) for v in variants)
        w = bm25.term_weight(n, df, dtype=np.float64)
        out = []
        for i, tt in toks.items():
            tf = sum(tt.count(v) for v in variants)
            if tf:
                nb = int(int_to_byte4_np(np.array([dls[i]]))[0])
                s = float(bm25.score_tf_norm(
                    np.array([tf]), np.array([nb], np.uint8), cache,
                    np.float64(w), dtype=np.float64)[0])
                out.append((i, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:limit]

    def test_scores_match_synonym_oracle(self, cluster):
        res = cluster.search("db", "p", {"keyword": "brown",
                                         "fields": ["content"], "limit": 10,
                                         "synonyms": {"brown": ["quick"]}},
                             precision="float64")[0]
        got = [(r["_id"], r["_score"]) for r in res]
        want = self._syn_oracle(["brown", "quick"])
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-12)

    def test_alt_only_docs_match(self, cluster):
        # doc 6 "quick quick quick" contains no 'brown' but matches via the
        # synonym with tf=3
        res = cluster.search("db", "p", {"keyword": "brown",
                                         "fields": ["content"], "limit": 10,
                                         "synonyms": {"brown": ["quick"]}})[0]
        assert 6 in {r["_id"] for r in res}

    def test_must_and_msm_see_the_group(self, cluster):
        # +brown with synonym quick: doc 6 (quick-only) satisfies the MUST
        res = cluster.search("db", "p", {"keyword": "+brown fox",
                                         "fields": ["content"], "limit": 10,
                                         "synonyms": {"brown": ["quick"]}})[0]
        assert 6 in {r["_id"] for r in res}
        # msm counts the group as ONE clause
        res = cluster.search("db", "p", {"keyword": "brown jumps",
                                         "fields": ["content"], "limit": 10,
                                         "min_should_match": 2,
                                         "synonyms": {"brown": ["quick"]}})[0]
        assert [r["_id"] for r in res] == [0]

    def test_phrases_unaffected_by_synonym_on_their_terms(self, cluster):
        # REGRESSION (round-4 review): the synonym merge must not clobber
        # the positional posting a phrase clause reads for the same term —
        # a merged posting has no positions (crash) and a single-variant
        # merge would alias the alt's positions under the query term
        # (silent false phrase matches).
        base = cluster.search("db", "p", {"keyword": '"brown fox"',
                                          "fields": ["content"],
                                          "limit": 10},
                              precision="float64")[0]
        withsyn = cluster.search("db", "p", {"keyword": '"brown fox"',
                                             "fields": ["content"],
                                             "limit": 10,
                                             "synonyms": {"brown": ["quick"]}},
                                 precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in base] == \
               [(r["_id"], r["_score"]) for r in withsyn]
        # single-variant aliasing: "zebra fox" with zebra→brown must NOT
        # match docs containing "brown fox"
        res = cluster.search("db", "p", {"keyword": '"zebra fox"',
                                         "fields": ["content"], "limit": 10,
                                         "synonyms": {"zebra": ["brown"]}})[0]
        assert res == []
        # ...but the TERM query 'zebra' with the same synonym does match
        res = cluster.search("db", "p", {"keyword": "zebra",
                                         "fields": ["content"], "limit": 10,
                                         "synonyms": {"zebra": ["brown"]}})[0]
        assert sorted(r["_id"] for r in res) == [0, 1, 2, 3, 5]

    def test_duplicate_alternatives_dedupe(self, cluster):
        a = cluster.search("db", "p", {"keyword": "brown",
                                       "fields": ["content"], "limit": 10,
                                       "synonyms": {"brown": ["quick"]}},
                           precision="float64")[0]
        b = cluster.search("db", "p", {"keyword": "brown",
                                       "fields": ["content"], "limit": 10,
                                       "synonyms": {"brown": ["quick",
                                                              "quick"]}},
                           precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in a] == \
               [(r["_id"], r["_score"]) for r in b]

    def test_taat_bmw_parity_and_noop(self, cluster):
        q = {"keyword": "brown fox", "fields": ["content"], "limit": 10,
             "synonyms": {"brown": ["quick"]}}
        a = cluster.search("db", "p", q, precision="float64", algorithm="bmw")[0]
        b = cluster.search("db", "p", q, precision="float64", algorithm="taat")[0]
        assert [(r["_id"], r["_score"]) for r in a] == \
               [(r["_id"], r["_score"]) for r in b]
        # a synonym for a term not in the query is a no-op
        q0 = {"keyword": "fox", "fields": ["content"], "limit": 10}
        q1 = dict(q0, synonyms={"brown": ["quick"]})
        assert [(r["_id"], r["_score"]) for r in
                cluster.search("db", "p", q0, precision="float64")[0]] == \
               [(r["_id"], r["_score"]) for r in
                cluster.search("db", "p", q1, precision="float64")[0]]


class TestMinShouldMatch:
    """min_should_match (Lucene BooleanQuery.setMinimumNumberShouldMatch,
    extension): a hit must satisfy ≥ m SHOULD clauses; scoring unchanged."""

    def _s(self, cluster, kw, msm, **kw2):
        return [(r["_id"], r["_score"]) for r in cluster.search(
            "db", "p", {"keyword": kw, "fields": ["content"], "limit": 10,
                        "min_should_match": msm}, precision="float64",
            **kw2)[0]]

    def test_term_counting(self, cluster):
        # DOCS: 0 quick brown fox jumps / 1 brown quick fox / 2 ... quick
        # brown cat / 3 quick stop then brown / 6 quick quick quick
        base = self._s(cluster, "quick fox jumps", 0)
        two = self._s(cluster, "quick fox jumps", 2)
        assert sorted(i for i, _ in two) == [0, 1]
        # msm keeps the full OR score of the surviving docs
        keep = dict(base)
        assert all(s == keep[i] for i, s in two)
        assert [i for i, _ in self._s(cluster, "quick fox jumps", 3)] == [0]
        assert self._s(cluster, "quick fox jumps", 4) == []   # > #clauses

    def test_clause_types_count_once_each(self, cluster):
        # term + phrase: doc must match ≥2 of {quick, "brown fox"}
        got = self._s(cluster, 'quick "brown fox"', 2)
        assert [i for i, _ in got] == [0]
        # term + prefix + wildcard are each one clause
        got = self._s(cluster, "jumps stop? unre*", 2)
        assert got == []    # no doc matches two of the three
        got = self._s(cluster, "quick brow* f?x", 2)
        assert sorted(i for i, _ in got) == [0, 1, 2, 3, 5]

    def test_must_unaffected(self, cluster):
        # MUST clauses don't count toward (or against) the should threshold
        got = self._s(cluster, "+brown quick fox", 2)
        assert sorted(i for i, _ in got) == [0, 1]
        # 0/1 are no-ops for a PURE-OR query (matching already needs one)
        a = self._s(cluster, "quick fox", 0)
        b = self._s(cluster, "quick fox", 1)
        assert a == b

    def test_msm1_with_must_is_load_bearing(self, cluster):
        # REGRESSION (round-4 review): Lucene's minShouldMatch=1 with a MUST
        # present requires ≥1 SHOULD hit — SHOULDs are otherwise optional.
        # '+brown jumps': without msm every brown doc matches; with msm=1
        # only docs also containing 'jumps' survive (doc 0)
        no_msm = self._s(cluster, "+brown jumps", 0)
        assert sorted(i for i, _ in no_msm) == [0, 1, 2, 3, 5]
        with_msm = self._s(cluster, "+brown jumps", 1)
        assert [i for i, _ in with_msm] == [0]

    def test_actor_json_roundtrip(self, cluster):
        from byzer_retrieval_ray.table.query import SearchQuery
        q = SearchQuery.from_dict({"database": "db", "table": "p",
                                   "keyword": "quick fox jumps",
                                   "fields": ["content"], "limit": 10,
                                   "min_should_match": 2})
        assert q.min_should_match == 2
        q2 = SearchQuery.list_from_json(q.to_json())[0]
        assert q2.min_should_match == 2


class TestPhrasePrefix:
    """"a b*" phrase-prefix (MultiPhraseQuery/autocomplete shape): leading
    terms followed by ANY dictionary term starting with the prefix; one
    union position slot; constant score 1.0."""

    def test_parse_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword('"merge so*" +"quick br*" -"bad pre*"')
        assert p.pphrases == [(("merge",), "so")]
        assert p.must_pphrases == [(("quick",), "br")]
        assert p.not_pphrases == [(("bad",), "pre")]
        # single-token quoted prefix degrades to a plain prefix clause
        p2 = parse_keyword('"so*"')
        assert p2.prefixes == ["so"] and not p2.pphrases
        # a sloppy phrase with a trailing * stays a sloppy phrase (the *
        # is part of the term under whitespace analysis)
        p3 = parse_keyword('"a b*"~2')
        assert p3.slop_phrases and not p3.pphrases

    def test_adjacency_and_union_slot(self, cluster):
        # corpus: doc0 'quick brown fox jumps', doc3 'quick stop then brown',
        # doc5 'prefix quick brown', doc6 'quick quick quick'
        res = cluster.search("db", "p", {"keyword": '"quick bro*"',
                                         "fields": ["content"], "limit": 10},
                             precision="float64")[0]
        assert sorted(r["_id"] for r in res) == [0, 2, 5]
        assert all(r["_score"] == 1.0 for r in res)
        # union slot: quick followed by b* OR st* OR qu*
        res = cluster.search("db", "p", {"keyword": '"quick st*"',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [3]
        res = cluster.search("db", "p", {"keyword": '"quick qu*"',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [6]

    def test_three_term_leading_chain(self, cluster):
        res = cluster.search("db", "p", {"keyword": '"quick brown fo*"',
                                         "fields": ["content"], "limit": 10})[0]
        assert [r["_id"] for r in res] == [0]

    def test_must_not_and_parity(self, cluster):
        res = cluster.search("db", "p", {"keyword": '+"quick bro*" fox',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [0, 2, 5]
        res = cluster.search("db", "p", {"keyword": 'quick -"quick bro*"',
                                         "fields": ["content"], "limit": 10})[0]
        assert sorted(r["_id"] for r in res) == [1, 3, 6]
        for kw in ('"quick bro*"', '"quick bro*" unrelated',
                   '+"quick bro*" "quick brown"'):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64",
                               algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64",
                               algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]

    def test_no_expansion_no_match(self, cluster):
        res = cluster.search("db", "p", {"keyword": '"quick zz*"',
                                         "fields": ["content"], "limit": 10})[0]
        assert res == []


class TestBoost:
    """term^B boosts (classic QueryParser boost, extension): clause weight
    × B, additive across occurrences, exactly like B copies of the term."""

    def test_parse_shapes(self):
        from byzer_retrieval_ray.functions.queryparser import parse_keyword
        p = parse_keyword("merge^2 sort +fox^1.5 -dog^3")
        assert p.should == ["merge", "sort"] and p.must == ["fox"]
        assert p.must_not == ["dog"]            # boost on prohibited ignored
        assert p.boosts == {"merge": 1.0, "fox": 0.5}
        # additive across occurrences; ^1 is a no-op; \^ is a literal caret
        p2 = parse_keyword(r"a^2 a b^1 c\^2")
        assert p2.boosts == {"a": 1.0} and p2.should == ["a", "a", "b", "c^2"]

    def test_boost_equals_duplicate_term(self, cluster):
        q1 = {"keyword": "quick^2 brown", "fields": ["content"], "limit": 10}
        q2 = {"keyword": "quick quick brown", "fields": ["content"],
              "limit": 10}
        a = cluster.search("db", "p", q1, precision="float64")[0]
        b = cluster.search("db", "p", q2, precision="float64")[0]
        assert [(r["_id"], r["_score"]) for r in a] == \
               [(r["_id"], r["_score"]) for r in b]
        # boost actually changes the ranking vs the unboosted query
        c = cluster.search("db", "p", {"keyword": "quick brown",
                                       "fields": ["content"], "limit": 10},
                           precision="float64")[0]
        sa = {r["_id"]: r["_score"] for r in a}
        sc = {r["_id"]: r["_score"] for r in c}
        assert sa[6] > sc[6]                    # doc6 = 'quick quick quick'

    def test_taat_bmw_parity_and_fractional(self, cluster):
        for kw in ("quick^2 brown", "quick^0.5 brown", "+quick^3"):
            q = {"keyword": kw, "fields": ["content"], "limit": 10}
            a = cluster.search("db", "p", q, precision="float64",
                               algorithm="bmw")[0]
            b = cluster.search("db", "p", q, precision="float64",
                               algorithm="taat")[0]
            assert [(r["_id"], r["_score"]) for r in a] == \
                   [(r["_id"], r["_score"]) for r in b]
        # fractional boost shrinks the term's contribution
        half = cluster.search("db", "p", {"keyword": "quick^0.5",
                                          "fields": ["content"], "limit": 10},
                              precision="float64")[0]
        full = cluster.search("db", "p", {"keyword": "quick",
                                          "fields": ["content"], "limit": 10},
                              precision="float64")[0]
        hs = {r["_id"]: r["_score"] for r in half}
        fs = {r["_id"]: r["_score"] for r in full}
        for i in hs:
            assert hs[i] == pytest.approx(fs[i] * 0.5, rel=1e-12)
