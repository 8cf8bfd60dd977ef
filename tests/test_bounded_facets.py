"""Bounded exact facet-family folds (round-5): facet_counts /
significant_terms run the Fagin/TPUT-style threshold algorithm (top-S
partials + candidate probe + provable-exactness check, escalating S until
exact), rare_terms ships locally-rare partials + probe. These tests pin

  (a) value-identity with the naive full-vocabulary fold, and
  (b) the SHIP BOUND: no bucket partial ever exceeds the phase budget —
      the property the round-4 verdict flagged (vocabulary-sized partials
      on high-cardinality fields swamp the driver at 100 TB).
"""

from collections import Counter

import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.index.searcher import BucketSearcher

SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
          "field(cat,string))")


def _build(loc, docs, parts=4):
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "hc", SCHEMA, loc))
    c.build_from_local("db", "hc", docs, key_field="_id",
                       num_doc_parts=parts, num_term_parts=2)
    return c


def _skewed_docs(n=120):
    """3 heavy values + a long tail of singletons; every doc matches."""
    docs = []
    for i in range(n):
        if i < 30:
            cat = "top0"
        elif i < 55:
            cat = "top1"
        elif i < 75:
            cat = "top2"
        else:
            cat = f"tail{i:04d}"
        docs.append({"_id": i, "content": "hit", "cat": cat})
    return docs


def _naive_top(docs, limit):
    cnt = Counter(d["cat"] for d in docs if d["cat"] is not None)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    return [{"value": v, "count": c} for v, c in ranked[:limit]]


class _Spy:
    """Record the row count of every per-bucket partial that 'ships'."""

    def __init__(self, monkeypatch):
        self.tops, self.probes, self.rares = [], [], []
        orig_top = BucketSearcher.facet_top_keyword
        orig_probe = BucketSearcher.facet_probe_keyword
        orig_rare = BucketSearcher.rare_partial_keyword

        def top(s, q, f, shard_size, precision="float32"):
            t = orig_top(s, q, f, shard_size, precision)
            self.tops.append((int(shard_size), len(t)))
            return t

        def probe(s, q, f, values, precision="float32"):
            t = orig_probe(s, q, f, values, precision)
            self.probes.append((len(values), len(t)))
            return t

        def rare(s, q, f, m, precision="float32"):
            t = orig_rare(s, q, f, m, precision)
            self.rares.append(len(t))
            return t

        monkeypatch.setattr(BucketSearcher, "facet_top_keyword", top)
        monkeypatch.setattr(BucketSearcher, "facet_probe_keyword", probe)
        monkeypatch.setattr(BucketSearcher, "rare_partial_keyword", rare)


class TestBoundedFacets:
    def test_skewed_exact_in_one_round(self, ray_session, tmp_path,
                                       monkeypatch):
        docs = _skewed_docs()
        c = _build(str(tmp_path), docs)
        spy = _Spy(monkeypatch)
        q = SearchQuery("db", "hc", keyword="hit", fields=["content"],
                        limit=5)
        out = c.facet_counts("db", "hc", q, "cat", limit=3, shard_size=4)
        assert out == _naive_top(docs, 3)
        # ship bound: every phase-1 partial ≤ 4 rows (4 buckets, 1 round —
        # the zipfian field accepts immediately: 3rd count 20 > T ≤ 4·1)
        assert spy.tops and all(rows <= 4 for s, rows in spy.tops)
        assert all(s == 4 for s, _ in spy.tops)          # no escalation
        # probe partials are candidate-bounded (≤ buckets × S = 16)
        assert all(rows <= ncand <= 16 for ncand, rows in spy.probes)

    def test_uniform_escalates_to_exact(self, ray_session, tmp_path,
                                        monkeypatch):
        # adversarial: 80 all-distinct values — the threshold can never be
        # beaten, so S escalates until no bucket truncates, then the fold
        # is the plain exact one
        docs = [{"_id": i, "content": "hit", "cat": f"u{i:04d}"}
                for i in range(80)]
        c = _build(str(tmp_path), docs)
        spy = _Spy(monkeypatch)
        q = SearchQuery("db", "hc", keyword="hit", fields=["content"],
                        limit=5)
        out = c.facet_counts("db", "hc", q, "cat", limit=4, shard_size=4)
        assert out == _naive_top(docs, 4)
        budgets = sorted({s for s, _ in spy.tops})
        assert budgets[0] == 4 and len(budgets) >= 2     # escalated
        assert all(rows <= s for s, rows in spy.tops)    # bound held per round

    def test_matches_unbounded_default(self, ray_session, tmp_path):
        # default shard_size (≥ 64) covers the whole vocabulary here: the
        # fast path must equal the forced-threshold path and the naive fold
        docs = _skewed_docs()
        c = _build(str(tmp_path), docs)
        q = SearchQuery("db", "hc", keyword="hit", fields=["content"],
                        limit=5)
        fast = c.facet_counts("db", "hc", q, "cat", limit=10)
        forced = c.facet_counts("db", "hc", q, "cat", limit=10, shard_size=2)
        assert fast == forced == _naive_top(docs, 10)

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        docs = _skewed_docs()
        c = _build(str(tmp_path), docs)
        q = SearchQuery("db", "hc", keyword="hit", fields=["content"],
                        limit=5)
        inproc = c.facet_counts("db", "hc", q, "cat", limit=3, shard_size=4)
        c.activate("db", "hc")
        assert c.facet_counts("db", "hc", q, "cat", limit=3,
                              shard_size=4) == inproc


class TestBoundedRareTerms:
    def test_common_values_never_ship(self, ray_session, tmp_path,
                                      monkeypatch):
        docs = _skewed_docs()   # 45 singleton tails + 3 heavy values
        c = _build(str(tmp_path), docs)
        spy = _Spy(monkeypatch)
        q = SearchQuery("db", "hc", keyword="hit", fields=["content"],
                        limit=5)
        out = c.rare_terms("db", "hc", q, "cat", max_doc_count=1, limit=50)
        expected = [{"value": f"tail{i:04d}", "count": 1}
                    for i in range(75, 120)]
        assert out == expected
        # phase-1 partials carry ONLY locally-rare values: 45 singletons
        # over 4 buckets — never the heavy values, never the vocabulary
        assert sum(spy.rares) <= 45 + 3  # heavies CAN be locally rare only
        # if a bucket saw them ≤ max_doc_count times; with 20+ spread over
        # 4 buckets each heavy has ≥ 5 per bucket → never ships
        assert sum(spy.rares) == 45

    def test_locally_rare_globally_common_dropped(self, ray_session,
                                                  tmp_path):
        # value 'edge' appears once in one bucket (locally rare there) but
        # 9 more times elsewhere — the probe must reveal the global count
        # and drop it
        docs = [{"_id": i, "content": "hit",
                 "cat": "edge" if (i == 0 or i >= 50) else f"solo{i:03d}"}
                for i in range(59)]
        c = _build(str(tmp_path), docs)
        q = SearchQuery("db", "hc", keyword="hit", fields=["content"],
                        limit=5)
        out = c.rare_terms("db", "hc", q, "cat", max_doc_count=2, limit=100)
        vals = {o["value"] for o in out}
        assert "edge" not in vals
        assert vals == {f"solo{i:03d}" for i in range(1, 50)}


class TestBoundedSigTerms:
    def _naive(self, docs, match_term, field_docs, limit, fgt_docs):
        n = len(docs)
        fg = Counter()
        bg = Counter()
        for d in docs:
            toks = set(d["content"].split())
            for t in toks:
                bg[t] += 1
            if match_term in toks:
                for t in toks:
                    fg[t] += 1
        fgt = sum(1 for d in docs if match_term in d["content"].split())
        out = []
        for t, f in fg.items():
            a, b = f / fgt, bg[t] / n
            if a <= b:
                continue
            out.append({"term": t, "score": (a - b) * (a / b),
                        "fg_count": f, "bg_count": bg[t]})
        out.sort(key=lambda r: (-r["score"], r["term"]))
        return out[:limit]

    def test_bounded_matches_naive(self, ray_session, tmp_path):
        # 200 docs; matches (containing 'q') skew toward terms sig0..sig4;
        # background noise terms appear everywhere
        docs = []
        for i in range(200):
            toks = [f"noise{i % 7}"]
            if i % 4 == 0:
                toks += ["q", f"sig{i % 5}"]
            docs.append({"_id": i, "content": " ".join(toks), "cat": "x"})
        c = _build(str(tmp_path), docs)
        q = SearchQuery("db", "hc", keyword="q", fields=["content"],
                        limit=5)
        out = c.significant_terms("db", "hc", q, "content", limit=5)
        assert out == pytest.approx(self._naive(docs, "q", None, 5, None))

    def test_actor_mode_matches_inproc(self, ray_session, tmp_path):
        docs = []
        for i in range(200):
            toks = [f"noise{i % 7}"]
            if i % 4 == 0:
                toks += ["q", f"sig{i % 5}"]
            docs.append({"_id": i, "content": " ".join(toks), "cat": "x"})
        c = _build(str(tmp_path), docs)
        q = SearchQuery("db", "hc", keyword="q", fields=["content"],
                        limit=5)
        inproc = c.significant_terms("db", "hc", q, "content", limit=5)
        c.activate("db", "hc")
        assert c.significant_terms("db", "hc", q, "content",
                                   limit=5) == inproc


class TestMultiTerms:
    """Round-5: multi_terms — tuple bucket keys through the same bounded
    threshold fold (composed \\x1f-joined keys)."""

    def _corpus(self, loc):
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "mt", "st(field(_id,long),field(content,string,analyze),"
            "field(a,string),field(b,string))", loc))
        docs = [{"_id": i, "content": "hit",
                 "a": None if i % 11 == 0 else f"a{i % 3}",
                 "b": f"b{i % 4}"} for i in range(120)]
        c.build_from_local("db", "mt", docs, key_field="_id",
                           num_doc_parts=4, num_term_parts=2)
        return c, docs

    def test_matches_naive_and_null_components(self, ray_session, tmp_path):
        c, docs = self._corpus(str(tmp_path))
        q = SearchQuery("db", "mt", keyword="hit", fields=["content"],
                        limit=5)
        cnt = Counter((d["a"], d["b"]) for d in docs if d["a"] is not None)
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
        out = c.multi_terms("db", "mt", q, ["a", "b"], limit=6)
        assert [(tuple(o["key"]), o["count"]) for o in out] == want
        # forced bounded path gives identical results
        assert c.multi_terms("db", "mt", q, ["a", "b"], limit=6,
                             shard_size=2) == out

    def test_actor_parity_and_validation(self, ray_session, tmp_path):
        c, _ = self._corpus(str(tmp_path))
        q = SearchQuery("db", "mt", keyword="hit", fields=["content"],
                        limit=5)
        inproc = c.multi_terms("db", "mt", q, ["a", "b"], limit=4,
                               shard_size=3)
        c.activate("db", "mt")
        try:
            assert c.multi_terms("db", "mt", q, ["a", "b"], limit=4,
                                 shard_size=3) == inproc
        finally:
            c.deactivate("db", "mt")
        with pytest.raises(ValueError, match="at least two"):
            c.multi_terms("db", "mt", q, ["a"])
