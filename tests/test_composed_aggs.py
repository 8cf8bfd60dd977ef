"""Composable bucket-agg × sub-agg pass (round-5): `aggregate` nests any
metric sub-agg (avg/sum/min/max/value_count/stats/extended_stats) and
top_hits under a terms / composite / date_histogram bucket source —
the generalization of the fixed two-phase shapes (terms_stats,
top_hits). Values are pinned against naive Python folds of the corpus;
actor mode must match in-proc exactly."""

import datetime

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
          "field(cat,string),field(n,long),field(ts,date))")
DAY = 86_400_000_000


def _docs(n=60):
    docs = []
    for i in range(n):
        docs.append({"_id": i, "content": "hit",
                     "cat": ["a", "b", "c"][i % 3],
                     "n": None if i == 59 else i,
                     "ts": datetime.datetime(2020, 1, 1 + i % 5)})
    return docs


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("cagg"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "t", SCHEMA, loc))
    c.build_from_local("db", "t", _docs(), key_field="_id",
                       num_doc_parts=3, num_term_parts=2)
    return c


def _q():
    return SearchQuery("db", "t", keyword="hit", fields=["content"], limit=5)


class TestTermsSource:
    def test_metrics_and_order(self, cluster):
        out = cluster.aggregate(
            "db", "t", _q(), {"terms": {"field": "cat", "size": 3}},
            {"a": {"avg": {"field": "n"}}, "s": {"sum": {"field": "n"}},
             "lo": {"min": {"field": "n"}}, "hi": {"max": {"field": "n"}},
             "vc": {"value_count": {"field": "n"}}})
        docs = _docs()
        # (count desc, key asc): all three cats have 20 docs → a, b, c
        assert [b["key"] for b in out["buckets"]] == ["a", "b", "c"]
        for b in out["buckets"]:
            ns = [d["n"] for d in docs
                  if d["cat"] == b["key"] and d["n"] is not None]
            assert b["doc_count"] == 20
            assert b["vc"] == len(ns)
            assert b["s"] == float(sum(ns))
            assert b["lo"] == float(min(ns)) and b["hi"] == float(max(ns))
            assert b["a"] == pytest.approx(np.mean(ns))

    def test_extended_stats_and_null_metric(self, cluster):
        out = cluster.aggregate(
            "db", "t", _q(), {"terms": {"field": "cat", "size": 1}},
            {"st": {"extended_stats": {"field": "n"}}})
        b = out["buckets"][0]
        ns = np.array([d["n"] for d in _docs()
                       if d["cat"] == b["key"] and d["n"] is not None],
                      dtype=np.float64)
        st = b["st"]
        assert st["count"] == ns.size
        assert st["sum_of_squares"] == float(np.sum(ns * ns))
        mean = ns.sum() / ns.size
        assert st["variance"] == pytest.approx(
            max(0.0, float(np.sum(ns * ns)) / ns.size - mean * mean))
        assert st["std_deviation"] == pytest.approx(np.sqrt(st["variance"]))

    def test_top_hits_composes(self, cluster):
        out = cluster.aggregate(
            "db", "t", _q(), {"terms": {"field": "cat", "size": 2}},
            {"top": {"top_hits": {"size": 2}},
             "a": {"avg": {"field": "n"}}})
        for b in out["buckets"]:
            assert len(b["top"]) == 2
            # identical scoring → ties break doc_id asc; cat 'a' docs are
            # 0,3,6..., cat 'b' docs are 1,4,...
            first = {"a": 0, "b": 1, "c": 2}[b["key"]]
            assert b["top"][0]["doc_id"] == first
            assert b["top"][1]["doc_id"] == first + 3


class TestCompositeSource:
    def test_paged_with_metrics(self, cluster):
        p1 = cluster.aggregate(
            "db", "t", _q(), {"composite": {"field": "cat", "size": 2}},
            {"hi": {"max": {"field": "n"}}})
        assert [b["key"] for b in p1["buckets"]] == ["a", "b"]
        assert p1["after_key"] == "b"
        assert p1["buckets"][0]["hi"] == 57.0    # max n ≡ 0 mod 3
        p2 = cluster.aggregate(
            "db", "t", _q(),
            {"composite": {"field": "cat", "size": 2, "after": "b"}},
            {"hi": {"max": {"field": "n"}}})
        assert [b["key"] for b in p2["buckets"]] == ["c"]
        assert p2["after_key"] is None
        assert p2["buckets"][0]["hi"] == 56.0


class TestHistogramSource:
    def test_day_bins_with_stats(self, cluster):
        out = cluster.aggregate(
            "db", "t", _q(),
            {"date_histogram": {"field": "ts", "interval": DAY}},
            {"st": {"stats": {"field": "n"}},
             "vc": {"value_count": {"field": "n"}}})
        docs = _docs()
        assert len(out["buckets"]) == 5
        keys = [b["key"] for b in out["buckets"]]
        assert keys == sorted(keys)
        for b in out["buckets"]:
            day_idx = datetime.datetime.utcfromtimestamp(
                b["key"] / 1e6).day - 1          # 2020-01-(1+i%5)
            ns = [d["n"] for d in docs
                  if d["_id"] % 5 == day_idx and d["n"] is not None]
            assert b["doc_count"] == 12
            assert b["vc"] == len(ns)
            assert b["st"]["sum"] == float(sum(ns))

    def test_top_hits_rejected_for_histogram(self, cluster):
        with pytest.raises(ValueError, match="top_hits"):
            cluster.aggregate(
                "db", "t", _q(),
                {"date_histogram": {"field": "ts", "interval": DAY}},
                {"top": {"top_hits": {"size": 1}}})


class TestValidationAndActors:
    def test_bad_specs(self, cluster):
        with pytest.raises(ValueError, match="exactly one bucketing"):
            cluster.aggregate("db", "t", _q(), {}, {"a": {"avg": {"field": "n"}}})
        with pytest.raises(ValueError, match="unknown bucket source"):
            cluster.aggregate("db", "t", _q(), {"nope": {}},
                              {"a": {"avg": {"field": "n"}}})
        with pytest.raises(ValueError, match="at least one"):
            cluster.aggregate("db", "t", _q(),
                              {"terms": {"field": "cat"}}, {})
        with pytest.raises(ValueError, match="unknown sub-aggregation"):
            cluster.aggregate("db", "t", _q(), {"terms": {"field": "cat"}},
                              {"x": {"median": {"field": "n"}}})

    def test_actor_mode_matches_inproc(self, cluster):
        spec = ({"terms": {"field": "cat", "size": 3}},
                {"a": {"avg": {"field": "n"}},
                 "st": {"extended_stats": {"field": "n"}},
                 "top": {"top_hits": {"size": 2}}})
        inproc = cluster.aggregate("db", "t", _q(), *spec)
        cluster.activate("db", "t")
        try:
            assert cluster.aggregate("db", "t", _q(), *spec) == inproc
            hist = ({"date_histogram": {"field": "ts", "interval": DAY}},
                    {"st": {"stats": {"field": "n"}}})
            cluster.deactivate("db", "t")
            ih = cluster.aggregate("db", "t", _q(), *hist)
            cluster.activate("db", "t")
            assert cluster.aggregate("db", "t", _q(), *hist) == ih
        finally:
            cluster.deactivate("db", "t")


class TestNestedBucketAggs:
    """Round-5: bucket agg under bucket agg, any depth — each outer key
    recurses with an exact-value filter push-down, so every level stays
    exact (no ES shard_size approximation)."""

    def test_terms_terms_metric(self, cluster):
        docs = _docs()
        out = cluster.aggregate(
            "db", "t", _q(),
            {"terms": {"field": "cat", "size": 2}},
            {"days": {"terms": {"field": "cat", "size": 1}},   # trivial self
             "by": {"date_histogram": {"field": "ts", "interval": DAY},
                    "aggs": {"a": {"avg": {"field": "n"}}}}})
        assert [b["key"] for b in out["buckets"]] == ["a", "b"]
        for b in out["buckets"]:
            # trivial self-nesting: one bucket = the outer key itself
            assert b["days"]["buckets"] == [{"key": b["key"],
                                            "doc_count": 20}]
            inner = b["by"]["buckets"]
            assert len(inner) == 5 and sum(
                x["doc_count"] for x in inner) == 20
            for x in inner:
                day_idx = datetime.datetime.utcfromtimestamp(
                    x["key"] / 1e6).day - 1
                ns = [d["n"] for d in docs
                      if d["cat"] == b["key"] and d["_id"] % 5 == day_idx
                      and d["n"] is not None]
                assert x["doc_count"] == 4
                assert x["a"] == pytest.approx(np.mean(ns))

    def test_counts_only_nesting(self, cluster):
        out = cluster.aggregate(
            "db", "t", _q(), {"composite": {"field": "cat", "size": 3}},
            {"hist": {"date_histogram": {"field": "ts",
                                         "interval": DAY}}})
        for b in out["buckets"]:
            assert sum(x["doc_count"] for x in b["hist"]["buckets"]) == \
                b["doc_count"]

    def test_outer_histogram_rejected(self, cluster):
        with pytest.raises(ValueError, match="OUTER"):
            cluster.aggregate(
                "db", "t", _q(),
                {"date_histogram": {"field": "ts", "interval": DAY}},
                {"x": {"terms": {"field": "cat"}}})

    def test_actor_parity(self, cluster):
        spec = ({"terms": {"field": "cat", "size": 2}},
                {"by": {"date_histogram": {"field": "ts", "interval": DAY},
                        "aggs": {"s": {"sum": {"field": "n"}}}}})
        inproc = cluster.aggregate("db", "t", _q(), *spec)
        cluster.activate("db", "t")
        try:
            assert cluster.aggregate("db", "t", _q(), *spec) == inproc
        finally:
            cluster.deactivate("db", "t")

    def test_inner_buckets_are_outer_slices_not_filter_sets(
            self, ray_session, tmp_path):
        # regression: a pure-SHOULD keyword + pushed-down filter follows
        # ES bool{should,filter} msm=0 (filter-only docs at score 0) —
        # without the msm bump the inner buckets would count ALL docs of
        # the outer key, not the keyword matches
        loc = str(tmp_path)
        c = RetrievalCluster(loc)
        c.create_table(TableSettings("db", "nb", SCHEMA, loc))
        docs = []
        for i in range(40):
            docs.append({"_id": i,
                         "content": "match" if i % 2 == 0 else "miss",
                         "cat": ["a", "b"][i % 2 == 0 and i % 4 == 0],
                         "n": i, "ts": datetime.datetime(2020, 1, 1)})
        # cats: i%4==0 → 'b' (matching), else 'a' (mixed match/miss)
        c.build_from_local("db", "nb", docs, key_field="_id",
                           num_doc_parts=2, num_term_parts=2)
        q = SearchQuery("db", "nb", keyword="match", fields=["content"],
                        limit=5)
        out = c.aggregate(
            "db", "nb", q, {"terms": {"field": "cat", "size": 2}},
            {"inner": {"terms": {"field": "cat", "size": 2},
                       "aggs": {"vc": {"value_count": {"field": "n"}}}}})
        for b in out["buckets"]:
            want = sum(1 for d in docs
                       if d["cat"] == b["key"] and d["content"] == "match")
            assert b["doc_count"] == want
            # trivial self-nesting: the inner bucket must be the OUTER
            # bucket (keyword matches with that cat), not every cat doc
            assert b["inner"]["buckets"] == [
                {"key": b["key"], "doc_count": want, "vc": want}]
