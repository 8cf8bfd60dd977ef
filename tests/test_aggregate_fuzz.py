"""Composable-aggregate fuzzer (round-5): random query ASTs (the
test_query_fuzz generator/evaluator) × random (bucket source × metric
sub-agg) compositions through ``RetrievalCluster.aggregate`` — including
nested bucket aggs — checked against pure-python folds of the corpus
restricted to the reference match set. No production aggregation code is
shared with the oracle folds; metric arithmetic is replicated formula-
for-formula (float64 over integer values ⇒ exact equality)."""

import collections
import math

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings
from tests.test_query_fuzz import (VOCAB, _ev_bool, _gen_children,
                                   _render_top, _unwrap_top)

SCHEMA = ("st(field(_id,long),field(body,string,analyze),"
          "field(cat,string),field(n,long),field(t,long))")
CATS = ["a", "b", "c", "d", "e"]
METRICS = ("avg", "sum", "min", "max", "value_count", "stats",
           "extended_stats")


def _corpus(rng, n=48):
    rows = []
    for i in range(n):
        k = int(rng.integers(0, 14))
        rows.append({
            "_id": i,
            "body": " ".join(rng.choice(VOCAB, k)) if k else "",
            "cat": None if rng.random() < 0.12 else str(rng.choice(CATS)),
            "n": None if rng.random() < 0.12 else int(rng.integers(-50, 200)),
            "t": int(rng.integers(-1000, 1000)),
        })
    return rows


@pytest.fixture(scope="module")
def fz_cluster(ray_session, tmp_path_factory):
    rng = np.random.default_rng(515253)
    rows = _corpus(rng)
    loc = str(tmp_path_factory.mktemp("caggfuzz"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "z", SCHEMA, loc))
    c.build_from_local("db", "z", rows, key_field="_id",
                       num_doc_parts=3, num_term_parts=2)
    toks = {r["_id"]: r["body"].split() for r in rows}
    return c, rows, toks


def _metric_value(kind, vals):
    n = len(vals)
    if kind == "value_count":
        return n
    if kind == "sum":
        return float(sum(vals))
    if kind == "min":
        return float(min(vals)) if n else None
    if kind == "max":
        return float(max(vals)) if n else None
    if kind == "avg":
        return (float(sum(vals)) / n) if n else None
    st = {"count": n, "min": float(min(vals)) if n else None,
          "max": float(max(vals)) if n else None, "sum": float(sum(vals)),
          "avg": (float(sum(vals)) / n) if n else None}
    if kind == "extended_stats":
        if n:
            sumsq = float(sum(float(v) * float(v) for v in vals))
            mean = float(sum(vals)) / n
            var = max(0.0, sumsq / n - mean * mean)
            st.update({"sum_of_squares": sumsq, "variance": var,
                       "std_deviation": math.sqrt(var)})
        else:
            st.update({"sum_of_squares": None, "variance": None,
                       "std_deviation": None})
    return st


def _bucket_rows(sub, kind, spec):
    """(key, rows) pairs in the source's bucket order."""
    if kind == "terms":
        cnt = collections.Counter(r["cat"] for r in sub
                                  if r["cat"] is not None)
        keys = [k for k, _ in sorted(cnt.items(),
                                     key=lambda kv: (-kv[1], kv[0]))]
        keys = keys[: spec.get("size", 10)]
        return [(k, [r for r in sub if r["cat"] == k]) for k in keys]
    if kind == "composite":
        keys = sorted({r["cat"] for r in sub if r["cat"] is not None})
        after = spec.get("after")
        if after is not None:
            keys = [k for k in keys if k > after]
        keys = keys[: spec.get("size", 10)]
        return [(k, [r for r in sub if r["cat"] == k]) for k in keys]
    iv = spec["interval"]
    bins = sorted({(r["t"] // iv) * iv for r in sub})
    return [(b, [r for r in sub if (r["t"] // iv) * iv == b])
            for b in bins]


@pytest.mark.parametrize("seed", [11, 47, 101, 389, 941])
def test_random_compositions_match_bruteforce(fz_cluster, seed):
    c, rows, toks = fz_cluster
    by_id = {r["_id"]: r for r in rows}
    rng = np.random.default_rng(seed)
    checked = 0
    for _ in range(8):
        children = _gen_children(rng, 0)
        kw = _render_top(children)
        want = {i for i, tt in toks.items()
                if _ev_bool(_unwrap_top(children), tt, msm=0)}
        sub = [by_id[i] for i in sorted(want)]
        q = {"keyword": kw, "fields": ["body"], "limit": 3}

        kind = str(rng.choice(["terms", "composite", "date_histogram"]))
        if kind == "terms":
            spec = {"field": "cat", "size": int(rng.integers(1, 6))}
        elif kind == "composite":
            spec = {"field": "cat", "size": int(rng.integers(1, 5))}
            if rng.random() < 0.4:
                spec["after"] = str(rng.choice(CATS))
        else:
            spec = {"field": "t",
                    "interval": int(rng.choice([7, 50, 333]))}
        aggs = {}
        for mi in range(int(rng.integers(1, 3))):
            aggs[f"m{mi}"] = {str(rng.choice(METRICS)): {"field": "n"}}
        nest = kind != "date_histogram" and rng.random() < 0.5
        if nest:
            aggs["nested"] = {
                "date_histogram": {"field": "t",
                                   "interval": int(rng.choice([50, 333]))},
                "aggs": {"nm": {str(rng.choice(METRICS)): {"field": "n"}}}}

        out = c.aggregate("db", "z", q, {kind: spec}, aggs)
        exp_buckets = _bucket_rows(sub, kind, spec)
        assert [b["key"] for b in out["buckets"]] == \
               [k for k, _ in exp_buckets], (kw, kind, spec)
        for b, (k, brows) in zip(out["buckets"], exp_buckets):
            assert b["doc_count"] == len(brows), (kw, kind, k)
            vals = [r["n"] for r in brows if r["n"] is not None]
            for name, sub_agg in aggs.items():
                if name == "nested":
                    continue
                mk = next(iter(sub_agg))
                assert b[name] == _metric_value(mk, vals), (kw, kind, k, mk)
            if nest:
                ispec = aggs["nested"]["date_histogram"]
                imk = next(iter(aggs["nested"]["aggs"]["nm"]))
                inner_exp = _bucket_rows(brows, "date_histogram", ispec)
                got_inner = b["nested"]["buckets"]
                assert [x["key"] for x in got_inner] == \
                       [ik for ik, _ in inner_exp], (kw, k)
                for x, (ik, irows) in zip(got_inner, inner_exp):
                    ivals = [r["n"] for r in irows if r["n"] is not None]
                    assert x["doc_count"] == len(irows)
                    assert x["nm"] == _metric_value(imk, ivals), (kw, k, ik)
        if sub:
            checked += 1
        if kind == "composite":
            exhausted = len(out["buckets"]) < spec.get("size", 10)
            assert out["after_key"] == \
                   (None if (exhausted or not out["buckets"])
                    else out["buckets"][-1]["key"])
    assert checked >= 3      # the generator must produce real match sets
