"""Aggregation-endpoint fuzzer: random query ASTs (the generator and the
independent Lucene-BooleanQuery evaluator from test_query_fuzz) define a
reference MATCH SET; every match-set aggregation endpoint — facet_counts,
field_stats, range_facets, date_histogram, terms_stats, count, cardinality,
search_by_field, rare_terms, weighted_avg, matrix_stats, top_hits — is
then compared against a brute-force fold computed
directly from the corpus rows restricted to that match set. No production
aggregation code is shared with the oracle folds (cardinality compares
against the ops/hll sketch applied to the exact key list, which is the
endpoint's documented estimator). This pins the whole chain
query → TAAT match set → docstore read → partial → driver fold."""

import collections

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings
from tests.test_query_fuzz import (VOCAB, _ev_bool, _gen_children,
                                   _render_top, _unwrap_top)

SCHEMA = ("st(field(_id,long),field(body,string,analyze),"
          "field(cat,string),field(n,long),field(t,long))")

CATS = ["a", "b", "c", "d", "e"]


def _corpus(rng, n=48):
    rows = []
    for i in range(n):
        k = int(rng.integers(0, 14))
        rows.append({
            "_id": i,
            "body": " ".join(rng.choice(VOCAB, k)) if k else "",
            "cat": None if rng.random() < 0.12 else str(rng.choice(CATS)),
            "n": None if rng.random() < 0.12 else int(rng.integers(-50, 200)),
            # negatives exercise floor-vs-truncation histogram bucketing
            "t": int(rng.integers(-1000, 1000)),
        })
    return rows


@pytest.fixture(scope="module")
def agg_cluster(ray_session, tmp_path_factory):
    rng = np.random.default_rng(424243)
    rows = _corpus(rng)
    loc = str(tmp_path_factory.mktemp("aggfuzz"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "g", SCHEMA, loc))
    c.build_from_local("db", "g", rows, key_field="_id",
                       num_doc_parts=3, num_term_parts=2)
    toks = {r["_id"]: r["body"].split() for r in rows}
    return c, rows, toks


def _match_set(toks, children, msm):
    eff = _unwrap_top(children)
    return {i for i, tt in toks.items() if _ev_bool(eff, tt, msm=msm)}


@pytest.mark.parametrize("seed", [7, 23, 59, 131, 313, 677, 1201, 2803])
def test_random_query_aggregations_match_bruteforce(agg_cluster, seed):
    c, rows, toks = agg_cluster
    by_id = {r["_id"]: r for r in rows}
    rng = np.random.default_rng(seed)
    n_nonempty = 0
    for _ in range(10):
        children = _gen_children(rng, 0)
        kw = _render_top(children)
        msm = int(rng.integers(0, 2))
        want = _match_set(toks, children, msm)
        q = {"keyword": kw, "fields": ["body"], "limit": 3,
             "min_should_match": msm}
        sub = [by_id[i] for i in sorted(want)]
        if sub:
            n_nonempty += 1

        # ---- count (TotalHitCountCollector)
        assert c.count("db", "g", q) == len(want), kw

        # ---- facet_counts: (count desc, value asc), nulls out
        cnt = collections.Counter(r["cat"] for r in sub
                                  if r["cat"] is not None)
        exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = c.facet_counts("db", "g", q, "cat", limit=10)
        assert got == [{"value": v, "count": n} for v, n in exp], kw

        # ---- field_stats over n (nulls out, integer-exact)
        vals = [r["n"] for r in sub if r["n"] is not None]
        st = c.field_stats("db", "g", q, "n")
        if vals:
            assert st == {"count": len(vals), "min": min(vals),
                          "max": max(vals), "sum": sum(vals),
                          "mean": sum(vals) / len(vals)}, kw
        else:
            assert st["count"] == 0 and st["sum"] is None, kw

        # ---- range_facets: half-open bins over n
        edges = [-50, 0, 50, 100, 200]
        got_rf = c.range_facets("db", "g", q, "n", edges=edges)
        for (lo, hi), o in zip(zip(edges, edges[1:]), got_rf):
            assert o["lo"] == lo and o["hi"] == hi
            assert o["count"] == sum(1 for v in vals if lo <= v < hi), kw

        # ---- date_histogram over t (negatives -> floor semantics)
        interval = int(rng.integers(7, 300))
        hist = collections.Counter((r["t"] // interval) * interval
                                   for r in sub)
        got_h = c.date_histogram("db", "g", q, "t", interval=interval)
        assert got_h == [{"bucket": b, "count": n}
                         for b, n in sorted(hist.items())], (kw, interval)

        # ---- terms_stats: per-cat folds of n
        folds = {}
        for r in sub:
            if r["cat"] is None:
                continue
            f = folds.setdefault(r["cat"], [0, 0, 0])
            f[0] += 1
            if r["n"] is not None:
                f[1] += 1
                f[2] += r["n"]
        exp_ts = sorted(folds.items(), key=lambda kv: (-kv[1][0], kv[0]))
        got_ts = c.terms_stats("db", "g", q, "cat", "n", limit=10)
        assert got_ts == [
            {"key": k, "count": f[0], "metric_count": f[1],
             "metric_sum": float(f[2]),
             "metric_avg": (f[2] / f[1]) if f[1] else None}
            for k, f in exp_ts], kw

        # ---- cardinality: register-exact vs the sketch on the key list
        from byzer_retrieval_ray.ops.hll import _estimate, _registers
        keys = [r["cat"] for r in sub if r["cat"] is not None]
        regs = _registers(keys, 12) if keys else np.zeros(1 << 12, np.int64)
        exp_card = _estimate(regs, 12)
        got_card = c.cardinality("db", "g", q, "cat", p=12)
        assert got_card == exp_card, kw

        # ---- percentiles: exact lower discrete quantile of n, tiny knobs
        # force multi-round narrowing
        if vals:
            qs_p = [0.0, float(rng.random()), 1.0]
            got_p = c.percentiles("db", "g", q, "n", qs_p, n_candidates=4,
                                  collect_limit=8, max_rounds=60)
            sv = sorted(vals)
            assert [o["value"] for o in got_p] == \
                   [float(sv[int(np.floor(x * (len(sv) - 1)))])
                    for x in qs_p], kw

        # ---- search_by_field: whole-match-set order by (n desc, _id asc),
        # nulls excluded, top query.limit
        order = sorted(((r["n"], r["_id"]) for r in sub
                        if r["n"] is not None),
                       key=lambda t: (-t[0], t[1]))[:3]
        got_s = c.search_by_field("db", "g", q, "n", ascending=False)
        assert [(o["n"], o["doc_id"]) for o in got_s] == order, kw

        # ---- rare_terms: EXACT (count asc, value asc), <= max_doc_count
        mdc = int(rng.integers(1, 6))
        exp_rare = sorted(((v, n) for v, n in cnt.items() if n <= mdc),
                          key=lambda kv: (kv[1], kv[0]))[:10]
        got_rare = c.rare_terms("db", "g", q, "cat", max_doc_count=mdc,
                                limit=10)
        assert got_rare == [{"value": v, "count": n}
                            for v, n in exp_rare], (kw, mdc)

        # ---- weighted_avg of n weighted by t (skip-missing on either)
        wa = c.weighted_avg("db", "g", q, "n", "t", precision="float64")
        pairs = [(float(r["n"]), float(r["t"])) for r in sub
                 if r["n"] is not None]
        assert wa["count"] == len(pairs), kw
        wsum = sum(w for _, w in pairs)
        if pairs and wsum != 0.0:
            exp_wa = sum(v * w for v, w in pairs) / wsum
            assert wa["weighted_avg"] == pytest.approx(exp_wa,
                                                       rel=1e-12), kw

        # ---- matrix_stats over (n, t): row-complete population moments
        ms = c.matrix_stats("db", "g", q, ["n", "t"], precision="float64")
        assert ms["doc_count"] == len(pairs), kw
        if pairs:
            xs = np.array([p[0] for p in pairs])
            ys = np.array([p[1] for p in pairs])
            n_ = float(len(pairs))
            mx, my = xs.sum() / n_, ys.sum() / n_
            vx = max(0.0, (xs * xs).sum() / n_ - mx * mx)
            vy = max(0.0, (ys * ys).sum() / n_ - my * my)
            cv = (xs * ys).sum() / n_ - mx * my
            assert ms["fields"]["n"]["mean"] == pytest.approx(mx, rel=1e-12)
            assert ms["fields"]["n"]["variance"] == \
                pytest.approx(vx, rel=1e-9, abs=1e-9)
            assert ms["fields"]["t"]["variance"] == \
                pytest.approx(vy, rel=1e-9, abs=1e-9)
            assert ms["covariance"]["n"]["t"] == \
                pytest.approx(cv, rel=1e-9, abs=1e-9), kw
            if vx > 0.0 and vy > 0.0:
                assert ms["correlation"]["n"]["t"] == \
                    pytest.approx(cv / np.sqrt(vx * vy), rel=1e-9, abs=1e-9)

        # ---- filters_agg: independent named buckets (+ _other_), incl.
        # the not/exists extension leaves
        thr = int(rng.integers(-50, 200))
        named = {"a_cat": {"and": [{"field": "cat", "value": "a"}]},
                 "big": {"and": [{"field": "n", "min": thr}]},
                 "no_n": {"field": "n", "exists": False}}

        def _in_b(r, name):
            if name == "a_cat":
                return r["cat"] == "a"
            if name == "big":
                return r["n"] is not None and r["n"] >= thr
            return r["n"] is None

        got_f = c.filters_agg("db", "g", q, named, other_bucket=True)
        exp_f = [{"key": k, "count": sum(1 for r in sub if _in_b(r, k))}
                 for k in named]
        exp_f.append({"key": "_other_",
                      "count": sum(1 for r in sub
                                   if not any(_in_b(r, k) for k in named))})
        assert got_f == exp_f, (kw, thr)

        # ---- composite_agg: size-2 pages walk the full ascending key
        # space exactly; after_key goes None at exhaustion
        pages, after = [], None
        for _ in range(10):
            pg = c.composite_agg("db", "g", q, "cat", size=2, after=after)
            pages.extend(pg["buckets"])
            after = pg["after_key"]
            if after is None:
                break
        assert after is None
        assert pages == [{"key": k, "count": n}
                         for k, n in sorted(cnt.items())], kw

        # ---- top_hits: two-phase terms+top_hits fold vs the one-shot full
        # ranking (key buckets by count desc/value asc, per-key hits by
        # score desc/id asc)
        got_th = c.top_hits("db", "g", q, "cat", num_keys=3, per_key=2,
                            precision="float64")
        full = c.search("db", "g", dict(q, limit=1_000_000),
                        precision="float64")[0]
        keys_exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        exp_th = [{"key": k, "count": n,
                   "hits": [{"doc_id": r["doc_id"], "_score": r["_score"]}
                            for r in full if r["cat"] == k][:2]}
                  for k, n in keys_exp]
        assert got_th == exp_th, kw

        # ---- median_absolute_deviation: exact lower-quantile medians in
        # the raw then |v - median| domains, tiny knobs force narrowing
        if vals:
            got_mad = c.median_absolute_deviation(
                "db", "g", q, "n", n_candidates=4, collect_limit=8,
                max_rounds=60)
            sv = sorted(vals)
            exp_med = float(sv[(len(sv) - 1) // 2])
            devs = sorted(abs(v - exp_med) for v in vals)
            assert got_mad == {"median": exp_med,
                               "mad": float(devs[(len(devs) - 1) // 2])}, kw

        # ---- adjacency_matrix: singles + pairwise intersections, zero
        # buckets dropped, keys in filter-then-combination order
        got_adj = c.adjacency_matrix("db", "g", q, named)
        names = list(named)
        exp_adj = []
        for k in names:
            n_k = sum(1 for r in sub if _in_b(r, k))
            if n_k:
                exp_adj.append({"key": k, "count": n_k})
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                n_ij = sum(1 for r in sub
                           if _in_b(r, names[i]) and _in_b(r, names[j]))
                if n_ij:
                    exp_adj.append({"key": f"{names[i]}&{names[j]}",
                                    "count": n_ij})
        exp_adj = sorted(exp_adj, key=lambda o: o["key"])
        assert sorted(got_adj, key=lambda o: o["key"]) == exp_adj, (kw, thr)

        # ---- top_metrics: metrics of the top-3 docs by (n desc, _id asc),
        # null sort values excluded, null metrics ship as None
        got_tm = c.top_metrics("db", "g", q, "n", ["t"], ascending=False,
                               size=3, precision="float64")
        exp_rows = sorted((r for r in sub if r["n"] is not None),
                          key=lambda r: (-r["n"], r["_id"]))[:3]
        assert [(o["doc_id"], o["sort_value"], o["t"]) for o in got_tm] == \
               [(r["_id"], float(r["n"]),
                 None if r["t"] is None else float(r["t"]))
                for r in exp_rows], kw

        # ---- string_stats over cat (stored; nulls out): length stats +
        # log2 entropy of the char distribution
        ss = c.string_stats("db", "g", q, "cat", precision="float64")
        svals = [r["cat"] for r in sub if r["cat"] is not None]
        assert ss["count"] == len(svals), kw
        if svals:
            lens = [len(s) for s in svals]
            assert ss["min_length"] == min(lens)
            assert ss["max_length"] == max(lens)
            assert ss["avg_length"] == pytest.approx(
                sum(lens) / len(lens), rel=1e-12)
            ch = collections.Counter("".join(svals))
            tot = sum(ch.values())
            exp_e = -sum((v / tot) * np.log2(v / tot) for v in ch.values())
            assert ss["entropy"] == pytest.approx(exp_e, rel=1e-9,
                                                  abs=1e-12), kw
        else:
            assert ss["entropy"] == 0.0 and ss["min_length"] is None
    assert n_nonempty >= 5        # the generator must not degenerate
