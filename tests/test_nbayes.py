"""Multinomial Naive-Bayes classifier: exact counts, closed-form scores vs a
brute-force oracle, batch/bucket invariance (ops/nbayes.py)."""

import math
from collections import Counter

import numpy as np
import pytest
import ray.data

from byzer_retrieval_ray.ops.nbayes import (NBModel, naive_bayes_classify,
                                            train_naive_bayes)

ROWS = [
    {"id": 0, "lang": "en", "text": "the quick brown fox"},
    {"id": 1, "lang": "en", "text": "the lazy dog sleeps"},
    {"id": 2, "lang": "de", "text": "der schnelle fuchs"},
    {"id": 3, "lang": "de", "text": "der hund schlaeft"},
    {"id": 4, "lang": "en", "text": "quick dog"},
    {"id": 5, "lang": "fr", "text": "le chien rapide"},
]


def _oracle(rows, alpha=0.5):
    cnt: dict = {}
    docs: Counter = Counter()
    for r in rows:
        cnt.setdefault(r["lang"], Counter()).update(r["text"].split())
        docs[r["lang"]] += 1
    V = len(set(w for r in rows for w in r["text"].split()))
    N = len(rows)
    out = {}
    for r in rows:
        best = None
        for lbl in sorted(cnt):
            tot = sum(cnt[lbl].values())
            s = math.log(docs[lbl] / N) + sum(
                math.log((cnt[lbl][w] + alpha) / (tot + alpha * V))
                for w in r["text"].split())
            if best is None or s > best[1] + 0:
                if best is None or s > best[1]:
                    best = (lbl, s)
        out[r["id"]] = best
    return out


class TestTrain:
    def test_counts_and_priors(self, ray_session):
        m = train_naive_bayes(ray.data.from_items(ROWS), "text", "lang")
        assert list(m.labels) == ["de", "en", "fr"]
        assert m.n_docs == 6 and list(m.class_docs) == [2, 3, 1]
        # class token totals = Σ (label, token) counts
        assert list(m.class_tokens) == [6, 10, 3]
        assert m.vocab_size == len(set(
            w for r in ROWS for w in r["text"].split()))
        # spot count: 'en the' appears twice
        i = np.searchsorted(m.lt_keys, "en the")
        assert m.lt_keys[i] == "en the" and m.lt_counts[i] == 2

    def test_bucket_invariance(self, ray_session):
        a = train_naive_bayes(ray.data.from_items(ROWS), "text", "lang",
                              num_buckets=2)
        b = train_naive_bayes(ray.data.from_items(ROWS), "text", "lang",
                              num_buckets=16)
        np.testing.assert_array_equal(a.lt_keys, b.lt_keys)
        np.testing.assert_array_equal(a.lt_counts, b.lt_counts)
        assert a.vocab_size == b.vocab_size


class TestClassify:
    def test_matches_bruteforce_oracle(self, ray_session):
        ds = ray.data.from_items(ROWS)
        m = train_naive_bayes(ds, "text", "lang")
        out = naive_bayes_classify(ds, m, "text", "id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        want = _oracle(ROWS)
        for _, r in out.iterrows():
            lbl, s = want[r["id"]]
            assert r["pred"] == lbl
            assert r["logscore"] == pytest.approx(s, abs=1e-9)

    def test_batch_invariance(self, ray_session):
        ds1 = ray.data.from_items(ROWS)
        m = train_naive_bayes(ds1, "text", "lang")
        a = naive_bayes_classify(ds1, m, "text", "id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        ds2 = ray.data.from_items(ROWS, override_num_blocks=6)
        b = naive_bayes_classify(ds2, m, "text", "id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        assert (a["pred"] == b["pred"]).all()
        np.testing.assert_allclose(a["logscore"], b["logscore"], atol=0,
                                   rtol=0)

    def test_unseen_tokens_and_empty_text(self, ray_session):
        ds = ray.data.from_items(ROWS)
        m = train_naive_bayes(ds, "text", "lang")
        probe = ray.data.from_items([
            {"id": 10, "text": "zzz yyy xxx"},    # all unseen → prior + smoothing
            {"id": 11, "text": ""},               # empty → pure prior argmax
        ])
        out = naive_bayes_classify(probe, m, "text", "id").to_pandas() \
            .sort_values("id").reset_index(drop=True)
        # empty doc: argmax of ln(docs_L / N) → 'en' (3/6 largest)
        assert out[out["id"] == 11].iloc[0]["pred"] == "en"
        assert out[out["id"] == 11].iloc[0]["logscore"] == \
            pytest.approx(math.log(3 / 6), abs=1e-12)
        # unseen tokens: all classes get the same smoothing numerator; the
        # winner is decided by prior and denominator — verify vs closed form
        V, a = m.vocab_size, 0.5
        scores = {lbl: math.log(d / 6) + 3 * (math.log(a)
                                              - math.log(t + a * V))
                  for lbl, d, t in zip(m.labels, m.class_docs,
                                       m.class_tokens)}
        best = max(sorted(scores), key=lambda L: scores[L])
        assert out[out["id"] == 10].iloc[0]["pred"] == best
