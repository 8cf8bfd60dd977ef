"""DSIR hashed-n-gram importance weights (ops/dsir.py) vs brute force."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from byzer_retrieval_ray.ops.dedup import _poly_shingle_hashes
from byzer_retrieval_ray.ops.dsir import (
    DsirScorer, HashedNgramDist, dsir_log_weights, dsir_select,
    fit_hashed_ngram_dist, log_ratio_vector)

B = 64  # small bucket count so collisions are exercised

TARGET = [
    "merge sort is a stable sort",
    "quick sort beats merge sort on average",
    "sort the run then merge the runs",
]
RAW = [
    "merge sort is a stable sort",
    "the cat sat on the mat",
    "buy cheap pills online now",
    "sort",                       # single token: unigram + fallback bigram
    "",                           # no tokens: dropped from scoring
    "quick sort beats merge sort on average",
]


def brute_buckets(text):
    """Hashed unigram+bigram bucket ids via the same poly hashes."""
    if not text.split():
        return []
    uni, _ = _poly_shingle_hashes(np.array([text], dtype=object), 1)
    big, _ = _poly_shingle_hashes(np.array([text], dtype=object), 2)
    return list((np.concatenate([uni, big]) % np.uint64(B)).astype(int))


def brute_dist(texts):
    c = np.zeros(B, dtype=np.int64)
    for t in texts:
        for f in brute_buckets(t):
            c[f] += 1
    return c


def brute_logw(text, tc, rc, a=0.5):
    feats = brute_buckets(text)
    if not feats:
        return None
    t_tot, r_tot = int(tc.sum()), int(rc.sum())
    s = 0.0
    for f in feats:
        s += (math.log(tc[f] + a) - math.log(t_tot + a * B)
              - math.log(rc[f] + a) + math.log(r_tot + a * B))
    return s


def _ds(texts, parallelism=1):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


class TestFit:
    def test_counts_match_brute_force(self, ray_session):
        d = fit_hashed_ngram_dist(_ds(RAW), "text", num_buckets=B)
        assert np.array_equal(d.counts, brute_dist(RAW))
        assert d.total == int(brute_dist(RAW).sum())
        assert d.num_buckets == B

    def test_partition_invariance(self, ray_session):
        a = fit_hashed_ngram_dist(_ds(RAW), "text", num_buckets=B)
        b = fit_hashed_ngram_dist(_ds(RAW, parallelism=4), "text",
                                  num_buckets=B)
        assert np.array_equal(a.counts, b.counts)

    def test_bucket_mismatch_rejected(self):
        t = HashedNgramDist(np.zeros(8, np.int64), 0, 8)
        r = HashedNgramDist(np.zeros(16, np.int64), 0, 16)
        with pytest.raises(ValueError, match="num_buckets"):
            log_ratio_vector(t, r)


class TestWeights:
    def _fit(self):
        tc, rc = brute_dist(TARGET), brute_dist(RAW)
        target = HashedNgramDist(tc, int(tc.sum()), B)
        raw = HashedNgramDist(rc, int(rc.sum()), B)
        return target, raw, tc, rc

    def test_logw_matches_brute_force(self, ray_session):
        target, raw, tc, rc = self._fit()
        out = dsir_log_weights(_ds(RAW), target, raw, "text", "doc_id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        want = {i: brute_logw(t, tc, rc) for i, t in enumerate(RAW)}
        want = {i: v for i, v in want.items() if v is not None}
        assert list(out["id"]) == sorted(want)
        for row in out.itertuples():
            assert row.logw == pytest.approx(want[row.id], abs=1e-12)
        # in-target docs must outscore the off-topic one
        s = out.set_index("id")["logw"]
        assert s[0] > s[2] and s[5] > s[2]

    def test_n_features_counts_unigrams_plus_bigrams(self, ray_session):
        target, raw, _, _ = self._fit()
        out = dsir_log_weights(_ds(RAW), target, raw, "text", "doc_id") \
            .to_pandas().set_index("id")
        n = len("the cat sat on the mat".split())
        assert out.loc[1, "n_features"] == n + (n - 1)
        assert out.loc[3, "n_features"] == 2  # 1 unigram + fallback bigram

    def test_partition_invariance(self, ray_session):
        target, raw, _, _ = self._fit()
        a = dsir_log_weights(_ds(RAW), target, raw, "text", "doc_id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        b = dsir_log_weights(_ds(RAW, parallelism=4), target, raw, "text",
                             "doc_id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        assert np.array_equal(a["logw"].to_numpy(), b["logw"].to_numpy())

    def test_scorer_kernel_no_ray(self):
        target, raw, tc, rc = self._fit()
        sc = DsirScorer(log_ratio_vector(target, raw), "text", "doc_id")
        batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                          "text": [RAW[0], ""]})
        out = sc(batch)
        assert out["id"].to_pylist() == [0]
        assert out["logw"][0].as_py() == pytest.approx(
            brute_logw(RAW[0], tc, rc), abs=1e-12)


class TestSelect:
    def test_keep_frac_threshold_semantics(self, ray_session):
        ds = _ds(RAW)
        target = fit_hashed_ngram_dist(_ds(TARGET), "text", num_buckets=B)
        raw = fit_hashed_ngram_dist(ds, "text", num_buckets=B)
        all_w = dsir_log_weights(ds, target, raw, "text", "doc_id") \
            .to_pandas()
        kept = dsir_select(ds, target, raw, "text", "doc_id",
                           keep_frac=0.4).to_pandas()
        # every kept weight >= every dropped weight
        dropped = all_w[~all_w["id"].isin(kept["id"])]
        assert kept["logw"].min() >= dropped["logw"].max()
        # >= threshold keeps at least ceil(frac * n) docs
        assert len(kept) >= math.ceil(0.4 * len(all_w)) - 1
        assert len(kept) < len(all_w)

    def test_keep_all(self, ray_session):
        ds = _ds(RAW)
        target = fit_hashed_ngram_dist(_ds(TARGET), "text", num_buckets=B)
        raw = fit_hashed_ngram_dist(ds, "text", num_buckets=B)
        kept = dsir_select(ds, target, raw, "text", "doc_id",
                           keep_frac=1.0).to_pandas()
        assert len(kept) == 5  # all docs with >= 1 token

    def test_bad_frac_rejected(self, ray_session):
        target = HashedNgramDist(np.zeros(B, np.int64), 0, B)
        with pytest.raises(ValueError, match="keep_frac"):
            dsir_select(_ds(RAW), target, target, "text", "doc_id",
                        keep_frac=0.0)
