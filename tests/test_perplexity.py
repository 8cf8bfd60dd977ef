"""Bigram-LM perplexity scoring (ops/perplexity.py) vs a brute-force model."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from byzer_retrieval_ray.ops.perplexity import (
    BigramLM, PerplexityScorer, perplexity_score, train_bigram_lm)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat ran",
]
SCORE = [
    "the cat sat",          # all-seen bigrams
    "the zebra sat",        # OOV continuation + OOV context
    "cat",                  # single token -> dropped
    "on the mat the cat",   # mixed
    "",                     # empty -> dropped
]


def brute_model(texts, min_count=1):
    big, ctx, vocab = {}, {}, set()
    for t in texts:
        toks = t.split()
        vocab.update(toks)
        for i in range(len(toks) - 1):
            big[(toks[i], toks[i + 1])] = big.get((toks[i], toks[i + 1]), 0) + 1
            ctx[toks[i]] = ctx.get(toks[i], 0) + 1
    big = {k: v for k, v in big.items() if v >= min_count}
    return big, ctx, len(vocab)


def brute_logppl(text, big, ctx, vocab, alpha=0.5):
    toks = text.split()
    if len(toks) < 2:
        return None
    s = 0.0
    for i in range(len(toks) - 1):
        c = big.get((toks[i], toks[i + 1]), 0)
        c1 = ctx.get(toks[i], 0)
        s += math.log(c + alpha) - math.log(c1 + alpha * vocab)
    return -s / (len(toks) - 1)


def _train_ds():
    return ray.data.from_arrow(pa.table({"text": TRAIN}))


def _score_ds(parallelism=1):
    t = pa.table({"doc_id": pa.array(range(len(SCORE)), pa.int64()),
                  "text": SCORE})
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


class TestTrain:
    def test_counts_match_brute_force(self, ray_session):
        m = train_bigram_lm(_train_ds(), "text")
        big, ctx, vocab = brute_model(TRAIN)
        assert m.vocab_size == vocab
        got_big = dict(zip(m.bigram_keys, m.bigram_counts))
        assert got_big == {f"{a} {b}": c for (a, b), c in big.items()}
        got_ctx = dict(zip(m.ctx_keys, m.ctx_counts))
        assert got_ctx == ctx
        assert list(m.bigram_keys) == sorted(m.bigram_keys)
        assert list(m.ctx_keys) == sorted(m.ctx_keys)

    def test_min_count_prunes_bigrams_not_contexts(self, ray_session):
        m = train_bigram_lm(_train_ds(), "text", min_count=2)
        big, ctx, _ = brute_model(TRAIN, min_count=2)
        assert dict(zip(m.bigram_keys, m.bigram_counts)) == \
            {f"{a} {b}": c for (a, b), c in big.items()}
        # context totals keep the pruned mass
        assert dict(zip(m.ctx_keys, m.ctx_counts)) == ctx

    def test_partition_invariance(self, ray_session):
        base = train_bigram_lm(_train_ds(), "text")
        split = train_bigram_lm(_train_ds().repartition(3), "text")
        assert np.array_equal(base.bigram_keys, split.bigram_keys)
        assert np.array_equal(base.bigram_counts, split.bigram_counts)
        assert np.array_equal(base.ctx_counts, split.ctx_counts)
        assert base.vocab_size == split.vocab_size


class TestScore:
    def test_logppl_matches_brute_force(self, ray_session):
        m = train_bigram_lm(_train_ds(), "text")
        big, ctx, vocab = brute_model(TRAIN)
        out = perplexity_score(_score_ds(), m, "text", "doc_id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        want = {i: brute_logppl(t, big, ctx, vocab)
                for i, t in enumerate(SCORE)}
        want = {i: v for i, v in want.items() if v is not None}
        assert list(out["id"]) == sorted(want)
        for row in out.itertuples():
            assert row.logppl == pytest.approx(want[row.id], abs=1e-12)
            assert row.ppl == pytest.approx(math.exp(want[row.id]), rel=1e-12)
            assert row.n_tokens == len(SCORE[row.id].split())

    def test_seen_text_scores_below_oov(self, ray_session):
        m = train_bigram_lm(_train_ds(), "text")
        out = perplexity_score(_score_ds(), m, "text", "doc_id") \
            .to_pandas().set_index("id")
        assert out.loc[0, "logppl"] < out.loc[1, "logppl"]

    def test_partition_invariance(self, ray_session):
        m = train_bigram_lm(_train_ds(), "text")
        a = perplexity_score(_score_ds(), m, "text", "doc_id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        b = perplexity_score(_score_ds(parallelism=4), m, "text", "doc_id") \
            .to_pandas().sort_values("id").reset_index(drop=True)
        assert np.array_equal(a["logppl"].to_numpy(), b["logppl"].to_numpy())

    def test_scorer_batch_kernel_no_ray(self):
        """The per-batch kernel is pure numpy/Arrow — drive it directly."""
        big, ctx, vocab = brute_model(TRAIN)
        m = BigramLM(
            bigram_keys=np.array(sorted(f"{a} {b}" for a, b in big),
                                 dtype=object),
            bigram_counts=np.array([big[tuple(k.split())] for k in
                                    sorted(f"{a} {b}" for a, b in big)],
                                   dtype=np.int64),
            ctx_keys=np.array(sorted(ctx), dtype=object),
            ctx_counts=np.array([ctx[k] for k in sorted(ctx)], np.int64),
            vocab_size=vocab)
        sc = PerplexityScorer(m, "text", "doc_id")
        batch = pa.table({"doc_id": pa.array([7], pa.int64()),
                          "text": ["the cat sat"]})
        out = sc(batch)
        assert out["logppl"][0].as_py() == pytest.approx(
            brute_logppl("the cat sat", big, ctx, vocab), abs=1e-12)
