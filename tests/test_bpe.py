"""Distributed BPE training: exact merge-sequence parity with an
independent naive Sennrich trainer, overlap/greedy semantics, partition
invariance, and the encoder round-trip."""

import collections

import numpy as np
import pyarrow as pa
import pytest
import ray

from byzer_retrieval_ray.ops.bpe import (BpeEncoder, encode_word, train_bpe,
                                         train_bpe_from_counts, word_counts)


def naive_train(word_count: dict[str, int], num_merges: int):
    """Independent oracle: dict/list Sennrich BPE — overlapping pair counts,
    greedy left-to-right merge, tie-break (count desc, (left, right) asc)."""
    seqs = {w: list(w) for w in word_count}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for w, c in word_count.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = sorted(pairs.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b, a + b, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def _counts_table(wc: dict[str, int]) -> pa.Table:
    items = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table({"word": pa.array([w for w, _ in items],
                                      pa.large_string()),
                     "count": pa.array([c for _, c in items], pa.int64())})


class TestTrainer:
    @pytest.mark.parametrize("seed", [0, 7, 23])
    def test_exact_parity_with_naive(self, seed):
        rng = np.random.default_rng(seed)
        alphabet = list("abcdef")
        wc = {}
        for _ in range(60):
            w = "".join(rng.choice(alphabet,
                                   size=int(rng.integers(1, 9))).tolist())
            wc[w] = wc.get(w, 0) + int(rng.integers(1, 50))
        got = train_bpe_from_counts(_counts_table(wc), 25)
        want = naive_train(wc, 25)
        assert [(l, r, t, c) for l, r, t, c in zip(
            got["left"].to_pylist(), got["right"].to_pylist(),
            got["token"].to_pylist(), got["pair_count"].to_pylist())] == want

    def test_self_pair_overlap_counting_and_merge(self):
        # "aaaa"×3: pair (a,a) counts overlapping = 3 per word = 9; greedy
        # merge leaves "aa aa", so round 2's best is (aa,aa) with count 3
        wc = {"aaaa": 3, "bc": 2}
        got = train_bpe_from_counts(_counts_table(wc), 2)
        assert got["token"].to_pylist() == ["aa", "aaaa"]
        assert got["pair_count"].to_pylist() == [9, 3]
        assert naive_train(wc, 2) == [("a", "a", "aa", 9),
                                      ("aa", "aa", "aaaa", 3)]

    def test_tiebreak_is_lexicographic(self):
        # (a,b) and (b,a) both count 5 -> (a,b) wins
        wc = {"ab": 5, "ba": 5}
        got = train_bpe_from_counts(_counts_table(wc), 1)
        assert (got["left"][0].as_py(), got["right"][0].as_py()) == ("a", "b")

    def test_stops_when_exhausted(self):
        got = train_bpe_from_counts(_counts_table({"ab": 1}), 10)
        assert got["token"].to_pylist() == ["ab"]       # then nothing left

    def test_empty_counts(self):
        got = train_bpe_from_counts(_counts_table({}), 5)
        assert len(got) == 0


class TestDistributed:
    CORPUS = ["the cat sat on the mat", "the cats sat", "a mat on a cat",
              "sat the cat the cat", "mats and cats and bats",
              "the bat sat on the cat"] * 4

    def _expected_wc(self, min_frequency=1):
        wc = collections.Counter()
        for line in self.CORPUS:
            wc.update(line.split())
        return {w: c for w, c in wc.items() if c >= min_frequency}

    def test_word_counts_and_min_frequency(self, ray_session):
        ds = ray.data.from_items([{"text": t} for t in self.CORPUS])
        wc = word_counts(ds, "text", min_frequency=5, num_buckets=8)
        got = dict(zip(wc["word"].to_pylist(), wc["count"].to_pylist()))
        assert got == self._expected_wc(5)
        # sorted (count desc, word asc)
        pairs = list(zip(wc["count"].to_pylist(), wc["word"].to_pylist()))
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))

    @pytest.mark.parametrize("nblocks", [1, 4])
    def test_train_partition_invariant(self, ray_session, nblocks):
        ds = ray.data.from_items([{"text": t} for t in self.CORPUS]) \
                     .repartition(nblocks)
        got = train_bpe(ds, "text", 12, min_frequency=1, num_buckets=8)
        want = naive_train(self._expected_wc(), 12)
        assert [(l, r, c) for l, r, c in zip(
            got["left"].to_pylist(), got["right"].to_pylist(),
            got["pair_count"].to_pylist())] == [(a, b, c)
                                                for a, b, _, c in want]


class TestEncoder:
    def test_encode_word_respects_rank_order(self):
        ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
        assert encode_word("abc", ranks) == ["abc"]
        assert encode_word("bc", ranks) == ["bc"]
        assert encode_word("zabcz", ranks) == ["z", "abc", "z"]
        assert encode_word("x", ranks) == ["x"]

    def test_roundtrip_and_zero_merges(self, ray_session):
        corpus = TestDistributed.CORPUS
        ds = ray.data.from_items([{"text": t} for t in corpus])
        merges = train_bpe(ds, "text", 10, min_frequency=1, num_buckets=8)
        out = ds.map_batches(BpeEncoder(merges, "text"),
                             batch_format="pyarrow",
                             concurrency=2).to_pandas()
        assert len(out) == len(corpus)
        for text, toks in zip(out["text"], out["bpe_tokens"]):
            assert "".join(toks) == text.replace(" ", "")
        empty = train_bpe_from_counts(_counts_table({}), 0)
        out0 = ds.map_batches(BpeEncoder(empty, "text"),
                              batch_format="pyarrow").to_pandas()
        for text, toks in zip(out0["text"], out0["bpe_tokens"]):
            assert list(toks) == [ch for ch in text if ch != " "]

    def test_encoder_compresses(self, ray_session):
        ds = ray.data.from_items([{"text": t}
                                  for t in TestDistributed.CORPUS])
        merges = train_bpe(ds, "text", 20, min_frequency=1, num_buckets=8)
        enc = BpeEncoder(merges, "text")
        tbl = pa.table({"text": pa.array(["the cat sat on the mat"])})
        toks = enc(tbl)["bpe_tokens"].to_pylist()[0]
        n_chars = len("thecatsatonthemat")
        assert len(toks) < n_chars           # merges actually apply
