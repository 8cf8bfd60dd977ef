"""duplicate_spans: brute-force cross-check, coverage merging, short docs."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.spans import duplicate_spans


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


def brute(texts, W):
    from collections import Counter

    def wins(toks):
        if len(toks) == 0:
            return []
        if len(toks) < W:
            return [tuple(toks)]
        return [tuple(toks[i:i + W]) for i in range(len(toks) - W + 1)]

    allw = Counter()
    for s in texts:
        allw.update(wins(s.split()))
    want = {}
    for i, s in enumerate(texts):
        tk = s.split()
        ws = wins(tk)
        if not ws:
            continue
        dup_idx = [j for j, w in enumerate(ws) if allw[w] >= 2]
        cov = set()
        for j in dup_idx:
            cov.update(range(j, min(j + min(W, len(tk)), len(tk))))
        want[i] = (len(ws), len(dup_idx), round(len(cov) / len(tk), 10))
    return want


class TestSpans:
    def run(self, ray_mod, texts, W, parts=4):
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = duplicate_spans(ray_mod.from_arrow(t).repartition(parts),
                              "text", "doc_id", window=W).to_pandas()
        return {r.id: (r.n_windows, r.n_dup_windows,
                       round(r.dup_token_frac, 10)) for r in out.itertuples()}

    def test_matches_bruteforce_random(self, ray_mod):
        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(60):
            toks = list(rng.choice(vocab, rng.integers(2, 30)))
            if i % 5 == 0:
                toks[0:0] = ["shared", "boiler", "plate", "tail", "words"]
            texts.append(" ".join(toks))
        assert self.run(ray_mod, texts, W=3) == brute(texts, 3)

    def test_overlapping_windows_union_coverage(self, ray_mod):
        # both docs contain the same 5-token run -> 3 dup windows of width 3
        # covering 5 tokens, not 9
        run = "a b c d e"
        texts = [run + " x y", run + " p q"]
        got = self.run(ray_mod, texts, W=3, parts=1)
        assert got[0] == (5, 3, round(5 / 7, 10))
        assert got[1] == (5, 3, round(5 / 7, 10))

    def test_short_doc_whole_window(self, ray_mod):
        texts = ["tiny doc", "tiny doc", "something else entirely different"]
        got = self.run(ray_mod, texts, W=5)
        assert got[0] == (1, 1, 1.0) and got[1] == (1, 1, 1.0)
        assert got[2][1] == 0

    def test_intra_doc_repeat_counts(self, ray_mod):
        texts = ["x y z q r x y z"]  # 'x y z' occurs twice inside one doc
        got = self.run(ray_mod, texts, W=3, parts=1)
        assert got[0][1] >= 2
        assert self.run(ray_mod, texts, 3, 1) == brute(texts, 3)
