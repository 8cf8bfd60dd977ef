"""Repetition / self-similarity metrics (ops/repetition.py). DuckDB value
parity is covered by the `repetition_stats` gate entry."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.repetition import (
    RepetitionStats, add_repetition_stats, filter_repetitive)


@pytest.fixture
def ray_mod(ray_session):
    import ray
    return ray


class TestRepetitionStats:
    def test_hand_computed(self):
        t = pa.table({"text": [
            "a b a b a b",        # 6 tokens, 2 distinct; bigrams: ab,ba,ab,ba,ab
            "x y z w",            # all distinct; 3 distinct bigrams
            "q q q q",            # one token repeated
            "solo",               # single token -> fold-all bigram fallback
            "",                   # empty
        ]})
        out = add_repetition_stats(t)
        fd = out["frac_dup_tokens"].to_pylist()
        ts = out["top_token_share"].to_pylist()
        bs = out["top_bigram_share"].to_pylist()
        assert fd[0] == pytest.approx(1 - 2 / 6)
        assert ts[0] == pytest.approx(3 / 6)
        assert bs[0] == pytest.approx(3 / 5)      # 'a b' occurs 3 of 5 bigrams
        assert fd[1] == 0.0 and ts[1] == pytest.approx(1 / 4)
        assert bs[1] == pytest.approx(1 / 3)
        assert fd[2] == pytest.approx(3 / 4) and ts[2] == 1.0 and bs[2] == 1.0
        assert ts[3] == 1.0 and bs[3] == 1.0      # fallback single shingle
        assert fd[4] == 0.0 and ts[4] == 0.0 and bs[4] == 0.0

    def test_class_matches_fn(self):
        t = pa.table({"text": ["a a b", "c d"]})
        assert RepetitionStats()(t).equals(add_repetition_stats(t))

    def test_batch_boundary_invariance(self):
        # per-doc metrics must not depend on batch grouping
        texts = [f"tok{i % 3} tok{i % 5} tok{i % 3} filler{i}" for i in range(40)]
        whole = add_repetition_stats(pa.table({"text": texts}))
        parts = [add_repetition_stats(pa.table({"text": texts[:13]})),
                 add_repetition_stats(pa.table({"text": texts[13:]}))]
        merged = pa.concat_tables(parts)
        for c in ["frac_dup_tokens", "top_token_share", "top_bigram_share"]:
            assert np.allclose(whole[c].to_numpy(), merged[c].to_numpy())

    def test_gopher_filter(self, ray_mod):
        import ray.data
        ds = ray.data.from_arrow(pa.table({
            "doc_id": [0, 1],
            "text": ["buy now " * 50,
                     " ".join(f"word{i}" for i in range(30))],
        }))
        kept = filter_repetitive(ds).to_pandas()
        assert kept["doc_id"].tolist() == [1]
