"""Percolator (reverse search): registered boolean queries over a document
stream — set-algebra matching, zero shuffle (ops/percolate.py)."""

import pytest
import ray.data

from byzer_retrieval_ray.ops.percolate import (Percolator, compile_queries,
                                               percolate)

ROWS = [
    {"id": 0, "text": "merge sort is stable and fast"},
    {"id": 1, "text": "quick sort beats merge"},
    {"id": 2, "text": "hash scan heap walk"},
    {"id": 3, "text": "merge sort merge sort"},
    {"id": 4, "text": "nothing relevant"},
]

QS = {
    "q_or": "merge quick",
    "q_must": "+merge +sort",
    "q_not": "merge -quick",
    "q_phrase": '"merge sort"',
    "q_notph": 'sort -"merge sort"',
    "q_mixed": "+scan heap -walk",
}

WANT = {
    "q_or": [0, 1, 3], "q_must": [0, 1, 3], "q_not": [0, 3],
    "q_phrase": [0, 3], "q_notph": [1], "q_mixed": [],
}


def _run(ds):
    out = percolate(ds, QS, "text", "id").to_pandas()
    return {k: sorted(out[out["query"] == k]["id"]) for k in QS}


class TestPercolate:
    def test_match_semantics(self, ray_session):
        assert _run(ray.data.from_items(ROWS)) == WANT

    def test_batch_invariance(self, ray_session):
        # one row per block: phrase adjacency and presence must not depend
        # on how the stream is batched
        assert _run(ray.data.from_items(ROWS, override_num_blocks=5)) == WANT

    def test_no_matches_schema(self, ray_session):
        ds = ray.data.from_items([{"id": 9, "text": "zzz"}])
        out = percolate(ds, {"q": "+merge"}, "text", "id")
        # Ray's to_pandas drops columns for all-empty datasets; assert the
        # block schema (stable) and the zero row count instead
        assert out.count() == 0
        assert out.schema().names == ["id", "query"]

    def test_unsupported_clauses_raise(self):
        for bad in ("mer*", "merge~1", "t?st", "/m.rge/", '"a b"~2',
                    "+(a | b)", "x (y +z)"):
            with pytest.raises(ValueError):
                compile_queries({"q": bad})

    def test_long_phrase_no_cross_doc_alias(self):
        # REGRESSION (round-4 review): the (doc, pos) key packing must be
        # sized by the longest registered phrase — pos - j reaches -(len-1)
        # and must not alias into the previous doc's key space
        import pyarrow as pa
        ph = " ".join(f"w{i}" for i in range(12))      # 12-term phrase
        p = Percolator({"q": f'"{ph}"'}, "text", "id")
        long_doc = " ".join(f"x{i}" for i in range(3000))
        batch = pa.table({
            "id": pa.array([0, 1], pa.int64()),
            "text": pa.array([long_doc + " " + ph,     # contains the phrase
                              "w5 w6 w7"], pa.string()),  # partial only
        })
        out = p(batch).to_pandas()
        assert sorted(out["id"]) == [0]

    def test_inline_matcher_positions(self):
        # direct matcher probe: overlapping phrase occurrences, repeated
        # terms, phrase split across the doc — single-batch, no Ray
        import pyarrow as pa
        p = Percolator({"q": '"a a b"'}, "text", "id")
        batch = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                          "text": pa.array(["a a a b", "a b a", "b a a"],
                                           pa.string())})
        out = p(batch).to_pandas()
        assert sorted(out["id"]) == [0]
