"""Sequence packing / document chunking (ops/chunk.py). DuckDB value parity is
covered by the `chunk_documents` gate entry."""

import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.chunk import chunk_batch, chunk_documents


@pytest.fixture
def ray_mod(ray_session):
    import ray
    return ray


class TestChunkBatch:
    def test_no_overlap_exact_windows(self):
        t = pa.table({"doc_id": [7], "text": [" ".join(f"t{i}" for i in range(10))]})
        out = chunk_batch(t, chunk_tokens=4, overlap=0)
        assert out["chunk_id"].to_pylist() == [0, 1, 2]
        assert out["chunk_text"].to_pylist() == [
            "t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9"]
        assert out["n_chunk_tokens"].to_pylist() == [4, 4, 2]
        assert out["doc_id"].to_pylist() == [7, 7, 7]

    def test_overlap_windows(self):
        t = pa.table({"doc_id": [1], "text": [" ".join("abcdefg")]})  # 7 tokens
        out = chunk_batch(t, chunk_tokens=4, overlap=2)               # step 2
        # starts 0,2,4,6 -> a b c d / c d e f / e f g / g
        assert out["chunk_text"].to_pylist() == ["a b c d", "c d e f", "e f g", "g"]
        assert out["n_chunk_tokens"].to_pylist() == [4, 4, 3, 1]

    def test_multi_doc_and_empty(self):
        t = pa.table({"doc_id": [1, 2, 3],
                      "text": ["x y z", "", "p q r s t"]})
        out = chunk_batch(t, chunk_tokens=3, overlap=0)
        # empty docs produce no chunks (the SQL's WHERE len(t) > 0)
        assert out["doc_id"].to_pylist() == [1, 3, 3]
        assert out["chunk_text"].to_pylist() == ["x y z", "p q r", "s t"]
        assert out["n_chunk_tokens"].to_pylist() == [3, 3, 2]

    def test_rejects_bad_overlap(self):
        t = pa.table({"doc_id": [1], "text": ["a b"]})
        with pytest.raises(ValueError):
            chunk_batch(t, chunk_tokens=4, overlap=4)

    def test_dataset_flat_map(self, ray_mod):
        import ray.data
        ds = ray.data.from_arrow(pa.table({
            "doc_id": list(range(5)),
            "text": [" ".join(f"w{i}_{j}" for j in range(25)) for i in range(5)],
        }))
        out = chunk_documents(ds, chunk_tokens=10, overlap=0).to_pandas()
        assert len(out) == 5 * 3                       # 25 tokens -> 3 windows
        g = out.groupby("doc_id")["n_chunk_tokens"].sum()
        assert set(g) == {25}


class TestDropCoveredTails:
    def test_advice_example(self):
        # 7 tokens, C=4/O=2: default emits starts 0,2,4,6 (the 1-token tail
        # 'g' is fully inside 'e f g'); drop_covered_tails skips start 6
        t = pa.table({"doc_id": [1], "text": ["a b c d e f g"]})
        dflt = chunk_batch(t, chunk_tokens=4, overlap=2)
        assert dflt["chunk_text"].to_pylist() == \
            ["a b c d", "c d e f", "e f g", "g"]
        trimmed = chunk_batch(t, chunk_tokens=4, overlap=2,
                              drop_covered_tails=True)
        assert trimmed["chunk_text"].to_pylist() == \
            ["a b c d", "c d e f", "e f g"]

    def test_noop_without_overlap_or_short_docs(self):
        t = pa.table({"doc_id": [1, 2], "text": ["a b c d e", "x y"]})
        a = chunk_batch(t, chunk_tokens=4, overlap=0)
        b = chunk_batch(t, chunk_tokens=4, overlap=0,
                        drop_covered_tails=True)
        assert a.equals(b)
        # the first window is never dropped even when the doc fits inside it
        c = chunk_batch(t, chunk_tokens=8, overlap=3,
                        drop_covered_tails=True)
        assert c["chunk_text"].to_pylist() == ["a b c d e", "x y"]
