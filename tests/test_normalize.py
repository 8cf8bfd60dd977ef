"""Text normalization (ops/normalize.py). DuckDB value parity is covered by
the `normalize_text` gate entry."""

import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.normalize import normalize_dataset, normalize_text


@pytest.fixture
def ray_mod(ray_session):
    import ray
    return ray


class TestNormalizeText:
    def test_full_pipeline(self):
        t = pa.table({"text": ["  The  CAT, sat!  ", "a\tb\nc", "plain"]})
        out = normalize_text(t)
        assert out["text"].to_pylist() == ["the cat sat", "a b c", "plain"]

    def test_options_independent(self):
        t = pa.table({"text": ["A, B"]})
        assert normalize_text(t, lowercase=False)["text"].to_pylist() == ["A B"]
        assert normalize_text(t, strip_punct=False)["text"].to_pylist() == ["a, b"]
        assert normalize_text(
            t, collapse_ws=False)["text"].to_pylist() == ["a b"]

    def test_out_col_keeps_original(self):
        t = pa.table({"text": ["X!"]})
        out = normalize_text(t, out_col="norm")
        assert out["text"].to_pylist() == ["X!"]
        assert out["norm"].to_pylist() == ["x"]

    def test_composes_with_exact_dedup(self, ray_mod):
        import ray.data
        from byzer_retrieval_ray.ops.dedup import exact_dedup
        t = pa.table({"doc_id": [1, 2, 3],
                      "text": ["The Cat.", "the  cat", "a dog"]})
        norm = normalize_dataset(ray.data.from_arrow(t))
        kept = exact_dedup(norm, "text", "doc_id").to_pandas()
        # 1 and 2 normalize identically -> the larger id (2) is dropped
        assert sorted(kept["doc_id"].tolist()) == [1, 3]
