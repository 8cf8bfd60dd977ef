"""ByzerStorage client facade — parity with the reference's LocalByzerStorage
builder API (python_api.md:40-260): schema_builder / write_builder / query_builder,
filters + sorts + text + vector + hybrid, delete/truncate/get_by_id."""

import numpy as np
import pytest

from byzer_retrieval_ray.table.client import (
    ByzerStorage, DataType, FieldOption, SortOption,
)


def fake_emb(text: str) -> list:
    rng = np.random.default_rng(abs(hash(text)) % (2**32))
    v = rng.standard_normal(8)
    return (v / np.linalg.norm(v)).tolist()


@pytest.fixture(scope="module")
def storage(ray_session, tmp_path_factory):
    s = ByzerStorage("ns", "db", "articles",
                     location=str(tmp_path_factory.mktemp("storage")),
                     emb_llm=fake_emb, num_doc_parts=2, num_term_parts=2)
    ok = (s.schema_builder()
          .add_field("_id", DataType.LONG)
          .add_field("title", DataType.STRING)
          .add_field("content", DataType.STRING, [FieldOption.ANALYZE])
          .add_field("raw_content", DataType.STRING, [FieldOption.NO_INDEX])
          .add_array_field("vector", DataType.FLOAT)
          .add_field("timestamp", DataType.DOUBLE, [FieldOption.SORT])
          .add_field("count", DataType.INTEGER)
          .execute())
    assert ok
    items = [{
        "_id": i,
        "title": f"t{i}",
        "content": f"document number {i} about {'cats' if i % 2 else 'dogs'}",
        "raw_content": f"raw {i}",
        "vector": f"document number {i}",   # string → embedded via emb_llm
        "timestamp": 1000.0 + i,
        "count": i,
    } for i in range(20)]
    assert s.write_builder().add_items(items, vector_fields=["vector"],
                                       search_fields=["content"]).execute()
    s.commit()
    return s


class TestClient:
    def test_fulltext(self, storage):
        res = (storage.query_builder()
               .set_search_query("cats", fields=["content"])
               .set_limit(20).execute())
        assert sorted(r["_id"] for r in res) == [i for i in range(20) if i % 2]
        assert "raw_content" in res[0] and "content" not in res[0]

    def test_filter_sort(self, storage):
        res = (storage.query_builder()
               .and_filter().add_range("count", min=5, max=12).build()
               .add_sort("timestamp", SortOption.DESC)
               .set_limit(3).execute())
        assert [r["_id"] for r in res] == [12, 11, 10]

    def test_vector(self, storage):
        res = (storage.query_builder()
               .set_vector_query("document number 7", fields=["vector"])
               .set_limit(3).execute())
        assert res[0]["_id"] == 7  # identical embedding → top hit

    def test_hybrid(self, storage):
        res = (storage.query_builder()
               .set_search_query("cats", fields=["content"])
               .set_vector_query("document number 7", fields=["vector"])
               .set_limit(5).execute())
        assert res and res[0]["_score"] > 0

    def test_get_delete_truncate(self, storage):
        doc = storage.get_by_id(3)
        assert doc["_id"] == 3
        assert len(storage.get_by_ids([1, 2, 3])) == 3
        assert storage.delete_by_id(3)
        assert storage.get_by_id(3) is None
        assert storage.truncate_table()
