"""Broadcast hash join (ops/join.py) and stratified quota sampling
(ops/stratified.py). DuckDB value parity is covered by the `broadcast_join`
and `stratified_sample` gate entries."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.join import broadcast_join, _validate_right
from byzer_retrieval_ray.ops.stratified import (
    _sel_hash, _take_n_per_group, stratified_sample)


@pytest.fixture
def ray_mod(ray_session):
    import ray
    return ray


class TestBroadcastJoin:
    DIM = pa.table({"lang": ["en", "de", "fr"], "name": ["English", "German",
                                                         "French"]})

    def test_inner_and_left(self, ray_mod):
        import ray.data
        left = pa.table({"doc_id": [1, 2, 3, 4],
                         "lang": ["en", "de", "xx", "en"]})
        ds = ray.data.from_arrow(left)
        inner = broadcast_join(ds, self.DIM, on="lang").to_pandas() \
            .sort_values("doc_id")
        assert inner["doc_id"].tolist() == [1, 2, 4]
        assert inner["name"].tolist() == ["English", "German", "English"]
        left_j = broadcast_join(ds, self.DIM, on="lang",
                                join_type="left outer").to_pandas() \
            .sort_values("doc_id")
        assert left_j["doc_id"].tolist() == [1, 2, 3, 4]
        assert left_j[left_j["doc_id"] == 3]["name"].isna().all()

    def test_rejects_duplicate_right_keys(self):
        dup = pa.table({"lang": ["en", "en"], "name": ["a", "b"]})
        with pytest.raises(ValueError, match="unique"):
            _validate_right(dup, "lang")

    def test_batch_partitioning_invariant(self, ray_mod):
        import ray.data
        left = pa.table({"doc_id": list(range(100)),
                         "lang": [["en", "de", "fr"][i % 3] for i in range(100)]})
        a = broadcast_join(ray.data.from_arrow(left), self.DIM, "lang") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = broadcast_join(ray.data.from_arrow(left).repartition(7), self.DIM,
                           "lang").to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        assert a.equals(b)


class TestStratifiedSample:
    def test_exact_quota_and_determinism(self, ray_mod):
        import ray.data
        t = pa.table({"doc_id": list(range(300)),
                      "lang": [["en", "de", "fr"][i % 3] for i in range(300)]})
        out = stratified_sample(ray.data.from_arrow(t), "lang", 10).to_pandas()
        assert out.groupby("lang").size().tolist() == [10, 10, 10]
        out2 = stratified_sample(ray.data.from_arrow(t).repartition(9),
                                 "lang", 10).to_pandas()
        assert sorted(out["doc_id"]) == sorted(out2["doc_id"])

    def test_monotone_in_n(self, ray_mod):
        import ray.data
        t = pa.table({"doc_id": list(range(120)),
                      "lang": [["en", "de"][i % 2] for i in range(120)]})
        s10 = set(stratified_sample(ray.data.from_arrow(t), "lang", 10)
                  .to_pandas()["doc_id"])
        s25 = set(stratified_sample(ray.data.from_arrow(t), "lang", 25)
                  .to_pandas()["doc_id"])
        assert s10 < s25

    def test_small_groups_kept_whole(self, ray_mod):
        import ray.data
        t = pa.table({"doc_id": [0, 1, 2], "lang": ["en", "en", "zz"]})
        out = stratified_sample(ray.data.from_arrow(t), "lang", 5).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2]

    def test_combiner_matches_global_selection(self):
        # per-batch pre-selection then final selection == direct selection
        rng = np.random.default_rng(3)
        ids = rng.permutation(1000)
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "lang": [["a", "b", "c", "d"][i % 4] for i in range(1000)]})
        direct = _take_n_per_group(t, "lang", "doc_id", 7)
        parts = [t.slice(0, 400), t.slice(400, 600)]
        pre = pa.concat_tables(
            [_take_n_per_group(p, "lang", "doc_id", 7) for p in parts])
        final = _take_n_per_group(pre, "lang", "doc_id", 7)
        assert sorted(final["doc_id"].to_pylist()) == \
            sorted(direct["doc_id"].to_pylist())

    def test_hash_matches_sample_family(self):
        # same Horner·Knuth family as ops/sample.hash_sample (SQL-replicable)
        from byzer_retrieval_ray.functions.polyhash import poly_hash_np
        ks = [0, 17, 123456]
        expect = (poly_hash_np([str(k) for k in ks], bits=32)
                  * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        assert np.array_equal(_sel_hash(ks), expect)
