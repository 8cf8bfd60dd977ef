"""hll_distinct: error bound vs exact, merge associativity, partition
invariance, both estimator branches, bad-p guard."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.hll import (_estimate, _registers, hll_distinct,
                                         merge_registers)


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


def keys_table(n, dup=3):
    # n distinct keys, each repeated `dup` times, shuffled deterministically
    ks = np.repeat([f"key-{i}" for i in range(n)], dup)
    rng = np.random.default_rng(11)
    rng.shuffle(ks)
    return pa.table({"k": pa.array(ks)})


class TestHLL:
    def test_error_bound_hll_branch(self, ray_mod):
        # 50k distinct at p=12 (m=4096): raw-HLL branch; 1.04/sqrt(m)≈1.6 %
        # std — assert within 5 std
        n = 50_000
        ds = ray_mod.from_arrow(keys_table(n)).repartition(8)
        got = hll_distinct(ds, "k", p=12)
        assert got["branch"] == "hll"
        assert abs(got["estimate"] - n) / n < 5 * 1.04 / 64

    def test_linear_branch_small_range(self, ray_mod):
        n = 100
        ds = ray_mod.from_arrow(keys_table(n))
        got = hll_distinct(ds, "k", p=12)
        assert got["branch"] == "linear"
        assert abs(got["estimate"] - n) / n < 0.15

    def test_partition_invariance(self, ray_mod):
        # registers are a max-fold: block layout must not change the result
        t = keys_table(5000)
        a = hll_distinct(ray_mod.from_arrow(t), "k", p=10)
        b = hll_distinct(ray_mod.from_arrow(t).repartition(13), "k", p=10)
        assert a == b

    def test_duplicates_do_not_move_estimate(self, ray_mod):
        a = hll_distinct(ray_mod.from_arrow(keys_table(2000, dup=1)), "k", p=10)
        b = hll_distinct(ray_mod.from_arrow(keys_table(2000, dup=7)), "k", p=10)
        assert a == b

    def test_merge_associative_matches_single_pass(self):
        ks = [f"x{i}" for i in range(3000)]
        full = _registers(ks, 10)
        parts = [_registers(ks[i::4], 10) for i in range(4)]
        merged = parts[0]
        for p_ in parts[1:]:
            merged = merge_registers(merged, p_)
        assert np.array_equal(full, merged)
        assert _estimate(merged, 10) == _estimate(full, 10)

    def test_bad_p_rejected(self, ray_mod):
        ds = ray_mod.from_arrow(keys_table(10))
        with pytest.raises(ValueError):
            hll_distinct(ds, "k", p=3)
        with pytest.raises(ValueError):
            hll_distinct(ds, "k", p=21)

    def test_int_keys_hash_as_strings(self, ray_mod):
        # int64 key column must estimate like its string form (cast inside)
        ints = pa.table({"k": pa.array(np.arange(4000, dtype=np.int64))})
        strs = pa.table({"k": pa.array([str(i) for i in range(4000)])})
        a = hll_distinct(ray_mod.from_arrow(ints), "k", p=11)
        b = hll_distinct(ray_mod.from_arrow(strs), "k", p=11)
        assert a == b


def grouped_table(groups):
    # groups: dict group -> number of distinct keys; each key repeated twice
    gs, ks = [], []
    for g, n in groups.items():
        for i in range(n):
            for _ in range(2):
                gs.append(g)
                ks.append(f"{g}/key-{i}")
    rng = np.random.default_rng(7)
    order = rng.permutation(len(gs))
    return pa.table({"g": pa.array(np.asarray(gs, object)[order]),
                     "k": pa.array(np.asarray(ks, object)[order])})


class TestHLLByKey:
    def test_matches_per_group_hll_distinct(self, ray_mod):
        # grouped fold must give byte-identical estimates to running
        # hll_distinct on each group's rows alone (same registers)
        from byzer_retrieval_ray.ops.hll import hll_by_key
        groups = {"en": 900, "de": 40, "fr": 2500}
        t = grouped_table(groups)
        out = hll_by_key(ray_mod.from_arrow(t).repartition(7), "k", "g",
                         p=8, num_buckets=4).to_pandas()
        out = out.set_index("group")
        assert sorted(out.index) == sorted(groups)
        for g in groups:
            sub = t.filter(pa.compute.equal(t["g"], g))
            want = hll_distinct(ray_mod.from_arrow(sub), "k", p=8)
            row = out.loc[g]
            assert row["estimate"] == want["estimate"]
            assert row["raw"] == want["raw"]
            assert row["zeros"] == want["zeros"]
            assert row["branch"] == want["branch"]

    def test_partition_invariance(self, ray_mod):
        from byzer_retrieval_ray.ops.hll import hll_by_key
        t = grouped_table({"a": 300, "b": 1500, "c": 5})
        a = hll_by_key(ray_mod.from_arrow(t), "k", "g", p=8) \
            .to_pandas().sort_values("group").reset_index(drop=True)
        b = hll_by_key(ray_mod.from_arrow(t).repartition(11), "k", "g",
                       p=8, num_buckets=3) \
            .to_pandas().sort_values("group").reset_index(drop=True)
        assert a.equals(b)

    def test_bad_p_rejected(self, ray_mod):
        from byzer_retrieval_ray.ops.hll import hll_by_key
        ds = ray_mod.from_arrow(grouped_table({"a": 5}))
        with pytest.raises(ValueError):
            hll_by_key(ds, "k", "g", p=3)
