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
