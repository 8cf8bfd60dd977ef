"""Domain-mixture resampling: exact copy counts, deterministic hash coin,
partition invariance, plan accounting."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.functions.polyhash import fmix32_np, poly_hash_np
from byzer_retrieval_ray.ops.mixture import (_copies, mixture_plan,
                                             mixture_resample)


def tbl(n=40, doms=("a", "b", "c", "d")):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([doms[i % len(doms)] for i in range(n)],
                           pa.string()),
    })


def coin(ids, frac):
    u = fmix32_np(poly_hash_np([str(i) for i in ids], bits=32))
    return u < np.floor(frac * 2.0 ** 32).astype(np.uint64)


class TestCopies:
    def test_integer_weights_exact(self):
        k = _copies(tbl(), "source", "doc_id",
                    {"a": 2.0, "b": 0.0, "c": 3.0}, 1.0)
        doms = [("a", 2), ("b", 0), ("c", 3), ("d", 1)]
        for i, (_, want) in zip(range(4), doms):
            assert k[i] == want

    def test_fractional_matches_hash_coin(self):
        t = tbl(100, ("x",))
        k = _copies(t, "source", "doc_id", {"x": 1.25}, 1.0)
        want = 1 + coin(range(100), 0.25).astype(np.int64)
        assert (k == want).all()
        # a pure downsample keeps exactly the coin winners
        k2 = _copies(t, "source", "doc_id", {"x": 0.25}, 1.0)
        assert (k2 == coin(range(100), 0.25).astype(np.int64)).all()

    def test_negative_weight_rejected(self):
        with pytest.raises(ValueError):
            _copies(tbl(), "source", "doc_id", {"a": -1.0}, 1.0)


class TestResample:
    def test_epochs_and_drops(self, ray_session):
        import ray.data
        out = mixture_resample(ray.data.from_arrow(tbl()), "source",
                               {"a": 2.0, "b": 0.0}, "doc_id").to_pandas()
        a_rows = out[out["source"] == "a"]
        assert sorted(a_rows["epoch"].unique()) == [0, 1]
        assert len(a_rows) == 20  # 10 'a' docs x 2
        assert (out["source"] != "b").all()
        # every (doc_id, epoch) pair unique; epochs dense from 0
        g = out.groupby("doc_id")["epoch"].agg(["min", "max", "count"])
        assert (g["min"] == 0).all()
        assert (g["max"] + 1 == g["count"]).all()

    def test_partition_invariance(self, ray_session):
        import ray.data
        t = tbl(120)
        w = {"a": 2.5, "b": 0.25, "c": 0.0}
        key = lambda df: df.sort_values(["doc_id", "epoch"]).reset_index(
            drop=True)
        a = key(mixture_resample(ray.data.from_arrow(t).repartition(1),
                                 "source", w, "doc_id").to_pandas())
        b = key(mixture_resample(ray.data.from_arrow(t).repartition(9),
                                 "source", w, "doc_id").to_pandas())
        assert a.equals(b)

    def test_plan_matches_resample(self, ray_session):
        import ray.data
        t = tbl(200)
        w = {"a": 2.5, "b": 0.25, "c": 0.0}
        plan = mixture_plan(ray.data.from_arrow(t).repartition(5), "source",
                            w, "doc_id").to_pandas().set_index("domain")
        out = mixture_resample(ray.data.from_arrow(t), "source", w,
                               "doc_id").to_pandas()
        for d in ("a", "b", "d"):
            assert plan.loc[d, "n_out"] == (out["source"] == d).sum()
        if "c" in plan.index:
            assert plan.loc["c", "n_out"] == 0
        assert plan.loc["a", "n_in"] == 50
        assert plan.loc["d", "realized_weight"] == 1.0
