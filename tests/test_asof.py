"""asof_join: backward/forward, tolerance, tie-breaking, join modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.asof import asof_join


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


LEFT = pa.table({"eid": pa.array([1, 2, 3, 4, 5], pa.int64()),
                 "u": ["a", "a", "b", "b", "c"],
                 "ts": pa.array([10, 25, 5, 30, 7], pa.int64())})
RIGHT = pa.table({"u": ["a", "a", "b", "z"],
                  "ts": pa.array([8, 25, 10, 1], pa.int64()),
                  "rid": pa.array([100, 101, 102, 103], pa.int64()),
                  "val": pa.array([1.5, 2.5, 3.5, 9.9])})


def run(ray_mod, **kw):
    out = asof_join(ray_mod.from_arrow(LEFT), ray_mod.from_arrow(RIGHT),
                    on="ts", by="u", **kw).to_pandas()
    return out.sort_values("eid").reset_index(drop=True)


class TestBackward:
    def test_matches_and_inclusive_boundary(self, ray_mod):
        out = run(ray_mod, right_cols=["rid"], tie_col="rid")
        got = dict(zip(out["eid"], out["rid"]))
        assert got[1] == 100        # ts 8 <= 10
        assert got[2] == 101        # inclusive: ts 25 == 25
        assert np.isnan(got[3])     # no b-purchase at/before ts 5
        assert got[4] == 102
        assert np.isnan(got[5])     # key 'c' absent on the right

    def test_left_columns_and_suffix(self, ray_mod):
        out = run(ray_mod, right_cols=["rid", "val", "ts"], tie_col="rid")
        assert list(out.columns) == ["eid", "u", "ts", "rid", "val", "ts_r"]

    def test_inner_drops_unmatched(self, ray_mod):
        out = run(ray_mod, right_cols=["rid"], how="inner", tie_col="rid")
        assert sorted(out["eid"]) == [1, 2, 4]

    def test_tolerance_nulls_far_matches(self, ray_mod):
        out = run(ray_mod, right_cols=["rid"], tolerance=3, how="inner",
                  tie_col="rid")
        assert sorted(out["eid"]) == [1, 2]   # eid 4 is 20 units away


class TestForward:
    def test_smallest_geq(self, ray_mod):
        out = run(ray_mod, right_cols=["rid"], direction="forward",
                  tie_col="rid")
        got = dict(zip(out["eid"], out["rid"]))
        assert got[1] == 101 and got[2] == 101 and got[3] == 102
        assert np.isnan(got[4]) and np.isnan(got[5])


class TestTies:
    def test_equal_on_takes_greatest_tie(self, ray_mod):
        import ray.data
        left = pa.table({"eid": pa.array([1], pa.int64()), "u": ["a"],
                         "ts": pa.array([10], pa.int64())})
        right = pa.table({"u": ["a", "a", "a"],
                          "ts": pa.array([10, 10, 9], pa.int64()),
                          "rid": pa.array([7, 9, 8], pa.int64())})
        out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                        on="ts", by="u", right_cols=["rid"],
                        tie_col="rid").to_pandas()
        assert out["rid"].tolist() == [9]


class TestShapes:
    def test_partitioning_invariance(self, ray_mod):
        rng = np.random.default_rng(11)
        n = 600
        left = pa.table({
            "eid": pa.array(np.arange(n), pa.int64()),
            "u": pa.array((rng.integers(0, 25, n)).astype(str)),
            "ts": pa.array(rng.integers(0, 1000, n), pa.int64())})
        right = pa.table({
            "u": pa.array((rng.integers(0, 25, 300)).astype(str)),
            "ts": pa.array(rng.integers(0, 1000, 300), pa.int64()),
            "rid": pa.array(np.arange(300), pa.int64())})
        outs = []
        for parts in (1, 7):
            o = asof_join(ray_mod.from_arrow(left).repartition(parts),
                          ray_mod.from_arrow(right).repartition(parts),
                          on="ts", by="u", right_cols=["rid", "ts"],
                          tie_col="rid").to_pandas()
            outs.append(o.sort_values("eid").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_matches_pandas_merge_asof(self, ray_mod):
        rng = np.random.default_rng(5)
        n = 400
        left = pd.DataFrame({"eid": np.arange(n),
                             "u": rng.integers(0, 10, n).astype(str),
                             "ts": rng.integers(0, 500, n).astype(np.int64)})
        right = pd.DataFrame({"u": rng.integers(0, 10, 200).astype(str),
                              "ts": rng.integers(0, 500, 200).astype(np.int64),
                              "rid": np.arange(200)})
        # pandas merge_asof needs unique (u, ts) on the right for a
        # deterministic compare; dedup keeping max rid = our tie rule
        right = right.sort_values(["u", "ts", "rid"]) \
                     .drop_duplicates(["u", "ts"], keep="last")
        out = asof_join(ray_mod.from_arrow(pa.Table.from_pandas(left)),
                        ray_mod.from_arrow(pa.Table.from_pandas(right)),
                        on="ts", by="u", right_cols=["rid"],
                        tie_col="rid").to_pandas() \
            .sort_values("eid").reset_index(drop=True)
        want = pd.merge_asof(left.sort_values("ts"),
                             right.sort_values("ts"),
                             on="ts", by="u", direction="backward") \
            .sort_values("eid").reset_index(drop=True)
        assert out["rid"].fillna(-1).tolist() == \
            want["rid"].fillna(-1).tolist()

    def test_empty_right(self, ray_mod):
        import ray.data
        empty = pa.table({"u": pa.array([], pa.string()),
                          "ts": pa.array([], pa.int64()),
                          "rid": pa.array([], pa.int64())})
        out = asof_join(ray_mod.from_arrow(LEFT), ray.data.from_arrow(empty),
                        on="ts", by="u", right_cols=["rid"],
                        tie_col="rid").to_pandas()
        assert len(out) == 5 and out["rid"].isna().all()

    def test_broadcast_path_identical(self, ray_mod):
        from byzer_retrieval_ray.ops.asof import asof_join_broadcast
        for kw in ({}, {"direction": "forward"}, {"tolerance": 3},
                   {"how": "inner"}):
            a = asof_join(ray_mod.from_arrow(LEFT), ray_mod.from_arrow(RIGHT),
                          on="ts", by="u", right_cols=["rid", "val"],
                          tie_col="rid", **kw).to_pandas() \
                .sort_values("eid").reset_index(drop=True)
            b = asof_join_broadcast(
                ray_mod.from_arrow(LEFT), ray_mod.from_arrow(RIGHT),
                on="ts", by="u", right_cols=["rid", "val"],
                tie_col="rid", **kw).to_pandas() \
                .sort_values("eid").reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b)

    def test_bad_args_raise(self, ray_mod):
        with pytest.raises(ValueError):
            asof_join(ray_mod.from_arrow(LEFT), ray_mod.from_arrow(RIGHT),
                      on="ts", by="u", right_cols=["rid"], direction="both")
        with pytest.raises(ValueError):
            asof_join(ray_mod.from_arrow(LEFT), ray_mod.from_arrow(RIGHT),
                      on="ts", by="u", right_cols=["nope"])
