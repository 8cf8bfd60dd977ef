"""Tumbling-window aggregate op and term-partition skew balance."""

import numpy as np
import pandas as pd
import pytest


class TestTumblingWindow:
    def test_matches_pandas(self, ray_session):
        import ray.data
        from byzer_retrieval_ray.ops.windows import tumbling_window_agg

        ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                                   columns=["ts", "event_type", "value"])
        got = tumbling_window_agg(ds, "ts", "event_type", "value", 3600).to_pandas()
        got = got.sort_values(["key", "window_start"]).reset_index(drop=True)

        import pyarrow.parquet as pq
        df = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
        df["window_start"] = (df["ts"].astype("int64") // 10**6 // 3600) * 3600
        want = df.groupby(["event_type", "window_start"]).agg(
            n=("value", "size"), sum_v=("value", "sum"),
            min_v=("value", "min"), max_v=("value", "max")).reset_index()
        want = want.sort_values(["event_type", "window_start"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert list(got["key"]) == list(want["event_type"])
        np.testing.assert_array_equal(got["n"].to_numpy(), want["n"].to_numpy())
        np.testing.assert_allclose(got["sum_v"], want["sum_v"], rtol=1e-9)
        np.testing.assert_allclose(got["min_v"], want["min_v"], rtol=0)


class TestHoppingWindow:
    def test_hop_equal_window_degenerates_to_tumbling(self, ray_session):
        import ray.data
        from byzer_retrieval_ray.ops.windows import (hopping_window_agg,
                                                     tumbling_window_agg)
        src = "/root/testdata/sf0.001/events.parquet"
        cols = ["ts", "event_type", "value"]
        key = lambda df: df.sort_values(["key", "window_start"]) \
                           .reset_index(drop=True)
        a = key(tumbling_window_agg(
            ray.data.read_parquet(src, columns=cols),
            "ts", "event_type", "value", 3600).to_pandas())
        b = key(hopping_window_agg(
            ray.data.read_parquet(src, columns=cols),
            "ts", "event_type", "value", 3600, 3600).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    def test_matches_pandas_explode(self, ray_session):
        import ray.data
        import pyarrow.parquet as pq
        from byzer_retrieval_ray.ops.windows import hopping_window_agg
        src = "/root/testdata/sf0.001/events.parquet"
        got = hopping_window_agg(
            ray.data.read_parquet(src, columns=["ts", "event_type", "value"]),
            "ts", "event_type", "value", 1800, 600).to_pandas()
        got = got.sort_values(["key", "window_start"]).reset_index(drop=True)

        df = pq.read_table(src).to_pandas()
        df["s_max"] = (df["ts"].astype("int64") // 10**6 // 600) * 600
        parts = [df.assign(window_start=df["s_max"] - i * 600)
                 for i in range(3)]
        exp = pd.concat(parts)
        want = exp.groupby(["event_type", "window_start"]).agg(
            n=("value", "size"), sum_v=("value", "sum"),
            min_v=("value", "min"), max_v=("value", "max")).reset_index()
        want = want.sort_values(["event_type", "window_start"]) \
                   .reset_index(drop=True)
        assert list(got["key"]) == list(want["event_type"])
        np.testing.assert_array_equal(got["n"].to_numpy(), want["n"].to_numpy())
        np.testing.assert_allclose(got["sum_v"], want["sum_v"], rtol=1e-9)
        # every event appears in exactly window/hop = 3 windows
        assert got["n"].sum() == 3 * len(df)

    def test_bad_hop_raises(self, ray_session):
        import ray.data
        from byzer_retrieval_ray.ops.windows import hopping_window_agg
        with pytest.raises(ValueError):
            hopping_window_agg(
                ray.data.range(1), "ts", "k", "v", 1800, 700)


class TestSkewBalance:
    def test_term_partitions_byte_balanced(self, ray_session, tmp_path):
        """Sampled ttf-weighted boundaries must keep per-partition posting bytes
        within a reasonable band despite Zipf term skew."""
        from byzer_retrieval_ray import RetrievalCluster, TableSettings
        from byzer_retrieval_ray.corpus import webpages
        from byzer_retrieval_ray.index.build import build_index

        d = tmp_path / "corpus"
        webpages.write_corpus(str(d), 2000, rows_per_file=1000)
        loc = str(tmp_path / "idx")
        c = RetrievalCluster(loc)
        schema = ("st(field(url,string),field(warc_ts,date,sort),"
                  "field(html,binary,no_index),field(text,string,analyze),"
                  "field(lang,string))")
        c.create_table(TableSettings("web", "pages", schema, loc))
        info = build_index(str(d), c.manifest("web", "pages"), key_field="url",
                           version_field="warc_ts", extract=("html", "text"),
                           num_doc_parts=4, num_term_parts=8)
        sizes = np.array([m["posting_bytes"] for m in info["postings"].values()
                          if m["posting_bytes"] > 0], dtype=np.float64)
        assert sizes.size >= 6
        ratio = sizes.max() / np.median(sizes)
        assert ratio < 4.0, f"term partitions skewed: {sizes}"


class TestSessionize:
    def test_gap_splits_sessions(self, ray_session):
        import ray.data
        import numpy as np
        import pyarrow as pa
        from byzer_retrieval_ray.ops.windows import sessionize

        rows = []
        # user 1: two sessions (gap 100 > 60); user 2: one session; user 3: single event
        for t in (0.0, 10.0, 20.0, 120.0, 130.0):
            rows.append({"user_id": 1, "ts": t})
        for t in (5.0, 50.0):
            rows.append({"user_id": 2, "ts": t})
        rows.append({"user_id": 3, "ts": 7.0})
        ds = ray.data.from_items(rows)
        out = sessionize(ds, "ts", "user_id", gap_sec=60.0).to_pandas()
        out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
        got = [tuple(r) for r in out[["user_id", "session_id", "session_start",
                                      "session_end", "n_events"]].to_numpy()]
        assert got == [(1, 1, 0.0, 20.0, 3), (1, 2, 120.0, 130.0, 2),
                       (2, 1, 5.0, 50.0, 2), (3, 1, 7.0, 7.0, 1)]

    def test_partition_invariance(self, ray_session):
        import ray.data
        import numpy as np
        from byzer_retrieval_ray.ops.windows import sessionize

        rng = np.random.default_rng(3)
        rows = [{"user_id": int(rng.integers(0, 20)),
                 "ts": float(rng.integers(0, 10_000))} for _ in range(500)]
        outs = []
        for nb in (4, 64):
            ds = ray.data.from_items(rows)
            df = sessionize(ds, "ts", "user_id", gap_sec=300.0,
                            num_buckets=nb).to_pandas()
            outs.append(df.sort_values(["user_id", "session_id"])
                          .reset_index(drop=True))
        assert outs[0].equals(outs[1])
