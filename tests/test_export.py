"""Deterministic shuffled shard export (ops/export.py)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from byzer_retrieval_ray.ops.export import (read_export, shuffle_keys,
                                            shuffled_export)

N = 200
SEED = 42
SHARDS = 8


def _ds(parallelism=1):
    t = pa.table({
        "doc_id": pa.array(range(N), pa.int64()),
        "text": [f"doc number {i} body" for i in range(N)],
    })
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


def brute_layout():
    """{shard: [doc_id in order]} via the same key function, python-sorted."""
    keys = shuffle_keys(list(range(N)), SEED)
    out = {}
    for k in range(SHARDS):
        members = [(int(keys[i]), i) for i in range(N)
                   if keys[i] % SHARDS == k]
        out[k] = [i for _, i in sorted(members)]
    return out


def read_layout(out_dir):
    got = {}
    for k in range(SHARDS):
        p = os.path.join(out_dir, f"part-{k:05d}.parquet")
        got[k] = pq.read_table(p)["doc_id"].to_pylist() if os.path.exists(p) \
            else []
    return got


class TestExport:
    def test_layout_matches_brute_force(self, ray_session, tmp_path):
        out = str(tmp_path / "exp")
        m = shuffled_export(_ds(), out, "doc_id", seed=SEED,
                            num_shards=SHARDS)
        assert m["total_rows"] == N
        want = brute_layout()
        assert read_layout(out) == {k: v for k, v in want.items()}
        # payload columns survive, shard stamp does not
        t = pq.read_table(os.path.join(out, "part-00000.parquet"))
        assert t.column_names == ["doc_id", "text"]
        assert t["text"][0].as_py() == f"doc number {want[0][0]} body"
        # scatter dir cleaned up, manifest written
        assert not os.path.exists(os.path.join(out, "_scatter"))
        man = json.load(open(os.path.join(out, "manifest.json")))
        assert man["num_shards"] == SHARDS and man["seed"] == SEED

    def test_partition_invariance(self, ray_session, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        shuffled_export(_ds(), a, "doc_id", seed=SEED, num_shards=SHARDS)
        shuffled_export(_ds(parallelism=5), b, "doc_id", seed=SEED,
                        num_shards=SHARDS)
        assert read_layout(a) == read_layout(b)

    def test_seed_changes_permutation(self, ray_session, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        shuffled_export(_ds(), a, "doc_id", seed=1, num_shards=SHARDS)
        shuffled_export(_ds(), b, "doc_id", seed=2, num_shards=SHARDS)
        assert read_layout(a) != read_layout(b)

    def test_resume_skips_finished_shards(self, ray_session, tmp_path):
        out = str(tmp_path / "exp")
        shuffled_export(_ds(), out, "doc_id", seed=SEED, num_shards=SHARDS)
        # poison a finished shard: resume must NOT rewrite it
        p = os.path.join(out, "part-00003.parquet")
        sentinel = pq.read_table(p).slice(0, 1)
        pq.write_table(sentinel, p)
        m = shuffled_export(_ds(), out, "doc_id", seed=SEED,
                            num_shards=SHARDS)
        assert pq.read_table(p).num_rows == 1
        skipped = {s["shard"] for s in m["shards"] if s["skipped"]}
        assert skipped == set(range(SHARDS))

    def test_string_ids(self, ray_session, tmp_path):
        out = str(tmp_path / "exp")
        t = pa.table({"url": [f"https://ex.org/{i}" for i in range(50)],
                      "v": pa.array(range(50), pa.int64())})
        m = shuffled_export(ray.data.from_arrow(t), out, "url", seed=7,
                            num_shards=4)
        assert m["total_rows"] == 50
        keys = shuffle_keys([f"https://ex.org/{i}" for i in range(50)], 7)
        for k in range(4):
            p = os.path.join(out, f"part-{k:05d}.parquet")
            if not os.path.exists(p):
                continue
            got = pq.read_table(p)["url"].to_pylist()
            members = sorted(
                (int(keys[i]), f"https://ex.org/{i}") for i in range(50)
                if keys[i] % 4 == k)
            assert got == [u for _, u in members]

    def test_read_export_round_trip(self, ray_session, tmp_path):
        out = str(tmp_path / "exp")
        shuffled_export(_ds(), out, "doc_id", seed=SEED, num_shards=SHARDS)
        back = read_export(out).to_pandas()
        assert sorted(back["doc_id"]) == list(range(N))

    def test_key_distribution_spreads(self):
        keys = shuffle_keys(list(range(10_000)), 0)
        counts = np.bincount((keys % np.uint64(64)).astype(int), minlength=64)
        assert counts.min() > 0.5 * 10_000 / 64
        assert counts.max() < 2.0 * 10_000 / 64
