"""Deterministic shuffled shard export — the training-data writer.

The last stage of every pretraining pipeline is a GLOBAL shuffle of the
cleaned corpus into fixed shard files (data loaders stream shards
round-robin; a biased order leaks curriculum into training). The reference
engine only persists its own index segments (SURVEY.md §2 S7/S8) — the
shuffled-corpus writer is an extension, and the one operator here that is
*allowed* to move every byte: a full shuffle is the semantics.

Determinism without a seed-synchronized RNG: each row's permutation key is

    key = fmix32( Horner31(CAST(id AS VARCHAR) || '#' || seed) )

(functions/polyhash.py arithmetic; fmix32 is Murmur3's public avalanche
finalizer — xor-shift/multiply only, so the whole key is SQL-replicable and
the gate value-checks the exact (shard, position) of every document.
A bare Horner·Knuth multiply is NOT enough here: near-sequential decimal
ids leave the product's residues mod a power-of-two shard count badly
skewed — measured 23..320 per 64 shards on 10k sequential ids — while the
finalizer avalanches them to 132..181). ``shard = key % num_shards``;
within a shard rows are ordered by ``(key, id)``. The same (id, seed) always
lands in the same place: re-running an export is idempotent, and two
exports with different seeds are independent permutations.

100 TB shape — two explicit phases, NO Ray Data sort/groupby all-to-all
(CLAUDE.md: the AllToAll sort dominated the 8-CPU build; this mirrors the
index build's scatter→finalize design):

* **scatter** — one streaming ``map_batches`` pass stamps ``__shard`` and
  writes hive-partitioned parquet runs (``_scatter/__shard=K/``) via
  ``write_parquet(partition_cols=...)``. Each task writes only its own
  rows; nothing is exchanged through the object store.
* **finalize** — one Ray task per shard reads that shard's runs, sorts by
  (key, id) and atomically publishes ``part-{k:05d}.parquet`` (tmp +
  ``os.replace``). Partitioning assumption (documented, same as the index
  build's finalize): ONE shard must fit a worker's heap — size
  ``num_shards`` ≥ corpus_bytes / worker_heap. Shards whose final file
  already exists are SKIPPED, so a failed export resumes where it died.

Returns a manifest (also written as ``manifest.json``) with per-shard row
counts/bytes so downstream loaders can plan without listing files.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from byzer_retrieval_ray.functions.polyhash import fmix32_np, poly_hash_np


def shuffle_keys(ids, seed: int) -> np.ndarray:
    """Permutation key per id: fmix32(Horner31(str(id) + '#' + seed)).

    uint64 array with values < 2^32. Mirrored in SQL by the oracle (CAST to
    VARCHAR, Horner fold over the salted string, xor-shift fmix chain).
    """
    salted = [f"{i}#{seed}" for i in ids]
    return fmix32_np(poly_hash_np(salted, bits=32))


def _stamp_shard(id_col: str, seed: int, num_shards: int):
    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keys = shuffle_keys(ids, seed)
        shard = (keys % np.uint64(num_shards)).astype(np.int32)
        return batch.append_column("__shard", pa.array(shard, pa.int32()))
    return f


def shuffled_export(ds, out_dir: str, id_col: str, seed: int = 0,
                    num_shards: int = 64,
                    finalize_num_cpus: float = 1.0) -> dict:
    """Globally shuffle ``ds`` into ``num_shards`` sorted parquet shards.

    ``id_col`` must be unique per row (ties in (key, id) would make the
    order among tied rows unspecified). Existing ``part-*.parquet`` files in
    ``out_dir`` are treated as completed shards and skipped (resume); the
    scatter directory is always rebuilt. Returns the manifest dict.
    """
    import ray

    scatter_dir = os.path.join(out_dir, "_scatter")
    if os.path.exists(scatter_dir):
        shutil.rmtree(scatter_dir)
    os.makedirs(out_dir, exist_ok=True)

    ds.map_batches(_stamp_shard(id_col, seed, num_shards),
                   batch_format="pyarrow") \
      .write_parquet(scatter_dir, partition_cols=["__shard"])

    @ray.remote(num_cpus=finalize_num_cpus)
    def finalize(k: int) -> dict:
        run_dir = os.path.join(scatter_dir, f"__shard={k}")
        final = os.path.join(out_dir, f"part-{k:05d}.parquet")
        if not os.path.isdir(run_dir):
            # empty shard: publish an empty marker only if nothing exists yet
            if not os.path.exists(final):
                return {"shard": k, "rows": 0, "bytes": 0, "skipped": False}
            t = pq.read_table(final)
            return {"shard": k, "rows": t.num_rows,
                    "bytes": os.path.getsize(final), "skipped": True}
        if os.path.exists(final):
            return {"shard": k, "rows": pq.read_table(final).num_rows,
                    "bytes": os.path.getsize(final), "skipped": True}
        t = pq.read_table(run_dir).drop_columns(["__shard"]) \
            if "__shard" in pq.read_schema(
                os.path.join(run_dir, os.listdir(run_dir)[0])).names \
            else pq.read_table(run_dir)
        ids = t[id_col].to_pylist()
        keys = shuffle_keys(ids, seed)
        # lexsort can't take object/string arrays — rank ids via np.unique
        _, id_codes = np.unique(np.asarray(ids, dtype=object),
                                return_inverse=True)
        order = np.lexsort((id_codes, keys))
        t = t.take(pa.array(order, pa.int64()))
        tmp = final + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, final)
        return {"shard": k, "rows": t.num_rows,
                "bytes": os.path.getsize(final), "skipped": False}

    stats = ray.get([finalize.remote(k) for k in range(num_shards)])
    manifest = {
        "seed": seed, "num_shards": num_shards, "id_col": id_col,
        "total_rows": int(sum(s["rows"] for s in stats)),
        "shards": sorted(stats, key=lambda s: s["shard"]),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    shutil.rmtree(scatter_dir, ignore_errors=True)
    return manifest


def read_export(out_dir: str):
    """Stream an export back in shard order (shard asc, in-file order)."""
    import ray.data

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    paths = [os.path.join(out_dir, f"part-{s['shard']:05d}.parquet")
             for s in manifest["shards"] if s["rows"] > 0]
    return ray.data.read_parquet(paths)
