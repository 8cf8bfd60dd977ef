"""Index manifest — the on-disk cluster/checkpoint state.

The reference keeps cluster state (tables, worker→node map) in the master actor's heap
and serializes it as ClusterInfo JSON (ClusterInfo.java:12-135, the checkpoint format
for restoreFromClusterInfo). Here state lives on disk from the start: a ``manifest.json``
per table records the schema, the published generation, per-partition lineage (inputs,
fingerprints, row counts, bytes, metrics) and tombstones. ``commit`` = atomically
publish a new manifest (reference M4); restore = re-read the manifest (M8/M9) — no
actor state to reconstruct.

Layout:

    <location>/<database>/<table>/
        manifest.json
        gen-<g>/
            stats.json                        # global collection stats (N, sum_ttf/field)
            docstore/part-<p>.parquet         # doc_id-sorted stored fields + norms
            postings/part-<r>.parquet         # term-range partition r (bucket-major rows)
            termstats/part-<r>.parquet        # (field, term, df, ttf) for range r
            tombstones-<n>.json               # sorted doc_id list (delete support)
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def table_dir(location: str, database: str, table: str) -> str:
    return os.path.join(location, database, table)


def gen_dir(location: str, database: str, table: str, generation: int) -> str:
    return os.path.join(table_dir(location, database, table), f"gen-{generation}")


def atomic_write_json(path: str, obj: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


class Manifest:
    """Mutable view of a table's manifest.json."""

    def __init__(self, location: str, database: str, table: str):
        self.location = location
        self.database = database
        self.table = table
        self.path = os.path.join(table_dir(location, database, table), "manifest.json")
        self.data: dict = {
            "database": database,
            "table": table,
            "schema": None,
            "status": "open",
            "generation": 0,        # 0 = nothing published yet
            "num_doc_parts": None,
            "key_field": None,
            "generations": {},
            "tombstone_files": [],
        }
        if os.path.exists(self.path):
            self.data = read_json(self.path)

    @property
    def exists(self) -> bool:
        return os.path.exists(self.path)

    def save(self) -> None:
        atomic_write_json(self.path, self.data)

    def gen_dir(self, generation: int | None = None) -> str:
        g = generation if generation is not None else self.data["generation"]
        return gen_dir(self.location, self.database, self.table, g)

    def publish(self, generation: int, gen_info: dict, mode: str = "replace",
                replaces: list[int] | None = None) -> None:
        """Commit: record the generation and atomically publish the manifest.

        mode="replace": the new generation supersedes all others (full build /
        compaction). mode="append": the new generation becomes a DELTA on top of
        the currently active ones (incremental upsert) — queries merge all of
        ``active_generations`` (ascending build order). ``replaces`` (append
        mode) additionally retires the listed generations in the same atomic
        publish — the delta-fold merge: the new generation carries their live
        docs, so [base, d1, d2, d3] becomes [base, merged] in one step.
        """
        self.data["generations"][str(generation)] = gen_info
        if mode == "append":
            active = [g for g in self.active_generations()
                      if not (replaces and g in replaces)]
            if generation not in active:
                active.append(generation)
            self.data["active_generations"] = active
        else:
            self.data["active_generations"] = [generation]
        self.data["generation"] = generation
        self.save()

    def active_generations(self) -> list[int]:
        """Generations queries serve from (legacy manifests: just the current)."""
        gens = self.data.get("active_generations")
        if gens:
            return [int(g) for g in gens]
        g = self.data.get("generation", 0)
        return [g] if g else []

    def current_gen_info(self) -> dict:
        g = self.data["generation"]
        if g == 0:
            raise RuntimeError(f"table {self.database}.{self.table} has no published generation")
        return self.data["generations"][str(g)]

    def add_tombstone_file(self, path: str) -> None:
        self.data["tombstone_files"].append(path)
        self.save()

    def clear_tombstones(self) -> None:
        self.data["tombstone_files"] = []
        self.save()
