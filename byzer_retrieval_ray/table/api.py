"""Table lifecycle API — the M1–M9 surface of the reference
(RetrievalMaster / LocalRetrievalMaster / RetrievalGateway), re-expressed over the
manifest + generation model: cluster state lives on disk (manifest.json per table), so
"restore" is just re-reading manifests (RetrievalGateway.java:90-137 semantics without
actor-pinning — index data is plain partitioned parquet on shared storage).

Serving modes:
  * local  — BucketSearcher objects in-process (tests, the driver correctness gate)
  * actors — one IndexSegmentActor per bucket (`ray.remote`), scatter-gather with the
    reference's 30 s deadline (RetrievalMaster.java:222, :322)

Mutations are generation/tombstone based:
  * build_*        → new generation, latest-version-wins dedup (upsert, M1)
  * delete_by_ids  → tombstone file with resolved doc_ids (M2)
  * delete_by_filter → same via filter resolution (M3)
  * commit         → manifest republish/fsync (M4; builds publish atomically already)
  * truncate       → drop generations, reset manifest (M5)
  * close / close_and_delete → status flip / directory removal (M6)
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from byzer_retrieval_ray.index import master as M
from byzer_retrieval_ray.index.build import build_index
from byzer_retrieval_ray.index.manifest import Manifest, atomic_write_json, read_json
from byzer_retrieval_ray.index.searcher import BucketSearcher, GenerationReader
from byzer_retrieval_ray.table.query import SearchQuery, TableSettings

QUERY_TIMEOUT_SEC = 30.0  # RetrievalMaster.java:222, :322


def _match_bucket_ids(man_data: dict, bucket: int, gen: int, q_dict: dict,
                      precision: str) -> np.ndarray:
    """export_matches stage 1 (runs as a Ray task): one bucket's FULL match
    set for a keyword query — exact TAAT, unbounded limit, tombstone-aware.
    The sorted id array stays in the object store; docstore read tasks probe
    it with np.isin, so the driver never holds match ids."""
    s = BucketSearcher(man_data, bucket, gen=gen)
    ids, _ = s.search_keyword(SearchQuery.from_dict(q_dict),
                              precision=precision, algorithm="taat")
    return np.sort(np.asarray(ids, dtype=np.int64))


def _coordinated(fn):
    """Route this read endpoint through the coordinator tier when one is
    active for (database, table): the call's actor-mode scatter + fold
    runs inside a coordinator process (index/coordinator.py) and the
    driver's only per-query work is one RPC — K coordinators give K
    parallel folds where the driver's GIL allows ~1. Transparent: the
    coordinator executes this very method on its own cluster handle, so
    results are byte-identical to driver-side serving."""
    import functools

    @functools.wraps(fn)
    def wrap(self, database, table, *args, **kwargs):
        coords = getattr(self, "_coordinators", {}).get((database, table))
        if coords:
            import ray
            i = next(self._coord_rr) % len(coords)
            return ray.get(
                coords[i].call.remote(fn.__name__, database, table,
                                      *args, **kwargs),
                timeout=QUERY_TIMEOUT_SEC)
        return fn(self, database, table, *args, **kwargs)
    return wrap


class RetrievalCluster:
    """A named retrieval cluster rooted at a storage location."""

    def __init__(self, location: str, name: str = "cluster"):
        import itertools
        self.location = location
        self.name = name
        self._manifests: dict[tuple[str, str], Manifest] = {}
        self._local_searchers: dict[tuple[str, str], list[BucketSearcher]] = {}
        self._fed_searchers: dict[tuple[str, tuple], list] = {}
        self._actors: dict[tuple[str, str], list] = {}
        self._coordinators: dict[tuple[str, str], list] = {}
        self._coord_rr = itertools.count()
        os.makedirs(location, exist_ok=True)

    # ------------- lifecycle (M7/M8/M9) -------------

    def create_table(self, settings: TableSettings) -> bool:
        m = Manifest(self.location, settings.database, settings.table)
        m.data["schema"] = settings.schema
        m.data["status"] = "open"
        m.save()
        self._manifests[(settings.database, settings.table)] = m
        return True

    def manifest(self, database: str, table: str) -> Manifest:
        key = (database, table)
        if key not in self._manifests:
            m = Manifest(self.location, database, table)
            if not m.exists:
                raise KeyError(f"table {database}.{table} does not exist")
            self._manifests[key] = m
        return self._manifests[key]

    def cluster_info(self) -> dict:
        """Serialized cluster metadata — the checkpoint format (M9)."""
        tables = []
        if os.path.isdir(self.location):
            for db in sorted(os.listdir(self.location)):
                dbdir = os.path.join(self.location, db)
                if not os.path.isdir(dbdir):
                    continue
                for tbl in sorted(os.listdir(dbdir)):
                    if os.path.exists(os.path.join(dbdir, tbl, "manifest.json")):
                        m = Manifest(self.location, db, tbl)
                        tables.append({
                            "database": db, "table": tbl,
                            "schema": m.data["schema"],
                            "status": m.data["status"],
                            "generation": m.data["generation"],
                        })
        return {"name": self.name, "location": self.location, "tables": tables}

    @classmethod
    def restore_from_cluster_info(cls, info: dict) -> "RetrievalCluster":
        """M8: state is on disk; restore = point a new cluster at the location."""
        return cls(info["location"], info.get("name", "cluster"))

    # ------------- ingestion / build (S1–S4, M1) -------------

    def build_from_parquet(self, database: str, table: str, source,
                           key_field: str, version_field: str | None = None,
                           extract: tuple[str, str] | None = None,
                           num_doc_parts: int = 8, num_term_parts: int = 8,
                           num_serving_buckets: int | None = None) -> dict:
        m = self.manifest(database, table)
        info = build_index(source, m, key_field=key_field, version_field=version_field,
                           extract=extract, num_doc_parts=num_doc_parts,
                           num_term_parts=num_term_parts,
                           num_serving_buckets=num_serving_buckets)
        # Tombstone doc_ids are generation-scoped (stride ids = part<<40|rank): a
        # stale id applied to the new generation would delete an unrelated new doc
        # and let the originally-deleted key resurrect. A full rebuild from a fresh
        # source replaces the corpus wholesale, so clear them on publish
        # (build_from_local instead folds them in before clearing).
        m.clear_tombstones()
        self._invalidate(database, table)
        return info

    def build_from_local(self, database: str, table: str, docs: list[dict],
                         key_field: str = "_id", num_doc_parts: int = 4,
                         num_term_parts: int = 4, mode: str = "delta",
                         max_delta_generations: int | None = None) -> bool:
        """S3/S4 equivalent: inline records, upserted by key (reference M1,
        RetrievalWorker.java:243-270).

        mode="delta" (default, the scale path): the batch is indexed as a small
        DELTA generation (only the new docs are read/tokenized/written) and the
        replaced keys' doc_ids in older generations are tombstoned — a 100-doc
        upsert into a 10^9-doc table touches only delta files plus one narrow
        key-resolution pass. Queries merge all active generations; ``compact()``
        folds them back into one. mode="rebuild" forces the full
        (previous ∪ new) regeneration.

        ``max_delta_generations=N`` is the tiered-merge trigger (Lucene runs
        background segment merges; deltas are our segments): when the publish
        leaves more than N delta generations active, ``compact_deltas()`` folds
        them into one at O(delta bytes) cost, keeping per-query generation
        fan-out bounded under a steady upsert stream.
        """
        import ray.data

        m = self.manifest(database, table)
        for d in docs:
            if key_field not in d:
                raise ValueError(
                    f"build: a document misses the key field {key_field!r} "
                    "(reference throws, RetrievalMaster.java:116-122)")
        # within-batch upsert order: later occurrence of a key wins
        new_ds = ray.data.from_items(
            [{**d, "__upsert_seq": i} for i, d in enumerate(docs)])
        if m.data["generation"] == 0:
            build_index(new_ds, m, key_field=key_field, version_field="__upsert_seq",
                        num_doc_parts=num_doc_parts, num_term_parts=num_term_parts)
        elif mode == "delta":
            # hide every replaced key in the existing generations, then publish
            # the new docs as an append-only delta generation
            self._tombstone_keys(m, key_field, [d[key_field] for d in docs])
            build_index(new_ds, m, key_field=key_field, version_field="__upsert_seq",
                        num_doc_parts=num_doc_parts, num_term_parts=num_term_parts,
                        publish_mode="append")
        else:
            old = self.scan_table(database, table)

            def carry_forward(t: pa.Table) -> pa.Table:
                drop = [c for c in t.column_names if c == "doc_id"]
                if key_field == "doc_id" and drop:
                    drop = []
                if drop:
                    t = t.drop_columns(drop)
                return t.append_column("__upsert_seq",
                                       pa.array([-1] * len(t), pa.int64()))

            source = old.map_batches(carry_forward, batch_format="pyarrow") \
                        .union(new_ds)
            build_index(source, m, key_field=key_field, version_field="__upsert_seq",
                        num_doc_parts=num_doc_parts, num_term_parts=num_term_parts)
            m.clear_tombstones()   # baked into the new generation
        self._invalidate(database, table)
        if max_delta_generations is not None and \
                len(m.active_generations()) - 1 > max_delta_generations:
            self.compact_deltas(database, table)
        return True

    def compact(self, database: str, table: str, num_doc_parts: int | None = None,
                num_term_parts: int | None = None) -> dict:
        """Fold all active generations (minus tombstones) into one fresh
        generation — the Lucene forceMerge equivalent. Resets the delta id
        namespace and removes tombstoned docs from the collection statistics."""
        m = self.manifest(database, table)
        gr = GenerationReader(m.data)
        key_field = gr.key_field
        old = self.scan_table(database, table)

        def carry(t: pa.Table) -> pa.Table:
            if "doc_id" in t.column_names and key_field != "doc_id":
                t = t.drop_columns(["doc_id"])
            return t

        info = build_index(old.map_batches(carry, batch_format="pyarrow"), m,
                           key_field=key_field,
                           num_doc_parts=num_doc_parts or gr.num_doc_parts,
                           num_term_parts=num_term_parts or gr.info["num_term_parts"])
        m.clear_tombstones()
        self._invalidate(database, table)
        return info

    def compact_deltas(self, database: str, table: str,
                       num_doc_parts: int | None = None,
                       num_term_parts: int | None = None) -> dict | None:
        """Tiered merge: fold the DELTA generations into ONE new delta
        generation, leaving the base untouched — the Lucene
        TieredMergePolicy analog for the generation model (small segments
        merge together; the big one is left alone). [base, d1..dN] becomes
        [base, merged] at O(delta bytes) cost, vs ``compact()``'s O(corpus)
        forceMerge.

        Semantics (Lucene segment-merge parity): docs tombstoned WITHIN the
        folded deltas (a key upserted twice across delta batches) are
        physically dropped, so they leave the collection statistics at fold
        time — exactly when Lucene merges drop deletes. With no cross-delta
        tombstones, folding is score-invariant (the merged generation's
        stats equal the sum of the folded ones; StatsView sums active gens).
        Base-generation tombstones are preserved verbatim. Gen numbers are
        not reclaimed (the delta id namespace resets only on ``compact()``).

        Returns the new gen_info, or None when there is at most one active
        generation (nothing to fold)."""
        m = self.manifest(database, table)
        gens = m.active_generations()
        if len(gens) <= 1:
            return None
        base, deltas = gens[0], gens[1:]
        gr = GenerationReader(m.data, deltas[-1])
        key_field = gr.key_field
        old = self.scan_table(database, table, generations=deltas)

        def carry(t: pa.Table) -> pa.Table:
            if "doc_id" in t.column_names and key_field != "doc_id":
                t = t.drop_columns(["doc_id"])
            return t

        info = build_index(old.map_batches(carry, batch_format="pyarrow"), m,
                           key_field=key_field,
                           num_doc_parts=num_doc_parts or gr.num_doc_parts,
                           num_term_parts=num_term_parts or gr.info["num_term_parts"],
                           publish_mode="append", replace_generations=deltas)
        # retired generations' tombstones are dead weight (searchers apply them
        # per generation, and those generations no longer serve) — drop the
        # files; a crash before this point leaves them harmlessly stale
        keep = []
        for path in m.data.get("tombstone_files", []):
            try:
                entry_gen = read_json(path).get("gen")
            except OSError:
                continue
            if entry_gen in deltas:
                try:
                    os.unlink(path)
                except OSError:
                    pass
            else:
                keep.append(path)
        m.data["tombstone_files"] = keep
        m.save()
        self._invalidate(database, table)
        return info

    def build_from_jsonl(self, database: str, table: str, data_location: str,
                         key_field: str = "_id", **kw) -> bool:
        """S1 equivalent (RetrievalWorker.java:176-211): index a directory of JSONL.

        Unlike the reference — where every worker reads the WHOLE directory
        ("just for test") — read_json shards the files into blocks for free."""
        import ray.data

        self.build_from_parquet(database, table, ray.data.read_json(data_location),
                                key_field=key_field, **kw)
        return True

    def scan_table(self, database: str, table: str,
                   columns: list[str] | None = None,
                   generations: list[int] | None = None):
        """S5/S6 equivalent: full scan of all stored docs as a streaming Dataset
        (reference: iterateAllDocs / the Arrow batch-export server). Unions every
        active generation with its own (generation-scoped) tombstones applied, so
        each live key appears exactly once. ``columns`` prunes the parquet read
        (a 2-column export of a wide table reads 2 columns, not the payloads);
        doc_id is read when tombstones must be applied but only returned if
        requested. ``generations`` restricts the scan to a subset of the active
        generations (the delta-fold reads only the deltas)."""
        import numpy as np
        import ray.data

        m = self.manifest(database, table)
        ds = None
        scan_gens = m.active_generations()
        if generations is not None:
            scan_gens = [g for g in scan_gens if g in generations]
        for g in scan_gens:
            gr = GenerationReader(m.data, g)
            paths = [p for b in gr.buckets() for p in gr.docstore_paths(b)]
            paths = [p for p in paths if p and os.path.exists(p)]
            if not paths:
                continue
            read_cols = None
            if columns is not None:
                read_cols = list(dict.fromkeys(
                    list(columns) + (["doc_id"] if gr.tombstones().size else [])))
            sub = ray.data.read_parquet(paths, columns=read_cols)
            drop = [c for c in sub.schema().names if c.startswith("__")]
            if columns is not None:
                drop += [c for c in sub.schema().names
                         if c not in columns and not c.startswith("__")
                         and c != "doc_id"]
            if drop:
                sub = sub.drop_columns(drop)
            ts = gr.tombstones()
            if ts.size:
                keep_doc_id = columns is None or "doc_id" in columns

                def drop_deleted(t: pa.Table, ts=ts, keep_id=keep_doc_id) -> pa.Table:
                    keep = ~np.isin(t["doc_id"].to_numpy(), ts)
                    out = t.filter(pa.array(keep))
                    return out if keep_id else out.drop_columns(["doc_id"])

                sub = sub.map_batches(drop_deleted, batch_format="pyarrow")
            ds = sub if ds is None else ds.union(sub)
        if ds is None:
            raise RuntimeError(f"table {database}.{table} has no published generation")
        return ds

    def export_matches(self, database: str, table: str, query,
                       columns: list[str] | None = None,
                       precision: str = "float32"):
        """Stream EVERY doc matching a keyword query out as a
        ``ray.data.Dataset`` (the search → training-data bridge; the
        reference's S5 export is full-scan only: extension). Two stages:

        1. one Ray task per (generation, bucket) builds that bucket's
           searcher and leaves its matched doc_ids IN THE OBJECT STORE
           (exact TAAT, unbounded limit, tombstone-aware) — match ids never
           land on the driver;
        2. a streaming Dataset over the bucket's docstore parquet filters
           each batch against its bucket's id set (np.isin membership),
           column-pruned like scan_table.

        Downstream consumers keep streaming (write_parquet, map_batches,
        iter_batches) — nothing materializes the match set in one place.
        Keyword recall only (filters supported); ``columns`` prunes the
        parquet read (doc_id is always read for the membership probe, only
        returned if requested)."""
        import ray
        import ray.data

        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("export_matches takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("export_matches is keyword-only")
        from dataclasses import replace
        qd = dict(replace(q, limit=int(1 << 62), search_after=None).__dict__)
        m = self.manifest(database, table)
        if not m.active_generations():
            GenerationReader(m.data)     # raises the standard no-gen error
        man_ref = ray.put(m.data)
        match_task = ray.remote(num_cpus=1)(_match_bucket_ids)
        ds = None
        for g, b in self._gen_buckets(m):
            gr = GenerationReader(m.data, g)
            paths = [p for p in gr.docstore_paths(b)
                     if p and os.path.exists(p)]
            if not paths:
                continue
            ids_ref = match_task.remote(man_ref, b, g, qd, precision)
            read_cols = None
            if columns is not None:
                read_cols = list(dict.fromkeys(["doc_id"] + list(columns)))
            sub = ray.data.read_parquet(paths, columns=read_cols)
            keep_id = columns is None or "doc_id" in columns

            def keep_matches(t: pa.Table, ids_ref=ids_ref,
                             keep_id=keep_id) -> pa.Table:
                ids = ray.get(ids_ref)    # zero-copy local after first fetch
                keep = np.isin(t["doc_id"].to_numpy(), ids)
                out = t.filter(pa.array(keep))
                drop = [c for c in out.column_names if c.startswith("__")]
                if not keep_id:
                    drop.append("doc_id")
                return out.drop_columns(drop) if drop else out

            sub = sub.map_batches(keep_matches, batch_format="pyarrow")
            ds = sub if ds is None else ds.union(sub)
        if ds is None:
            raise RuntimeError(
                f"table {database}.{table} has no published generation")
        return ds

    def commit(self, database: str, table: str) -> bool:
        """M4: builds already publish atomically; commit re-saves the manifest."""
        self.manifest(database, table).save()
        return True

    # ------------- mutations (M2/M3/M5/M6) -------------

    def delete_by_ids(self, database: str, table: str, ids: list) -> bool:
        """M2: resolve keys → doc_ids with a NARROW pass over the docstores
        (key + doc_id columns only) and tombstone the hits — never loads stored
        payloads, distributed via Ray Data above a small-table threshold."""
        m = self.manifest(database, table)
        gr = GenerationReader(m.data)
        self._tombstone_keys(m, gr.key_field, ids)
        return True

    def delete_by_filter(self, database: str, table: str, condition: dict) -> bool:
        """M3: condition is a {field: value, ...} map — AND of exact matches
        (RetrievalWorker.java:103-124). Resolution is a column-pruned pass over
        each generation's docstore (filter fields + doc_id only)."""
        m = self.manifest(database, table)
        tree = {"and": [{"field": k, "value": v} for k, v in condition.items()]}
        from byzer_retrieval_ray.functions import filters as F

        gr0 = GenerationReader(m.data)
        analyzed = gr0.analyzed
        cols = sorted({"doc_id", *condition.keys()})

        def find(t: pa.Table) -> pa.Table:
            mask = F.evaluate(t, tree, analyzed=analyzed)
            return pa.table({"doc_id": t.filter(mask)["doc_id"]})

        by_gen = self._scan_doc_ids(m, cols, find)
        return self._append_tombstones(m, by_gen)

    def _tombstone_keys(self, m: Manifest, key_field: str, keys: list) -> None:
        """Resolve key → doc_id across every active generation's docstore (a
        NARROW pass: key + doc_id columns only, row-group pruned where the key is
        the sort column) and tombstone the hits, generation-scoped."""
        karr = np.asarray(keys)

        def find(t: pa.Table) -> pa.Table:
            kk = t[key_field].to_numpy(zero_copy_only=False)
            mask = np.isin(kk, karr.astype(kk.dtype, copy=False))
            return pa.table({"doc_id": t["doc_id"].filter(pa.array(mask))})

        by_gen = self._scan_doc_ids(m, ["doc_id", key_field], find)
        self._append_tombstones(m, by_gen)

    # docstore file count above which key/filter resolution goes through a
    # distributed Ray Data pass instead of driver-side parquet reads
    _RESOLVE_RAY_THRESHOLD = 16

    def _scan_doc_ids(self, m: Manifest, columns: list[str], find) -> dict[int, list[int]]:
        """Per-generation doc_ids selected by ``find`` over a column-pruned
        docstore scan. Small tables read on the driver; larger ones run the same
        kernel as a Ray Data ``map_batches`` pass (the 100 TB shape: the driver
        only ever sees the matching ids)."""
        by_gen: dict[int, list[int]] = {}
        for g in m.active_generations():
            gr = GenerationReader(m.data, g)
            paths = [p for b in gr.buckets() for p in gr.docstore_paths(b)]
            paths = [p for p in paths if os.path.exists(p)]
            if not paths:
                continue
            cols = [c for c in columns]
            if len(paths) >= self._RESOLVE_RAY_THRESHOLD:
                import ray.data
                ds = ray.data.read_parquet(paths, columns=cols)
                hits = ds.map_batches(find, batch_format="pyarrow").to_pandas()
                ids = hits["doc_id"].tolist() if "doc_id" in hits.columns else []
            else:
                ids = []
                for p in paths:
                    t = pq.read_table(p, columns=cols)
                    ids.extend(find(t)["doc_id"].to_pylist())
            if ids:
                by_gen[g] = ids
        return by_gen

    def _append_tombstones(self, m: Manifest, by_gen: dict[int, list[int]]) -> bool:
        """Record doc_id tombstones, one file per affected generation (doc_ids
        are generation-scoped)."""
        wrote = False
        for g, doc_ids in sorted(by_gen.items()):
            if not doc_ids:
                continue
            n = len(m.data.get("tombstone_files", []))
            path = os.path.join(m.gen_dir(g), f"tombstones-{n}.json")
            atomic_write_json(path, {"doc_ids": sorted(set(int(d) for d in doc_ids)),
                                     "gen": g, "created_at": time.time()})
            m.add_tombstone_file(path)
            wrote = True
        if wrote:
            self._invalidate(m.database, m.table)
        return True

    def truncate(self, database: str, table: str) -> bool:
        m = self.manifest(database, table)
        for g in list(m.data["generations"]):
            gd = m.gen_dir(int(g))
            if os.path.isdir(gd):
                shutil.rmtree(gd)
        m.data["generations"] = {}
        m.data["generation"] = 0
        m.data["active_generations"] = []
        m.data["tombstone_files"] = []
        m.save()
        self._invalidate(database, table)
        return True

    def vacuum(self, database: str, table: str) -> dict:
        """Disk GC: delete the generation directories a publish retired (full
        rebuilds, ``compact()`` and ``compact_deltas()`` leave them in place so
        in-flight readers finish) and prune their manifest entries — the analog
        of Lucene deleting merged-away segment files once readers release.

        Safe once serving actors have re-polled the manifest (NRT poll default
        1 s): a vacuum racing an actor that has not yet adopted the current
        publish can pull files out from under it, exactly like deleting Lucene
        segments under an open reader — call it from the writer process after
        publishes settle, not on a hot loop."""
        m = self.manifest(database, table)
        active = set(m.active_generations())
        freed = 0
        removed = []
        for g in sorted(int(g) for g in m.data["generations"]):
            if g in active:
                continue
            gd = m.gen_dir(g)
            if os.path.isdir(gd):
                freed += sum(os.path.getsize(os.path.join(r, f))
                             for r, _, fs in os.walk(gd) for f in fs)
                shutil.rmtree(gd, ignore_errors=True)
            m.data["generations"].pop(str(g), None)
            removed.append(g)
        if removed:
            m.save()
        return {"removed_generations": removed, "bytes_freed": freed}

    def close(self, database: str, table: str) -> bool:
        m = self.manifest(database, table)
        m.data["status"] = "close"
        m.save()
        self._invalidate(database, table)
        return True

    def close_and_delete_file(self, database: str, table: str) -> bool:
        self.close(database, table)
        tdir = os.path.dirname(self.manifest(database, table).path)
        shutil.rmtree(tdir, ignore_errors=True)
        self._manifests.pop((database, table), None)
        return True

    def truncate_clear(self):
        self._local_searchers.clear()

    # ------------- query (Q1–Q9) -------------

    def activate(self, database: str, table: str, mode: str = "actors",
                 preload: bool = False, num_actors: int | None = None,
                 nrt_poll_sec: float = 1.0,
                 node_ips: list[str] | None = None,
                 num_coordinators: int = 0,
                 num_replicas: int = 1) -> int:
        """Spawn the serving actor pool. Actors are sized to the CLUSTER (≈ one per
        core by default), each owning a contiguous slice of the table's serving
        buckets — storage partitioning (chosen for build balance, possibly
        thousands of buckets at 10^12 docs) is decoupled from pool size.

        The per-actor CPU reservation is sized so the whole pool always schedules
        (a 1.0 reservation each would leave actors pending and queries timing
        out when the pool is larger than the node).

        ``node_ips`` pins actor i to node_ips[i % len] via Ray's built-in
        ``node:<ip>`` resource — the reference's node-locality scheme for
        node-local index dirs (RetrievalMaster.java:54-56); unnecessary on a
        shared filesystem.

        ``num_coordinators`` > 0 additionally spawns that many query
        coordinators (index/coordinator.py) — slim actors that run the
        scatter-gather-FOLD of every read endpoint off the driver, the
        reference's virtual-thread master shape (RetrievalMaster.java:
        290-324). One Python driver folds ~1 query at a time (GIL); K
        coordinators fold K. Size to the expected concurrent-client
        count, not the data.

        ``num_replicas`` > 1 spawns that many INDEPENDENT segment pools
        over the same buckets (the elasticsearch replica shape): every
        query still scatters to one whole pool, so a single pool saturates
        at ~1/per-actor-work QPS no matter how many actors it has —
        replicas multiply that ceiling. Coordinators round-robin across
        pools (coordinator i owns pool i mod R); the driver's own fold
        path uses pool 0. Replicas share nothing but the on-disk index."""
        import ray

        from byzer_retrieval_ray.index.actors import make_segment_actor

        m = self.manifest(database, table)
        pairs = self._gen_buckets(m)
        total_cpus = ray.cluster_resources().get("CPU", 8)
        n_rep = max(1, int(num_replicas))
        n_actors = num_actors or min(len(pairs), max(1, int(total_cpus)))
        # keep ≥1 whole CPU outside the serving reservation: NRT delta
        # builds submit 1-CPU tasks while the pool is live — a pool sized
        # to total×0.8 on a small node starves them into a permanent pend
        # (observed: 8 actors × 0.4 on a 4-CPU box deadlocked a rebuild)
        per_actor = min(1.0, round(
            max((total_cpus * 0.8 - 1.0) / max(n_actors * n_rep, 1),
                0.05), 2))
        groups = [(i, pairs[i::n_actors]) for i in range(n_actors)]
        groups = [(i, g) for i, g in groups if g]
        pools = [[make_segment_actor(m.data, g, num_cpus=per_actor,
                                     location=self.location,
                                     poll_sec=nrt_poll_sec,
                                     assignment=(i, n_actors),
                                     node_ip=(node_ips[i % len(node_ips)]
                                              if node_ips else None))
                  for i, g in groups]
                 for _ in range(n_rep)]
        self._actor_pools = getattr(self, "_actor_pools", {})
        self._actor_pools[(database, table)] = pools
        self._actors[(database, table)] = pools[0]
        self._actor_buckets = getattr(self, "_actor_buckets", {})
        self._actor_buckets[(database, table)] = pairs
        if preload:
            ray.get([a.preload.remote() for p in pools for a in p])
            # warm the suggest dictionary caches with the same round-robin
            # part assignment the suggest scatter uses
            paths = self._termstats_paths(database, table)
            if paths:
                warm = []
                for p in pools:
                    assign = [paths[i::len(p)] for i in range(len(p))]
                    warm += [a.warm_termstats.remote(assign[i])
                             for i, a in enumerate(p) if assign[i]]
                ray.get(warm)
        if num_coordinators > 0:
            self._respawn_coordinators(database, table,
                                       int(num_coordinators))
        return len(pools[0])

    @staticmethod
    def _gen_buckets(m: Manifest) -> list[tuple[int, int]]:
        """(generation, bucket) serving pairs over every active generation."""
        pairs: list[tuple[int, int]] = []
        for g in m.active_generations():
            gr = GenerationReader(m.data, g)
            pairs.extend((g, b) for b in gr.buckets())
        return pairs

    def deactivate(self, database: str, table: str) -> None:
        import ray
        key = (database, table)
        for c in self._coordinators.pop(key, []):
            ray.kill(c)
        pools = getattr(self, "_actor_pools", {}).pop(key, None)
        primary = self._actors.pop(key, [])
        for a in (a for p in pools for a in p) if pools else primary:
            ray.kill(a)

    def _searchers(self, database: str, table: str) -> list[BucketSearcher]:
        key = (database, table)
        if key not in self._local_searchers:
            m = self.manifest(database, table)
            if m.data.get("status") == "close":
                raise RuntimeError(f"table {database}.{table} is closed (M6)")
            if not m.active_generations():
                # raises the no-generation error with the standard message
                GenerationReader(m.data)
            self._local_searchers[key] = [BucketSearcher(m.data, b, gen=g)
                                          for g, b in self._gen_buckets(m)]
        return self._local_searchers[key]

    def _invalidate(self, database: str, table: str) -> None:
        self._local_searchers.pop((database, table), None)
        # federated caches fold this table's stats — drop any that include it
        for fk in [k for k in self._fed_searchers
                   if k[0] == database and table in k[1]]:
            self._fed_searchers.pop(fk, None)
        key = (database, table)
        if key in self._actors:
            import ray
            n_coord = len(self._coordinators.get(key, []))
            pools = getattr(self, "_actor_pools", {}).get(
                key, [self._actors[key]])
            m = self.manifest(database, table)
            try:
                GenerationReader(m.data)
                buckets = self._gen_buckets(m)
            except RuntimeError:
                self.deactivate(database, table)
                return
            if buckets != getattr(self, "_actor_buckets", {}).get(key):
                # generation changed the serving bucket set → respawn the pool
                self.deactivate(database, table)
                self.activate(database, table, num_coordinators=n_coord,
                              num_replicas=len(pools))
            else:
                ray.get([a.reload.remote(m.data)
                         for p in pools for a in p])
                if n_coord:
                    # coordinators cache manifests/searcher state in their
                    # inner cluster — respawn them against the live pools
                    # (slim actors, construction is cheap)
                    self._respawn_coordinators(database, table, n_coord)

    def add_coordinators(self, database: str, table: str, n: int) -> int:
        """(Re)spawn the query-coordinator tier for an ACTIVATED table —
        same effect as ``activate(..., num_coordinators=n)`` without
        touching the segment pool. Returns the coordinator count."""
        if (database, table) not in self._actors:
            raise RuntimeError(
                f"table {database}.{table} is not activated — coordinators "
                "front the segment-actor pool")
        self._respawn_coordinators(database, table, int(n))
        return len(self._coordinators.get((database, table), []))

    def _respawn_coordinators(self, database: str, table: str,
                              n: int) -> None:
        import ray

        from byzer_retrieval_ray.index.coordinator import make_coordinator_actor
        for c in self._coordinators.pop((database, table), []):
            ray.kill(c)
        pools = getattr(self, "_actor_pools", {}).get(
            (database, table)) or [self._actors.get((database, table), [])]
        if not pools[0] or n <= 0:
            return
        total_cpus = ray.cluster_resources().get("CPU", 8)
        per_coord = min(0.5, round(max(total_cpus * 0.1 / n, 0.01), 2))
        # coordinator i fronts replica pool i mod R — replicas multiply the
        # pool-saturation QPS ceiling; each coordinator folds over ONE pool
        self._coordinators[(database, table)] = [
            make_coordinator_actor(self.location, database, table,
                                   pools[i % len(pools)],
                                   num_cpus=per_coord)
            for i in range(int(n))]

    @_coordinated
    def search(self, database: str, table: str, queries,
               precision: str = "float32", algorithm: str = "bmw",
               vector_algorithm: str = "brute", nprobe: int = 4,
               n_centroids: int = 16, ef: int = 100,
               fuzzy_transpositions: bool = True) -> list[list[dict]]:
        """Q1/Q2/Q5–Q8: list of SearchQuery (dicts or dataclasses) → per-query ranked
        docs with _score injected (reference S7 result shape).

        ``vector_algorithm="ivf"`` serves the vector recall from each bucket's
        coarse IVF index (nprobe/n_centroids knobs; nprobe=n_centroids is
        exact); ``"hnsw"`` walks each bucket's HNSW graph with beam ``ef``
        (ef >= bucket size is exact; a filter rides into the traversal).

        Sloppy-phrase caveat (documented divergence from Lucene's
        SloppyPhraseMatcher, frozen by golden test): ``"a b"~N`` matches
        IN-ORDER alignments only BY DEFAULT — a doc containing only the
        transposed ``b a`` does not match, where Lucene would at cost 2 per
        transposed adjacent pair; window enumeration also differs for
        phrases with repeated terms. ``SearchQuery(slop_in_order=False)``
        opts into Lucene SloppyPhraseMatcher parity (out-of-order matches,
        stream-enumerated windows) for phrases with non-repeating terms.
        Exact phrases (~0) and all other clause types are Lucene-faithful
        either way.

        ``SearchQuery(offset=N)`` (the elasticsearch ``from`` shape) pages
        EVERY query kind incl. hybrid RRF: shards ship their top
        (offset + limit) and the fused/merged ranking is sliced. Keyword
        and vector pages tile the identical order a deeper single query
        produces; hybrid-RRF pages slice the fused ranking computed at
        window offset+limit (ES rank_window_size semantics — RRF ranks
        shift with recall depth, see SearchQuery.offset)."""
        from dataclasses import replace as _replace

        qs = self._as_queries(database, table, queries)
        offs = [max(0, int(getattr(q, "offset", 0) or 0)) for q in qs]
        for q, off in zip(qs, offs):
            if off and q.search_after is not None:
                raise ValueError("offset and search_after are mutually "
                                 "exclusive (ES from vs search_after)")
            if q.search_after is not None and q.has_vector and \
                    q.has_keyword:
                raise ValueError(
                    "search_after is undefined for hybrid RRF (ranks "
                    "shift with depth — use offset for hybrid paging)")
        qs = [(_replace(q, limit=q.limit + off, offset=0) if off else q)
              for q, off in zip(qs, offs)]
        use_actors = (database, table) in self._actors
        # multi-query fan-out (Q8): in actor mode every recall of every query is
        # submitted before any gather, with the reference's 30 s deadline
        all_futs: list[dict] = []
        if use_actors:
            actors = self._actors[(database, table)]
            for q in qs:
                futs: dict[str, list] = {}
                if q.has_keyword:
                    futs["keyword"] = [
                        a.search_keyword.remote(q.__dict__, precision, algorithm,
                                                True, fuzzy_transpositions)
                        for a in actors]
                if q.has_vector:
                    futs["vector"] = [
                        a.search_vector.remote(q.__dict__, precision, True,
                                               vector_algorithm, nprobe,
                                               n_centroids, ef)
                        for a in actors]
                all_futs.append(futs)
        out = []
        for qi, q in enumerate(qs):
            recalls: dict[str, list] = {}
            doc_tbls: list[pa.Table] = []
            if use_actors:
                import ray
                for name, fs in all_futs[qi].items():
                    # each actor returns a LIST of per-bucket tuples; flatten so
                    # the merge sees per-shard top-limit lists (rank semantics
                    # independent of the actor grouping)
                    per_bucket = [t for r in ray.get(fs, timeout=QUERY_TIMEOUT_SEC)
                                  for t in r]
                    recalls[name] = [(t[0], t[1]) for t in per_bucket]
                    doc_tbls.extend(t[2] for t in per_bucket
                                    if len(t) > 2 and len(t[2]))
            else:
                searchers = self._searchers(database, table)
                if q.has_keyword:
                    recalls["keyword"] = [
                        s.search_keyword(q, precision, algorithm,
                                         fuzzy_transpositions=fuzzy_transpositions)
                        for s in searchers]
                if q.has_vector:
                    recalls["vector"] = [
                        s.search_vector(q, precision, algorithm=vector_algorithm,
                                        nprobe=nprobe, n_centroids=n_centroids,
                                        ef=ef)
                        for s in searchers]
            if not recalls:
                out.append([])
                continue
            ids, scores = M.run_query(recalls, q, precision)
            if offs[qi]:
                ids, scores = ids[offs[qi]:], scores[offs[qi]:]
            if use_actors:
                out.append(self._attach_from(doc_tbls, ids, scores))
            else:
                out.append(self._materialize(database, table, ids, scores, False))
        return out

    @_coordinated
    def search_named(self, database: str, table: str, query, named: dict,
                     precision: str = "float32", algorithm: str = "bmw",
                     **search_kw) -> list[dict]:
        """:meth:`search` plus per-hit ``matched_queries`` (the
        elasticsearch named-queries ``_name`` annotation; extension): each
        hit dict gains a ``matched_queries`` list naming which of the
        given filter trees (full filter DSL, incl. analyzed/not/exists
        leaves) the doc satisfies, in ``named`` insertion order. The named
        trees are ANNOTATIONS only — they never narrow or rescore the
        match (put narrowing filters in the query itself).

        Scale shape: the top-k hit ids are broadcast once; each bucket
        ships back ≤ F × limit ids (its own hits per name) — candidate
        sets never leave the shard."""
        hits = self.search(database, table, query, precision=precision,
                           algorithm=algorithm, **search_kw)[0]
        if not hits or not named:
            for h in hits:
                h["matched_queries"] = []
            return hits
        ids = np.asarray([h["doc_id"] for h in hits], dtype=np.int64)
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.named_matches.remote(named, ids)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.named_matches(named, ids)
                     for s in self._searchers(database, table)]
        matched: dict[str, set] = {name: set() for name in named}
        for p in parts:
            for name, arr in p.items():
                matched[name].update(int(d) for d in arr)
        for h in hits:
            h["matched_queries"] = [name for name in named
                                    if h["doc_id"] in matched[name]]
        return hits

    @_coordinated
    def linear_search(self, database: str, table: str, query,
                      weight_keyword: float = 1.0,
                      weight_vector: float = 1.0, window: int = 100,
                      precision: str = "float32", algorithm: str = "bmw",
                      vector_algorithm: str = "brute", nprobe: int = 4,
                      n_centroids: int = 16, ef: int = 100) -> list[dict]:
        """Hybrid search fused by WEIGHTED NORMALIZED SCORES instead of RRF
        (the elasticsearch 8.x ``linear`` retriever, ``minmax`` normalizer;
        extension — the reference fuses with RRF only): each recall
        retrieves its global top ``window`` (per-bucket top-window
        partials, so the window is exact), scores normalize to
        (s − min)/(max − min) over that window (all-equal → 1.0), and a
        doc's final score is wk·norm_kw + wv·norm_vec — 0 from any window
        it missed. Returns doc dicts ordered (score desc, doc_id asc),
        top ``query.limit``.

        Scale shape identical to :meth:`search`: each bucket ships top
        ``window`` per recall; normalization and the weighted sum touch
        ≤ 2·window driver-side rows."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("linear_search takes exactly one query")
        q = qs[0]
        if not (q.has_keyword and q.has_vector):
            raise ValueError("linear_search needs BOTH keyword and vector "
                             "recalls (use search() for single-recall)")
        if int(window) < 1:
            raise ValueError("window must be >= 1")
        from dataclasses import replace
        qw = replace(q, limit=int(window), search_after=None)
        use_actors = (database, table) in self._actors
        recalls: dict[str, list] = {}
        if use_actors:
            import ray
            actors = self._actors[(database, table)]
            futs = {"keyword": [a.search_keyword.remote(qw.__dict__,
                                                        precision,
                                                        algorithm, False)
                                for a in actors],
                    "vector": [a.search_vector.remote(qw.__dict__, precision,
                                                      False,
                                                      vector_algorithm,
                                                      nprobe, n_centroids,
                                                      ef)
                               for a in actors]}
            for name, fs in futs.items():
                per_bucket = [t for r in ray.get(fs,
                                                 timeout=QUERY_TIMEOUT_SEC)
                              for t in r]
                recalls[name] = [(t[0], t[1]) for t in per_bucket]
        else:
            searchers = self._searchers(database, table)
            recalls["keyword"] = [s.search_keyword(qw, precision, algorithm)
                                  for s in searchers]
            recalls["vector"] = [s.search_vector(qw, precision,
                                                 algorithm=vector_algorithm,
                                                 nprobe=nprobe,
                                                 n_centroids=n_centroids,
                                                 ef=ef)
                                 for s in searchers]
        ids, scores = M.run_linear(recalls, q,
                                   {"keyword": float(weight_keyword),
                                    "vector": float(weight_vector)},
                                   int(window), precision)
        return self._materialize(database, table, ids, scores, use_actors)

    def multi_search(self, database: str, tables: list, query,
                     precision: str = "float32",
                     algorithm: str = "bmw") -> list[dict]:
        """Federated keyword search across several tables of one database
        with BLENDED global statistics (the elasticsearch multi-index /
        ``dfs_query_then_fetch`` shape; extension — the reference searches
        one table, `RetrievalMaster.java:322`).

        One stats pass folds every member table's (N, per-field sum_ttf /
        doc_count, per-term df/ttf) into a
        :class:`~byzer_retrieval_ray.index.searcher.FederatedStatsView`
        (distributed idf); each table's buckets then score with that view —
        block-max WAND stays sound because term weights are per-query
        constants — and the master merges to the global top-k by
        (score desc, doc_id asc, table-position asc). Because per-doc
        quantized length norms are split-invariant, scoring a corpus
        PARTITIONED across member tables is byte-identical to scoring it as
        one table. Returns doc dicts with ``_table`` provenance added.

        Scale shape: the stats fold ships O(tables × query terms) integers;
        each bucket ships only its top ``limit``; docstore fetches touch the
        winners only. Keyword recall only (filters supported)."""
        from byzer_retrieval_ray.index.searcher import (FederatedStatsView,
                                                        StatsView)

        if isinstance(tables, str) or not tables:
            raise ValueError("multi_search takes a non-empty LIST of tables")
        if len(set(tables)) != len(tables):
            raise ValueError("multi_search tables must be distinct")
        qs = self._as_queries(database, tables[0], query)
        if len(qs) != 1:
            raise ValueError("multi_search takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("multi_search is keyword-only")
        key = (database, tuple(tables))
        per_table = self._fed_searchers.get(key)
        if per_table is None:
            ms = [self.manifest(database, t) for t in tables]
            fed = FederatedStatsView(
                [StatsView(m.data, GenerationReader(m.data)) for m in ms])
            per_table = []
            for m in ms:
                # fresh searcher instances: the injected federated stats
                # must never leak into the per-table serving cache
                ss = [BucketSearcher(m.data, b, gen=g)
                      for g, b in self._gen_buckets(m)]
                for s in ss:
                    s.stats = fed
                per_table.append(ss)
            self._fed_searchers[key] = per_table
        parts_ids, parts_scores, parts_t = [], [], []
        for ti, ss in enumerate(per_table):
            for s in ss:
                ids, scores = s.search_keyword(q, precision=precision,
                                               algorithm=algorithm)
                parts_ids.append(np.asarray(ids))
                parts_scores.append(np.asarray(scores))
                parts_t.append(np.full(len(ids), ti, np.int64))
        dtype = np.float32 if precision == "float32" else np.float64
        if not parts_ids:
            return []
        ids = np.concatenate(parts_ids)
        scores = np.concatenate(parts_scores).astype(dtype)
        tarr = np.concatenate(parts_t)
        order = np.lexsort((tarr, ids, -scores.astype(np.float64)))[: q.limit]
        ids, scores, tarr = ids[order], scores[order], tarr[order]
        out: list = [None] * ids.size
        for ti, tname in enumerate(tables):
            mask = tarr == ti
            if not mask.any():
                continue
            docs = self._materialize(database, tname, ids[mask],
                                     scores[mask], False)
            for slot, d in zip(np.flatnonzero(mask), docs):
                d["_table"] = tname
                out[int(slot)] = d
        return [d for d in out if d is not None]

    @_coordinated
    def more_like_this(self, database: str, table: str, like_text: str,
                       field: str = "text", limit: int = 10,
                       max_query_terms: int = 5, **search_kwargs):
        """Query-by-document (Lucene ``MoreLikeThis`` shape — the reference
        exposes no MLT; this is the standard simplification of
        queries.mlt.MoreLikeThis): score the source text's terms by
        tf·ln(N/df) (collection stats from the index, all active
        generations), take the top ``max_query_terms`` (ties broken by term
        ascending), and run them as a plain OR BM25 query over ``field``.
        Returns ``(hits, terms)`` — the source document itself ranks unless
        the caller filters it.

        The source text is the caller's (Lucene's
        ``MoreLikeThis.like(Reader)``) — necessarily so, because analyzed
        fields are indexed but never stored here (TextField parity), exactly
        the configuration where Lucene MLT also needs the reader form.

        Scale shape: term selection is a driver-side termstats probe
        (≤ distinct terms of ONE doc) and the query is the normal serving
        path — no extra distributed stage.
        """
        from byzer_retrieval_ray.functions.queryparser import escape_term
        from byzer_retrieval_ray.functions.tokenize import tokenize_query
        from byzer_retrieval_ray.index.searcher import StatsView

        toks = tokenize_query(like_text)
        if not toks:
            return [], []
        terms, tf = np.unique(toks, return_counts=True)
        m = self.manifest(database, table)
        sv = StatsView(m.data, GenerationReader(m.data))
        st = sv.term_stats([(field, str(t)) for t in terms])
        n = sv.stats["n_docs"]
        df = np.array([st[(field, str(t))][0] for t in terms], np.float64)
        known = df > 0                    # MLT considers only indexed terms
        terms, tf, df = terms[known], tf[known], df[known]
        if terms.size == 0:
            return [], []
        score = tf.astype(np.float64) * np.log(n / df)
        order = np.lexsort((terms, -score))              # score desc, term asc
        chosen = [str(t) for t in terms[order[:max_query_terms]]]
        q = SearchQuery(database, table, filters={},
                        keyword=" ".join(escape_term(t) for t in chosen),
                        fields=[field], limit=limit)
        return self.search(database, table, q, **search_kwargs)[0], chosen

    @_coordinated
    def highlight(self, database: str, table: str, query, field: str,
                  window: int = 16, **search_kwargs) -> list[dict]:
        """Keyword search + best-passage snippets (the Lucene
        UnifiedHighlighter shape, simplified — the reference exposes no
        highlight API: extension). Runs the normal serving path, then for
        each of the top-limit hits picks the ``window``-token window of
        ``field`` containing the most DISTINCT query terms (ties → earliest)
        and returns ``{"doc_id", "_score", "snippet", "n_matched"}`` rows in
        rank order. Plain terms highlight (the parsed query's should/must/
        group members); ``field`` must be analyzed — its text comes from the
        docstore, which retains analyzed columns (where Lucene would need
        stored=true).

        Scale shape: snippets are computed for ≤ limit docs — one
        predicate-pushdown docstore read of (doc_id, field), never a scan."""
        from byzer_retrieval_ray.functions.highlight import make_snippet
        from byzer_retrieval_ray.functions.queryparser import parse_keyword

        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("highlight takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("highlight is keyword-only")
        hits = self.search(database, table, q, **search_kwargs)[0]
        if not hits:
            return []
        ids = np.array([h["doc_id"] for h in hits], np.int64)
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            tbls = ray.get([a.fetch_analyzed.remote(ids, field)
                            for a in self._actors[(database, table)]],
                           timeout=QUERY_TIMEOUT_SEC)
        else:
            tbls = [s.fetch_analyzed(ids, field)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        texts: dict[int, str] = {}
        if tbls:
            joined = pa.concat_tables(tbls, promote_options="default")
            texts = dict(zip(joined["doc_id"].to_pylist(),
                             joined[field].to_pylist()))
        pk = parse_keyword(q.keyword) if q.keyword.strip() != "*" else None
        terms = set()
        if pk is not None:
            terms = {t for t in pk.should + pk.must if isinstance(t, str)}
            terms |= {m for g in pk.must_groups for m in g
                      if isinstance(m, str)}
            # phrase members highlight individually (Lucene UH does too)
            terms |= {t for ph in pk.phrases + pk.must_phrases for t in ph}
            terms |= {t for ph, _ in pk.slop_phrases + pk.must_slop_phrases
                      for t in ph}
            terms |= {t for tt, _ in pk.pphrases + pk.must_pphrases
                      for t in tt}
        out = []
        for h in hits:
            snip, m = make_snippet(str(texts.get(h["doc_id"], "") or ""),
                                   terms, window)
            out.append({"doc_id": h["doc_id"], "_score": h["_score"],
                        "snippet": snip, "n_matched": m})
        return out

    @_coordinated
    def explain(self, database: str, table: str, query, doc_id: int,
                precision: str = "float32",
                fuzzy_transpositions: bool = True) -> dict:
        """Per-clause score breakdown for one (query, doc) — the Lucene
        ``IndexSearcher.explain`` shape (extension; the reference exposes no
        explain API). Returns ``{doc_id, matched, score, clauses: [{field,
        clause, kind, tf, norm_byte, weight, score}, ...], in_candidates,
        excluded}``. The breakdown is built from the SAME scorer list,
        weights and MUST/MUST_NOT gating the search uses, and the total is
        the per-clause dtype scores accumulated in float64 in clause order —
        so ``score`` equals the doc's search score bit-for-bit. ``matched``
        mirrors query matching only (a zero-score pure-filter hit explains
        as unmatched, like Lucene explaining the query alone). Keyword
        queries only; runs on in-process searchers (debug surface — actor
        pools are not consulted)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("explain takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("explain is keyword-only")
        d = int(doc_id)
        for s in self._searchers(database, table):
            if bool(np.isin(np.int64(d), s.doc_ids())):
                return s.search_keyword(
                    q, precision=precision,
                    fuzzy_transpositions=fuzzy_transpositions,
                    explain_doc=d)
        return {"doc_id": d, "matched": False, "score": 0.0, "clauses": [],
                "in_candidates": False, "excluded": False,
                "note": "doc_id not present in any generation bucket"}

    @_coordinated
    def count(self, database: str, table: str, query,
              precision: str = "float32") -> int:
        """Total-hits count for a keyword query over the ENTIRE match set
        (Lucene ``TotalHitCountCollector`` — extension; the reference only
        returns top-k). Each bucket ships one integer; match ids never leave
        the shard. Keyword recall only (a vector recall's 'match set' is its
        top-k, which is ranking, not counting); filter-only zero-score hits
        count, mirroring search results."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("count takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("count is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.count_keyword.remote(q.__dict__, precision)
                    for a in self._actors[(database, table)]]
            return int(sum(ray.get(futs, timeout=QUERY_TIMEOUT_SEC)))
        return int(sum(s.count_keyword(q, precision)
                       for s in self._searchers(database, table)))

    @_coordinated
    def mmr_search(self, database: str, table: str, query,
                   mmr_lambda: float = 0.7, pool: int = 50,
                   precision: str = "float64") -> list[dict]:
        """Maximal-marginal-relevance diversified vector retrieval
        (Carbonell & Goldstein 1998 — the standard RAG context-diversifier;
        extension, the reference has no diversification). Stage 1: exact
        brute-cosine top-``pool`` relevance candidates (the normal vector
        search). Stage 2: greedy selection of ``query.limit`` docs by
        ``mmr = λ·rel − (1−λ)·max_{s∈selected} sim(doc, s)`` with
        rel = the engine's (1+cos)/2 vector score, sim the same transform
        between DOC vectors, ties broken by doc_id ascending; the first
        pick's objective is λ·rel (empty selected set). Returns
        ``[{key fields…, _score: mmr objective, _rel: relevance, _rank}]``
        in selection order. Driver-side over ``pool`` rows only — the
        distributed work is the stage-1 search."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("mmr_search takes exactly one query")
        q = qs[0]
        if not q.has_vector or q.has_keyword:
            raise ValueError("mmr_search is vector-only")
        from dataclasses import replace
        pool_q = replace(q, limit=int(pool))
        rows = self.search(database, table, pool_q, precision=precision,
                           vector_algorithm="brute")[0]
        if not rows:
            return []
        vf = q.vectorField
        if vf not in rows[0]:
            raise KeyError(f"vector field {vf!r} is not stored in results")
        # deterministic pool order = (engine rel desc, USER key asc): the
        # search merge tie-breaks by the INTERNAL stride doc_id, which for
        # multi-generation / multi-part tables is not user-key order — the
        # SQL oracle (and the documented contract) order by the user key
        key_field = self.manifest(database, table).data.get("key_field")
        if key_field and key_field in rows[0]:
            rows = sorted(rows, key=lambda r: (-r["_score"], r[key_field]))
        V = np.array([r[vf] for r in rows], dtype=np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        # rel is RECOMPUTED from the same normalized matrix the similarities
        # use, with BOTH normalizations and all dot products on the same
        # axis-1/GEMV kernels (a 1-D np.linalg.norm uses a different BLAS
        # path that can round the norm 1 ulp differently, and a full V@V.T
        # GEMM sums in a different order — either leaves ±1e-16 noise):
        # when the query IS a document's vector, rel_i − sim(i, that doc)
        # is then EXACTLY zero, so mass ties break deterministically by
        # pool order instead of by float noise. The search score only
        # selects and orders the pool.
        qn = np.asarray(q.vector, dtype=np.float64)[None, :]
        qn = (qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True),
                              1e-30))[0]
        rel = (1.0 + V @ qn) / 2.0
        lam = float(mmr_lambda)
        k = min(int(q.limit), len(rows))
        out: list[dict] = []
        cand = np.ones(len(rows), dtype=bool)
        max_sim = np.zeros(len(rows), dtype=np.float64)
        for rank in range(k):
            obj = lam * rel - (1.0 - lam) * max_sim
            obj_m = np.where(cand, obj, -np.inf)
            # ties → first in pool order, i.e. (obj desc, rel desc,
            # doc_id asc) — the SQL oracle mirrors that exact ORDER BY
            best = int(np.argmax(obj_m))
            cand[best] = False
            r = dict(rows[best])
            r["_rel"] = float(rel[best])
            r["_score"] = float(obj[best])
            r["_rank"] = rank
            out.append(r)
            max_sim = np.maximum(max_sim, (1.0 + V @ V[best]) / 2.0)
        return out

    @staticmethod
    def _fold_facet(tbls: list[pa.Table], limit: int) -> list[dict]:
        """Sum (value, cnt) partials and rank (count desc, value asc)."""
        df = pa.concat_tables(tbls).to_pandas()
        agg = df.groupby("value", as_index=False)["cnt"].sum() \
            .sort_values(["cnt", "value"], ascending=[False, True],
                         kind="mergesort")
        return [{"value": str(r.value), "count": int(r.cnt)}
                for r in agg.head(limit).itertuples()]

    @_coordinated
    def facet_counts(self, database: str, table: str, query, facet_field: str,
                     limit: int = 10, precision: str = "float32",
                     shard_size: int | None = None) -> list[dict]:
        """Facet counts of a stored field over a keyword query's ENTIRE match
        set (the Lucene faceting shape — FacetsCollector + SSDV facets count
        every hit, not the top-k; the reference exposes no facet API:
        extension). Returns ``[{"value", "count"}, ...]`` ranked by
        (count desc, value asc), top ``limit``; values are strings (Lucene
        facet labels); docs with a null/missing field don't count.

        Scale shape — EXACT bounded distributed top-k (the Fagin/TPUT
        threshold-algorithm family), never a full-vocabulary partial:
        phase 1 scatters for each bucket's top ``shard_size`` (value,
        count) rows (default max(4·limit, 64)). If no bucket hit the cut
        the union IS the complete fold — sum and return (the small-field
        fast path, one scatter, identical shipping to a plain facet). If
        some bucket was truncated, T = Σ truncated-bucket minimum shipped
        counts bounds any UNSHIPPED value's possible global count; phase 2
        probes every bucket for exact counts of the candidate union
        (≤ buckets × shard_size values), and the fold is provably exact
        when the ``limit``-th candidate's count strictly exceeds T —
        otherwise shard_size quadruples and both phases repeat,
        terminating at the full vocabulary in the adversarial worst case
        (uniform counts) and in one round on real zipfian fields. Per
        round each bucket ships O(shard_size + candidates) rows, so a
        billion-key field costs O(buckets × shard_size) per round instead
        of a vocabulary-sized partial. Keyword recall only (filters
        supported; a vector recall's "match set" is its top-k, which is
        ranking, not faceting)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("facet_counts takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("facet_counts is keyword-only")
        use_actors = (database, table) in self._actors
        S = int(shard_size) if shard_size else max(4 * int(limit), 64)
        while True:
            if use_actors:
                import ray
                futs = [a.facet_top_keyword.remote(q.__dict__, facet_field,
                                                   S, precision)
                        for a in self._actors[(database, table)]]
                tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                        for t in r]
            else:
                tbls = [s.facet_top_keyword(q, facet_field, S, precision)
                        for s in self._searchers(database, table)]
            tbls = [t for t in tbls if len(t)]
            if not tbls:
                return []
            trunc = [t for t in tbls if len(t) == S]
            if not trunc:
                # no bucket hit the cut → the union is the full vocabulary
                return self._fold_facet(tbls, int(limit))
            # any value a truncated bucket did NOT ship has local count ≤
            # that bucket's minimum shipped count (ties sort after by name)
            T = sum(int(t["cnt"][len(t) - 1].as_py()) for t in trunc)
            cand = pc.unique(
                pa.concat_tables(tbls)["value"].combine_chunks()).to_pylist()
            if use_actors:
                import ray
                futs = [a.facet_probe_keyword.remote(q.__dict__, facet_field,
                                                     cand, precision)
                        for a in self._actors[(database, table)]]
                probes = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                          for t in r]
            else:
                probes = [s.facet_probe_keyword(q, facet_field, cand,
                                                precision)
                          for s in self._searchers(database, table)]
            probes = [t for t in probes if len(t)]
            out = self._fold_facet(probes, int(limit)) if probes else []
            if len(out) >= int(limit) and out[-1]["count"] > T:
                return out
            S *= 4

    @_coordinated
    def multi_terms(self, database: str, table: str, query, fields: list,
                    limit: int = 10, precision: str = "float32",
                    shard_size: int | None = None) -> list[dict]:
        """Multi-field terms aggregation (the elasticsearch ``multi_terms``
        shape; extension): buckets keyed by the VALUE TUPLE of ≥ 2 stored
        fields over a keyword query's ENTIRE match set, ranked
        (count desc, key tuple asc), top ``limit``. A doc with a null in
        any component belongs to no bucket (ES semantics); components are
        rejected if list-typed. Returns
        ``[{"key": [v1, v2, …], "count"}, ...]`` (values as strings — the
        facet-label convention).

        Scale shape: the tuple key rides the SAME bounded exact threshold
        fold as facet_counts (per-bucket top-S partials → candidate probe
        → provable acceptance; the key is composed server-side as a
        \\x1f-joined string, whose lexicographic order equals tuple order
        for printable values) — no vocabulary-sized partial even though
        tuple cardinality multiplies. Keyword recall only."""
        fl = [str(f) for f in fields]
        if len(fl) < 2:
            raise ValueError("multi_terms needs at least two fields "
                             "(use facet_counts for one)")
        rows = self.facet_counts(database, table, query, fl, limit=limit,
                                 precision=precision, shard_size=shard_size)
        return [{"key": r["value"].split("\x1f"), "count": r["count"]}
                for r in rows]

    @_coordinated
    def top_hits(self, database: str, table: str, query, key_field: str,
                 num_keys: int = 10, per_key: int = 3,
                 precision: str = "float32",
                 source_fields: list | None = None) -> list[dict]:
        """``terms`` + ``top_hits`` sub-aggregation (the elasticsearch
        two-phase shape; the reference exposes no aggregation API:
        extension): over a keyword query's ENTIRE match set, pick the top
        ``num_keys`` values of a stored field by match count
        (count desc, value asc — the terms-agg order), then for EACH of
        those keys return its top ``per_key`` hits by (score desc,
        doc_id asc). Returns
        ``[{"key", "count", "hits": [{"doc_id", "_score"}, ...]}, ...]``
        in key-bucket order. Keys are strings (facet-label convention);
        docs with a null/missing key field belong to no bucket;
        multi-valued key fields are rejected (a hit would land in several
        buckets — that's grouping, not top-hits).

        Scale shape — two scatter/gather rounds, like elasticsearch's
        terms phase + fetch phase: phase 1 ships only (value, count)
        partials per bucket (facet_counts); phase 2 ships at most
        num_keys × per_key (key, doc_id, score) rows per bucket. Match
        ids never leave the shard in phase 1; the phase-2 fold is exact
        (a hit below a bucket's own per-key top per_key can never enter
        the global per-key top per_key). Keyword recall only (filters
        supported), like facet_counts.

        ``source_fields`` (the ES top_hits ``_source`` filter) attaches
        the named stored columns to each hit via ONE extra bounded
        docstore fetch of the ≤ num_keys × per_key chosen ids."""
        buckets = self.facet_counts(database, table, query, key_field,
                                    limit=num_keys, precision=precision)
        if not buckets:
            return []
        key_vals = [b["value"] for b in buckets]
        q = self._as_queries(database, table, query)[0]
        per_key = max(1, int(per_key))
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.tophits_keyword.remote(q.__dict__, key_field,
                                             key_vals, per_key, precision)
                    for a in self._actors[(database, table)]]
            tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                    for t in r]
        else:
            tbls = [s.tophits_keyword(q, key_field, key_vals, per_key,
                                      precision)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        hits_by_key: dict[str, list] = {k: [] for k in key_vals}
        if tbls:
            t = pa.concat_tables(tbls)
            ids = t["doc_id"].to_numpy()
            scores = t["score"].to_numpy()
            kcol = t["key"].to_pylist()
            order = np.lexsort((ids, -scores.astype(np.float64)))
            for i in order:
                lst = hits_by_key.get(kcol[int(i)])
                if lst is not None and len(lst) < per_key:
                    lst.append({"doc_id": int(ids[i]),
                                "_score": float(scores[i])})
        if source_fields:
            chosen = np.array(sorted({h["doc_id"]
                                      for hs in hits_by_key.values()
                                      for h in hs}), dtype=np.int64)
            if chosen.size:
                cols = sorted({str(f) for f in source_fields})
                if use_actors:
                    import ray
                    dts = [t for t in ray.get(
                        [a.fetch_docs.remote(chosen)
                         for a in self._actors[(database, table)]],
                        timeout=QUERY_TIMEOUT_SEC) if len(t)]
                else:
                    dts = [t for s in self._searchers(database, table)
                           if len(t := s.fetch_docs(chosen, columns=cols))]
                if dts:
                    dtbl = pa.concat_tables(dts, promote_options="default")
                    did = dtbl["doc_id"].to_numpy()
                    srt = np.argsort(did, kind="stable")
                    rows = {int(did[j]): j for j in srt}
                    for hs in hits_by_key.values():
                        for h in hs:
                            j = rows.get(h["doc_id"])
                            if j is None:
                                continue
                            for f in cols:
                                if f in dtbl.column_names:
                                    h[f] = dtbl[f][j].as_py()
        return [{"key": b["value"], "count": b["count"],
                 "hits": hits_by_key[b["value"]]} for b in buckets]

    @_coordinated
    def collapse_search(self, database: str, table: str, query,
                        collapse_field: str,
                        precision: str = "float32",
                        group_size: int = 1) -> list[dict]:
        """Field-collapsed search (the elasticsearch ``collapse`` / Lucene
        grouping shape; the reference exposes no collapse API: extension):
        the top ``query.limit`` hits where at most ``group_size`` docs per
        distinct ``collapse_field`` value survive (group_size=1 = classic
        collapse, best doc per value; >1 = the Lucene
        DiversifiedTopDocsCollector semantic), ranked by (score desc,
        doc_id asc). Docs with a null/missing value collapse into ONE null
        group; keys are returned as strings.
        Returns ``[{"doc_id", "_score", "<collapse_field>"}, ...]``.

        Scale shape: each bucket scores its full match set locally but
        ships at most limit keys × group_size rows (see
        ``collapse_keyword`` for the exactness argument); the master fold
        is O(buckets × limit × group_size). Keyword recall only (filters
        supported), like facet_counts."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("collapse_search takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("collapse_search is keyword-only")
        g = max(1, int(group_size))
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.collapse_keyword.remote(q.__dict__, collapse_field,
                                              precision, g)
                    for a in self._actors[(database, table)]]
            tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                    for t in r]
        else:
            tbls = [s.collapse_keyword(q, collapse_field, precision, g)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        if not tbls:
            return []
        import pyarrow.compute as pc_
        from byzer_retrieval_ray.index.searcher import _diversified_select
        t = pa.concat_tables(tbls)
        ids = t["doc_id"].to_numpy()
        scores = t["score"].to_numpy()
        keys = t["key"].combine_chunks()
        enc = keys.dictionary_encode()
        codes = pc_.fill_null(pc_.cast(enc.indices, pa.int64()), -1) \
            .to_numpy(zero_copy_only=False)
        ranked = np.lexsort((ids, -scores))
        sel = ranked[_diversified_select(codes[ranked], q.limit, g,
                                         key_budget=False)]
        return [{"doc_id": int(ids[i]), "_score": float(scores[i]),
                 collapse_field: keys[int(i)].as_py()} for i in sel]

    @_coordinated
    def function_search(self, database: str, table: str, query,
                        score_function: dict,
                        precision: str = "float32") -> list[dict]:
        """Function-scored search (the elasticsearch ``function_score`` /
        ``field_value_factor`` shape; Lucene ``FunctionScoreQuery`` — the
        reference exposes no rescoring API: extension). Every BM25 hit is
        rescored from a stored numeric field:

            score_function = {"field": "n_chars",        # required
                              "factor": 1.0,             # scales the value
                              "modifier": "log1p",       # none | log1p |
                                                         # sqrt | square |
                                                         # reciprocal
                              "mode": "multiply",        # multiply | sum
                              "missing": 1.0}            # null replacement

        and the final ranking is (new score desc, doc_id asc). Returns the
        same doc+``_score`` dicts as :meth:`search`.

        Passing ``decay_function`` instead of ``modifier`` selects the
        elasticsearch decay shape (recency/distance scoring)::

            score_function = {"decay_function": "gauss",  # exp | linear
                              "field": "warc_ts",         # numeric/timestamp
                              "origin": 1.7e15,           # epoch µs for ts
                              "scale": 8.64e10,           # distance at decay
                              "offset": 0.0,              # flat zone
                              "decay": 0.5,               # value at scale
                              "mode": "multiply"}

        Docs missing the field get function value 1.0 (the documented ES
        decay behavior); timestamps measure distance in epoch microseconds.

        Passing ``random_score`` selects the elasticsearch deterministic
        ``random_score`` function (seed + field, ES >= 7 form)::

            score_function = {"random_score": {"seed": 42,
                                               "field": "doc_id"},
                              "mode": "replace"}   # or multiply | sum

        boost = fmix32(Horner31(f"{seed}:{value}")) / 2^32 ∈ [0, 1) — the
        repo's SQL-replicable hash family; ``mode="replace"`` (ES
        boost_mode replace, accepted for every function kind) makes the
        boost the final score: a deterministic per-seed sample/shuffle of
        the match set.

        Scale shape: rescoring is non-monotone in BM25 order, so each
        bucket rescored its FULL match set locally (exact TAAT, one narrow
        docstore column) but ships only its top ``limit`` — the
        scatter-gather top-k argument applies to the rescored order.
        Keyword recall only (filters supported)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("function_search takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("function_search is keyword-only")
        if "field" not in score_function \
                and "random_score" not in score_function:
            raise ValueError("score_function needs a 'field' "
                             "(or a 'random_score' spec)")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.function_score_keyword.remote(q.__dict__,
                                                    score_function, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.function_score_keyword(q, score_function, precision)
                     for s in self._searchers(database, table)]
        dtype = np.float32 if precision == "float32" else np.float64
        ids, scores = M._merge_recall(parts, dtype)
        ids, scores = ids[: q.limit], scores[: q.limit]
        return self._materialize(database, table, ids, scores, False)

    @_coordinated
    def boosting_search(self, database: str, table: str, query,
                        negative_keyword: str, negative_boost: float = 0.5,
                        precision: str = "float32") -> list[dict]:
        """Boosting query (the elasticsearch ``boosting`` shape — positive
        query + negative query + ``negative_boost``; the reference exposes
        no rescoring API: extension). Hits of the positive ``query`` that
        ALSO match ``negative_keyword`` (same searched fields, full query
        syntax) are demoted to score × ``negative_boost`` (0 ≤ β ≤ 1);
        other hits keep their BM25 score. Demotion is soft — unlike
        ``-term`` exclusion the demoted docs stay in the result, ranked
        lower. Final ranking (new score desc, doc_id asc); returns the
        same doc+``_score`` dicts as :meth:`search`.

        Scale shape: demotion is non-monotone in BM25 order, so each
        bucket demotes its FULL match set locally (two exact TAAT passes,
        no docstore read) but ships only its top ``limit`` — the
        scatter-gather top-k argument applies to the demoted order.
        Keyword recall only (filters supported; the negative query is
        matching-only and never narrows the match set)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("boosting_search takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("boosting_search is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.boosting_keyword.remote(q.__dict__, negative_keyword,
                                              negative_boost, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.boosting_keyword(q, negative_keyword, negative_boost,
                                        precision)
                     for s in self._searchers(database, table)]
        dtype = np.float32 if precision == "float32" else np.float64
        ids, scores = M._merge_recall(parts, dtype)
        ids, scores = ids[: q.limit], scores[: q.limit]
        return self._materialize(database, table, ids, scores, False)

    @_coordinated
    def significant_terms(self, database: str, table: str, query,
                          field: str, limit: int = 10,
                          min_doc_count: int = 1,
                          shard_min_doc_count: int = 0,
                          precision: str = "float32") -> list[dict]:
        """Significant-terms aggregation (the elasticsearch
        ``significant_terms`` shape with the JLH heuristic; the reference
        exposes no aggregations: extension): terms of ``field``
        overrepresented in a keyword query's ENTIRE match set relative to
        the whole corpus. With fg = matching docs containing the term,
        fgt = match count, bg = corpus docs containing it (index df, the
        Lucene docFreq), n = corpus doc count:

            a = fg/fgt,  b = bg/n,  JLH = (a − b) × (a / b),  kept iff a > b

        ranked (score desc, term asc), top ``limit``; ``min_doc_count``
        drops rare foreground terms (elasticsearch defaults to 3 — here 1,
        exact). ``shard_min_doc_count`` > 0 drops shard-rare terms BEFORE
        they ship (the elasticsearch knob of the same name) and selects the
        LEGACY full-vocabulary partial fold — a term is then under-counted
        only if its occurrences split below the cut across buckets; 0
        (default) keeps the fold exact.
        Returns ``[{"term", "score", "fg_count", "bg_count"}, ...]``.

        Scale shape (default path) — EXACT bounded threshold fold, the
        facet_counts algorithm adapted to the JLH objective: phase 1
        scatters for each bucket's top ``shard_size`` (fg desc, term asc)
        foreground partial (internal start max(8·limit, 128)). With no
        truncation the union is the complete foreground vocabulary — fold
        directly. Otherwise T = Σ truncated-bucket minimum shipped fg
        bounds any unshipped term's global fg; phase 2 probes exact fg for
        the candidate union, JLH scores are computed from exact counts,
        and the fold is provably exact when the ``limit``-th score
        strictly exceeds the best score an unseen term could reach —
        JLH(fg, bg) = (fg/fgt − bg/n)(fg·n/(fgt·bg)) is maximal at
        bg = fg = T, i.e. bound = (T/fgt − T/n)·(n/fgt) (fg ≤ bg always:
        the match set is a subset of the corpus) — or when unseen terms
        cannot qualify at all (T < min_doc_count, or T/fgt ≤ T/n). Else
        shard_size quadruples and the phases repeat. Per round each bucket
        ships O(shard_size + candidates) rows plus ONE termstats probe for
        background dfs. Keyword recall only."""
        from byzer_retrieval_ray.index.searcher import StatsView

        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("significant_terms takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("significant_terms is keyword-only")
        m0 = self.manifest(database, table)
        if field not in GenerationReader(m0.data).analyzed:
            # background dfs come from the index term dictionary — a
            # non-analyzed field has none and would yield a silently
            # empty result
            raise ValueError(
                f"significant_terms field {field!r} must be analyzed")
        use_actors = (database, table) in self._actors

        def _scatter(method: str, *args):
            if use_actors:
                import ray
                futs = [getattr(a, method).remote(q.__dict__, field, *args,
                                                  precision)
                        for a in self._actors[(database, table)]]
                return [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                        for p in r]
            return [getattr(s, method)(q, field, *args, precision)
                    for s in self._searchers(database, table)]

        def _score(tbls: list[pa.Table], fgt: int) -> list[dict]:
            df = pa.concat_tables(tbls).to_pandas()
            agg = df.groupby("term", as_index=False)["fg"].sum()
            agg = agg[agg["fg"] >= int(min_doc_count)]
            if not len(agg):
                return []
            terms = [str(t) for t in agg["term"]]
            m = self.manifest(database, table)
            sv = StatsView(m.data, GenerationReader(m.data))
            st = sv.term_stats([(field, t) for t in terms])
            n = float(sv.stats["n_docs"])
            out = []
            for t, fg in zip(terms, agg["fg"].to_numpy()):
                bg = int(st[(field, t)][0])
                if bg == 0:   # not indexed (possible across generations)
                    continue
                a = float(fg) / float(fgt)
                b = float(bg) / n
                if a <= b:
                    continue
                out.append({"term": t, "score": (a - b) * (a / b),
                            "fg_count": int(fg), "bg_count": bg})
            out.sort(key=lambda r: (-r["score"], r["term"]))
            return out

        if int(shard_min_doc_count) > 0:
            # legacy recall-trade path: shard-rare cut, full-vocab partials
            if use_actors:
                import ray
                futs = [a.sigterms_keyword.remote(q.__dict__, field,
                                                  precision,
                                                  int(shard_min_doc_count))
                        for a in self._actors[(database, table)]]
                parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                         for p in r]
            else:
                parts = [s.sigterms_keyword(q, field, precision,
                                            int(shard_min_doc_count))
                         for s in self._searchers(database, table)]
            fgt = sum(p[1] for p in parts)
            tbls = [p[0] for p in parts if len(p[0])]
            if fgt == 0 or not tbls:
                return []
            return _score(tbls, fgt)[: int(limit)]

        S = max(8 * int(limit), 128)
        while True:
            parts = _scatter("sigterms_top_keyword", S)
            fgt = sum(p[1] for p in parts)
            tbls = [p[0] for p in parts if len(p[0])]
            if fgt == 0 or not tbls:
                return []
            trunc = [t for t in tbls if len(t) == S]
            if not trunc:
                return _score(tbls, fgt)[: int(limit)]
            T = sum(int(t["fg"][len(t) - 1].as_py()) for t in trunc)
            cand = pc.unique(
                pa.concat_tables(tbls)["term"].combine_chunks()).to_pylist()
            probes = _scatter("sigterms_probe_keyword", cand)
            tbls = [p[0] for p in probes if len(p[0])]
            out = _score(tbls, fgt)[: int(limit)] if tbls else []
            n = float(StatsView(self.manifest(database, table).data,
                                GenerationReader(
                                    self.manifest(database, table).data))
                      .stats["n_docs"])
            a_u, b_u = float(T) / float(fgt), float(T) / n
            if T < int(min_doc_count) or a_u <= b_u:
                return out
            bound = (a_u - b_u) * (a_u / b_u)
            if len(out) >= int(limit) and out[-1]["score"] > bound:
                return out
            S *= 4

    @_coordinated
    def cardinality(self, database: str, table: str, query, field: str,
                    p: int = 12, precision: str = "float32") -> dict:
        """Approximate distinct count of a stored field over a keyword
        query's ENTIRE match set (the elasticsearch ``cardinality``
        aggregation; the reference exposes no aggregations: extension) —
        HyperLogLog with the repo's deterministic, SQL-replicable sketch
        (``ops/hll.py``: fmix32∘Horner31 hash, integer register sum,
        linear-counting small-range branch). Returns
        ``{"estimate", "raw", "zeros", "m", "branch"}``; relative error
        ~1.04/√(2^p). Nulls don't count.

        Scale shape: each bucket ships ONE 2^p-long register vector over
        its exact TAAT match set — key strings never leave the shard; the
        driver max-folds 8·2^p bytes per bucket. Keyword recall only."""
        from byzer_retrieval_ray.ops.hll import _estimate, merge_registers

        if not 4 <= int(p) <= 20:
            raise ValueError("need 4 <= p <= 20")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("cardinality takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("cardinality is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.cardinality_keyword.remote(q.__dict__, field, int(p),
                                                 precision)
                    for a in self._actors[(database, table)]]
            parts = [r for rr in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for r in rr]
        else:
            parts = [s.cardinality_keyword(q, field, int(p), precision)
                     for s in self._searchers(database, table)]
        regs = np.zeros(1 << int(p), dtype=np.int64)
        for r in parts:
            regs = merge_registers(regs, np.asarray(r, dtype=np.int64))
        return _estimate(regs, int(p))

    @_coordinated
    def field_stats(self, database: str, table: str, query, field: str,
                    precision: str = "float32") -> dict:
        """Numeric stats (count / min / max / sum / mean) of a stored field
        over a keyword query's ENTIRE match set (the Lucene StatsResults /
        stats-aggregation shape; the reference exposes no stats API:
        extension). Nulls don't count (SQL COUNT(col) semantics); integer
        columns fold exactly (per-bucket Arrow sums widen to int64, the
        driver folds Python ints); ``mean`` is sum/count in float64 or None
        when count is 0.

        Scale shape: each bucket ships ONE (count, min, max, sum) partial —
        match ids never leave the shard; the driver fold is O(buckets).
        Keyword recall only (filters supported), like facet_counts."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("field_stats takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("field_stats is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.stats_keyword.remote(q.__dict__, field, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.stats_keyword(q, field, precision)
                     for s in self._searchers(database, table)]
        parts = [p for p in parts if p["cnt"]]
        cnt = sum(p["cnt"] for p in parts)
        if cnt == 0:
            return {"count": 0, "min": None, "max": None, "sum": None,
                    "mean": None}
        vsum = sum(p["sum"] for p in parts)
        return {"count": cnt, "min": min(p["min"] for p in parts),
                "max": max(p["max"] for p in parts), "sum": vsum,
                "mean": float(vsum) / cnt}

    @_coordinated
    def extended_stats(self, database: str, table: str, query, field: str,
                       precision: str = "float32") -> dict:
        """:meth:`field_stats` plus second-moment statistics (the
        elasticsearch ``extended_stats`` aggregation shape; extension —
        the reference exposes no aggregation API): ``sum_of_squares``,
        population ``variance`` = Σv²/n − mean² (the documented ES naive
        float64 formula, clamped at 0 against rounding) and
        ``std_deviation`` = √variance.

        Scale shape identical to field_stats: each bucket ships ONE
        (count, min, max, sum, sumsq) partial; the driver fold is
        O(buckets). Keyword recall only (filters supported)."""
        import math

        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("extended_stats takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("extended_stats is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.stats_keyword.remote(q.__dict__, field, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.stats_keyword(q, field, precision)
                     for s in self._searchers(database, table)]
        parts = [p for p in parts if p["cnt"]]
        cnt = sum(p["cnt"] for p in parts)
        if cnt == 0:
            return {"count": 0, "min": None, "max": None, "sum": None,
                    "mean": None, "sum_of_squares": None, "variance": None,
                    "std_deviation": None}
        vsum = sum(p["sum"] for p in parts)
        sumsq = math.fsum(p["sumsq"] for p in parts)
        mean = float(vsum) / cnt
        variance = max(0.0, sumsq / cnt - mean * mean)
        return {"count": cnt, "min": min(p["min"] for p in parts),
                "max": max(p["max"] for p in parts), "sum": vsum,
                "mean": mean, "sum_of_squares": sumsq,
                "variance": variance,
                "std_deviation": math.sqrt(variance)}

    @_coordinated
    def composite_agg(self, database: str, table: str, query, field: str,
                      size: int = 10, after: str | None = None,
                      precision: str = "float32") -> dict:
        """Paginated terms buckets over a keyword query's ENTIRE match set
        (the elasticsearch ``composite`` aggregation shape, single terms
        source; extension): buckets in ASCENDING key order, ``size`` per
        page, resumable with ``after`` (the previous page's ``after_key``).
        Returns ``{"buckets": [{"key", "count"}, ...], "after_key"}`` —
        ``after_key`` is None once the key space is exhausted (fewer than
        ``size`` buckets came back). Keys are strings (facet-label
        convention); nulls don't count; multi-valued fields count once per
        distinct element.

        Scale shape — THE high-cardinality terms answer: unlike
        facet_counts' full-vocabulary partial, each bucket ships at most
        ``size`` (value, count) rows per page (its first ``size`` keys
        after the cursor — exactness argued in ``composite_keyword``), so
        paging a billion-key field costs O(buckets × size) per page.
        Keyword recall only (filters supported)."""
        if int(size) < 1:
            raise ValueError("size must be >= 1")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("composite_agg takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("composite_agg is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.composite_keyword.remote(q.__dict__, field, int(size),
                                               after, precision)
                    for a in self._actors[(database, table)]]
            tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                    for t in r]
        else:
            tbls = [s.composite_keyword(q, field, int(size), after,
                                        precision)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        if not tbls:
            return {"buckets": [], "after_key": None}
        df = pa.concat_tables(tbls).to_pandas()
        agg = df.groupby("value", as_index=False)["cnt"].sum() \
            .sort_values("value", kind="mergesort").head(int(size))
        buckets = [{"key": str(r.value), "count": int(r.cnt)}
                   for r in agg.itertuples()]
        exhausted = len(buckets) < int(size)
        return {"buckets": buckets,
                "after_key": None if (exhausted or not buckets)
                else buckets[-1]["key"]}

    @_coordinated
    def filters_agg(self, database: str, table: str, query, filters: dict,
                    other_bucket: bool = False,
                    precision: str = "float32") -> list[dict]:
        """Named-filter buckets over a keyword query's ENTIRE match set
        (the elasticsearch ``filters`` aggregation shape; extension): for
        each ``{name: filter_tree}`` entry, the count of match-set docs
        also satisfying that tree (trees use the full filter DSL incl. the
        not/exists extensions). Buckets are INDEPENDENT — a doc may count
        in several (unlike ``terms``); ``other_bucket=True`` appends an
        ``_other_`` bucket counting match-set docs satisfying none.
        Returns ``[{"key", "count"}, ...]`` in the given filter order.

        Scale shape: each bucket ships len(filters)(+1) integers — match
        ids never leave the shard; the driver fold is O(buckets × F).
        Keyword recall only (query filters supported and compose: the
        query's own filter gates the match set first)."""
        if not filters:
            raise ValueError("filters_agg needs at least one named filter")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("filters_agg takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("filters_agg is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.filters_agg_keyword.remote(q.__dict__, filters,
                                                 other_bucket, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.filters_agg_keyword(q, filters, other_bucket,
                                           precision)
                     for s in self._searchers(database, table)]
        keys = list(filters) + (["_other_"] if other_bucket else [])
        return [{"key": k, "count": sum(p.get(k, 0) for p in parts)}
                for k in keys]

    @_coordinated
    def adjacency_matrix(self, database: str, table: str, query,
                         filters: dict, separator: str = "&",
                         precision: str = "float32") -> list[dict]:
        """Intersection counts of named filters over a keyword query's
        ENTIRE match set (the elasticsearch ``adjacency_matrix``
        aggregation shape; extension — the reference exposes no
        aggregation API): one bucket per named filter plus one per
        unordered pair ``a{sep}b`` (names in given order) counting docs
        satisfying BOTH. Zero-count buckets are dropped (ES semantics).
        Returns ``[{"key", "count"}, ...]`` — singles in filter order,
        then pairs in combination order.

        Scale shape: each bucket ships F + F·(F−1)/2 integers — match ids
        never leave the shard; the driver fold is O(buckets × F²). ES caps
        F at 100 for the same quadratic reason; so do we. Keyword recall
        only (query filters compose: they gate the match set first)."""
        if not filters:
            raise ValueError("adjacency_matrix needs at least one filter")
        if len(filters) > 100:
            raise ValueError("adjacency_matrix caps at 100 filters "
                             "(the elasticsearch limit — buckets grow "
                             "quadratically)")
        if separator and any(separator in k for k in filters):
            raise ValueError(
                f"filter names must not contain the separator {separator!r}")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("adjacency_matrix takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("adjacency_matrix is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.adjacency_keyword.remote(q.__dict__, filters,
                                               separator, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.adjacency_keyword(q, filters, separator, precision)
                     for s in self._searchers(database, table)]
        names = list(filters)
        keys = names + [f"{names[i]}{separator}{names[j]}"
                        for i in range(len(names))
                        for j in range(i + 1, len(names))]
        out = [{"key": k, "count": sum(p.get(k, 0) for p in parts)}
               for k in keys]
        return [o for o in out if o["count"] > 0]

    @_coordinated
    def top_metrics(self, database: str, table: str, query,
                    sort_field: str, metric_fields: list,
                    ascending: bool = False, size: int = 1,
                    precision: str = "float32") -> list[dict]:
        """Metric values at the extreme of a sort field over a keyword
        query's ENTIRE match set (the elasticsearch ``top_metrics``
        aggregation shape; extension): the ``metric_fields`` values of the
        top ``size`` match-set docs ordered by ``sort_field``
        (asc/desc, ties doc_id asc — deterministic where ES is not).
        Returns ``[{"doc_id", "sort_value", <metric>: …}, ...]`` in rank
        order; metric values are float64 (timestamps as epoch micros),
        null where the doc misses the field. Docs with a null sort value
        never rank (they sort past any finite top).

        Scale shape: each bucket ships ≤ size narrow rows — the match set
        never leaves the shard; the driver re-sort is O(buckets × size).
        Keyword recall only (filters supported)."""
        if int(size) < 1:
            raise ValueError("size must be >= 1")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("top_metrics takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("top_metrics is keyword-only")
        metric_fields = list(metric_fields)
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.top_metrics_keyword.remote(q.__dict__, sort_field,
                                                 metric_fields,
                                                 bool(ascending), int(size),
                                                 precision)
                    for a in self._actors[(database, table)]]
            tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                    for t in r]
        else:
            tbls = [s.top_metrics_keyword(q, sort_field, metric_fields,
                                          bool(ascending), int(size),
                                          precision)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        if not tbls:
            return []
        t = pa.concat_tables(tbls)
        sv = t["sort_value"].to_numpy(zero_copy_only=False)
        dids = t["doc_id"].to_numpy()
        order = np.lexsort((dids, sv if ascending else -sv))[:int(size)]
        fields = [f for f in metric_fields if f != sort_field]
        out = []
        for i in order:
            row = {"doc_id": int(dids[i]), "sort_value": float(sv[i])}
            for f in fields:
                v = t[f][int(i)].as_py()
                row[f] = None if v is None else float(v)
            out.append(row)
        return out

    @_coordinated
    def string_stats(self, database: str, table: str, query, field: str,
                     precision: str = "float32") -> dict:
        """String statistics of a stored OR analyzed string field over a
        keyword query's ENTIRE match set (the elasticsearch
        ``string_stats`` aggregation shape; extension): ``count`` (docs
        with a non-null value), ``min_length`` / ``max_length`` /
        ``avg_length`` in CHARACTERS, and ``entropy`` — the Shannon
        entropy (log2) of the character distribution across all matched
        values (the ES show_distribution source domain).

        Scale shape: each bucket ships one (count, Σlen, min, max) tuple
        plus a codepoint histogram bounded by alphabet size — values never
        leave the shard; the driver folds histograms and computes entropy
        once. Keyword recall only (filters supported)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("string_stats takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("string_stats is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.string_stats_keyword.remote(q.__dict__, field,
                                                  precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.string_stats_keyword(q, field, precision)
                     for s in self._searchers(database, table)]
        parts = [p for p in parts if p["cnt"]]
        cnt = sum(p["cnt"] for p in parts)
        if cnt == 0:
            return {"count": 0, "min_length": None, "max_length": None,
                    "avg_length": None, "entropy": 0.0}
        sum_len = sum(p["sum_len"] for p in parts)
        chars: dict[int, int] = {}
        for p in parts:
            for cp, c in p["chars"].items():
                chars[cp] = chars.get(cp, 0) + c
        total = float(sum(chars.values()))
        entropy = 0.0
        if total > 0:
            ps = np.asarray(list(chars.values()), np.float64) / total
            entropy = float(-np.sum(ps * np.log2(ps)))
        return {"count": cnt,
                "min_length": min(p["min_len"] for p in parts),
                "max_length": max(p["max_len"] for p in parts),
                "avg_length": float(sum_len) / cnt,
                "entropy": entropy}

    @_coordinated
    def matrix_stats(self, database: str, table: str, query, fields: list,
                     precision: str = "float32") -> dict:
        """Multi-field joint statistics over a keyword query's ENTIRE match
        set (the elasticsearch ``matrix_stats`` aggregation shape; the
        reference exposes no aggregation API: extension). Over ROW-COMPLETE
        docs (every requested field non-null — the ES missing-doc
        exclusion), returns::

            {"doc_count": n,
             "fields": {f: {"mean", "variance"}},          # population
             "covariance":  {f1: {f2: cov}},               # symmetric
             "correlation": {f1: {f2: corr}}}              # Pearson

        with the documented naive-float64 arithmetic (SQL-replicable op
        order, like extended_stats): mean = Σv/n, var = Σv²/n − mean²
        (clamped at 0), cov = Σ(v_i·v_j)/n − mean_i·mean_j,
        corr = cov/√(var_i·var_j) (None when either variance is 0).
        POPULATION moments — a documented divergence from elasticsearch's
        sample (n−1) estimators; timestamps aggregate as epoch micros.

        Scale shape: each bucket ships ONE k + k·(k+1)/2 + 1 value partial
        (joint moment sums) — match ids never leave the shard; the driver
        fold is O(buckets · k²)."""
        import math

        fields = list(fields)
        if len(fields) < 2:
            raise ValueError("matrix_stats needs at least two fields")
        if len(set(fields)) != len(fields):
            raise ValueError("matrix_stats fields must be distinct")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("matrix_stats takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("matrix_stats is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.matrix_stats_keyword.remote(q.__dict__, fields,
                                                  precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.matrix_stats_keyword(q, fields, precision)
                     for s in self._searchers(database, table)]
        k = len(fields)
        n = sum(p["n"] for p in parts)
        if n == 0:
            return {"doc_count": 0, "fields": {}, "covariance": {},
                    "correlation": {}}
        sums = np.sum([p["sums"] for p in parts], axis=0)
        prods = np.sum([p["prods"] for p in parts], axis=0)
        means = [float(sums[i]) / n for i in range(k)]
        # upper-triangle index of (i, j), i <= j
        tri = {}
        t = 0
        for i in range(k):
            for j in range(i, k):
                tri[(i, j)] = t
                t += 1
        var = [max(0.0, float(prods[tri[(i, i)]]) / n - means[i] * means[i])
               for i in range(k)]
        cov: dict[str, dict[str, float]] = {f: {} for f in fields}
        corr: dict[str, dict] = {f: {} for f in fields}
        for i in range(k):
            for j in range(i, k):
                c = (var[i] if i == j
                     else float(prods[tri[(i, j)]]) / n - means[i] * means[j])
                cov[fields[i]][fields[j]] = c
                cov[fields[j]][fields[i]] = c
                r = (c / math.sqrt(var[i] * var[j])
                     if var[i] > 0.0 and var[j] > 0.0 else None)
                corr[fields[i]][fields[j]] = r
                corr[fields[j]][fields[i]] = r
        return {"doc_count": int(n),
                "fields": {f: {"mean": means[i], "variance": var[i]}
                           for i, f in enumerate(fields)},
                "covariance": cov, "correlation": corr}

    @_coordinated
    def weighted_avg(self, database: str, table: str, query,
                     value_field: str, weight_field: str,
                     precision: str = "float32") -> dict:
        """Weighted average of a stored numeric field over a keyword
        query's ENTIRE match set (the elasticsearch ``weighted_avg``
        aggregation shape; extension). Docs where either field is null are
        skipped (the ES default). Returns ``{"count", "weighted_avg"}``
        (None when Σweight is 0) with float64 Σ(v·w)/Σw arithmetic.

        Scale shape: ONE 3-value partial per bucket; match ids never leave
        the shard."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("weighted_avg takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("weighted_avg is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.weighted_avg_keyword.remote(q.__dict__, value_field,
                                                  weight_field, precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.weighted_avg_keyword(q, value_field, weight_field,
                                            precision)
                     for s in self._searchers(database, table)]
        n = sum(p["n"] for p in parts)
        vw = float(np.sum([p["vw"] for p in parts]))
        w = float(np.sum([p["w"] for p in parts]))
        return {"count": int(n),
                "weighted_avg": (vw / w) if w != 0.0 else None}

    @_coordinated
    def rare_terms(self, database: str, table: str, query, field: str,
                   max_doc_count: int = 1, limit: int = 10,
                   precision: str = "float32") -> list[dict]:
        """Rare-terms aggregation (the elasticsearch ``rare_terms`` shape;
        extension): values of a stored field appearing in at most
        ``max_doc_count`` docs of a keyword query's ENTIRE match set,
        ranked by (count asc, value asc), top ``limit``. EXACT — unlike
        elasticsearch's CuckooFilter approximation. Nulls don't count;
        multi-valued fields count once per distinct element.

        Scale shape — bounded two-phase fold, never a full-vocabulary
        partial: phase 1 ships each bucket's LOCALLY-RARE values only
        (local count ≤ max_doc_count — a value with global count ≤
        max_doc_count necessarily clears that cut in every bucket, so the
        candidate union is a superset of the answer; common values never
        leave their shard). Phase 2 probes every bucket for the exact
        global counts of the candidates, dropping
        locally-rare-but-globally-common values. Per-bucket shipping is
        O(locally-rare vocabulary + candidates) — on a high-cardinality
        field that is the answer's own order of magnitude, not the match
        set's vocabulary (elasticsearch bounds the same phase with
        max_doc_count ≤ 100 for the same reason).

        Returns ``[{"value", "count"}, ...]``."""
        if int(max_doc_count) < 1:
            raise ValueError("max_doc_count must be >= 1")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("rare_terms takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("rare_terms is keyword-only")
        use_actors = (database, table) in self._actors
        M_ = int(max_doc_count)
        if use_actors:
            import ray
            futs = [a.rare_partial_keyword.remote(q.__dict__, field, M_,
                                                  precision)
                    for a in self._actors[(database, table)]]
            tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                    for t in r]
        else:
            tbls = [s.rare_partial_keyword(q, field, M_, precision)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        if not tbls:
            return []
        cand = pc.unique(
            pa.concat_tables(tbls)["value"].combine_chunks()).to_pylist()
        if use_actors:
            import ray
            futs = [a.facet_probe_keyword.remote(q.__dict__, field, cand,
                                                 precision)
                    for a in self._actors[(database, table)]]
            probes = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                      for t in r]
        else:
            probes = [s.facet_probe_keyword(q, field, cand, precision)
                      for s in self._searchers(database, table)]
        probes = [t for t in probes if len(t)]
        if not probes:
            return []
        df = pa.concat_tables(probes).to_pandas()
        agg = df.groupby("value", as_index=False)["cnt"].sum()
        agg = agg[agg["cnt"] <= M_] \
            .sort_values(["cnt", "value"], ascending=[True, True],
                         kind="mergesort")
        return [{"value": str(r.value), "count": int(r.cnt)}
                for r in agg.head(limit).itertuples()]

    @_coordinated
    def date_histogram(self, database: str, table: str, query, field: str,
                       interval: int, offset: int = 0,
                       min_doc_count: int = 1,
                       precision: str = "float32") -> list[dict]:
        """Fixed-interval histogram of a stored timestamp/integer field over
        a keyword query's ENTIRE match set (the elasticsearch
        ``date_histogram`` fixed_interval / ``histogram`` aggregation shape;
        the reference exposes no aggregation API: extension). Bucket key =
        floor((v - offset) / interval) · interval + offset, computed on the
        column's integer domain — timestamps bucket as epoch MICROseconds
        (timestamp[us] storage), so ``interval=86_400_000_000`` is one UTC
        day. Returns ``[{"bucket", "count"}, ...]`` in ascending bucket
        order; with ``min_doc_count=0`` the gaps between the first and last
        non-empty bucket are zero-filled (elasticsearch gap-fill semantics;
        the default 1 returns only non-empty buckets). Nulls don't count.

        Scale shape: each bucket ships only its (bucket, count) pairs —
        match ids never leave the shard; the driver fold is
        O(buckets × distinct bins). Keyword recall only (filters supported),
        like facet_counts."""
        if int(interval) <= 0:
            raise ValueError("interval must be a positive integer")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("date_histogram takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("date_histogram is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.histogram_keyword.remote(q.__dict__, field,
                                               int(interval), int(offset),
                                               precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.histogram_keyword(q, field, int(interval),
                                         int(offset), precision)
                     for s in self._searchers(database, table)]
        parts = [p for p in parts if len(p)]
        if not parts:
            return []
        t = pa.concat_tables(parts)
        agg = t.group_by("bucket").aggregate([("cnt", "sum")]) \
            .sort_by("bucket")
        buckets = agg["bucket"].to_numpy()
        counts = agg["cnt_sum"].to_numpy()
        if int(min_doc_count) <= 0 and buckets.size:
            step = np.int64(interval)
            full = np.arange(buckets[0], buckets[-1] + step, step,
                             dtype=np.int64)
            filled = np.zeros(full.size, np.int64)
            filled[(buckets - buckets[0]) // step] = counts
            buckets, counts = full, filled
        return [{"bucket": int(b), "count": int(c)}
                for b, c in zip(buckets, counts)]

    # fixed-interval ladder for auto_date_histogram, epoch MICROseconds
    # (the elasticsearch auto_date_histogram rounding set with the three
    # calendar units approximated as fixed 30d/90d/365d — a documented
    # divergence that keeps the choice SQL-replicable)
    _AUTO_HISTO_LADDER = (
        1_000_000, 5_000_000, 10_000_000, 30_000_000,          # 1/5/10/30 s
        60_000_000, 300_000_000, 600_000_000, 1_800_000_000,   # 1/5/10/30 m
        3_600_000_000, 10_800_000_000, 43_200_000_000,         # 1/3/12 h
        86_400_000_000, 604_800_000_000,                       # 1 d, 7 d
        2_592_000_000_000, 7_776_000_000_000,                  # 30 d, 90 d
        31_536_000_000_000)                                    # 365 d

    @_coordinated
    def auto_date_histogram(self, database: str, table: str, query,
                            field: str, buckets: int = 10,
                            precision: str = "float32") -> dict:
        """Date histogram that PICKS its interval (the elasticsearch
        ``auto_date_histogram`` shape; extension): the smallest interval
        of the fixed ladder whose floor-rounded bucket count
        ``floor(max/iv) − floor(min/iv) + 1`` fits within ``buckets``
        (falling back to the largest rung when nothing fits). Returns
        ``{"interval", "buckets": [{"bucket", "count"}, ...]}`` — buckets
        ascending, gaps zero-filled (the ES auto shape always emits the
        contiguous range). Timestamps bucket as epoch microseconds.

        Scale shape: ONE 4-value stats partial per shard picks the
        interval, then one date_histogram pass (bin-bounded partials) —
        two scatter/gather rounds total. Keyword recall only."""
        if int(buckets) < 1:
            raise ValueError("buckets must be >= 1")
        st = self.field_stats(database, table, query, field,
                              precision=precision)
        if st["count"] == 0:
            return {"interval": None, "buckets": []}
        mn, mx = int(st["min"]), int(st["max"])
        iv = self._AUTO_HISTO_LADDER[-1]
        for cand in self._AUTO_HISTO_LADDER:
            if (mx // cand) - (mn // cand) + 1 <= int(buckets):
                iv = cand
                break
        bins = self.date_histogram(database, table, query, field,
                                   interval=iv, min_doc_count=0,
                                   precision=precision)
        return {"interval": iv, "buckets": bins}

    @_coordinated
    def terms_stats(self, database: str, table: str, query, key_field: str,
                    metric_field: str, limit: int = 10,
                    precision: str = "float32") -> list[dict]:
        """Terms aggregation with a numeric metric sub-aggregation over a
        keyword query's ENTIRE match set (the elasticsearch ``terms`` bucket
        agg + ``value_count``/``sum``/``avg`` sub-agg shape; the reference
        exposes no aggregation API: extension). Per distinct ``key_field``
        value: ``count`` (docs in the bucket), ``metric_count`` (docs with a
        non-null metric), ``metric_sum`` and ``metric_avg`` (sum/count in
        float64, None when metric_count is 0). Ranked by (count desc, key
        asc), top ``limit``. Docs with a null key don't count (elasticsearch
        missing-value semantics).

        Scale shape — EXACT and bounded (round-5: the composable
        ``aggregate`` pass under the legacy result shape): phase 1 selects
        the top-``limit`` keys with facet_counts' threshold fold (never a
        vocabulary-sized partial), phase 2 ships ≤ |keys| metric-moment
        rows per bucket (``bucket_metrics_keyword``). Keyword recall only
        (filters supported)."""
        res = self.aggregate(
            database, table, query,
            {"terms": {"field": key_field, "size": int(limit)}},
            {"m": {"stats": {"field": metric_field}}},
            precision=precision)
        out = []
        for b in res["buckets"]:
            mcnt = int(b["m"]["count"])
            out.append({"key": str(b["key"]), "count": int(b["doc_count"]),
                        "metric_count": mcnt,
                        "metric_sum": float(b["m"]["sum"]),
                        "metric_avg": (float(b["m"]["sum"]) / mcnt) if mcnt
                        else None})
        return out

    _METRIC_KINDS = ("avg", "sum", "min", "max", "value_count", "stats",
                     "extended_stats")

    @_coordinated
    def aggregate(self, database: str, table: str, query, source: dict,
                  aggs: dict, precision: str = "float32") -> dict:
        """Composable bucket aggregation with nested sub-aggregations (the
        elasticsearch bucket-agg × sub-agg composition the fixed two-phase
        shapes — terms_stats, top_hits — special-case; the reference
        exposes no aggregation API: extension). ``source`` picks ONE
        bucketing:

            {"terms":          {"field": f, "size": n}}
            {"composite":      {"field": f, "size": n, "after": key|None}}
            {"date_histogram": {"field": f, "interval": i, "offset": o,
                                "min_doc_count": m}}

        and ``aggs`` maps result names to sub-aggregations over each
        bucket's ENTIRE match-set slice:

            {"<name>": {"avg"|"sum"|"min"|"max"|"value_count"|"stats"|
                        "extended_stats": {"field": f}}}
            {"<name>": {"top_hits": {"size": n}}}     # terms/composite only
            {"<name>": {"terms"|"composite"|"date_histogram": {...},
                        "aggs": {...}}}   # NESTED bucket agg, any depth —
                                          # outer must be terms/composite
                                          # on a string-typed key field

        Returns ``{"buckets": [{"key", "doc_count", "<name>": …}, ...]}``
        (+ ``after_key`` for composite) in the source's bucket order —
        terms by (count desc, key asc), composite/histogram by key asc.
        ``stats`` folds to {count,min,max,sum,avg}; ``extended_stats`` adds
        {sum_of_squares, variance, std_deviation} (population, the naive
        float64 ES formula). Sums are float64 (exact for integer columns
        while |Σ| < 2^53); timestamps aggregate as epoch microseconds;
        null metric values don't count (SQL COUNT(col) semantics); docs
        with a null bucket key belong to no bucket.

        Scale shape — two bounded scatter/gather rounds: phase 1 selects
        the bucket keys with the BOUNDED fold of the underlying source
        (facet_counts' threshold algorithm / composite's paged partial /
        the histogram's bin-bounded partial — never a vocabulary-sized
        ship); phase 2 ships per bucket at most |keys| × |metric fields|
        moment rows (``bucket_metrics_keyword``) plus, for top_hits,
        |keys| × size hit rows (``tophits_keyword``, exact per the
        per-key top-k argument). Keyword recall only (filters
        supported)."""
        if len(source) != 1:
            raise ValueError("source must contain exactly one bucketing")
        kind, spec = next(iter(source.items()))
        if kind not in ("terms", "composite", "date_histogram"):
            raise ValueError(f"unknown bucket source {kind!r}")
        if not aggs:
            raise ValueError("aggs must name at least one sub-aggregation")
        metric_aggs: dict[str, tuple[str, str]] = {}
        hit_aggs: dict[str, int] = {}
        nested_aggs: dict[str, tuple[dict, dict]] = {}
        for name, sub in aggs.items():
            inner_src = {k: v for k, v in sub.items()
                         if k in ("terms", "composite", "date_histogram")}
            if inner_src:
                # nested bucket agg: {"terms": {...}, "aggs": {...}} — any
                # depth; each outer bucket recurses with its key pushed
                # down as a filter (see the fold below)
                if len(inner_src) != 1 or set(sub) - set(inner_src) - \
                        {"aggs"}:
                    raise ValueError(
                        f"nested bucket agg {name!r} must be one bucket "
                        "source plus an optional 'aggs'")
                if kind == "date_histogram":
                    raise ValueError(
                        "nested bucket aggregations need a terms/composite "
                        "OUTER source (the outer key pushes down as an "
                        "exact-value filter; histogram bins are ranges)")
                nested_aggs[name] = (inner_src, sub.get("aggs") or {})
                continue
            if len(sub) != 1:
                raise ValueError(
                    f"sub-aggregation {name!r} must have exactly one kind")
            skind, sspec = next(iter(sub.items()))
            if skind == "top_hits":
                if kind == "date_histogram":
                    raise ValueError(
                        "top_hits composes with terms/composite sources "
                        "(histogram bins are not stored field values)")
                hit_aggs[name] = max(1, int(sspec.get("size", 3)))
            elif skind in self._METRIC_KINDS:
                metric_aggs[name] = (skind, str(sspec["field"]))
            else:
                raise ValueError(f"unknown sub-aggregation kind {skind!r}")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("aggregate takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("aggregate is keyword-only")
        key_field = str(spec["field"])

        # ---- phase 1: bounded bucket-key selection ----
        after_key = None
        if kind == "terms":
            sel = self.facet_counts(database, table, q, key_field,
                                    limit=int(spec.get("size", 10)),
                                    precision=precision)
            buckets = [(b["value"], b["count"]) for b in sel]
        elif kind == "composite":
            page = self.composite_agg(database, table, q, key_field,
                                      size=int(spec.get("size", 10)),
                                      after=spec.get("after"),
                                      precision=precision)
            buckets = [(b["key"], b["count"]) for b in page["buckets"]]
            after_key = page["after_key"]
        else:
            bins = self.date_histogram(
                database, table, q, key_field,
                interval=int(spec["interval"]),
                offset=int(spec.get("offset", 0)),
                min_doc_count=int(spec.get("min_doc_count", 1)),
                precision=precision)
            buckets = [(b["bucket"], b["count"]) for b in bins]
        if not buckets:
            out = {"buckets": []}
            if kind == "composite":
                out["after_key"] = None
            return out
        key_strs = [str(k) for k, _ in buckets]

        # ---- phase 2: bounded per-key partials for the sub-aggs ----
        folded: dict[tuple[str, str], dict] = {}
        if metric_aggs:
            fields = sorted({f for _, f in metric_aggs.values()})
            if kind == "date_histogram":
                key_spec = {"kind": "histogram", "field": key_field,
                            "interval": int(spec["interval"]),
                            "offset": int(spec.get("offset", 0))}
            else:
                key_spec = {"kind": "terms", "field": key_field}
            use_actors = (database, table) in self._actors
            if use_actors:
                import ray
                futs = [a.bucket_metrics_keyword.remote(
                            q.__dict__, key_spec, key_strs, fields, precision)
                        for a in self._actors[(database, table)]]
                parts = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                         for t in r]
            else:
                parts = [s.bucket_metrics_keyword(q, key_spec, key_strs,
                                                  fields, precision)
                         for s in self._searchers(database, table)]
            parts = [t for t in parts if len(t)]
            if parts:
                df = pa.concat_tables(parts).to_pandas()
                g = df.groupby(["key", "field"], as_index=False).agg(
                    mcnt=("mcnt", "sum"), msum=("msum", "sum"),
                    mmin=("mmin", "min"), mmax=("mmax", "max"),
                    msumsq=("msumsq", "sum"))
                for r in g.itertuples():
                    folded[(str(r.key), str(r.field))] = {
                        "count": int(r.mcnt), "sum": float(r.msum),
                        "min": float(r.mmin), "max": float(r.mmax),
                        "sumsq": float(r.msumsq)}
        hits_by_key: dict[str, dict[str, list]] = {}
        for name, per_key in hit_aggs.items():
            # per-key top hits for THIS source's keys (phase-1 selection may
            # be a composite page, not the top-by-count keys top_hits picks)
            use_actors = (database, table) in self._actors
            if use_actors:
                import ray
                futs = [a.tophits_keyword.remote(q.__dict__, key_field,
                                                 key_strs, per_key, precision)
                        for a in self._actors[(database, table)]]
                tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                        for t in r]
            else:
                tbls = [s.tophits_keyword(q, key_field, key_strs, per_key,
                                          precision)
                        for s in self._searchers(database, table)]
            tbls = [t for t in tbls if len(t)]
            per: dict[str, list] = {k: [] for k in key_strs}
            if tbls:
                t = pa.concat_tables(tbls)
                ids = t["doc_id"].to_numpy()
                scores = t["score"].to_numpy()
                kcol = t["key"].to_pylist()
                order = np.lexsort((ids, -scores.astype(np.float64)))
                for i in order:
                    lst = per.get(kcol[int(i)])
                    if lst is not None and len(lst) < per_key:
                        lst.append({"doc_id": int(ids[i]),
                                    "_score": float(scores[i])})
            hits_by_key[name] = per

        # ---- nested bucket sub-aggs: recurse per outer key with the key
        # pushed down as an exact-value filter (string-typed key fields —
        # the facet-label convention; the filter composes with the query's
        # own tree, so the inner match set is exactly the outer bucket).
        # Cost: |outer keys| bounded inner passes — the exactness-per-level
        # price; ES's per-shard shard_size heuristic trades that for
        # approximation, this engine keeps every level exact.
        nested_by_key: dict[str, dict] = {}
        if nested_aggs:
            from dataclasses import replace as _replace

            from byzer_retrieval_ray.functions.queryparser import parse_keyword

            # Filter semantics pitfall: a pure-SHOULD keyword with a filter
            # follows ES bool{should, filter} msm=0 — filter-only docs
            # enter at score 0, which would make the inner bucket "all
            # docs with the outer key" instead of "the outer bucket".
            # Bump min_should_match to 1 for exactly that case (keyword
            # matching then gates, reproducing the filterless match set ∩
            # key). Match-all, must-bearing, already-filtered or msm≥1
            # queries intersect correctly as-is.
            kw = (q.keyword or "").strip()
            bump_msm = (not q.filters
                        and int(q.min_should_match or 0) == 0
                        and kw not in ("", "*")
                        and not parse_keyword(kw)._has_must())
            for name, (src, inner) in nested_aggs.items():
                per: dict = {}
                for (key, _cnt), kstr_ in zip(buckets, key_strs):
                    leaf = {"field": key_field, "value": key}
                    subf = {"and": [q.filters, leaf]} if q.filters \
                        else {"and": [leaf]}
                    subq = _replace(q, filters=subf,
                                    min_should_match=(
                                        1 if bump_msm
                                        else q.min_should_match))
                    if inner:
                        per[kstr_] = self.aggregate(database, table, subq,
                                                    src, inner,
                                                    precision=precision)
                        continue
                    ikind, ispec = next(iter(src.items()))
                    if ikind == "terms":
                        sel = self.facet_counts(
                            database, table, subq, str(ispec["field"]),
                            limit=int(ispec.get("size", 10)),
                            precision=precision)
                        per[kstr_] = {"buckets": [
                            {"key": b["value"], "doc_count": b["count"]}
                            for b in sel]}
                    elif ikind == "composite":
                        page = self.composite_agg(
                            database, table, subq, str(ispec["field"]),
                            size=int(ispec.get("size", 10)),
                            after=ispec.get("after"), precision=precision)
                        per[kstr_] = {
                            "buckets": [{"key": b["key"],
                                         "doc_count": b["count"]}
                                        for b in page["buckets"]],
                            "after_key": page["after_key"]}
                    else:
                        bins = self.date_histogram(
                            database, table, subq, str(ispec["field"]),
                            interval=int(ispec["interval"]),
                            offset=int(ispec.get("offset", 0)),
                            min_doc_count=int(ispec.get("min_doc_count", 1)),
                            precision=precision)
                        per[kstr_] = {"buckets": [
                            {"key": b["bucket"], "doc_count": b["count"]}
                            for b in bins]}
                nested_by_key[name] = per

        # ---- fold ----
        import math
        out_buckets = []
        for (key, cnt), kstr_ in zip(buckets, key_strs):
            row: dict = {"key": key, "doc_count": int(cnt)}
            for name, (mk, f) in metric_aggs.items():
                p = folded.get((kstr_, f))
                n = p["count"] if p else 0
                if mk == "value_count":
                    row[name] = n
                elif mk == "sum":
                    row[name] = p["sum"] if p else 0.0
                elif mk == "min":
                    row[name] = p["min"] if p else None
                elif mk == "max":
                    row[name] = p["max"] if p else None
                elif mk == "avg":
                    row[name] = (p["sum"] / n) if n else None
                else:
                    st = {"count": n,
                          "min": p["min"] if n else None,
                          "max": p["max"] if n else None,
                          "sum": p["sum"] if p else 0.0,
                          "avg": (p["sum"] / n) if n else None}
                    if mk == "extended_stats":
                        if n:
                            mean = p["sum"] / n
                            var = max(0.0, p["sumsq"] / n - mean * mean)
                            st.update({"sum_of_squares": p["sumsq"],
                                       "variance": var,
                                       "std_deviation": math.sqrt(var)})
                        else:
                            st.update({"sum_of_squares": None,
                                       "variance": None,
                                       "std_deviation": None})
                    row[name] = st
            for name in hit_aggs:
                row[name] = hits_by_key[name][kstr_]
            for name in nested_aggs:
                row[name] = nested_by_key[name][kstr_]
            out_buckets.append(row)
        out = {"buckets": out_buckets}
        if kind == "composite":
            out["after_key"] = after_key
        return out

    @_coordinated
    def percentiles(self, database: str, table: str, query, field: str,
                    qs: list[float], n_candidates: int = 256,
                    collect_limit: int = 4096, max_rounds: int = 8,
                    precision: str = "float32",
                    _center: float | None = None) -> list[dict]:
        """EXACT percentiles of a stored numeric/timestamp field over a
        keyword query's ENTIRE match set (the elasticsearch ``percentiles``
        aggregation shape — but exact where elasticsearch serves a t-digest
        approximation). Each q maps to the 0-based rank floor(q · (n-1)) of
        the sorted values (the "lower" discrete quantile — ops/quantiles
        semantics; mirror row_number() = rank+1 in SQL). Nulls don't count;
        timestamps select in the epoch-microsecond domain; values compare
        as float64 (int64 magnitudes above 2^53 lose ulps). Returns
        ``[{"q", "value"}, ...]`` in input order; NaN values when the match
        set is empty.

        Algorithm (distributed selection, the ops/quantiles narrowing): per
        round ONE searcher call per bucket answers EVERY open quantile's
        (lo, hi, edges) bracket from a single exact TAAT + one narrow
        docstore read, shipping (n_candidates+1) int64 counts per bracket —
        values never leave the shard; the driver folds counts and narrows
        each bracket to the bucket containing its rank. When a bracket's
        population is ≤ ``collect_limit`` the surviving values are pulled
        once (bounded payload) and the exact rank statistic is read off.
        Rounds: log_{n_candidates}(n / collect_limit) — two rounds bracket
        10^9 matches at the defaults. Each round re-runs the bucket TAAT
        (same re-scan discipline as ops/quantiles' per-round dataset pass);
        keyword recall only (filters supported)."""
        qs_in = [float(x) for x in qs]
        if not qs_in or any(not 0.0 <= x <= 1.0 for x in qs_in):
            raise ValueError("qs must be fractions in [0, 1]")
        queries = self._as_queries(database, table, query)
        if len(queries) != 1:
            raise ValueError("percentiles takes exactly one query")
        q = queries[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("percentiles is keyword-only")
        use_actors = (database, table) in self._actors

        def fold_counts(brackets: list) -> list[np.ndarray]:
            if use_actors:
                import ray
                futs = [a.range_counts_keyword.remote(q.__dict__, field,
                                                      brackets, precision,
                                                      _center)
                        for a in self._actors[(database, table)]]
                parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                         for p in r]
            else:
                parts = [s.range_counts_keyword(q, field, brackets,
                                                precision, _center)
                         for s in self._searchers(database, table)]
            return [np.sum([p[i] for p in parts], axis=0)
                    for i in range(len(brackets))]

        def pull_values(ranges: list) -> list[np.ndarray]:
            if use_actors:
                import ray
                futs = [a.range_values_keyword.remote(
                            q.__dict__, field, ranges, int(collect_limit),
                            precision, _center)
                        for a in self._actors[(database, table)]]
                parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                         for p in r]
            else:
                parts = [s.range_values_keyword(q, field, ranges,
                                                int(collect_limit), precision,
                                                _center)
                         for s in self._searchers(database, table)]
            return [np.concatenate([p[i] for p in parts])
                    for i in range(len(ranges))]

        st = self.field_stats(database, table, query, field,
                              precision=precision)
        n = int(st["count"])
        if n == 0:
            return [{"q": x, "value": float("nan")} for x in qs_in]
        glo, ghi = float(st["min"]), float(st["max"])
        if _center is not None:
            # selection runs in the |v − center| domain: its global bracket
            # is derivable from the raw min/max without another pass
            c = float(_center)
            lo_d = 0.0 if glo <= c <= ghi else min(abs(glo - c),
                                                   abs(ghi - c))
            glo, ghi = lo_d, max(abs(glo - c), abs(ghi - c))

        # round 1 is shared: one histogram over the global bracket
        nc = int(n_candidates)
        g_edges = np.linspace(glo, ghi, nc + 1)[1:-1]
        (g_counts,) = fold_counts([(glo, ghi, g_edges.tolist())])

        # state per quantile: (rank, lo, hi, before, counts, edges, done_val)
        states = []
        for x in qs_in:
            states.append({"rank": int(np.floor(x * (n - 1))), "lo": glo,
                           "hi": ghi, "before": 0, "c": g_counts,
                           "e": g_edges, "val": None})

        for _ in range(int(max_rounds)):
            requests, open_idx = [], []
            for i, s in enumerate(states):
                if s["val"] is not None:
                    continue
                pop = int(s["c"].sum())
                if pop <= int(collect_limit) or s["lo"] == s["hi"]:
                    continue
                cum = np.cumsum(s["c"])
                idx = int(np.searchsorted(cum, s["rank"] - s["before"] + 1))
                lo_i = s["lo"] if idx == 0 else float(s["e"][idx - 1])
                hi_i = float(s["e"][idx]) if idx < s["e"].size else s["hi"]
                s["before"] += int(cum[idx - 1]) if idx > 0 else 0
                new_lo = float(np.nextafter(lo_i, hi_i)) if idx > 0 else lo_i
                new_hi = hi_i
                if (new_lo, new_hi) == (s["lo"], s["hi"]):
                    # no progress (float-collapsed edges put the whole
                    # bracket in bucket 0, only possible at idx == 0 so
                    # `before` did not advance): probe the single edge lo —
                    # bucket 0 becomes exactly the v == lo count, so the
                    # next round either resolves to lo or advances lo one
                    # distinct float; converges for any tie pattern
                    s["e"] = np.asarray([s["lo"]], np.float64)
                    requests.append((s["lo"], s["hi"], s["e"].tolist()))
                    open_idx.append(i)
                    continue
                s["lo"], s["hi"] = new_lo, new_hi
                if s["lo"] >= s["hi"]:
                    s["lo"] = s["hi"]               # single-value bucket
                    s["val"] = float(s["hi"])
                    continue
                s["e"] = np.linspace(s["lo"], s["hi"], nc + 1)[1:-1]
                requests.append((s["lo"], s["hi"], s["e"].tolist()))
                open_idx.append(i)
            if not requests:
                break
            for i, c in zip(open_idx, fold_counts(requests)):
                states[i]["c"] = c

        pulls, pull_idx = [], []
        for i, s in enumerate(states):
            if s["val"] is not None:
                continue
            if s["lo"] == s["hi"]:
                s["val"] = float(s["lo"])           # massive-tie shortcut
                continue
            pulls.append((s["lo"], s["hi"]))
            pull_idx.append(i)
        if pulls:
            for i, vals in zip(pull_idx, pull_values(pulls)):
                s = states[i]
                vals.sort()
                s["val"] = float(vals[s["rank"] - s["before"]])
        return [{"q": x, "value": s["val"]}
                for x, s in zip(qs_in, states)]

    @_coordinated
    def boxplot(self, database: str, table: str, query, field: str,
                precision: str = "float32", **kw) -> dict:
        """Five-number summary of a stored numeric/timestamp field over a
        keyword query's ENTIRE match set (the elasticsearch ``boxplot``
        aggregation shape — EXACT via the distributed-selection
        percentiles, not the TDigest approximation): min / q1 / median /
        q3 / max at the engine's lower discrete quantile (rank
        floor(q·(n-1))), plus the standard Tukey IQR whiskers clamped to
        observed values (lower = smallest v ≥ q1 − 1.5·IQR, upper =
        largest v ≤ q3 + 1.5·IQR — the ES boxplot whisker definition).
        Returns ``{"min","q1","median","q3","max","lower","upper"}``
        (None everywhere when the match set is empty).

        Scale shape: one :meth:`percentiles` run (histogram-count
        narrowing rounds) + ONE rank_counts/range probe per whisker —
        values never leave the shard. Keyword recall only."""
        qs5 = self.percentiles(database, table, query, field,
                               [0.0, 0.25, 0.5, 0.75, 1.0],
                               precision=precision, **kw)
        vals = [p["value"] for p in qs5]
        if any(v is None or (isinstance(v, float) and np.isnan(v))
               for v in vals):
            return {k: None for k in ("min", "q1", "median", "q3", "max",
                                      "lower", "upper")}
        mn, q1, med, q3, mx = (float(v) for v in vals)
        iqr = q3 - q1
        lo_fence, hi_fence = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        # clamp whiskers to OBSERVED values: the smallest value ≥ the low
        # fence / largest ≤ the high fence — one bounded probe per side
        # (reuse the percentile value-pull machinery via quantile ranks is
        # wrong for ties; probe counts instead)
        lower = self._whisker(database, table, query, field, lo_fence,
                              low=True, precision=precision)
        upper = self._whisker(database, table, query, field, hi_fence,
                              low=False, precision=precision)
        return {"min": mn, "q1": q1, "median": med, "q3": q3, "max": mx,
                "lower": lower if lower is not None else mn,
                "upper": upper if upper is not None else mx}

    def _whisker(self, database: str, table: str, query, field: str,
                 fence: float, low: bool, precision: str) -> float | None:
        """Smallest match-set value ≥ fence (low=True) / largest ≤ fence
        (low=False): ONE bounded scatter — each shard ships one float."""
        q = self._as_queries(database, table, query)[0]
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.whisker_keyword.remote(q.__dict__, field,
                                             float(fence), bool(low),
                                             precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.whisker_keyword(q, field, float(fence), bool(low),
                                       precision)
                     for s in self._searchers(database, table)]
        vals = [p for p in parts if p is not None]
        if not vals:
            return None
        return min(vals) if low else max(vals)

    @_coordinated
    def percentile_ranks(self, database: str, table: str, query, field: str,
                         values: list,
                         precision: str = "float32") -> list[dict]:
        """Percentile ranks of probe values over a keyword query's ENTIRE
        match set (the elasticsearch ``percentile_ranks`` aggregation —
        EXACT, not the t-digest approximation): for each x,
        ``rank = 100 · |{v : v ≤ x}| / n`` over non-null values of
        ``field`` (the inverse of :meth:`percentiles`). Returns
        ``[{"value", "rank"}, ...]`` in input order; rank is None when the
        match set has no values. Timestamps compare as epoch microseconds.

        Scale shape: each bucket ships len(values)+1 integers — values
        never leave the shard; the driver fold is O(buckets · probes).
        Keyword recall only (filters supported)."""
        if not values:
            raise ValueError("percentile_ranks needs at least one value")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("percentile_ranks takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("percentile_ranks is keyword-only")
        xs = [float(x) for x in values]
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.rank_counts_keyword.remote(q.__dict__, field, xs,
                                                 precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.rank_counts_keyword(q, field, xs, precision)
                     for s in self._searchers(database, table)]
        n = sum(p[1] for p in parts)
        if n == 0:
            return [{"value": x, "rank": None} for x in xs]
        tot = np.sum(np.stack([np.asarray(p[0], np.int64) for p in parts]),
                     axis=0)
        return [{"value": x, "rank": 100.0 * int(c) / n}
                for x, c in zip(xs, tot)]

    @_coordinated
    def cumulative_cardinality(self, database: str, table: str, query,
                               time_field: str, value_field: str,
                               interval: int, offset: int = 0, p: int = 8,
                               precision: str = "float32") -> list[dict]:
        """Cumulative approximate distinct count per time bin (the
        elasticsearch ``cumulative_cardinality`` pipeline over a
        date_histogram parent — e.g. "distinct users seen up to day t" —
        served in ONE distributed pass instead of a per-bucket pipeline):
        each bin's value ``estimate`` covers ALL bins ≤ it, using the
        repo's deterministic SQL-replicable HLL sketch (``ops/hll.py``:
        fmix32∘Horner31 hash, integer register sum, linear-counting
        branch), which makes prefix-merging exact sketch algebra — the
        cumulative register vector is the element-wise max of the per-bin
        vectors, so the cumulative estimate equals the estimate of the
        union stream. Returns ascending
        ``[{"bucket", "estimate", "raw", "zeros", "branch"}, ...]``.

        Scale shape: each shard ships |bins| × 2^p register bytes —
        values never leave the shard; the driver fold is
        O(buckets · bins · 2^p). Keyword recall only."""
        from byzer_retrieval_ray.ops.hll import _estimate, merge_registers

        if not 4 <= int(p) <= 20:
            raise ValueError("need 4 <= p <= 20")
        if int(interval) <= 0:
            raise ValueError("interval must be a positive integer")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("cumulative_cardinality takes exactly one "
                             "query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("cumulative_cardinality is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.histogram_hll_keyword.remote(
                        q.__dict__, time_field, int(interval), int(offset),
                        value_field, int(p), precision)
                    for a in self._actors[(database, table)]]
            # each actor answers with one (bin, regs) LIST per searcher it
            # owns — flatten both levels
            parts = [pr for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for sub in r for pr in sub]
        else:
            parts = [pr for s in self._searchers(database, table)
                     for pr in s.histogram_hll_keyword(
                         q, time_field, int(interval), int(offset),
                         value_field, int(p), precision)]
        per_bin: dict[int, np.ndarray] = {}
        for b, regs in parts:
            regs = np.asarray(regs, dtype=np.int64)
            cur = per_bin.get(b)
            per_bin[b] = regs if cur is None else merge_registers(cur, regs)
        out = []
        run = np.zeros(1 << int(p), dtype=np.int64)
        for b in sorted(per_bin):
            run = merge_registers(run, per_bin[b])
            est = _estimate(run, int(p))
            out.append({"bucket": int(b), "estimate": est["estimate"],
                        "raw": est["raw"], "zeros": est["zeros"],
                        "branch": est["branch"]})
        return out

    @_coordinated
    def missing_count(self, database: str, table: str, query,
                      field: str, precision: str = "float32") -> dict:
        """Count of match-set docs with a null/absent ``field`` (the
        elasticsearch ``missing`` aggregation; extension). Returns
        ``{"missing", "doc_count"}`` (doc_count = the match-set size).
        Any field type; empty lists count as present (exists semantics).

        Scale shape: each bucket ships TWO integers. Keyword recall only
        (filters supported)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("missing_count takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("missing_count is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.missing_count_keyword.remote(q.__dict__, field,
                                                   precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.missing_count_keyword(q, field, precision)
                     for s in self._searchers(database, table)]
        return {"missing": sum(p[0] for p in parts),
                "doc_count": sum(p[1] for p in parts)}

    @_coordinated
    def median_absolute_deviation(self, database: str, table: str, query,
                                  field: str, n_candidates: int = 256,
                                  collect_limit: int = 4096,
                                  max_rounds: int = 8,
                                  precision: str = "float32") -> dict:
        """EXACT median absolute deviation of a stored numeric/timestamp
        field over a keyword query's ENTIRE match set (the elasticsearch
        ``median_absolute_deviation`` aggregation shape — but exact where
        elasticsearch serves a t-digest approximation):
        MAD = median(|v − median(v)|), both medians the "lower" discrete
        quantile at rank floor(0.5·(n−1)) (the ``percentiles`` semantics —
        mirror row_number() in SQL). Returns ``{"median", "mad"}``; NaNs
        when the match set is empty.

        Scale shape: two distributed-selection runs (``percentiles``) —
        the second selects in the |v − median| domain, which the searcher
        kernels apply per bucket (``center=``), so values still never
        leave the shard and each round ships only histogram counts."""
        med = self.percentiles(database, table, query, field, [0.5],
                               n_candidates=n_candidates,
                               collect_limit=collect_limit,
                               max_rounds=max_rounds,
                               precision=precision)[0]["value"]
        if med != med:                                  # NaN: empty match set
            return {"median": med, "mad": med}
        mad = self.percentiles(database, table, query, field, [0.5],
                               n_candidates=n_candidates,
                               collect_limit=collect_limit,
                               max_rounds=max_rounds,
                               precision=precision, _center=med)[0]["value"]
        return {"median": med, "mad": mad}

    def snapshot(self, database: str, table: str, dest_location: str) -> str:
        """Consistent table backup (the Lucene SnapshotDeletionPolicy /
        backup shape): copies every ACTIVE generation directory (build
        scratch ``_partials`` excluded) plus the tombstone files to
        ``dest_location/<database>/<table>`` and writes a rewritten manifest
        whose absolute paths point into the destination. The manifest is
        written LAST, so a torn copy is invisible — restore is just
        ``RetrievalCluster(dest_location)`` (M8: state lives on disk).
        The snapshot is immutable history: later mutations of the source
        (deletes, upserts, compactions) don't touch it.

        Scale note: this is a driver-side file copy intended for manifests +
        shared-FS administration; at 100 TB the generation directories live
        on shared storage and the copy should be delegated to the storage
        layer (reflink/object-store copy) — the manifest rewrite here is the
        engine-specific part."""
        import json

        m = self.manifest(database, table)
        if not m.active_generations():
            GenerationReader(m.data)     # standard no-generation error
        src = os.path.dirname(m.path)
        dst = os.path.join(dest_location, database, table)
        os.makedirs(dst, exist_ok=True)
        for g in m.active_generations():
            sgen = m.gen_dir(g)
            dgen = os.path.join(dst, os.path.basename(sgen))
            if os.path.exists(dgen):
                shutil.rmtree(dgen)
            shutil.copytree(sgen, dgen,
                            ignore=shutil.ignore_patterns("_partials"))
        # tombstone files live inside gen dirs — copied above; the prefix
        # rewrite below fixes their manifest paths along with everything else
        data = json.loads(json.dumps(m.data).replace(src, dst))
        atomic_write_json(os.path.join(dst, "manifest.json"), data)
        return dst

    def index_stats(self, database: str, table: str) -> dict:
        """Index/collection statistics (the Lucene segments-info +
        CollectionStatistics shape): ``n_docs`` and per-analyzed-field
        ``{doc_count, sum_ttf, distinct_terms}`` summed over ACTIVE
        generations, the active generation list, and on-disk bytes by
        component. ``distinct_terms`` comes from ONE column-pruned scan of
        the termstats parquet parts (field column only) — at 100 TB that
        read is |terms| rows of one dictionary column, never the postings.
        Multi-generation note: a term present in k active generations counts
        k times (Lucene's per-segment term counts behave the same way);
        ``compact()`` restores exact counts."""
        import pyarrow.compute as pc
        from byzer_retrieval_ray.index.searcher import StatsView

        m = self.manifest(database, table)
        gr0 = GenerationReader(m.data)
        sv = StatsView(m.data, gr0)
        fields = {fld: {"doc_count": int(fs["doc_count"]),
                        "sum_ttf": int(fs["sum_ttf"]),
                        "distinct_terms": 0}
                  for fld, fs in sv.stats["fields"].items()}
        for r in sv.readers:
            for rp in range(max(r.info["num_term_parts"], 1)):
                p = r.termstats_path(rp)
                if not (p and os.path.exists(p)):
                    continue
                vc = pc.value_counts(
                    pq.read_table(p, columns=["field"])["field"]
                    .combine_chunks())
                for f, c in zip(vc.field("values").to_pylist(),
                                vc.field("counts").to_pylist()):
                    if f in fields:
                        fields[f]["distinct_terms"] += int(c)
        nbytes: dict[str, int] = {}
        for g in m.active_generations():
            gdir = m.gen_dir(g)
            for root, _, files in os.walk(gdir):
                sub = os.path.relpath(root, gdir).split(os.sep)[0]
                for fn in files:
                    kind = sub if sub in ("docstore", "postings", "termstats",
                                          "ann") else "meta"
                    try:
                        nbytes[kind] = nbytes.get(kind, 0) + \
                            os.path.getsize(os.path.join(root, fn))
                    except OSError:
                        pass
        return {"n_docs": int(sv.stats["n_docs"]),
                "generations": m.active_generations(),
                "fields": fields, "bytes": nbytes}

    @_coordinated
    def search_by_field(self, database: str, table: str, query, field: str,
                        ascending: bool = False,
                        precision: str = "float32") -> list[dict]:
        """Keyword search ordered by a STORED FIELD instead of relevance (the
        Lucene ``IndexSearcher.search(query, n, Sort)`` shape — sorted
        collection skips scoring). Returns the top ``query.limit``
        ``{"doc_id", field}`` rows of the ENTIRE match set ordered by
        (value asc|desc, doc_id asc). Docs with a null sort value are
        excluded (documented divergence: Lucene's missing-value default
        sorts them last).

        Scale shape: each bucket ships AT MOST limit (doc_id, value) rows —
        its partial top-k over the full match set; the driver merge is
        O(buckets·limit). Keyword recall only (filters supported)."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("search_by_field takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("search_by_field is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.sort_keyword.remote(q.__dict__, field, ascending,
                                          precision)
                    for a in self._actors[(database, table)]]
            tbls = [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                    for t in r]
        else:
            tbls = [s.sort_keyword(q, field, ascending, precision)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        if not tbls:
            return []
        merged = pa.concat_tables(tbls)
        vals = merged["value"].to_numpy(zero_copy_only=False)
        dids = merged["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dids, vals if ascending else -vals))[:q.limit]
        return [{"doc_id": int(dids[i]), field: float(vals[i])}
                for i in order]

    @_coordinated
    def rerank(self, database: str, table: str, query, rerank_fn,
               depth: int = 50, limit: int | None = None,
               **search_kwargs) -> list[dict]:
        """Two-stage retrieval (the cross-encoder / LTR rerank shape; the
        reference's emb_llm hook is first-stage only: extension). Stage 1
        runs the normal search with ``depth`` candidates; stage 2 calls
        ``rerank_fn(hits) -> sequence of floats`` ONCE on the entire
        candidate list (batched model inference, never per-doc), then the
        top ``limit`` (default: the query's limit) return re-ordered by
        (new score desc, doc_id asc). Each hit keeps its stage-1 score as
        ``_first_stage_score``; ``_score`` becomes the rerank score.

        Scale shape: only ``depth`` candidates ever reach the driver/model —
        the candidate cut is the distributed engine's job; the rerank cost
        is O(depth), independent of corpus size."""
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("rerank takes exactly one query")
        q = qs[0]
        lim = int(limit) if limit is not None else q.limit
        from dataclasses import replace
        q1 = replace(q, limit=int(depth), search_after=None)
        hits = self.search(database, table, q1, **search_kwargs)[0]
        if not hits:
            return []
        scores = np.asarray(list(rerank_fn(hits)), dtype=np.float64)
        if scores.shape != (len(hits),):
            raise ValueError(
                f"rerank_fn must return one score per hit "
                f"({len(hits)} hits, got shape {scores.shape})")
        order = np.lexsort((np.array([h["doc_id"] for h in hits], np.int64),
                            -scores))
        out = []
        for i in order[:lim]:
            h = dict(hits[int(i)])
            h["_first_stage_score"] = h["_score"]
            h["_score"] = float(scores[int(i)])
            out.append(h)
        return out

    @_coordinated
    def term_vectors(self, database: str, table: str, doc_ids, field: str) -> pa.Table:
        """Per-document term vectors (the Lucene TermVectors shape — Fields
        per doc with term→freq; the reference never enables
        ``storeTermVectors``, so this is an extension the docstore gets for
        free): ``(doc_id, term, tf)`` rows for the requested docs in
        (doc_id, term) order, analyzed with the indexing analyzer
        (whitespace). Reads the ANALYZED column from the docstore via one
        predicate-pushdown fetch per bucket — Lucene would need the term
        vectors stored at index time; here the analyzed text is already
        retained for posting re-emission. Tokenization is the vectorized
        Arrow kernel (split + flatten + group count), no per-row Python."""
        import pyarrow.compute as pc

        ids = np.asarray(list(doc_ids), np.int64)
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            tbls = ray.get([a.fetch_analyzed.remote(ids, field)
                            for a in self._actors[(database, table)]],
                           timeout=QUERY_TIMEOUT_SEC)
        else:
            tbls = [s.fetch_analyzed(ids, field)
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if not tbls:
            return empty
        tbl = pa.concat_tables(tbls, promote_options="default")
        toks = pc.utf8_split_whitespace(tbl[field].combine_chunks())
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(tbl["doc_id"].to_numpy(), reps)
        keep = pc.not_equal(flat, "")
        pairs = pa.table({"doc_id": pa.array(doc_rep, pa.int64()),
                          "term": flat}).filter(keep)
        if len(pairs) == 0:
            return empty
        agg = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        agg = agg.rename_columns(["doc_id", "term", "tf"])
        agg = agg.sort_by([("doc_id", "ascending"), ("term", "ascending")])
        return agg.set_column(2, "tf", pc.cast(agg["tf"], pa.int64()))

    @_coordinated
    def range_facets(self, database: str, table: str, query, field: str,
                     edges: list, precision: str = "float32") -> list[dict]:
        """Histogram facet of a numeric stored field over a keyword query's
        ENTIRE match set (the Lucene LongRangeFacetCounts shape; the
        reference exposes no facet API: extension). ``edges`` defines
        len(edges)-1 half-open bins [edges[i], edges[i+1]); returns
        ``[{"lo", "hi", "count"}, ...]`` in bin order. Nulls and values
        outside [edges[0], edges[-1]) don't count.

        Scale shape: each bucket ships ONE len(edges)-1 int64 count vector —
        match ids never leave the shard; the driver fold is O(buckets·bins).
        Keyword recall only (filters supported), like facet_counts."""
        if len(edges) < 2 or any(edges[i] >= edges[i + 1]
                                 for i in range(len(edges) - 1)):
            raise ValueError("edges must be at least 2 strictly "
                             "increasing values")
        qs = self._as_queries(database, table, query)
        if len(qs) != 1:
            raise ValueError("range_facets takes exactly one query")
        q = qs[0]
        if not q.has_keyword or q.has_vector:
            raise ValueError("range_facets is keyword-only")
        use_actors = (database, table) in self._actors
        if use_actors:
            import ray
            futs = [a.range_facets_keyword.remote(q.__dict__, field,
                                                  list(edges), precision)
                    for a in self._actors[(database, table)]]
            parts = [p for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                     for p in r]
        else:
            parts = [s.range_facets_keyword(q, field, list(edges), precision)
                     for s in self._searchers(database, table)]
        total = np.sum(np.stack(parts), axis=0) if parts \
            else np.zeros(len(edges) - 1, np.int64)
        return [{"lo": edges[i], "hi": edges[i + 1], "count": int(total[i])}
                for i in range(len(edges) - 1)]

    def _termstats_paths(self, database: str, table: str) -> list[str]:
        """Existing termstats parquet parts across active generations,
        sorted for a deterministic round-robin actor assignment."""
        man = self.manifest(database, table)
        paths = []
        for g in man.active_generations():
            info = man.data["generations"][str(g)]
            for e in info.get("postings", {}).values():
                p = e.get("termstats_path")
                if p and os.path.exists(p):
                    paths.append(p)
        return sorted(paths)

    def _suggest_scatter(self, database: str, table: str, paths: list[str],
                         method: str, args: tuple) -> list | None:
        """Scatter a suggest-family candidate call over the segment actors
        (each actor receives — and caches — its round-robin slice of the
        termstats parts). Returns the non-empty candidate tables, or None
        when the table isn't activated (caller falls back to the Dataset
        scan of the same kernel)."""
        actors = self._actors.get((database, table))
        if not actors:
            return None
        import ray
        assign = [paths[i::len(actors)] for i in range(len(actors))]
        futs = [getattr(a, method).remote(assign[i], *args)
                for i, a in enumerate(actors) if assign[i]]
        return [t for r in ray.get(futs, timeout=QUERY_TIMEOUT_SEC)
                for t in r if len(t)]

    @_coordinated
    def suggest(self, database: str, table: str, field: str, term: str,
                max_edits: int = 2, limit: int = 5,
                transpositions: bool = True) -> list[dict]:
        """Did-you-mean term suggestions (the Lucene
        ``suggest.spell.DirectSpellChecker`` shape, simplified — the
        reference exposes no spell API; extension): dictionary terms of
        ``field`` within ``max_edits`` of ``term`` (OSA with adjacent
        transpositions when ``transpositions``, plain Levenshtein otherwise),
        the exact term itself excluded, ranked by (edit distance asc, df
        desc, term asc), top ``limit``. Each hit is ``{"term", "df",
        "dist"}``. df sums across active generations and is build-time df —
        deletes don't decrement it until compaction, exactly like Lucene's
        docFreq.

        Scale shape — two serving modes, one kernel
        (``functions/suggest_kernels.py``): on an ACTIVATED table the
        termstats parts are split round-robin across the segment actors,
        each of which caches its slice in memory (loaded once, evicted on
        compaction) and answers with its few surviving (term, df, dist)
        rows — an RPC-shaped suggest, no per-query Dataset launch.
        Otherwise ONE column-pruned distributed scan of the dictionary
        runs the identical kernel per batch. Both ways the vectorized
        length-band + bag-distance prefilter means no full-dictionary DP
        and no shuffle; the driver fold is |candidates|-sized."""
        from byzer_retrieval_ray.functions import suggest_kernels as K

        paths = self._termstats_paths(database, table)
        if not paths:
            return []
        q, ne, fld = str(term), int(max_edits), str(field)
        tbls = self._suggest_scatter(
            database, table, paths, "suggest_candidates",
            (fld, q, ne, bool(transpositions)))
        if tbls is not None:
            if not tbls:
                return []
            out = pa.concat_tables(tbls).to_pandas()
        else:
            import ray.data
            out = ray.data.read_parquet(
                paths, columns=["field", "term", "df"]) \
                .map_batches(lambda b: K.spell_candidates(
                    b, fld, q, ne, bool(transpositions)),
                    batch_format="pyarrow").to_pandas()
        if not len(out):
            return []
        agg = out.groupby("term", as_index=False) \
            .agg(df=("df", "sum"), dist=("dist", "min")) \
            .sort_values(["dist", "df", "term"],
                         ascending=[True, False, True], kind="mergesort")
        return [{"term": str(r.term), "df": int(r.df), "dist": int(r.dist)}
                for r in agg.head(limit).itertuples()]

    @_coordinated
    def complete(self, database: str, table: str, field: str, prefix: str,
                 limit: int = 5) -> list[dict]:
        """Prefix completion (the Lucene ``suggest`` prefix-lookup /
        elasticsearch completion-suggester shape, df-weighted — the
        reference exposes no suggest API: extension): dictionary terms of
        ``field`` starting with ``prefix`` (a term equal to the prefix
        included), ranked by (df desc, term asc), top ``limit``. Each hit is
        ``{"term", "df"}``. df sums across active generations and is
        build-time df — deletes don't decrement it until compaction,
        exactly like Lucene's docFreq (same convention as ``suggest``).

        Scale shape: the same two serving modes as :meth:`suggest` —
        actor-cached dictionary slices on an activated table (RPC-shaped),
        else ONE column-pruned distributed scan; both run the identical
        kernel and ship only prefix-matching (term, df) rows to a tiny
        driver fold. The fold is |matching terms|-sized — bounded for
        realistic prefixes; a one-character prefix over a web-scale
        dictionary ships that dictionary slice (cap it client-side with a
        longer prefix)."""
        from byzer_retrieval_ray.functions import suggest_kernels as K

        if not prefix:
            raise ValueError("prefix must be a non-empty string")
        paths = self._termstats_paths(database, table)
        if not paths:
            return []
        pre, fld = str(prefix), str(field)
        tbls = self._suggest_scatter(database, table, paths,
                                     "complete_candidates", (fld, pre))
        if tbls is not None:
            if not tbls:
                return []
            out = pa.concat_tables(tbls).to_pandas()
        else:
            import ray.data
            out = ray.data.read_parquet(
                paths, columns=["field", "term", "df"]) \
                .map_batches(lambda b: K.prefix_candidates(b, fld, pre),
                             batch_format="pyarrow").to_pandas()
        if not len(out):
            return []
        agg = out.groupby("term", as_index=False).agg(df=("df", "sum")) \
            .sort_values(["df", "term"], ascending=[False, True],
                         kind="mergesort")
        return [{"term": str(r.term), "df": int(r.df)}
                for r in agg.head(limit).itertuples()]

    @_coordinated
    def phrase_suggest(self, database: str, table: str, field: str,
                       text: str, max_edits: int = 1,
                       max_candidates: int = 3, limit: int = 5,
                       transpositions: bool = True,
                       backoff: float = 0.4) -> list[dict]:
        """Whole-query did-you-mean (the elasticsearch ``phrase`` suggester
        shape, simplified — the reference exposes no suggest API:
        extension). Each whitespace token of ``text`` generates dictionary
        candidates within ``max_edits`` (the token itself at distance 0 when
        it's in the dictionary), capped per token at ``max_candidates`` by
        (distance asc, df desc, term asc); every candidate sequence is
        scored with a Stupid-Backoff bigram language model over the corpus
        token stream:

            score = P(c_1) · Π_i S(c_i | c_{i-1}),
            P(w)        = ttf(w) / total_tokens,
            S(b | a)    = bigram(a, b) / ttf(a)      if bigram(a, b) > 0
                          else ``backoff`` · P(b),

        (Brants et al. 2007 — the stupid-backoff scorer elasticsearch
        defaults to). Returned ``{"text", "score"}`` rows are ranked by
        (score desc, text asc), top ``limit``; ``score`` is ln of the
        product (products underflow display precision fast), computed
        left-to-right in float64. A token with NO candidate within
        ``max_edits`` yields [] (nothing to suggest). Unigram/df statistics
        are build-time sums across active generations (Lucene docFreq
        convention — deletes don't decrement until compaction, same as
        ``suggest``); bigram counts COUNT live docs only (they come from
        positional postings with tombstones applied), a divergence that
        vanishes at compaction.

        Scale shape: (1) the candidate stage runs in the same two serving
        modes as ``suggest`` — actor-cached dictionary slices (RPC-shaped)
        on an activated table, else ONE column-pruned distributed scan —
        shipping per-token candidate (term, df, ttf, dist) rows with the
        same vectorized length-band prefilter; (2) ONE
        ``phrase_pair_counts`` round ships (tokens-1)·max_candidates² int64
        bigram counts per serving bucket, each an ExactPhraseMatcher
        positional intersection served from the postings cache — no corpus
        scan; (3) the driver enumerates at most max_candidates^tokens
        sequences (capped at 4096 — raise ``max_candidates`` consciously).
        Requires a positional index (the default; build_index
        positions=False opts out and phrase counting raises there)."""
        import itertools

        from byzer_retrieval_ray.functions import suggest_kernels as K

        tokens = [t for t in str(text).split() if t]
        if not tokens:
            raise ValueError("text must contain at least one token")
        man = self.manifest(database, table)
        total_tokens = 0
        for g in man.active_generations():
            info = man.data["generations"][str(g)]
            fstats = info.get("stats", {}).get("fields", {}).get(field)
            if fstats:
                total_tokens += int(fstats["sum_ttf"])
        paths = self._termstats_paths(database, table)
        if not paths or total_tokens == 0:
            return []
        ne, fld = int(max_edits), str(field)
        toks = list(tokens)
        tbls = self._suggest_scatter(
            database, table, paths, "phrase_token_candidates",
            (fld, toks, ne, bool(transpositions)))
        if tbls is not None:
            if not tbls:
                return []
            raw = pa.concat_tables(tbls).to_pandas()
        else:
            import ray.data
            raw = ray.data.read_parquet(
                paths, columns=["field", "term", "df", "ttf"]) \
                .map_batches(lambda b: K.token_candidates(
                    b, fld, toks, ne, bool(transpositions)),
                    batch_format="pyarrow").to_pandas()
        if not len(raw):
            return []
        # fold duplicate terms across generations: df/ttf sum, dist is
        # identical everywhere (a pure string function of (tok, term))
        agg = raw.groupby(["tok", "term"], as_index=False).agg(
            df=("df", "sum"), ttf=("ttf", "sum"), dist=("dist", "min"))
        per_tok: list[list[tuple[str, int]]] = []
        for ti in range(len(toks)):
            g = agg[agg["tok"] == ti].sort_values(
                ["dist", "df", "term"], ascending=[True, False, True],
                kind="mergesort").head(int(max_candidates))
            if not len(g):
                return []
            per_tok.append([(str(r.term), int(r.ttf))
                            for r in g.itertuples()])
        n_seq = 1
        for c in per_tok:
            n_seq *= len(c)
        if n_seq > 4096:
            raise ValueError(
                f"{n_seq} candidate sequences exceed the 4096 cap — lower "
                "max_candidates or shorten the text")
        ttf = {t: f for c in per_tok for (t, f) in c}
        pairs = sorted({(a, b)
                        for i in range(len(per_tok) - 1)
                        for a, _ in per_tok[i] for b, _ in per_tok[i + 1]})
        bigram = {}
        if pairs:
            plist = [list(p) for p in pairs]
            use_actors = (database, table) in self._actors
            if use_actors:
                import ray
                futs = [a.phrase_pair_counts.remote(plist, fld)
                        for a in self._actors[(database, table)]]
                counts = np.sum(ray.get(futs, timeout=QUERY_TIMEOUT_SEC),
                                axis=0)
            else:
                counts = np.sum([s.phrase_pair_counts(plist, fld)
                                 for s in self._searchers(database, table)],
                                axis=0)
            bigram = {p: int(c) for p, c in zip(pairs, counts)}
        out = []
        tot = float(total_tokens)
        bo = float(backoff)
        for seq in itertools.product(*per_tok):
            words = [w for w, _ in seq]
            s = ttf[words[0]] / tot
            for i in range(1, len(words)):
                bg = bigram.get((words[i - 1], words[i]), 0)
                if bg > 0:
                    s = s * (bg / ttf[words[i - 1]])
                else:
                    s = s * (bo * (ttf[words[i]] / tot))
            out.append((" ".join(words), s))
        out.sort(key=lambda r: (-r[1], r[0]))
        import math
        return [{"text": t, "score": float(math.log(s))}
                for t, s in out[:int(limit)]]

    def _attach_from(self, doc_tbls: list, ids, scores) -> list[dict]:
        if len(ids) == 0 or not doc_tbls:
            return []
        docs = pa.concat_tables(doc_tbls, promote_options="default")
        # the same doc can arrive from both recalls — attach_scores dedups by id
        return M.attach_scores(docs, np.asarray(ids), np.asarray(scores)).to_pylist()

    @_coordinated
    def search_arrow(self, database: str, table: str, queries,
                     precision: str = "float32", algorithm: str = "bmw"):
        """S8 equivalent (RetrievalFlightServer.java:369-407): per query an Arrow
        table ``(id: string, score: float32)`` — the reference's do_get stream
        schema, with the table's key as the id."""
        m = self.manifest(database, table)
        gr = GenerationReader(m.data)
        key = gr.key_field
        out = []
        for res in self.search(database, table, queries, precision, algorithm):
            out.append(pa.table({
                "id": pa.array([str(r[key]) for r in res], pa.string()),
                "score": pa.array(np.array([r["_score"] for r in res], np.float32)),
            }))
        return out

    @_coordinated
    def filter(self, database: str, table: str, queries) -> list[list[dict]]:
        """Q4: unscored filter + sort + limit; master concatenates and re-sorts
        (RetrievalMaster.java:201-250). ``offset`` pages the sorted order
        (shards ship top offset+limit, the merge slices)."""
        from dataclasses import replace as _replace

        qs = self._as_queries(database, table, queries)
        use_actors = (database, table) in self._actors
        out = []
        for q in qs:
            off = max(0, int(getattr(q, "offset", 0) or 0))
            if off:
                q = _replace(q, limit=q.limit + off, offset=0)
            if use_actors:
                import ray
                tbls = ray.get([a.filter_op.remote(q.__dict__)
                                for a in self._actors[(database, table)]],
                               timeout=QUERY_TIMEOUT_SEC)
            else:
                tbls = [s.filter_op(q) for s in self._searchers(database, table)]
            tbls = [t for t in tbls if len(t)]
            if not tbls:
                out.append([])
                continue
            merged = pa.concat_tables(tbls, promote_options="default")
            keys = [(list(s.keys())[0], "descending" if list(s.values())[0] == "desc"
                     else "ascending") for s in q.sorts]
            keys.append(("doc_id", "ascending"))
            merged = merged.sort_by(keys).slice(off, q.limit - off)
            out.append(merged.to_pylist())
        return out

    def _materialize(self, database, table, ids, scores, use_actors) -> list[dict]:
        if len(ids) == 0:
            return []
        if use_actors:
            import ray
            tbls = ray.get([a.fetch_docs.remote(np.asarray(ids))
                            for a in self._actors[(database, table)]],
                           timeout=QUERY_TIMEOUT_SEC)
        else:
            tbls = [s.fetch_docs(np.asarray(ids))
                    for s in self._searchers(database, table)]
        tbls = [t for t in tbls if len(t)]
        docs = pa.concat_tables(tbls, promote_options="default")
        return M.attach_scores(docs, np.asarray(ids), np.asarray(scores)).to_pylist()

    def _as_queries(self, database, table, queries) -> list[SearchQuery]:
        if isinstance(queries, (dict, SearchQuery)):
            queries = [queries]
        out = []
        for q in queries:
            if isinstance(q, dict):
                q = SearchQuery.from_dict({"database": database, "table": table, **q})
            out.append(q)
        return out
