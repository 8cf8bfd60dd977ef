"""The Ray-Data-native index build pipeline.

    read_parquet(web_pages)                               # url, warc_ts, html, text, lang
      └─ map_batches(extract_text)        [stateless]     # byte-identical text per url
      └─ map_batches(route to doc_part)   [stateless]     # reference Utils.route parity
      └─ groupby(doc_part).map_groups     [shuffle: key]  # dedup latest-by-key (ref upsert,
           (dedup → doc_ids → norms →                     #  RetrievalWorker.java:232-238),
            write docstore partition)                     #  deterministic doc_id assignment
      └─ driver: stats.json (N, sum_ttf)  [tiny]          # global BM25 collection stats
      └─ finalize: dedup→ids→norms→docstore→emit_runs     # fused; runs routed to a
           → per-(doc_part, range_part) run spill         #  per-range DISK exchange
      └─ map_batches(merge range r's spill files)         # skew-rebalanced sorted
                                                          #  partitions (no AllToAll sort)
Resumability: every partition write is atomic (tmp+rename) and records a lineage entry
under gen-<g>/_partials/; a rerun of the same build skips partitions whose entry and
output file already exist. Determinism: doc ids, norms, runs and merges are pure
functions of the input rows, independent of batch boundaries and parallelism (asserted
in tests at two parallelism levels).

Scale notes (100 TB): both all-to-all exchanges (wide rows → doc partitions; posting
runs → term ranges) are explicit partitioned DISK spills — each producer appends to
its target partition's directory, each consumer reads exactly its partition's files
(the classic map-side shuffle-file layout; on a multi-node cluster the spill dirs
live on shared storage). Runs are pre-combined per batch so the term exchange
carries compressed blobs (~index size), not one row per posting; a Ray-Data
AllToAll sort of those bytes measured as the dominant span of the 8-CPU build and
is avoided entirely (the route key is already known). Term-range boundaries are
sampled and byte-balanced so stopword-scale terms don't skew partitions; `html` is
dropped right after extraction so the wide binary column never enters an exchange.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from byzer_retrieval_ray.functions import murmur3
from byzer_retrieval_ray.functions.extract import extract_text
from byzer_retrieval_ray.functions.smallfloat import int_to_byte4_np
from byzer_retrieval_ray.functions.tokenize import doc_lengths, term_frequencies
from byzer_retrieval_ray.index import postings as P
from byzer_retrieval_ray.index.manifest import Manifest, atomic_write_json, read_json
from byzer_retrieval_ray.schema import dsl

STRIDE_BITS = 40
GEN_SHIFT = 54        # delta-generation id namespace: doc_id = gen<<54 | part<<40 | rank
MAX_DOC_PARTS = 1 << (GEN_SHIFT - STRIDE_BITS)
MAX_DELTA_GEN = 1 << (62 - GEN_SHIFT)


def _pin_worker_threads() -> None:
    """A/B knob: cap Arrow's process-global thread pool inside Ray Data worker
    processes (BYZER_WORKER_ARROW_THREADS=n; default 0 = leave Arrow's
    machine-sized default).

    Measured on the 400k-doc build at 8 CPUs (back-to-back, quiet box,
    build-only legs): UNPINNED 29.0 s / 219.8 CPU-s beats pin=1
    (32.0 s / 242.9) and pin=4 (38.1 s / 293.9). The oversubscription
    hypothesis (N tasks × 32-thread pools thrash) is wrong for this pipeline:
    in-stage utilization sits ≈0.94, and Arrow's pool soaks that idle capacity
    for parquet codec work on the spill files — capping it serializes codec
    work without reducing total cycles. Kept as an env knob because the
    trade-off may invert on nodes where workers are memory-bandwidth-starved
    by co-located stages."""
    if getattr(_pin_worker_threads, "_done", False):
        return
    n = int(os.environ.get("BYZER_WORKER_ARROW_THREADS", "0"))
    if n > 0:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
    _pin_worker_threads._done = True


def _atomic_write_parquet(table: pa.Table, path: str, **kw) -> None:
    # zstd-1 over the default snappy: the two build exchanges (wide-row spill,
    # posting-run spill) are the only cross-node byte movement — measured 24 %
    # (runs) / 34 % (wide rows) smaller at a read speed that is equal or better,
    # so the contended resource (disk / memory bandwidth) sees a third less
    # traffic for ~0.1 s/20k-doc extra encode CPU
    codec = os.environ.get("BYZER_SPILL_CODEC", "zstd")   # "zstd:3" = level 3
    level = 1
    if ":" in codec:
        codec, lv = codec.split(":", 1)
        level = int(lv)
    kw.setdefault("compression", codec)
    if kw["compression"] == "zstd":
        kw.setdefault("compression_level", level)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


def _list_parquet_files(source) -> list[str] | None:
    """Resolve a local path / list-of-paths source to a sorted parquet file list
    (None when the source isn't a plain local file set — e.g. a URI scheme —
    in which case boundary sampling falls back to the post-spill driver pass)."""
    paths = [source] if isinstance(source, str) else list(source)
    out: list[str] = []
    for p in paths:
        if not isinstance(p, str) or "://" in p:
            return None
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in os.listdir(p)
                       if f.endswith(".parquet"))
        elif os.path.isfile(p):
            out.append(p)
        else:
            return None
    return sorted(out) or None


def _pruned_read_columns(avail: list[str], columns: list[str],
                         extract: tuple[str, str] | None,
                         version_field: str | None) -> list[str]:
    """Columns the build actually needs from the source parquet: schema columns
    plus the extract source and version field — parquet column pruning then
    skips everything else AT THE READ (a source table with extra payload
    columns never materializes them). With extraction on, the source's copy of
    the destination column is also skipped: prep drops and regenerates it."""
    want = [c for c in columns if not (extract and c == extract[1])]
    if extract is not None and extract[0] not in want:
        want.append(extract[0])
    if version_field is not None and version_field not in want:
        want.append(version_field)
    return [c for c in want if c in set(avail)]


def _analyzed_fields(st: dsl.StructType) -> list[str]:
    return [f.name for f in st.fields if f.analyze]


def _schema_columns(st: dsl.StructType) -> list[str]:
    return [f.name for f in st.fields]


def build_index(
    source,
    manifest: Manifest,
    *,
    key_field: str,
    version_field: str | None = None,
    extract: tuple[str, str] | None = None,   # (html_col, text_col)
    num_doc_parts: int = 8,
    num_term_parts: int = 8,
    num_serving_buckets: int | None = None,
    generation: int | None = None,
    sample_docs: int = 2000,
    codec: str = "varint",   # posting compression: "varint" | "pfor" (NewPFD)
    publish_mode: str = "replace",   # "append" = delta generation (incremental upsert)
    replace_generations: list[int] | None = None,   # append mode: retire these
                                                    # gens in the same publish
                                                    # (delta-fold merge)
    positions: bool = True,   # index token positions (phrase queries; Lucene
                              # TextField parity) — ~tf-stream-sized extra bytes
    ann: str | None = "auto",   # "auto": persist HNSW graph + IVF codebook per
                                # (vector field, serving bucket) at build time
                                # (Lucene builds the graph at flush:
                                # XLucene95HnswVectorsFormat.java:119,130);
                                # None skips the stage
) -> dict:
    """Build a new index generation and publish it. Returns the gen_info dict.

    ``source`` is a ray.data.Dataset or parquet path(s). Ray must already be
    initialized by the caller — this function never calls ray.init().
    """
    t0 = time.perf_counter()
    st = dsl.parse_schema(manifest.data["schema"])
    analyzed = _analyzed_fields(st)
    columns = _schema_columns(st)
    key_is_long = isinstance(st.field(key_field).data_type, dsl.SingleType) and \
        st.field(key_field).data_type.name in ("long", "int")
    gen = generation if generation is not None else manifest.data["generation"] + 1
    if num_doc_parts > MAX_DOC_PARTS:
        raise ValueError(f"num_doc_parts > {MAX_DOC_PARTS} exceeds the id layout")
    if publish_mode == "append" and gen >= MAX_DELTA_GEN:
        raise ValueError(
            f"generation {gen} exceeds the delta id namespace ({MAX_DELTA_GEN}); "
            "compact the table to reset")
    id_base = np.int64(gen) << GEN_SHIFT if publish_mode == "append" else np.int64(0)
    gdir = manifest.gen_dir(gen)
    partials = os.path.join(gdir, "_partials")
    os.makedirs(partials, exist_ok=True)

    # serving buckets may be coarser than doc partitions: group consecutive parts
    # so posting rows fan out over num_serving_buckets, not num_doc_parts (the
    # build picks many small partitions for task balance; the serving side pays
    # per-(term, bucket) row overhead and wants few)
    nsb = num_serving_buckets or num_doc_parts
    group = max(1, -(-num_doc_parts // nsb))
    bucket_spec = ({"mode": "mod", "parts": num_doc_parts, "group": group}
                   if key_is_long
                   else {"mode": "stride", "bits": STRIDE_BITS, "group": group})

    # block count ≈ 2–4× CPUs so the shuffle fans out (a handful of big input files
    # would otherwise serialize the sort — measured 6× slower at 8 CPUs)
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n_cpus = 8
    n_blocks = max(2 * n_cpus, num_doc_parts, 8)
    source_paths: list[str] | None = None
    if isinstance(source, (str, list)):
        source_paths = _list_parquet_files(source)
        read_cols = None
        if source_paths:
            avail = pq.ParquetFile(source_paths[0]).schema_arrow.names
            read_cols = _pruned_read_columns(avail, columns, extract,
                                             version_field)
        source = ray.data.read_parquet(source, columns=read_cols,
                                       override_num_blocks=n_blocks)
    ds = source

    # ---- Stage A: extract → route → dedup → doc ids → norms → docstore ----
    extract_src = extract[0] if extract else None
    extract_dst = extract[1] if extract else None

    arrow_types = {f.name: t for f, t in
                   zip(st.fields, dsl.to_arrow_schema(st).types)}

    def prep(batch: pa.Table) -> pa.Table:
        if extract_src is not None:
            txt = extract_text(batch[extract_src].combine_chunks())
            if extract_dst in batch.column_names:
                batch = batch.drop_columns([extract_dst])
            batch = batch.append_column(extract_dst, txt)
        keep = [c for c in columns if c in batch.column_names]
        if version_field is not None and version_field not in keep \
                and version_field in batch.column_names:
            keep.append(version_field)
        batch = batch.select(keep)
        # normalize to the DECLARED schema types: a source block whose column
        # is all-null arrives typed pa.null() (from_items/JSON inference) and
        # would poison the spill-file concat with mixed schemas; int width and
        # large_string drift normalizes here too
        for i, name in enumerate(batch.column_names):
            want = arrow_types.get(name)
            if want is not None and batch.column(i).type != want:
                batch = batch.set_column(i, name, batch.column(i).cast(want))
        keys = batch[key_field].to_numpy(zero_copy_only=False)
        if key_is_long:
            part = (keys.astype(np.int64) % num_doc_parts).astype(np.int32)
        else:
            part = murmur3.route_np(keys, num_doc_parts).astype(np.int32)
        return batch.append_column("__doc_part", pa.array(part))

    docstore_dir = os.path.join(gdir, "docstore")
    spill_dir = os.path.join(gdir, "_spill")
    spill_marker = os.path.join(spill_dir, "_A1_DONE.json")

    # ---- Stage A1: explicit partitioned exchange (disk, not object-store sort) ----
    # Each map task routes its batch and appends one parquet file per touched doc
    # partition under _spill/part=<p>/. The wide rows (html payload) therefore flow
    # read → spill-write exactly once; no all-to-all sort materializes them. The
    # term exchange (stage C/D) is the SAME pattern — an explicit per-range disk
    # spill via _write_runs; neither exchange may go back to a Ray Data
    # groupby/sort (CLAUDE.md invariant: the AllToAll sort dominated the 8-CPU
    # build).
    def spill(batch: pa.Table) -> pa.Table:
        import uuid

        _pin_worker_threads()
        batch = prep(batch)
        parts_np = batch["__doc_part"].to_numpy()
        batch = batch.drop_columns(["__doc_part"])
        written = []
        for p in np.unique(parts_np):
            sub = batch.filter(pa.array(parts_np == p))
            d = os.path.join(spill_dir, f"part={p:05d}")
            os.makedirs(d, exist_ok=True)
            fp = os.path.join(d, f"blk-{uuid.uuid4().hex}.parquet")
            _atomic_write_parquet(sub, fp)
            written.append(fp)
        return pa.table({"files": [json.dumps(written)]})

    runspill_dir = os.path.join(gdir, "_runspill")

    def _write_runs(runs: pa.Table, p: int) -> list[str]:
        """Route this doc partition's posting runs to per-term-range files —
        the term exchange is an explicit partitioned SPILL, not a Ray Data
        sort-shuffle: every run already knows its range_part, so sorting 100s of
        MB of compressed runs through an AllToAll operator is pure overhead
        (measured: the Sort span dominated the 8-CPU build). Each merge task
        later reads exactly its range's files."""
        written = []
        if len(runs) == 0:
            return written
        rp = runs["range_part"].to_numpy()
        for r in np.unique(rp):
            sub = runs.filter(pa.array(rp == r))
            d = os.path.join(runspill_dir, f"range={r:05d}")
            fp = os.path.join(d, f"part-{p:05d}.parquet")
            _atomic_write_parquet(sub, fp)
            written.append(fp)
        return written

    def finalize_and_emit(item: pa.Table) -> pa.Table:
        """Stage A2 fused with the run combiner: dedup → doc ids → norms → write the
        docstore partition, then emit this partition's posting runs directly (the
        text is already in memory — no second read/tokenize pass over the docstore)
        into the per-range run spill.
        """
        _pin_worker_threads()
        p = int(item["part"][0].as_py())
        files = json.loads(item["files"][0].as_py())
        out_path = os.path.join(docstore_dir, f"part-{p:05d}.parquet")
        entry_path = os.path.join(partials, f"docstore-{p:05d}.json")
        if os.path.exists(entry_path) and os.path.exists(out_path):
            entry = read_json(entry_path)
            run_files = entry.get("run_files")
            if run_files is not None and all(os.path.exists(f) for f in run_files):
                # resume: runs already spilled and intact
                return pa.table({"part": [p], "run_files": [json.dumps(run_files)]})
            # docstore built but runs missing → re-emit from the docstore partition
            post_cols = ["doc_id"] + analyzed + [f"__norm_{f}" for f in analyzed]
            done = pq.read_table(out_path, columns=post_cols)
            run_files = _write_runs(_emit_chunked(done, analyzed, boundaries,
                                                  bucket_spec, positions), p)
            entry["run_files"] = run_files
            atomic_write_json(entry_path, entry)
            return pa.table({"part": [p], "run_files": [json.dumps(run_files)]})
        if not files:
            entry = {"part": p, "n_docs": 0, "sum_dl": {f: 0 for f in analyzed},
                     "path": out_path, "fingerprint": 0, "run_files": []}
            atomic_write_json(entry_path, entry)
            return pa.table({"part": [p], "run_files": [json.dumps([])]})
        group = pa.concat_tables([pq.read_table(f) for f in files])
        # dedup latest-by-key (upsert semantics: latest version wins)
        if version_field is not None:
            group = group.sort_by([(key_field, "ascending"), (version_field, "descending")])
            keys = group[key_field].to_numpy(zero_copy_only=False)
            keep = np.empty(len(keys), dtype=bool)
            keep[0] = True
            keep[1:] = keys[1:] != keys[:-1]
            group = group.filter(pa.array(keep))
        else:
            group = group.sort_by([(key_field, "ascending")])
            keys = group[key_field].to_numpy(zero_copy_only=False)
            if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
                raise ValueError(
                    f"duplicate {key_field!r} in partition {p} with no version_field "
                    "(reference requires _id per doc: RetrievalMaster.java:116-122)")
        if version_field is not None and version_field not in columns \
                and version_field in group.column_names:
            group = group.drop_columns([version_field])
        n = len(group)
        if key_is_long:
            doc_ids = group[key_field].to_numpy().astype(np.int64)
            order = np.argsort(doc_ids, kind="stable")
            group = group.take(pa.array(order))
            doc_ids = doc_ids[order]
        else:
            # delta generations get a generation namespace in the high bits so
            # ids never collide with the base (replace-mode builds keep gen bits
            # 0 — only one such generation is ever active)
            doc_ids = id_base + (np.int64(p) << STRIDE_BITS) \
                + np.arange(n, dtype=np.int64)
        if "doc_id" in group.column_names:
            group = group.drop_columns(["doc_id"])
        group = group.append_column("doc_id", pa.array(doc_ids, pa.int64()))
        sums = {}
        for fld in analyzed:
            dls = doc_lengths(group[fld].combine_chunks())
            group = group.append_column(f"__dl_{fld}", pa.array(dls, pa.int64()))
            group = group.append_column(f"__norm_{fld}", pa.array(int_to_byte4_np(dls)))
            sums[fld] = int(dls.sum())
        _atomic_write_parquet(group, out_path)
        keys_str = group[key_field].cast(pa.string()).to_numpy(zero_copy_only=False)
        fp = int(np.bitwise_xor.reduce(
            murmur3.murmur3_np(keys_str).astype(np.int64))) if n else 0
        run_files = _write_runs(_emit_chunked(group, analyzed, boundaries,
                                              bucket_spec, positions), p)
        entry = {"part": p, "n_docs": n, "sum_dl": sums, "path": out_path,
                 "fingerprint": fp, "run_files": run_files}
        atomic_write_json(entry_path, entry)
        return pa.table({"part": [p], "run_files": [json.dumps(run_files)]})

    def _box_cpu() -> float:
        """Box-wide CPU seconds (/proc/stat, steal excluded) — BYZER_TIMING
        prints per-phase deltas so contended phases are attributable."""
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            return sum(int(parts[i]) for i in (1, 2, 3, 6, 7)) / os.sysconf("SC_CLK_TCK")
        except OSError:
            return 0.0

    # ---- Stage A1: spill exchange (skipped when every partition is finalized) ----
    t_a = time.perf_counter()
    cpu_a = _box_cpu()
    if os.environ.get("BYZER_TIMING"):
        print(f"PHASE setup={t_a - t0:.2f}", flush=True)
    all_parts_done = all(
        os.path.exists(os.path.join(partials, f"docstore-{p:05d}.json"))
        for p in range(num_doc_parts))
    # term-range boundary sampling overlaps the spill stage when the source is a
    # local file set: a single Ray task samples the RAW source (same extract as
    # prep) while the spill fan-out runs, instead of a serial driver pass after it.
    # boundaries.json stays the durable artifact either way (resume reuses it).
    boundaries_path = os.path.join(gdir, "boundaries.json")
    boundary_ref = None
    if (source_paths and num_term_parts > 1 and not all_parts_done
            and not os.path.exists(boundaries_path)):
        boundary_ref = ray.remote(num_cpus=1)(_sample_boundaries).remote(
            source_paths, analyzed, num_term_parts, sample_docs, extract)
    spill_files: list[str] = []
    if not all_parts_done:
        if os.path.exists(spill_marker):
            spill_files = read_json(spill_marker)["files"]
        else:
            # an interrupted A1 leaves unlisted spill blocks around: start clean
            if os.path.isdir(spill_dir):
                import shutil as _sh
                _sh.rmtree(spill_dir)
            spill_ds = ds.map_batches(spill, batch_format="pyarrow")
            spill_files = []
            for r in spill_ds.take_all():
                spill_files.extend(json.loads(r["files"]))
            if os.environ.get("BYZER_BUILD_STATS"):
                print("=== spill stage stats ===\n", spill_ds.stats())
            atomic_write_json(spill_marker, {"files": sorted(spill_files)})
    t_spill = time.perf_counter() - t_a

    # ---- term-range boundaries from a sample (byte-balanced → skew rebalancing) ----
    # Boundaries are part of the generation's DURABLE state: a resumed rerun must
    # reuse the cuts the completed postings partitions were built under (re-sampling
    # from a different source — spill blocks vs docstore — yields different cuts and
    # would silently mis-route queries to partitions merged under the old cuts).
    t_b = time.perf_counter()
    if os.path.exists(boundaries_path):
        boundaries = read_json(boundaries_path)
    else:
        if boundary_ref is not None:
            boundaries = ray.get(boundary_ref)
        else:
            sample_paths = spill_files if spill_files else [
                os.path.join(docstore_dir, f"part-{p:05d}.parquet")
                for p in range(num_doc_parts)]
            boundaries = _sample_boundaries(sample_paths, analyzed,
                                            num_term_parts, sample_docs)
        atomic_write_json(boundaries_path, boundaries)
    if os.environ.get("BYZER_TIMING"):
        print(f"PHASE spill={t_spill:.2f} boundaries={time.perf_counter() - t_b:.2f} "
              f"spill_cpu={_box_cpu() - cpu_a:.1f}", flush=True)

    postings_dir = os.path.join(gdir, "postings")
    termstats_dir = os.path.join(gdir, "termstats")

    # ---- ANN stage: persist per-(vector field, serving bucket) HNSW + IVF ----
    # Launched right after the docstore partitions exist so the graph builds
    # OVERLAP the postings merge; gathered before publish. Serving actors then
    # mmap/load these instead of re-running the insertion loop per restart.
    vec_fields: list[str] = []
    if ann == "auto":
        vec_fields = [f.name for f in st.fields
                      if isinstance(f.data_type, dsl.ArrayType)
                      and isinstance(f.data_type.element, dsl.SingleType)
                      and f.data_type.element.name == "float"]

    def _launch_ann() -> list:
        """One Ray task per (field, bucket) still missing its npz; finished
        buckets resume from their _partials entry."""
        if not vec_fields:
            return []
        from byzer_retrieval_ray.index import ann_store
        by_bucket: dict[int, list[str]] = {}
        for p in range(num_doc_parts):
            ep = os.path.join(partials, f"docstore-{p:05d}.json")
            if not os.path.exists(ep):
                continue
            e = read_json(ep)
            if e["n_docs"] > 0:
                by_bucket.setdefault(p // group, []).append(e["path"])
        task = ray.remote(num_cpus=1)(ann_store.build_bucket_ann)
        out = []
        for fld in vec_fields:
            for b, ps in sorted(by_bucket.items()):
                npz = os.path.join(gdir, "ann", f"{fld}-b{b:05d}.npz")
                ep = os.path.join(partials, f"ann-{fld}-{b:05d}.json")
                if os.path.exists(ep) and os.path.exists(npz):
                    out.append(read_json(ep))
                else:
                    out.append(task.remote(sorted(ps), fld, b, npz, ep))
        return out

    def merge_write(item: pa.Table) -> pa.Table:
        _pin_worker_threads()
        r = int(item["range_part"][0].as_py())
        files = json.loads(item["files"][0].as_py())
        post_path = os.path.join(postings_dir, f"part-{r:05d}.parquet")
        ts_path = os.path.join(termstats_dir, f"part-{r:05d}.parquet")
        entry_path = os.path.join(partials, f"postings-{r:05d}.json")
        if os.path.exists(entry_path) and os.path.exists(post_path):
            return pa.table({"meta": [json.dumps(read_json(entry_path))]})
        t_m0 = time.perf_counter()
        group = pa.concat_tables([pq.read_table(f) for f in files]) if files \
            else P.RUN_SCHEMA.empty_table()
        run_bytes = group.nbytes
        post_tbl, ts_tbl = P.merge_runs(group.drop_columns(["range_part"]),
                                        codec_name=codec)
        t_m1 = time.perf_counter()
        _atomic_write_parquet(post_tbl, post_path, row_group_size=2048)
        _atomic_write_parquet(ts_tbl, ts_path)
        if os.environ.get("BYZER_TIMING"):
            print(f"MERGEW part={r} runs={len(group)} merge={t_m1 - t_m0:.2f} "
                  f"write={time.perf_counter() - t_m1:.2f}", flush=True)
        entry = {"range_part": r, "n_runs": len(group), "run_bytes": int(run_bytes),
                 "n_postings_rows": len(post_tbl), "n_terms": len(ts_tbl),
                 "n_postings": int(pc.sum(post_tbl["df"]).as_py() or 0),
                 "posting_bytes": int(post_tbl.nbytes),
                 "postings_path": post_path, "termstats_path": ts_path}
        atomic_write_json(entry_path, entry)
        return pa.table({"meta": [json.dumps(entry)]})

    # ---- finalize docstore partitions (emit runs → per-range run spill), then
    #      merge each term range from its own spill files. Both halves are plain
    #      map_batches fan-outs; the term exchange is the disk spill itself —
    #      no AllToAll sort of the run bytes (see _write_runs). ----
    t_c = time.perf_counter()
    cpu_c = _box_cpu()
    all_postings_done = all(
        os.path.exists(os.path.join(partials, f"postings-{r:05d}.json"))
        for r in range(num_term_parts))
    if all_parts_done and all_postings_done:
        ann_refs = _launch_ann()
        metas = [read_json(os.path.join(partials, f"postings-{r:05d}.json"))
                 for r in range(num_term_parts)]
    else:
        by_part: dict[int, list[str]] = {p: [] for p in range(num_doc_parts)}
        for f in spill_files:
            p = int(os.path.basename(os.path.dirname(f)).split("=")[1])
            by_part[p].append(f)
        part_items = [{"part": p, "files": json.dumps(sorted(fs))}
                      for p, fs in sorted(by_part.items())]
        fin_ds = ray.data.from_items(part_items,
                                     override_num_blocks=len(part_items)) \
            .map_batches(finalize_and_emit, batch_format="pyarrow", batch_size=1)
        run_files_by_range: dict[int, list[str]] = {r: [] for r in range(num_term_parts)}
        for row in fin_ds.take_all():     # barrier: merges need every part's runs
            for f in json.loads(row["run_files"]):
                r = int(os.path.basename(os.path.dirname(f)).split("=")[1])
                run_files_by_range[r].append(f)
        if os.environ.get("BYZER_BUILD_STATS"):
            print("=== finalize stage stats ===\n", fin_ds.stats())
        ann_refs = _launch_ann()     # overlaps the postings merge below
        cpu_f = _box_cpu()
        if os.environ.get("BYZER_TIMING"):
            print(f"PHASE finalize={time.perf_counter() - t_c:.2f} "
                  f"finalize_cpu={cpu_f - cpu_c:.1f}", flush=True)
        merge_items = [{"range_part": r, "files": json.dumps(sorted(fs))}
                       for r, fs in sorted(run_files_by_range.items())]
        meta_ds = ray.data.from_items(merge_items,
                                      override_num_blocks=len(merge_items)) \
            .map_batches(merge_write, batch_format="pyarrow", batch_size=1)
        metas = [json.loads(r["meta"]) for r in meta_ds.take_all()]
        if os.environ.get("BYZER_BUILD_STATS"):
            print("=== merge stage stats ===\n", meta_ds.stats())
        if os.environ.get("BYZER_TIMING"):
            print(f"PHASE merge_done_at={time.perf_counter() - t_c:.2f} "
                  f"merge_cpu={_box_cpu() - cpu_f:.1f}", flush=True)
    metas = [m for m in metas if m.get("n_postings_rows", 0) > 0 or m.get("n_runs", 0) > 0]

    ann_info: dict[str, dict] = {}
    for e in (ray.get(r) if not isinstance(r, dict) else r for r in ann_refs):
        fi = ann_info.setdefault(e["field"], {
            "max_conn": e["max_conn"], "beam_width": e["beam_width"],
            "buckets": {}})
        fi["buckets"][str(e["bucket"])] = {
            "path": e["path"], "n": e["n"],
            "ivf_n_centroids": e["ivf_n_centroids"]}

    summaries = [read_json(os.path.join(partials, f"docstore-{p:05d}.json"))
                 for p in range(num_doc_parts)
                 if os.path.exists(os.path.join(partials, f"docstore-{p:05d}.json"))]
    summaries = [e for e in summaries if e["n_docs"] > 0]
    n_docs = sum(e["n_docs"] for e in summaries)
    stats = {
        "n_docs": n_docs,
        "fields": {fld: {"sum_ttf": sum(e["sum_dl"].get(fld, 0) for e in summaries),
                         "doc_count": n_docs} for fld in analyzed},
    }
    atomic_write_json(os.path.join(gdir, "stats.json"), stats)

    # the spill exchanges are garbage once every partition is finalized/merged
    # (a rerun re-spills / re-emits from the docstore if entries were removed)
    # spill cleanup runs on a daemon thread — it's garbage collection, not build
    # work (every partition it removes is already finalized/merged durably), so it
    # must not extend the build wall; a rerun re-spills from the docstore if needed
    import shutil as _sh
    import threading as _th
    doomed = [d for d in (spill_dir, runspill_dir) if os.path.isdir(d)]
    if runspill_dir in doomed and not all(
            os.path.exists(os.path.join(partials, f"postings-{r:05d}.json"))
            for r in range(num_term_parts)):
        doomed.remove(runspill_dir)
    if doomed:
        _th.Thread(target=lambda: [_sh.rmtree(d, ignore_errors=True) for d in doomed],
                   daemon=True).start()
    t_postings = time.perf_counter() - t_c
    t_docstore = t_spill

    wall = time.perf_counter() - t0
    n_postings = sum(m["n_postings"] for m in metas)
    gen_info = {
        "generation": gen,
        "n_docs": n_docs,
        "num_doc_parts": num_doc_parts,
        "num_term_parts": num_term_parts,
        "bucket_spec": bucket_spec,
        "analyzed_fields": analyzed,
        "key_field": key_field,
        "codec": codec,
        "positions": positions,
        "boundaries": boundaries,
        "stats": stats,
        "docstore": {str(e["part"]): {k: e[k] for k in ("n_docs", "path", "fingerprint")}
                     for e in summaries},
        "postings": {str(m["range_part"]): m for m in metas},
        "ann": ann_info,
        "metrics": {
            "wall_sec": wall,
            "docstore_sec": t_docstore,
            "postings_sec": t_postings,
            "docs_per_sec": n_docs / wall if wall else 0.0,
            "n_postings": n_postings,
            "postings_per_sec": n_postings / t_postings if t_postings else 0.0,
            "shuffle_run_bytes": sum(m["run_bytes"] for m in metas),
            "index_bytes": sum(m["posting_bytes"] for m in metas),
        },
    }
    manifest.data["num_doc_parts"] = num_doc_parts
    manifest.data["key_field"] = key_field
    manifest.publish(gen, gen_info, mode=publish_mode,
                     replaces=replace_generations)
    if os.environ.get("BYZER_TIMING"):
        print(f"PHASE publish_tail={time.perf_counter() - t0 - wall:.2f} "
              f"total={time.perf_counter() - t0:.2f}", flush=True)
    return gen_info


EMIT_CHUNK_DOCS = int(os.environ.get("BYZER_EMIT_CHUNK_DOCS", 16_384))


def _emit_chunked(tbl: pa.Table, analyzed, boundaries, bucket_spec,
                  positions: bool = False) -> pa.Table:
    """Emit posting runs in bounded doc slices so a large doc partition never
    materializes its whole token stream at once (the runs of consecutive slices are
    disjoint doc ranges and merge downstream like any other runs)."""
    if len(tbl) <= EMIT_CHUNK_DOCS:
        return P.emit_runs(tbl, analyzed, boundaries, bucket_spec, positions)
    parts = []
    for start in range(0, len(tbl), EMIT_CHUNK_DOCS):
        sl = tbl.slice(start, EMIT_CHUNK_DOCS)
        parts.append(P.emit_runs(sl, analyzed, boundaries, bucket_spec, positions))
    return pa.concat_tables(parts)


def _sample_boundaries(paths, analyzed, num_term_parts, sample_docs,
                       extract: tuple[str, str] | None = None) -> list[str]:
    """Byte-balanced term-range cut points from a corpus sample.

    Reads up to ``sample_docs`` docs from the given parquet files (source blocks,
    spill blocks or docstore partitions), estimates per-term posting work by sampled
    TOTAL term frequency (df saturates at the sample size for head terms and would
    underweight them ~4×, measured), and cuts the cumulative curve into
    ``num_term_parts`` equal slices. Heavy (stopword-scale) terms therefore occupy
    partitions sized by their posting bytes — the explicit skew handling the term
    shuffle relies on.

    With ``extract=(src, dst)`` the sample is taken from RAW source files: the dst
    analyzed column is produced by extract_text(src) exactly as the build's prep
    stage does — this lets the sampler run as a Ray task concurrent with the spill
    stage instead of a serial driver pass over spill output.
    """
    if num_term_parts <= 1:
        return []
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return []
    if extract is not None:
        cols = [extract[0]] + [f for f in analyzed if f != extract[1]]
    else:
        cols = list(analyzed)
    acc: dict[str, int] = {}
    read = 0
    for path in paths:
        pf = pq.ParquetFile(path)
        avail = [c for c in cols if c in pf.schema_arrow.names]
        try:
            batch = next(pf.iter_batches(batch_size=min(sample_docs - read, 8192),
                                         columns=avail))
        except StopIteration:
            continue
        tbl = pa.Table.from_batches([batch])
        if extract is not None and extract[0] in tbl.column_names:
            txt = extract_text(tbl[extract[0]].combine_chunks())
            if extract[1] in tbl.column_names:
                tbl = tbl.drop_columns([extract[1]])
            tbl = tbl.append_column(extract[1], txt)
        for fld in analyzed:
            if fld not in tbl.column_names:
                continue
            tf = term_frequencies(tbl[fld].combine_chunks(),
                                  np.arange(len(tbl), dtype=np.int64))
            terms = tf["term"].to_numpy(zero_copy_only=False)
            tfs = tf["tf"].to_numpy()
            for t, c in zip(terms, tfs):
                acc[t] = acc.get(t, 0) + int(c)
        read += len(tbl)
        if read >= sample_docs:
            break
    if not acc:
        return []
    terms = np.array(sorted(acc.keys()), dtype=object)
    weights = np.array([acc[t] * 2.5 + 96.0 for t in terms])
    cum = np.cumsum(weights)
    targets = cum[-1] * np.arange(1, num_term_parts) / num_term_parts
    idx = np.searchsorted(cum, targets)
    cuts = sorted(set(str(terms[i]) for i in idx if i < len(terms)))
    return cuts
