"""GPT-style sequence packing — concatenate the whole corpus (in document-id
order, an EOS marker after every document) and cut the token stream into
fixed-length training sequences. This is the actual format an autoregressive
pretraining run consumes: ``ops/chunk.py`` windows WITHIN a document;
packing is the cross-document concat that wastes no tokens on padding.
The reference engine has no corpus operators (SURVEY.md §2) — extension.

Frozen semantics (the SQL oracle is exact):

* tokens = whitespace runs (``\\s+``, empties dropped);
* the global stream is ``tokens(d) + [eos]`` for every document d in
  ascending ``id_col`` order (ids must be unique and numeric);
* sequence w owns stream positions ``[w·L, (w+1)·L)``; its text is the
  positions' tokens joined with a single space; the final partial sequence
  is dropped unless ``keep_tail=True`` (training runs drop the tail).

100 TB shape — global order is the semantics, so the corpus must move, but
only twice and never through a Ray Data all-to-all sort:

1. **boundaries** — ``ops/quantiles.exact_quantiles`` over ``id_col``
   (exchange-free histogram narrowing) picks ``num_buckets`` id ranges.
2. **bucket totals** — one combiner pass emits per-(batch, bucket) token
   counts; a tiny groupby (≤ buckets × batches rows) gives each bucket's
   global start offset (driver folds ``num_buckets`` numbers).
3. **order + fragment** — docs route to their id-range bucket (first
   corpus-sized exchange); each bucket task sorts ITS range by id, lays
   tokens out at global positions, and cuts them at sequence boundaries
   into (seq_id, pos, fragment) rows — a sequence spanning two buckets gets
   one fragment from each.
4. **assemble** — fragments route by ``seq_id`` (second corpus-sized
   exchange, the export.py scatter analog); each group joins its fragments
   in position order and enforces the length-L contract.

Partitioning assumption (documented, same as the index build finalize and
ops/export.py): ONE id-range bucket must fit a worker's heap — size
``num_buckets`` ≥ corpus_bytes / worker_heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.ops.quantiles import exact_quantiles


def _tokens_with_eos(texts: pa.Array, eos: str):
    """Flat object array of each doc's tokens + a trailing eos, plus the
    per-doc (tokens+1) counts. Vectorized: one Arrow split + masked insert."""
    toks = pc.split_pattern_regex(texts, r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    words = pc.filter(flat, mask).to_numpy(zero_copy_only=False)
    par = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
    n_docs = len(texts)
    n_tok = (np.bincount(par, minlength=n_docs) if words.size
             else np.zeros(n_docs, np.int64)).astype(np.int64)
    n_with = n_tok + 1
    ends = np.cumsum(n_with) - 1                      # eos positions
    out = np.empty(int(n_with.sum()), dtype=object)
    out[ends] = eos
    tok_mask = np.ones(out.size, dtype=bool)
    tok_mask[ends] = False
    out[tok_mask] = words
    return out, n_with


def pack_sequences(ds, text_col: str = "text", id_col: str = "doc_id",
                   seq_len: int = 512, eos: str = "<eos>",
                   num_buckets: int = 16, keep_tail: bool = False):
    """Pack the corpus into length-``seq_len`` training sequences (module
    docstring). Returns a Dataset of (seq_id, text, n_tokens)."""
    import ray

    qs = [i / num_buckets for i in range(1, num_buckets)]
    if num_buckets > 1:
        qmap = exact_quantiles(ds, id_col, qs)      # ONE narrowing run
        bounds = np.array([qmap[q] for q in qs], dtype=np.float64)
    else:
        bounds = np.empty(0, np.float64)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, ids.astype(np.float64), side="left")

    # ---- stage 2: per-bucket token totals (combiner; tiny groupby) --------
    def count_partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        texts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        _, n_with = _tokens_with_eos(texts, eos)
        b = bucket_of(batch[id_col].to_numpy(zero_copy_only=False))
        tot = np.bincount(b, weights=n_with.astype(np.float64),
                          minlength=num_buckets)
        nz = np.flatnonzero(tot)
        return pa.table({"b": pa.array(nz.astype(np.int64)),
                         "n": pa.array(tot[nz].astype(np.int64))})

    totals = np.zeros(num_buckets, dtype=np.int64)
    agg = ds.map_batches(count_partial, batch_format="pyarrow") \
            .groupby("b").sum("n").to_pandas()
    totals[agg["b"].to_numpy()] = agg["sum(n)"].to_numpy()
    bucket_start = np.concatenate([[0], np.cumsum(totals)[:-1]])
    stream_len = int(totals.sum())
    start_ref = ray.put(bucket_start)

    # ---- stage 3: order within bucket, cut into sequence fragments --------
    def fragment(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"seq_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "frag": pa.array([], pa.large_string()),
                             "n": pa.array([], pa.int64())})
        group = group.sort_by([(id_col, "ascending")])
        texts = group[text_col].combine_chunks() if isinstance(
            group[text_col], pa.ChunkedArray) else group[text_col]
        stream, _ = _tokens_with_eos(texts, eos)
        b = int(bucket_of(group[id_col].to_numpy(
            zero_copy_only=False)[:1])[0])
        bstart = int(ray.get(start_ref)[b])
        bend = bstart + stream.size
        first_w, last_w = bstart // seq_len, (bend - 1) // seq_len
        cuts = np.unique(np.concatenate(
            [[bstart], np.arange(first_w + 1, last_w + 1) * seq_len,
             [bend]])).astype(np.int64)
        lens = np.diff(cuts)
        offs = (cuts - bstart)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()),
            pa.array(stream, pa.large_string()))
        frags = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        return pa.table({
            "seq_id": pa.array(cuts[:-1] // seq_len, pa.int64()),
            "pos": pa.array(cuts[:-1], pa.int64()),
            "frag": frags,
            "n": pa.array(lens, pa.int64()),
        })

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[id_col].to_numpy(zero_copy_only=False))
        return batch.select([id_col, text_col]).append_column(
            "__b", pa.array(b.astype(np.int64)))

    frags = ds.map_batches(add_bucket, batch_format="pyarrow") \
              .groupby("__b").map_groups(fragment, batch_format="pyarrow")

    # ---- stage 4: assemble sequences from position-ordered fragments ------
    n_full = stream_len // seq_len

    def assemble(group: pa.Table) -> pa.Table:
        group = group.sort_by([("seq_id", "ascending"), ("pos", "ascending")])
        sid = group["seq_id"].to_numpy()
        n = group["n"].to_numpy()
        uniq, starts = np.unique(sid, return_index=True)
        counts = np.diff(np.append(starts, sid.size))
        offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()),
            group["frag"].combine_chunks() if isinstance(
                group["frag"], pa.ChunkedArray) else group["frag"])
        text = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        n_tok = np.add.reduceat(n, starts)
        keep = (uniq < n_full) if not keep_tail else np.ones(len(uniq), bool)
        return pa.table({"seq_id": pa.array(uniq, pa.int64()),
                         "text": text,
                         "n_tokens": pa.array(n_tok, pa.int64())}
                        ).filter(pa.array(keep))

    def seq_bucket(batch: pa.Table) -> pa.Table:
        sb = batch["seq_id"].to_numpy() % num_buckets
        return batch.append_column("__sb", pa.array(sb.astype(np.int64)))

    return frags.map_batches(seq_bucket, batch_format="pyarrow") \
                .groupby("__sb").map_groups(assemble, batch_format="pyarrow")
