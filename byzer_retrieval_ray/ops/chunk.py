"""Document chunking / sequence packing: split each document's token stream
into fixed-size windows (with optional overlap) for LLM training or retrieval
ingestion — the "concat-and-chunk" stage every training-data pipeline runs
between cleaning and tokenization. The reference has no such operator.

Semantics (frozen so the SQL oracle is exact):
  * tokens = whitespace split, empties dropped (the engine's analyzer);
  * window starts at token offsets 0, (C−O), 2(C−O), … while start < n_tok;
  * each chunk is the next min(C, n_tok − start) tokens rejoined with a single
    space; short tails are emitted (never dropped);
  * chunk_id is the doc-local window index (start // (C−O)).

Scale shape: stateless ``map_batches`` flat-map, fully vectorized — one Arrow
whitespace explode per batch, numpy range concatenation for the (overlapping)
gather indices, then `pa.ListArray.from_arrays` + `pc.binary_join` to
re-materialize chunk strings. No per-row Python, no shuffle; output rows ≈
input tokens / (C−O), streaming through the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.index.postings import _concat_ranges


def chunk_batch(batch: pa.Table, chunk_tokens: int = 512, overlap: int = 0,
                text_col: str = "text", id_col: str = "doc_id",
                drop_covered_tails: bool = False) -> pa.Table:
    """(id_col, chunk_id, chunk_text, n_chunk_tokens) rows for one batch.

    ``drop_covered_tails=True`` skips windows past the first whose tokens are
    entirely contained in the previous window (start + overlap >= n_tok, e.g.
    7 tokens at C=4/O=2 would emit a 1-token tail already covered by the
    previous chunk) — opt-in so the default frozen semantics (and the gate
    oracle) are unchanged; duplicate tail tokens inflate training epochs.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    from byzer_retrieval_ray.ops.text import _explode_tokens
    col = batch[text_col]
    texts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat, _, n_tok = _explode_tokens(texts)
    doc_tok_offs = np.concatenate([[0], np.cumsum(n_tok)])

    n_chunks = -(-n_tok // step) * (n_tok > 0)          # ceil, 0 for empty docs
    chunk_parent = np.repeat(np.arange(len(n_tok)), n_chunks)
    chunk_idx = _concat_ranges(np.zeros(len(n_tok), np.int64), n_chunks)
    starts_local = chunk_idx * step
    if drop_covered_tails:
        keep = ~((chunk_idx > 0)
                 & (starts_local + overlap >= n_tok[chunk_parent]))
        chunk_parent = chunk_parent[keep]
        chunk_idx = chunk_idx[keep]
        starts_local = starts_local[keep]
    lens = np.minimum(chunk_tokens, n_tok[chunk_parent] - starts_local)
    gather = _concat_ranges(doc_tok_offs[chunk_parent] + starts_local, lens)

    toks = pc.take(flat, pa.array(gather, pa.int64()))
    # int64 offsets via LargeListArray: a batch whose gathered token count
    # (inflated by overlap) exceeds 2^31-1 must not silently wrap int32 and
    # corrupt chunk boundaries (the 100 TB streaming claim)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()),
                                          toks.combine_chunks()
                                          if isinstance(toks, pa.ChunkedArray)
                                          else toks)
    chunk_text = pc.binary_join(lists, " ")

    ids = batch[id_col].to_numpy(zero_copy_only=False)[chunk_parent]
    return pa.table({
        id_col: pa.array(ids, batch.schema.field(id_col).type),
        "chunk_id": pa.array(chunk_idx, pa.int64()),
        "chunk_text": chunk_text,
        "n_chunk_tokens": pa.array(lens, pa.int64()),
    })


def chunk_documents(ds, chunk_tokens: int = 512, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id",
                    drop_covered_tails: bool = False):
    """Dataset-level streaming chunker (rows out ≥ rows in — a flat map)."""
    return ds.map_batches(
        lambda b: chunk_batch(b, chunk_tokens, overlap, text_col, id_col,
                              drop_covered_tails),
        batch_format="pyarrow")
