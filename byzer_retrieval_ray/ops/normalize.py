"""Text normalization: the canonicalization pass that runs before exact /
near dedup so trivially-different copies ("The  Cat." vs "the cat") collide.

Steps (each optional, applied in this order):
  1. lowercase (Unicode-aware Arrow kernel),
  2. strip punctuation (RE2 character class — DuckDB's regexp_replace is RE2
     too, so the gate oracle feeds the same pattern to the same engine),
  3. collapse whitespace runs to single spaces and trim.

Scale shape: stateless vectorized ``map_batches`` — three Arrow kernels per
batch, no shuffle, no state. Composes with ops/dedup: ``exact_dedup(
normalize_dataset(ds), ...)`` de-duplicates case/punctuation variants.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PUNCT_RE = r"""[!-/:-@\[-`{-~]"""     # ASCII punctuation blocks
_WS_RE = r"\s+"


def normalize_text(batch: pa.Table, text_col: str = "text",
                   lowercase: bool = True, strip_punct: bool = True,
                   collapse_ws: bool = True,
                   out_col: str | None = None) -> pa.Table:
    col = batch[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if lowercase:
        arr = pc.utf8_lower(arr)
    if strip_punct:
        arr = pc.replace_substring_regex(arr, pattern=PUNCT_RE, replacement="")
    if collapse_ws:
        arr = pc.replace_substring_regex(arr, pattern=_WS_RE, replacement=" ")
        arr = pc.utf8_trim_whitespace(arr)
    dst = out_col or text_col
    if dst in batch.column_names:
        return batch.set_column(batch.column_names.index(dst), dst, arr)
    return batch.append_column(dst, arr)


def normalize_dataset(ds, text_col: str = "text", **opts):
    """Streaming normalization of ``text_col`` (see normalize_text for opts)."""
    return ds.map_batches(
        lambda b: normalize_text(b, text_col, **opts), batch_format="pyarrow")
