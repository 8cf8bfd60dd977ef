"""C4-style heuristic page cleaning (Raffel et al. 2020, §2.2) — the classic
web-corpus quality pass:

* keep only lines that end in a terminal punctuation mark and contain at
  least ``min_words_per_line`` words;
* drop the whole page if, after that, fewer than ``min_lines`` lines remain
  (line-level proxy for the paper's "fewer than 3 sentences" rule — the
  kept lines each end in terminal punctuation, so they approximate
  sentences; documented divergence);
* drop the whole page if the ORIGINAL text contains any ``badwords`` phrase
  (case-insensitive; the paper uses a blocklist — callers supply theirs),
  the placeholder "lorem ipsum", or a curly brace (source-code marker).

The reference engine has no corpus filtering (SURVEY.md §2) — extension.

100 TB shape: a single stateless streaming ``map_batches`` stage — zero
shuffle, zero driver state; line handling reuses the vectorized Arrow line
explosion from :mod:`ops.dedup` and every rule is an Arrow/numpy kernel
(RE2 regex, whitespace split, bincount) — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.ops.dedup import _explode_lines

TERMINAL_PUNCT_RE = '[.!?"]$'


def c4_filter_batch(batch: pa.Table, text_col: str = "text",
                    min_words_per_line: int = 5, min_lines: int = 3,
                    badwords: tuple[str, ...] = ("lorem ipsum",),
                    drop_braces: bool = True, sep: str = "\n",
                    id_col: str | None = None) -> pa.Table:
    """One batch of the C4 cleaning pass; returns surviving rows with
    ``text_col`` rebuilt from the kept lines. Usable directly or via
    :func:`c4_quality_filter`."""
    n = len(batch)
    if n == 0:
        return batch
    idc = id_col or batch.column_names[0]
    _, _, flat, counts = _explode_lines(batch, text_col, idc, sep)
    parents = np.repeat(np.arange(n), counts)

    ends_punct = pc.match_substring_regex(flat, TERMINAL_PUNCT_RE).to_numpy(
        zero_copy_only=False)
    words = pc.split_pattern_regex(flat, r"\s+")
    wflat = words.flatten()
    wcounts = pc.list_value_length(words).to_numpy().astype(np.int64)
    wparents = np.repeat(np.arange(len(flat)), wcounts)
    empties = pc.equal(wflat, "").to_numpy(zero_copy_only=False)
    n_words = wcounts - np.bincount(wparents[empties], minlength=len(flat)) \
        if len(wflat) else wcounts
    keep_line = ends_punct & (n_words >= min_words_per_line)

    kept_per_doc = np.bincount(parents[keep_line], minlength=n)
    low = pc.utf8_lower(batch[text_col])
    bad = np.zeros(n, dtype=bool)
    for w in badwords:
        bad |= pc.match_substring(low, w.lower()).to_numpy(zero_copy_only=False)
    if drop_braces:
        bad |= pc.match_substring(batch[text_col], "{").to_numpy(
            zero_copy_only=False)
        bad |= pc.match_substring(batch[text_col], "}").to_numpy(
            zero_copy_only=False)
    keep_doc = (kept_per_doc >= min_lines) & ~bad

    # rebuild kept docs from their kept lines
    lk = flat.to_numpy(zero_copy_only=False)[keep_line]
    pk = parents[keep_line]
    bounds = np.searchsorted(pk, np.arange(n + 1))
    new_texts = [sep.join(lk[bounds[r]:bounds[r + 1]]) if keep_doc[r] else ""
                 for r in range(n)]
    out = batch.set_column(batch.schema.get_field_index(text_col), text_col,
                           pa.array(new_texts, pa.string()))
    return out.filter(pa.array(keep_doc))


def c4_quality_filter(ds, text_col: str = "text",
                      min_words_per_line: int = 5, min_lines: int = 3,
                      badwords: tuple[str, ...] = ("lorem ipsum",),
                      drop_braces: bool = True, sep: str = "\n"):
    """Streaming C4 cleaning pass over a Dataset (see module docstring)."""

    def f(batch: pa.Table) -> pa.Table:
        return c4_filter_batch(batch, text_col, min_words_per_line, min_lines,
                               badwords, drop_braces, sep)

    return ds.map_batches(f, batch_format="pyarrow")
