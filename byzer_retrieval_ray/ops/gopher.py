"""Gopher-style document quality rules (Rae et al. 2021, Appendix A1.1) —
the second canonical public web-corpus filter next to C4 (:mod:`ops.c4`):

* total word count inside ``[min_words, max_words]`` (paper: 50 .. 100 000);
* mean word length inside ``[min_mean_word_len, max_mean_word_len]``
  (paper: 3 .. 10 characters);
* symbol-to-word ratio (``#`` plus non-overlapping ``...`` occurrences,
  counted over the raw text) at most ``max_symbol_ratio`` (paper: 0.1);
* at most ``max_bullet_frac`` of lines starting with a bullet marker
  (paper: 90 %) and at most ``max_ellipsis_frac`` of lines ending with an
  ellipsis (paper: 30 %);
* at least ``min_alpha_frac`` of words containing an alphabetic character
  (paper: 80 %);
* at least ``min_stop_words`` DISTINCT members of the paper's stop-word set
  {the, be, to, of, and, that, have, with} present as (lower-cased) tokens.

Words are whitespace runs (``\\s+`` split, empties dropped); lines split on
``\\n``.  The reference engine has no corpus filtering (SURVEY.md §2) —
extension, same family as `ops/c4.py`.

100 TB shape: a single stateless streaming ``map_batches`` stage — zero
shuffle, zero driver state.  Every rule is an Arrow/numpy kernel over the
exploded word/line arrays (split_pattern_regex + np.repeat parent ids +
bincount); no per-row Python in the hot path.  ``gopher_stats`` keeps all
rows and emits the per-doc metrics (what the gate value-checks);
``gopher_quality_filter`` drops failing rows for pipeline use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLET_PREFIXES = ("• ", "- ", "* ")
ELLIPSIS_END_RE = r"(\.\.\.|…)$"


def _round4(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero rounding to 4 decimals for non-negative metrics —
    matches DuckDB's ROUND (std::round); np.round is banker's and diverges on
    the exact .5 ties the power-of-two word/line counts here produce."""
    return np.floor(x * 1e4 + 0.5) / 1e4


def _frac(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """num/den as float64 with 0/0 -> 0 (metric for an empty doc)."""
    out = np.zeros(len(den), dtype=np.float64)
    nz = den > 0
    out[nz] = num[nz].astype(np.float64) / den[nz]
    return out


def gopher_stats_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_words: int = 50, max_words: int = 100_000,
                       min_mean_word_len: float = 3.0,
                       max_mean_word_len: float = 10.0,
                       max_symbol_ratio: float = 0.1,
                       max_bullet_frac: float = 0.9,
                       max_ellipsis_frac: float = 0.3,
                       min_alpha_frac: float = 0.8,
                       min_stop_words: int = 2) -> pa.Table:
    """Per-doc Gopher rule metrics + keep flag for one Arrow batch."""
    n = len(batch)
    text = batch[text_col].combine_chunks() if isinstance(
        batch[text_col], pa.ChunkedArray) else batch[text_col]

    # --- words: \s+ split, empties dropped -------------------------------
    words = pc.split_pattern_regex(text, r"\s+")
    wflat = words.flatten()
    wcounts = pc.list_value_length(words).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    wparents = np.repeat(np.arange(n), wcounts)
    nonempty = pc.not_equal(wflat, "").to_numpy(zero_copy_only=False)
    n_words = (np.bincount(wparents[nonempty], minlength=n)
               if len(wflat) else np.zeros(n, dtype=np.int64))

    wlens = pc.utf8_length(wflat).to_numpy(zero_copy_only=False)
    sum_len = (np.bincount(wparents[nonempty], minlength=n,
                           weights=wlens[nonempty])
               if len(wflat) else np.zeros(n))
    mean_word_len = _frac(sum_len, n_words)

    has_alpha = pc.match_substring_regex(wflat, "[A-Za-z]").to_numpy(
        zero_copy_only=False)
    n_alpha = (np.bincount(wparents[nonempty & has_alpha], minlength=n)
               if len(wflat) else np.zeros(n, dtype=np.int64))
    alpha_frac = _frac(n_alpha, n_words)

    # distinct stop words present as lower-cased tokens
    wlow = pc.utf8_lower(wflat)
    n_stop = np.zeros(n, dtype=np.int64)
    for sw in STOP_WORDS:
        hit = pc.equal(wlow, sw).to_numpy(zero_copy_only=False)
        if hit.any():
            n_stop += np.bincount(wparents[hit], minlength=n) > 0

    # --- symbols over the raw text ---------------------------------------
    n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
    n_ellip = pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
    symbol_ratio = _frac(n_hash + n_ellip, n_words)

    # --- lines ------------------------------------------------------------
    lines = pc.split_pattern(text, "\n")
    lflat = lines.flatten()
    lcounts = pc.list_value_length(lines).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lparents = np.repeat(np.arange(n), lcounts)
    bullet = np.zeros(len(lflat), dtype=bool)
    for p in BULLET_PREFIXES:
        bullet |= pc.starts_with(lflat, p).to_numpy(zero_copy_only=False)
    ell_end = pc.match_substring_regex(lflat, ELLIPSIS_END_RE).to_numpy(
        zero_copy_only=False)
    n_lines = lcounts
    n_bullet = (np.bincount(lparents[bullet], minlength=n)
                if len(lflat) else np.zeros(n, dtype=np.int64))
    n_ell = (np.bincount(lparents[ell_end], minlength=n)
             if len(lflat) else np.zeros(n, dtype=np.int64))
    bullet_frac = _frac(n_bullet, n_lines)
    ellipsis_frac = _frac(n_ell, n_lines)

    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (mean_word_len >= min_mean_word_len)
            & (mean_word_len <= max_mean_word_len)
            & (symbol_ratio <= max_symbol_ratio)
            & (bullet_frac <= max_bullet_frac)
            & (ellipsis_frac <= max_ellipsis_frac)
            & (alpha_frac >= min_alpha_frac)
            & (n_stop >= min_stop_words))

    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words, pa.int64()),
        "mean_word_len": pa.array(_round4(mean_word_len), pa.float64()),
        "symbol_ratio": pa.array(_round4(symbol_ratio), pa.float64()),
        "bullet_frac": pa.array(_round4(bullet_frac), pa.float64()),
        "ellipsis_frac": pa.array(_round4(ellipsis_frac), pa.float64()),
        "alpha_frac": pa.array(_round4(alpha_frac), pa.float64()),
        "n_stop": pa.array(n_stop, pa.int64()),
        "keep": pa.array(keep, pa.bool_()),
    })


def gopher_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                 **rules):
    """Streaming per-doc Gopher metrics + keep flag (all rows kept)."""

    def f(batch: pa.Table) -> pa.Table:
        return gopher_stats_batch(batch, text_col, id_col, **rules)

    return ds.map_batches(f, batch_format="pyarrow")


def gopher_quality_filter(ds, text_col: str = "text",
                          id_col: str = "doc_id", **rules):
    """Streaming Gopher cleaning pass: drop documents failing any rule,
    original columns preserved."""

    def f(batch: pa.Table) -> pa.Table:
        stats = gopher_stats_batch(batch, text_col, id_col, **rules)
        return batch.filter(stats["keep"])

    return ds.map_batches(f, batch_format="pyarrow")
