"""PII detection + redaction over a text column.

A core training-data-pipeline stage the reference lacks (its documents arrive
pre-cleaned): find personally-identifying substrings — emails, IPv4 addresses,
international phone numbers — count them per document, and replace them with
typed placeholder tokens.

Scale shape: a stateless, fully vectorized ``map_batches`` stage. Detection and
redaction run as Arrow RE2 kernels (`pc.count_substring_regex`,
`pc.replace_substring_regex`) over the whole batch — no per-row Python, no
shuffle, no driver state; at 100 TB this is a pure streaming map. DuckDB's
`regexp_*` functions are RE2 too, so the gate oracle runs the *same* pattern
text through the *same* regex engine — the SQL parity is engine-level, not a
reimplementation.

Semantics (fixed so the SQL mirror is trivial):
  * per-pattern counts are measured on the ORIGINAL text (non-overlapping RE2
    matches, the same count `len(regexp_extract_all(text, p))` gives);
  * redaction applies the patterns SEQUENTIALLY in list order, each over the
    previous pattern's output (nested `regexp_replace(..., 'g')` in SQL).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement). Patterns are deliberately conservative —
# a scrubber that over-matches destroys training text. Order matters only when
# matches overlap (emails are redacted before their host part could be read as
# a bare domain by a later pattern).
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # international form: '+' then 8-16 digits with optional space/dash gaps
    ("phone", r"\+[0-9][0-9 \-]{6,14}[0-9]", "<PHONE>"),
]


def scrub_pii(batch: pa.Table, text_col: str = "text",
              patterns: list[tuple[str, str, str]] | None = None,
              keep_original: bool = False) -> pa.Table:
    """Add per-pattern count columns ``n_<name>`` and rewrite ``text_col`` with
    placeholders (the original moves to ``<text_col>_raw`` iff keep_original)."""
    pats = DEFAULT_PATTERNS if patterns is None else patterns
    col = batch[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    out = batch
    clean = arr
    for name, pat, repl in pats:
        counts = pc.count_substring_regex(arr, pattern=pat)
        out = out.append_column(f"n_{name}", pc.cast(counts, pa.int64()))
        clean = pc.replace_substring_regex(clean, pattern=pat, replacement=repl)
    if keep_original:
        out = out.append_column(f"{text_col}_raw", arr)
    idx = out.column_names.index(text_col)
    return out.set_column(idx, text_col, clean)


class PIIScrubber:
    """Actor-pool form: ``ds.map_batches(PIIScrubber, fn_constructor_kwargs=...,
    concurrency=N, batch_format="pyarrow")``. Construction is trivial today
    (patterns are strings; Arrow compiles them per kernel call), but the class
    keeps the signature stable for heavier recognizers (NER models) later."""

    def __init__(self, text_col: str = "text",
                 patterns: list[tuple[str, str, str]] | None = None,
                 keep_original: bool = False):
        self.text_col = text_col
        self.patterns = DEFAULT_PATTERNS if patterns is None else patterns
        self.keep_original = keep_original

    def __call__(self, batch: pa.Table) -> pa.Table:
        return scrub_pii(batch, self.text_col, self.patterns, self.keep_original)


def scrub_dataset(ds, text_col: str = "text",
                  patterns: list[tuple[str, str, str]] | None = None,
                  concurrency: int = 2):
    """Dataset-level convenience: streaming PII scrub of ``text_col``.
    (An actor-pool stage always needs a concurrency; size it to the cluster.)"""
    return ds.map_batches(
        PIIScrubber, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"text_col": text_col, "patterns": patterns})
