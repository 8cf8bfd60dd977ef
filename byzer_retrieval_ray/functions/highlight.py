"""Snippet (best-passage) selection for keyword hits.

The Lucene UnifiedHighlighter shape, simplified to a deterministic,
SQL-replicable core: the best fixed-width token window of a document is the
one containing the most DISTINCT query terms, ties broken by the earliest
start. Lucene scores passages BM25-ish over sentence breaks; fixed token
windows + distinct-term count keep the selection exactly reproducible in the
DuckDB oracle while preserving the useful behavior (the snippet centers on
the densest cluster of query terms).

Only plain terms highlight (phrases/prefix/fuzzy clauses contribute matches
through their member terms when those also appear as plain terms) — the
engine-side caller extracts the parsed query's term set.
"""

from __future__ import annotations

import numpy as np


def best_window(tokens: list[str], terms: list[str] | set[str],
                window: int) -> tuple[int, int]:
    """(start, n_matched) of the best ``window``-token window: maximal count
    of distinct ``terms`` present, ties to the smallest start (0-based).
    A document shorter than ``window`` is one single window."""
    n = len(tokens)
    if n == 0:
        return 0, 0
    w = min(int(window), n)
    n_starts = n - w + 1
    arr = np.asarray(tokens, dtype=object)
    counts = np.zeros(n_starts, dtype=np.int64)
    for t in set(terms):
        c = np.cumsum((arr == t).astype(np.int64))
        # window [s, s+w) contains t iff its cumulative count increases
        in_win = (c[w - 1:] - np.concatenate([[0], c[:-w]])) > 0
        counts += in_win
    s = int(np.lexsort((np.arange(n_starts), -counts))[0])
    return s, int(counts[s])


def make_snippet(text: str, terms: list[str] | set[str],
                 window: int) -> tuple[str, int]:
    """Whitespace-tokenize ``text`` (the indexing analyzer), pick the best
    window, and return (snippet, n_matched). The snippet joins tokens with a
    single space — identical to the oracle's array_to_string(list_slice(...))
    reconstruction, so snippets are byte-comparable."""
    tokens = text.split()
    s, m = best_window(tokens, terms, window)
    w = min(int(window), len(tokens))
    return " ".join(tokens[s:s + w]), m
