"""Whitespace analysis — the reference's only analyzer.

The reference configures Lucene's ``WhitespaceAnalyzer`` for both indexing and query
parsing (RetrievalWorker.java:67, :339): split on whitespace only, no lowercasing, no
stopwords, no stemming. Byte-compatibility with that tokenizer is a parity requirement
(SURVEY.md §7.3), so ``tokenize_query`` is Python's ``str.split()`` (splits on any
unicode whitespace, drops empties) and the batch kernel uses Arrow's
``utf8_split_whitespace`` with empty-token filtering — the two agree and are
cross-checked in tests.

The batch kernel is the build pipeline's hot path: it turns an Arrow string column into
per-document term frequencies with pure Arrow/numpy ops (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokenize_query(text: str) -> list[str]:
    """Whitespace analysis of a query / single document (WhitespaceAnalyzer parity)."""
    return text.split()


def doc_lengths(texts: pa.Array) -> np.ndarray:
    """Number of whitespace tokens per document (int64), vectorized."""
    toks = pc.utf8_split_whitespace(texts)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_docs = len(texts)
    return np.bincount(parents[nonempty], minlength=n_docs).astype(np.int64)


def term_frequencies(texts: pa.Array, doc_ids: np.ndarray) -> pa.Table:
    """(doc_id, term, tf, doc_len) rows for a batch of documents.

    Tokenizes with Arrow, flattens to (parent_index, term) pairs, drops empty tokens,
    and aggregates counts with Arrow's hash group-by. ``doc_len`` is repeated per row
    so downstream posting construction can carry the norm byte without a join.
    """
    toks = pc.utf8_split_whitespace(texts)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = pc.filter(flat, mask)
    parents = pc.filter(parents, mask)

    n_docs = len(texts)
    parents_np = parents.to_numpy(zero_copy_only=False)
    dls = np.bincount(parents_np, minlength=n_docs).astype(np.int64)

    pairs = pa.table({
        "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)[parents_np]),
        "term": flat,
        "doc_len": pa.array(dls[parents_np]),
    })
    grouped = pairs.group_by(["doc_id", "term", "doc_len"]).aggregate([("term", "count")])
    return grouped.rename_columns(["doc_id", "term", "doc_len", "tf"])
