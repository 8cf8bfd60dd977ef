"""Per-batch candidate kernels shared by the suggest family.

The same row-local kernels run in BOTH serving shapes:

  * offline / non-activated tables — ``map_batches`` over a column-pruned
    Ray Data scan of the termstats parquet parts (table/api.py suggest /
    complete / phrase_suggest), and
  * activated tables — segment actors keep their assigned termstats
    parts CACHED in memory (the BucketSearcher pattern: load once in the
    actor, answer per-RPC) and run the identical kernel per cached part
    (index/actors.py ``suggest_candidates`` etc.), turning a suggest
    call from a per-query Dataset launch into an actor scatter of a few
    candidate rows.

Kernels are pure functions of one (field, term, df[, ttf]) batch — the
actor/Dataset split can never diverge. Suggest shapes follow Lucene
suggest.spell.DirectSpellChecker / completion / phrase suggesters (the
reference exposes no suggest API; extension)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.fuzzy import edit_distances, fuzzy_candidates

_SPELL_EMPTY = pa.table({"term": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
_PHRASE_EMPTY = pa.table({"tok": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "ttf": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})


def spell_candidates(batch: pa.Table, field: str, term: str, max_edits: int,
                     transpositions: bool) -> pa.Table:
    """Dictionary terms within ``max_edits`` of ``term`` (the exact term
    excluded): vectorized length-band + bag-distance prefilter, then the
    banded OSA/Levenshtein DP on survivors only."""
    sub = batch.filter(pc.equal(batch["field"], field))
    terms = sub["term"].to_pylist()
    if not terms:
        return _SPELL_EMPTY
    lens = np.array([len(t) for t in terms], dtype=np.int64)
    idx = fuzzy_candidates(term, terms, lens, max_edits)
    if idx.size == 0:
        return _SPELL_EMPTY
    cand = [terms[i] for i in idx]
    d = edit_distances(term, cand, max_edits, transpositions)
    keep = (d >= 1) & (d <= max_edits)
    kidx = idx[keep]
    return pa.table({
        "term": pa.array([terms[i] for i in kidx], pa.string()),
        "df": sub["df"].take(pa.array(kidx)).cast(pa.int64()),
        "dist": pa.array(d[keep], pa.int64())})


def prefix_candidates(batch: pa.Table, field: str, prefix: str) -> pa.Table:
    """Dictionary terms starting with ``prefix`` (term == prefix included)."""
    sub = batch.filter(pc.equal(batch["field"], field))
    sub = sub.filter(pc.starts_with(pc.cast(sub["term"], pa.string()),
                                    prefix))
    return pa.table({"term": pc.cast(sub["term"], pa.string()),
                     "df": pc.cast(sub["df"], pa.int64())})


def token_candidates(batch: pa.Table, field: str, tokens: list[str],
                     max_edits: int, transpositions: bool) -> pa.Table:
    """Per-token dictionary candidates for the phrase suggester (distance
    0 included — the token itself when it's in the dictionary)."""
    sub = batch.filter(pc.equal(batch["field"], field))
    terms = sub["term"].to_pylist()
    if not terms:
        return _PHRASE_EMPTY
    lens = np.array([len(t) for t in terms], dtype=np.int64)
    cols: dict[str, list] = {k: [] for k in ("tok", "term", "df", "ttf",
                                             "dist")}
    for ti, tok in enumerate(tokens):
        idx = fuzzy_candidates(tok, terms, lens, max_edits)
        if idx.size == 0:
            continue
        cand = [terms[i] for i in idx]
        d = edit_distances(tok, cand, max_edits, transpositions)
        keep = d <= max_edits                    # distance 0 included
        kidx = idx[keep]
        cols["tok"].extend([ti] * int(kidx.size))
        cols["term"].extend(terms[i] for i in kidx)
        cols["df"].extend(sub["df"].take(pa.array(kidx)).to_pylist())
        cols["ttf"].extend(sub["ttf"].take(pa.array(kidx)).to_pylist())
        cols["dist"].extend(int(x) for x in d[keep])
    return pa.table({
        "tok": pa.array(cols["tok"], pa.int64()),
        "term": pa.array(cols["term"], pa.string()),
        "df": pa.array(cols["df"], pa.int64()),
        "ttf": pa.array(cols["ttf"], pa.int64()),
        "dist": pa.array(cols["dist"], pa.int64())})
