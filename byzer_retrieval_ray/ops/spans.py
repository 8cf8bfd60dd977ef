"""Exact duplicated-span annotation (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" — the EXACTSUBSTR pass, annotation form).

A ``window``-token span is DUPLICATED when its rolling hash occurs at least
twice anywhere in the corpus (other docs or elsewhere in the same doc). For
every doc with at least one window this op reports::

    n_windows        number of token windows (n_tok - window + 1; docs with
                     0 < n_tok < window contribute ONE whole-doc window —
                     the same short-doc fallback as the shingle family)
    n_dup_windows    how many of them are duplicated
    dup_token_frac   fraction of the doc's tokens covered by the union of
                     its duplicated windows (the removal-candidate mass)

Pipelines threshold ``dup_token_frac`` to drop or trim boilerplate-heavy
docs; annotation (not byte surgery) keeps the op deterministic and
oracle-checkable. The reference engine has no corpus-level dedup
(SURVEY.md §2.6) — extension.

100 TB shape: two hash-bucketed exchanges, documents never shuffle.
Stage 1 emits one narrow (hash, id, window_no, n_tok) row per window (poly
word-k-gram hashes — ``functions/polyhash.py``, SQL-replicable) plus one
per-doc summary row routed straight to the id bucket; stage 2's hash bucket
finds hashes with ≥ 2 occurrences with one run-length pass and forwards only
the DUP rows to the id bucket; the id bucket merges equal-width intervals
vectorized (sorted-starts gap clipping) — no per-row Python, no driver state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.murmur3 import murmur3_np
from byzer_retrieval_ray.ops.dedup import _poly_shingle_hashes


def duplicate_spans(ds, text_col: str, id_col: str, window: int = 32,
                    num_buckets: int = 64):
    """Annotate corpus-duplicated ``window``-token spans (module docstring).
    Returns a Dataset of (id, n_windows, n_dup_windows, dup_token_frac)."""
    nb = num_buckets

    def _idb(ids: np.ndarray) -> np.ndarray:
        return (murmur3_np(ids.astype("U")).astype(np.int64) % nb) \
            .astype(np.int32)

    def win_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        flat, offs = _poly_shingle_hashes(texts, window)
        counts = np.diff(offs)
        words = pc.split_pattern_regex(batch[text_col], r"\s+")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
            else words
        wflat = words.flatten()
        wcnt = pc.list_value_length(words).to_numpy().astype(np.int64)
        if len(wflat):
            emp = pc.equal(wflat, "").to_numpy(zero_copy_only=False)
            wpar = np.repeat(np.arange(len(batch)), wcnt)
            n_tok = wcnt - np.bincount(wpar[emp], minlength=len(batch))
        else:
            n_tok = wcnt
        parents = np.repeat(np.arange(len(batch)), counts)
        w_no = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) \
            if counts.sum() else np.empty(0, np.int64)
        h = flat.astype(np.int64)
        docs_with = counts > 0
        sid = ids[docs_with]
        win = pa.table({
            "h": pa.array(h, pa.int64()),
            "id": pa.array(ids[parents], pa.int64()),
            "w": pa.array(w_no, pa.int64()),
            "n_tok": pa.array(n_tok[parents], pa.int64()),
            "n_win": pa.array(counts[parents], pa.int64()),
            "kind": pa.array(np.zeros(parents.size, np.int8)),
            "kb": pa.array(((h % nb) + nb) % nb, pa.int32()),
        })
        summ = pa.table({
            "h": pa.array(np.zeros(sid.size, np.int64)),
            "id": pa.array(sid, pa.int64()),
            "w": pa.array(np.zeros(sid.size, np.int64)),
            "n_tok": pa.array(n_tok[docs_with], pa.int64()),
            "n_win": pa.array(counts[docs_with], pa.int64()),
            "kind": pa.array(np.ones(sid.size, np.int8)),
            "kb": pa.array(_idb(sid), pa.int32()),
        })
        return pa.concat_tables([win, summ])

    def dup_only(group: pa.Table) -> pa.Table:
        """hash bucket: window rows whose hash occurs >= 2 times, re-keyed by
        id; summary rows pass through untouched (they were keyed by id and
        only share this exchange when buckets collide)."""
        kind = group["kind"].to_numpy()
        summ = group.filter(pa.array(kind == 1))
        win = group.filter(pa.array(kind == 0))
        h = win["h"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        first = np.ones(hs.size, dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        seg = np.cumsum(first) - 1
        seglen = np.diff(np.append(np.flatnonzero(first), hs.size))[seg]
        dup_sel = order[seglen >= 2]
        dup = win.take(pa.array(dup_sel))
        ids = dup["id"].to_numpy()
        dup = dup.set_column(dup.schema.get_field_index("kb"), "kb",
                             pa.array(_idb(ids), pa.int32()))
        return pa.concat_tables([dup, summ])

    def per_doc(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy()
        summ = group.filter(pa.array(kind == 1))
        dup = group.filter(pa.array(kind == 0))
        sid = summ["id"].to_numpy()
        s_order = np.argsort(sid, kind="stable")
        sid = sid[s_order]
        n_tok = summ["n_tok"].to_numpy()[s_order]
        n_win = summ["n_win"].to_numpy()[s_order]
        n_dup = np.zeros(sid.size, np.int64)
        covered = np.zeros(sid.size, np.int64)
        if len(dup):
            d_id = dup["id"].to_numpy()
            d_w = dup["w"].to_numpy()
            order = np.lexsort((d_w, d_id))
            d_id, d_w = d_id[order], d_w[order]
            loc = np.searchsorted(sid, d_id)
            width = np.minimum(window, n_tok[loc])
            # union of equal-width intervals: clip each start's reach at the
            # next start within the same doc
            last_in_doc = np.ones(d_id.size, dtype=bool)
            last_in_doc[:-1] = d_id[1:] != d_id[:-1]
            reach = width.astype(np.int64).copy()
            if d_id.size > 1:
                gap = d_w[1:] - d_w[:-1]
                inner = ~last_in_doc[:-1]
                reach[:-1][inner] = np.minimum(reach[:-1][inner], gap[inner])
            np.add.at(covered, loc, reach)
            np.add.at(n_dup, loc, 1)
        frac = np.zeros(sid.size, np.float64)
        nz = n_tok > 0
        frac[nz] = covered[nz] / n_tok[nz].astype(np.float64)
        return pa.table({
            "id": pa.array(sid, pa.int64()),
            "n_windows": pa.array(n_win, pa.int64()),
            "n_dup_windows": pa.array(n_dup, pa.int64()),
            "dup_token_frac": pa.array(frac, pa.float64()),
        })

    return ds.map_batches(win_rows, batch_format="pyarrow") \
        .groupby("kb").map_groups(dup_only, batch_format="pyarrow") \
        .groupby("kb").map_groups(per_doc, batch_format="pyarrow")
