"""Per-document TF-IDF keyword extraction over a corpus.

For every document, the top-``k`` tokens by ``tf · ln(N / df)`` (ties broken
by token string) — the classic corpus-level keyword/salience pass (tag
generation, topic sketching, index pruning). The reference engine exposes
only per-term global stats through its index (SURVEY.md §2.5); this computes
the full per-doc ranking as a standalone Dataset op — extension.

100 TB shape: two hash-bucketed exchanges, both carrying one narrow row per
DISTINCT (doc, token) pair — documents never shuffle, and no global
vocabulary table ever materializes on the driver or broadcasts:

1. explode each doc's distinct tokens with their tf and doc length, keyed by
   token hash — every occurrence row of a token lands in one bucket, so that
   bucket computes the token's exact global df locally and stamps it onto
   each row (one vectorized run-length pass);
2. re-key the stamped rows by doc id; each doc's bucket selects its top-k by
   score with one lexsort — no per-row Python anywhere.

``N`` (corpus size) is the one driver-side scalar (``ds.count()``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.murmur3 import murmur3_np


def tfidf_topk(ds, text_col: str, id_col: str, k: int = 10,
               num_buckets: int = 64, n_docs: int | None = None):
    """Top-``k`` TF-IDF tokens per doc. Returns a Dataset of
    ``(id, token, score, rank)`` rows (rank 1-based by score desc, token asc).
    ``n_docs`` overrides the corpus-size count (one full pass) when the
    caller already knows it."""
    nb = num_buckets
    n = int(n_docs) if n_docs is not None else int(ds.count())

    def tok_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        la = pc.split_pattern_regex(pa.array(texts, pa.string()), r"\s+")
        counts = pc.list_value_length(la).to_numpy().astype(np.int64)
        flat = la.flatten().to_numpy(zero_copy_only=False)
        parents = np.repeat(np.arange(len(batch)), counts)
        keep = flat != ""
        flat, parents = flat[keep], parents[keep]
        # distinct (doc, token) with tf via one lexsort run-length pass
        order = np.lexsort((flat, parents))
        flat, parents = flat[order], parents[order]
        if flat.size == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "id": pa.array([], batch[id_col].type),
                             "tf": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        first = np.ones(flat.size, dtype=bool)
        first[1:] = (parents[1:] != parents[:-1]) | (flat[1:] != flat[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, flat.size))
        toks = flat[starts]
        pids = parents[starts]
        return pa.table({
            "tok": pa.array(toks, pa.string()),
            "id": pa.array(ids[pids]).cast(batch[id_col].type),
            "tf": pa.array(tf, pa.int64()),
            "__b": pa.array((murmur3_np(toks).astype(np.int64) % nb)
                            .astype(np.int32)),
        })

    def stamp_df(group: pa.Table) -> pa.Table:
        g = group.sort_by([("tok", "ascending")])
        toks = g["tok"].to_numpy(zero_copy_only=False)
        if toks.size == 0:
            return pa.table({"id": pa.array([], group["id"].type),
                             "tok": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "__b2": pa.array([], pa.int32())})
        first = np.ones(toks.size, dtype=bool)
        first[1:] = toks[1:] != toks[:-1]
        seg = np.cumsum(first) - 1
        df = np.diff(np.append(np.flatnonzero(first), toks.size))[seg]
        ids = g["id"]
        idb = (murmur3_np(ids.combine_chunks().cast(pa.string()).to_numpy(
            zero_copy_only=False)).astype(np.int64) % nb).astype(np.int32)
        return pa.table({"id": ids, "tok": g["tok"], "tf": g["tf"],
                         "df": pa.array(df, pa.int64()),
                         "__b2": pa.array(idb)})

    def topk(group: pa.Table) -> pa.Table:
        ids = group["id"].combine_chunks().cast(pa.string()).to_numpy(
            zero_copy_only=False)
        toks = group["tok"].to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy().astype(np.float64)
        df = group["df"].to_numpy().astype(np.float64)
        score = tf * np.log(n / df)
        # (id asc, score desc, token asc) in one lexsort
        order = np.lexsort((toks, -score, ids))
        ids_s, score_s = ids[order], score[order]
        first = np.ones(ids_s.size, dtype=bool)
        first[1:] = ids_s[1:] != ids_s[:-1]
        seg_start = np.flatnonzero(first)[np.cumsum(first) - 1]
        rank = np.arange(ids_s.size) - seg_start + 1
        keep = rank <= k
        sel = order[keep]
        return pa.table({
            "id": group["id"].take(pa.array(sel)),
            "token": pa.array(toks[sel], pa.string()),
            "score": pa.array(score[order][keep], pa.float64()),
            "rank": pa.array(rank[keep], pa.int64()),
        })

    return ds.map_batches(tok_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(stamp_df, batch_format="pyarrow") \
        .groupby("__b2").map_groups(topk, batch_format="pyarrow")
