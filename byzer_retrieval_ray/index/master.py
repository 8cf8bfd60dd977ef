"""Scatter-gather, fusion and top-k merge — the reference master's query semantics
(RetrievalMaster.java:141-365) over per-bucket searchers.

Exact behaviors replicated:
  * inner_search: fan out to every bucket, flat-map per-bucket top-limit results, sort
    by score descending (ties: doc_id ascending — our determinism improvement over the
    reference's unstable HashMap ordering) (RetrievalMaster.java:141-158)
  * RRF only when a query has BOTH keyword and vector: each recall's result list is
    re-scored Σ 1/(rank + 60) with 0-based rank over the concatenated, score-sorted
    per-bucket lists (RetrievalMaster.java:162-192, constant 60 at :179)
  * merge: sum scores per doc across recalls, sort desc, truncate to limit, inject
    _score (RetrievalMaster.java:326-365)
  * multi-query fan-out with a 30 s deadline (RetrievalMaster.java:283-324)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.table.query import SearchQuery

RRF_K = 60.0  # RetrievalMaster.java:179


def _merge_recall(results: list[tuple[np.ndarray, np.ndarray]], dtype) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate per-bucket (ids, scores), sort score desc / doc_id asc."""
    if not results:
        return np.empty(0, np.int64), np.empty(0, dtype)
    ids = np.concatenate([r[0] for r in results])
    scores = np.concatenate([r[1] for r in results]).astype(dtype)
    order = np.lexsort((ids, -scores.astype(np.float64)))
    return ids[order], scores[order]


def _rrf(ids: np.ndarray, dtype) -> np.ndarray:
    """0-based reciprocal-rank fusion scores over an already-sorted result list."""
    return (1.0 / (np.arange(ids.size, dtype=np.float64) + RRF_K)).astype(dtype)


def run_query(searcher_results: dict[str, list[tuple[np.ndarray, np.ndarray]]],
              q: SearchQuery, precision: str = "float32") -> tuple[np.ndarray, np.ndarray]:
    """Fuse recall results → final (doc_ids, scores) of length ≤ q.limit.

    ``searcher_results`` maps recall name ("keyword"/"vector") to the per-bucket
    result list. RRF applies iff both recalls are present (reference hybrid rule).
    """
    dtype = np.float32 if precision == "float32" else np.float64
    is_hybrid = len(searcher_results) > 1
    score_maps: list[tuple[np.ndarray, np.ndarray]] = []
    for recall in ("keyword", "vector"):
        if recall not in searcher_results:
            continue
        ids, scores = _merge_recall(searcher_results[recall], dtype)
        if is_hybrid:
            scores = _rrf(ids, dtype)
            # RRF may rank the same doc twice only if a doc appeared twice in one
            # recall — impossible (buckets are disjoint); scores stay per-id unique
        score_maps.append((ids, scores))

    # sum scores per id across recalls (float64 accumulate, cast at the end — the
    # reference sums Java floats; both recalls contribute at most one term each so
    # the order of addition is keyword-then-vector, replicated here)
    all_ids = np.unique(np.concatenate([m[0] for m in score_maps]))
    acc = np.zeros(all_ids.size, dtype=np.float64)
    for ids, scores in score_maps:
        idx = np.searchsorted(all_ids, ids)
        np.add.at(acc, idx, scores.astype(np.float64))
    final = acc.astype(dtype)
    order = np.lexsort((all_ids, -final.astype(np.float64)))[:q.limit]
    return all_ids[order], final[order]


def run_linear(searcher_results: dict[str, list[tuple[np.ndarray, np.ndarray]]],
               q: SearchQuery, weights: dict[str, float], window: int,
               precision: str = "float32") -> tuple[np.ndarray, np.ndarray]:
    """Weighted min-max-normalized score fusion (the elasticsearch 8.x
    ``linear`` retriever with the ``minmax`` normalizer; extension — the
    reference fuses with RRF only): each recall's GLOBAL top-``window``
    list (exact from per-bucket top-window partials) is normalized to
    (s − min)/(max − min) over that window — all-equal windows normalize
    to 1.0 — and a doc scores Σ_r weight_r · norm_r(d), contributing 0
    from windows it missed (the ES convention). Final order
    (score desc, doc_id asc), truncated to ``q.limit``. Float64
    throughout, cast to the query precision at the end."""
    dtype = np.float32 if precision == "float32" else np.float64
    score_maps: list[tuple[np.ndarray, np.ndarray]] = []
    for recall in ("keyword", "vector"):
        if recall not in searcher_results:
            continue
        ids, scores = _merge_recall(searcher_results[recall], np.float64)
        ids, scores = ids[:window], scores[:window].astype(np.float64)
        if ids.size == 0:
            continue
        mx, mn = float(scores[0]), float(scores[-1])   # sorted desc
        norm = (np.ones_like(scores) if mx == mn
                else (scores - mn) / (mx - mn))
        score_maps.append((ids, float(weights.get(recall, 1.0)) * norm))
    if not score_maps:
        return np.empty(0, np.int64), np.empty(0, dtype)
    all_ids = np.unique(np.concatenate([m[0] for m in score_maps]))
    acc = np.zeros(all_ids.size, dtype=np.float64)
    for ids, scores in score_maps:
        np.add.at(acc, np.searchsorted(all_ids, ids), scores)
    order = np.lexsort((all_ids, -acc))[:q.limit]
    return all_ids[order], acc[order].astype(dtype)


def attach_scores(doc_tbl: pa.Table, doc_ids: np.ndarray, scores: np.ndarray) -> pa.Table:
    """Materialized docs (any order) → result table ordered like doc_ids, plus _score."""
    got = doc_tbl["doc_id"].to_numpy()
    pos = {int(d): i for i, d in enumerate(got)}
    take = [pos[int(d)] for d in doc_ids if int(d) in pos]
    kept = [i for i, d in enumerate(doc_ids) if int(d) in pos]
    out = doc_tbl.take(pa.array(take))
    return out.append_column("_score", pa.array(np.asarray(scores)[kept].astype(np.float64)))
