"""Pipeline aggregations over histogram buckets (the elasticsearch
``derivative`` / ``cumulative_sum`` / ``moving_fn`` / ``bucket_sort``
pipeline-aggregation shapes; extension — the reference exposes no
aggregation API).

Elasticsearch runs pipeline aggregations on the COORDINATING node at
reduce time, over the already-folded parent buckets — never distributed.
This module is the same: pure functions over the (small) bucket list a
distributed parent aggregation (``RetrievalCluster.date_histogram``)
returns. For gap-sensitive pipelines (derivative, moving windows) build
the parent with ``min_doc_count=0`` so inner gaps are zero-filled — ES
imposes the same requirement on ``histogram`` parents of a derivative.

All functions take and return ``[{"bucket", "count", ...}, ...]`` lists
(buckets must already be in ascending order — the date_histogram
contract) and attach their result as a new key, leaving the input keys
in place.
"""

from __future__ import annotations

import numpy as np

__all__ = ["derivative", "cumulative_sum", "moving_avg", "bucket_sort",
           "serial_diff", "bucket_selector"]


def _vals(buckets: list[dict], key: str) -> np.ndarray:
    return np.asarray([b[key] for b in buckets], dtype=np.float64)


def derivative(buckets: list[dict], key: str = "count",
               out: str = "derivative") -> list[dict]:
    """First difference bucket-to-bucket (ES ``derivative``): the first
    bucket gets None (ES emits no value there). Gaps must be zero-filled
    by the parent (min_doc_count=0) or the difference spans them."""
    v = _vals(buckets, key)
    d = np.diff(v)
    return [{**b, out: None if i == 0 else float(d[i - 1])}
            for i, b in enumerate(buckets)]


def serial_diff(buckets: list[dict], lag: int = 1, key: str = "count",
                out: str = "serial_diff") -> list[dict]:
    """Lagged difference v[i] − v[i−lag] (ES ``serial_diff``); the first
    ``lag`` buckets get None."""
    if int(lag) < 1:
        raise ValueError("lag must be >= 1")
    v = _vals(buckets, key)
    return [{**b, out: None if i < lag else float(v[i] - v[i - lag])}
            for i, b in enumerate(buckets)]


def cumulative_sum(buckets: list[dict], key: str = "count",
                   out: str = "cumulative_sum") -> list[dict]:
    """Running total in bucket order (ES ``cumulative_sum``)."""
    c = np.cumsum(_vals(buckets, key))
    return [{**b, out: float(c[i])} for i, b in enumerate(buckets)]


def moving_avg(buckets: list[dict], window: int = 3, key: str = "count",
               out: str = "moving_avg") -> list[dict]:
    """Trailing-window mean including the current bucket (the ES
    ``moving_fn`` + ``MovingFunctions.unweightedAvg`` shape with
    ``shift=1``): bucket i averages the last min(window, i+1) values —
    partial leading windows average what exists, matching SQL
    ``AVG(v) OVER (ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``."""
    if int(window) < 1:
        raise ValueError("window must be >= 1")
    v = _vals(buckets, key)
    c = np.concatenate([[0.0], np.cumsum(v)])
    lo = np.maximum(np.arange(v.size) - int(window) + 1, 0)
    sums = c[np.arange(1, v.size + 1)] - c[lo]
    ns = np.arange(1, v.size + 1) - lo
    return [{**b, out: float(sums[i] / ns[i])}
            for i, b in enumerate(buckets)]


def bucket_sort(buckets: list[dict], key: str = "count",
                ascending: bool = False, size: int | None = None,
                tie_key: str = "bucket") -> list[dict]:
    """Re-order buckets by a metric and truncate (ES ``bucket_sort``);
    ties break by ``tie_key`` ascending for determinism."""
    out = sorted(buckets,
                 key=lambda b: ((b[key] if ascending else -b[key]),
                                b[tie_key]))
    return out if size is None else out[:int(size)]


def _resolve(b: dict, path: str):
    """Dotted-path lookup into a bucket dict (``st.avg`` reaches a stats
    sub-dict's field; ``_count`` resolves the doc-count key whatever the
    parent named it) — the ES buckets_path convention."""
    if path == "_count":
        for k in ("doc_count", "count", "cnt"):
            if k in b:
                return b[k]
        raise KeyError("no doc-count key in bucket")
    cur = b
    for part in path.split("."):
        cur = cur[part]
    return cur


_OPS = {"gt": lambda a, v: a > v, "gte": lambda a, v: a >= v,
        "lt": lambda a, v: a < v, "lte": lambda a, v: a <= v,
        "eq": lambda a, v: a == v, "ne": lambda a, v: a != v}


def bucket_selector(buckets: list[dict], path: str, op: str,
                    value: float) -> list[dict]:
    """Keep only buckets whose ``path`` metric satisfies the predicate
    (the elasticsearch ``bucket_selector`` pipeline — its script reduced
    to one comparison, which covers the HAVING-style use it exists for).
    ``path`` is a dotted buckets_path (``a``, ``st.avg``, ``_count``);
    ``op`` ∈ gt/gte/lt/lte/eq/ne. Buckets whose metric is None drop (the
    ES skip gap policy). Composes with ``RetrievalCluster.aggregate``
    output and the histogram pipelines alike — runs at reduce time over
    the already-folded bucket list, exactly where ES runs it."""
    if op not in _OPS:
        raise ValueError(f"unknown bucket_selector op {op!r} "
                         f"(use one of {sorted(_OPS)})")
    pred = _OPS[op]
    out = []
    for b in buckets:
        m = _resolve(b, path)
        if m is None:
            continue
        if pred(float(m), float(value)):
            out.append(b)
    return out
