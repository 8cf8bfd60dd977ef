"""Exact distributed quantiles by iterative histogram narrowing.

Training-data pipelines pick filter thresholds from score distributions
("drop the bottom 20 % by quality", "cap length at p99"). Approximate
sketches (t-digest/KLL) drift exactly where the tails matter; this op is
EXACT for any column expressible as float64, with a fixed driver memory
bound. The reference engine has no aggregate beyond per-term stats
(SURVEY.md §2.5) — extension.

Algorithm (distributed selection): the target rank of each quantile is found
by repeated bracketing — each round broadcasts ``n_candidates`` boundaries
over the current [lo, hi] bracket, one streaming ``map_batches`` pass emits
per-batch bucket COUNTS (a (n_candidates+1)-long int64 vector — no values
move), the driver folds them (~8 KB per batch) and narrows the bracket to
the bucket containing the rank. When the bracket's population is ≤
``collect_limit`` the surviving values are pulled once and the exact
rank-statistic is read off. Rounds needed: log_{n_candidates}(n /
collect_limit) — TWO passes bracket 10^12 rows at the defaults.

100 TB shape: every pass is exchange-free (counts fold on the driver); the
one value materialization is bounded by ``collect_limit``. Ties and repeated
values are handled by rank arithmetic, not value uniqueness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def exact_quantiles(ds, col: str, qs: list[float], n_candidates: int = 1024,
                    collect_limit: int = 200_000,
                    max_rounds: int = 8) -> dict[float, float]:
    """Exact quantiles of ``ds[col]`` (cast to float64; nulls/NaNs ignored).

    Each quantile q maps to the 0-based rank ``floor(q * (n - 1))`` of the
    sorted values (the "lower" discrete quantile — mirror
    ``row_number() = rank + 1`` in SQL oracles). Returns {q: value}.
    """
    import ray

    def counts_fn(lo: float, hi: float, edges_ref):
        def f(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            v = v[(v >= lo) & (v <= hi)]
            e = ray.get(edges_ref)
            # bucket i = (e[i-1], e[i]]; bucket 0 = [lo, e[0]]
            c = np.bincount(np.searchsorted(e, v, side="left"),
                            minlength=e.size + 1)
            return pa.table({"c": pa.array(c, pa.int64()),
                             "i": pa.array(np.arange(e.size + 1), pa.int64())})
        return f

    def fold_counts(lo, hi, edges) -> np.ndarray:
        ref = ray.put(edges)
        total = np.zeros(edges.size + 1, dtype=np.int64)
        for b in ds.map_batches(counts_fn(lo, hi, ref),
                                batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            np.add.at(total, b["i"].to_numpy(), b["c"].to_numpy())
        return total

    # round 0: global [min, max] and total count in one pass
    def minmax(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([v.min()]), "hi": pa.array([v.max()]),
                         "n": pa.array([v.size], pa.int64())})

    lo = hi = None
    n = 0
    for b in ds.map_batches(minmax, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        if len(b):
            blo = b["lo"].to_numpy().min()
            bhi = b["hi"].to_numpy().max()
            lo = blo if lo is None else min(lo, blo)
            hi = bhi if hi is None else max(hi, bhi)
            n += int(b["n"].to_numpy().sum())
    if n == 0:
        return {q: float("nan") for q in qs}

    # round 1 is shared: one histogram over the global bracket serves every q
    g_edges = np.linspace(lo, hi, n_candidates + 1)[1:-1]
    g_counts = fold_counts(lo, hi, g_edges)
    g_cum = np.cumsum(g_counts)

    out: dict[float, float] = {}
    for q in qs:
        rank = int(np.floor(q * (n - 1)))          # 0-based global rank
        qlo, qhi, before = lo, hi, 0               # `before` values < bracket
        c, edges = g_counts, g_edges
        for round_no in range(max_rounds):
            pop = int(c.sum())
            if pop <= collect_limit or qlo == qhi:
                break
            cum = np.cumsum(c)
            idx = int(np.searchsorted(cum, rank - before + 1))
            lo_i = qlo if idx == 0 else edges[idx - 1]
            hi_i = edges[idx] if idx < edges.size else qhi
            before += int(cum[idx - 1]) if idx > 0 else 0
            if lo_i == qlo and hi_i == qhi:
                break                               # bracket no longer narrows
            # bucket idx is (lo_i, hi_i] except bucket 0 which is [qlo, e0]
            qlo, qhi = (np.nextafter(lo_i, hi_i) if idx > 0 else lo_i), hi_i
            if qlo >= qhi:
                qlo = qhi                           # single-value bucket
                break
            edges = np.linspace(qlo, qhi, n_candidates + 1)[1:-1]
            c = fold_counts(qlo, qhi, edges)

        if qlo == qhi:
            out[q] = float(qlo)                     # massive-tie shortcut
            continue

        def collect(batch: pa.Table, _lo=qlo, _hi=qhi) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            v = v[(v >= _lo) & (v <= _hi)]
            return pa.table({"v": pa.array(v, pa.float64())})

        vals = np.concatenate(
            [b["v"].to_numpy() for b in
             ds.map_batches(collect, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")] or
            [np.empty(0, np.float64)])
        vals.sort()
        out[q] = float(vals[rank - before])
    return out
