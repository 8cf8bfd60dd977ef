"""Distributed PageRank over a link graph (Page et al. 1999; damped power
iteration). A webtext corpus is crawled FROM a link graph — per-page
PageRank is the classic quality/centrality prior (used as a quality signal
by CommonCrawl-derived corpora), and the graph-shaped sibling of
ops/components.py (which labels near-dup clusters on the same row layout).
The reference engine has no graph ops (SURVEY.md §2) — extension.

Semantics (standard, matching the unrolled-SQL oracle in __ray_entry__):

    r_0(v)    = 1/N
    r_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_t(u)/outdeg(u)  +  D_t/N )

where D_t = Σ r_t(u) over DANGLING nodes (outdeg 0) — their mass is
redistributed uniformly, keeping Σ r = 1 exactly. Multi-edges count once
per occurrence; self-loops are the caller's choice (not filtered here).
A FIXED iteration count (default 8) rather than a convergence test keeps
the result closed-form replicable; at d=0.85 eight rounds settle web-ish
graphs to ~1e-3 relative, plenty for a quality prior.

100 TB shape (the ops/components.py exchange pattern): edge rows are
(int64 src, int64 dst) ONLY — materialized once, bucketed by src % nb, and
reused every round; rank rows (one per node: key, r, outdeg) live bucketed
by the same key space. Each round is two hash-bucketed exchanges —
(1) src-bucket join emits (dst, r/outdeg) contribution messages,
(2) dst-bucket fold sums them per node — plus one streaming scalar
aggregate for the dangling mass. The driver holds only N and D_t.
Float order inside a fold is batch-order-dependent (f64 noise ~1e-15);
consumers that need run-stable output should round (the gate rounds
r·N to 4 decimals).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _schema() -> pa.Schema:
    return pa.schema([("key", pa.int64()), ("val", pa.int64()),
                      ("r", pa.float64()), ("deg", pa.int64()),
                      ("kind", pa.int8()), ("kb", pa.int32())])


def pagerank(edges_ds, nodes_ds, src_col: str = "src", dst_col: str = "dst",
             node_col: str = "id", damping: float = 0.85, n_iters: int = 8,
             num_buckets: int = 64):
    """PageRank of the ``(src_col, dst_col)`` int64 edge list over the node
    set ``nodes_ds[node_col]`` (which must contain every src/dst and may add
    isolated nodes). Returns a Dataset of ``(id, rank)`` rows, Σ rank = 1.
    """
    import ray.data

    nb = num_buckets
    d = float(damping)
    n = nodes_ds.count()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"id": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}))

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = batch[src_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dst = batch[dst_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"key": pa.array(src, pa.int64()),
                         "val": pa.array(dst, pa.int64()),
                         "r": pa.array(np.zeros(src.size), pa.float64()),
                         "deg": pa.array(np.zeros(src.size, np.int64)),
                         "kind": pa.array(np.zeros(src.size, np.int8)),
                         "kb": pa.array((src % nb).astype(np.int32))})

    edges = edges_ds.map_batches(edge_rows, batch_format="pyarrow").materialize()

    # outdeg: per-batch (src, partial_count) combiner, then a src-bucket fold
    # joined with zero rows for every node — one narrow exchange, once.
    def deg_partials(batch: pa.Table) -> pa.Table:
        src, cnt = np.unique(batch["key"].to_numpy(), return_counts=True)
        return pa.table({"key": pa.array(src, pa.int64()),
                         "val": pa.array(np.zeros(src.size, np.int64)),
                         "r": pa.array(np.zeros(src.size), pa.float64()),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "kind": pa.array(np.full(src.size, 1, np.int8)),
                         "kb": pa.array((src % nb).astype(np.int32))})

    def node_rows(batch: pa.Table) -> pa.Table:
        ids = batch[node_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"key": pa.array(ids, pa.int64()),
                         "val": pa.array(np.zeros(ids.size, np.int64)),
                         "r": pa.array(np.zeros(ids.size), pa.float64()),
                         "deg": pa.array(np.zeros(ids.size, np.int64)),
                         "kind": pa.array(np.full(ids.size, 1, np.int8)),
                         "kb": pa.array((ids % nb).astype(np.int32))})

    r0 = 1.0 / n

    def init_fold(group: pa.Table) -> pa.Table:
        key = group["key"].to_numpy()
        uk, inv = np.unique(key, return_inverse=True)
        deg = np.zeros(uk.size, np.int64)
        np.add.at(deg, inv, group["deg"].to_numpy())
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "val": pa.array(np.zeros(uk.size, np.int64)),
                         "r": pa.array(np.full(uk.size, r0), pa.float64()),
                         "deg": pa.array(deg),
                         "kind": pa.array(np.full(uk.size, 1, np.int8)),
                         "kb": pa.array((uk % nb).astype(np.int32))})

    ranks = edges.map_batches(deg_partials, batch_format="pyarrow") \
        .union(nodes_ds.map_batches(node_rows, batch_format="pyarrow")) \
        .groupby("kb").map_groups(init_fold, batch_format="pyarrow") \
        .materialize()

    def dangling_mass(rs) -> float:
        # streaming scalar: Σ r over outdeg-0 nodes (per-batch partials)
        def part(batch: pa.Table) -> pa.Table:
            m = batch["deg"].to_numpy() == 0
            s = float(batch["r"].to_numpy()[m].sum())
            return pa.table({"s": pa.array([s], pa.float64())})
        tot = rs.map_batches(part, batch_format="pyarrow").sum("s")
        return float(tot or 0.0)

    def propagate(group: pa.Table) -> pa.Table:
        """src-bucket group of edge rows (kind 0) + rank rows (kind 1):
        emit (dst, r/deg) messages (kind 2) and pass rank rows through."""
        kind = group["kind"].to_numpy()
        lab = group.filter(pa.array(kind == 1))
        edg = group.filter(pa.array(kind == 0))
        lk = lab["key"].to_numpy()
        order = np.argsort(lk)
        lk = lk[order]
        lr = lab["r"].to_numpy()[order]
        ld = lab["deg"].to_numpy()[order]
        ek = edg["key"].to_numpy()
        loc = np.searchsorted(lk, ek)
        contrib = lr[loc] / ld[loc]          # every src has a rank row
        dst = edg["val"].to_numpy()
        key = np.concatenate([lab["key"].to_numpy(), dst])
        r = np.concatenate([lab["r"].to_numpy(), contrib])
        deg = np.concatenate([lab["deg"].to_numpy(),
                              np.zeros(dst.size, np.int64)])
        knd = np.concatenate([np.full(len(lab), 1, np.int8),
                              np.full(dst.size, 2, np.int8)])
        return pa.table({"key": pa.array(key, pa.int64()),
                         "val": pa.array(np.zeros(key.size, np.int64)),
                         "r": pa.array(r, pa.float64()),
                         "deg": pa.array(deg),
                         "kind": pa.array(knd),
                         "kb": pa.array((key % nb).astype(np.int32))})

    base = (1.0 - d) / n
    for _ in range(n_iters):
        dang = dangling_mass(ranks)
        dang_over_n = dang / n

        def apply_fold(group: pa.Table, _b=base, _don=dang_over_n) -> pa.Table:
            kind = group["kind"].to_numpy()
            lab = group.filter(pa.array(kind == 1))
            msg = group.filter(pa.array(kind == 2))
            lk = lab["key"].to_numpy()
            order = np.argsort(lk)
            lk = lk[order]
            ld = lab["deg"].to_numpy()[order]
            csum = np.zeros(lk.size, np.float64)
            mk = msg["key"].to_numpy()
            if mk.size:
                loc = np.searchsorted(lk, mk)
                np.add.at(csum, loc, msg["r"].to_numpy())
            newr = _b + d * (csum + _don)
            return pa.table({"key": pa.array(lk, pa.int64()),
                             "val": pa.array(np.zeros(lk.size, np.int64)),
                             "r": pa.array(newr, pa.float64()),
                             "deg": pa.array(ld),
                             "kind": pa.array(np.full(lk.size, 1, np.int8)),
                             "kb": pa.array((lk % nb).astype(np.int32))})

        ranks = edges.union(ranks) \
            .groupby("kb").map_groups(propagate, batch_format="pyarrow") \
            .groupby("kb").map_groups(apply_fold, batch_format="pyarrow") \
            .materialize()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch["key"], "rank": batch["r"]})

    return ranks.map_batches(project, batch_format="pyarrow")
