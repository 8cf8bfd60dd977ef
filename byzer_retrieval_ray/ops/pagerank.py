"""Distributed PageRank over a link graph (Page et al. 1999; damped power
iteration, Pregel-style bucket actors). A webtext corpus is crawled FROM a
link graph — per-page PageRank is the classic quality/centrality prior
(used as a quality signal by CommonCrawl-derived corpora). The reference
engine has no graph ops (SURVEY.md §2) — extension.

Semantics (standard, matching the unrolled-SQL oracle in __ray_entry__):

    r_0(v)    = 1/N
    r_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_t(u)/outdeg(u)  +  D_t/N )

where D_t = Σ r_t(u) over DANGLING nodes (outdeg 0) — their mass is
redistributed uniformly, keeping Σ r = 1 exactly. Multi-edges count once
per occurrence; self-loops are the caller's choice (not filtered here).
A FIXED iteration count (default 8) rather than a convergence test keeps
the result closed-form replicable; at d=0.85 eight rounds settle web-ish
graphs to ~1e-3 relative, plenty for a quality prior.

WHY ACTORS, NOT Dataset groupby: an iteration is two bucketed exchanges of
tiny rows; as Ray Data ``groupby().map_groups`` stages each exchange is an
AllToAll sort barrier with ~1-2 s fixed cost — 8 iterations paid ~30-80 s
of pure orchestration on a 500-node graph (measured both per-round
materialize and one chained 16-barrier plan). Iterative message passing
with per-round global state is exactly the case the Dataset API can't
express efficiently, so this is the classic Pregel shape instead:

* ``num_buckets`` long-lived actors; bucket b owns nodes with
  ``id % nb == b`` — their rank/outdeg arrays — and the edges whose SRC
  lives there (so contributions read local state only).
* Loading streams through ``map_batches`` tasks that slice each batch by
  bucket and push slices to the owning actor — worker→actor through the
  object store, never the driver.
* Per iteration: (1) every actor emits per-target-bucket message arrays
  (dst, r/outdeg) as object refs; the driver routes REFS (never payloads)
  to target actors; (2) every actor folds the messages addressed to it
  (np.add.at over searchsorted node index) and returns its new dangling
  partial — the only per-round driver state is nb floats.
* Result: ``ray.data.from_arrow_refs`` over per-actor (id, rank) tables —
  ranks never pass through the driver.

Partitioning assumption (documented like ops/pack.py): one bucket's nodes
+ src-edges must fit the actor's heap — size ``num_buckets`` to the graph
(10^12 edges / 10^4 buckets ≈ 10^8 edge int64-pairs ≈ 1.6 GB per actor).
Actors reserve ``cpus_per_actor`` each — default 0 (event-driven folds,
mostly idle), which guarantees every bucket schedules even on a tiny
cluster and can never deadlock against the 1-CPU loader tasks that block
on actor calls; at cluster scale set it so ``num_buckets ×
cpus_per_actor`` tracks real cores and spreads buckets across nodes. Float fold order
inside a bucket is arrival-order-dependent (f64 noise ~1e-15); consumers
needing run-stable output should round (the gate rounds r·N to 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _make_bucket_actor():
    import ray

    @ray.remote
    class _PageRankBucket:
        """Owns one bucket: node ids (sorted), ranks, outdegs, and the
        edges whose src is local. See module docstring."""

        def __init__(self, bucket: int, nb: int):
            self.bucket = bucket
            self.nb = nb
            self._node_chunks: list[np.ndarray] = []
            self._edge_chunks: list[tuple[np.ndarray, np.ndarray]] = []
            self.ids = None

        def add_nodes(self, ids: np.ndarray) -> None:
            self._node_chunks.append(np.asarray(ids, np.int64))

        def add_edges(self, src: np.ndarray, dst: np.ndarray) -> None:
            self._edge_chunks.append((np.asarray(src, np.int64),
                                      np.asarray(dst, np.int64)))

        def finalize(self, n_total: int) -> float:
            """Sort/dedup-check nodes, compute outdeg, init ranks; return
            this bucket's initial dangling-mass partial."""
            ids = (np.concatenate(self._node_chunks)
                   if self._node_chunks else np.empty(0, np.int64))
            self.ids = np.unique(ids)            # sorted; tolerates dup rows
            if self._edge_chunks:
                self.src = np.concatenate([s for s, _ in self._edge_chunks])
                self.dst = np.concatenate([t for _, t in self._edge_chunks])
            else:
                self.src = np.empty(0, np.int64)
                self.dst = np.empty(0, np.int64)
            self._node_chunks = self._edge_chunks = None
            self.deg = np.zeros(self.ids.size, np.int64)
            if self.src.size:
                loc = np.searchsorted(self.ids, self.src)
                if (loc >= self.ids.size).any() or \
                        (self.ids[np.minimum(loc, self.ids.size - 1)]
                         != self.src).any():
                    raise ValueError("edge src missing from node set")
                np.add.at(self.deg, loc, 1)
                self._src_loc = loc
                self._dst_bucket = (self.dst % self.nb).astype(np.int32)
            self.r = np.full(self.ids.size, 1.0 / n_total)
            return float(self.r[self.deg == 0].sum())

        def emit(self) -> list:
            """Per-target-bucket (dst, contrib) message arrays from the
            CURRENT ranks, each ray.put into the object store. Returns the
            nb refs (None for empty targets) — the driver routes refs only,
            payloads move actor→actor through the store."""
            if self.src.size == 0:
                return [None] * self.nb
            contrib = self.r[self._src_loc] / self.deg[self._src_loc]
            order = np.argsort(self._dst_bucket, kind="stable")
            db = self._dst_bucket[order]
            dsts = self.dst[order]
            cs = contrib[order]
            bounds = np.searchsorted(db, np.arange(self.nb + 1))
            out = []
            for b in range(self.nb):
                sl = slice(bounds[b], bounds[b + 1])
                out.append(ray.put((dsts[sl], cs[sl]))
                           if bounds[b + 1] > bounds[b] else None)
            return out

        def apply(self, msg_refs: list, dang_total: float, base: float,
                  d: float, n_total: int) -> float:
            """Fold the messages addressed here (refs resolved in-actor);
            set r_{t+1}; return the new dangling partial."""
            csum = np.zeros(self.ids.size, np.float64)
            for ref in msg_refs:
                if ref is None:
                    continue
                dst, contrib = ray.get(ref)
                loc = np.searchsorted(self.ids, np.asarray(dst, np.int64))
                np.add.at(csum, loc, np.asarray(contrib, np.float64))
            self.r = base + d * (csum + dang_total / n_total)
            return float(self.r[self.deg == 0].sum())

        def ranks_table(self) -> pa.Table:
            return pa.table({"id": pa.array(self.ids, pa.int64()),
                             "rank": pa.array(self.r, pa.float64())})

    return _PageRankBucket


def pagerank(edges_ds, nodes_ds, src_col: str = "src", dst_col: str = "dst",
             node_col: str = "id", damping: float = 0.85, n_iters: int = 8,
             num_buckets: int = 16, cpus_per_actor: float = 0.0):
    """PageRank of the ``(src_col, dst_col)`` int64 edge list over the node
    set ``nodes_ds[node_col]`` (which must contain every src/dst exactly
    once and may add isolated nodes). Returns a Dataset of ``(id, rank)``
    rows, Σ rank = 1.
    """
    import ray
    import ray.data

    nb = num_buckets
    d = float(damping)
    n = nodes_ds.count()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"id": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}))

    cls = _make_bucket_actor()
    actors = [cls.options(num_cpus=cpus_per_actor).remote(b, nb)
              for b in range(nb)]
    # all actors must be SCHEDULED before the push tasks run: a push task
    # blocks on actor calls, so tasks saturating the CPUs while actors are
    # still pending would deadlock a small cluster
    ray.get([a.__ray_ready__.remote() for a in actors])

    # stream-load: tasks slice each batch by owning bucket and push slices
    # to actors (worker→actor via object store; the .get inside the task
    # makes delivery happen-before the pipeline finishes)
    def push_nodes(batch: pa.Table) -> pa.Table:
        ids = batch[node_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        kb = ids % nb
        refs = [actors[b].add_nodes.remote(ids[kb == b])
                for b in np.unique(kb)]
        ray.get(refs)
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    def push_edges(batch: pa.Table) -> pa.Table:
        src = batch[src_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dst = batch[dst_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        kb = src % nb
        refs = [actors[b].add_edges.remote(src[kb == b], dst[kb == b])
                for b in np.unique(kb)]
        ray.get(refs)
        return pa.table({"n": pa.array([len(src)], pa.int64())})

    nodes_ds.map_batches(push_nodes, batch_format="pyarrow").count()
    edges_ds.map_batches(push_edges, batch_format="pyarrow").count()

    partials = ray.get([a.finalize.remote(n) for a in actors])
    base = (1.0 - d) / n
    for _ in range(n_iters):
        dang = float(sum(partials))
        # emitted[g][b] is the ref to bucket g's messages for bucket b;
        # the driver only routes refs — payloads never leave the store
        emitted = ray.get([a.emit.remote() for a in actors])
        partials = ray.get([
            actors[b].apply.remote([emitted[g][b] for g in range(nb)],
                                   dang, base, d, n)
            for b in range(nb)])

    out = ray.data.from_arrow_refs(
        [a.ranks_table.remote() for a in actors])
    # from_arrow_refs snapshots the tables; actors can die afterwards
    out = out.materialize()
    for a in actors:
        ray.kill(a)
    return out
