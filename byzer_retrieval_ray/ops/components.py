"""Distributed connected components over a near-duplicate pair graph.

Near-dup passes (MinHash, n-gram Jaccard, embedding cosine) emit PAIRS; a
training-data pipeline usually wants CLUSTERS — every doc labeled with the
canonical (smallest) id of its duplicate group, so one representative per
group survives even through transitive chains (A≈B, B≈C, but A≉C directly).
The reference engine has no dedup at all (SURVEY.md §2.6) — extension.

Algorithm: iterative min-label propagation. ``label(x)`` starts as ``x``;
each round every node takes the min of its own label and its neighbors'
labels, until no label changes. Converges in O(graph diameter) rounds —
near-dup graphs are unions of small cliques/stars whose diameter is tiny
(chains longer than a few hops mean the threshold is mis-set), so the round
count in practice is 2-4; ``max_iters`` caps pathological inputs.

100 TB shape: the graph carries only (int64, int64) rows — never documents.
Each round is two hash-bucketed exchanges over edges+labels (message
emission, then min-fold), all resolution vectorized numpy inside
``map_groups``; the driver holds only the per-round label-sum convergence
scalar. Edge rows are materialized once and reused every round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(pairs_ds, a_col: str = "id", b_col: str = "dup_of",
                         num_buckets: int = 64, max_iters: int = 50):
    """Label every node of the ``(a_col, b_col)`` pair graph with the smallest
    node id reachable from it. Returns a Dataset of ``(id, cluster)`` rows,
    one per distinct node. Node ids must be int64 (the near-dup ops' output).
    """
    import ray.data

    nb = num_buckets
    empty = pa.table({"id": pa.array([], pa.int64()),
                      "cluster": pa.array([], pa.int64())})
    if pairs_ds.count() == 0:
        return ray.data.from_arrow(empty)

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch[a_col].combine_chunks().cast(pa.int64())
        b = batch[b_col].combine_chunks().cast(pa.int64())
        key = pa.concat_arrays([a, b]).to_numpy(zero_copy_only=False)
        val = pa.concat_arrays([b, a]).to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(key, pa.int64()),
                         "val": pa.array(val, pa.int64()),
                         "kind": pa.array(np.zeros(key.size, np.int8)),
                         "kb": pa.array((key % nb).astype(np.int32))})

    edges = pairs_ds.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def min_fold(group: pa.Table) -> pa.Table:
        """(key, min val) per key — emitted as label rows (kind=1)."""
        g = group.sort_by([("key", "ascending"), ("val", "ascending")])
        k = g["key"].to_numpy()
        if k.size == 0:
            return _label_schema().empty_table()
        first = np.zeros(k.size, dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        key = k[first]
        val = g["val"].to_numpy()[first]
        return pa.table({"key": pa.array(key, pa.int64()),
                         "val": pa.array(val, pa.int64()),
                         "kind": pa.array(np.ones(key.size, np.int8)),
                         "kb": pa.array((key % nb).astype(np.int32))})

    def self_labels(batch: pa.Table) -> pa.Table:
        k = batch["key"].to_numpy()
        return pa.table({"key": batch["key"],
                         "val": batch["key"],
                         "kind": pa.array(np.ones(k.size, np.int8)),
                         "kb": batch["kb"]})

    # round 0: label(x) = min(x, neighbors) — fold over edge rows + self rows
    labels = edges.map_batches(self_labels, batch_format="pyarrow") \
        .union(edges) \
        .groupby("kb").map_groups(min_fold, batch_format="pyarrow") \
        .materialize()
    prev_sum = labels.sum("val")

    def propagate(group: pa.Table) -> pa.Table:
        """key-bucket group of edge rows (kind=0: key=node, val=neighbor) and
        label rows (kind=1): emit (neighbor, label(node)) messages re-keyed by
        neighbor, plus the label rows themselves."""
        kind = group["kind"].to_numpy()
        is_lab = kind == 1
        lab = group.filter(pa.array(is_lab))
        edg = group.filter(pa.array(~is_lab))
        lk = lab["key"].to_numpy()
        lv = lab["val"].to_numpy()
        order = np.argsort(lk)
        lk, lv = lk[order], lv[order]
        ek = edg["key"].to_numpy()
        ev = edg["val"].to_numpy()
        loc = np.searchsorted(lk, ek)
        ok = loc < lk.size
        ok[ok] &= lk[loc[ok]] == ek[ok]
        msg_key = ev[ok]
        msg_val = lv[loc[ok]]
        key = np.concatenate([lab["key"].to_numpy(), msg_key])
        val = np.concatenate([lab["val"].to_numpy(), msg_val])
        return pa.table({"key": pa.array(key, pa.int64()),
                         "val": pa.array(val, pa.int64()),
                         "kind": pa.array(np.ones(key.size, np.int8)),
                         "kb": pa.array((key % nb).astype(np.int32))})

    for _ in range(max_iters):
        labels = edges.union(labels) \
            .groupby("kb").map_groups(propagate, batch_format="pyarrow") \
            .groupby("kb").map_groups(min_fold, batch_format="pyarrow") \
            .materialize()
        s = labels.sum("val")
        if s == prev_sum:
            break
        prev_sum = s

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch["key"], "cluster": batch["val"]})

    return labels.map_batches(project, batch_format="pyarrow")


def _label_schema() -> pa.Schema:
    return pa.schema([("key", pa.int64()), ("val", pa.int64()),
                      ("kind", pa.int8()), ("kb", pa.int32())])


def select_canonical(docs_ds, labels_ds, id_col: str = "id",
                     score_col: str = "score", num_buckets: int = 64):
    """Pick ONE representative per duplicate cluster and flag every doc.

    ``docs_ds`` carries (id_col, score_col) for EVERY document (score = the
    keep-preference, e.g. text length or a quality score); ``labels_ds`` is
    ``connected_components`` output (id, cluster) covering only docs that
    appeared in a near-dup pair. Returns a Dataset of (id, cluster, keep)
    rows — one per doc: docs without a label are their own singleton cluster
    (keep=True); within a multi-doc cluster the highest score wins, ties
    broken by smallest id (deterministic).

    100 TB shape: two hash-bucketed exchanges carrying (int64, float64)
    triples only — never documents. Exchange 1 buckets by doc id to attach
    cluster labels to scores; exchange 2 buckets by cluster id for the
    vectorized per-cluster argmax. The near-dup pair graph is a vanishing
    fraction of the corpus, so labels_ds is small relative to docs_ds and
    the cluster buckets are balanced by the hash.
    """
    nb = num_buckets

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        sc = batch[score_col].combine_chunks().cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "vf": pa.array(sc, pa.float64()),
                         "vi": pa.array(np.zeros(ids.size, np.int64)),
                         "kind": pa.array(np.zeros(ids.size, np.int8)),
                         "b": pa.array((ids % nb).astype(np.int32))})

    def label_rows(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().cast(pa.int64()).to_numpy()
        cl = batch["cluster"].combine_chunks().cast(pa.int64()).to_numpy()
        # cluster ids ride an int64 column of their own — doc ids carry
        # generation bits at 54+ and would lose precision through a float64
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "vf": pa.array(np.zeros(ids.size, np.float64)),
                         "vi": pa.array(cl, pa.int64()),
                         "kind": pa.array(np.ones(ids.size, np.int8)),
                         "b": pa.array((ids % nb).astype(np.int32))})

    def attach(group: pa.Table) -> pa.Table:
        """id-bucket: doc rows (kind=0, vf=score) + label rows (kind=1,
        vi=cluster) → (id, score, cluster) with cluster defaulting to id."""
        kind = group["kind"].to_numpy()
        doc = group.filter(pa.array(kind == 0))
        lab = group.filter(pa.array(kind == 1))
        ids = doc["id"].to_numpy()
        sc = doc["vf"].to_numpy()
        lk = lab["id"].to_numpy()
        lv = lab["vi"].to_numpy()
        order = np.argsort(lk)
        lk, lv = lk[order], lv[order]
        loc = np.searchsorted(lk, ids)
        ok = loc < lk.size
        ok[ok] &= lk[loc[ok]] == ids[ok]
        cl = ids.copy()
        cl[ok] = lv[loc[ok]]
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "score": pa.array(sc, pa.float64()),
                         "cluster": pa.array(cl, pa.int64()),
                         "cb": pa.array((cl % nb).astype(np.int32))})

    def pick(group: pa.Table) -> pa.Table:
        ids = group["id"].to_numpy()
        sc = group["score"].to_numpy()
        cl = group["cluster"].to_numpy()
        order = np.lexsort((ids, -sc, cl))   # cluster asc, score desc, id asc
        ids, sc, cl = ids[order], sc[order], cl[order]
        keep = np.ones(ids.size, bool)
        keep[1:] = cl[1:] != cl[:-1]
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(cl, pa.int64()),
                         "keep": pa.array(keep)})

    merged = docs_ds.map_batches(doc_rows, batch_format="pyarrow") \
        .union(labels_ds.map_batches(label_rows, batch_format="pyarrow"))
    return merged.groupby("b").map_groups(attach, batch_format="pyarrow") \
        .groupby("cb").map_groups(pick, batch_format="pyarrow")
