"""Distributed multinomial Naive-Bayes text classifier (train + score).

The fastText-style supervised quality/language classifier every large-scale
training-data pipeline ends up needing (CCNet routes documents by a language
classifier; FineWeb/DCLM gate on a quality classifier). The reference engine
has no classifier operator — extension. A multinomial NB over whitespace
tokens is used instead of a learned embedding model so every number is
closed-form and the gate entry is value-checked against SQL end-to-end:

    score(L | d) = ln P(L) + Σ_{t ∈ d} ln( (c(L,t) + a) / (tot_L + a·V) )

with ``c(L,t)`` the token count of t in class-L training docs, ``tot_L``
the total token count of class L, ``V`` the train-corpus distinct-token
count (shared across classes), ``P(L) = docs_L / N`` the doc-count prior
and ``a`` the Lidstone smoothing mass (default 0.5 — exactly representable,
so ``c + a`` is exact float64). Prediction = argmax, ties broken by label
ascending (mirrored in the SQL oracle's ORDER BY).

100 TB shape (the perplexity.py pattern):

* ``train_naive_bayes`` — one map_batches combiner emits per-batch PARTIAL
  (label, token, count) rows bucketed by hash(token); one small groupby
  folds exact counts. Class doc counts are a tiny ≤ #labels-rows combiner
  pass; class token totals and the vocab size derive from the folded
  (label, token) counts on the driver (no extra corpus pass). Token streams
  never move — the shuffle carries only distinct-(label, token) partials.
* ``naive_bayes_classify`` — actor-pool map_batches stage; the model's
  sorted key arrays ship via ``ray.put`` ONCE and are fetched once per
  actor in the constructor. Per batch: Arrow tokenize, one vectorized
  ``np.searchsorted`` lookup per class against the sorted "label token"
  key array, per-doc ln-sums via ``np.add.reduceat`` — no per-row Python,
  zero shuffle on the scoring side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.polyhash import poly_hash_np
from byzer_retrieval_ray.ops.perplexity import _lookup, _tokens


@dataclass
class NBModel:
    """Sorted-array multinomial NB model (searchsorted-friendly broadcast).

    ``lt_keys`` are ``"label token"`` space-joined (labels and tokens are
    whitespace-free by construction); sorted ascending. ``labels`` sorted
    ascending; ``class_tokens``/``class_docs`` align with it."""

    lt_keys: np.ndarray
    lt_counts: np.ndarray
    labels: np.ndarray
    class_tokens: np.ndarray
    class_docs: np.ndarray
    n_docs: int
    vocab_size: int


def train_naive_bayes(ds, text_col: str, label_col: str,
                      num_buckets: int = 64) -> NBModel:
    """Exact (label, token) counts + class totals + priors + vocab over the
    labeled train set. The only shuffle carries distinct-(label, token)
    partial-count rows; class totals and doc counts are one-row-per-class
    side aggregates."""
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[label_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        words, par = _tokens(batch[text_col])
        if words.size == 0:
            return pa.table({"lbl": pa.array([], pa.large_string()),
                             "tok": pa.array([], pa.large_string()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        lbl = col.cast(pa.large_string()).take(pa.array(par, pa.int64()))
        t = pa.table({"lbl": lbl,
                      "tok": pa.array(words, pa.large_string())})
        agg = t.group_by(["lbl", "tok"]).aggregate([("lbl", "count")])
        h = poly_hash_np(agg["tok"].to_pylist(), bits=32)
        return pa.table({
            "lbl": agg["lbl"], "tok": agg["tok"],
            "cnt": agg["lbl_count"].cast(pa.int64()),
            "__b": pa.array((h % np.uint64(nb)).astype(np.int32)),
        })

    def fold(group: pa.Table) -> pa.Table:
        agg = group.group_by(["lbl", "tok"]).aggregate([("cnt", "sum")])
        return pa.table({"lbl": agg["lbl"].cast(pa.large_string()),
                         "tok": agg["tok"].cast(pa.large_string()),
                         "cnt": agg["cnt_sum"].cast(pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__b").map_groups(fold, batch_format="pyarrow")
              .to_pandas())
    lt_keys = (rows["lbl"].astype(str) + " "
               + rows["tok"].astype(str)).to_numpy(dtype=object)
    order = np.argsort(lt_keys)
    lt_counts = rows["cnt"].to_numpy(dtype=np.int64)[order]
    lt_keys = lt_keys[order]

    # per-class doc counts: one tiny combiner pass (≤ #labels rows per
    # batch — no token stream moves)
    def class_partial(batch: pa.Table) -> pa.Table:
        col = batch[label_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t = pa.table({"lbl": col.cast(pa.large_string())})
        agg = t.group_by("lbl").aggregate([("lbl", "count")])
        return pa.table({"lbl": agg["lbl"],
                         "docs": agg["lbl_count"].cast(pa.int64())})

    cls = (ds.map_batches(class_partial, batch_format="pyarrow")
             .to_pandas().groupby("lbl", as_index=False).sum()
             .sort_values("lbl"))
    # class token totals AND vocab both derive from the already-folded
    # (label, token) counts — every train token appears in some row, so no
    # extra corpus pass is needed (exact totals, same token definition as
    # the per-(label, token) counts)
    lbls = cls["lbl"].to_numpy(dtype=object)
    key_lbl = np.array([k.split(" ", 1)[0] for k in lt_keys], dtype=object)
    class_tokens = np.array(
        [int(lt_counts[key_lbl == l].sum()) for l in lbls], dtype=np.int64)
    vocab = int(len({k.split(" ", 1)[1] for k in lt_keys}))

    return NBModel(lt_keys=lt_keys, lt_counts=lt_counts,
                   labels=lbls,
                   class_tokens=class_tokens,
                   class_docs=cls["docs"].to_numpy(dtype=np.int64),
                   n_docs=int(cls["docs"].sum()),
                   vocab_size=vocab)


class NBClassifier:
    """Actor-pool stage: fetch the broadcast model once per actor, classify
    batches vectorized. Emits (id, pred, logscore) — the argmax class and
    its log joint score (ties → label ascending, like the SQL oracle)."""

    def __init__(self, model_ref, text_col: str, id_col: str,
                 alpha: float = 0.5):
        if isinstance(model_ref, NBModel):
            self.model = model_ref
        else:
            import ray
            self.model = ray.get(model_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.alpha = float(alpha)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m, a = self.model, self.alpha
        n_rows = len(batch)
        words, par = _tokens(batch[self.text_col])
        scores = np.empty((len(m.labels), n_rows), dtype=np.float64)
        for li, lbl in enumerate(m.labels):
            prior = np.log(m.class_docs[li] / m.n_docs)
            denom = np.log(m.class_tokens[li] + a * m.vocab_size)
            per_doc = np.zeros(n_rows, dtype=np.float64)
            if words.size:
                c = _lookup(m.lt_keys, m.lt_counts, str(lbl) + " " + words)
                logp = np.log(c + a) - denom
                # per-doc fold in ascending token-position order
                docs, starts = np.unique(par, return_index=True)
                per_doc[docs] = np.add.reduceat(logp, starts)
            scores[li] = prior + per_doc
        best = np.argmax(scores, axis=0)   # first max = smallest label (sorted)
        return pa.table({
            "id": batch[self.id_col],
            "pred": pa.array(m.labels[best].astype(str), pa.string()),
            "logscore": pa.array(scores[best, np.arange(n_rows)],
                                 pa.float64()),
        })


def naive_bayes_classify(ds, model: NBModel, text_col: str, id_col: str,
                         alpha: float = 0.5, concurrency: int = 2):
    """Classify every document of ``ds`` against ``model``. Streaming; the
    model ships via the object store once per actor."""
    import ray
    ref = ray.put(model)
    return ds.map_batches(
        NBClassifier, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"model_ref": ref, "text_col": text_col,
                               "id_col": id_col, "alpha": alpha})
