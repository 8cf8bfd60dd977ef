"""CCNet-style statistical-LM perplexity scoring for quality filtering.

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the perplexity of
a language model trained on a small curated corpus (Wikipedia) and keeps the
low-perplexity head — the standard model-based quality filter that C4's
heuristics (ops/c4.py) don't capture. The reference engine has no such
operator; at 100 TB it is a core pipeline stage — extension.

The model here is an additive-smoothed word-bigram LM (the classic
Lidstone/Jeffreys form) rather than KenLM, so every number is exactly
reproducible in SQL and the gate entry is value-checked end-to-end:

    P(w2 | w1) = (c(w1 w2) + a) / (c1(w1) + a·V)

with ``c`` the bigram count over the TRAIN corpus, ``c1(w1) = Σ_w2 c(w1 w2)``
the context count, ``V`` the train-corpus distinct-token count, and ``a`` the
smoothing mass (default 0.5 — exactly representable in binary, so ``c + a``
is exact float64). Per document with tokens t_1..t_n (whitespace analyzer,
same as the index — SURVEY.md §2 T2):

    logppl = -(1/(n-1)) · Σ_i ln P(t_{i+1} | t_i),     ppl = exp(logppl)

Documents with fewer than 2 tokens have no bigram and are dropped (mirrored
in the SQL oracle).

100 TB shape: the TRAIN corpus is small by construction (CCNet trains on
curated text, not on the crawl), so the model is a broadcast, not a shuffle:

* ``train_bigram_lm`` — one map_batches combiner emits per-batch partial
  bigram counts keyed by hash(w1) (every bigram of a context lands in one
  bucket), one small groupby folds exact counts AND the per-context totals
  locally, pruning bigrams below ``min_count`` AFTER the context totals are
  taken (pruned mass falls back to the smoothing term, so pruning bounds the
  model size without changing the denominator). A second combiner pass counts
  distinct tokens the same way. The driver only ever holds the pruned model.
* ``perplexity_score`` — actor-pool map_batches stage; the model's sorted
  key arrays go into the object store ONCE (``ray.put``) and are fetched once
  per actor in the constructor (the decontaminate.py pattern). Per batch:
  Arrow tokenize, vectorized ``np.searchsorted`` lookups against the sorted
  bigram / context key arrays, per-doc ln-sums via ``np.add.reduceat`` — no
  per-row Python, zero shuffle on the 100 TB score side.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.polyhash import poly_hash_np


@dataclass
class BigramLM:
    """Sorted-array bigram model (searchsorted-friendly broadcast payload).

    ``bigram_keys`` are ``"w1 w2"`` space-joined (tokens are whitespace-split
    so the join is unambiguous); ``ctx_keys`` are the distinct first tokens.
    Both sorted ascending; counts are int64 and ``vocab_size`` is the
    train-corpus distinct-token count.
    """

    bigram_keys: np.ndarray
    bigram_counts: np.ndarray
    ctx_keys: np.ndarray
    ctx_counts: np.ndarray
    vocab_size: int


def _tokens(batch_col) -> tuple[np.ndarray, np.ndarray]:
    """(words, doc_parents) for a string column — empty tokens dropped."""
    col = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) \
        else batch_col
    toks = pc.utf8_split_whitespace(col)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    words = pc.filter(flat, mask).to_numpy(zero_copy_only=False)
    par = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
    return words, par


def _bigrams(words: np.ndarray, par: np.ndarray):
    """(w1, w2, bigram_parent) over in-doc adjacent token pairs."""
    if words.size < 2:
        e = np.array([], dtype=object)
        return e, e, np.array([], dtype=np.int64)
    same = par[1:] == par[:-1]
    starts = np.flatnonzero(same)
    return words[starts].astype(object), words[starts + 1].astype(object), \
        par[starts]


def train_bigram_lm(ds, text_col: str, min_count: int = 1,
                    num_buckets: int = 64) -> BigramLM:
    """Count bigrams + contexts + vocab over the (small, curated) train set.

    Shuffles carry (w1, w2, partial_count) / (token,) rows only — token
    streams never move. ``min_count`` prunes the broadcast bigram table
    (context totals are taken before pruning, so the denominator is exact).
    """
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        words, par = _tokens(batch[text_col])
        w1, w2, _ = _bigrams(words, par)
        if w1.size == 0:
            return pa.table({"w1": pa.array([], pa.large_string()),
                             "w2": pa.array([], pa.large_string()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        t = pa.table({"w1": pa.array(w1, pa.large_string()),
                      "w2": pa.array(w2, pa.large_string())})
        agg = t.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        h = poly_hash_np(agg["w1"].to_pylist(), bits=32)
        return pa.table({
            "w1": agg["w1"], "w2": agg["w2"],
            "cnt": agg["w1_count"].cast(pa.int64()),
            "__b": pa.array((h % np.uint64(nb)).astype(np.int32)),
        })

    def fold(group: pa.Table) -> pa.Table:
        agg = group.group_by(["w1", "w2"]).aggregate([("cnt", "sum")])
        ctx = agg.group_by("w1").aggregate([("cnt_sum", "sum")])
        keep = agg.filter(pc.greater_equal(agg["cnt_sum"], min_count))
        t_big = pa.table({"w1": keep["w1"].cast(pa.large_string()),
                          "w2": keep["w2"].cast(pa.large_string()),
                          "cnt": keep["cnt_sum"].cast(pa.int64())})
        t_ctx = pa.table({"w1": ctx["w1"].cast(pa.large_string()),
                          "w2": pa.nulls(len(ctx), pa.large_string()),
                          "cnt": ctx["cnt_sum_sum"].cast(pa.int64())})
        return pa.concat_tables([t_big, t_ctx]).combine_chunks()

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__b").map_groups(fold, batch_format="pyarrow")
              .to_pandas())
    is_ctx = rows["w2"].isna().to_numpy()
    bg = rows[~is_ctx]
    bkeys = (bg["w1"].astype(str) + " " + bg["w2"].astype(str)).to_numpy(dtype=object)
    order = np.argsort(bkeys)
    cx = rows[is_ctx]
    ckeys = cx["w1"].to_numpy(dtype=object)
    corder = np.argsort(ckeys)

    def vocab_partial(batch: pa.Table) -> pa.Table:
        words, _ = _tokens(batch[text_col])
        u = np.unique(words.astype(object))
        h = poly_hash_np(list(u), bits=32)
        return pa.table({"tok": pa.array(u, pa.large_string()),
                         "__b": pa.array((h % np.uint64(nb)).astype(np.int32))})

    def vocab_fold(group: pa.Table) -> pa.Table:
        n = pc.count_distinct(group["tok"]).as_py()
        return pa.table({"n": pa.array([n], pa.int64())})

    vocab = int(ds.map_batches(vocab_partial, batch_format="pyarrow")
                  .groupby("__b").map_groups(vocab_fold, batch_format="pyarrow")
                  .to_pandas()["n"].sum())

    return BigramLM(
        bigram_keys=bkeys[order],
        bigram_counts=bg["cnt"].to_numpy(dtype=np.int64)[order],
        ctx_keys=ckeys[corder],
        ctx_counts=cx["cnt"].to_numpy(dtype=np.int64)[corder],
        vocab_size=vocab,
    )


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray,
            probe: np.ndarray) -> np.ndarray:
    """Vectorized exact-match lookup; misses return 0."""
    out = np.zeros(probe.size, dtype=np.int64)
    if sorted_keys.size == 0 or probe.size == 0:
        return out
    loc = np.searchsorted(sorted_keys, probe)
    ok = loc < sorted_keys.size
    ok[ok] = sorted_keys[loc[ok]] == probe[ok]
    out[ok] = counts[loc[ok]]
    return out


class PerplexityScorer:
    """Actor-pool stage: fetch the broadcast model once per actor, score
    batches vectorized. Emits (id, n_tokens, logppl, ppl) rows; documents
    with < 2 tokens are dropped (no bigram to score)."""

    def __init__(self, model_ref, text_col: str, id_col: str,
                 alpha: float = 0.5):
        if isinstance(model_ref, BigramLM):
            self.model = model_ref
        else:
            import ray
            self.model = ray.get(model_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.alpha = float(alpha)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m, a = self.model, self.alpha
        id_type = batch[self.id_col].type
        words, par = _tokens(batch[self.text_col])
        w1, w2, bpar = _bigrams(words, par)
        if w1.size == 0:
            return pa.table({"id": pa.array([], id_type),
                             "n_tokens": pa.array([], pa.int64()),
                             "logppl": pa.array([], pa.float64()),
                             "ppl": pa.array([], pa.float64())})
        c = _lookup(m.bigram_keys, m.bigram_counts, w1 + " " + w2)
        c1 = _lookup(m.ctx_keys, m.ctx_counts, w1)
        logp = np.log(c + a) - np.log(c1 + a * m.vocab_size)
        # per-doc fold in ascending-position order (bigrams are emitted in
        # token order, so reduceat segments are position-ordered)
        docs, starts = np.unique(bpar, return_index=True)
        sums = np.add.reduceat(logp, starts)
        n_big = np.diff(np.append(starts, logp.size))
        logppl = -sums / n_big
        ids = batch[self.id_col].take(pa.array(docs, pa.int64()))
        return pa.table({"id": ids,
                         "n_tokens": pa.array(n_big + 1, pa.int64()),
                         "logppl": pa.array(logppl, pa.float64()),
                         "ppl": pa.array(np.exp(logppl), pa.float64())})


def perplexity_score(ds, model: BigramLM, text_col: str, id_col: str,
                     alpha: float = 0.5, concurrency: int = 2):
    """Score every document of ``ds`` against ``model``. Streaming; the
    model ships via the object store once per actor."""
    import ray
    ref = ray.put(model)
    return ds.map_batches(
        PerplexityScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"model_ref": ref, "text_col": text_col,
                               "id_col": id_col, "alpha": alpha})
