"""PMI collocation mining (Church & Hanks 1990) — corpus-level pointwise
mutual information over adjacent word pairs:

    pmi(a, b) = ln( p(ab) / (p(a) · p(b)) ),
    p(ab) = c_ab / N_bigrams,   p(w) = c_w / N_tokens

High-PMI bigrams are the corpus's collocations ("block max", "posting
list") — a standard corpus-analysis / phrase-vocabulary step when preparing
web text. The reference engine has no corpus statistics beyond termstats
(SURVEY.md §2) — extension, same family as ops/sample.top_ngrams.

100 TB shape, three narrow stages:

* **count** — the top_ngrams combiner pattern: each batch pre-aggregates
  its unigram AND bigram counts in one tokenize pass (Arrow split + shifted
  numpy views), and ONE hash-bucket groupby sums (gram, partial_count)
  rows — token streams never shuffle.
* **totals** — N_tokens / N_bigrams via streaming Dataset.sum over the
  count rows (no driver materialization).
* **join** — bigram PMI needs each component's unigram count. The unigram
  VOCABULARY (not the corpus) is the small side — ~10^7-10^8 rows at web
  scale, orders of magnitude under the corpus — so it is fetched once into
  the driver, ``ray.put`` once, and looked up inside a streaming
  ``map_batches`` over the bigram counts (the broadcast-join pattern of
  ops/join.py). If the vocabulary ever outgrew a worker's heap the fix is
  the dedup-style bucketed exchange (hash bigrams by component, two
  passes); documented, not needed at realistic vocabulary sizes.

Arithmetic is float64 with the exact expression shape mirrored in the SQL
oracle (``ln((cab/nb) / ((ca/nu) * (cb/nu)))``), rounded half-away-from-zero
to 4 decimals on both sides (ops/gopher.py precedent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.polyhash import poly_hash_np


def _round4(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero 4-decimal rounding (matches DuckDB ROUND); PMI can
    be negative, so handle both signs."""
    return np.sign(x) * np.floor(np.abs(x) * 1e4 + 0.5) / 1e4


def pmi_collocations(ds, text_col: str, min_count: int = 5, k: int | None = None,
                     num_buckets: int = 64):
    """All adjacent-bigram collocations with count >= ``min_count``, scored by
    PMI (see module docstring). Returns a pandas DataFrame
    (ngram, count, pmi) ordered by (pmi desc, ngram asc), truncated to ``k``
    rows when given."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        col = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) \
            else texts
        toks = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        words = pc.filter(flat, mask).to_numpy(zero_copy_only=False)
        par = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
        total = words.size
        if total == 0:
            return pa.table({"g": pa.array([], pa.large_string()),
                             "kind": pa.array([], pa.int8()),
                             "cnt": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        grams = np.empty(0, dtype=object)
        if total >= 2:
            valid = par[1:] == par[:-1]
            starts = np.flatnonzero(valid)
            grams = (words[starts].astype(object) + " "
                     + words[starts + 1].astype(object))
        t = pa.table({"g": pa.array(np.concatenate([words.astype(object),
                                                    grams]),
                                    pa.large_string()),
                      "kind": pa.array(np.concatenate([
                          np.ones(total, np.int8),
                          np.full(len(grams), 2, np.int8)]))})
        agg = t.group_by(["g", "kind"]).aggregate([("g", "count")])
        h = poly_hash_np(agg["g"].to_pylist(), bits=32)
        return pa.table({
            "g": agg["g"], "kind": agg["kind"],
            "cnt": agg["g_count"].cast(pa.int64()),
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    def bucket_sum(group: pa.Table) -> pa.Table:
        agg = group.group_by(["g", "kind"]).aggregate([("cnt", "sum")])
        return agg.rename_columns(["g", "kind", "count"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
               .groupby("__b").map_groups(bucket_sum, batch_format="pyarrow") \
               .materialize()

    def _kind(kv: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["kind"], kv)).select(["g", "count"])
        return f

    n_tokens = float(counts.map_batches(_kind(1), batch_format="pyarrow")
                     .sum("count"))
    n_bigrams = float(counts.map_batches(_kind(2), batch_format="pyarrow")
                      .sum("count"))

    # broadcast the unigram vocabulary once (small side — module docstring)
    uni_tabs = ray.get(counts.map_batches(
        _kind(1), batch_format="pyarrow").to_arrow_refs())
    uni = pa.concat_tables([t for t in uni_tabs if t.num_rows])
    uni_ref = ray.put({w: int(c) for w, c in
                       zip(uni["g"].to_pylist(), uni["count"].to_pylist())})

    def score(batch: pa.Table) -> pa.Table:
        bi = batch.filter(pc.and_(pc.equal(batch["kind"], 2),
                                  pc.greater_equal(batch["count"],
                                                   min_count)))
        if bi.num_rows == 0:
            return pa.table({"ngram": pa.array([], pa.large_string()),
                             "count": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        lut = ray.get(uni_ref)
        grams = bi["g"].to_numpy(zero_copy_only=False)
        cab = bi["count"].to_numpy().astype(np.float64)
        pairs = np.char.partition(grams.astype(str), " ")
        ca = np.array([lut[w] for w in pairs[:, 0]], dtype=np.float64)
        cb = np.array([lut[w] for w in pairs[:, 2]], dtype=np.float64)
        pmi = np.log((cab / n_bigrams)
                     / ((ca / n_tokens) * (cb / n_tokens)))
        return pa.table({"ngram": bi["g"],
                         "count": bi["count"],
                         "pmi": pa.array(_round4(pmi), pa.float64())})

    out = counts.map_batches(score, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["pmi", "ngram"],
                          ascending=[False, True]).reset_index(drop=True)
    return out.head(k).reset_index(drop=True) if k is not None else out
