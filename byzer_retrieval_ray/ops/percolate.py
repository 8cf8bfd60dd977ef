"""Percolator: stream documents through REGISTERED queries (reverse search).

The Lucene-monitor / Elasticsearch-percolate shape: instead of indexing docs
and running a query, a fixed set of saved boolean queries is registered and
a document STREAM is matched against all of them — the standard way to route
a crawl (topic taps, compliance rules, collection builders) without building
an index first. The reference engine has no such operator — extension.

Query language: the engine's own SimpleQueryParser subset restricted to the
SET-expressible clause kinds — OR terms, ``+must`` terms, ``-must_not``
terms, and ``"a b"`` exact phrases (any of them required/prohibited). Each
registered query compiles ONCE into sorted numpy term arrays; matching is
pure set algebra per document:

    match = (every MUST term/phrase present) ∧ (¬ any MUST_NOT present)
          ∧ (≥1 SHOULD present, if any SHOULD clauses exist)

100 TB shape: queries are a broadcast (hundreds to thousands of rules, KBs),
documents stream through an actor-pool ``map_batches`` stage and NOTHING
shuffles — per batch one Arrow tokenize, one sorted-array membership test
per distinct query term (np.searchsorted over the batch's token table), and
per-doc presence folds via np.bincount. Output is the (doc, query) match
pairs — a flat-map whose volume is the actual match rate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.queryparser import parse_keyword
from byzer_retrieval_ray.ops.perplexity import _tokens


def compile_queries(queries: dict[str, str]) -> list[dict]:
    """{name: keyword} → compiled match programs (raises on clause kinds the
    set-algebra matcher can't express: prefixes, fuzzies, wildcards, regexps,
    sloppy phrases, nested groups)."""
    out = []
    for name, kw in sorted(queries.items()):
        pk = parse_keyword(kw)
        unsupported = (pk.prefixes or pk.must_prefixes or pk.not_prefixes
                       or pk.fuzzies or pk.must_fuzzies or pk.not_fuzzies
                       or pk.wildcards or pk.must_wildcards
                       or pk.not_wildcards or pk.regexps or pk.must_regexps
                       or pk.not_regexps or pk.pphrases or pk.must_pphrases
                       or pk.not_pphrases or pk.slop_phrases
                       or pk.must_slop_phrases or pk.not_slop_phrases
                       or pk.must_groups or pk.should_groups or pk.not_groups)
        if unsupported:
            raise ValueError(
                f"percolator query {name!r}: only terms, +/- terms and "
                "exact phrases are supported")
        out.append({
            "name": name,
            "should": list(pk.should),
            "must": list(pk.must),
            "not": list(pk.must_not),
            "should_ph": [tuple(p) for p in pk.phrases],
            "must_ph": [tuple(p) for p in pk.must_phrases],
            "not_ph": [tuple(p) for p in pk.not_phrases],
        })
    return out


class Percolator:
    """Actor-pool stage: compile once per actor, match batches vectorized.

    Per batch: tokenize once; for every DISTINCT term across all queries,
    one sorted-membership pass marks which docs contain it (np.bincount per
    term over the batch's (token, doc) table); phrase presence uses the
    position-packing adjacency trick on the batch's token positions. Then
    each query is a boolean fold over its terms' presence columns."""

    def __init__(self, queries, text_col: str, id_col: str):
        self.progs = (queries if isinstance(queries, list)
                      else compile_queries(queries))
        self.text_col = text_col
        self.id_col = id_col
        terms = set()
        for p in self.progs:
            terms.update(p["should"], p["must"], p["not"])
        self.terms = np.array(sorted(terms), dtype=object)
        self.phrases = sorted({ph for p in self.progs
                               for ph in (p["should_ph"] + p["must_ph"]
                                          + p["not_ph"])})

    def _presence(self, words, par, n_rows):
        """(term → bool[n_rows], phrase → bool[n_rows]) for one batch."""
        tp: dict[str, np.ndarray] = {}
        if self.terms.size and words.size:
            loc = np.searchsorted(self.terms, words)
            ok = loc < self.terms.size
            ok[ok] = self.terms[loc[ok]] == words[ok]
            for ti in np.unique(loc[ok]):
                mask = np.zeros(n_rows, dtype=bool)
                mask[par[ok & (loc == ti)]] = True
                tp[self.terms[ti]] = mask
        zero = np.zeros(n_rows, dtype=bool)
        pp: dict[tuple, np.ndarray] = {}
        if self.phrases and words.size:
            # in-doc token positions (0-based, per doc)
            starts = np.flatnonzero(np.diff(par, prepend=-1))
            pos = np.arange(par.size) - np.repeat(starts, np.diff(
                np.append(starts, par.size)))
            # pack (doc, pos) into one key; B bounds the position space —
            # sized by the LONGEST registered phrase (pos - j reaches
            # -(len-1), which must not alias into the previous doc's key
            # space; the engine's _phrase_posting sizes the same packing by
            # max_pos + phrase_len + 1)
            max_len = max(len(ph) for ph in self.phrases)
            B = np.int64(1 << max(21, int(pos.max() + max_len + 2
                                          if pos.size else max_len + 2
                                          ).bit_length()))
            for ph in self.phrases:
                cur = None
                for j, t in enumerate(ph):
                    sel = words == t
                    keys = par[sel] * B + (pos[sel] - j)
                    cur = keys if cur is None else \
                        cur[np.isin(cur, keys, assume_unique=False)]
                    if cur.size == 0:
                        break
                mask = np.zeros(n_rows, dtype=bool)
                if cur is not None and cur.size:
                    mask[np.unique(cur // B)] = True
                pp[ph] = mask
        return tp, pp, zero

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = len(batch)
        words, par = _tokens(batch[self.text_col])
        tp, pp, zero = self._presence(words, par, n_rows)
        ids_out = []
        id_col = batch[self.id_col]
        for p in self.progs:
            m = np.ones(n_rows, dtype=bool)
            for t in p["must"]:
                m &= tp.get(t, zero)
            for ph in p["must_ph"]:
                m &= pp.get(ph, zero)
            for t in p["not"]:
                m &= ~tp.get(t, zero)
            for ph in p["not_ph"]:
                m &= ~pp.get(ph, zero)
            if p["should"] or p["should_ph"]:
                s = np.zeros(n_rows, dtype=bool)
                for t in p["should"]:
                    s |= tp.get(t, zero)
                for ph in p["should_ph"]:
                    s |= pp.get(ph, zero)
                m &= s
            hit = np.flatnonzero(m)
            if hit.size:
                ids_out.append(pa.table({
                    "id": id_col.take(pa.array(hit, pa.int64())),
                    "query": pa.array([p["name"]] * hit.size, pa.string()),
                }))
        if not ids_out:
            return pa.table({"id": pa.array([], id_col.type),
                             "query": pa.array([], pa.string())})
        return pa.concat_tables(ids_out).combine_chunks()


def percolate(ds, queries: dict[str, str], text_col: str, id_col: str,
              concurrency: int = 2):
    """Match every document of ``ds`` against the registered ``queries``
    ({name: keyword}); returns the (id, query) match pairs. Streaming; the
    compiled programs ride the actor constructor (KBs)."""
    progs = compile_queries(queries)
    return ds.map_batches(
        Percolator, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"queries": progs, "text_col": text_col,
                               "id_col": id_col})
