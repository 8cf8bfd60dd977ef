"""Distributed BPE tokenizer-vocabulary training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") and the
matching encoder — the Ray-Data-first shape used by every production
subword trainer (SentencePiece, GPT-2's bpe ranks, HF tokenizers):

1. **Corpus pass (distributed, once):** word frequencies via the combiner
   pattern — per-batch Arrow tokenize + partial counts, ONE hash-bucket
   groupby that carries (word, partial_count) rows only (token streams never
   shuffle), per-bucket vectorized sums. ``min_frequency`` prunes the tail
   at the bucket (rare words can't win any merge they'd be needed for only
   if they reach the count threshold — the standard trainer knob that bounds
   the working set).
2. **Merge loop (trainer-local, vectorized):** the distinct-word count table
   — NOT the corpus — is the working set, exactly like the reference
   trainers (a 100 TB web corpus has ~10⁷–10⁸ distinct words above
   min_frequency 2; the corpus itself never revisits). Words live as one
   flat int32 symbol array + word-index array; every iteration counts
   adjacent pairs with np.unique/bincount weighted by word counts
   (overlapping occurrences count, Sennrich's ``get_stats``), picks the max
   (ties: lexicographically smallest (left, right) token pair — fully
   deterministic), and merges occurrences greedily left-to-right (runs of a
   self-pair like "aaaa" keep alternate positions).

BPE's merge choice depends on global counts each round — an inherently
iterative, data-dependent algorithm, which is why the gate entry is
rows-only (no SQL oracle); tests/test_bpe.py pins the exact merge sequence
against an independent naive trainer instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.polyhash import poly_hash_np


def word_counts(ds, text_col: str, min_frequency: int = 1,
                num_buckets: int = 64) -> pa.Table:
    """Corpus-wide (word, count) over whitespace tokens, combiner-first.

    Shuffle carries (word, partial_count) pairs only; per-bucket sums are
    vectorized; ``min_frequency`` is applied AFTER the global sum (exact).
    Returns one Arrow table sorted by (count desc, word asc) — the trainer
    working set, materialized deliberately (see module docstring)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = pc.list_flatten(pc.utf8_split_whitespace(col))
        flat = pc.filter(flat, pc.not_equal(flat, ""))
        t = pa.table({"word": flat.cast(pa.large_string())})
        agg = t.group_by("word").aggregate([("word", "count")])
        h = poly_hash_np(agg["word"].to_pylist(), bits=32)
        return pa.table({
            "word": agg["word"],
            "cnt": agg["word_count"].cast(pa.int64()),
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    def bucket_sum(group: pa.Table) -> pa.Table:
        agg = group.group_by("word").aggregate([("cnt", "sum")])
        agg = agg.rename_columns(["word", "count"])
        if min_frequency > 1:
            agg = agg.filter(pc.greater_equal(agg["count"],
                                              int(min_frequency)))
        return agg

    parts = ds.map_batches(partial, batch_format="pyarrow") \
              .groupby("__b").map_groups(bucket_sum, batch_format="pyarrow")
    tbl = pa.Table.from_pandas(parts.to_pandas(), preserve_index=False)
    if len(tbl) == 0:
        return pa.table({"word": pa.array([], pa.large_string()),
                         "count": pa.array([], pa.int64())})
    return tbl.sort_by([("count", "descending"), ("word", "ascending")])


def train_bpe(ds, text_col: str, num_merges: int,
              min_frequency: int = 2, num_buckets: int = 64) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a Dataset's text column.

    Returns (rank:int64, left:string, right:string, token:string,
    pair_count:int64) in merge order; stops early when no pair is left.
    Selection counts overlapping occurrences; application merges greedily
    left-to-right — both exactly the published Sennrich algorithm, with the
    deterministic tie-break (count desc, (left, right) asc)."""
    wc = word_counts(ds, text_col, min_frequency=min_frequency,
                     num_buckets=num_buckets)
    return train_bpe_from_counts(wc, num_merges)


def train_bpe_from_counts(wc: pa.Table, num_merges: int) -> pa.Table:
    """The trainer-local merge loop over a (word, count) table (see
    :func:`train_bpe`); exposed separately so a precomputed/persisted count
    table can resume training without re-reading the corpus."""
    words = wc["word"].to_pylist() if len(wc) else []
    counts = wc["count"].to_numpy().astype(np.int64) if len(wc) \
        else np.empty(0, np.int64)

    # vocabulary: symbol id -> token string; words as flat id sequences
    vocab: list[str] = []
    sym_of: dict[str, int] = {}
    flat_ids: list[int] = []
    word_ix: list[int] = []
    for wi, w in enumerate(words):
        for ch in w:
            s = sym_of.get(ch)
            if s is None:
                s = sym_of[ch] = len(vocab)
                vocab.append(ch)
            flat_ids.append(s)
            word_ix.append(wi)
    sym = np.asarray(flat_ids, np.int64)
    wix = np.asarray(word_ix, np.int64)

    out_rank: list[int] = []
    out_left: list[str] = []
    out_right: list[str] = []
    out_token: list[str] = []
    out_count: list[int] = []

    for rank in range(int(num_merges)):
        if sym.size < 2:
            break
        adj = wix[:-1] == wix[1:]
        if not adj.any():
            break
        left = sym[:-1][adj]
        right = sym[1:][adj]
        w = counts[wix[:-1][adj]]
        key = (left << 32) | right          # vocab ids stay far below 2^32
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        best_cnt = int(tot.max())
        # ties: lexicographically smallest (left token, right token)
        tie = uniq[tot == best_cnt]
        la = (tie >> 32).astype(np.int64)
        ra = (tie & np.int64(0xFFFFFFFF)).astype(np.int64)
        bi = min(range(tie.size), key=lambda i: (vocab[la[i]], vocab[ra[i]]))
        a, b = int(la[bi]), int(ra[bi])
        new_tok = vocab[a] + vocab[b]
        new_id = len(vocab)
        vocab.append(new_tok)

        # occurrences, overlap-resolved greedily left-to-right: adjacent
        # occurrence positions (possible only for self-pairs, "aaaa") keep
        # alternate members of each consecutive run
        occ = np.flatnonzero((sym[:-1] == a) & (sym[1:] == b)
                             & (wix[:-1] == wix[1:]))
        if occ.size == 0:       # unreachable: best pair came from this scan
            break
        run_start = np.empty(occ.size, bool)
        run_start[0] = True
        np.greater(np.diff(occ), 1, out=run_start[1:])
        first_of_run = occ[run_start][np.cumsum(run_start) - 1]
        keep = occ[((occ - first_of_run) & 1) == 0]

        sym[keep] = new_id
        drop = np.zeros(sym.size, bool)
        drop[keep + 1] = True
        sym = sym[~drop]
        wix = wix[~drop]

        out_rank.append(rank)
        out_left.append(vocab[a])
        out_right.append(vocab[b])
        out_token.append(new_tok)
        out_count.append(best_cnt)

    return pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        "left": pa.array(out_left, pa.string()),
        "right": pa.array(out_right, pa.string()),
        "token": pa.array(out_token, pa.string()),
        "pair_count": pa.array(out_count, pa.int64()),
    })


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with learned merges: repeatedly apply the
    lowest-rank pair present, merging its occurrences greedily
    left-to-right — the published GPT-2 ``bpe()`` loop."""
    seq = list(word)
    while len(seq) > 1:
        best_rank, best_pair = None, None
        for p in zip(seq[:-1], seq[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


class BpeEncoder:
    """Actor-pool ``map_batches`` stage: text column → list<string> BPE
    tokens. The merge table is tiny (num_merges rows) and rides the actor
    (``__init__`` once per actor — the stateful-stage pattern); distinct
    words are encoded once per batch through an LRU-ish dict cache (web text
    repeats words heavily)."""

    def __init__(self, merges: pa.Table, text_col: str,
                 out_col: str = "bpe_tokens", cache_size: int = 1 << 20):
        self.ranks = {(l, r): int(k) for k, l, r in zip(
            merges["rank"].to_pylist(), merges["left"].to_pylist(),
            merges["right"].to_pylist())}
        self.text_col = text_col
        self.out_col = out_col
        self.cache: dict[str, list[str]] = {}
        self.cache_size = cache_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        toks = pc.utf8_split_whitespace(col)
        flat = pc.list_flatten(toks)
        offs = np.asarray(toks.offsets.to_numpy(), np.int64)
        words = flat.to_pylist()
        if len(self.cache) > self.cache_size:
            self.cache.clear()
        enc = self.cache
        rows: list[list[str]] = []
        for i in range(len(batch)):
            row: list[str] = []
            for w in words[offs[i]:offs[i + 1]]:
                if not w:
                    continue
                e = enc.get(w)
                if e is None:
                    e = enc[w] = encode_word(w, self.ranks)
                row.extend(e)
            rows.append(row)
        return batch.append_column(
            self.out_col, pa.array(rows, pa.list_(pa.string())))
