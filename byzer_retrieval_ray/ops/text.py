"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All are vectorized ``map_batches`` column producers; the
stateful ones (compiled regexes, stopword tables as Arrow value sets) are callable
classes usable as actor-pool stages (setup once per actor in __init__).

Token-level statistics use one Arrow explode (utf8_split_whitespace →
list_parent_indices) + ``pc.is_in`` + ``np.bincount`` per batch — no per-row
Python loops in any hot path."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.murmur3 import murmur3_np
from byzer_retrieval_ray.functions.polyhash import poly_hash_np

_M61 = (1 << 61) - 1
_GRAM_MULT64 = np.uint64(1000003)

# A BPE-ish word/number/punctuation splitter (GPT-2-style contractions + word chunks).
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "que", "en", "por", "una"},
}


def _explode_tokens(texts: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(flat lowercased-able tokens, parent doc index, tokens-per-doc) via Arrow."""
    toks = pc.utf8_split_whitespace(texts)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = pc.filter(flat, mask)
    parents_np = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
    n_tok = np.bincount(parents_np, minlength=len(texts)).astype(np.int64)
    return flat, parents_np, n_tok


def _stop_hits(flat_lower: pa.Array, parents: np.ndarray, n_docs: int,
               value_set: pa.Array) -> np.ndarray:
    """Per-doc count of tokens (with multiplicity) in the stopword set."""
    hits = pc.is_in(flat_lower, value_set=value_set).to_numpy(zero_copy_only=False)
    return np.bincount(parents[hits], minlength=n_docs).astype(np.int64)


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens (whitespace) and n_bpe_tokens (regex BPE-ish) columns."""
    from byzer_retrieval_ray.functions.tokenize import doc_lengths
    texts = batch[text_col]
    ws = doc_lengths(texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts)
    import pandas as pd
    s = pd.Series(texts.to_numpy(zero_copy_only=False))
    bpe = s.str.count(BPE_RE).fillna(0).astype(np.int64)
    batch = batch.append_column("n_tokens", pa.array(ws, pa.int64()))
    return batch.append_column("n_bpe_tokens", pa.array(bpe.to_numpy(), pa.int64()))


class QualityScorer:
    """Heuristic document quality: length, punctuation ratio, stopword ratio, mean
    word length, alpha ratio → [0,1] score. Actor-pool friendly (regexes compiled
    and the stopword value-set built once per actor); fully vectorized
    (Arrow token explode + is_in for the stopword ratio)."""

    def __init__(self, text_col: str = "text", lang: str = "en"):
        self.text_col = text_col
        self.stop_set = pa.array(sorted(_STOPWORDS.get(lang, _STOPWORDS["en"])))
        self.punct = re.compile(r"[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        col = batch[self.text_col].combine_chunks() \
            if isinstance(batch[self.text_col], pa.ChunkedArray) else batch[self.text_col]
        texts = pd.Series(col.to_numpy(zero_copy_only=False)).fillna("")
        n_chars = texts.str.len().to_numpy()
        n_punct = texts.str.count(self.punct).to_numpy()
        flat, parents, n_tok = _explode_tokens(col)
        hits = _stop_hits(pc.utf8_lower(flat), parents, len(batch), self.stop_set)
        stop_ratio = np.where(n_tok > 0, hits / np.maximum(n_tok, 1), 0.0)
        mean_wl = np.where(n_tok > 0, (n_chars - np.maximum(n_tok - 1, 0)) / np.maximum(n_tok, 1), 0.0)
        alpha = texts.str.count(r"[A-Za-z]").to_numpy() / np.maximum(n_chars, 1)
        len_score = np.clip(n_tok / 100.0, 0, 1)
        punct_score = 1.0 - np.clip(n_punct / np.maximum(n_chars, 1) * 5, 0, 1)
        wl_score = 1.0 - np.clip(np.abs(mean_wl - 5.0) / 5.0, 0, 1)
        q = 0.3 * len_score + 0.2 * punct_score + 0.2 * np.clip(stop_ratio * 4, 0, 1) \
            + 0.15 * wl_score + 0.15 * np.clip(alpha * 1.25, 0, 1)
        batch = batch.append_column("quality", pa.array(q, pa.float64()))
        return batch.append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))


class LangId:
    """n-gram/stopword heuristic language ID over {en, de, fr, es, zh}.

    zh is detected by CJK codepoint ratio; latin languages by stopword hit rates
    (ties broken by table order en > de > fr > es — np.argmax first-max).
    Deterministic and vectorized: one token explode + one is_in per language.
    """

    _LANGS = list(_STOPWORDS.keys())

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.cjk = re.compile(r"[一-鿿]")
        self.stop_sets = [pa.array(sorted(_STOPWORDS[lang])) for lang in self._LANGS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        col = batch[self.text_col].combine_chunks() \
            if isinstance(batch[self.text_col], pa.ChunkedArray) else batch[self.text_col]
        texts = pd.Series(col.to_numpy(zero_copy_only=False)).fillna("")
        n = len(texts)
        cjk_ratio = texts.str.count(self.cjk).to_numpy() / np.maximum(texts.str.len().to_numpy(), 1)
        flat, parents, n_tok = _explode_tokens(col)
        low = pc.utf8_lower(flat)
        hits = np.stack([_stop_hits(low, parents, n, vs) for vs in self.stop_sets],
                        axis=1)                       # (n_docs, n_langs)
        best = np.argmax(hits, axis=1)                # first max = table order priority
        best_hits = hits[np.arange(n), best] if n else np.empty(0, np.int64)
        names = np.array(self._LANGS, dtype=object)
        langs = np.where(cjk_ratio > 0.2, "zh",
                         np.where((n_tok == 0) | (best_hits == 0), "unknown",
                                  names[best]))
        return batch.append_column("lang_pred", pa.array(langs.astype(object), pa.string()))


def rolling_fingerprint(texts: np.ndarray, k: int = 5, window: int = 8,
                        seed: int = 0, hash_fn: str = "murmur3") -> list[list[int]]:
    """Winnowing-style document fingerprints.

    Rolling hash over word k-grams; keep the minimum hash of every ``window``
    consecutive k-grams, dedup → sorted fingerprint set. Two documents sharing
    long passages share fingerprint values.

    hash_fn="murmur3" (default): murmur3 token hashes, gram fold mod 2^61-1.
    hash_fn="poly": Horner(31)-mod-2^32 token hashes, gram fold Horner(1000003)
    mod 2^64 — arithmetic exactly replicable in DuckDB SQL (see
    functions/polyhash.py), which makes the fingerprint gate entry
    oracle-checkable. Output values are int64 (two's complement view for poly).
    """
    out: list[list[int]] = []
    all_toks: list[str] = []
    offs = [0]
    for t in texts:
        all_toks.extend(t.split())
        offs.append(len(all_toks))
    poly = hash_fn == "poly"
    if all_toks:
        if poly:
            th = poly_hash_np(all_toks, bits=32)          # uint64 < 2^32
        else:
            th = (murmur3_np(np.array(all_toks, dtype=object)).astype(np.int64)
                  & 0xFFFFFFFF)
    for i in range(len(texts)):
        toks_h = th[offs[i]:offs[i + 1]] if all_toks else np.empty(0, np.int64)
        n = toks_h.size
        if n < k:
            uniq = np.unique(toks_h)
            if poly:
                uniq = uniq.astype(np.uint64).view(np.int64)
                uniq.sort()
            out.append([int(x) for x in uniq])
            continue
        # vectorized k-gram hash: polynomial combine of k shifted views
        if poly:
            grams = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                grams = grams * _GRAM_MULT64 + toks_h[j:n - k + 1 + j]
        else:
            grams = np.zeros(n - k + 1, dtype=np.int64)
            for j in range(k):
                grams = (grams * np.int64(1000003) + toks_h[j:n - k + 1 + j]) % _M61
        if grams.size <= window:
            mins = np.array([grams.min()], dtype=grams.dtype)
        else:
            from numpy.lib.stride_tricks import sliding_window_view
            mins = sliding_window_view(grams, window).min(axis=1)
        if poly:
            mins = np.unique(mins).view(np.int64)
            mins.sort()
            out.append([int(x) for x in mins])
        else:
            out.append(sorted(set(int(x) for x in mins)))
    return out


def add_fingerprints(batch: pa.Table, text_col: str = "text",
                     hash_fn: str = "murmur3") -> pa.Table:
    fps = rolling_fingerprint(batch[text_col].to_numpy(zero_copy_only=False),
                              hash_fn=hash_fn)
    return batch.append_column("fingerprint", pa.array(fps, pa.list_(pa.int64())))
