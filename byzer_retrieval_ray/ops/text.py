"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All are vectorized ``map_batches`` column producers; the
stateful ones (compiled regexes, stopword tables) are callable classes usable as
actor-pool stages (setup once per actor in __init__)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.murmur3 import murmur3_np

# A BPE-ish word/number/punctuation splitter (GPT-2-style contractions + word chunks).
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "que", "en", "por", "una"},
}


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
    once per actor)."""

    def __init__(self, text_col: str = "text", lang: str = "en"):
        self.text_col = text_col
        self.stop = _STOPWORDS.get(lang, _STOPWORDS["en"])
        self.punct = re.compile(r"[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        texts = pd.Series(batch[self.text_col].to_numpy(zero_copy_only=False)).fillna("")
        n_chars = texts.str.len().to_numpy()
        n_punct = texts.str.count(self.punct).to_numpy()
        toks = texts.str.split()
        n_tok = toks.map(len).to_numpy()
        stop = self.stop
        stop_ratio = toks.map(
            lambda ws: sum(1 for w in ws if w.lower() in stop) / len(ws) if ws else 0.0
        ).to_numpy()
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

    zh is detected by CJK codepoint ratio; latin languages by stopword hit rates.
    Deterministic, vectorized-ish (pandas string kernels + per-doc token set lookup).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        texts = pd.Series(batch[self.text_col].to_numpy(zero_copy_only=False)).fillna("")
        cjk_ratio = texts.str.count(self.cjk).to_numpy() / np.maximum(texts.str.len().to_numpy(), 1)
        langs = []
        for t, cj in zip(texts, cjk_ratio):
            if cj > 0.2:
                langs.append("zh")
                continue
            toks = [w.lower() for w in t.split()]
            if not toks:
                langs.append("unknown")
                continue
            best, best_hits = "unknown", 0
            for lang, stop in _STOPWORDS.items():
                hits = sum(1 for w in toks if w in stop)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best if best_hits > 0 else "unknown")
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def rolling_fingerprint(texts: np.ndarray, k: int = 5, window: int = 8,
                        seed: int = 0) -> list[list[int]]:
    """Winnowing-style document fingerprints.

    Rabin-Karp rolling hash over word k-grams; keep the minimum hash of every
    ``window`` consecutive k-grams (rightmost min), dedup → sorted fingerprint set.
    Two documents sharing long passages share fingerprint values.
    """
    out: list[list[int]] = []
    all_toks: list[str] = []
    offs = [0]
    for t in texts:
        all_toks.extend(t.split())
        offs.append(len(all_toks))
    if all_toks:
        th = (murmur3_np(np.array(all_toks, dtype=object)).astype(np.int64)
              & 0xFFFFFFFF)
    for i in range(len(texts)):
        toks_h = th[offs[i]:offs[i + 1]] if all_toks else np.empty(0, np.int64)
        n = toks_h.size
        if n < k:
            out.append([int(x) for x in np.unique(toks_h)])
            continue
        # vectorized k-gram hash: polynomial combine of k shifted views
        grams = np.zeros(n - k + 1, dtype=np.int64)
        for j in range(k):
            grams = (grams * np.int64(1000003) + toks_h[j:n - k + 1 + j]) % _M61
        if grams.size <= window:
            mins = np.array([grams.min()])
        else:
            from numpy.lib.stride_tricks import sliding_window_view
            mins = sliding_window_view(grams, window).min(axis=1)
        out.append(sorted(set(int(x) for x in mins)))
    return out


_M61 = (1 << 61) - 1


def add_fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = rolling_fingerprint(batch[text_col].to_numpy(zero_copy_only=False))
    return batch.append_column("fingerprint", pa.array(fps, pa.list_(pa.int64())))
