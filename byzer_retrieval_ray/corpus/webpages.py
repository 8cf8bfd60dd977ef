"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Parquet table ``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` — Common-Crawl-shaped per BASELINE.json's input_hint. Every row is a
pure function of (seed, row index): generation is chunked and order-independent, so any
Ray parallelism produces the identical table (hash-asserted in tests).

Properties:
  * ``text`` is a Zipf(s≈1.07) token sequence over a ~20k-term vocabulary, length
    lognormal(μ≈300 tokens) clipped to [10, 2000] — webtext-like term skew, so the
    posting-list skew handling actually gets exercised.
  * ``html`` embeds the text as ``<html><head><title>…</title></head><body><p>{text}
    </p></body></html>`` so ``extract_text(html) == text`` byte-identically (the
    per-row invariant vs the reference).
  * ~1% of rows re-use an earlier row's url with a later warc_ts and different text —
    upsert-by-key fodder (latest wins, reference RetrievalWorker.java:232-238).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 20_000
ZIPF_S = 1.07
MEAN_TOKENS = 300.0
LANGS = np.array(["en", "zh", "de", "fr", "es"])
LANG_CDF = np.cumsum([0.7, 0.1, 0.07, 0.06, 0.07])
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)

_VOCAB: np.ndarray | None = None
_ZIPF_CDF: np.ndarray | None = None


def vocab() -> np.ndarray:
    """~20k deterministic ASCII words: w<base36ish suffix> with varied lengths."""
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(SEED)
        alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        lens = rng.integers(3, 11, size=VOCAB_SIZE)
        words = []
        seen = set()
        for i in range(VOCAB_SIZE):
            w = "".join(alphabet[rng.integers(0, 26, size=lens[i])])
            while w in seen:
                w = w + alphabet[rng.integers(0, 26)]
            seen.add(w)
            words.append(w)
        _VOCAB = np.array(words)
    return _VOCAB


def _zipf_cdf() -> np.ndarray:
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = ranks ** (-ZIPF_S)
        p /= p.sum()
        _ZIPF_CDF = np.cumsum(p)
    return _ZIPF_CDF


def _row_rng(i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([SEED, int(i)]))


def generate_rows(start: int, stop: int) -> pa.Table:
    """Rows [start, stop) — pure function of row index, any chunking yields same rows."""
    v = vocab()
    cdf = _zipf_cdf()
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, stop):
        rng = _row_rng(i)
        n_tok = int(np.clip(rng.lognormal(np.log(MEAN_TOKENS), 0.7), 10, 2000))
        toks = v[np.searchsorted(cdf, rng.random(n_tok))]
        text = " ".join(toks)
        # ~1% duplicate an earlier url (same url, later ts, different text)
        if i > 100 and rng.random() < 0.01:
            j = int(rng.integers(0, i - 1))
            lang = LANGS[int(np.searchsorted(LANG_CDF, (hash_frac(j))))]
            url = f"https://site{j % 977}.example/{lang}/page/{j}"
        else:
            lang = LANGS[int(np.searchsorted(LANG_CDF, hash_frac(i)))]
            url = f"https://site{i % 977}.example/{lang}/page/{i}"
        title = f"page {i}"
        html = (f"<html><head><title>{title}</title></head>"
                f"<body><p>{text}</p></body></html>").encode("utf-8")
        urls.append(url)
        tss.append(EPOCH_2024 + i * 737_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(tss, dtype=np.int64)).cast(pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def hash_frac(i: int) -> float:
    """Deterministic uniform [0,1) from the row index (independent of the row rng)."""
    x = (int(i) * 0x9E3779B97F4A7C15 + SEED) & ((1 << 64) - 1)
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & ((1 << 64) - 1)
    x ^= x >> 33
    return (x & ((1 << 53) - 1)) / float(1 << 53)


def write_corpus(path: str, n_rows: int, rows_per_file: int = 10_000) -> str:
    """Write the corpus as one-or-more parquet files under ``path`` (idempotent)."""
    os.makedirs(path, exist_ok=True)
    done_marker = os.path.join(path, f"_DONE_{n_rows}")
    if os.path.exists(done_marker):
        return path
    for start in range(0, n_rows, rows_per_file):
        stop = min(start + rows_per_file, n_rows)
        fp = os.path.join(path, f"part-{start:010d}.parquet")
        if not os.path.exists(fp):
            pq.write_table(generate_rows(start, stop), fp)
    with open(done_marker, "w") as f:
        f.write(str(n_rows))
    return path
