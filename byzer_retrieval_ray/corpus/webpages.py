"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Parquet table ``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` — Common-Crawl-shaped per BASELINE.json's input_hint. Generation is
CHUNKED and order-independent: rows [c*CHUNK, (c+1)*CHUNK) are a pure function of
(SEED, c), fully vectorized inside the chunk, so any request range and any Ray
parallelism produce identical rows (asserted in tests).

Properties:
  * ``text``: Zipf(s≈1.07) tokens over a ~20k-term vocabulary, length lognormal
    (μ≈300) clipped [10, 2000] — webtext-like head/tail term skew, so posting-list
    skew handling is actually exercised.
  * ``html`` embeds the text as ``<html><head><title>…</title></head><body><p>{text}
    </p></body></html>`` so ``extract_text(html) == text`` byte-identically (the
    per-row invariant vs the reference).
  * ~1% of rows re-use an earlier row's url with a later warc_ts and different text —
    upsert fodder (latest wins, reference RetrievalWorker.java:232-238).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CHUNK = 1024
VOCAB_SIZE = 20_000
ZIPF_S = 1.07
MEAN_TOKENS = 300.0
LANGS = np.array(["en", "zh", "de", "fr", "es"])
LANG_CDF = np.cumsum([0.7, 0.1, 0.07, 0.06, 0.07])
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)

_VOCAB: np.ndarray | None = None
_ZIPF_CDF: np.ndarray | None = None


def vocab() -> np.ndarray:
    """~20k deterministic ASCII words (rank order = Zipf frequency order)."""
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(SEED)
        alphabet = "abcdefghijklmnopqrstuvwxyz"
        lens = rng.integers(3, 11, size=VOCAB_SIZE)
        letters = rng.integers(0, 26, size=int(lens.sum()))
        words, seen, pos = [], set(), 0
        for ln in lens:
            w = "".join(alphabet[letters[pos + j]] for j in range(ln))
            pos += ln
            while w in seen:
                w += alphabet[(len(w) * 7) % 26]
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


def hash_frac(i) -> np.ndarray:
    """Deterministic uniform [0,1) per row index (vectorized splitmix-style)."""
    x = (np.asarray(i, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + np.uint64(SEED))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x & np.uint64((1 << 53) - 1)).astype(np.float64) / float(1 << 53)


def _lang_of(idx: np.ndarray) -> np.ndarray:
    return LANGS[np.searchsorted(LANG_CDF, hash_frac(idx))]


def _generate_chunk(c: int) -> pa.Table:
    """Rows [c*CHUNK, (c+1)*CHUNK) — one vectorized rng stream per chunk."""
    v = vocab()
    cdf = _zipf_cdf()
    rng = np.random.default_rng(np.random.SeedSequence([SEED, int(c)]))
    start = c * CHUNK
    idx = np.arange(start, start + CHUNK, dtype=np.int64)

    n_tok = np.clip(rng.lognormal(np.log(MEAN_TOKENS), 0.7, CHUNK), 10, 2000).astype(np.int64)
    total = int(n_tok.sum())
    toks = v[np.searchsorted(cdf, rng.random(total))]
    offs = np.zeros(CHUNK + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offs[1:])
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(CHUNK)]

    # ~1% duplicate an earlier url (same url, later ts, different text)
    dup_roll = rng.random(CHUNK)
    dup_src = rng.integers(0, np.maximum(idx, 1), CHUNK)
    is_dup = (dup_roll < 0.01) & (idx > 100)
    url_idx = np.where(is_dup, dup_src, idx)
    langs = _lang_of(url_idx)
    urls = [f"https://site{j % 977}.example/{l}/page/{j}"
            for j, l in zip(url_idx.tolist(), langs.tolist())]
    htmls = [(f"<html><head><title>page {j}</title></head>"
              f"<body><p>{t}</p></body></html>").encode("utf-8")
             for j, t in zip(idx.tolist(), texts)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(EPOCH_2024 + idx * 737_000_000).cast(pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
    })


def generate_rows(start: int, stop: int) -> pa.Table:
    """Rows [start, stop) — any chunk-covering request yields identical rows."""
    c0, c1 = start // CHUNK, (stop + CHUNK - 1) // CHUNK
    tables = [_generate_chunk(c) for c in range(c0, c1)]
    t = pa.concat_tables(tables) if tables else _generate_chunk(0).slice(0, 0)
    return t.slice(start - c0 * CHUNK, stop - start)


def write_corpus(path: str, n_rows: int, rows_per_file: int = 16_384,
                 use_ray: bool | None = None) -> str:
    """Write the corpus under ``path`` (idempotent; parallelized via Ray Data when
    available and the corpus is large)."""
    os.makedirs(path, exist_ok=True)
    done_marker = os.path.join(path, f"_DONE_{n_rows}")
    if os.path.exists(done_marker):
        return path
    spans = [(s, min(s + rows_per_file, n_rows))
             for s in range(0, n_rows, rows_per_file)]
    if use_ray is None:
        import ray
        use_ray = ray.is_initialized() and n_rows >= 100_000

    def write_span(span) -> str:
        s, e = span
        fp = os.path.join(path, f"part-{s:010d}.parquet")
        if not os.path.exists(fp):
            tmp = fp + ".tmp"
            pq.write_table(generate_rows(s, e), tmp)
            os.replace(tmp, fp)
        return fp

    if use_ray:
        import ray

        @ray.remote(num_cpus=1)
        def _w(span):
            return write_span(span)

        ray.get([_w.remote(sp) for sp in spans])
    else:
        for sp in spans:
            write_span(sp)
    with open(done_marker, "w") as f:
        f.write(str(n_rows))
    return path
