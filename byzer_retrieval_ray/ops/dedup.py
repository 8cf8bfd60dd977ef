"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-first and 100 TB-shaped:

* the only shuffled rows are **narrow sketches** — (hash, id) for exact dedup,
  (id, band, band_hash) for MinHash-LSH, (id, simhash) for SimHash — the documents
  and the 64-lane signatures never enter a shuffle;
* winners/losers are resolved per hash bucket with vectorized numpy inside
  ``map_groups`` (one call per bucket, not per key);
* the loser/candidate id sets (tiny relative to the corpus: only duplicates and
  band-collision candidates) are broadcast once via ``ray.put`` and applied inside
  ``map_batches`` — a broadcast semi-join, not an all-to-all of the corpus.

The reference engine has no dedup beyond upsert-by-_id (SURVEY.md §2.6); these
extend it.

Hash families: ``hash_fn="murmur3"`` (default) uses murmur3_x86_32 shingle hashing;
``hash_fn="poly"`` uses the Horner polynomial family from functions/polyhash.py whose
arithmetic is exactly replicable in SQL (DuckDB list_reduce), making the MinHash
pipeline oracle-checkable end-to-end: token hash = Horner(31) mod 2^32 over
codepoints, shingle hash = Horner(1000003) mod 2^64 over k token hashes reduced
mod 2^32, permutation j = (a_j·h + b_j) mod (2^61-1) with a_j < 2^31 so every
product is exact in uint64/HUGEINT on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.murmur3 import murmur3_np
from byzer_retrieval_ray.functions.polyhash import poly_hash_np

_M61 = (1 << 61) - 1
_GRAM_MULT = np.uint64(1000003)
_MASK32 = np.uint64(0xFFFFFFFF)
# broadcast id sets beyond this size (~0.4 GB) are flagged: the semi-join is
# the right shape at web dup rates, but pathological corpora should bucket
BROADCAST_ID_WARN = 50_000_000


def _content_hash(texts: np.ndarray, seed: int = 0) -> np.ndarray:
    """128-ish-bit content hash as two independent murmur32 passes → int64."""
    h1 = murmur3_np(texts).astype(np.int64) & 0xFFFFFFFF
    h2 = murmur3_np(np.array([t + "\x01" for t in texts], dtype=object)).astype(np.int64) & 0xFFFFFFFF
    return (h1 << 32) | h2


# ---------------- exact dedup ----------------

def _hash_rows(ds, text_col: str, id_col: str, num_buckets: int):
    """Narrow (hash, id, bucket) rows — the ONLY thing the exact-dedup shuffle moves."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        h = _content_hash(texts)
        return pa.table({
            "__h": pa.array(h, pa.int64()),
            id_col: batch[id_col],
            "__b": pa.array((h % num_buckets).astype(np.int32)),
        })

    return ds.map_batches(add_hash, batch_format="pyarrow")


def _id_buckets(col, nb: int) -> np.ndarray:
    """Deterministic id-hash bucket per row (any id type, via string cast)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.cast(pa.string()).to_numpy(zero_copy_only=False)
    return (murmur3_np(vals).astype(np.int64) % nb).astype(np.int32)


def exact_dedup(ds, text_col: str, id_col: str, num_buckets: int = 64,
                broadcast_limit: int | None = None):
    """Exact duplicate removal: keep the smallest id per identical text.

    Shuffle carries (hash, id) only; per-bucket vectorized resolution finds the
    LOSERS (non-minimal ids per hash). Two elimination paths, picked by loser
    count against ``broadcast_limit`` (default BROADCAST_ID_WARN):

    * **broadcast semi-join** (the common case — duplicates are a small
      fraction): the loser id set rides ``ray.put`` once and a streaming pass
      filters it out; the documents never enter a shuffle.
    * **id-bucketed anti-join** (very high duplicate rates, where the loser
      set would blow the driver/object-store): loser marker rows and data
      rows are co-bucketed by id hash and each bucket's losers knock out
      their rows inside ``map_groups`` — the corpus pays ONE extra exchange,
      the driver never materializes an id list.

    Returns the deduplicated Dataset (all original columns).
    """
    import ray

    limit = BROADCAST_ID_WARN if broadcast_limit is None else int(broadcast_limit)

    def losers(group: pa.Table) -> pa.Table:
        g = group.sort_by([("__h", "ascending"), (id_col, "ascending")])
        h = g["__h"].to_numpy()
        dup = np.zeros(len(h), dtype=bool)
        dup[1:] = h[1:] == h[:-1]
        return pa.table({id_col: g[id_col].filter(pa.array(dup))})

    loser_ds = _hash_rows(ds, text_col, id_col, num_buckets) \
        .groupby("__b").map_groups(losers, batch_format="pyarrow").materialize()
    n_losers = loser_ds.count()
    if n_losers == 0:
        return ds

    if n_losers <= limit:
        loser_tbl = loser_ds.to_pandas()
        loser_ids = np.sort(loser_tbl[id_col].to_numpy())
        ref = ray.put(loser_ids)

        def keep(batch: pa.Table) -> pa.Table:
            l = ray.get(ref)
            ids = batch[id_col].to_numpy()
            return batch.filter(pa.array(~np.isin(ids, l)))

        return ds.map_batches(keep, batch_format="pyarrow")

    # ---- anti-join fallback: nothing ever lands on the driver ----
    schema = ds.schema().base_schema if hasattr(ds.schema(), "base_schema") \
        else ds.schema()
    fields = list(zip(schema.names, schema.types))

    def tag_data(batch: pa.Table) -> pa.Table:
        return batch \
            .append_column("__loser", pa.array(np.zeros(len(batch), np.int8))) \
            .append_column("__ab", pa.array(_id_buckets(batch[id_col],
                                                        num_buckets)))

    def tag_loser(batch: pa.Table) -> pa.Table:
        cols = {name: (batch[id_col] if name == id_col
                       else pa.nulls(len(batch), typ))
                for name, typ in fields}
        t = pa.table(cols)
        return t \
            .append_column("__loser", pa.array(np.ones(len(batch), np.int8))) \
            .append_column("__ab", pa.array(_id_buckets(batch[id_col],
                                                        num_buckets)))

    def resolve(group: pa.Table) -> pa.Table:
        is_loser = pc.equal(group["__loser"], 1)
        loser_ids = group.filter(is_loser)[id_col].to_numpy(zero_copy_only=False)
        data = group.filter(pc.invert(is_loser))
        ids = data[id_col].to_numpy(zero_copy_only=False)
        return data.filter(pa.array(~np.isin(ids, loser_ids))) \
                   .drop_columns(["__loser", "__ab"])

    tagged = ds.map_batches(tag_data, batch_format="pyarrow") \
        .union(loser_ds.map_batches(tag_loser, batch_format="pyarrow"))
    return tagged.groupby("__ab").map_groups(resolve, batch_format="pyarrow")


# ---------------- line-level (CCNet-style) exact dedup ----------------

def _explode_lines(batch: pa.Table, text_col: str, id_col: str, sep: str):
    """Vectorized explosion of a batch's text column into lines.

    Returns ``(ids, line_no, flat, counts)``: per-line doc ids (numpy),
    0-based per-doc line numbers (numpy int64), the flat Arrow string array
    of lines, and per-doc line counts (numpy int64). All Arrow kernels —
    no per-line Python.
    """
    la = pc.split_pattern(batch[text_col], pattern=sep)
    la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
    counts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = la.flatten()
    ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), counts)
    line_no = _concat_ranges(np.zeros(len(counts), np.int64), counts)
    return ids, line_no, flat, counts


def _pair_keys(ids: np.ndarray, line_no: np.ndarray) -> np.ndarray:
    """Type-agnostic, collision-free composite (id, line_no) membership key
    as numpy unicode rows — vectorized, no per-element Python."""
    i = ids.astype("U")
    n = line_no.astype("U")
    return np.char.add(np.char.add(i, "\x00"), n)


def line_dedup(ds, text_col: str, id_col: str, sep: str = "\n",
               min_chars: int = 1, num_buckets: int = 64,
               broadcast_limit: int | None = None, drop_empty: bool = True):
    """CCNet-style line/paragraph-level exact dedup across the whole corpus.

    Every line (text split on ``sep``) of at least ``min_chars`` characters is
    a dedup candidate; the globally FIRST occurrence — ordered by
    ``(id, line_no)`` — is kept, every later identical line anywhere in the
    corpus is removed; docs are reassembled with ``sep`` and docs whose
    remaining text is empty are dropped (``drop_empty``). This is the
    boilerplate-removal pass of CCNet/RefinedWeb-style web pipelines (cookie
    banners, nav bars, copyright footers repeat across pages); the reference
    engine has no corpus-level dedup (SURVEY.md §2.6) — extension.

    100 TB shape: stage 1 shuffles only narrow ``(line-hash, id, line_no)``
    rows — the documents never enter the loser exchange; stage 2 resolves
    losers per hash bucket with one vectorized sort; stage 3 removes loser
    lines either by a single broadcast of the loser pairs (small loser sets)
    or, above ``broadcast_limit``, by an id-bucketed anti-join where full doc
    rows move exactly once (dup *lines* are the COMMON case on boilerplate-
    heavy web corpora, so unlike :func:`exact_dedup` the fallback here is not
    a pathology path). Lines shorter than ``min_chars`` (e.g. empty lines)
    never shuffle and are always kept.
    """
    import ray

    limit = BROADCAST_ID_WARN if broadcast_limit is None else int(broadcast_limit)

    def hash_lines(batch: pa.Table) -> pa.Table:
        ids, line_no, flat, _ = _explode_lines(batch, text_col, id_col, sep)
        keep = pc.greater_equal(pc.utf8_length(flat), min_chars).to_numpy(
            zero_copy_only=False)
        h = _content_hash(flat.to_numpy(zero_copy_only=False)[keep])
        return pa.table({
            "__h": pa.array(h, pa.int64()),
            id_col: pa.array(ids[keep]).cast(batch[id_col].type),
            "__ln": pa.array(line_no[keep], pa.int64()),
            "__b": pa.array((h % num_buckets).astype(np.int32)),
        })

    def losers(group: pa.Table) -> pa.Table:
        g = group.sort_by([("__h", "ascending"), (id_col, "ascending"),
                           ("__ln", "ascending")])
        h = g["__h"].to_numpy()
        dup = np.zeros(len(h), dtype=bool)
        dup[1:] = h[1:] == h[:-1]
        m = pa.array(dup)
        return pa.table({id_col: g[id_col].filter(m),
                         "__ln": g["__ln"].filter(m)})

    loser_ds = ds.map_batches(hash_lines, batch_format="pyarrow") \
        .groupby("__b").map_groups(losers, batch_format="pyarrow").materialize()
    n_losers = loser_ds.count()

    def _strip(batch: pa.Table, loser_keys: np.ndarray) -> pa.Table:
        ids, line_no, flat, counts = _explode_lines(batch, text_col, id_col, sep)
        if len(loser_keys) and len(ids):
            drop = np.isin(_pair_keys(ids, line_no), loser_keys)
        else:
            drop = np.zeros(len(ids), dtype=bool)
        kept = ~drop
        row_idx = np.repeat(np.arange(len(batch)), counts)[kept]
        lk = flat.to_numpy(zero_copy_only=False)[kept]
        bounds = np.searchsorted(row_idx, np.arange(len(batch) + 1))
        # per-ROW join of its kept lines (O(rows) Python; the line-level work
        # above is all Arrow/numpy)
        new_texts = [sep.join(lk[bounds[r]:bounds[r + 1]])
                     for r in range(len(batch))]
        out = batch.set_column(batch.schema.get_field_index(text_col), text_col,
                               pa.array(new_texts, pa.string()))
        if drop_empty:
            out = out.filter(pc.not_equal(pc.utf8_trim_whitespace(
                out[text_col]), ""))
        return out

    if n_losers == 0:
        return ds
    if n_losers <= limit:
        lt = loser_ds.to_pandas()
        keys = np.sort(_pair_keys(lt[id_col].to_numpy(),
                                  lt["__ln"].to_numpy()))
        ref = ray.put(keys)

        def strip_bcast(batch: pa.Table) -> pa.Table:
            return _strip(batch, ray.get(ref))

        return ds.map_batches(strip_bcast, batch_format="pyarrow")

    # ---- id-bucketed anti-join: doc rows and loser pairs co-bucketed ----
    schema = ds.schema().base_schema if hasattr(ds.schema(), "base_schema") \
        else ds.schema()
    fields = list(zip(schema.names, schema.types))

    def tag_data(batch: pa.Table) -> pa.Table:
        return batch \
            .append_column("__ln", pa.nulls(len(batch), pa.int64())) \
            .append_column("__loser", pa.array(np.zeros(len(batch), np.int8))) \
            .append_column("__ab", pa.array(_id_buckets(batch[id_col],
                                                        num_buckets)))

    def tag_loser(batch: pa.Table) -> pa.Table:
        cols = {name: (batch[id_col] if name == id_col
                       else pa.nulls(len(batch), typ))
                for name, typ in fields}
        t = pa.table(cols)
        return t \
            .append_column("__ln", batch["__ln"]) \
            .append_column("__loser", pa.array(np.ones(len(batch), np.int8))) \
            .append_column("__ab", pa.array(_id_buckets(batch[id_col],
                                                        num_buckets)))

    def resolve(group: pa.Table) -> pa.Table:
        is_loser = pc.equal(group["__loser"], 1)
        lt = group.filter(is_loser)
        keys = np.sort(_pair_keys(lt[id_col].to_numpy(zero_copy_only=False),
                                  lt["__ln"].to_numpy()))
        data = group.filter(pc.invert(is_loser)) \
                    .drop_columns(["__ln", "__loser", "__ab"])
        return _strip(data, keys)

    tagged = ds.map_batches(tag_data, batch_format="pyarrow") \
        .union(loser_ds.map_batches(tag_loser, batch_format="pyarrow"))
    return tagged.groupby("__ab").map_groups(resolve, batch_format="pyarrow")


# ---------------- MinHash + LSH near-dup ----------------

def _word_shingles(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def minhash_perm_params(num_perm: int, seed: int = 7,
                        hash_fn: str = "murmur3") -> tuple[np.ndarray, np.ndarray]:
    """The (a_j, b_j) universal-hash family. For hash_fn="poly", a_j < 2^31 so
    a_j·h + b_j is exact in uint64 (and HUGEINT on the SQL side)."""
    rng = np.random.default_rng(seed)
    if hash_fn == "poly":
        a = rng.integers(1, 2 ** 31, size=num_perm, dtype=np.int64)
    else:
        a = rng.integers(1, _M61, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _M61, size=num_perm, dtype=np.int64)
    return a, b


def _concat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenation of arange(s, s+c) for each (s, c) — vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    rep = np.repeat(starts - np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    return rep + np.arange(total, dtype=np.int64)


def _poly_shingle_hashes(texts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat shingle hashes < 2^32 as uint64, per-doc offsets) for hash_fn="poly".

    token hash = Horner(31, codepoints) mod 2^32; shingle hash = Horner(1000003)
    over the k token hashes, mod 2^64 during the fold, reduced mod 2^32 at the end.
    Docs with 0 < n_tok < k contribute a single shingle (fold of all their tokens),
    matching ``_word_shingles``'s join-all fallback; the SQL oracle mirrors this.
    """
    all_toks: list[str] = []
    offs = [0]
    for t in texts:
        all_toks.extend(t.split())
        offs.append(len(all_toks))
    tok_offs = np.asarray(offs, dtype=np.int64)
    th = poly_hash_np(all_toks, bits=32)          # uint64 < 2^32
    n_tok = np.diff(tok_offs)
    counts = np.where(n_tok == 0, 0, np.where(n_tok < k, 1, n_tok - k + 1))
    out_offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    out = np.empty(int(counts.sum()), dtype=np.uint64)

    big = n_tok >= k
    if big.any():
        total = th.size
        if total >= k:
            g = th[: total - k + 1].copy()
            for j in range(1, k):
                g = g * _GRAM_MULT + th[j: total - k + 1 + j]
            src = _concat_ranges(tok_offs[:-1][big], counts[big])
            dst = _concat_ranges(out_offs[:-1][big], counts[big])
            out[dst] = g[src]
    small = (n_tok > 0) & (n_tok < k)
    if small.any():
        # masked iterative fold over (≤ k-1)-token docs, no per-doc Python loop
        s_starts = tok_offs[:-1][small]
        s_lens = n_tok[small]
        h = np.zeros(int(small.sum()), dtype=np.uint64)
        for i in range(int(s_lens.max())):
            act = s_lens > i
            h[act] = h[act] * _GRAM_MULT + th[s_starts[act] + i]
        out[out_offs[:-1][small]] = h
    return out & _MASK32, out_offs


def minhash_signatures(texts: np.ndarray, num_perm: int, shingle_k: int,
                       seed: int = 7, hash_fn: str = "murmur3") -> np.ndarray:
    """(n, num_perm) int64 MinHash signatures over word shingles (vectorized).

    The permutation family is (a_j·x + b_j) mod (2^61-1); per-doc minima are one
    ``np.minimum.reduceat`` over the (shingles × perms) hash matrix — no Python
    loop over documents or permutations.
    """
    n = len(texts)
    out = np.full((n, num_perm), np.iinfo(np.int64).max, dtype=np.int64)
    if n == 0:
        return out
    a, b = minhash_perm_params(num_perm, seed, hash_fn)
    if hash_fn == "poly":
        base, offs = _poly_shingle_hashes(texts, shingle_k)
        if base.size == 0:
            return out
        H = ((a.astype(np.uint64)[None, :] * base[:, None]
              + b.astype(np.uint64)[None, :]) % np.uint64(_M61)).astype(np.int64)
    else:
        all_shingles: list[str] = []
        offs_l = [0]
        for t in texts:
            all_shingles.extend(_word_shingles(t.split(), shingle_k))
            offs_l.append(len(all_shingles))
        offs = np.asarray(offs_l, dtype=np.int64)
        if not all_shingles:
            return out
        base = murmur3_np(np.array(all_shingles, dtype=object)).astype(np.int64) & 0xFFFFFFFF
        # int64 wrap-around multiply then mod — identical values to the historical
        # per-permutation loop (numpy wraps deterministically)
        H = (a[None, :] * base[:, None] + b[None, :]) % _M61
    lens = np.diff(offs)
    nz = np.flatnonzero(lens > 0)
    if nz.size:
        out[nz] = np.minimum.reduceat(H, offs[:-1][nz], axis=0)
    return out


def _band_rows(ds, text_col: str, id_col: str, num_perm: int, bands: int,
               shingle_k: int, num_buckets: int, seed: int = 7,
               hash_fn: str = "murmur3"):
    """Narrow (id, band, bh, bucket) rows — the ONLY thing the LSH shuffle moves.
    The 64-lane signatures are NOT shipped (they are recomputed for the candidate
    ids only in the verification pass)."""
    rows_per_band = num_perm // bands

    def emit(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        sig = minhash_signatures(texts, num_perm, shingle_k, seed, hash_fn)
        n = len(texts)
        band_hash = np.empty((n, bands), dtype=np.int64)
        for bnd in range(bands):
            seg = sig[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.int64)
            for c in range(rows_per_band):
                h = (h * np.int64(1000003) + seg[:, c]) % _M61
            band_hash[:, bnd] = h
        out_hash = band_hash.reshape(-1)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table({
            "id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bh": pa.array(out_hash, pa.int64()),
            "__b": pa.array(((out_hash + out_band) % num_buckets).astype(np.int32)),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def _verify_pairs_incluster(ds, pairs_ds, id_col, payload_fn, payload_type,
                            compare_fn, num_buckets: int,
                            fold_min_label: bool = True):
    """Verify candidate (id, dup_of) pairs ENTIRELY in-cluster and min-label.

    Shared by the MinHash and n-gram-Jaccard passes: ``payload_fn(batch, mask)``
    computes each selected doc's comparison payload (a signature vector / a
    sorted shingle-hash set) as a ``payload_type`` arrow array, and
    ``compare_fn(xs, ys)`` returns the boolean keep-mask over aligned payload
    pairs. Payloads are recomputed for candidate ids only, attached to each
    pair's endpoints in an id-bucketed group pass, and compared in a
    pair-bucketed group pass — no payload matrix ever materializes on the
    driver (a 30–50 %-dup corpus at 100 TB would make that set corpus-scale).
    The driver holds only the UNIQUE candidate id array (8 bytes/id, broadcast
    once for the recompute filter) and streams the verified (id, dup_of)
    output. Each verified duplicate maps to the smallest anchor it matched
    ("min-label", one round — transitively-chained near-dups beyond one hop
    are kept, documented).
    """
    import ray
    import ray.data

    empty = pa.table({"id": pa.array([], pa.int64()),
                      "dup_of": pa.array([], pa.int64())})

    # distributed unique of candidate ids; the driver keeps ONLY this id array
    need_ds = pairs_ds.map_batches(
        lambda b: pa.table({"cid": pa.concat_arrays(
            [b["id"].combine_chunks(), b["dup_of"].combine_chunks()])}),
        batch_format="pyarrow")
    need = np.sort(np.asarray(need_ds.unique("cid"), dtype=np.int64))
    ref = ray.put(need)

    u_schema = pa.schema([("kb", pa.int32()), ("cid", pa.int64()),
                          ("id", pa.int64()), ("dup_of", pa.int64()),
                          ("side", pa.int8()), ("pl", payload_type)])

    def pl_rows(batch: pa.Table) -> pa.Table:
        """(kb, cid, pl) rows for this batch's candidate docs (tagged side=-1)."""
        cand = ray.get(ref)
        ids = batch[id_col].to_numpy()
        m = ids.size and np.isin(ids, cand)
        if not np.any(m):
            return u_schema.empty_table()
        cids = ids[m]
        n = cids.size
        return pa.table({
            "kb": pa.array((cids % num_buckets).astype(np.int32)),
            "cid": pa.array(cids, pa.int64()),
            "id": pa.array(np.zeros(n, np.int64)),
            "dup_of": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.full(n, -1, np.int8)),
            "pl": payload_fn(batch, m),
        })

    def request_rows(batch: pa.Table) -> pa.Table:
        """Two (kb, cid, id, dup_of, side) rows per candidate pair — routed to
        each endpoint's id bucket to pick up that endpoint's payload."""
        ids = batch["id"].to_numpy()
        dups = batch["dup_of"].to_numpy()
        cid = np.concatenate([ids, dups])
        n = ids.size
        return pa.table({
            "kb": pa.array((cid % num_buckets).astype(np.int32)),
            "cid": pa.array(cid, pa.int64()),
            "id": pa.array(np.concatenate([ids, ids]), pa.int64()),
            "dup_of": pa.array(np.concatenate([dups, dups]), pa.int64()),
            "side": pa.array(np.concatenate([np.zeros(n, np.int8),
                                             np.ones(n, np.int8)])),
            "pl": pa.array([None] * (2 * n), payload_type),
        })

    tagged = ds.map_batches(pl_rows, batch_format="pyarrow").union(
        pairs_ds.map_batches(request_rows, batch_format="pyarrow"))

    def attach(group: pa.Table) -> pa.Table:
        """id-bucket group: give every request row its endpoint's payload and
        re-key it by the PAIR's bucket for the compare pass."""
        side = group["side"].to_numpy()
        is_pl = side == -1
        pl_rows_t = group.filter(pa.array(is_pl))
        req = group.filter(pa.array(~is_pl))
        if len(req) == 0:
            return u_schema.empty_table()
        scid = pl_rows_t["cid"].to_numpy()
        order = np.argsort(scid)
        scid = scid[order]
        pls = pl_rows_t["pl"].take(pa.array(order))
        rcid = req["cid"].to_numpy()
        loc = np.searchsorted(scid, rcid)
        ok = loc < scid.size
        ok[ok] &= scid[loc[ok]] == rcid[ok]
        req = req.filter(pa.array(ok))          # drop requests with no payload
        loc = loc[ok]
        rid = req["id"].to_numpy()
        rdup = req["dup_of"].to_numpy()
        pb = ((rid * np.int64(1000003) + rdup) % num_buckets).astype(np.int32)
        return pa.table({
            "kb": pa.array(pb),
            "cid": req["cid"],
            "id": req["id"],
            "dup_of": req["dup_of"],
            "side": req["side"],
            "pl": pls.take(pa.array(loc)),
        })

    def verify(group: pa.Table) -> pa.Table:
        """pair-bucket group: both endpoints' payloads of each pair are here;
        compare vectorized and emit surviving (id, dup_of)."""
        df = group.to_pandas().drop_duplicates(subset=["id", "dup_of", "side"])
        s0 = df[df["side"] == 0][["id", "dup_of", "pl"]]
        s1 = df[df["side"] == 1][["id", "dup_of", "pl"]]
        merged = s0.merge(s1, on=["id", "dup_of"])
        if not len(merged):
            return empty
        keep = merged[compare_fn(merged["pl_x"], merged["pl_y"])]
        return pa.table({"id": pa.array(keep["id"].to_numpy(), pa.int64()),
                         "dup_of": pa.array(keep["dup_of"].to_numpy(), pa.int64())})

    verified = tagged.groupby("kb").map_groups(attach, batch_format="pyarrow") \
        .groupby("kb").map_groups(verify, batch_format="pyarrow")
    if not fold_min_label:
        # raw verified pairs (id > dup_of), e.g. for connected-components
        # clustering; schema kept stable through the typed-empty union
        return ray.data.from_arrow(empty).union(verified)

    def min_label(group: pa.Table) -> pa.Table:
        """per-id smallest verified anchor (in-cluster fold, id-bucketed)."""
        g = group.sort_by([("id", "ascending"), ("dup_of", "ascending")])
        ids = g["id"].to_numpy()
        if ids.size == 0:
            return empty
        first = np.zeros(ids.size, dtype=bool)
        first[0] = True
        first[1:] = ids[1:] != ids[:-1]
        return pa.table({"id": pa.array(ids[first], pa.int64()),
                         "dup_of": g["dup_of"].filter(pa.array(first))})

    labeled = verified.map_batches(
        lambda b: b.append_column(
            "__b", pa.array((b["id"].to_numpy() % num_buckets).astype(np.int32))),
        batch_format="pyarrow") \
        .groupby("__b").map_groups(min_label, batch_format="pyarrow")
    # an all-rejected candidate set yields zero blocks (schema-less); the union
    # with a typed empty table keeps the (id, dup_of) schema stable for consumers
    return ray.data.from_arrow(empty).union(labeled)


def minhash_lsh_dedup(ds, text_col: str, id_col: str, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3, jaccard: float = 0.8,
                      num_buckets: int = 64, seed: int = 7,
                      hash_fn: str = "murmur3"):
    """MinHash+LSH near-duplicate detection — narrow shuffles end-to-end.

    Pass 1 shuffles (id, band, band_hash) rows only; each hash bucket resolves
    its (band, bh) groups vectorized and emits candidate pairs
    (id, anchor=min id of the group). Pass 2 verifies estimated Jaccard
    (signature agreement rate ≥ ``jaccard``) ENTIRELY in-cluster via the
    shared ``_verify_pairs_incluster`` pass — signatures are recomputed for
    candidate ids only and never materialize on the driver.

    Returns a Dataset of (id, dup_of) rows for ids that should be dropped.
    """
    import ray
    import ray.data

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        g = group.sort_by([("band", "ascending"), ("bh", "ascending"),
                           ("id", "ascending")])
        band = g["band"].to_numpy()
        bh = g["bh"].to_numpy()
        ids = g["id"].to_numpy()
        if len(ids) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64())})
        new = np.empty(len(ids), dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        grp = np.cumsum(new) - 1
        anchors = ids[new][grp]
        mask = ids != anchors
        return pa.table({"id": pa.array(ids[mask], pa.int64()),
                         "dup_of": pa.array(anchors[mask], pa.int64())})

    pairs_ds = _band_rows(ds, text_col, id_col, num_perm, bands, shingle_k,
                          num_buckets, seed, hash_fn) \
        .groupby("__b").map_groups(pairs_in_bucket, batch_format="pyarrow")
    pairs_ds = pairs_ds.materialize()   # consumed twice (requests + verify)

    empty = pa.table({"id": pa.array([], pa.int64()),
                      "dup_of": pa.array([], pa.int64())})
    if pairs_ds.count() == 0:
        return ray.data.from_arrow(empty)

    sig_t = pa.list_(pa.int64(), num_perm)

    def payload(batch: pa.Table, m: np.ndarray) -> pa.Array:
        texts = batch[text_col].to_numpy(zero_copy_only=False)[m]
        sig = minhash_signatures(texts, num_perm, shingle_k, seed, hash_fn)
        return pa.array(list(sig), sig_t)

    def compare(xs, ys) -> np.ndarray:
        A = np.stack([np.asarray(s) for s in xs])
        B = np.stack([np.asarray(s) for s in ys])
        return (A == B).mean(axis=1) >= jaccard

    return _verify_pairs_incluster(ds, pairs_ds, id_col, payload, sig_t,
                                   compare, num_buckets)


# ---------------- SimHash ----------------

def simhash_values(texts: np.ndarray, seed: int = 0) -> np.ndarray:
    """64-bit SimHash per text over whitespace tokens (uint64), vectorized."""
    out = np.zeros(len(texts), dtype=np.uint64)
    all_toks: list[str] = []
    offsets = [0]
    for t in texts:
        toks = t.split()
        all_toks.extend(toks)
        offsets.append(len(all_toks))
    if not all_toks:
        return out
    h32a = murmur3_np(np.array(all_toks, dtype=object)).astype(np.int64) & 0xFFFFFFFF
    h32b = murmur3_np(np.array([t + "\x02" for t in all_toks], dtype=object)).astype(np.int64) & 0xFFFFFFFF
    h64 = ((h32a << 32) | h32b).astype(np.uint64)
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    contrib = bits * 2 - 1  # +1 / -1 per bit
    for i in range(len(texts)):
        lo, hi = offsets[i], offsets[i + 1]
        if hi > lo:
            v = contrib[lo:hi].sum(axis=0)
            bits = (v > 0).astype(np.uint64)
            out[i] = (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    return out


def simhash_dedup(ds, text_col: str, id_col: str, num_buckets: int = 64):
    """Near-dup by identical 64-bit SimHash (keep smallest id per hash).
    The shuffle carries (id, simhash) rows only."""

    def add(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        h = simhash_values(texts).astype(np.int64)
        return pa.table({
            "id": batch[id_col],
            "simhash": pa.array(h, pa.int64()),
            "__b": pa.array((h % num_buckets).astype(np.int32)),
        })

    def resolve(group: pa.Table) -> pa.Table:
        g = group.sort_by([("simhash", "ascending"), ("id", "ascending")])
        h = g["simhash"].to_numpy()
        dup = np.zeros(len(h), dtype=bool)
        dup[1:] = h[1:] == h[:-1]
        return g.filter(pa.array(dup)).drop_columns(["__b"])

    return ds.map_batches(add, batch_format="pyarrow") \
             .groupby("__b").map_groups(resolve, batch_format="pyarrow")


# ---------------- n-gram Jaccard ----------------

def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity of two texts (verification kernel)."""
    sa = set(_word_shingles(a.split(), n))
    sb = set(_word_shingles(b.split(), n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _distinct_shingles(texts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-DISTINCT poly shingle hashes: (flat uint64 < 2^32, offsets).

    Sorted ascending within each doc (the global hash order the prefix filter
    indexes by); duplicates within a doc removed — Jaccard is a set measure.
    """
    flat, offs = _poly_shingle_hashes(texts, k)
    n = offs.size - 1
    counts = np.diff(offs)
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((flat, doc))
    f, d = flat[order], doc[order]
    keep = np.ones(f.size, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
    f, d = f[keep], d[keep]
    new_offs = np.concatenate(
        [[0], np.cumsum(np.bincount(d, minlength=n))]).astype(np.int64)
    return f, new_offs


def _prefix_select(flat: np.ndarray, offs: np.ndarray, sizes: np.ndarray,
                   plen: np.ndarray, df_sketch: np.ndarray | None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc prefix shingles: the ``plen[d]`` smallest of doc d's sorted
    distinct shingles under the global order — (approx df asc, hash asc) when
    a df sketch is given (rarest-first, hot shingles pushed out of prefixes),
    plain hash order otherwise. Returns (shingles int64, doc indices)."""
    n = sizes.size
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), sizes)
    if df_sketch is not None:
        dfv = df_sketch[(flat % df_sketch.size).astype(np.int64)]
        # primary key doc_rep is already sorted, so the permutation stays
        # within each doc's block: doc_rep[order] == doc_rep
        order = np.lexsort((flat, dfv, doc_rep))
        sel = flat[order]
    else:
        sel = flat           # doc-grouped, hash-ascending (legacy order)
    rank = np.arange(flat.size, dtype=np.int64) - np.repeat(offs[:-1], sizes)
    mask = rank < np.repeat(plen, sizes)
    return sel[mask].astype(np.int64), doc_rep[mask]


def ngram_jaccard_dedup(ds, text_col: str, id_col: str, threshold: float = 0.6,
                        shingle_k: int = 3, num_buckets: int = 64,
                        df_order: bool = True,
                        df_sketch_cells: int = 1 << 20,
                        return_pairs: bool = False):
    """EXACT n-gram-Jaccard near-dup join via prefix filtering (PPJoin-family).

    Unlike the MinHash/SimHash sketches this operator has recall 1.0 at any
    threshold: the result links every doc i to
    ``dup_of = min{j < i : J(S_i, S_j) >= threshold}`` where S is the doc's
    DISTINCT word-``shingle_k``-gram poly-hash set (docs with empty texts never
    match) — a canonical, order-independent definition a SQL oracle can
    replicate brute-force.

    Ray-Data-first stages, all narrow:

    1. **df sketch** (``df_order=True``, default): one map_batches sweep folds
       per-batch shingle counts into a FIXED-width cell array
       (``df_sketch_cells`` × int64 ≈ 8 MB at the default — bounded at any
       corpus size, broadcast once via ``ray.put``). The prefix order becomes
       (approx_df asc, hash asc) — RAREST FIRST. The prefix-filter theorem
       holds for ANY fixed total order, so correctness is unchanged; what
       changes is that a boilerplate shingle shared by d docs sorts LAST and
       is excluded from every prefix that has rarer shingles to offer,
       collapsing the classic O(d²) hot-shingle candidate blowup (sketch
       collisions merely misorder a few shingles — recall stays 1.0).
    2. **prefix emission** (`map_batches`): each doc ships only its PREFIX
       shingles — the ``|S| - ceil(threshold·|S|) + 1`` smallest under the
       global order. The prefix-filter theorem (Chaudhuri et al.,
       SSJoin/PPJoin) guarantees any pair with J ≥ threshold shares a prefix
       shingle on BOTH sides, so candidate generation is complete; the shuffle
       moves (shingle, id, set_size) rows, never documents or full sets.
    3. **candidate pairs** per shingle inside hash-bucketed ``map_groups``,
       with the length filter ``|S_small| ≥ threshold·|S_large|`` (a J ≥ t
       pair cannot differ more in size).
    4. **exact verification** fully in-cluster via the shared
       ``_verify_pairs_incluster`` pass: each candidate id's sorted distinct
       shingle set is attached id-bucketed and pairs are intersected
       (sorted-array ``np.intersect1d``) pair-bucketed; the driver holds only
       the candidate id array.

    Returns a Dataset of (id, dup_of) rows for ids that should be dropped —
    or, with ``return_pairs=True``, ALL verified pairs (id > dup_of, no
    min-label fold), e.g. as the edge list for
    :func:`ops.components.connected_components`.
    """
    import ray
    import ray.data

    empty = pa.table({"id": pa.array([], pa.int64()),
                      "dup_of": pa.array([], pa.int64())})

    sketch_ref = None
    if df_order:
        cells = int(df_sketch_cells)

        def sketch_partial(batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_numpy(zero_copy_only=False)
            flat, _ = _distinct_shingles(texts, shingle_k)
            cnt = np.bincount((flat % cells).astype(np.int64))
            nz = np.flatnonzero(cnt)
            return pa.table({"cell": pa.array(nz, pa.int64()),
                             "cnt": pa.array(cnt[nz], pa.int64())})

        sketch = np.zeros(cells, dtype=np.int64)
        for b in ds.map_batches(sketch_partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            np.add.at(sketch, b["cell"].to_numpy(), b["cnt"].to_numpy())
        sketch_ref = ray.put(sketch)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy()
        flat, offs = _distinct_shingles(texts, shingle_k)
        sizes = np.diff(offs)
        # conservative real-number ceil: float error must never SHORTEN the
        # prefix (completeness) — shaving 1e-9 before ceil keeps exact-integer
        # products (0.6·5 = 3.0000000000000004 in doubles) at their true ceil
        alpha = np.ceil(threshold * sizes - 1e-9)
        plen = np.minimum(np.maximum(sizes - alpha + 1, 0), sizes).astype(np.int64)
        if not (plen > 0).any():
            return pa.table({"sh": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "sz": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int32())})
        sk = ray.get(sketch_ref) if sketch_ref is not None else None
        out_sh, out_doc = _prefix_select(flat, offs, sizes, plen, sk)
        return pa.table({
            "sh": pa.array(out_sh),
            "id": pa.array(ids[out_doc], pa.int64()),
            "sz": pa.array(sizes[out_doc].astype(np.int64)),
            "__b": pa.array((out_sh % num_buckets).astype(np.int32)),
        })

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        g = group.sort_by([("sh", "ascending"), ("id", "ascending")])
        sh = g["sh"].to_numpy()
        ids = g["id"].to_numpy()
        sz = g["sz"].to_numpy()
        if ids.size == 0:
            return empty
        new = np.empty(ids.size, dtype=bool)
        new[0] = True
        new[1:] = sh[1:] != sh[:-1]
        seg_start = np.flatnonzero(new)[np.cumsum(new) - 1]
        rank = np.arange(ids.size) - seg_start    # rows before me in my segment
        em = rank > 0
        if not em.any():
            return empty
        li = np.repeat(np.flatnonzero(em), rank[em])
        ri = _concat_ranges(seg_start[em], rank[em])
        a, b = ids[li], ids[ri]                   # a > b (id-sorted segments)
        small = np.minimum(sz[li], sz[ri])
        big = np.maximum(sz[li], sz[ri])
        ok = small >= threshold * big - 1e-9      # length filter (prune-only)
        pairs = np.unique(np.stack([a[ok], b[ok]], axis=1), axis=0)
        return pa.table({"id": pa.array(pairs[:, 0], pa.int64()),
                         "dup_of": pa.array(pairs[:, 1], pa.int64())})

    pairs_ds = ds.map_batches(prefix_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(pairs_in_bucket, batch_format="pyarrow")
    pairs_ds = pairs_ds.materialize()   # consumed twice (requests + cid unique)
    if pairs_ds.count() == 0:
        return ray.data.from_arrow(empty)

    set_t = pa.list_(pa.int64())

    def payload(batch: pa.Table, m: np.ndarray) -> pa.Array:
        texts = batch[text_col].to_numpy(zero_copy_only=False)[m]
        flat, offs = _distinct_shingles(texts, shingle_k)
        return pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat.astype(np.int64)))

    def compare(xs, ys) -> np.ndarray:
        out = np.empty(len(xs), dtype=bool)
        for i, (x, y) in enumerate(zip(xs, ys)):
            A = np.asarray(x, dtype=np.int64)
            B = np.asarray(y, dtype=np.int64)
            inter = np.intersect1d(A, B, assume_unique=True).size
            union = A.size + B.size - inter
            out[i] = union > 0 and inter / union >= threshold
        return out

    return _verify_pairs_incluster(ds, pairs_ds, id_col, payload, set_t,
                                   compare, num_buckets,
                                   fold_min_label=not return_pairs)


# ---------------- embedding cosine near-dup ----------------

def embedding_dedup(ds, emb_col: str, id_col: str, threshold: float = 0.98,
                    num_planes: int = 12, seed: int = 11, num_buckets: int = 64,
                    dim: int | None = None):
    """Near-dup by embedding cosine ≥ threshold within random-hyperplane LSH buckets.

    map_batches: sign-sketch each embedding with ``num_planes`` random hyperplanes →
    (sketch, id, vec); groupby(sketch bucket): exact pairwise cosine within bucket
    (buckets are small by construction), emit (id, dup_of=argmax-similarity smaller
    id). Pairs in different sketch buckets are missed with probability
    (1-θ/π)^planes — documented recall/cost dial. ``num_planes=0`` puts everything
    in one bucket: exact (recall 1.0), used by the oracle-checked gate config.
    """

    def emit(batch: pa.Table) -> pa.Table:
        col = batch[emb_col].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        d = flat.size // n if n else (dim or 0)
        mat = flat.reshape(n, d)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, num_planes))
        signs = (mat @ planes) > 0
        sk = np.zeros(n, dtype=np.int64)
        for j in range(num_planes):
            sk = sk * 2 + signs[:, j]
        return pa.table({
            "id": batch[id_col],
            "sketch": pa.array(sk, pa.int64()),
            "emb": col.cast(pa.list_(pa.float32())),
            "__b": pa.array((sk % num_buckets).astype(np.int32)),
        })

    def resolve(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = group.to_pandas()
        out_id, out_dup = [], []
        for _, g in df.groupby("sketch"):
            if len(g) < 2:
                continue
            g = g.sort_values("id")
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["emb"]])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
            sim = mat @ mat.T
            ids = g["id"].to_numpy()
            for i in range(1, len(ids)):
                j = np.argmax(sim[i, :i])
                if sim[i, j] >= threshold:
                    out_id.append(int(ids[i]))
                    out_dup.append(int(ids[j]))
        return pa.table({"id": pa.array(out_id, pa.int64()),
                         "dup_of": pa.array(out_dup, pa.int64())})

    return ds.map_batches(emit, batch_format="pyarrow") \
             .groupby("__b").map_groups(resolve, batch_format="pyarrow")
