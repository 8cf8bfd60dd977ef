"""Posting-list construction kernels.

Two stages, both fully vectorized:

* ``emit_runs`` — the ``map_batches`` combiner. One input batch (a doc_id-sorted slice
  of a docstore partition) becomes one row per (field, term, bucket): a compressed
  posting *run* (docID-delta varint + varint tfs + raw norm bytes). This is the
  pre-aggregation that keeps the term shuffle small: the groupby moves ~|vocab|×|blocks|
  compact runs instead of one row per posting (SURVEY.md §4.2).

* ``merge_runs`` — the ``groupby(range_part).map_groups`` merge. Runs of the same
  (field, term, bucket) are disjoint, ordered doc_id ranges (batches are contiguous
  slices of doc_id-sorted files), so the merge is a validated concatenation: decode all
  runs in one vectorized pass, re-encode per merged posting, attach per-block
  (first_doc, max_tf, min_norm) metadata for block-max WAND.

Terms are routed to output partitions by *range* (``np.searchsorted`` over sampled,
byte-balanced boundaries) — the skew-rebalancing: a stopword-scale term lands in a
partition sized by its posting bytes, not its term count (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions import codec
from byzer_retrieval_ray.functions.tokenize import term_frequencies

RUN_SCHEMA = pa.schema([
    ("range_part", pa.int32()),
    ("field", pa.string()),
    ("term", pa.large_string()),
    ("bucket", pa.int32()),
    ("min_doc", pa.int64()),
    ("df", pa.int64()),
    ("ttf", pa.int64()),
    ("doc_bytes", pa.large_binary()),
    ("tf_bytes", pa.large_binary()),
    ("norm_bytes", pa.large_binary()),
    ("pos_bytes", pa.large_binary()),     # varint position deltas (reset per doc);
                                          # empty when the build has positions off
])

POSTING_SCHEMA = pa.schema([
    ("bucket", pa.int32()),
    ("field", pa.string()),
    ("term", pa.large_string()),
    ("df", pa.int64()),
    ("ttf", pa.int64()),
    ("doc_bytes", pa.large_binary()),
    ("tf_bytes", pa.large_binary()),
    ("norm_bytes", pa.large_binary()),
    ("pos_bytes", pa.large_binary()),
    ("block_first", pa.list_(pa.int64())),
    ("block_max_tf", pa.list_(pa.int64())),
    ("block_min_norm", pa.list_(pa.uint8())),
])


def bucket_of(doc_ids: np.ndarray, bucket_spec: dict) -> np.ndarray:
    """Doc→serving-bucket assignment.

    stride mode: synthetic ids doc_id = part << bits | rank → part = id >> bits.
    mod mode: user-supplied long ids → part = id % parts (reference Utils.route
    semantics for long ids, Utils.java:137-141).
    ``group`` (default 1) folds ``group`` consecutive doc PARTITIONS into one
    serving bucket — build-side partition count (chosen for task balance) is
    decoupled from the posting-row bucket fan-out the serving side pays for.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    if bucket_spec["mode"] == "stride":
        # mask off the delta-generation namespace bits (build.GEN_SHIFT)
        part = (d >> bucket_spec["bits"]) & 0x3FFF
    else:
        part = d % bucket_spec["parts"]
    return (part // bucket_spec.get("group", 1)).astype(np.int32)


def route_terms(terms: np.ndarray, boundaries: list[str]) -> np.ndarray:
    """range_part of each term: index of the boundary range containing it."""
    if not boundaries:
        return np.zeros(len(terms), dtype=np.int32)
    b = np.asarray(boundaries, dtype=object)
    return np.searchsorted(b, terms, side="right").astype(np.int32)


def emit_runs(batch: pa.Table, analyzed_fields: list[str], boundaries: list[str],
              bucket_spec: dict, positions: bool = False) -> pa.Table:
    """One batch of docstore rows → posting-run rows (the shuffle combiner).

    Single fused pass per field: tokenize (Arrow), dictionary-encode the token
    stream, one lexsort of (term_code, doc) token instances, run-length to get tfs
    and run boundaries — no hash group-by, no second sort. Run doc-gaps are encoded
    relative to the run's ``min_doc`` (stored in the row), keeping every varint
    small.

    ``positions=True`` additionally emits each occurrence's token index (Lucene
    WhitespaceAnalyzer position semantics) as delta-varints resetting per doc —
    the stable instance sort keeps occurrences in document order, so the per-
    posting position lists come out ascending for free."""
    import pyarrow.compute as pc

    doc_ids = batch["doc_id"].to_numpy()
    order = np.argsort(doc_ids, kind="stable")
    if not (np.diff(doc_ids) > 0).all():
        batch = batch.take(pa.array(order))
        doc_ids = doc_ids[order]

    out_chunks = []
    for fld in analyzed_fields:
        texts = batch[fld].combine_chunks()
        toks = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = pc.filter(flat, mask)
        parents = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            continue
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        uniq_terms = dict_arr.dictionary.to_numpy(zero_copy_only=False)

        # token instances arrive in document order (parents is non-decreasing),
        # so a STABLE argsort by the int32 term code alone yields (term, doc)
        # order — no composite int64 key, half the sort bandwidth (the emit
        # stage is the build's dominant CPU)
        order2 = np.argsort(codes, kind="stable")
        codes_s = codes[order2]
        parents_s = parents[order2]
        if positions:
            # token index within its doc (among kept tokens), then instance-sorted:
            # stable sort keeps per-(term, doc) occurrences ascending.
            # int32 throughout: positions are bounded (< 2^21, enforced at query
            # time) and the position stream is the largest per-token array in
            # this fused pass — halving its width halves the sort-gather traffic
            # of the build's dominant CPU phase
            doc_change = np.empty(parents.size, dtype=bool)
            doc_change[0] = True
            np.not_equal(parents[1:], parents[:-1], out=doc_change[1:])
            dstarts = np.flatnonzero(doc_change).astype(np.int32)
            dcounts = np.diff(np.concatenate([dstarts, [np.int32(parents.size)]]))
            tok_pos = np.arange(parents.size, dtype=np.int32) \
                - np.repeat(dstarts, dcounts)
            pos_s = tok_pos[order2]
        del order2
        # token-instance run-length → (term_code, doc) postings with tf
        inst_change = np.empty(codes_s.size, dtype=bool)
        inst_change[0] = True
        np.logical_or(codes_s[1:] != codes_s[:-1], parents_s[1:] != parents_s[:-1],
                      out=inst_change[1:])
        pstarts = np.flatnonzero(inst_change)
        del inst_change
        # tf fits int32 (≤ tokens per chunk); cumulative offsets stay int64
        tf = np.empty(pstarts.size, dtype=np.int32)
        np.subtract(pstarts[1:], pstarts[:-1], out=tf[:-1],
                    casting="unsafe")
        tf[-1] = codes_s.size - pstarts[-1]
        tdoc = doc_ids[parents_s[pstarts]]
        pcodes = codes_s[pstarts].astype(np.int64)
        buckets = bucket_of(tdoc, bucket_spec)

        norms_by_doc = batch[f"__norm_{fld}"].to_numpy().astype(np.uint8)
        norms = norms_by_doc[np.searchsorted(doc_ids, tdoc)]

        if positions:
            # per-posting position deltas (first absolute, rest gaps): reset the
            # running difference at every posting start in token space
            pos_deltas = pos_s.copy()
            pos_deltas[1:] -= pos_s[:-1]
            pos_deltas[pstarts] = pos_s[pstarts]
            tf_cum = np.concatenate([[0], np.cumsum(tf, dtype=np.int64)])

        # runs: consecutive postings sharing (term_code, bucket); postings are
        # already sorted by (term_code, doc) and bucket is monotone in doc for
        # stride ids / groups contiguously for mod ids after a secondary sort
        if bucket_spec["mode"] == "mod":
            order3 = np.lexsort((tdoc, buckets, pcodes))
            if positions:
                # gather each posting's variable-length position segment into the
                # permuted posting order
                gsrc = _concat_ranges(tf_cum[:-1][order3], tf[order3])
                pos_deltas = pos_deltas[gsrc]
                tf_cum = np.concatenate([[0], np.cumsum(tf[order3],
                                                        dtype=np.int64)])
            tdoc, pcodes, buckets = tdoc[order3], pcodes[order3], buckets[order3]
            tf, norms = tf[order3], norms[order3]
        change = np.empty(tdoc.size, dtype=bool)
        change[0] = True
        np.logical_or(pcodes[1:] != pcodes[:-1], buckets[1:] != buckets[:-1],
                      out=change[1:])
        starts = np.flatnonzero(change)
        offsets = np.concatenate([starts, [tdoc.size]])
        df = np.diff(offsets)
        min_doc = tdoc[starts]
        # gaps relative to the run's min_doc (first gap = 0) → tiny varints
        gaps = np.empty_like(tdoc)
        gaps[0] = 0
        np.subtract(tdoc[1:], tdoc[:-1], out=gaps[1:])
        gaps[starts] = 0
        if (gaps[~change] <= 0).any():
            raise ValueError("doc_ids must be strictly increasing within a run")
        doc_blobs = codec.varint_encode_segments(gaps.astype(np.uint64), offsets)
        tf_blobs = codec.varint_encode_segments(tf.astype(np.uint64), offsets)
        norm_buf = norms.tobytes()
        norm_blobs = [norm_buf[offsets[i]:offsets[i + 1]] for i in range(len(starts))]
        if positions:
            pos_blobs = codec.varint_encode_segments(pos_deltas.astype(np.uint64),
                                                     tf_cum[offsets])
        else:
            pos_blobs = [b""] * len(starts)
        ttf = np.add.reduceat(tf.astype(np.int64), starts)
        run_terms = uniq_terms[pcodes[starts]]
        out_chunks.append(pa.table({
            "range_part": pa.array(route_terms(run_terms, boundaries), pa.int32()),
            "field": pa.array([fld] * len(starts), pa.string()),
            "term": pa.array(run_terms, pa.large_string()),
            "bucket": pa.array(buckets[starts], pa.int32()),
            "min_doc": pa.array(min_doc, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "ttf": pa.array(ttf, pa.int64()),
            "doc_bytes": pa.array(doc_blobs, pa.large_binary()),
            "tf_bytes": pa.array(tf_blobs, pa.large_binary()),
            "norm_bytes": pa.array(norm_blobs, pa.large_binary()),
            "pos_bytes": pa.array(pos_blobs, pa.large_binary()),
        }))
    if not out_chunks:
        return RUN_SCHEMA.empty_table()
    return pa.concat_tables(out_chunks)


def _concat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(counts, dtype=np.int64)
    rep = np.repeat(starts - np.concatenate([[0], cum[:-1]]), counts)
    return rep + np.arange(total, dtype=np.int64)


def _concat_binary(col: pa.ChunkedArray | pa.Array) -> bytes:
    """Zero-copy concatenation of a large_binary column's values (rows are stored
    back-to-back in the data buffer after combine_chunks)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return b""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1,
                         offset=arr.offset * 8)
    data = arr.buffers()[2]
    return data[int(offs[0]):int(offs[-1])].to_pybytes()


def merge_runs(group: pa.Table, codec_name: str = "varint") -> tuple[pa.Table, pa.Table]:
    """All runs of one term-range partition → (postings table, termstats table).

    Postings rows come out bucket-major (sorted by bucket, field, term) so serving
    actors can prune parquet row groups on the bucket column; termstats aggregates
    (field, term) → global df/ttf across buckets for idf computation.
    """
    group = group.sort_by([("field", "ascending"), ("term", "ascending"),
                           ("bucket", "ascending"), ("min_doc", "ascending")])
    fields = group["field"].to_numpy(zero_copy_only=False)
    terms = group["term"].to_numpy(zero_copy_only=False)
    buckets = group["bucket"].to_numpy()
    df = group["df"].to_numpy()
    ttf = group["ttf"].to_numpy()
    n_runs = len(group)
    if n_runs == 0:
        return POSTING_SCHEMA.empty_table(), pa.schema(
            [("field", pa.string()), ("term", pa.large_string()),
             ("df", pa.int64()), ("ttf", pa.int64())]).empty_table()

    fcodes = pa.array(fields).dictionary_encode().indices.to_numpy(zero_copy_only=False)
    tcodes = pa.array(terms).dictionary_encode().indices.to_numpy(zero_copy_only=False)
    change = np.empty(n_runs, dtype=bool)
    change[0] = True
    change[1:] = ((fcodes[1:] != fcodes[:-1]) | (tcodes[1:] != tcodes[:-1])
                  | (buckets[1:] != buckets[:-1]))
    post_starts = np.flatnonzero(change)          # run index where each merged posting begins

    # decode every run in one pass (run doc-gaps are relative to the run's min_doc)
    run_offsets = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(df, out=run_offsets[1:])
    doc_cat = _concat_binary(group["doc_bytes"])
    tf_cat = _concat_binary(group["tf_bytes"])
    norm_cat = _concat_binary(group["norm_bytes"])
    gaps = codec.varint_decode(doc_cat, int(run_offsets[-1])).astype(np.int64)
    min_docs = group["min_doc"].to_numpy()
    docs = codec.delta_decode_segments(gaps, run_offsets) + np.repeat(min_docs, df)
    tfs = codec.varint_decode(tf_cat, int(run_offsets[-1])).astype(np.int64)
    norms = np.frombuffer(norm_cat, dtype=np.uint8)

    # merged posting boundaries in posting space
    post_offsets = np.concatenate([run_offsets[post_starts], [int(run_offsets[-1])]])
    # Runs of one (field, term, bucket) usually concatenate to a strictly
    # increasing doc list (stride buckets: each doc partition is a contiguous id
    # range, runs ordered by min_doc). Mod-routed doc partitions grouped into one
    # serving bucket (bucket_spec mode="mod", group>1) are residue classes whose
    # id ranges interleave — detect that and re-sort each merged posting by doc,
    # permuting tfs/norms and the per-doc position sub-streams along.
    pos_perm = None
    if docs.size:
        seg_start = np.zeros(docs.size, dtype=bool)
        seg_start[post_offsets[:-1]] = True
        if bool(((np.diff(docs) <= 0) & ~seg_start[1:]).any()):
            seg = np.repeat(np.arange(len(post_starts)), np.diff(post_offsets))
            order = np.lexsort((docs, seg))
            pos_perm = (order, tfs.copy())     # (permutation, pre-perm tfs)
            docs = docs[order]
            tfs = tfs[order]
            norms = norms[order]
    merged_gaps = codec.delta_encode_segments(docs, post_offsets)
    if codec_name == "pfor":
        doc_blobs = [codec.pfor_encode(merged_gaps[post_offsets[i]:post_offsets[i + 1]])
                     for i in range(len(post_starts))]
        tf_blobs = [codec.pfor_encode(tfs[post_offsets[i]:post_offsets[i + 1]]
                                      .astype(np.uint64))
                    for i in range(len(post_starts))]
    else:
        doc_blobs = codec.varint_encode_segments(merged_gaps, post_offsets)
        tf_blobs = codec.varint_encode_segments(tfs.astype(np.uint64), post_offsets)
    norm_buf = norms.tobytes()
    norm_blobs = [norm_buf[post_offsets[i]:post_offsets[i + 1]]
                  for i in range(len(post_starts))]
    # positions: each run's pos blob is a self-contained delta stream that resets
    # at every doc, so a merged posting's stream is just the byte concatenation of
    # its runs' blobs (runs arrive in ascending doc order) — no decode/re-encode.
    # When the postings were re-sorted (interleaved mod buckets), the per-doc
    # sub-streams must be gathered into the new order instead: decode once,
    # permute value segments, re-encode per merged posting.
    if "pos_bytes" in group.column_names and pos_perm is not None:
        order, old_tfs = pos_perm
        pos_cat = _concat_binary(group["pos_bytes"])
        if len(pos_cat):
            total = int(old_tfs.sum())
            pos_vals = codec.varint_decode(pos_cat, total).astype(np.int64)
            tf_cum_old = np.concatenate([[0], np.cumsum(old_tfs)])
            gsrc = _concat_ranges(tf_cum_old[:-1][order], old_tfs[order])
            pos_vals = pos_vals[gsrc]
            tf_cum_new = np.concatenate([[0], np.cumsum(tfs)])
            pos_blobs = codec.varint_encode_segments(
                pos_vals.astype(np.uint64), tf_cum_new[post_offsets])
        else:
            pos_blobs = [b""] * len(post_starts)
    elif "pos_bytes" in group.column_names:
        pos_col = group["pos_bytes"].combine_chunks()
        pos_cat = _concat_binary(pos_col)
        pos_byte_offs = np.frombuffer(pos_col.buffers()[1], dtype=np.int64,
                                      count=len(pos_col) + 1,
                                      offset=pos_col.offset * 8)
        base = int(pos_byte_offs[0])
        run_ends = np.concatenate([post_starts[1:], [n_runs]])
        pos_blobs = [pos_cat[int(pos_byte_offs[post_starts[i]]) - base:
                             int(pos_byte_offs[run_ends[i]]) - base]
                     for i in range(len(post_starts))]
    else:
        pos_blobs = [b""] * len(post_starts)

    n_posts = len(post_starts)
    post_df = np.diff(post_offsets)
    post_ttf = np.add.reduceat(tfs, post_offsets[:-1])
    # per-block metadata (BLOCK_SIZE postings per block, per merged posting)
    blk_first, blk_max_tf, blk_min_norm = [], [], []
    B = codec.BLOCK_SIZE
    for i in range(n_posts):
        lo, hi = int(post_offsets[i]), int(post_offsets[i + 1])
        starts_b = np.arange(lo, hi, B)
        blk_first.append(docs[starts_b])
        blk_max_tf.append(np.maximum.reduceat(tfs[lo:hi], starts_b - lo))
        blk_min_norm.append(np.minimum.reduceat(norms[lo:hi], starts_b - lo))

    postings = pa.table({
        "bucket": pa.array(buckets[post_starts], pa.int32()),
        "field": pa.array(fields[post_starts], pa.string()),
        "term": pa.array(terms[post_starts], pa.large_string()),
        "df": pa.array(post_df, pa.int64()),
        "ttf": pa.array(post_ttf, pa.int64()),
        "doc_bytes": pa.array(doc_blobs, pa.large_binary()),
        "tf_bytes": pa.array(tf_blobs, pa.large_binary()),
        "norm_bytes": pa.array(norm_blobs, pa.large_binary()),
        "pos_bytes": pa.array(pos_blobs, pa.large_binary()),
        "block_first": pa.array([x.tolist() for x in blk_first], pa.list_(pa.int64())),
        "block_max_tf": pa.array([x.tolist() for x in blk_max_tf], pa.list_(pa.int64())),
        "block_min_norm": pa.array([x.tolist() for x in blk_min_norm], pa.list_(pa.uint8())),
    }).sort_by([("bucket", "ascending"), ("field", "ascending"), ("term", "ascending")])

    # (field, term) global stats across buckets
    ft_change = np.concatenate([[True],
                                (fcodes[post_starts][1:] != fcodes[post_starts][:-1]) |
                                (tcodes[post_starts][1:] != tcodes[post_starts][:-1])])
    ft_starts = np.flatnonzero(ft_change)
    ft_ends = np.concatenate([ft_starts[1:], [n_posts]])
    term_df = np.add.reduceat(post_df, ft_starts)
    term_ttf = np.add.reduceat(post_ttf, ft_starts)
    termstats = pa.table({
        "field": pa.array(fields[post_starts][ft_starts], pa.string()),
        "term": pa.array(terms[post_starts][ft_starts], pa.large_string()),
        "df": pa.array(term_df, pa.int64()),
        "ttf": pa.array(term_ttf, pa.int64()),
    })
    del ft_ends
    return postings, termstats
