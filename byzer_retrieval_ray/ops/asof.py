"""As-of (nearest-timestamp) join — a custom operator Ray Data lacks.

For every left row, find the single right row with the same ``by`` key and the
largest ``on`` value ≤ the left's (direction="backward"; "forward" takes the
smallest ≥). The classic point-in-time lookup of event pipelines (attach the
most recent prior purchase / model snapshot / price tick to each event).

The reference engine has no joins at all (SURVEY.md §2) — extension.

100 TB shape / partitioning assumption
--------------------------------------
Both sides are hash-bucketed by the ``by`` key and each bucket is resolved in
ONE vectorized ``map_groups`` call (sort + composite-rank ``searchsorted`` —
no per-row Python). That is a single all-to-all exchange per side carrying
only the left rows + the projected right columns; the operator assumes a
bucket (all rows of its keys, both sides) fits in a worker — the same
key-partitioning assumption as ``groupby().map_groups`` itself. Skewed hot
keys should be pre-split upstream (e.g. sessionize first); ``num_buckets``
spreads ordinary skew.

Tie-breaking is deterministic: among right rows sharing the boundary ``on``
value, the one with the greatest ``tie_col`` (default: the ``on`` column
itself, i.e. arbitrary-but-stable input order is NOT used) wins — mirror the
same ``ORDER BY r.on DESC, r.tie DESC`` in SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.murmur3 import murmur3_np


def _key_buckets(col, nb: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.cast(pa.string()).to_numpy(zero_copy_only=False)
    return (murmur3_np(vals).astype(np.int64) % nb).astype(np.int32)


def _ordinal(col) -> np.ndarray:
    """Order-preserving int64 view of an ``on``/tie column (timestamps → epoch
    units, numerics as-is)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return arr.to_numpy(zero_copy_only=False)


def asof_join(left, right, on: str, by: str, right_cols: list[str],
              direction: str = "backward", tolerance: int | None = None,
              how: str = "left", suffix: str = "_r", num_buckets: int = 64,
              tie_col: str | None = None):
    """As-of join ``left`` to ``right`` on ``by`` key / ``on`` ordering column.

    ``right_cols`` are the right columns attached to each left row (renamed
    with ``suffix`` on name collisions; the right ``on`` column is attached as
    ``on + suffix`` when listed). ``tolerance`` (same units as the ordinal
    view of ``on``; µs for timestamps) nulls matches farther than that.
    ``how="left"`` keeps unmatched left rows with nulls, ``"inner"`` drops
    them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how}")
    tie = tie_col or on

    l_schema = left.schema().base_schema if hasattr(left.schema(), "base_schema") \
        else left.schema()
    l_fields = list(zip(l_schema.names, l_schema.types))
    l_names = set(l_schema.names)
    r_schema = right.schema().base_schema if hasattr(right.schema(), "base_schema") \
        else right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    for c in set(right_cols) | {on, by, tie}:
        if c not in r_types:
            raise ValueError(f"right side lacks column {c!r}")
    out_names = {c: (c + suffix if c in l_names else c) for c in right_cols}
    # internal (pre-rename) right payload column names, prefixed to never
    # collide with left columns inside the union
    r_carry = [c for c in dict.fromkeys(right_cols + [on, tie])]

    def tag_left(batch: pa.Table) -> pa.Table:
        t = batch
        for c in r_carry:
            t = t.append_column("__r_" + c, pa.nulls(len(batch), r_types[c]))
        return t \
            .append_column("__side", pa.array(np.zeros(len(batch), np.int8))) \
            .append_column("__ab", pa.array(_key_buckets(batch[by], num_buckets)))

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {name: (batch[by] if name == by else pa.nulls(len(batch), typ))
                for name, typ in l_fields}
        t = pa.table(cols)
        for c in r_carry:
            t = t.append_column("__r_" + c, batch[c])
        return t \
            .append_column("__side", pa.array(np.ones(len(batch), np.int8))) \
            .append_column("__ab", pa.array(_key_buckets(batch[by], num_buckets)))

    def resolve(group: pa.Table) -> pa.Table:
        is_r = pc.equal(group["__side"], 1)
        rt = group.filter(is_r)
        lt = group.filter(pc.invert(is_r))
        drop = ["__r_" + c for c in r_carry] + ["__side", "__ab"]
        if len(lt) == 0:
            return _empty_out(group.schema, l_fields, right_cols, out_names,
                              r_types)
        # the right side carried its `by` values through the left-schema
        # column; rebuild a plain right table for the shared kernel
        r_cols = {by: rt[by]}
        for c in r_carry:
            if c != by:
                r_cols[c] = rt["__r_" + c]
        return _asof_batch(lt.drop_columns(drop), pa.table(r_cols), on, by,
                           right_cols, direction, tolerance, how, suffix,
                           tie_col)

    tagged = left.map_batches(tag_left, batch_format="pyarrow") \
        .union(right.map_batches(tag_right, batch_format="pyarrow"))
    return tagged.groupby("__ab").map_groups(resolve, batch_format="pyarrow")


def asof_join_broadcast(left, right, on: str, by: str, right_cols: list[str],
                        direction: str = "backward",
                        tolerance: int | None = None, how: str = "left",
                        suffix: str = "_r", tie_col: str | None = None):
    """Broadcast as-of join: same semantics as :func:`asof_join`, but the
    (small) right side is materialized once, ``ray.put`` once, and every left
    batch resolves against it in a streaming ``map_batches`` — the left side
    pays ZERO shuffle. Use when the right side fits a worker heap (the
    point-in-time dim-snapshot case); the bucketed :func:`asof_join` is the
    general path."""
    import ray

    cols = list(dict.fromkeys(right_cols + [on, by, tie_col or on]))
    rt = pa.concat_tables([t.select(cols) for t in
                           ray.get(right.to_arrow_refs()) if t.num_columns])
    ref = ray.put(rt)

    def f(batch: pa.Table) -> pa.Table:
        return _asof_batch(batch, ray.get(ref), on, by, right_cols, direction,
                           tolerance, how, suffix, tie_col)

    return left.map_batches(f, batch_format="pyarrow")


def _asof_batch(lt: pa.Table, rt: pa.Table, on, by, right_cols, direction,
                tolerance, how, suffix, tie_col) -> pa.Table:
    """Single-batch as-of kernel against an in-memory right table (shared by
    the broadcast path and tests)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how}")
    tie = tie_col or on
    r_types = {n: t for n, t in zip(rt.schema.names, rt.schema.types)}
    for c in set(right_cols) | {on, by, tie}:
        if c not in r_types:
            raise ValueError(f"right side lacks column {c!r}")
    l_names = set(lt.schema.names)
    out_names = {c: (c + suffix if c in l_names else c) for c in right_cols}
    nl, nr = len(lt), len(rt)
    if nl == 0:
        out = lt
        for c in right_cols:
            out = out.append_column(out_names[c], pa.nulls(0, r_types[c]))
        return out
    l_keys = lt[by].cast(pa.string()).to_numpy(zero_copy_only=False)
    r_keys = rt[by].cast(pa.string()).to_numpy(zero_copy_only=False) \
        if nr else np.empty(0, dtype=object)
    l_on = _ordinal(lt[on])
    r_on = _ordinal(rt[on]) if nr else np.empty(0, np.int64)
    r_tie = _ordinal(rt[tie]) if nr else np.empty(0, np.int64)
    if direction == "forward":
        l_on, r_on = -l_on, -r_on

    match = np.full(nl, -1, np.int64)
    if nr:
        uniq, inv = np.unique(np.concatenate([l_keys, r_keys]),
                              return_inverse=True)
        lk, rk = inv[:nl], inv[nl:]
        order = np.lexsort((r_tie, r_on, rk))
        rk_s, ron_s = rk[order], r_on[order]
        distinct = np.unique(ron_s)
        span = np.int64(len(distinct) + 2)
        comp_r = rk_s * span + np.searchsorted(distinct, ron_s,
                                               "right").astype(np.int64)
        lq = lk * span + np.searchsorted(distinct, l_on,
                                         "right").astype(np.int64)
        pos = np.searchsorted(comp_r, lq, "right") - 1
        ok = pos >= 0
        ok[ok] &= rk_s[pos[ok]] == lk[ok]
        match[ok] = order[pos[ok]]
    if tolerance is not None and nr:
        m = match >= 0
        far = np.zeros(nl, dtype=bool)
        far[m] = np.abs(l_on[m] - r_on[match[m]]) > tolerance
        match[far] = -1

    hit = match >= 0
    idx = pa.array(np.where(hit, match, 0), pa.int64())
    mask = pa.array(hit)
    out = lt
    for c in right_cols:
        if nr:
            src = rt[c]
            src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) \
                else src
            col = pc.if_else(mask, src.take(idx), pa.nulls(nl, r_types[c]))
        else:
            col = pa.nulls(nl, r_types[c])
        out = out.append_column(out_names[c], col)
    if how == "inner":
        out = out.filter(mask)
    return out


def _empty_out(schema: pa.Schema, l_fields, right_cols, out_names, r_types):
    cols = {n: pa.nulls(0, t) for n, t in l_fields}
    for c in right_cols:
        cols[out_names[c]] = pa.nulls(0, r_types[c])
    return pa.table(cols)
