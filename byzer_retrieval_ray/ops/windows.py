"""Windowed aggregates over event streams (beyond-reference op).

Ray Data has no event-time windowing; tumbling windows are expressed as a grouped
aggregate over a truncated-timestamp key (ray_guide: streaming-shaped workloads).
The combiner pattern keeps the shuffle small: per-batch partial aggregation emits one
row per (key, window) per batch, then a tiny groupby folds the partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def tumbling_window_agg(ds, ts_col: str, key_col: str, value_col: str,
                        window_sec: int):
    """count + sum + min + max of ``value_col`` per (key, tumbling window).

    Returns a Dataset of (key, window_start:int64 epoch-sec, n, sum_v, min_v, max_v).
    Pre-aggregated per batch (combiner) so the shuffle carries one row per
    (key, window, batch) instead of per event.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy() // 1_000_000  # µs → s
        win = (ts // window_sec) * window_sec
        t = pa.table({
            "key": batch[key_col],
            "window_start": pa.array(win, pa.int64()),
            "v": batch[value_col],
        })
        g = t.group_by(["key", "window_start"]).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")])
        return g.rename_columns(["key", "window_start", "n", "sum_v", "min_v", "max_v"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by(["key", "window_start"]).aggregate(
            [("n", "sum"), ("sum_v", "sum"), ("min_v", "min"), ("max_v", "max")])
        return g.rename_columns(["key", "window_start", "n", "sum_v", "min_v", "max_v"])

    # second stage: tiny shuffle over the partials, vectorized fold per bucket
    def bucketed(batch: pa.Table) -> pa.Table:
        import numpy as _np
        h = _np.abs(batch["window_start"].to_numpy()) % 16
        return batch.append_column("__b", pa.array(h.astype(_np.int32)))

    return partials.map_batches(bucketed, batch_format="pyarrow") \
        .groupby("__b") \
        .map_groups(lambda g: fold(g.drop_columns(["__b"])), batch_format="pyarrow")


def hopping_window_agg(ds, ts_col: str, key_col: str, value_col: str,
                       window_sec: int, hop_sec: int):
    """count + sum + min + max per (key, HOPPING window): overlapping windows
    of ``window_sec`` starting every ``hop_sec`` (``hop_sec`` must divide
    ``window_sec``). Each event lands in exactly window/hop windows — the
    explode happens INSIDE the per-batch combiner (vectorized repeat/tile),
    so the shuffle still carries one row per (key, window, batch), not per
    event replica. Returns the same schema as :func:`tumbling_window_agg`;
    hop == window degenerates to tumbling (asserted in tests)."""
    if window_sec % hop_sec:
        raise ValueError(
            f"hop_sec must divide window_sec, got {window_sec}/{hop_sec}")
    m = window_sec // hop_sec

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy() // 1_000_000  # µs → s
        s_max = (ts // hop_sec) * hop_sec
        starts = np.repeat(s_max, m) - np.tile(
            np.arange(m, dtype=np.int64) * hop_sec, ts.size)
        rep = pa.array(np.repeat(np.arange(ts.size), m), pa.int64())
        t = pa.table({
            "key": batch[key_col].take(rep),
            "window_start": pa.array(starts, pa.int64()),
            "v": batch[value_col].take(rep),
        })
        g = t.group_by(["key", "window_start"]).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")])
        return g.rename_columns(["key", "window_start", "n", "sum_v",
                                 "min_v", "max_v"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by(["key", "window_start"]).aggregate(
            [("n", "sum"), ("sum_v", "sum"), ("min_v", "min"), ("max_v", "max")])
        return g.rename_columns(["key", "window_start", "n", "sum_v",
                                 "min_v", "max_v"])

    def bucketed(batch: pa.Table) -> pa.Table:
        h = np.abs(batch["window_start"].to_numpy()) % 16
        return batch.append_column("__b", pa.array(h.astype(np.int32)))

    return partials.map_batches(bucketed, batch_format="pyarrow") \
        .groupby("__b") \
        .map_groups(lambda g: fold(g.drop_columns(["__b"])),
                    batch_format="pyarrow")


def sessionize(ds, ts_col: str, user_col: str, gap_sec: float, num_buckets: int = 64):
    """Gap-based sessionization: consecutive events of one user belong to the same
    session while the time gap ≤ ``gap_sec``; a larger gap starts a new session.

    Ray-Data-first and skew-safe: the shuffle carries (user, epoch) pairs only,
    hash-bucketed by user so one ``map_groups`` call resolves MANY users
    vectorized (sort by (user, t) → new-session flags → cumsum → reduceat
    aggregates) — not one group per user, so a hot user costs one bucket, not a
    straggler task per event.

    Returns a Dataset of (user_id, session_id, session_start, session_end,
    n_events); session_id is 1-based per user in time order, timestamps are
    float64 epoch seconds.
    """
    import numpy as np
    import pyarrow as pa

    def key_rows(batch: pa.Table) -> pa.Table:
        users = batch[user_col].to_numpy()
        ts = batch[ts_col].to_numpy()
        if np.issubdtype(ts.dtype, np.datetime64):
            t = ts.astype("datetime64[us]").astype(np.int64) / 1e6
        else:
            t = ts.astype(np.float64)
        return pa.table({
            "u": pa.array(users.astype(np.int64)),
            "t": pa.array(t, pa.float64()),
            "__b": pa.array((users.astype(np.int64) % num_buckets).astype(np.int32)),
        })

    def resolve(group: pa.Table) -> pa.Table:
        g = group.sort_by([("u", "ascending"), ("t", "ascending")])
        u = g["u"].to_numpy()
        t = g["t"].to_numpy()
        n = len(u)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_id": pa.array([], pa.int64()),
                             "session_start": pa.array([], pa.float64()),
                             "session_end": pa.array([], pa.float64()),
                             "n_events": pa.array([], pa.int64())})
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_sec
        sid_global = np.cumsum(new_sess)                 # 1-based global session idx
        first_of_user = sid_global[new_user]
        user_idx = np.cumsum(new_user) - 1
        session_id = sid_global - first_of_user[user_idx] + 1
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.concatenate([starts, [n]]))
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "session_id": pa.array(session_id[starts], pa.int64()),
            "session_start": pa.array(t[starts], pa.float64()),
            "session_end": pa.array(np.maximum.reduceat(t, starts), pa.float64()),
            "n_events": pa.array(counts, pa.int64()),
        })

    return ds.map_batches(key_rows, batch_format="pyarrow") \
             .groupby("__b").map_groups(resolve, batch_format="pyarrow")
