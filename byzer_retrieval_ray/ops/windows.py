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
