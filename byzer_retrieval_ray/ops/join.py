"""Broadcast hash join against a SMALL dimension table.

The canonical scale pattern the prompt calls out: a lookup side that fits in
memory must be `ray.put` ONCE and fetched once per actor — never shuffled and
never re-shipped per batch. Each batch then joins via Arrow's native (Acero)
hash join — C++ vectorized, zero Python per row. At 100 TB the big side
streams; the only cross-task traffic is the one broadcast object.

The right side must have UNIQUE join keys (it is a dimension table; enforced
at driver time) so per-batch joins can't duplicate left rows and the result is
batch-partitioning-invariant.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_JOIN_TYPES = {"inner", "left outer"}


def _validate_right(right: pa.Table, on: str) -> pa.Table:
    # count_distinct excludes nulls (mode only_valid) — report null keys as
    # their own error (a null key never joins) instead of a misleading
    # "must have unique keys" when all non-null keys ARE unique
    n_null = pc.sum(pc.is_null(right[on])).as_py() or 0
    if n_null:
        raise ValueError(
            f"broadcast join right side has {n_null} null '{on}' key(s); "
            "null keys never join — drop or fill them first")
    n_distinct = pc.count_distinct(right[on]).as_py()
    if n_distinct != len(right):
        raise ValueError(
            f"broadcast join right side must have unique '{on}' keys "
            f"({len(right)} rows, {n_distinct} distinct)")
    return right.combine_chunks()


class BroadcastJoin:
    """Actor-pool stage: fetches the broadcast dimension table once per actor,
    joins each batch with Acero."""

    def __init__(self, right_ref, on: str, join_type: str = "inner"):
        import ray
        if join_type not in _JOIN_TYPES:
            raise ValueError(f"join_type must be one of {_JOIN_TYPES}")
        self.right = ray.get(right_ref) if not isinstance(right_ref, pa.Table) \
            else right_ref
        self.on = on
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.right, keys=self.on, join_type=self.join_type)


def broadcast_join(ds, right: pa.Table, on: str, join_type: str = "inner",
                   concurrency: int = 2):
    """Streaming enrich of ``ds`` with a small unique-keyed Arrow table.
    (An actor-pool stage always needs a concurrency; size it to the cluster.)"""
    import ray
    right_ref = ray.put(_validate_right(right, on))
    return ds.map_batches(
        BroadcastJoin, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"right_ref": right_ref, "on": on,
                               "join_type": join_type})
