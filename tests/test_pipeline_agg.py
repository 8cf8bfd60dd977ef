"""ops/pipeline_agg: the elasticsearch pipeline-aggregation reduce shapes
(pure coordinating-node functions over folded parent buckets — ES runs
these at reduce time, never distributed)."""

import numpy as np
import pytest

from byzer_retrieval_ray.ops.pipeline_agg import (bucket_sort,
                                                  cumulative_sum,
                                                  derivative, moving_avg,
                                                  serial_diff)


def _b(counts):
    return [{"bucket": i * 10, "count": c} for i, c in enumerate(counts)]


def test_derivative_first_bucket_none():
    out = derivative(_b([3, 7, 2, 2]))
    assert [o["derivative"] for o in out] == [None, 4.0, -5.0, 0.0]
    assert [o["count"] for o in out] == [3, 7, 2, 2]   # inputs kept


def test_serial_diff_lag():
    out = serial_diff(_b([1, 4, 9, 16, 25]), lag=2)
    assert [o["serial_diff"] for o in out] == [None, None, 8.0, 12.0, 16.0]
    with pytest.raises(ValueError):
        serial_diff(_b([1]), lag=0)


def test_cumulative_sum():
    out = cumulative_sum(_b([3, 0, 7]))
    assert [o["cumulative_sum"] for o in out] == [3.0, 3.0, 10.0]


@pytest.mark.parametrize("window", [1, 2, 3, 5, 100])
def test_moving_avg_trailing_partial_windows(window):
    counts = [5, 1, 0, 8, 2, 2, 9]
    out = moving_avg(_b(counts), window=window)
    for i, o in enumerate(out):
        lo = max(0, i - window + 1)
        assert o["moving_avg"] == pytest.approx(
            float(np.mean(counts[lo:i + 1])))


def test_bucket_sort_desc_ties_and_size():
    out = bucket_sort(_b([2, 9, 2, 5]), size=3)
    assert [(o["bucket"], o["count"]) for o in out] == \
        [(10, 9), (30, 5), (0, 2)]          # tie 2/2 -> lower bucket first
    out_asc = bucket_sort(_b([2, 9, 2, 5]), ascending=True)
    assert [o["count"] for o in out_asc] == [2, 2, 5, 9]


def test_chaining_preserves_prior_outputs():
    out = moving_avg(cumulative_sum(derivative(_b([1, 2, 4]))), window=2)
    assert set(out[0]) == {"bucket", "count", "derivative",
                           "cumulative_sum", "moving_avg"}
    assert [o["cumulative_sum"] for o in out] == [1.0, 3.0, 7.0]


class TestBucketSelector:
    """Round-5: bucket_selector (HAVING predicate) with dotted
    buckets_path resolution, composing with aggregate() output shapes."""

    def test_predicates_and_paths(self):
        from byzer_retrieval_ray.ops.pipeline_agg import bucket_selector
        bs = [{"key": "a", "doc_count": 5, "st": {"avg": 10.0}},
              {"key": "b", "doc_count": 2, "st": {"avg": 30.0}},
              {"key": "c", "doc_count": 9, "st": {"avg": None}}]
        assert [b["key"] for b in
                bucket_selector(bs, "st.avg", "gte", 10.0)] == ["a", "b"]
        assert [b["key"] for b in
                bucket_selector(bs, "st.avg", "gt", 10.0)] == ["b"]
        # None metric drops (ES skip gap policy)
        assert [b["key"] for b in
                bucket_selector(bs, "st.avg", "lt", 1e9)] == ["a", "b"]
        # _count resolves the doc-count key whatever its name
        assert [b["key"] for b in
                bucket_selector(bs, "_count", "gte", 5)] == ["a", "c"]
        hist = [{"bucket": 1, "count": 3}, {"bucket": 2, "count": 7}]
        assert [b["bucket"] for b in
                bucket_selector(hist, "_count", "ne", 3)] == [2]
        import pytest as _pytest
        with _pytest.raises(ValueError, match="unknown bucket_selector"):
            bucket_selector(bs, "st.avg", "between", 1.0)
