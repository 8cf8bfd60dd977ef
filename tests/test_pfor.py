"""PForDelta (NewPFD) codec: round-trip properties and end-to-end search parity
when the index is built with codec="pfor"."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from byzer_retrieval_ray.functions import codec


class TestPForRoundtrip:
    @given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
    @settings(max_examples=150)
    def test_roundtrip(self, values):
        arr = np.array(values, dtype=np.uint64)
        blob = codec.pfor_encode(arr)
        out = codec.pfor_decode(blob, arr.size)
        np.testing.assert_array_equal(out, arr)

    def test_skewed_blocks_with_exceptions(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 16, 5000).astype(np.uint64)
        vals[rng.integers(0, 5000, 100)] = rng.integers(2**20, 2**30, 100)
        blob = codec.pfor_encode(vals)
        np.testing.assert_array_equal(codec.pfor_decode(blob, 5000), vals)
        # small values + few exceptions → much smaller than 8B/value
        assert len(blob) < 5000 * 2

    def test_empty_and_single(self):
        assert codec.pfor_decode(codec.pfor_encode(np.array([], np.uint64)), 0).size == 0
        one = codec.pfor_decode(codec.pfor_encode(np.array([7], np.uint64)), 1)
        assert one.tolist() == [7]

    def test_decode_posting_pfor(self):
        docs = np.sort(np.random.default_rng(1).choice(10**6, 300, replace=False)).astype(np.int64)
        tfs = (np.arange(300) % 9 + 1).astype(np.uint64)
        gaps = codec.delta_encode(docs)
        d, t, n = codec.decode_posting(
            codec.pfor_encode(gaps), codec.pfor_encode(tfs),
            bytes(300), 300, codec_name="pfor")
        np.testing.assert_array_equal(d, docs)
        np.testing.assert_array_equal(t, tfs.astype(np.int64))


class TestPForEndToEnd:
    def test_search_parity_with_varint_index(self, ray_session, tmp_path):
        from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
        from byzer_retrieval_ray.index.build import build_index

        schema = ("st(field(doc_id,long),field(text,string,analyze),"
                  "field(lang,string),field(source,string),field(n_chars,long,sort))")
        src = "/root/testdata/sf0.001/documents.parquet"
        results = {}
        for name in ("varint", "pfor"):
            loc = str(tmp_path / name)
            c = RetrievalCluster(loc)
            c.create_table(TableSettings("db", "docs", schema, loc))
            build_index(src, c.manifest("db", "docs"), key_field="doc_id",
                        num_doc_parts=2, num_term_parts=2, codec=name)
            q = SearchQuery("db", "docs", keyword="merge sort window", fields=["text"],
                            limit=25)
            res = c.search("db", "docs", q)[0]
            results[name] = [(r["doc_id"], r["_score"]) for r in res]
        assert results["varint"] == results["pfor"]
