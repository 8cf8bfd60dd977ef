"""Unit tests for the pure kernels: SmallFloat quantization, murmur3 routing,
varint/delta codec, whitespace tokenizer, HTML extraction, BM25 math."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from byzer_retrieval_ray.functions import smallfloat as sf
from byzer_retrieval_ray.functions import murmur3 as mm
from byzer_retrieval_ray.functions import codec
from byzer_retrieval_ray.functions import tokenize as tok
from byzer_retrieval_ray.functions import extract
from byzer_retrieval_ray.functions import bm25


class TestSmallFloat:
    def test_small_values_exact(self):
        for i in range(24):
            assert sf.int_to_byte4(i) == i
            assert sf.byte4_to_int(i) == i

    def test_roundtrip_monotone_lossy(self):
        prev = -1
        for i in [0, 1, 23, 24, 25, 31, 32, 100, 1000, 2**20, 2**31 - 1]:
            b = sf.int_to_byte4(i)
            dec = sf.byte4_to_int(b)
            assert dec <= i
            assert 0 <= b <= 255
            assert dec >= prev
            prev = dec

    def test_length_table_strictly_increasing(self):
        assert (np.diff(sf.LENGTH_TABLE) > 0).all()
        assert sf.LENGTH_TABLE[255] == sf.byte4_to_int(255)

    @given(st.integers(min_value=0, max_value=2**31 - 1))
    @settings(max_examples=300)
    def test_vectorized_matches_scalar(self, v):
        b = sf.int_to_byte4_np(np.array([v]))
        assert int(b[0]) == sf.int_to_byte4(v)
        q = sf.quantize_length_np(np.array([v]))
        assert int(q[0]) == sf.byte4_to_int(sf.int_to_byte4(v))

    def test_vectorized_exhaustive_small(self):
        v = np.arange(0, 70000)
        enc = sf.int_to_byte4_np(v)
        expected = np.array([sf.int_to_byte4(int(x)) for x in range(0, 70000)])
        np.testing.assert_array_equal(enc, expected)


class TestMurmur3:
    def test_route_reference_vectors(self):
        # UtilsTest.java:21-31 — route(10L, 3) == 1; string routes in [0, n)
        assert mm.route(10, 3) == 1
        v = mm.route("hellowo", 3)
        assert 0 <= v < 3

    def test_known_hashes(self):
        # public murmur3_x86_32 test vectors (seed 0)
        assert mm.murmur3_x86_32(b"") == 0
        assert mm.murmur3_x86_32(b"hello") & 0xFFFFFFFF == 0x248BFA47
        assert mm.murmur3_x86_32(b"The quick brown fox jumps over the lazy dog") & 0xFFFFFFFF == 0x2E4FF723

    @given(st.text(max_size=50))
    @settings(max_examples=200)
    def test_vectorized_matches_scalar(self, s):
        out = mm.murmur3_np(np.array([s, s + "x", ""], dtype=object))
        assert out[0] == mm.murmur3_x86_32(s.encode("utf-8"))
        assert out[2] == 0

    def test_route_np_matches_scalar(self):
        ids = np.array([f"https://site{i}.example/p/{i}" for i in range(200)], dtype=object)
        got = mm.route_np(ids, 7)
        expected = np.array([mm.route(s, 7) for s in ids])
        np.testing.assert_array_equal(got, expected)


class TestCodec:
    @given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
    @settings(max_examples=200)
    def test_varint_roundtrip(self, values):
        arr = np.array(values, dtype=np.uint64)
        enc = codec.varint_encode(arr)
        dec = codec.varint_decode(enc)
        np.testing.assert_array_equal(dec, arr)

    @given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                    max_size=300, unique=True))
    @settings(max_examples=100)
    def test_posting_roundtrip(self, ids):
        doc_ids = np.sort(np.array(ids, dtype=np.int64))
        tfs = (np.arange(doc_ids.size) % 7 + 1).astype(np.int64)
        norms = ((doc_ids * 31) % 256).astype(np.uint8)
        db, tb, nb, first, max_tf, min_norm = codec.encode_posting(doc_ids, tfs, norms)
        d2, t2, n2 = codec.decode_posting(db, tb, nb, doc_ids.size)
        np.testing.assert_array_equal(d2, doc_ids)
        np.testing.assert_array_equal(t2, tfs)
        np.testing.assert_array_equal(n2, norms)
        nb_ = (doc_ids.size + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
        assert len(first) == len(max_tf) == len(min_norm) == nb_
        # block metadata really bounds the block
        for b in range(nb_):
            lo, hi = b * codec.BLOCK_SIZE, min((b + 1) * codec.BLOCK_SIZE, doc_ids.size)
            assert first[b] == doc_ids[lo]
            assert max_tf[b] == tfs[lo:hi].max()
            assert min_norm[b] == norms[lo:hi].min()

    def test_non_increasing_rejected(self):
        with pytest.raises(ValueError):
            codec.delta_encode(np.array([3, 3]))


class TestTokenizer:
    def test_matches_python_split(self):
        texts = ["a b  c", " leading", "trailing ", "", "tab\tand\nnewline", "one"]
        arr = pa.array(texts)
        dls = tok.doc_lengths(arr)
        np.testing.assert_array_equal(dls, [len(t.split()) for t in texts])

    def test_term_frequencies(self):
        texts = pa.array(["a b a", "b b c"])
        t = tok.term_frequencies(texts, np.array([10, 20]))
        rows = {(r["doc_id"], r["term"]): (r["tf"], r["doc_len"]) for r in t.to_pylist()}
        assert rows[(10, "a")] == (2, 3)
        assert rows[(10, "b")] == (1, 3)
        assert rows[(20, "b")] == (2, 3)
        assert rows[(20, "c")] == (1, 3)

    @given(st.lists(st.text(alphabet=" ab\tc\n", max_size=30), min_size=1, max_size=20))
    @settings(max_examples=100)
    def test_tf_sums_to_doc_len(self, texts):
        arr = pa.array(texts, pa.string())
        t = tok.term_frequencies(arr, np.arange(len(texts)))
        dls = {i: len(s.split()) for i, s in enumerate(texts)}
        agg = {}
        for r in t.to_pylist():
            agg[r["doc_id"]] = agg.get(r["doc_id"], 0) + r["tf"]
            assert r["doc_len"] == dls[r["doc_id"]]
        for i, dl in dls.items():
            assert agg.get(i, 0) == dl


class TestExtract:
    def test_roundtrip_synthetic(self):
        from byzer_retrieval_ray.corpus import webpages
        t = webpages.generate_rows(0, 50)
        got = extract.extract_text(t["html"].combine_chunks())
        assert got.to_pylist() == t["text"].to_pylist()

    def test_scalar_vector_agree(self):
        cases = [
            b"<html><head><title>x</title></head><body><p>hello world</p></body></html>",
            b"<html><body><p>a</p><div>junk</div><p>b</p></body></html>",
            b"<html><body>no paragraphs</body></html>",
            b"<html><head><title>t</title></head><body><p>x &amp; y &lt;z&gt;</p></body></html>",
        ]
        vec = extract.extract_text(pa.array(cases, pa.binary())).to_pylist()
        for html, got in zip(cases, vec):
            assert got == extract.extract_text_one(html)


class TestBM25:
    def test_hand_computed_score(self):
        # one term, N=3 docs, df=2, avgdl computed from sum_ttf=30
        n, df, sum_ttf = 3, 2, 30
        avgdl = bm25.avg_field_length(sum_ttf, n, dtype=np.float64)
        cache = bm25.norm_inverse_cache(avgdl, dtype=np.float64)
        w = bm25.term_weight(n, df, dtype=np.float64)
        dl = 10  # < 24 so quantization is exact
        tf = 3.0
        got = bm25.score_tf_norm(np.array([tf]), np.array([dl]), cache, w, dtype=np.float64)[0]
        idf = np.log(1 + (n - df + 0.5) / (df + 0.5))
        expected = idf * (1.2 + 1) * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (sum_ttf / n)))
        assert got == pytest.approx(expected, rel=1e-12)

    def test_block_bound_dominates(self):
        rng = np.random.default_rng(0)
        tfs = rng.integers(1, 50, 500)
        dls = rng.integers(1, 5000, 500)
        norm_bytes = sf.int_to_byte4_np(dls)
        cache = bm25.norm_inverse_cache(250.0, dtype=np.float32)
        w = bm25.term_weight(100000, 37, dtype=np.float32)
        scores = bm25.score_tf_norm(tfs, norm_bytes, cache, w)
        bound = bm25.max_block_score_bound(
            np.array([tfs.max()]), np.array([norm_bytes.min()]), cache, w)[0]
        assert (scores <= bound + 1e-6).all()
