"""GPT-style sequence packing: byte-exact vs brute-force, cross-bucket
sequences, tail handling, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.pack import _tokens_with_eos, pack_sequences


def corpus(n=30, eos="<eos>"):
    docs = {i: " ".join(f"t{i}_{j}" for j in range(3 + (i * 7) % 9))
            for i in range(n)}
    stream = []
    for i in sorted(docs):
        stream += docs[i].split() + [eos]
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()), pa.string())})
    return t, stream


def want_seqs(stream, L, keep_tail=False):
    full = len(stream) // L
    out = [" ".join(stream[w * L:(w + 1) * L]) for w in range(full)]
    if keep_tail and len(stream) % L:
        out.append(" ".join(stream[full * L:]))
    return out


class TestTokensWithEos:
    def test_layout(self):
        arr = pa.array(["a b", "", "c"], pa.string())
        stream, n_with = _tokens_with_eos(arr, "<eos>")
        assert list(stream) == ["a", "b", "<eos>", "<eos>", "c", "<eos>"]
        assert list(n_with) == [3, 1, 2]


class TestPack:
    def test_byte_exact_vs_bruteforce(self, ray_session):
        import ray.data
        t, stream = corpus()
        out = pack_sequences(ray.data.from_arrow(t).repartition(6), "text",
                             "doc_id", seq_len=11,
                             num_buckets=4).to_pandas().sort_values("seq_id")
        assert list(out["text"]) == want_seqs(stream, 11)
        assert (out["n_tokens"] == 11).all()
        assert list(out["seq_id"]) == list(range(len(stream) // 11))

    def test_keep_tail(self, ray_session):
        import ray.data
        t, stream = corpus(13)
        out = pack_sequences(ray.data.from_arrow(t), "text", "doc_id",
                             seq_len=10, num_buckets=3,
                             keep_tail=True).to_pandas().sort_values("seq_id")
        assert list(out["text"]) == want_seqs(stream, 10, keep_tail=True)
        tail = len(stream) % 10
        if tail:
            assert out["n_tokens"].iloc[-1] == tail

    def test_partition_and_bucket_invariance(self, ray_session):
        import ray.data
        t, stream = corpus(40)
        key = lambda df: df.sort_values("seq_id").reset_index(drop=True)
        a = key(pack_sequences(ray.data.from_arrow(t).repartition(1), "text",
                               "doc_id", seq_len=9, num_buckets=1).to_pandas())
        b = key(pack_sequences(ray.data.from_arrow(t).repartition(9), "text",
                               "doc_id", seq_len=9, num_buckets=5).to_pandas())
        assert a.equals(b)
        assert list(a["text"]) == want_seqs(stream, 9)

    def test_sequences_span_buckets(self, ray_session):
        # seq_len larger than any one doc guarantees cross-doc (and with
        # small buckets, cross-bucket) sequences assembled from fragments
        import ray.data
        t, stream = corpus(12)
        out = pack_sequences(ray.data.from_arrow(t), "text", "doc_id",
                             seq_len=50, num_buckets=6,
                             ).to_pandas().sort_values("seq_id")
        assert list(out["text"]) == want_seqs(stream, 50)

    def test_empty_docs_contribute_eos(self, ray_session):
        import ray.data
        t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(["a b", "", "c d"], pa.string())})
        out = pack_sequences(ray.data.from_arrow(t), "text", "doc_id",
                             seq_len=7, num_buckets=2,
                             keep_tail=True).to_pandas()
        assert list(out["text"]) == ["a b <eos> <eos> c d <eos>"]
