"""PII redaction (ops/pii.py) and benchmark decontamination
(ops/decontaminate.py) — kernel-level unit tests plus Dataset-level plumbing.
The DuckDB value parity of both is covered by the gate entries
(`pii_scrub`, `decontaminate` in __ray_entry__)."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.pii import PIIScrubber, scrub_pii, scrub_dataset
from byzer_retrieval_ray.ops.decontaminate import (
    ContaminationCheck, benchmark_ngram_hashes, decontaminate,
    _membership_counts)


@pytest.fixture
def ray_mod(ray_session):
    import ray
    return ray


class TestScrubPII:
    def test_counts_and_redaction(self):
        t = pa.table({"doc_id": [1, 2, 3], "text": [
            "write to a.b+c@mail.example.org today",
            "host 10.1.2.3 and 192.168.0.1 then call +1555 123-4567",
            "nothing sensitive here",
        ]})
        out = scrub_pii(t)
        assert out["n_email"].to_pylist() == [1, 0, 0]
        assert out["n_ipv4"].to_pylist() == [0, 2, 0]
        assert out["n_phone"].to_pylist() == [0, 1, 0]
        texts = out["text"].to_pylist()
        assert texts[0] == "write to <EMAIL> today"
        assert texts[1] == "host <IP> and <IP> then call <PHONE>"
        assert texts[2] == "nothing sensitive here"

    def test_counts_measured_on_original_text(self):
        # an email whose redaction would otherwise hide a later-pattern match:
        # counts must reflect the ORIGINAL text, redaction runs sequentially
        t = pa.table({"text": ["ping admin@h4.example.com from 10.0.0.7"]})
        out = scrub_pii(t)
        assert out["n_email"].to_pylist() == [1]
        assert out["n_ipv4"].to_pylist() == [1]
        assert out["text"].to_pylist() == ["ping <EMAIL> from <IP>"]

    def test_keep_original_and_conservative_misses(self):
        # things a conservative scrubber must NOT touch
        t = pa.table({"text": ["version 1.2.3 released at noon @ the office"]})
        out = scrub_pii(t, keep_original=True)
        assert out["text"].to_pylist() == out["text_raw"].to_pylist()
        assert out["n_email"].to_pylist() == [0]
        assert out["n_ipv4"].to_pylist() == [0]  # 1.2.3 has only three octets

    def test_dataset_streaming(self, ray_mod):
        import ray.data
        ds = ray.data.from_arrow(pa.table({
            "doc_id": list(range(8)),
            "text": [f"doc {i} mail u{i}@ex.org" if i % 2 else f"doc {i}"
                     for i in range(8)],
        }))
        out = scrub_dataset(ds, concurrency=2).to_pandas().sort_values("doc_id")
        assert out["n_email"].tolist() == [0, 1] * 4
        assert all("<EMAIL>" in s for s in out[out["n_email"] > 0]["text"])

    def test_callable_class_matches_fn(self):
        t = pa.table({"text": ["a@b.co and 8.8.8.8"]})
        assert PIIScrubber()(t).equals(scrub_pii(t))


class TestDecontaminate:
    CORPUS = [
        "the quick brown fox jumps over the lazy dog tonight",   # 0: clean
        "alpha beta gamma delta epsilon zeta eta theta iota",    # 1: = bench[0]
        "prefix words then alpha beta gamma delta epsilon zeta eta theta end",  # 2: overlap
        "totally unrelated content with no shared grams at all here",  # 3: clean
        "short doc",                                             # 4: < k tokens
    ]
    BENCH = ["alpha beta gamma delta epsilon zeta eta theta iota"]

    def test_membership_counts(self):
        bench = benchmark_ngram_hashes(self.BENCH, k=8)
        hits = _membership_counts(np.asarray(self.CORPUS, dtype=object), bench, 8)
        # doc1 has 9 tokens -> 2 8-grams, both in the benchmark; doc2 contains
        # the first 8 benchmark tokens as a contiguous run -> exactly 1 8-gram
        assert hits.tolist() == [0, 2, 1, 0, 0]

    def test_short_doc_fallback_matches(self):
        # a <k-token doc IS the benchmark doc: the fold-all fallback must match
        bench = benchmark_ngram_hashes(["short doc"], k=8)
        hits = _membership_counts(np.asarray(self.CORPUS, dtype=object), bench, 8)
        assert hits.tolist() == [0, 0, 0, 0, 1]

    def test_dataset_flag_and_drop(self, ray_mod):
        import ray.data
        ds = ray.data.from_arrow(pa.table({
            "doc_id": list(range(len(self.CORPUS))), "text": self.CORPUS}))
        flagged = decontaminate(ds, self.BENCH, k=8, concurrency=2).to_pandas() \
            .sort_values("doc_id")
        assert flagged["contaminated"].tolist() == [False, True, True, False, False]
        kept = decontaminate(ds, self.BENCH, k=8, concurrency=2,
                             keep_flagged=False).to_pandas()
        assert sorted(kept["doc_id"].tolist()) == [0, 3, 4]
        assert "contaminated" not in kept.columns

    def test_broadcast_is_object_ref(self, ray_mod):
        # the stage constructor receives an ObjectRef (ray.put once), not a
        # per-batch reshipped array
        import ray
        bench = benchmark_ngram_hashes(self.BENCH, k=8)
        ref = ray.put(bench)
        chk = ContaminationCheck(ref, k=8)
        assert np.array_equal(chk.bench, bench)
