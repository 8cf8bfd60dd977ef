"""PMI collocations: closed-form values, min_count, partition invariance."""

import math

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.ops.pmi import pmi_collocations


def tbl(rows):
    return pa.table({"text": pa.array(rows, pa.string())})


def ref_pmi(docs, min_count=1):
    """Brute-force reference: token/bigram counts via Python dicts."""
    uc, bc = {}, {}
    for d in docs:
        ws = [w for w in d.split() if w]
        for w in ws:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    nu = float(sum(uc.values()))
    nb = float(sum(bc.values()))
    out = {}
    for (a, b), cab in bc.items():
        if cab >= min_count:
            v = math.log((cab / nb) / ((uc[a] / nu) * (uc[b] / nu)))
            out[f"{a} {b}"] = math.copysign(
                math.floor(abs(v) * 1e4 + 0.5) / 1e4, v)
    return out


class TestPMI:
    def test_matches_reference(self, ray_session):
        import ray.data
        docs = ["a b a b c", "b c b c d", "a c a c", "d d d d b a"]
        got = pmi_collocations(ray.data.from_arrow(tbl(docs)), "text",
                               min_count=1)
        want = ref_pmi(docs)
        assert dict(zip(got["ngram"], got["pmi"])) == want
        # counts too
        assert dict(zip(got["ngram"], got["count"]))["a b"] == 2

    def test_min_count_threshold(self, ray_session):
        import ray.data
        docs = ["x y x y x y", "z w"]
        got = pmi_collocations(ray.data.from_arrow(tbl(docs)), "text",
                               min_count=2)
        assert set(got["ngram"]) == {"x y", "y x"}

    def test_no_cross_doc_bigrams(self, ray_session):
        import ray.data
        got = pmi_collocations(ray.data.from_arrow(tbl(["a b", "c d"])),
                               "text", min_count=1)
        assert "b c" not in set(got["ngram"])

    def test_partition_invariance_and_order(self, ray_session):
        import ray.data
        docs = [f"w{i % 7} w{(i + 1) % 5} w{i % 3} common pair" for i in
                range(60)]
        a = pmi_collocations(ray.data.from_arrow(tbl(docs)).repartition(1),
                             "text", min_count=2)
        b = pmi_collocations(ray.data.from_arrow(tbl(docs)).repartition(8),
                             "text", min_count=2)
        assert a.equals(b)
        # ranking is (pmi desc, ngram asc)
        key = list(zip(-a["pmi"], a["ngram"]))
        assert key == sorted(key)
        # k truncation
        c = pmi_collocations(ray.data.from_arrow(tbl(docs)), "text",
                             min_count=2, k=3)
        assert len(c) == 3 and c.equals(a.head(3).reset_index(drop=True))

    def test_whitespace_runs(self, ray_session):
        import ray.data
        got = pmi_collocations(
            ray.data.from_arrow(tbl(["a  b\ta", "a b"])), "text", min_count=1)
        want = ref_pmi(["a b a", "a b"])
        assert dict(zip(got["ngram"], got["pmi"])) == want
