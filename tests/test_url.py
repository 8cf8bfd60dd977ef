"""URL canonicalization + domain stats (ops/url.py)."""

import pyarrow as pa
import pytest

import ray.data

from byzer_retrieval_ray.ops.url import (add_canonical_urls, canonicalize,
                                         domain_stats)

CASES = [
    # (raw, canonical, host, domain)
    ("HTTPS://WWW.Example.COM:443/Path/To?utm_source=g&id=5#frag",
     "https://www.example.com/Path/To?id=5", "www.example.com", "example.com"),
    ("http://Sub3.Example7.co.uk:8080",
     "http://sub3.example7.co.uk:8080/", "sub3.example7.co.uk",
     "example7.co.uk"),
    ("http://a.b.com:80/x?gclid=z", "http://a.b.com/x", "a.b.com", "b.com"),
    ("https://x.org/?a=1&utm_campaign=c&b=2", "https://x.org/?a=1&b=2",
     "x.org", "x.org"),
    ("ftp://files.example.com:21/pub", "ftp://files.example.com:21/pub",
     "files.example.com", "example.com"),
    ("https://y.com?fbclid=q&z=2", "https://y.com/?z=2", "y.com", "y.com"),
    ("https://single", "https://single/", "single", None),  # no dot: no domain
    ("not a url", None, None, None),
]


class TestCanonicalize:
    def test_rules(self):
        out = canonicalize(pa.array([c[0] for c in CASES]))
        assert out["url"].to_pylist() == [c[1] for c in CASES]
        assert out["host"].to_pylist() == [c[2] for c in CASES]
        assert out["domain"].to_pylist() == [c[3] for c in CASES]

    def test_param_order_preserved_and_case_sensitivity(self):
        out = canonicalize(pa.array(
            ["http://h.com/CaSe?z=1&utm_x=t&a=2&UTM=kept"]))
        # path case kept; utm_x dropped; UTM= (uppercase) is NOT a tracking
        # prefix match — kept; order z,a,UTM preserved
        assert out["url"].to_pylist() == ["http://h.com/CaSe?z=1&a=2&UTM=kept"]

    def test_idempotent(self):
        once = canonicalize(pa.array([c[0] for c in CASES if c[1]]))["url"]
        twice = canonicalize(once)["url"]
        assert once.to_pylist() == twice.to_pylist()

    def test_chunked_input(self):
        col = pa.chunked_array([[CASES[0][0]], [CASES[2][0]]])
        assert canonicalize(col)["url"].to_pylist() == [CASES[0][1],
                                                        CASES[2][1]]


class TestDomainStats:
    def _ds(self, parallelism=1):
        urls = ([f"https://a{i % 3}.Example.com/p/{i}" for i in range(30)]
                + ["http://Other.co.uk/x", "bad url"])
        t = pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                      "url": urls})
        ds = ray.data.from_arrow(t)
        return ds.repartition(parallelism) if parallelism > 1 else ds

    def test_counts(self, ray_session):
        out = domain_stats(self._ds(), "url").to_pandas()
        got = dict(zip(out["domain"], out["n_docs"]))
        assert got == {"example.com": 30, "other.co.uk": 1, "": 1}

    def test_partition_invariance(self, ray_session):
        a = domain_stats(self._ds(), "url").to_pandas() \
            .sort_values("domain").reset_index(drop=True)
        b = domain_stats(self._ds(parallelism=4), "url").to_pandas() \
            .sort_values("domain").reset_index(drop=True)
        assert a.equals(b)

    def test_add_canonical_streaming(self, ray_session):
        out = self._ds().map_batches(
            lambda b: add_canonical_urls(b, "url"),
            batch_format="pyarrow").to_pandas()
        assert "canon_url" in out and "canon_domain" in out
        assert out["canon_domain"].iloc[0] == "example.com"

    def test_dedup_by_canonical_url(self, ray_session):
        # same page under tracking-param / case / default-port variants
        from byzer_retrieval_ray.ops.dedup import exact_dedup
        urls = ["https://E.com/p?utm_source=a", "https://e.com:443/p",
                "https://e.com/p", "https://e.com/q"]
        t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "url": urls})
        ds = ray.data.from_arrow(t).map_batches(
            lambda b: add_canonical_urls(b, "url"), batch_format="pyarrow")
        kept = exact_dedup(ds, text_col="canon_url", id_col="doc_id") \
            .to_pandas()
        assert sorted(kept["doc_id"]) == [0, 3]  # first variant + distinct
