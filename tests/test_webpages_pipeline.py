"""The flagship web-page pipeline (BASELINE.json input_hint): html→text extraction
(byte-identical per url), dedup latest-by-url, string-key routing, BM25 parity, and
partition-count / parallelism invariance."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.corpus import webpages
from byzer_retrieval_ray.functions.extract import extract_text_one
from tests.oracle_bm25 import OracleIndex

PAGES_SCHEMA = ("st(field(url,string),field(warc_ts,date,sort),"
                "field(html,binary,no_index),field(text,string,analyze),"
                "field(lang,string))")
N_ROWS = 400


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    return webpages.write_corpus(str(d), N_ROWS, rows_per_file=100)


@pytest.fixture(scope="module")
def expected_docs(corpus_dir):
    """Latest-by-url dedup of the raw corpus, computed independently."""
    t = pq.read_table(corpus_dir)
    rows = sorted(t.to_pylist(), key=lambda r: (r["url"], r["warc_ts"]))
    latest = {}
    for r in rows:
        latest[r["url"]] = r
    return latest


def _build(tmp_path_factory, corpus_dir, num_doc_parts, num_term_parts=4):
    loc = str(tmp_path_factory.mktemp(f"pages_idx_{num_doc_parts}"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("web", "pages", PAGES_SCHEMA, loc))
    c.build_from_parquet("web", "pages", corpus_dir, key_field="url",
                         version_field="warc_ts", extract=("html", "text"),
                         num_doc_parts=num_doc_parts, num_term_parts=num_term_parts)
    return c


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory, corpus_dir):
    return _build(tmp_path_factory, corpus_dir, num_doc_parts=4)


class TestExtractionInvariant:
    def test_corpus_is_deterministic(self, corpus_dir):
        t = webpages.generate_rows(7, 12)
        t2 = webpages.generate_rows(0, 12).slice(7, 5)
        assert t.equals(t2)  # chunking-independent generation

    def test_extracted_text_byte_identical(self, cluster, expected_docs):
        """Per-row invariant vs the reference: extract_text(html) == text, per url."""
        gen = cluster.manifest("web", "pages").current_gen_info()
        seen = 0
        for e in gen["docstore"].values():
            part = pq.read_table(e["path"], columns=["url", "text", "html"])
            for url, text, html in zip(part["url"].to_pylist(),
                                       part["text"].to_pylist(),
                                       part["html"].to_pylist()):
                assert text == expected_docs[url]["text"], url
                assert extract_text_one(html) == text
                seen += 1
        assert seen == len(expected_docs)

    def test_dedup_latest_wins(self, cluster, expected_docs, corpus_dir):
        raw = pq.read_table(corpus_dir)
        assert len(raw) > len(expected_docs)  # fixture contains url duplicates
        gen = cluster.manifest("web", "pages").current_gen_info()
        assert gen["n_docs"] == len(expected_docs)


class TestSearchParity:
    @pytest.fixture(scope="class")
    def oracle(self, expected_docs):
        urls = sorted(expected_docs)
        # engine doc ids are (part << 40 | rank-by-url); build the same order
        from byzer_retrieval_ray.functions.murmur3 import route_np
        parts = route_np(np.array(urls, dtype=object), 4)
        doc_ids = []
        ranks = {}
        for u, p in zip(urls, parts):
            r = ranks.get(p, 0)
            ranks[p] = r + 1
            doc_ids.append((int(p) << 40) + r)
        texts = [expected_docs[u]["text"] for u in urls]
        return OracleIndex(doc_ids, texts), dict(zip(doc_ids, urls))

    def test_topk_matches_oracle(self, cluster, oracle):
        oidx, id2url = oracle
        v = webpages.vocab()
        queries = [v[0], f"{v[1]} {v[50]}", f"{v[5]} {v[200]} {v[1000]}", "absent_zz", "*"]
        for kw in queries:
            for algorithm in ("taat", "bmw"):
                q = SearchQuery("web", "pages", keyword=kw, fields=["text"], limit=10)
                res = cluster.search("web", "pages", q, algorithm=algorithm)[0]
                oids, oscores = oidx.search(kw, 10)
                assert [r["url"] for r in res] == [id2url[i] for i in oids], kw
                np.testing.assert_allclose(
                    np.array([r["_score"] for r in res], np.float32), oscores, rtol=2e-6)


class TestInvariance:
    def test_partition_count_invariant_scores(self, ray_session, tmp_path_factory,
                                              corpus_dir, cluster):
        """Global stats ⇒ identical score multisets at any partition count
        (stronger than the reference's per-shard stats, SURVEY.md §7.3)."""
        c2 = _build(tmp_path_factory, corpus_dir, num_doc_parts=2, num_term_parts=2)
        v = webpages.vocab()
        for kw in (v[0], f"{v[3]} {v[77]}"):
            q = SearchQuery("web", "pages", keyword=kw, fields=["text"], limit=20)
            r4 = cluster.search("web", "pages", q)[0]
            r2 = c2.search("web", "pages", q)[0]
            s4 = np.array([r["_score"] for r in r4])
            s2 = np.array([r["_score"] for r in r2])
            np.testing.assert_allclose(s4, s2, rtol=1e-6)
            # within each distinct score, the same url set
            by_score4, by_score2 = {}, {}
            for r in r4:
                by_score4.setdefault(round(r["_score"], 5), set()).add(r["url"])
            for r in r2:
                by_score2.setdefault(round(r["_score"], 5), set()).add(r["url"])
            # boundary score groups may be truncated differently; compare full groups
            for s in list(by_score4):
                if s in by_score2 and len(by_score4[s]) == len(by_score2[s]):
                    assert by_score4[s] == by_score2[s]
