"""Resume of the postings stage: a missing postings partition is rebuilt from the
surviving docstore without touching completed partitions, and results are identical."""

import os

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.index.build import build_index

SCHEMA = ("st(field(doc_id,long),field(text,string,analyze),field(lang,string),"
          "field(source,string),field(n_chars,long,sort))")
SF = "/root/testdata/sf0.001"


def test_postings_partition_resume(ray_session, tmp_path):
    loc = str(tmp_path)
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "docs", SCHEMA, loc))
    build_index(f"{SF}/documents.parquet", c.manifest("db", "docs"),
                key_field="doc_id", num_doc_parts=4, num_term_parts=4)
    q = SearchQuery("db", "docs", keyword="merge sort window", fields=["text"], limit=20)
    before = [(r["doc_id"], r["_score"]) for r in c.search("db", "docs", q)[0]]

    gdir = c.manifest("db", "docs").gen_dir(1)
    partials = os.path.join(gdir, "_partials")
    kept = os.path.join(gdir, "postings", "part-00000.parquet")
    kept_mtime = os.path.getmtime(kept)
    # simulate a failed postings stage: one partition entry + file lost
    os.unlink(os.path.join(partials, "postings-00002.json"))
    os.unlink(os.path.join(gdir, "postings", "part-00002.parquet"))

    info2 = build_index(f"{SF}/documents.parquet", c.manifest("db", "docs"),
                        key_field="doc_id", num_doc_parts=4, num_term_parts=4,
                        generation=1)
    assert os.path.getmtime(kept) == kept_mtime          # untouched partition skipped
    assert os.path.exists(os.path.join(gdir, "postings", "part-00002.parquet"))

    c2 = RetrievalCluster(loc)
    after = [(r["doc_id"], r["_score"]) for r in c2.search("db", "docs", q)[0]]
    assert before == after


def test_search_arrow_stream(ray_session, tmp_path):
    loc = str(tmp_path / "s8")
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "docs", SCHEMA, loc))
    build_index(f"{SF}/documents.parquet", c.manifest("db", "docs"),
                key_field="doc_id", num_doc_parts=2, num_term_parts=2)
    t = c.search_arrow("db", "docs", {"keyword": "merge", "fields": ["text"],
                                      "limit": 5})[0]
    assert t.schema.names == ["id", "score"]
    assert len(t) == 5
    assert t["score"].type == "float"
