"""Frozen conformance suite: the engine must reproduce tests/golden_webpages.json
(reference-shaped query set over the deterministic webpage corpus, expected results
frozen from the brute-force oracle) — rank-identical urls and float32-equal scores,
via both TAAT and block-max WAND."""

import json
import os

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.corpus import webpages

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden_webpages.json")))
PAGES_SCHEMA = ("st(field(url,string),field(warc_ts,date,sort),"
                "field(html,binary,no_index),field(text,string,analyze),"
                "field(lang,string))")


@pytest.fixture(scope="module")
def cluster(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_corpus")
    webpages.write_corpus(str(d), GOLDEN["n_rows"], rows_per_file=100)
    loc = str(tmp_path_factory.mktemp("golden_idx"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("web", "pages", PAGES_SCHEMA, loc))
    c.build_from_parquet("web", "pages", str(d), key_field="url",
                         version_field="warc_ts", extract=("html", "text"),
                         num_doc_parts=GOLDEN["n_parts"], num_term_parts=4)
    return c


@pytest.mark.parametrize("case_idx", range(len(GOLDEN["results"])))
def test_golden_case(cluster, case_idx):
    case = GOLDEN["results"][case_idx]
    q = case["query"]
    if q.get("op") == "filter":
        res = cluster.filter("web", "pages", {
            "filters": q.get("filters", {}), "sorts": q.get("sorts", []),
            "limit": q["limit"]})[0]
        assert [r["url"] for r in res] == case["urls"], q
        return
    for algorithm in ("taat", "bmw"):
        sq = SearchQuery("web", "pages", filters=q.get("filters", {}),
                         keyword=q["keyword"], fields=["text"], limit=q["limit"])
        res = cluster.search("web", "pages", sq, algorithm=algorithm)[0]
        assert [r["url"] for r in res] == case["urls"], (q, algorithm)
        np.testing.assert_allclose(
            np.array([r["_score"] for r in res], np.float32),
            np.array(case["scores"], np.float32), rtol=2e-6, err_msg=str(q))
