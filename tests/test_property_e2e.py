"""Randomized end-to-end property test: random small corpora, random partition
counts and codecs — engine top-k must match the brute-force oracle exactly, and
dedup/upsert semantics must hold. Catches batch-boundary, empty-partition, empty-doc
and unicode-whitespace edge cases the fixed corpora can't."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings
from byzer_retrieval_ray.index.build import build_index
from tests.oracle_bm25 import OracleIndex

SCHEMA = ("st(field(_id,long),field(body,string,analyze),field(tag,string))")

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "Eta", "THETA",
         "iota", "k4ppa", "λmbda", "mu-mu", "nu.1", "xi,2", "o", "ρ"]


def _random_corpus(rng, n):
    rows = []
    for i in range(n):
        roll = rng.random()
        if roll < 0.08:
            body = ""                                  # empty doc
        elif roll < 0.12:
            body = "alpha beta\tgamma\n delta"    # unicode/odd whitespace
        else:
            k = int(rng.integers(1, 40))
            body = " ".join(rng.choice(VOCAB, k))
        rows.append({"_id": i, "body": body, "tag": f"t{int(rng.integers(0, 3))}"})
    return rows


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_random_corpus_matches_oracle(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 80))
    rows = _random_corpus(rng, n)
    loc = str(tmp_path / f"s{seed}")
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "t", SCHEMA, loc))
    import ray.data
    codec = "pfor" if seed % 2 else "varint"
    build_index(ray.data.from_items(rows), c.manifest("db", "t"), key_field="_id",
                num_doc_parts=int(rng.integers(1, 5)),
                num_term_parts=int(rng.integers(1, 4)), codec=codec)

    oracle = OracleIndex([r["_id"] for r in rows], [r["body"] for r in rows])
    tags = {r["_id"]: r["tag"] for r in rows}

    keywords = ["alpha", "alpha beta", "alpha beta gamma delta", "*",
                "+alpha beta", "alpha -beta", "+alpha +beta", "missingterm",
                "Eta THETA", "λmbda mu-mu", "alpha | eps",
                # phrases (positional) and prefixes (constant score), +/- forms
                '"alpha beta"', '"beta gamma delta"', '"alpha alpha"',
                '"alpha beta" gamma', '+"alpha beta" delta', 'eps -"alpha beta"',
                "alph*", "alph* beta", "+alph* eps", "gamma -alph*", "zz*"]
    for kw in keywords:
        for limit in (1, 5, 200):
            for algorithm in ("taat", "bmw"):
                q = SearchQuery("db", "t", keyword=kw, fields=["body"], limit=limit)
                res = c.search("db", "t", q, algorithm=algorithm)[0]
                oids, oscores = oracle.search(kw, limit)
                assert [r["_id"] for r in res] == oids.tolist(), (seed, kw, limit)
                np.testing.assert_allclose(
                    np.array([r["_score"] for r in res], np.float32), oscores,
                    rtol=2e-6, err_msg=f"{seed} {kw} {limit}")

    # filtered search with zero-score fill
    cand = [i for i, t in tags.items() if t == "t1"]
    q = SearchQuery("db", "t", keyword="alpha beta",
                    filters={"and": [{"field": "tag", "value": "t1"}]}, limit=500,
                    fields=["body"])
    res = c.search("db", "t", q)[0]
    oids, oscores = oracle.search("alpha beta", 500, candidate_ids=cand)
    assert [r["_id"] for r in res] == oids.tolist()
