"""Filter-tree match-set fuzzer: random and/or/not trees with exact / range /
analyzed-token / exists leaves (the reference's Utils.buildFilter grammar
plus the repo's not/exists extensions) run through the real engine as
match-all + filters, while an independent THREE-VALUED Python evaluator
computes the same mask row-by-row (Kleene logic: a null leaf stays unknown
through not/and/or and falls to False at the top — the engine's documented
SQL semantics). Exercises the filter compiler → Arrow kernels → candidate
gating end-to-end, including nulls, both serving algorithms, and
keyword+filter composition (filters gate matching, the keyword only scores —
Lucene BooleanQuery SHOULD + FILTER semantics)."""

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings

SCHEMA = ("st(field(_id,long),field(body,string,analyze),"
          "field(num,long),field(tag,string))")

WORDS = ["ant", "bee", "cat", "dog", "elk", "fox"]
TAGS = ["red", "green", "blue", None]


def _corpus(rng, n=60):
    rows = []
    for i in range(n):
        k = int(rng.integers(0, 6))
        rows.append({
            "_id": i,
            "body": " ".join(rng.choice(WORDS, k)) if k else "",
            "num": None if i % 13 == 7 else int(rng.integers(-5, 20)),
            "tag": TAGS[int(rng.integers(0, len(TAGS)))],
        })
    return rows


# ------------------------------------------------------------- tree model

def _gen_leaf(rng):
    roll = rng.random()
    if roll < 0.25:
        return {"field": "num", "value": int(rng.integers(-5, 20))}
    if roll < 0.40:
        return {"field": "tag", "value": str(rng.choice(["red", "green",
                                                         "blue", "black"]))}
    if roll < 0.60:
        lo, hi = sorted(rng.integers(-6, 21, size=2).tolist())
        which = rng.random()
        if which < 0.4:
            return {"field": "num", "min": int(lo), "max": int(hi)}
        if which < 0.7:
            return {"field": "num", "min": int(lo)}
        return {"field": "num", "max": int(hi)}
    if roll < 0.75:
        lo, hi = sorted([str(rng.choice(["blue", "green", "red"])),
                         str(rng.choice(["blue", "green", "red"]))])
        return {"field": "tag", "min": lo, "max": hi}
    if roll < 0.85:
        return {"field": str(rng.choice(["tag", "num"])),
                "exists": bool(rng.random() < 0.7)}
    # analyzed leaf: OR over the whitespace tokens of the value
    k = int(rng.integers(1, 3))
    return {"field": "body", "value": " ".join(rng.choice(WORDS, k))}


def _gen_tree(rng, depth=0):
    if depth >= 2 or rng.random() < 0.30:
        return _gen_leaf(rng)
    roll = rng.random()
    if roll < 0.2:
        return {"not": _gen_tree(rng, depth + 1)}
    op = "and" if roll < 0.6 else "or"
    return {op: [_gen_tree(rng, depth + 1)
                 for _ in range(int(rng.integers(1, 4)))]}


# ------------------------------------------------ independent evaluator
# THREE-VALUED (Kleene): leaves on null values return None; and/or/not
# propagate unknowns; the top level treats None as False — the engine's
# documented SQL semantics for the not/exists extensions.

def _ev_leaf(node, row):
    f = node["field"]
    v = row[f]
    if "exists" in node:
        return (v is not None) == bool(node["exists"])   # never unknown
    if f == "body":
        toks = set(v.split())
        return any(t in toks for t in str(node["value"]).split())
    if v is None:
        return None
    if "value" in node:
        return v == node["value"]
    ok = True
    if node.get("min") is not None:
        ok &= v >= node["min"]
    if node.get("max") is not None:
        ok &= v <= node["max"]
    return ok


def _ev3(tree, row):
    if "field" in tree:
        return _ev_leaf(tree, row)
    if "not" in tree:
        r = _ev3(tree["not"], row)
        return None if r is None else not r
    if "and" in tree:
        parts = [_ev3(c, row) for c in tree["and"]]
        if any(p is False for p in parts):
            return False
        return None if any(p is None for p in parts) else True
    parts = [_ev3(c, row) for c in tree["or"]]
    if any(p is True for p in parts):
        return True
    return None if any(p is None for p in parts) else False


def _ev(tree, row):
    return _ev3(tree, row) is True


# ------------------------------------------------------------------ test

@pytest.fixture(scope="module")
def filt_cluster(ray_session, tmp_path_factory):
    rng = np.random.default_rng(1618033)
    rows = _corpus(rng)
    loc = str(tmp_path_factory.mktemp("ffuzz"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "f", SCHEMA, loc))
    c.build_from_local("db", "f", rows, key_field="_id",
                       num_doc_parts=3, num_term_parts=2)
    return c, rows


@pytest.mark.parametrize("seed", [5, 23, 71, 311, 997, 4099])
def test_random_filters_match_reference_semantics(filt_cluster, seed):
    c, rows = filt_cluster
    rng = np.random.default_rng(seed)
    for _ in range(30):
        tree = _gen_tree(rng)
        want = {r["_id"] for r in rows if _ev(tree, r)}
        q = {"keyword": "*", "filters": tree, "fields": ["body"],
             "limit": 1000}
        got = {r["_id"] for r in c.search("db", "f", q)[0]}
        assert got == want, tree
        # keyword + filter: SAME match set (the keyword only scores —
        # zero-score filter-only matches included), both algorithms
        q2 = dict(q, keyword=str(rng.choice(WORDS)))
        for algo in ("taat", "bmw"):
            got2 = {r["_id"] for r in c.search("db", "f", q2,
                                               algorithm=algo)[0]}
            assert got2 == want, (tree, q2["keyword"], algo)
