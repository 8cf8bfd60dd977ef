"""Query-language match-set fuzzer: random query ASTs are rendered to the
SimpleQueryParser syntax and run through the real engine, while the SAME AST
is evaluated by an independent (slow, obviously-correct) Python evaluator
implementing Lucene BooleanQuery matching semantics. The two match SETS must
be identical — this exercises parser → clause model → searcher end-to-end
across every clause kind (terms, operators, phrases, prefixes, wildcards,
regexps, nested groups, min_should_match) without sharing any code with the
production parser. Scores are covered elsewhere (oracle_bm25, gates); this
pins MATCHING."""

import re

import numpy as np
import pytest

from byzer_retrieval_ray import RetrievalCluster, TableSettings

SCHEMA = "st(field(_id,long),field(body,string,analyze))"

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


# ---------------------------------------------------------------- corpus

def _corpus(rng, n=40):
    rows = []
    for i in range(n):
        k = int(rng.integers(0, 14))
        rows.append({"_id": i,
                     "body": " ".join(rng.choice(VOCAB, k)) if k else ""})
    return rows


# ------------------------------------------------------------- AST model
# node := ("term", t) | ("phrase", (t1, t2)) | ("prefix", p)
#       | ("wild", pat) | ("re", pat) | ("fuzzy", t, n)
#       | ("slopph", (t1, t2), n) | ("pprefix", t1, pre)
#       | ("group", [(op, node), ...])

def _gen_leaf(rng):
    roll = rng.random()
    t = str(rng.choice(VOCAB))
    if roll < 0.34:
        return ("term", t)
    if roll < 0.46:
        return ("phrase", (t, str(rng.choice(VOCAB))))
    if roll < 0.56:
        return ("prefix", t[: int(rng.integers(1, 4))])
    if roll < 0.66:
        # one '?' wildcard inside the token
        pos = int(rng.integers(0, len(t)))
        return ("wild", t[:pos] + "?" + t[pos + 1:])
    if roll < 0.74:
        # simple regexes: alternation of two vocab words, or prefix + .*
        if rng.random() < 0.5:
            return ("re", f"{t}|{rng.choice(VOCAB)}")
        return ("re", t[: int(rng.integers(1, 4))] + ".*")
    if roll < 0.84:
        # fuzzy: mangle the token (delete / substitute / transpose one
        # char) so edit distance 1-2 from some vocab word is common
        ops = int(rng.integers(0, 3))
        m = t
        for _ in range(ops):
            kind = int(rng.integers(0, 3))
            i = int(rng.integers(0, max(1, len(m) - 1)))
            if kind == 0 and len(m) > 2:
                m = m[:i] + m[i + 1:]                    # delete
            elif kind == 1:
                m = m[:i] + "z" + m[i + 1:]              # substitute
            elif len(m) > i + 1:
                m = m[:i] + m[i + 1] + m[i] + m[i + 2:]  # transpose
        return ("fuzzy", m, int(rng.integers(1, 3)))
    if roll < 0.93:
        return ("slopph", (t, str(rng.choice(VOCAB))),
                int(rng.integers(0, 4)))
    return ("pprefix", t, str(rng.choice(VOCAB))[: int(rng.integers(1, 4))])


def _gen_children(rng, depth):
    n = int(rng.integers(1, 5))
    out = []
    for _ in range(n):
        op = str(rng.choice(["", "", "", "+", "-"]))
        if depth < 2 and rng.random() < 0.25:
            node = ("group", _gen_children(rng, depth + 1))
        else:
            node = _gen_leaf(rng)
        out.append((op, node))
    # a clause set with ONLY prohibited members matches nothing by design;
    # keep at least one positive member so queries stay informative
    if all(op == "-" for op, _ in out):
        out[0] = ("", out[0][1])
    return out


def _render(node):
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "phrase":
        return '"' + " ".join(node[1]) + '"'
    if kind == "prefix":
        return node[1] + "*"
    if kind == "wild":
        return node[1]
    if kind == "re":
        return "/" + node[1] + "/"
    if kind == "fuzzy":
        return f"{node[1]}~{node[2]}"
    if kind == "slopph":
        return '"' + " ".join(node[1]) + f'"~{node[2]}'
    if kind == "pprefix":
        return f'"{node[1]} {node[2]}*"'
    return "(" + " ".join(op + _render(c) for op, c in node[1]) + ")"


def _render_top(children):
    return " ".join(op + _render(c) for op, c in children)


# ------------------------------------------------ independent evaluator

def _osa(a: str, b: str) -> int:
    """Optimal string alignment distance (one transposition = 1 edit) —
    the Lucene FuzzyQuery metric, independent DP implementation."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            c = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + c)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def _ev(node, toks):
    kind = node[0]
    if kind == "term":
        return node[1] in toks
    if kind == "phrase":
        p = list(node[1])
        return any(toks[i:i + len(p)] == p
                   for i in range(len(toks) - len(p) + 1))
    if kind == "prefix":
        return any(t.startswith(node[1]) for t in toks)
    if kind == "wild":
        rx = re.compile("".join("." if ch == "?" else re.escape(ch)
                                for ch in node[1]))
        return any(rx.fullmatch(t) for t in toks)
    if kind == "re":
        rx = re.compile(node[1])
        return any(rx.fullmatch(t) for t in toks)
    if kind == "fuzzy":
        return any(_osa(t, node[1]) <= node[2] for t in toks)
    if kind == "slopph":
        # default in-order sloppy semantics: positions i < j with
        # cost (j - i - 1) <= slop
        t1, t2 = node[1]
        return any(toks[i] == t1 and toks[j] == t2
                   for i in range(len(toks))
                   for j in range(i + 1, min(len(toks), i + 2 + node[2])))
    if kind == "pprefix":
        return any(toks[i] == node[1] and toks[i + 1].startswith(node[2])
                   for i in range(len(toks) - 1))
    return _ev_bool(node[1], toks, msm=0)


def _unwrap_top(children):
    """Mirror the engine's only-clause splice (Lucene query unwrapping): a
    single top-level SHOULD group IS the query — min_should_match applies to
    its members, not to the wrapper. Applied recursively."""
    while (len(children) == 1 and children[0][0] == ""
           and children[0][1][0] == "group"):
        children = children[0][1][1]
    return children


def _ev_bool(children, toks, msm):
    """Lucene BooleanQuery matching: all MUSTs, no NOTs, and ≥ the required
    number of SHOULDs (1 if there are shoulds and no musts, else msm)."""
    musts = [c for op, c in children if op == "+"]
    nots = [c for op, c in children if op == "-"]
    shoulds = [c for op, c in children if op == ""]
    if any(not _ev(m, toks) for m in musts):
        return False
    if any(_ev(n, toks) for n in nots):
        return False
    if not musts and not shoulds:
        return False
    need = msm if musts else max(1 if shoulds else 0, msm)
    if need == 0:
        return True
    return sum(_ev(s, toks) for s in shoulds) >= need


# ------------------------------------------------------------------ test

@pytest.fixture(scope="module")
def fuzz_cluster(ray_session, tmp_path_factory):
    rng = np.random.default_rng(271828)
    rows = _corpus(rng)
    loc = str(tmp_path_factory.mktemp("qfuzz"))
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "f", SCHEMA, loc))
    c.build_from_local("db", "f", rows, key_field="_id",
                       num_doc_parts=3, num_term_parts=2)
    toks = {r["_id"]: r["body"].split() for r in rows}
    return c, toks


@pytest.mark.parametrize("seed", [3, 17, 41, 97, 181, 443,
                                  739, 1009, 2357, 5011])
def test_random_queries_match_reference_semantics(fuzz_cluster, seed):
    c, toks = fuzz_cluster
    rng = np.random.default_rng(seed)
    n_checked = 0
    for _ in range(25):
        children = _gen_children(rng, 0)
        kw = _render_top(children)
        msm = int(rng.integers(0, 3))
        eff = _unwrap_top(children)
        want = {i for i, tt in toks.items()
                if _ev_bool(eff, tt, msm=msm)}
        q = {"keyword": kw, "fields": ["body"], "limit": 1000,
             "min_should_match": msm}
        got_bmw = {r["_id"] for r in c.search("db", "f", q,
                                              algorithm="bmw")[0]}
        assert got_bmw == want, (kw, msm, sorted(got_bmw ^ want))
        got_taat = {r["_id"] for r in c.search("db", "f", q,
                                               algorithm="taat")[0]}
        assert got_taat == want, (kw, msm)
        n_checked += 1
    assert n_checked == 25
