"""Generate the frozen conformance corpus results (tests/golden_webpages.json).

~50 reference-shaped queries (FIXTURES.md §2) over the deterministic 400-page corpus,
expected top-k (doc urls + float32 BM25 scores) computed by the brute-force oracle.
Run once (python tests/golden_gen.py) and commit the JSON; the conformance test then
pins BOTH the engine and the oracle — a change that shifts ranking anywhere fails
loudly instead of silently moving both.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from byzer_retrieval_ray.corpus import webpages
from byzer_retrieval_ray.functions.murmur3 import route_np
from tests.oracle_bm25 import OracleIndex

N_ROWS = 400
N_PARTS = 4
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_webpages.json")


def corpus_docs():
    t = webpages.generate_rows(0, N_ROWS)
    rows = sorted(t.to_pylist(), key=lambda r: (r["url"], r["warc_ts"]))
    latest = {}
    for r in rows:
        latest[r["url"]] = r
    urls = sorted(latest)
    parts = route_np(np.array(urls, dtype=object), N_PARTS)
    doc_ids, ranks = [], {}
    for u, p in zip(urls, parts):
        r = ranks.get(int(p), 0)
        ranks[int(p)] = r + 1
        doc_ids.append((int(p) << 40) + r)
    return urls, doc_ids, [latest[u] for u in urls]


def golden_queries():
    v = webpages.vocab()
    qs = []
    for rank in (0, 1, 2, 5, 10, 50, 100, 500, 1500, 5000, 12000, 19000):
        qs.append({"keyword": str(v[rank]), "limit": 10})          # single terms
    for pair in ((0, 3), (1, 40), (7, 300), (2, 1500), (90, 9000)):
        qs.append({"keyword": f"{v[pair[0]]} {v[pair[1]]}", "limit": 10})
    qs.append({"keyword": f"{v[4]} {v[44]} {v[444]}", "limit": 10})
    qs.append({"keyword": f"{v[3]} {v[33]} {v[333]} {v[3333]}", "limit": 10})
    qs.append({"keyword": "absent_zz_term", "limit": 10})
    qs.append({"keyword": "*", "limit": 10})
    qs.append({"keyword": "*", "limit": 3})
    for kw in (str(v[0]), f"{v[1]} {v[9]}"):                        # limit variants
        qs.append({"keyword": kw, "limit": 1})
        qs.append({"keyword": kw, "limit": 100})
    for lang in ("en", "zh", "de"):                                 # filters
        qs.append({"keyword": f"{v[0]} {v[25]}", "limit": 50,
                   "filters": {"and": [{"field": "lang", "value": lang}]}})
    qs.append({"keyword": str(v[2]), "limit": 25,
               "filters": {"and": [{"field": "lang", "value": "en"},
                                   {"or": [{"field": "lang", "value": "zh"},
                                           {"field": "lang", "value": "en"}]}]}})
    for a, b in ((0, 120), (100, 399)):                             # warc_ts ranges
        t0 = int(webpages.EPOCH_2024 + a * 737_000_000)
        t1 = int(webpages.EPOCH_2024 + b * 737_000_000)
        qs.append({"keyword": str(v[6]), "limit": 20,
                   "filters": {"and": [{"field": "warc_ts", "min": t0, "max": t1}]}})
    for kw in (f"+{v[5]} {v[55]}", f"{v[5]} -{v[55]}", f"+{v[8]} +{v[88]}",
               f"{v[12]} | {v[120]}"):                              # operators
        qs.append({"keyword": kw, "limit": 10})
    # phrases (positional postings) and prefixes (constant score), incl. +/- forms
    for kw in (f'"{v[0]} {v[1]}"', f'"{v[2]} {v[5]} {v[9]}"',
               f'"{v[0]} {v[1]}" {v[30]}', f'+"{v[0]} {v[1]}" {v[7]}',
               f'{v[0]} -"{v[0]} {v[1]}"'):
        qs.append({"keyword": kw, "limit": 10})
    pfx = [str(v[0])[:2], str(v[100])[:3], "zzzz"]
    for kw in (f"{pfx[0]}*", f"{pfx[1]}* {v[4]}", f"+{pfx[0]}* {v[11]}",
               f"{v[6]} -{pfx[1]}*", f"{pfx[2]}*"):
        qs.append({"keyword": kw, "limit": 10})
    # sloppy phrases ("a b"~N: in-order tightest-chain, tf = Σ 1/(1+cost))
    for kw in (f'"{v[0]} {v[1]}"~2', f'"{v[1]} {v[0]}"~3',
               f'"{v[2]} {v[9]}"~1 {v[30]}', f'+"{v[0]} {v[2]}"~4',
               f'{v[0]} -"{v[0]} {v[1]}"~2'):
        qs.append({"keyword": kw, "limit": 10})
    # unscored filter op with sorts
    qs.append({"op": "filter", "limit": 15, "sorts": [{"warc_ts": "desc"}],
               "filters": {"and": [{"field": "lang", "value": "en"}]}})
    qs.append({"op": "filter", "limit": 7, "sorts": [{"url": "asc"}],
               "filters": {"and": [{"field": "lang", "value": "fr"}]}})
    return qs


def main():
    urls, doc_ids, docs = corpus_docs()
    id2url = dict(zip(doc_ids, urls))
    oracle = OracleIndex(doc_ids, [d["text"] for d in docs])
    by_id = dict(zip(doc_ids, docs))

    out = []
    for q in golden_queries():
        if q.get("op") == "filter":
            rows = [dict(url=u, warc_ts=int(d["warc_ts"].timestamp() * 1e6)
                         if hasattr(d["warc_ts"], "timestamp") else int(d["warc_ts"]),
                         lang=d["lang"])
                    for u, d in ((u, by_id[i]) for u, i in zip(urls, doc_ids))]
            # evaluate filter + sort + limit directly
            tree = q["filters"]["and"][0]
            sel = [r for r in rows if r[tree["field"]] == tree["value"]]
            keyfld = list(q["sorts"][0].keys())[0]
            rev = list(q["sorts"][0].values())[0] == "desc"
            sel.sort(key=lambda r: (r[keyfld],), reverse=rev)
            expected = [r["url"] for r in sel[:q["limit"]]]
            out.append({"query": q, "urls": expected, "scores": None})
            continue
        cand = None
        if "filters" in q:
            node = q["filters"]["and"][0]
            cand = []
            for i, d in zip(doc_ids, docs):
                ok = True
                for nd in q["filters"]["and"]:
                    if "value" in nd:
                        ok &= d[nd["field"]] == nd["value"]
                    else:
                        ts = d["warc_ts"]
                        ts_us = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") else int(ts)
                        if nd.get("min") is not None:
                            ok &= ts_us >= nd["min"]
                        if nd.get("max") is not None:
                            ok &= ts_us <= nd["max"]
                    if not ok:
                        break
                # nested or: handled only for the lang case above (en AND (zh OR en))
                if ok and any("or" in nd for nd in q["filters"]["and"]):
                    ornode = [nd for nd in q["filters"]["and"] if "or" in nd][0]
                    ok &= any(d[leaf["field"]] == leaf["value"] for leaf in ornode["or"])
                if ok:
                    cand.append(i)
        ids, scores = oracle.search(q["keyword"], q["limit"], candidate_ids=cand)
        out.append({"query": q,
                    "urls": [id2url[int(i)] for i in ids],
                    "scores": [float(s) for s in scores]})
    with open(GOLDEN, "w") as f:
        json.dump({"n_rows": N_ROWS, "n_parts": N_PARTS, "results": out}, f, indent=1)
    print(f"wrote {GOLDEN}: {len(out)} queries")


if __name__ == "__main__":
    main()
