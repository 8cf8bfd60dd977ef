"""Single-process brute-force BM25 oracle (test-only).

Independent of the engine's posting/codec machinery: tokenizes with str.split, keeps
plain Python dict postings, and scores with the Lucene formula (k1=1.2, b=0.75, byte4
length quantization, float32 per-term scores accumulated in float64 then cast). The
distributed engine must match it rank-identically with equal float32 scores."""

from __future__ import annotations

import numpy as np

from byzer_retrieval_ray.functions.smallfloat import LENGTH_TABLE, int_to_byte4

K1, B = 1.2, 0.75


class OracleIndex:
    def __init__(self, doc_ids: list[int], texts: list[str]):
        self.doc_ids = list(doc_ids)
        self.toks = [t.split() for t in texts]
        self.dls = [len(t) for t in self.toks]
        self.norm_bytes = [int_to_byte4(dl) for dl in self.dls]
        self.n = len(doc_ids)
        self.sum_ttf = sum(self.dls)
        self.postings: dict[str, dict[int, int]] = {}
        for d, toks in zip(self.doc_ids, self.toks):
            for w in toks:
                self.postings.setdefault(w, {}).setdefault(d, 0)
                self.postings[w][d] += 1

    def search(self, keyword: str, limit: int, dtype=np.float32,
               candidate_ids: list[int] | None = None):
        """→ (ids, scores) ranked by score desc, doc_id asc. Supports the
        SimpleQueryParser subset: OR terms, +must, -must_not."""
        cand = set(candidate_ids) if candidate_ids is not None else None
        if keyword.strip() == "*":
            ids = sorted(cand if cand is not None else self.doc_ids)[:limit]
            return np.array(ids, np.int64), np.ones(len(ids), dtype=dtype)
        should = [t for t in keyword.replace("|", " ").split()
                  if not t.startswith(("+", "-"))]
        must = [t[1:] for t in keyword.split() if t.startswith("+") and len(t) > 1]
        must_not = [t[1:] for t in keyword.split() if t.startswith("-") and len(t) > 1]
        for t in must:
            docs = set(self.postings.get(t, {}))
            cand = docs if cand is None else cand & docs
        banned = set()
        for t in must_not:
            banned |= set(self.postings.get(t, {}))
        if cand is not None:
            cand -= banned
        zero_fill = candidate_ids is not None and not must
        norm_of = dict(zip(self.doc_ids, self.norm_bytes))
        avgdl = dtype(self.sum_ttf / float(self.n))
        acc: dict[int, float] = {}
        for term in should + must:   # clause order
            post = self.postings.get(term)
            if not post:
                continue
            df = len(post)
            idf = dtype(np.log(1.0 + (self.n - df + 0.5) / (df + 0.5)))
            w = dtype(dtype(1.0) * idf * dtype(K1 + 1.0))
            for d, tf in post.items():
                if cand is not None and d not in cand:
                    continue
                if d in banned:
                    continue
                dl = dtype(LENGTH_TABLE[norm_of[d]])
                ninv = dtype(1.0) / (dtype(K1) * ((dtype(1.0) - dtype(B)) + dtype(B) * dl / avgdl))
                s = w - w / (dtype(1.0) + dtype(tf) * ninv)
                acc[d] = acc.get(d, 0.0) + float(s)
        scored = {d: dtype(s) for d, s in acc.items()}
        if cand is not None and zero_fill:
            for d in cand:
                scored.setdefault(d, dtype(0.0))
        items = sorted(scored.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:limit]
        if not items:
            return np.empty(0, np.int64), np.empty(0, dtype)
        ids, scores = zip(*items)
        return np.array(ids, np.int64), np.array(scores, dtype=dtype)
