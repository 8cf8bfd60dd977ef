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

    def _term_weight(self, term: str, dtype):
        post = self.postings.get(term, {})
        df = len(post)
        idf = dtype(np.log(1.0 + (self.n - df + 0.5) / (df + 0.5)))
        return dtype(dtype(1.0) * idf * dtype(K1 + 1.0))

    def _phrase_freqs(self, terms: tuple) -> dict[int, int]:
        """doc → exact phrase frequency (consecutive-token scan)."""
        out: dict[int, int] = {}
        k = len(terms)
        want = list(terms)
        for d, toks in zip(self.doc_ids, self.toks):
            c = sum(1 for j in range(len(toks) - k + 1) if toks[j:j + k] == want)
            if c:
                out[d] = c
        return out

    def _sloppy_freqs(self, terms: tuple, slop: int) -> dict[int, float]:
        """doc → Lucene-style sloppy frequency for the documented in-order
        semantics: one tightest chain per last-term occurrence (rightmost
        predecessor strictly left at each step), kept when
        cost = span − (len−1) ≤ slop, each contributing 1/(1+cost).
        Naive per-doc list scan — independent of the engine's vectorized path."""
        out: dict[int, float] = {}
        k = len(terms)
        for d, toks in zip(self.doc_ids, self.toks):
            pos = {t: [i for i, w in enumerate(toks) if w == t]
                   for t in set(terms)}
            if any(not pos[t] for t in terms):
                continue
            f = 0.0
            for q in pos[terms[-1]]:
                cur, complete = q, True
                for t in reversed(terms[:-1]):
                    prev = [p for p in pos[t] if p < cur]
                    if not prev:
                        complete = False
                        break
                    cur = prev[-1]
                if complete:
                    cost = (q - cur) - (k - 1)
                    if cost <= slop:
                        f += 1.0 / (1.0 + cost)
            if f:
                out[d] = f
        return out

    def _prefix_docs(self, prefix: str) -> set[int]:
        docs: set[int] = set()
        for term, post in self.postings.items():
            if term.startswith(prefix):
                docs |= set(post)
        return docs

    def search(self, keyword: str, limit: int, dtype=np.float32,
               candidate_ids: list[int] | None = None):
        """→ (ids, scores) ranked by score desc, doc_id asc. Supports the
        SimpleQueryParser subset: OR terms, +must, -must_not, "a b" phrases
        (Lucene PhraseQuery/BM25: tf = phrase freq, idf = Σ per-term idf) and
        term* prefixes (constant score 1.0), each with +/- variants."""
        import re as _re

        cand = set(candidate_ids) if candidate_ids is not None else None
        if keyword.strip() == "*":
            ids = sorted(cand if cand is not None else self.doc_ids)[:limit]
            return np.array(ids, np.int64), np.ones(len(ids), dtype=dtype)

        phrases, must_phrases, not_phrases = [], [], []
        sphrases, must_sphrases, not_sphrases = [], [], []

        def _take(m):
            op, body, slop = m.group(1), m.group(2), m.group(3)
            terms = tuple(body.split())
            if len(terms) == 1:
                return f"{op}{terms[0]} "
            if terms and slop is not None and int(slop) > 0:
                sp = (terms, int(slop))
                (must_sphrases if op == "+" else not_sphrases if op == "-"
                 else sphrases).append(sp)
            elif terms:
                (must_phrases if op == "+" else not_phrases if op == "-"
                 else phrases).append(terms)
            return " "

        rest = _re.sub(r'([+-]?)"([^"]*)"(?:~(\d+))?', _take, keyword)
        should, must, must_not = [], [], []
        must_groups = []
        prefixes, must_prefixes, not_prefixes = [], [], []

        def _take_group(m):
            op, body = m.group(1), m.group(2)
            terms = [t for t in body.replace("|", " ").split() if t]
            if not terms:
                return " "
            if op == "+":
                if len(terms) == 1:
                    must.append(terms[0])
                else:
                    must_groups.append(tuple(terms))
            elif op == "-":
                must_not.extend(terms)
            else:
                should.extend(terms)
            return " "

        rest = _re.sub(r'([+-]?)\(([^()]*)\)', _take_group, rest)
        for raw in rest.replace("|", " ").split():
            op, tok = "", raw
            if tok[:1] in "+-" and len(tok) > 1:
                op, tok = tok[0], tok[1:]
            if not tok:
                continue
            if tok.endswith("*") and len(tok) > 1:
                (must_prefixes if op == "+" else not_prefixes if op == "-"
                 else prefixes).append(tok[:-1])
            else:
                (must if op == "+" else must_not if op == "-"
                 else should).append(tok)

        phrase_docs = {ph: self._phrase_freqs(ph)
                       for ph in phrases + must_phrases + not_phrases}
        sphrase_docs = {sp: self._sloppy_freqs(*sp)
                        for sp in sphrases + must_sphrases + not_sphrases}
        prefix_sets = {pre: self._prefix_docs(pre)
                       for pre in prefixes + must_prefixes + not_prefixes}
        for grp in must_groups:
            docs = set()
            for t in grp:
                docs |= set(self.postings.get(t, {}))
            cand = docs if cand is None else cand & docs
        for t in must:
            docs = set(self.postings.get(t, {}))
            cand = docs if cand is None else cand & docs
        for ph in must_phrases:
            docs = set(phrase_docs[ph])
            cand = docs if cand is None else cand & docs
        for sp in must_sphrases:
            docs = set(sphrase_docs[sp])
            cand = docs if cand is None else cand & docs
        for pre in must_prefixes:
            docs = set(prefix_sets[pre])
            cand = docs if cand is None else cand & docs
        banned = set()
        for t in must_not:
            banned |= set(self.postings.get(t, {}))
        for ph in not_phrases:
            banned |= set(phrase_docs[ph])
        for sp in not_sphrases:
            banned |= set(sphrase_docs[sp])
        for pre in not_prefixes:
            banned |= prefix_sets[pre]
        if cand is not None:
            cand -= banned
        zero_fill = candidate_ids is not None and not must and not must_phrases \
            and not must_sphrases and not must_prefixes and not must_groups
        norm_of = dict(zip(self.doc_ids, self.norm_bytes))
        avgdl = dtype(self.sum_ttf / float(self.n))

        def ninv_of(d):
            dl = dtype(LENGTH_TABLE[norm_of[d]])
            return dtype(1.0) / (dtype(K1) * ((dtype(1.0) - dtype(B)) + dtype(B) * dl / avgdl))

        acc: dict[int, float] = {}

        def add(d, s):
            if cand is not None and d not in cand:
                return
            if d in banned:
                return
            acc[d] = acc.get(d, 0.0) + float(s)

        group_terms = [t for g in must_groups for t in g]
        # clause order: should, must, group members, phrases, prefixes
        for term in should + must + group_terms:
            post = self.postings.get(term)
            if not post:
                continue
            w = self._term_weight(term, dtype)
            for d, tf in post.items():
                add(d, w - w / (dtype(1.0) + dtype(tf) * ninv_of(d)))
        for ph in phrases + must_phrases:
            freqs = phrase_docs[ph]
            if not freqs:
                continue
            w = dtype(sum(self._term_weight(t, dtype) for t in ph))
            for d, tf in freqs.items():
                add(d, w - w / (dtype(1.0) + dtype(tf) * ninv_of(d)))
        for sp in sphrases + must_sphrases:
            freqs = sphrase_docs[sp]
            if not freqs:
                continue
            w = dtype(sum(self._term_weight(t, dtype) for t in sp[0]))
            for d, tf in freqs.items():
                add(d, w - w / (dtype(1.0) + dtype(tf) * ninv_of(d)))
        for pre in prefixes + must_prefixes:
            for d in prefix_sets[pre]:
                add(d, dtype(1.0))
        scored = {d: dtype(s) for d, s in acc.items()}
        if cand is not None and zero_fill:
            for d in cand:
                scored.setdefault(d, dtype(0.0))
        items = sorted(scored.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:limit]
        if not items:
            return np.empty(0, np.int64), np.empty(0, dtype)
        ids, scores = zip(*items)
        return np.array(ids, np.int64), np.array(scores, dtype=dtype)
