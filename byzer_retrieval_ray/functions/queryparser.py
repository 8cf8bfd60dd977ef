"""SimpleQueryParser-subset keyword parsing.

The reference parses keywords with Lucene's ``SimpleQueryParser`` over a whitespace
analyzer (RetrievalWorker.java:339-341; all parser features enabled by the
two-arg constructor), default operator OR. Supported here:

    term term        → OR (SHOULD) terms
    +term            → required (MUST, scored)
    -term            → prohibited (MUST_NOT)
    a | b            → same as OR (the default operator is already OR)
    "a b c"          → phrase clause (consecutive positions, scored with
                       tf = phrase frequency and idf = Σ per-term idf, the Lucene
                       PhraseQuery/BM25 combination); +"a b" required phrase,
                       -"a b" prohibited phrase. Single-term quotes degrade to
                       plain terms (Lucene scores them as term queries).
    term*            → prefix clause, CONSTANT score 1.0 per matching doc (the
                       Lucene constant-score MultiTermQuery rewrite; the blended
                       rewrite's shared-idf scoring is a documented divergence);
                       +term* / -term* for required / prohibited prefixes.
    term~N           → fuzzy clause (N ∈ {1,2}; bare ``term~`` = 2, the Lucene
                       default): dictionary terms within edit distance N
                       (transpositions count 1 by default — OSA, the FuzzyQuery
                       automaton's metric), CONSTANT score 1.0 per matching doc
                       (Lucene's per-term boosted scoring is a documented
                       divergence); +/- variants supported.
    *                → match-all (handled upstream, RetrievalWorker.java:336-337)

Unsupported (documented): NEAR ``"a b"~N``, precedence ``( )``.

Clause order for scoring is: plain SHOULD terms, MUST terms, SHOULD phrases, MUST
phrases, SHOULD prefixes, MUST prefixes (the float-addition order is fixed and
mirrored by the oracle SQL). Analysis stays whitespace-only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_PHRASE_RE = re.compile(r'([+-]?)"([^"]*)"')
_FUZZY_RE = re.compile(r'^(.*?)~([012])?$')


@dataclass
class ParsedKeyword:
    should: list = field(default_factory=list)
    must: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    phrases: list = field(default_factory=list)        # tuples of terms
    must_phrases: list = field(default_factory=list)
    not_phrases: list = field(default_factory=list)
    prefixes: list = field(default_factory=list)       # prefix strings
    must_prefixes: list = field(default_factory=list)
    not_prefixes: list = field(default_factory=list)
    fuzzies: list = field(default_factory=list)        # (term, max_edits) pairs
    must_fuzzies: list = field(default_factory=list)
    not_fuzzies: list = field(default_factory=list)


def parse_keyword(keyword: str) -> ParsedKeyword:
    p = ParsedKeyword()

    def take_phrase(m: re.Match) -> str:
        op, body = m.group(1), m.group(2)
        terms = tuple(body.split())
        if len(terms) == 1:
            # single-term phrase == term query (Lucene)
            (p.must if op == "+" else p.must_not if op == "-"
             else p.should).append(terms[0])
        elif terms:
            (p.must_phrases if op == "+" else p.not_phrases if op == "-"
             else p.phrases).append(terms)
        return " "

    rest = _PHRASE_RE.sub(take_phrase, keyword)
    for raw in rest.replace("|", " ").split():
        tok = raw
        op = ""
        if tok[:1] in "+-" and len(tok) > 1:
            op, tok = tok[0], tok[1:]
        tok = tok.strip('"')
        if not tok:
            continue
        if tok.endswith("*") and len(tok) > 1:
            (p.must_prefixes if op == "+" else p.not_prefixes if op == "-"
             else p.prefixes).append(tok[:-1])
            continue
        m = _FUZZY_RE.match(tok)
        if m and len(m.group(1)) > 0:
            n_edits = int(m.group(2)) if m.group(2) else 2   # bare ~ = 2 (Lucene)
            (p.must_fuzzies if op == "+" else p.not_fuzzies if op == "-"
             else p.fuzzies).append((m.group(1), n_edits))
            continue
        (p.must if op == "+" else p.must_not if op == "-"
         else p.should).append(tok)
    return p
