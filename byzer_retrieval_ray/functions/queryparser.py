"""SimpleQueryParser-subset keyword parsing.

The reference parses keywords with Lucene's ``SimpleQueryParser`` over a whitespace
analyzer (RetrievalWorker.java:339-341), default operator OR. Supported here — the
subset the reference's own tests exercise, plus the explicit operators:

    term term        → OR (SHOULD) terms
    +term            → required (MUST, scored)
    -term            → prohibited (MUST_NOT)
    a | b            → same as OR (the default operator is already OR)
    "a b c"          → phrase clause (consecutive positions, scored with
                       tf = phrase frequency and idf = Σ per-term idf, the Lucene
                       PhraseQuery/BM25 combination); +"a b" required phrase,
                       -"a b" prohibited phrase. Single-term quotes degrade to
                       plain terms (Lucene scores them as term queries).
    *                → match-all (handled upstream, RetrievalWorker.java:336-337)

Clause order for scoring is: plain SHOULD terms, MUST terms, SHOULD phrases, MUST
phrases (the float-addition order is fixed and mirrored by the oracle SQL).

Returns (should, must, must_not, phrases, must_phrases, not_phrases); analysis
stays whitespace-only.
"""

from __future__ import annotations

import re

_PHRASE_RE = re.compile(r'([+-]?)"([^"]*)"')


def parse_keyword(keyword: str):
    should: list[str] = []
    must: list[str] = []
    must_not: list[str] = []
    phrases: list[tuple[str, ...]] = []
    must_phrases: list[tuple[str, ...]] = []
    not_phrases: list[tuple[str, ...]] = []

    def take_phrase(m: re.Match) -> str:
        op, body = m.group(1), m.group(2)
        terms = tuple(body.split())
        if len(terms) == 1:
            # single-term phrase == term query (Lucene)
            (must if op == "+" else must_not if op == "-" else should).append(terms[0])
        elif terms:
            (must_phrases if op == "+" else not_phrases if op == "-"
             else phrases).append(terms)
        return " "

    rest = _PHRASE_RE.sub(take_phrase, keyword)
    for raw in rest.replace("|", " ").split():
        tok = raw
        quoted = tok.strip('"')
        if tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:].strip('"'))
        elif tok.startswith("-") and len(tok) > 1:
            must_not.append(tok[1:].strip('"'))
        elif quoted:
            should.append(quoted)
    return should, must, must_not, phrases, must_phrases, not_phrases
