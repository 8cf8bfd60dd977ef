"""SimpleQueryParser-subset keyword parsing.

The reference parses keywords with Lucene's ``SimpleQueryParser`` over a whitespace
analyzer (RetrievalWorker.java:339-341), default operator OR. Supported here — the
subset the reference's own tests exercise, plus the explicit operators:

    term term        → OR (SHOULD) terms
    +term            → required (MUST, scored)
    -term            → prohibited (MUST_NOT)
    a | b            → same as OR (the default operator is already OR)
    "a b"            → NOT supported: phrase queries need positional postings, which
                       this index does not store; a quoted group degrades to OR of
                       its terms (documented divergence)
    *                → match-all (handled upstream, RetrievalWorker.java:336-337)

Returns (should, must, must_not) term lists; analysis stays whitespace-only.
"""

from __future__ import annotations


def parse_keyword(keyword: str) -> tuple[list[str], list[str], list[str]]:
    should: list[str] = []
    must: list[str] = []
    must_not: list[str] = []
    for raw in keyword.replace("|", " ").split():
        tok = raw
        quoted = tok.strip('"')
        if tok.startswith("+") and len(tok) > 1:
            must.append(tok[1:].strip('"'))
        elif tok.startswith("-") and len(tok) > 1:
            must_not.append(tok[1:].strip('"'))
        elif quoted:
            should.append(quoted)
    return should, must, must_not
