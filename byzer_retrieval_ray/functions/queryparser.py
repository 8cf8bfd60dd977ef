r"""SimpleQueryParser-subset keyword parsing.

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
    "a b"~N          → sloppy phrase (Lucene NEAR): IN-ORDER matches whose window
                       cost (span − (len−1) extra gap tokens) is ≤ N, scored with
                       the Lucene sloppy-frequency tf = Σ 1/(1+cost) over one
                       tightest match per last-term occurrence and the same
                       Σ per-term idf weight as exact phrases. ~0 ≡ exact phrase
                       (identical docs AND scores). Documented divergence from
                       Lucene's SloppyPhraseMatcher: out-of-order (transposed)
                       matches are not matched, and overlapping-window
                       enumeration differs for phrases with repeated terms.
    (a | b)          → grouping (Lucene SimpleQueryParser precedence): a bare
                       group of OR'd plain terms flattens into SHOULD terms;
                       ``+(a | b)`` is a required group — the doc must contain
                       at least one member, members score as term clauses
                       (Lucene MUST BooleanQuery subclause); ``-(a | b)``
                       excludes docs containing any member. Groups hold OR'd
                       plain terms only — nested groups or operators inside a
                       group raise (documented restriction).
    *                → match-all (handled upstream, RetrievalWorker.java:336-337)
    \X               → escape (Lucene SimpleQueryParser ESCAPE): the next
                       character loses its operator meaning and stays in the
                       token — ``\+foo`` is the literal term "+foo", ``foo\*``
                       the term "foo*", ``\"a`` a literal quote (the whitespace
                       analyzer indexes such tokens verbatim, so they are real
                       dictionary terms). A backslash before a non-special
                       character is dropped (Lucene behavior); ``\\`` is a
                       literal backslash.

Unsupported (documented): operators nested inside ``( )``.

Clause order for scoring is: plain SHOULD terms, MUST terms, SHOULD phrases, MUST
phrases, SHOULD/MUST sloppy phrases, SHOULD prefixes, MUST prefixes (the
float-addition order is fixed and mirrored by the oracle SQL). Analysis stays
whitespace-only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_PHRASE_RE = re.compile(r'([+-]?)"([^"]*)"(?:~(\d+))?')
_GROUP_RE = re.compile(r'([+-]?)\(([^()]*)\)')
_FUZZY_RE = re.compile(r'^(.*?)~([012])?$')

# ESCAPE: \<special> hides the char from every parser pass via a private-use
# sentinel, restored verbatim in the emitted terms
_SPECIALS = '+-"*~()|\\'
_SENTINEL = {c: chr(0xE000 + i) for i, c in enumerate(_SPECIALS)}
_UNSENTINEL = {v: k for k, v in _SENTINEL.items()}
_ESCAPE_RE = re.compile(r'\\(.)')
_SENTINEL_RE = re.compile('[' + ''.join(_UNSENTINEL) + ']')


def _hide_escapes(keyword: str) -> str:
    # \special → sentinel(special); \other → other (Lucene drops the backslash)
    return _ESCAPE_RE.sub(lambda m: _SENTINEL.get(m.group(1), m.group(1)),
                          keyword)


def _restore(term: str) -> str:
    return _SENTINEL_RE.sub(lambda m: _UNSENTINEL[m.group(0)], term)


def _restore_parsed(p: "ParsedKeyword") -> "ParsedKeyword":
    for name in ("should", "must", "must_not", "prefixes", "must_prefixes",
                 "not_prefixes"):
        setattr(p, name, [_restore(t) for t in getattr(p, name)])
    for name in ("phrases", "must_phrases", "not_phrases", "must_groups"):
        setattr(p, name, [tuple(_restore(t) for t in tt)
                          for tt in getattr(p, name)])
    for name in ("fuzzies", "must_fuzzies", "not_fuzzies"):
        setattr(p, name, [(_restore(t), n) for t, n in getattr(p, name)])
    for name in ("slop_phrases", "must_slop_phrases", "not_slop_phrases"):
        setattr(p, name, [(tuple(_restore(t) for t in tt), n)
                          for tt, n in getattr(p, name)])
    return p


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
    must_groups: list = field(default_factory=list)    # tuples of OR'd terms,
                                                       # each group required
    slop_phrases: list = field(default_factory=list)   # (terms tuple, slop) pairs
    must_slop_phrases: list = field(default_factory=list)
    not_slop_phrases: list = field(default_factory=list)


def parse_keyword(keyword: str) -> ParsedKeyword:
    p = ParsedKeyword()
    escaped = "\\" in keyword
    if escaped:
        keyword = _hide_escapes(keyword)

    def take_phrase(m: re.Match) -> str:
        op, body, slop = m.group(1), m.group(2), m.group(3)
        terms = tuple(body.split())
        if len(terms) == 1:
            # single-term phrase == term query (Lucene; slop is irrelevant)
            (p.must if op == "+" else p.must_not if op == "-"
             else p.should).append(terms[0])
        elif terms and slop is not None and int(slop) > 0:
            # "a b"~N, N>0 → sloppy phrase; ~0 is an exact phrase (Lucene)
            sp = (terms, int(slop))
            (p.must_slop_phrases if op == "+" else p.not_slop_phrases
             if op == "-" else p.slop_phrases).append(sp)
        elif terms:
            (p.must_phrases if op == "+" else p.not_phrases if op == "-"
             else p.phrases).append(terms)
        return " "

    rest = _PHRASE_RE.sub(take_phrase, keyword)

    def take_group(m: re.Match) -> str:
        op, body = m.group(1), m.group(2)
        terms = [t for t in body.replace("|", " ").split() if t]
        if any((t[:1] in "+-" and len(t) > 1) or t.endswith("*") or "~" in t
               or '"' in t for t in terms):
            raise ValueError(
                f"unsupported syntax inside group ({body}): groups contain "
                "OR'd plain terms only")
        if not terms:
            return " "
        if op == "+":
            if len(terms) == 1:
                p.must.append(terms[0])      # +(a) == +a
            else:
                p.must_groups.append(tuple(terms))
        elif op == "-":
            p.must_not.extend(terms)         # NOT(a OR b) == -a -b
        else:
            p.should.extend(terms)           # OR of OR flattens
        return " "

    if "(" in rest or ")" in rest:
        rest = _GROUP_RE.sub(take_group, rest)
        if "(" in rest or ")" in rest:
            raise ValueError(f"unbalanced or nested parentheses in {keyword!r}")
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
    return _restore_parsed(p) if escaped else p
