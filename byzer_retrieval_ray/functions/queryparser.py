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
    t?st, s*t        → wildcard clause (EXTENSION — Lucene WildcardQuery
                       semantics, which SimpleQueryParser itself does not
                       expose): ``?`` matches exactly one character, ``*`` any
                       sequence; a token whose only wildcard is one trailing
                       ``*`` stays a prefix clause. CONSTANT score 1.0 per doc
                       containing ≥1 dictionary term matching the pattern
                       (constant-score MultiTermQuery rewrite, like prefix/
                       fuzzy); +/- variants supported. ``\?``/``\*`` escape to
                       literal characters. The literal prefix before the first
                       wildcard bounds the dictionary scan; a leading-wildcard
                       pattern scans the full term dictionary (as Lucene's
                       does) with a vectorized RE2 kernel.
    "a b*"           → phrase-prefix (EXTENSION — the Lucene
                       MultiPhraseQuery/autocomplete shape): a trailing ``*``
                       on the LAST quoted token matches docs where the
                       leading terms are followed by ANY dictionary term
                       starting with that prefix (one union position slot,
                       Lucene MultiPhraseQuery semantics). CONSTANT score
                       1.0 per matching doc (the constant-score multi-term
                       rewrite, like prefix/fuzzy/wildcard — Lucene's
                       summed-idf MultiPhraseQuery scoring is a documented
                       divergence); +/- variants supported. ``"so*"`` with a
                       single token degrades to a prefix clause.
    /re/             → regexp clause (EXTENSION — Lucene RegexpQuery via the
                       classic QueryParser's ``/re/`` delimiters, which
                       SimpleQueryParser itself does not expose): dictionary
                       terms FULLY matching the RE2 regex (implicit ^…$
                       anchors, Lucene semantics). ``|``, ``( )``, spaces and
                       every other parser special are LITERAL regex syntax
                       between the slashes; ``\/`` is a literal slash. The
                       leading literal-character run of the pattern bounds
                       the dictionary scan (Lucene's automaton common-prefix
                       optimisation); a pattern starting with a regex
                       metacharacter scans the full dictionary through one
                       vectorized RE2 kernel per term range. CONSTANT score
                       1.0 per doc containing ≥1 matching dictionary term
                       (constant-score MultiTermQuery rewrite, like prefix/
                       fuzzy/wildcard); ``+/re/`` / ``-/re/`` variants
                       supported. A ``/`` at a TOKEN START opens a regexp
                       that runs GREEDILY to the next unescaped ``/``
                       anywhere in the query (Lucene classic-parser
                       behavior; the pattern may span whitespace), so
                       ``/usr /bin`` is the regexp "usr " plus the term
                       "bin" — escape as ``\/usr`` to query a path term.
                       A mid-token ``/`` (``path/term``) stays literal, and
                       a leading ``/`` with no closing slash degrades to a
                       plain term.
    "a b"~N          → sloppy phrase (Lucene NEAR): IN-ORDER matches whose window
                       cost (span − (len−1) extra gap tokens) is ≤ N, scored with
                       the Lucene sloppy-frequency tf = Σ 1/(1+cost) over one
                       tightest match per last-term occurrence and the same
                       Σ per-term idf weight as exact phrases. ~0 ≡ exact phrase
                       (identical docs AND scores). Documented divergence from
                       Lucene's SloppyPhraseMatcher: out-of-order (transposed)
                       matches are not matched, and overlapping-window
                       enumeration differs for phrases with repeated terms.
    ( ... )          → grouping, parsed RECURSIVELY (round 4): groups may hold
                       any clause type — phrases, prefixes, fuzzies, sloppy
                       phrases, +/- operators, nested groups. The parse tree
                       is flattened into the engine's flat clause model by
                       boolean algebra, EXACTLY where the algebra is exact:
                         (a (b | c))        → a OR b OR c   (OR of OR flattens)
                         +(a "b c")         → required group {a, phrase};
                                              members score as SHOULD clauses
                                              (Lucene MUST BooleanQuery subclause)
                         +(a +b -c)         → +b -c with a scoring-only
                                              (group match ⟺ b ∧ ¬c; a scores)
                         -(a | "b c")       → -a -"b c"    (De Morgan)
                         -(+a b)            → -a            (group match ⟺ a)
                         (a +b) as the ONLY top-level clause → spliced wholesale
                       The two flat-inexpressible shapes are kept as NESTED
                       nodes and evaluated recursively (round-4 second wave):
                         foo (bar +baz)     → should_group: matches where its
                                              own musts/nots say; members
                                              score only inside that set
                         -(+a +b), -(a -b)  → not_group: excluded conjunction
                       Unbalanced parens still raise.
    term^B           → boosted term (EXTENSION — the classic Lucene
                       QueryParser boost; SimpleQueryParser has none): the
                       clause weight multiplies by B (float ≥ 0). Linear in
                       the BM25 weight, so ``merge^2`` scores exactly like
                       ``merge merge``; boosts are additive across
                       occurrences (``merge^2 merge`` ≡ ×3). Plain terms
                       only (+term^B boosts a required term; boosts on
                       prohibited terms are ignored — Lucene does the same);
                       ``\^`` escapes a literal caret.
    *                → match-all (handled upstream, RetrievalWorker.java:336-337)
    \X               → escape (Lucene SimpleQueryParser ESCAPE): the next
                       character loses its operator meaning and stays in the
                       token — ``\+foo`` is the literal term "+foo", ``foo\*``
                       the term "foo*", ``\"a`` a literal quote (the whitespace
                       analyzer indexes such tokens verbatim, so they are real
                       dictionary terms). A backslash before a non-special
                       character is dropped (Lucene behavior); ``\\`` is a
                       literal backslash.

``must_groups`` members are TYPED: a plain ``str`` is a term; other clause
kinds are tuples ``("phrase", terms)``, ``("slop", terms, n)``,
``("prefix", p)``, ``("fuzzy", term, n)``. Non-term members are also appended
to the matching SHOULD list so they fetch and score; term members score via
the searcher's group_terms path (unchanged from round 3).

Clause order for scoring is: plain SHOULD terms, MUST terms, group member
terms, SHOULD phrases, MUST phrases, SHOULD/MUST sloppy phrases, SHOULD
prefixes, MUST prefixes (the float-addition order is fixed and mirrored by
the oracle SQL). Analysis stays whitespace-only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_FUZZY_RE = re.compile(r'^(.*?)~([012])?$')
_BOOST_RE = re.compile(r'^(.+)\^(\d+(?:\.\d+)?)$')
_SLOP_RE = re.compile(r'~(\d+)')

# ESCAPE: \<special> hides the char from every parser pass via a private-use
# sentinel, restored verbatim in the emitted terms
_SPECIALS = '+-"*~()|\\?^/'
_SENTINEL = {c: chr(0xE000 + i) for i, c in enumerate(_SPECIALS)}
_UNSENTINEL = {v: k for k, v in _SENTINEL.items()}
_ESCAPE_RE = re.compile(r'\\(.)')
_SENTINEL_RE = re.compile('[' + ''.join(_UNSENTINEL) + ']')


def escape_term(term: str) -> str:
    """Backslash-escape every parser special so ``term`` round-trips the
    parser as ONE plain term (programmatic query builders: more_like_this)."""
    return "".join("\\" + c if c in _SPECIALS else c for c in term)


def _hide_escapes(keyword: str) -> str:
    # \special → sentinel(special); \other → other (Lucene drops the backslash)
    return _ESCAPE_RE.sub(lambda m: _SENTINEL.get(m.group(1), m.group(1)),
                          keyword)


def _restore(term: str) -> str:
    return _SENTINEL_RE.sub(lambda m: _UNSENTINEL[m.group(0)], term)


def _restore_pattern(pat: str) -> str:
    """Wildcard patterns restore escaped ``*``/``?`` BACKSLASH-escaped so the
    dictionary expansion can tell literal characters from wildcard operators
    (``te\\*t?`` → pattern ``te\\*t?``: literal star, one-char wildcard)."""
    return _SENTINEL_RE.sub(
        lambda m: ("\\" + _UNSENTINEL[m.group(0)])
        if _UNSENTINEL[m.group(0)] in "*?" else _UNSENTINEL[m.group(0)], pat)


def _restore_regexp(pat: str) -> str:
    """Regexp patterns restore EVERY escaped special backslash-escaped: the
    user's ``\\+`` inside ``/re/`` is RE2 syntax for a literal plus and must
    reach the engine verbatim (RE2 treats ``\\<punct>`` as the literal
    character, so this is exactly what the user wrote)."""
    return _SENTINEL_RE.sub(lambda m: "\\" + _UNSENTINEL[m.group(0)], pat)


def _restore_member(m):
    if isinstance(m, str):
        return _restore(m)
    if m[0] in ("phrase",):
        return (m[0], tuple(_restore(t) for t in m[1]))
    if m[0] == "slop":
        return (m[0], tuple(_restore(t) for t in m[1]), m[2])
    if m[0] == "pprefix":
        return (m[0], tuple(_restore(t) for t in m[1]), _restore(m[2]))
    if m[0] == "prefix":
        return (m[0], _restore(m[1]))
    if m[0] == "wildcard":
        return (m[0], _restore_pattern(m[1]))
    if m[0] == "regexp":
        return (m[0], _restore_regexp(m[1]))
    if m[0] == "fuzzy":
        return (m[0], _restore(m[1]), m[2])
    if m[0] == "group":
        # nested node: restore in place (idempotent — a node reachable both
        # as a should_group and a must_group member restores once; the
        # second pass finds no sentinels). Identity is preserved.
        return (m[0], _restore_parsed(m[1]))
    return m


def _restore_parsed(p: "ParsedKeyword") -> "ParsedKeyword":
    for name in ("should", "must", "must_not", "prefixes", "must_prefixes",
                 "not_prefixes"):
        setattr(p, name, [_restore(t) for t in getattr(p, name)])
    for name in ("wildcards", "must_wildcards", "not_wildcards"):
        setattr(p, name, [_restore_pattern(t) for t in getattr(p, name)])
    for name in ("regexps", "must_regexps", "not_regexps"):
        setattr(p, name, [_restore_regexp(t) for t in getattr(p, name)])
    for name in ("phrases", "must_phrases", "not_phrases"):
        setattr(p, name, [tuple(_restore(t) for t in tt)
                          for tt in getattr(p, name)])
    p.must_groups = [tuple(_restore_member(m) for m in g)
                     for g in p.must_groups]
    for name in ("fuzzies", "must_fuzzies", "not_fuzzies"):
        setattr(p, name, [(_restore(t), n) for t, n in getattr(p, name)])
    for name in ("slop_phrases", "must_slop_phrases", "not_slop_phrases"):
        setattr(p, name, [(tuple(_restore(t) for t in tt), n)
                          for tt, n in getattr(p, name)])
    for name in ("pphrases", "must_pphrases", "not_pphrases"):
        setattr(p, name, [(tuple(_restore(t) for t in tt), _restore(pre))
                          for tt, pre in getattr(p, name)])
    p.boosts = {_restore(t): b for t, b in p.boosts.items()}
    p.should_groups = [_restore_parsed(g) for g in p.should_groups]
    p.not_groups = [_restore_parsed(g) for g in p.not_groups]
    p.msm_units = [[_restore_member(m) for m in unit]
                   for unit in p.msm_units]
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
    wildcards: list = field(default_factory=list)      # pattern strings
    must_wildcards: list = field(default_factory=list)
    not_wildcards: list = field(default_factory=list)
    regexps: list = field(default_factory=list)        # RE2 pattern strings
    must_regexps: list = field(default_factory=list)
    not_regexps: list = field(default_factory=list)
    pphrases: list = field(default_factory=list)       # (terms tuple, prefix)
    must_pphrases: list = field(default_factory=list)
    not_pphrases: list = field(default_factory=list)
    boosts: dict = field(default_factory=dict)         # term → EXTRA weight
                                                       # beyond multiplicity
                                                       # (term^B adds B−1)
    must_groups: list = field(default_factory=list)    # tuples of typed members
                                                       # (str = term), each
                                                       # group required
    slop_phrases: list = field(default_factory=list)   # (terms tuple, slop) pairs
    must_slop_phrases: list = field(default_factory=list)
    not_slop_phrases: list = field(default_factory=list)
    # NESTED groups (round 4, second wave): the two shapes flat boolean
    # algebra cannot express are kept as sub-ParsedKeyword nodes and
    # evaluated recursively by the searcher —
    #   should_groups: `foo (bar +baz)` — an optional group whose inner
    #     +/- scope to the group alone: it MATCHES where its own musts/nots
    #     say, and its scoring members score only inside that match set
    #     (Lucene BooleanQuery-as-SHOULD-subclause semantics);
    #   not_groups: `-(+a +b)` / `-(a -b)` — an excluded conjunction: docs
    #     matching the sub-query are excluded from the result.
    should_groups: list = field(default_factory=list)  # ParsedKeyword nodes
    not_groups: list = field(default_factory=list)     # ParsedKeyword nodes
    # TOP-LEVEL SHOULD clause units for min_should_match counting (Lucene
    # counts BooleanQuery clauses BEFORE any flattening): each unit is a
    # list of typed members whose doc sets OR together — a plain clause is
    # a 1-member unit, a pure-OR group `(a | b)` is ONE unit of its
    # members, a nested group is a 1-member [("group", node)] unit.
    # Members spliced out of REQUIRED groups (scoring-only) and all MUST /
    # MUST_NOT clauses are NOT units.
    msm_units: list = field(default_factory=list)

    # ---- flatten helpers (group splicing) ----

    def _has_must(self) -> bool:
        return bool(self.must or self.must_phrases or self.must_slop_phrases
                    or self.must_prefixes or self.must_fuzzies
                    or self.must_wildcards or self.must_regexps
                    or self.must_pphrases or self.must_groups)

    def _has_not(self) -> bool:
        return bool(self.must_not or self.not_phrases or self.not_slop_phrases
                    or self.not_prefixes or self.not_fuzzies
                    or self.not_wildcards or self.not_regexps
                    or self.not_pphrases or self.not_groups)

    def _should_members(self) -> list:
        """Typed members of this (pure-OR) node, canonical order."""
        out: list = list(self.should)
        out += [("phrase", tt) for tt in self.phrases]
        out += [("slop", tt, n) for tt, n in self.slop_phrases]
        out += [("prefix", t) for t in self.prefixes]
        out += [("fuzzy", t, n) for t, n in self.fuzzies]
        out += [("wildcard", t) for t in self.wildcards]
        out += [("regexp", t) for t in self.regexps]
        out += [("pprefix", tt, pre) for tt, pre in self.pphrases]
        out += [("group", g) for g in self.should_groups]
        return out

    def _extend_all(self, sub: "ParsedKeyword") -> None:
        for name in ("should", "must", "must_not", "phrases", "must_phrases",
                     "not_phrases", "prefixes", "must_prefixes", "not_prefixes",
                     "fuzzies", "must_fuzzies", "not_fuzzies", "must_groups",
                     "slop_phrases", "must_slop_phrases", "not_slop_phrases",
                     "wildcards", "must_wildcards", "not_wildcards",
                     "regexps", "must_regexps", "not_regexps",
                     "pphrases", "must_pphrases", "not_pphrases",
                     "should_groups", "not_groups"):
            getattr(self, name).extend(getattr(sub, name))
        self._merge_boosts(sub)

    def _merge_boosts(self, sub: "ParsedKeyword") -> None:
        for t, b in sub.boosts.items():
            self.boosts[t] = self.boosts.get(t, 0.0) + b

    def _extend_should(self, sub: "ParsedKeyword") -> None:
        for name in ("should", "phrases", "slop_phrases", "prefixes",
                     "fuzzies", "wildcards", "regexps", "pphrases",
                     "should_groups"):
            getattr(self, name).extend(getattr(sub, name))
        self._merge_boosts(sub)

    def _extend_should_ex_terms(self, sub: "ParsedKeyword") -> None:
        """SHOULD lists except plain terms (term group-members score via the
        searcher's group_terms path — adding them to ``should`` too would
        double-score)."""
        for name in ("phrases", "slop_phrases", "prefixes", "fuzzies",
                     "wildcards", "regexps", "pphrases", "should_groups"):
            getattr(self, name).extend(getattr(sub, name))
        self._merge_boosts(sub)

    def _negate_members(self, members: list) -> None:
        for m in members:
            if isinstance(m, str):
                self.must_not.append(m)
            elif m[0] == "phrase":
                self.not_phrases.append(m[1])
            elif m[0] == "slop":
                self.not_slop_phrases.append((m[1], m[2]))
            elif m[0] == "prefix":
                self.not_prefixes.append(m[1])
            elif m[0] == "fuzzy":
                self.not_fuzzies.append((m[1], m[2]))
            elif m[0] == "wildcard":
                self.not_wildcards.append(m[1])
            elif m[0] == "regexp":
                self.not_regexps.append(m[1])
            elif m[0] == "pprefix":
                self.not_pphrases.append((m[1], m[2]))
            elif m[0] == "group":
                # -( ... (b +c) ... ): NOT of a nested group member —
                # exclude docs the sub-query matches
                self.not_groups.append(m[1])


def parse_keyword(keyword: str) -> ParsedKeyword:
    escaped = "\\" in keyword
    if escaped:
        keyword = _hide_escapes(keyword)
    p = _parse_query(keyword, top=True)
    return _restore_parsed(p) if escaped else p


def _scan_clauses(s: str) -> list[tuple[str, str, object]]:
    """(op, kind, payload) clause stream: kind ∈ {group, phrase, token}."""
    out: list[tuple[str, str, object]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace() or c == '|':
            i += 1
            continue
        op = ""
        if c in "+-" and i + 1 < n and s[i + 1] in '("':
            op, i = c, i + 1
            c = s[i]
        if c == '(':
            depth, j = 1, i + 1
            while j < n and depth:
                cj = s[j]
                if cj == '/' and (s[j - 1].isspace() or s[j - 1] in '(|'
                                  or (s[j - 1] in '+-'
                                      and (j - 2 < i
                                           or s[j - 2].isspace()
                                           or s[j - 2] in '(|'))):
                    # token-start /re/ inside the group: parens in the
                    # pattern are literal regex syntax — skip the span so
                    # they don't unbalance the depth count
                    j2 = s.find('/', j + 1)
                    if j2 > j + 1:
                        j = j2 + 1
                        continue
                if cj == '(':
                    depth += 1
                elif cj == ')':
                    depth -= 1
                j += 1
            if depth:
                raise ValueError(f"unbalanced parentheses in {s!r}")
            out.append((op, "group", s[i + 1:j - 1]))
            i = j
        elif c == ')':
            raise ValueError(f"unbalanced parentheses in {s!r}")
        elif c == '"':
            j = s.find('"', i + 1)
            if j < 0:
                # unterminated quote: lenient — treat as a plain token
                k = i
                while k < n and not s[k].isspace() and s[k] not in '|()':
                    k += 1
                out.append(("", "token", op + s[i:k]))
                i = k
            else:
                body, k, slop = s[i + 1:j], j + 1, None
                m = _SLOP_RE.match(s[k:]) if k < n and s[k] == '~' else None
                if m:
                    slop = int(m.group(1))
                    k += m.end()
                out.append((op, "phrase", (body, slop)))
                i = k
        else:
            # /re/ (or +/re/ / -/re/): scan to the CLOSING slash — `|`,
            # parens and spaces are literal regex syntax between the
            # delimiters (an escaped slash is already sentinel-hidden here,
            # so the next literal '/' really closes the pattern); an
            # unterminated '/' degrades to a plain token
            k0 = i + (1 if c in "+-" and i + 1 < n and s[i + 1] == "/" else 0)
            if s[k0:k0 + 1] == "/":
                j2 = s.find("/", k0 + 1)
                if j2 > k0 + 1:
                    out.append(("", "token", s[i:j2 + 1]))
                    i = j2 + 1
                    continue
            j = i
            while j < n and not s[j].isspace() and s[j] not in '|()':
                j += 1
            out.append(("", "token", s[i:j]))
            i = j
    return out


def _parse_query(s: str, top: bool) -> ParsedKeyword:
    p = ParsedKeyword()
    clauses = _scan_clauses(s)
    non_empty = [cl for cl in clauses
                 if not (cl[1] == "group" and not cl[2].strip())]
    # Lucene's BooleanQuery.simplify() unwraps a one-clause BooleanQuery at
    # EVERY level, so a group that is the sole clause of its level splices
    # wholesale (top or nested alike)
    only = len(non_empty) == 1
    for op, kind, payload in clauses:
        if kind == "group":
            if not str(payload).strip():
                continue
            sub = _parse_query(str(payload), top=False)
            _splice(p, sub, op, only_clause=only)
        elif kind == "phrase":
            body, slop = payload
            terms = tuple(body.split())
            if len(terms) >= 2 and slop is None and terms[-1].endswith("*") \
                    and len(terms[-1]) > 1 and "*" not in terms[-1][:-1] \
                    and "?" not in terms[-1]:
                # "a b*" phrase-prefix: leading terms + one union prefix slot
                pp = (terms[:-1], terms[-1][:-1])
                (p.must_pphrases if op == "+" else p.not_pphrases
                 if op == "-" else p.pphrases).append(pp)
                if op == "":
                    p.msm_units.append([("pprefix", pp[0], pp[1])])
            elif len(terms) == 1:
                # single-term phrase == term query (Lucene; slop is
                # irrelevant); a single quoted prefix/wildcard ("so*")
                # degrades to its unquoted clause via _take_token
                if "*" in terms[0] or "?" in terms[0]:
                    _take_token(p, op + terms[0])
                else:
                    (p.must if op == "+" else p.must_not if op == "-"
                     else p.should).append(terms[0])
                    if op == "":
                        p.msm_units.append([terms[0]])
            elif terms and slop is not None and slop > 0:
                sp = (terms, slop)
                (p.must_slop_phrases if op == "+" else p.not_slop_phrases
                 if op == "-" else p.slop_phrases).append(sp)
                if op == "":
                    p.msm_units.append([("slop", terms, slop)])
            elif terms:
                (p.must_phrases if op == "+" else p.not_phrases if op == "-"
                 else p.phrases).append(terms)
                if op == "":
                    p.msm_units.append([("phrase", terms)])
        else:
            _take_token(p, str(payload))
    return p


def _take_token(p: ParsedKeyword, raw: str) -> None:
    tok, op = raw, ""
    if tok[:1] in "+-" and len(tok) > 1:
        op, tok = tok[0], tok[1:]
    tok = tok.strip('"')
    if not tok:
        return
    if len(tok) >= 3 and tok[0] == "/" and tok[-1] == "/":
        # /re/ regexp clause (RE2 syntax between the delimiters, checked
        # BEFORE wildcard/prefix/fuzzy — the pattern may contain * ? ~ ^)
        (p.must_regexps if op == "+" else p.not_regexps if op == "-"
         else p.regexps).append(tok[1:-1])
        if op == "":
            p.msm_units.append([("regexp", tok[1:-1])])
        return
    core = tok[:-1] if tok.endswith("*") else tok
    if len(tok) > 1 and ("?" in tok or "*" in core):
        # mid-token / leading / repeated wildcard (a single trailing * alone
        # stays a prefix clause; wildcards don't combine with ~ — any ~ in
        # the token is a literal pattern character here)
        (p.must_wildcards if op == "+" else p.not_wildcards if op == "-"
         else p.wildcards).append(tok)
        if op == "":
            p.msm_units.append([("wildcard", tok)])
        return
    if tok.endswith("*") and len(tok) > 1:
        (p.must_prefixes if op == "+" else p.not_prefixes if op == "-"
         else p.prefixes).append(tok[:-1])
        if op == "":
            p.msm_units.append([("prefix", tok[:-1])])
        return
    m = _FUZZY_RE.match(tok)
    if m and len(m.group(1)) > 0:
        n_edits = int(m.group(2)) if m.group(2) else 2   # bare ~ = 2 (Lucene)
        (p.must_fuzzies if op == "+" else p.not_fuzzies if op == "-"
         else p.fuzzies).append((m.group(1), n_edits))
        if op == "":
            p.msm_units.append([("fuzzy", m.group(1), n_edits)])
        return
    mb = _BOOST_RE.match(tok)
    if mb:
        tok, b = mb.group(1), float(mb.group(2))
        if op != "-" and b != 1.0:
            # clause weight × B, additive across occurrences (boosts on
            # prohibited terms are ignored — non-scoring)
            p.boosts[tok] = p.boosts.get(tok, 0.0) + (b - 1.0)
    (p.must if op == "+" else p.must_not if op == "-"
     else p.should).append(tok)
    if op == "":
        p.msm_units.append([tok])


def _splice(p: ParsedKeyword, sub: ParsedKeyword, op: str,
            only_clause: bool = False) -> None:
    """Fold a parsed group into its parent by boolean algebra (exact cases
    only — see the module docstring's grouping table)."""
    has_must, has_not = sub._has_must(), sub._has_not()
    if op == "+":
        if has_must:
            # +(a +b -c) ≡ +b -c with a scoring-only: group match ⟺ inner
            # musts ∧ ¬inner nots; inner SHOULD clauses score when matched
            p._extend_all(sub)
            return
        members = sub._should_members()
        # inner exclusions promote either way: +( -c ...) requires ¬c —
        # including nested excluded-conjunction nodes (+(-(a -b) ...)
        # requires ¬(a ∧ ¬b) globally, since the group is required)
        for name in ("must_not", "not_phrases", "not_slop_phrases",
                     "not_prefixes", "not_fuzzies", "not_wildcards",
                     "not_regexps", "not_pphrases", "not_groups"):
            getattr(p, name).extend(getattr(sub, name))
        if not members:
            return
        if len(members) == 1:
            # +(x) == +x
            m = members[0]
            if isinstance(m, str):
                p.must.append(m)
            elif m[0] == "phrase":
                p.must_phrases.append(m[1])
            elif m[0] == "slop":
                p.must_slop_phrases.append((m[1], m[2]))
            elif m[0] == "prefix":
                p.must_prefixes.append(m[1])
            elif m[0] == "fuzzy":
                p.must_fuzzies.append((m[1], m[2]))
            elif m[0] == "wildcard":
                p.must_wildcards.append(m[1])
            elif m[0] == "regexp":
                p.must_regexps.append(m[1])
            elif m[0] == "pprefix":
                p.must_pphrases.append((m[1], m[2]))
            elif m[0] == "group":
                # +((b +c)): the nested group is required — a 1-member
                # must_group gates matching; the node also registers as a
                # should_group so its members fetch and score
                p.must_groups.append((m,))
                p.should_groups.append(m[1])
            return
        p.must_groups.append(tuple(members))
        p._extend_should_ex_terms(sub)   # non-term members fetch + score
        return
    if op == "-":
        if not has_must and not has_not:
            # -(a | "b c") ≡ -a -"b c" (De Morgan)
            p._negate_members(sub._should_members())
            return
        musts: list = list(sub.must)
        musts += [("phrase", tt) for tt in sub.must_phrases]
        musts += [("slop", tt, n) for tt, n in sub.must_slop_phrases]
        musts += [("prefix", t) for t in sub.must_prefixes]
        musts += [("fuzzy", t, n) for t, n in sub.must_fuzzies]
        musts += [("wildcard", t) for t in sub.must_wildcards]
        musts += [("regexp", t) for t in sub.must_regexps]
        musts += [("pprefix", tt, pre) for tt, pre in sub.must_pphrases]
        if len(musts) == 1 and not sub.must_groups and not has_not:
            # -(+a b) ≡ -a: the group matches iff its single required member
            # does (SHOULD members don't gate matching once a MUST exists)
            p._negate_members(musts)
            return
        if not musts and len(sub.must_groups) == 1 and not has_not:
            # -(+(a|b) c) ≡ -a -b
            p._negate_members(list(sub.must_groups[0]))
            return
        # -(+a +b) / -(a -b): excluded conjunction — not expressible flat;
        # kept as a nested node, evaluated recursively by the searcher
        # (docs matching the sub-query are excluded)
        p.not_groups.append(sub)
        return
    # SHOULD group
    if only_clause:
        # the group IS the (sub)query — Lucene's BooleanQuery.simplify()
        # unwraps a sole clause at every level, so min_should_match applies
        # to the group's OWN clauses, not to the one-clause wrapper
        p._extend_all(sub)
        p.msm_units.extend(sub.msm_units)
        return
    if not has_must and not has_not:
        p._extend_should(sub)           # OR of OR flattens
        p.must_groups.extend(sub.must_groups)
        # min_should_match counts the GROUP as one clause (Lucene counts
        # BooleanQuery clauses before flattening): one unit of its members
        members = sub._should_members()
        if members:
            p.msm_units.append(members)
        return
    # foo (bar +baz): the inner requirement scopes to the group alone —
    # kept as a nested node; it matches where its own musts/nots say and
    # its scoring members score only inside that match set (Lucene
    # BooleanQuery-as-SHOULD-subclause semantics)
    p.should_groups.append(sub)
    p.msm_units.append([("group", sub)])
