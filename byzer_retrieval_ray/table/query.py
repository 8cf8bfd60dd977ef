"""Client-facing records: TableSettings and SearchQuery.

JSON-compatible mirrors of the reference's records (TableSettings.java:16-24,
SearchQuery.java:18-142) — this is the API-conformance surface: a SearchQuery dict that
works against the reference works here.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any, Optional


@dataclass
class TableSettings:
    database: str
    table: str
    schema: str  # the compact DSL string, e.g. st(field(url,string),...)
    location: str
    num_shards: int = 1
    status: str = "open"

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "TableSettings":
        return cls(**json.loads(s))


@dataclass
class SearchQuery:
    """One retrieval query (keyword and/or vector recall).

    Fields mirror SearchQuery.java:18-142: ``filters`` is the and/or tree
    (Utils.java:258-304), ``sorts`` a list of single-entry {field: "asc"|"desc"} maps,
    ``keyword`` the SimpleQueryParser input ("*" = match-all), ``fields`` the analyzed
    fields searched (weight 1.0 each), ``vector``/``vectorField`` the KNN recall, and
    ``limit`` the per-shard and final top-k.
    """

    database: str
    table: str
    filters: dict = field(default_factory=dict)
    sorts: list = field(default_factory=list)
    keyword: Optional[str] = None
    fields: list = field(default_factory=list)
    vector: list = field(default_factory=list)
    vectorField: Optional[str] = None
    limit: int = 10
    # keyword-recall pagination cursor [score, doc_id] (Lucene
    # IndexSearcher.searchAfter shape — extension; the reference paginates by
    # re-running with a larger limit): only hits strictly after the cursor in
    # the (score desc, doc_id asc) total order are returned. Keyword-only —
    # hybrid RRF re-scores by rank, where a score cursor is meaningless.
    search_after: Optional[list] = None
    # Deep pagination for EVERY query kind (the elasticsearch ``from``
    # shape — extension; round-5): skip the first ``offset`` rows of the
    # final ranking. Works for keyword, vector, hybrid-RRF and unscored
    # filter queries — each shard ships its top (offset + limit), the
    # master merges/fuses the deepened lists and slices. Keyword/vector/
    # filter pages tile EXACTLY the ranking a deeper single query produces
    # (scores are depth-independent). Hybrid-RRF scores depend on the
    # fusion window (rank r in a depth-8 list ≠ absent from it), so an
    # offset page equals the [offset, offset+limit) slice of the fused
    # ranking computed at window offset+limit — the elasticsearch
    # rank_window_size semantics with the window pinned to offset+limit;
    # adjacent pages agree wherever recall membership does. Per-shard cost
    # grows with offset + limit — keyword queries should prefer
    # ``search_after`` for very deep pages (bounded cursor, no deepening);
    # the two are mutually exclusive.
    offset: int = 0
    # Lucene BooleanQuery.setMinimumNumberShouldMatch (extension — the
    # reference's SearchQuery has no knob for it): a hit must satisfy at
    # least this many of the keyword's SHOULD clauses (terms, phrases,
    # prefixes, fuzzies, wildcards, regexps — each clause counts once,
    # matched in ANY searched field; duplicate clauses count separately,
    # exactly like duplicate BooleanQuery subclauses). 0/1 = no-op (OR
    # queries already require one match). Keyword-only; MUST/MUST_NOT
    # clauses are unaffected and enforced as usual.
    min_should_match: int = 0
    # Query-time synonyms (extension — Lucene SynonymQuery, the shape a
    # synonym-aware analyzer produces): {term: [alternatives]}. A plain
    # TERM clause whose term has an entry scores as ONE pseudo-term over
    # the group — tf = Σ variant freqs per doc, df = max variant df (the
    # Lucene SynonymQuery/BM25 combination), so a doc matching only an
    # alternative scores as if it matched the query term. Term clauses
    # only (phrases/prefix/fuzzy/wildcard/regexp members are unaffected).
    synonyms: dict = field(default_factory=dict)
    # BM25F (extension — Lucene sandbox CombinedFieldQuery): score the
    # keyword's TERM clauses against one pseudo-field blending these fields
    # ("name" or "name^W", W ≥ 0 float): tf = Σ_f w_f·tf_f, doc length =
    # Σ_f w_f·quantized_len_f, avgdl = Σ_f w_f·sumTotalTermFreq_f / docCount
    # (docCount = max over fields), df = max over fields — the published
    # CombinedFieldQuery/BM25 blending. Term clauses only (+term/-term/^B
    # supported; phrases/prefix/fuzzy/wildcard/regexp/groups raise). When
    # set, ``fields`` is ignored.
    combined_fields: list = field(default_factory=list)
    # Lucene DisjunctionMaxQuery across fields (the elasticsearch dis_max /
    # multi_match type=best_fields shape — extension; the reference sums
    # per-field scores like a BooleanQuery). When set (0.0 ≤ tb ≤ 1.0),
    # each CLAUSE's per-field scores combine as
    # max + tie_breaker · (sum − max) instead of the default sum over
    # fields; per-clause results still add up in clause order. Matching,
    # gating (+/-/msm/filters) and the match set are unchanged — only
    # scoring differs, so tb=1.0 reproduces the sum path (up to one ulp)
    # and a single-field query is unaffected. Keyword recall only; forces
    # the exact TAAT path (BMW's per-clause block bounds assume sum
    # combination); incompatible with combined_fields (BM25F already
    # blends fields into one pseudo-field) and explain().
    dis_max_tie_breaker: Optional[float] = None
    # Sloppy-phrase term order (extension knob). True (default, frozen by
    # golden test + gate oracle): ``"a b"~N`` matches IN-ORDER alignments
    # only, one tightest match per last-term occurrence. False: Lucene
    # SloppyPhraseMatcher parity for NON-REPEATING terms — out-of-order
    # alignments match (a transposed adjacent pair costs 2, so ``"b a"~2``
    # matches ``a b``), matches enumerated by the published stream
    # algorithm with sloppy freq Σ 1/(1+matchLength); repeated phrase
    # terms use Lucene's collide/lesser/advanceRpts repeats grouping
    # (round-5). Exact phrases (~0 or no slop) are unaffected by this knob.
    slop_in_order: bool = True

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SearchQuery":
        known = {f: d[f] for f in cls.__dataclass_fields__ if f in d}
        return cls(**known)

    @classmethod
    def list_from_json(cls, s: str) -> list["SearchQuery"]:
        data = json.loads(s)
        if isinstance(data, dict):
            data = [data]
        return [cls.from_dict(d) for d in data]

    @property
    def has_keyword(self) -> bool:
        return self.keyword is not None

    @property
    def has_vector(self) -> bool:
        return self.vectorField is not None and len(self.vector) > 0
