"""Query execution over a published index generation.

Per-bucket search (the ST1 equivalent of the reference's per-shard Lucene searcher,
RetrievalWorker.java:309-380) with *global* collection statistics, so results are
partition-count invariant (SURVEY.md §7.3 — an intentional improvement over the
reference's per-shard stats; the conformance configuration is the reference's 1-shard
setup, which we reproduce exactly at any parallelism).

Semantics replicated:
  * keyword parsing: whitespace terms, OR default (SimpleQueryParser subset); "*" →
    MatchAllDocsQuery with constant score 1.0 (RetrievalWorker.java:336-341)
  * filters are non-scoring FILTER clauses; with a keyword SHOULD clause present,
    filter-matching docs with zero keyword score still match (Lucene BooleanQuery
    semantics). Divergence note: the reference's and/or subtrees are added as MUST
    (Utils.java:263-275), which accidentally lets TermQuery filter leaves contribute
    BM25 score; we keep every filter non-scoring — deterministic and documented.
  * vector recall: cosine KNN scored (1 + cos) / 2 (Lucene VectorSimilarityFunction
    .COSINE), optional filter (RetrievalWorker.java:346-366)
  * unscored `filter` op: filter + typed multi-field sort + limit
    (RetrievalWorker.java:273-307)
  * ties broken by doc_id ascending (Lucene per-segment docID order)

Two scoring engines, verified identical in tests:
  * TAAT — vectorized term-at-a-time (numpy), the brute-force oracle path
  * BMW — block-max WAND: per-block (max_tf, min_norm) score bounds prune doc ranges
    below the running top-k threshold; surviving ranges are scored vectorized. This is
    the serving path the north rule mandates.
"""

from __future__ import annotations

import heapq
import logging
import os
import re
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from byzer_retrieval_ray.functions import bm25, codec, filters as F, \
    smallfloat
from byzer_retrieval_ray.functions.tokenize import tokenize_query
from byzer_retrieval_ray.index.manifest import read_json
from byzer_retrieval_ray.schema import dsl
from byzer_retrieval_ray.table.query import SearchQuery

_LOG = logging.getLogger(__name__)


class GenerationReader:
    """Paths, stats and term routing for one published generation (read-only)."""

    def __init__(self, manifest_data: dict, gen: int | None = None):
        self.m = manifest_data
        g = gen if gen is not None else manifest_data["generation"]
        self.gen = g
        if str(g) not in manifest_data.get("generations", {}):
            raise RuntimeError(
                f"table {manifest_data.get('database')}.{manifest_data.get('table')} "
                f"has no published generation {g}")
        self.info = manifest_data["generations"][str(g)]
        self.schema = dsl.parse_schema(manifest_data["schema"])
        self.analyzed = set(self.info["analyzed_fields"])
        self.stats = self.info["stats"]
        self.boundaries = self.info["boundaries"]
        self.bucket_spec = self.info["bucket_spec"]
        self.num_doc_parts = self.info["num_doc_parts"]
        self.key_field = self.info["key_field"]
        self.codec = self.info.get("codec", "varint")
        self._ts_cache: dict[int, dict] = {}   # range_part → {(field,term): (df,ttf)}

    def route_term(self, term: str) -> int:
        b = self.boundaries
        if not b:
            return 0
        lo, hi = 0, len(b)
        while lo < hi:
            mid = (lo + hi) // 2
            if b[mid] < term or b[mid] == term:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def docstore_path(self, bucket: int) -> str | None:
        e = self.info["docstore"].get(str(bucket))
        return e["path"] if e else None

    def docstore_paths(self, bucket: int) -> list[str]:
        """Docstore partition files of one SERVING bucket (a bucket groups
        ``bucket_spec.group`` consecutive doc partitions; sorted part order keeps
        stride doc_ids ascending across the concatenation)."""
        g = self.bucket_spec.get("group", 1)
        parts = [int(p) for p in self.info["docstore"].keys()
                 if int(p) // g == bucket]
        return [self.info["docstore"][str(p)]["path"] for p in sorted(parts)]

    def postings_path(self, range_part: int) -> str | None:
        e = self.info["postings"].get(str(range_part))
        return e["postings_path"] if e else None

    def termstats_path(self, range_part: int) -> str | None:
        e = self.info["postings"].get(str(range_part))
        return e["termstats_path"] if e else None

    def buckets(self) -> list[int]:
        g = self.bucket_spec.get("group", 1)
        return sorted({int(p) // g for p in self.info["docstore"].keys()})

    def term_stats(self, pairs: list[tuple[str, str]]) -> dict[tuple[str, str], tuple[int, int]]:
        """(field, term) → (df, ttf) global stats; missing terms → (0, 0).

        The per-range termstats table is held COLUMNAR — per field a sorted
        term array plus aligned df/ttf arrays, loaded once per range and probed
        with binary search (the per-row dict build dominated actor warm-up at
        sf0.1; the columnar load is one zero-copy pass)."""
        out = {p: (0, 0) for p in pairs}
        for f, t in pairs:
            r = self.route_term(t)
            self._load_ts_cache(r)
            fc = self._ts_cache[r].get(f)
            if fc is None:
                continue
            terms, df, ttf = fc
            i = int(np.searchsorted(terms, t))
            if i < terms.size and terms[i] == t:
                out[(f, t)] = (int(df[i]), int(ttf[i]))
        return out

    def _load_ts_cache(self, r: int) -> None:
        """range → {field: (sorted term array, df array, ttf array)}."""
        if r in self._ts_cache:
            return
        cache: dict = {}
        path = self.termstats_path(r)
        if path is not None and os.path.exists(path):
            tbl = pq.read_table(path).combine_chunks()
            terms_all = tbl["term"].to_numpy(zero_copy_only=False)
            df_all = tbl["df"].to_numpy()
            ttf_all = tbl["ttf"].to_numpy()
            # rows are written sorted by (field, term) — slice per field
            fdict = tbl["field"].combine_chunks().dictionary_encode()
            fcodes = fdict.indices.to_numpy(zero_copy_only=False)
            for ci, fld in enumerate(fdict.dictionary.to_pylist()):
                sel = np.flatnonzero(fcodes == ci)
                terms = terms_all[sel]
                if terms.size > 1 and not (terms[1:] >= terms[:-1]).all():
                    order = np.argsort(terms)       # legacy/unsorted layouts
                    sel = sel[order]
                    terms = terms_all[sel]
                cache[fld] = (terms, df_all[sel], ttf_all[sel])
        self._ts_cache[r] = cache

    def _sorted_terms(self, r: int) -> dict[str, np.ndarray]:
        """field → sorted term array of range r (prefix/fuzzy scans)."""
        self._load_ts_cache(r)
        return {f: v[0] for f, v in self._ts_cache[r].items()}

    def expand_prefix(self, field: str, prefix: str, limit: int = 1024) -> list[str]:
        """Terms of ``field`` starting with ``prefix`` (dictionary scan over the
        term-range partitions the prefix interval maps to). Expansion is capped
        at ``limit`` terms kept in SORTED order (ranges ascend, per-range lists
        are sorted \u2014 deterministic across runs); hitting the cap is logged."""
        import bisect
        out: list[str] = []
        lo_r = self.route_term(prefix)
        hi_r = self.route_term(prefix + "\uffff")
        for r in range(lo_r, hi_r + 1):
            lst = self._sorted_terms(r).get(field, [])
            i = bisect.bisect_left(lst, prefix)
            while i < len(lst) and lst[i].startswith(prefix):
                out.append(lst[i])
                i += 1
                if len(out) >= limit:
                    _LOG.warning(
                        "prefix expansion %r* on field %r hit the %d-term cap; "
                        "keeping the %d lexicographically smallest matches",
                        prefix, field, limit, limit)
                    return out
        return out

    def expand_fuzzy(self, field: str, term: str, n: int,
                     transpositions: bool = True, limit: int = 1024) -> list[str]:
        """Dictionary terms of ``field`` within edit distance ``n`` of ``term``.

        The edit-distance DP runs only over the survivors of the vectorized
        length-band + bag-distance prefilter (functions/fuzzy.fuzzy_candidates)
        \u2014 a term~N clause never DP-scans the whole dictionary. Matches are kept
        in sorted term order; the ``limit`` cap is deterministic (smallest terms
        kept) and logged when hit."""
        from byzer_retrieval_ray.functions.fuzzy import (edit_distance_within,
                                                         fuzzy_candidates)
        out: list[str] = []
        for r in range(max(self.info["num_term_parts"], 1)):
            lst = self._sorted_terms(r).get(field, [])
            if len(lst) == 0:
                continue
            lens = self._term_lens(r, field)
            cand_idx = fuzzy_candidates(term, lst, lens, n)
            if cand_idx.size == 0:
                continue
            cand = [lst[i] for i in cand_idx]
            mask = edit_distance_within(term, cand, n, transpositions)
            for i in np.flatnonzero(mask):
                out.append(cand[i])
                if len(out) >= limit:
                    _LOG.warning(
                        "fuzzy expansion %s~%d on field %r hit the %d-term cap; "
                        "keeping the %d lexicographically smallest matches",
                        term, n, field, limit, limit)
                    return out
        return out

    def expand_wildcard(self, field: str, pattern: str,
                        limit: int = 1024) -> list[str]:
        """Dictionary terms of ``field`` matching a Lucene WildcardQuery
        pattern (``*`` = any sequence, ``?`` = exactly one char; ``\\*``/``\\?``
        are literal). The literal prefix before the first wildcard bounds the
        scan to its term-range interval like expand_prefix; a leading-wildcard
        pattern scans every range's full dictionary (Lucene's WildcardQuery
        automaton does the same) through ONE vectorized RE2 kernel per range
        (pyarrow match_substring_regex), never a per-term Python loop. Matches
        stay in sorted term order; the ``limit`` cap is deterministic and
        logged when hit."""
        import bisect
        rx_parts, lit_parts, i, in_lit = [], [], 0, True
        while i < len(pattern):
            c = pattern[i]
            if c == "\\" and i + 1 < len(pattern):
                rx_parts.append(re.escape(pattern[i + 1]))
                if in_lit:
                    lit_parts.append(pattern[i + 1])
                i += 2
                continue
            if c == "*":
                rx_parts.append(".*")
                in_lit = False
            elif c == "?":
                rx_parts.append(".")
                in_lit = False
            else:
                rx_parts.append(re.escape(c))
                if in_lit:
                    lit_parts.append(c)
            i += 1
        rx = "^" + "".join(rx_parts) + "$"
        lit = "".join(lit_parts)
        out: list[str] = []
        lo_r = self.route_term(lit) if lit else 0
        hi_r = self.route_term(lit + "￿") if lit \
            else max(self.info["num_term_parts"], 1) - 1
        for r in range(lo_r, hi_r + 1):
            lst = self._sorted_terms(r).get(field, [])
            if len(lst) == 0:
                continue
            if lit:
                i0 = bisect.bisect_left(lst, lit)
                i1 = bisect.bisect_left(lst, lit + "￿", lo=i0)
                cand = lst[i0:i1]
            else:
                cand = lst
            if len(cand) == 0:
                continue
            mask = pc.match_substring_regex(
                pa.array(cand, pa.string()), rx).to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(mask):
                out.append(cand[i])
                if len(out) >= limit:
                    _LOG.warning(
                        "wildcard expansion %r on field %r hit the %d-term "
                        "cap; keeping the %d lexicographically smallest "
                        "matches", pattern, field, limit, limit)
                    return out
        return out

    def expand_regexp(self, field: str, pattern: str,
                      limit: int = 1024) -> list[str]:
        """Dictionary terms of ``field`` FULLY matching an RE2 regex (Lucene
        RegexpQuery semantics: the pattern is implicitly anchored ^…$).
        The pattern's leading literal-character run bounds the scan to its
        term-range interval (Lucene's automaton common-prefix optimisation);
        a pattern starting with a regex metacharacter scans every range's
        full dictionary through ONE vectorized RE2 kernel per range, never a
        per-term Python loop. Matches stay in sorted term order; the
        ``limit`` cap is deterministic and logged when hit."""
        import bisect
        # literal prefix: chars before the first RE2 metacharacter; an
        # escaped punctuation char (\.) contributes its literal. A trailing
        # literal whose NEXT pattern char is a quantifier (a* / a? / a{ )
        # must be dropped from the prefix — the quantifier may erase it.
        _META = set(".[]{}()*+?|^$\\")
        # a TOP-LEVEL alternation makes any leading literal run optional
        # (/brown|quick/ must not be bounded to the 'brown' term range) —
        # scan for an unescaped | at paren-depth 0 outside a char class
        depth, in_class, j, top_alt = 0, False, 0, False
        while j < len(pattern):
            cj = pattern[j]
            if cj == "\\":
                j += 2
                continue
            if in_class:
                in_class = cj != "]"
            elif cj == "[":
                in_class = True
            elif cj == "(":
                depth += 1
            elif cj == ")":
                depth = max(0, depth - 1)
            elif cj == "|" and depth == 0:
                top_alt = True
                break
            j += 1
        lit_parts: list[str] = []
        i = 0
        while not top_alt and i < len(pattern):
            c = pattern[i]
            if c == "\\" and i + 1 < len(pattern) \
                    and not pattern[i + 1].isalnum():
                nxt = pattern[i + 2:i + 3]
                if nxt in "*+?{":
                    break
                lit_parts.append(pattern[i + 1])
                i += 2
                continue
            if c in _META:
                break
            if pattern[i + 1:i + 2] in "*+?{":
                break
            lit_parts.append(c)
            i += 1
        lit = "".join(lit_parts)
        rx = "^(?:" + pattern + ")$"
        re.compile(rx)  # surface bad patterns as ValueError-ish here, once
        out: list[str] = []
        lo_r = self.route_term(lit) if lit else 0
        hi_r = self.route_term(lit + "￿") if lit \
            else max(self.info["num_term_parts"], 1) - 1
        for r in range(lo_r, hi_r + 1):
            lst = self._sorted_terms(r).get(field, [])
            if len(lst) == 0:
                continue
            if lit:
                i0 = bisect.bisect_left(lst, lit)
                i1 = bisect.bisect_left(lst, lit + "￿", lo=i0)
                cand = lst[i0:i1]
            else:
                cand = lst
            if len(cand) == 0:
                continue
            mask = pc.match_substring_regex(
                pa.array(cand, pa.string()), rx).to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(mask):
                out.append(cand[i])
                if len(out) >= limit:
                    _LOG.warning(
                        "regexp expansion %r on field %r hit the %d-term "
                        "cap; keeping the %d lexicographically smallest "
                        "matches", pattern, field, limit, limit)
                    return out
        return out

    def _term_lens(self, r: int, field: str) -> np.ndarray:
        """Cached length array of range r's sorted term list (the fuzzy length
        band then prunes without touching the strings)."""
        if not hasattr(self, "_term_lens_cache"):
            self._term_lens_cache: dict[tuple[int, str], np.ndarray] = {}
        key = (r, field)
        if key not in self._term_lens_cache:
            lst = self._sorted_terms(r).get(field, [])
            self._term_lens_cache[key] = np.array([len(t) for t in lst],
                                                  dtype=np.int64)
        return self._term_lens_cache[key]

    def tombstones(self) -> np.ndarray:
        """Tombstoned doc_ids of THIS generation (doc_ids are generation-scoped;
        files written before gen scoping existed apply to the manifest's current
        generation)."""
        ids: list[int] = []
        for p in self.m.get("tombstone_files", []):
            if os.path.exists(p):
                data = read_json(p)
                entry_gen = data.get("gen", self.m.get("generation"))
                if entry_gen == self.gen:
                    ids.extend(data["doc_ids"])
        return np.unique(np.array(ids, dtype=np.int64)) if ids else np.empty(0, np.int64)


class StatsView:
    """Collection statistics merged across ACTIVE generations (base + deltas).

    BM25 scoring needs one consistent (N, sum_ttf, df) view over all generations
    a query serves from. Like Lucene segments, tombstoned (replaced/deleted) docs
    still count toward the statistics until a compaction rebuilds the table —
    score drift from deletes is bounded and disappears on compact(). For a
    single-generation table this is exactly that generation's stats (byte-
    identical scores to a fresh full build)."""

    def __init__(self, manifest_data: dict, primary: GenerationReader):
        gens = manifest_data.get("active_generations") or \
            ([manifest_data["generation"]] if manifest_data.get("generation") else [])
        self.readers = [primary if int(g) == primary.gen
                        else GenerationReader(manifest_data, int(g)) for g in gens]
        n_docs = sum(r.stats["n_docs"] for r in self.readers)
        fields: dict[str, dict] = {}
        for r in self.readers:
            for fld, fs in r.stats["fields"].items():
                acc = fields.setdefault(fld, {"sum_ttf": 0, "doc_count": 0})
                acc["sum_ttf"] += fs["sum_ttf"]
                acc["doc_count"] += fs["doc_count"]
        self.stats = {"n_docs": n_docs, "fields": fields}

    def term_stats(self, pairs: list[tuple[str, str]]) -> dict[tuple[str, str], tuple[int, int]]:
        out = {p: (0, 0) for p in pairs}
        for r in self.readers:
            sub = r.term_stats(pairs)
            for p, (df, ttf) in sub.items():
                a, b = out[p]
                out[p] = (a + df, b + ttf)
        return out

    def expand_prefix(self, field: str, prefix: str, limit: int = 1024) -> list[str]:
        terms: set[str] = set()
        for r in self.readers:
            terms.update(r.expand_prefix(field, prefix, limit))
        return sorted(terms)[:limit]

    def expand_fuzzy(self, field: str, term: str, n: int,
                     transpositions: bool = True, limit: int = 1024) -> list[str]:
        terms: set[str] = set()
        for r in self.readers:
            terms.update(r.expand_fuzzy(field, term, n, transpositions, limit))
        return sorted(terms)[:limit]

    def expand_wildcard(self, field: str, pattern: str,
                        limit: int = 1024) -> list[str]:
        terms: set[str] = set()
        for r in self.readers:
            terms.update(r.expand_wildcard(field, pattern, limit))
        return sorted(terms)[:limit]

    def expand_regexp(self, field: str, pattern: str,
                      limit: int = 1024) -> list[str]:
        terms: set[str] = set()
        for r in self.readers:
            terms.update(r.expand_regexp(field, pattern, limit))
        return sorted(terms)[:limit]


class FederatedStatsView:
    """Cross-TABLE collection statistics for federated search (the
    elasticsearch ``dfs_query_then_fetch`` shape: one distributed-idf stats
    pass before scoring). N, per-field (sum_ttf, doc_count) and per-term
    (df, ttf) are summed over every member table's :class:`StatsView`; term
    expansions (prefix/fuzzy/wildcard/regexp) are set unions. Because a
    doc's quantized length norm is split-invariant, scoring a corpus
    PARTITIONED across tables under this view is byte-identical to scoring
    the union corpus as one table — the property the federated gate oracle
    checks. Duck-types StatsView, so every bucket-searcher scoring path
    (BM25 weights, avgdl, BMW bounds, expansions) works unchanged."""

    def __init__(self, views: list):
        self.views = list(views)
        n_docs = sum(v.stats["n_docs"] for v in self.views)
        fields: dict[str, dict] = {}
        for v in self.views:
            for fld, fs in v.stats["fields"].items():
                acc = fields.setdefault(fld, {"sum_ttf": 0, "doc_count": 0})
                acc["sum_ttf"] += fs["sum_ttf"]
                acc["doc_count"] += fs["doc_count"]
        self.stats = {"n_docs": n_docs, "fields": fields}

    def term_stats(self, pairs: list[tuple[str, str]]) \
            -> dict[tuple[str, str], tuple[int, int]]:
        out = {p: (0, 0) for p in pairs}
        for v in self.views:
            for p, (df, ttf) in v.term_stats(pairs).items():
                a, b = out[p]
                out[p] = (a + df, b + ttf)
        return out

    def expand_prefix(self, field, prefix, limit=1024):
        terms: set[str] = set()
        for v in self.views:
            terms.update(v.expand_prefix(field, prefix, limit))
        return sorted(terms)[:limit]

    def expand_fuzzy(self, field, term, n, transpositions=True, limit=1024):
        terms: set[str] = set()
        for v in self.views:
            terms.update(v.expand_fuzzy(field, term, n, transpositions,
                                        limit))
        return sorted(terms)[:limit]

    def expand_wildcard(self, field, pattern, limit=1024):
        terms: set[str] = set()
        for v in self.views:
            terms.update(v.expand_wildcard(field, pattern, limit))
        return sorted(terms)[:limit]

    def expand_regexp(self, field, pattern, limit=1024):
        terms: set[str] = set()
        for v in self.views:
            terms.update(v.expand_regexp(field, pattern, limit))
        return sorted(terms)[:limit]


class Posting:
    __slots__ = ("docs", "tfs", "norms", "blk_first", "blk_max_tf", "blk_min_norm",
                 "df", "pos_blob", "_pos")

    def __init__(self, docs, tfs, norms, blk_first, blk_max_tf, blk_min_norm,
                 pos_blob: bytes = b""):
        self.docs, self.tfs, self.norms = docs, tfs, norms
        self.blk_first, self.blk_max_tf, self.blk_min_norm = blk_first, blk_max_tf, blk_min_norm
        self.df = len(docs)
        self.pos_blob = pos_blob
        self._pos = None

    def positions(self) -> tuple[np.ndarray, np.ndarray]:
        """(absolute token positions, per-doc offsets) — doc i's occurrence
        positions are positions[offs[i]:offs[i+1]] (ascending). Decoded lazily
        and cached (phrase queries only)."""
        if self._pos is None:
            if not self.pos_blob and self.df:
                raise RuntimeError(
                    "phrase query against an index built without positions "
                    "(build with positions=True)")
            offs = np.zeros(self.df + 1, dtype=np.int64)
            np.cumsum(self.tfs, out=offs[1:])
            deltas = codec.varint_decode(self.pos_blob, int(offs[-1])).astype(np.int64)
            self._pos = (codec.delta_decode_segments(deltas, offs), offs)
        return self._pos


_EMPTY = Posting(np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint8),
                 np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint8))


def _lucene_sloppy_freq(pos_lists: list[np.ndarray], slop: int) -> float:
    """One doc's sloppy frequency under Lucene's SloppyPhraseMatcher stream
    for NON-REPEATING phrase terms (SloppyPhraseMatcher.java phraseFreq —
    the published algorithm, reimplemented from its documented behavior).
    ``pos_lists[j]`` holds term j's ADJUSTED positions (token position − j),
    sorted ascending, non-empty. PhrasePositions are kept in a heap ordered
    by (position, query offset); the minimum is repeatedly advanced, and
    every time the advanced entry overshoots the new minimum the current
    match — length ``end − min`` where ``end`` is the max position ever seen
    — is scored if ≤ slop, weighted 1/(1+length) (computeSlopFactor); a
    final match is scored when any term's positions run out. In-order exact
    occurrences have length 0, a transposed adjacent pair has length 2."""
    heap: list[tuple[int, int, int]] = []   # (adjusted pos, offset j, next idx)
    end = int(pos_lists[0][0])
    for j, pl in enumerate(pos_lists):
        p = int(pl[0])
        heap.append((p, j, 1))
        if p > end:
            end = p
    heapq.heapify(heap)
    freq = 0.0
    pos, j, nxt = heapq.heappop(heap)
    match_length = end - pos
    next_pos = heap[0][0]
    while True:
        pl = pos_lists[j]
        if nxt >= len(pl):              # this term exhausted: stream done
            break
        pos = int(pl[nxt])
        nxt += 1
        if pos > end:
            end = pos
        if pos > next_pos:              # done minimizing the current match
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (pos, j, nxt))
            pos, j, nxt = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - pos
        else:
            ml2 = end - pos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq


def _lucene_sloppy_freq_rpts(pos_lists: list[np.ndarray],
                             group_ids: list[int], slop: int) -> float:
    """One doc's sloppy frequency under Lucene's SloppyPhraseMatcher stream
    WITH repeating phrase terms (SloppyPhraseMatcher.java's repeats
    machinery — collide/lesser/advanceRpts — reimplemented from its
    documented behavior). ``group_ids[j]`` labels phrase slot j's repeat
    group (same id ⇔ same term); two slots of one group may never consume
    the same TOKEN occurrence, i.e. collide when adjusted_pos+offset is
    equal — the colliding pair's LESSER member (by (adjusted pos, offset))
    advances until its group is collision-free, and a slot exhausting
    during resolution ends the stream. Everything else is the
    non-repeating stream of ``_lucene_sloppy_freq``: pop the minimum
    (position, offset), score ``end − min`` ≤ slop at weight
    1/(1+length) whenever the advanced slot overshoots the new minimum,
    plus once at stream end."""
    n = len(pos_lists)
    ptr = [1] * n
    pos = [int(pl[0]) for pl in pos_lists]
    end = max(pos)
    groups: dict[int, list[int]] = {}
    for j, g in enumerate(group_ids):
        groups.setdefault(g, []).append(j)
    rpt = {j for js in groups.values() if len(js) > 1 for j in js}

    def advance(j: int) -> bool:
        nonlocal end
        pl = pos_lists[j]
        if ptr[j] >= len(pl):
            return False
        pos[j] = int(pl[ptr[j]])
        ptr[j] += 1
        if pos[j] > end:
            end = pos[j]
        return True

    def collide(j: int) -> int:
        tp = pos[j] + j                       # original token position
        for j2 in groups[group_ids[j]]:
            if j2 != j and pos[j2] + j2 == tp:
                return j2
        return -1

    def advance_rpts(j: int) -> bool:
        if j not in rpt:
            return True
        while True:
            j2 = collide(j)
            if j2 < 0:
                return True
            lj = j if (pos[j], j) < (pos[j2], j2) else j2
            if not advance(lj):
                return False
            j = lj                             # keep resolving from the mover

    # init: place first positions, then make every repeat group
    # collision-free (slots in offset order — a deterministic stand-in for
    # Lucene's rptStack order)
    for j in sorted(rpt):
        if not advance_rpts(j):
            return 0.0
    heap = [(pos[j], j) for j in range(n)]
    heapq.heapify(heap)
    freq = 0.0
    p, j = heapq.heappop(heap)
    match_length = end - p
    next_pos = heap[0][0]
    while True:
        if not advance(j):
            break
        if not advance_rpts(j):
            break
        # collision resolution may have moved slots sitting IN the heap —
        # rebuild it (Lucene pops and re-adds the changed members); the
        # in-hand slot j stays out
        heap = [(pos[k], k) for k in range(n) if k != j]
        heapq.heapify(heap)
        if pos[j] > next_pos:                  # done minimizing this match
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (pos[j], j))
            p, j = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - p
        else:
            ml2 = end - pos[j]
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq


def _diversified_select(codes: np.ndarray, limit: int, g: int,
                        key_budget: bool) -> np.ndarray:
    """Indices (ascending = rank order preserved) of the diversified
    selection over a RANK-ORDERED hit list: at most ``g`` hits per key
    code. ``key_budget=True`` keeps the first ``limit`` DISTINCT keys'
    surviving members (the per-bucket ship set — see
    ``collapse_keyword``'s exactness argument); ``key_budget=False`` keeps
    the first ``limit`` surviving ROWS (the final diversified top-k).
    Vectorized: within-key member ranks via one stable argsort, key ranks
    via first-occurrence order."""
    uniq, inv = np.unique(codes, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    counts = np.bincount(inv, minlength=uniq.size)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ranks = np.empty(inv.size, np.int64)
    ranks[order] = np.arange(inv.size) - np.repeat(starts, counts)
    keep = ranks < g
    if key_budget:
        _, first_idx = np.unique(inv, return_index=True)
        key_rank = np.empty(uniq.size, np.int64)
        key_rank[np.argsort(first_idx, kind="stable")] = \
            np.arange(uniq.size)
        keep &= key_rank[inv] < limit
        return np.flatnonzero(keep)
    return np.flatnonzero(keep)[:limit]


def _cursor_mask(ids: np.ndarray, scores: np.ndarray, after) -> np.ndarray:
    """Boolean mask of hits STRICTLY after the ``(score, doc_id)`` pagination
    cursor in the (score desc, doc_id asc) result order (Lucene
    ``IndexSearcher.searchAfter`` semantics). Scores compare in float64 of
    the serving dtype — the cursor comes from a previous page of the same
    pipeline, so equality at the boundary is exact, not approximate."""
    s = np.float64(after[0])
    d = np.int64(after[1])
    sc = scores.astype(np.float64)
    return (sc < s) | ((sc == s) & (ids > d))


def _const_posting(docs: np.ndarray) -> Posting:
    """Synthetic posting for a constant-score clause (tf/norms unused; block
    metadata present so BMW can treat it like any clause)."""
    B = codec.BLOCK_SIZE
    starts = np.arange(0, docs.size, B)
    ones = np.ones(docs.size, dtype=np.int64)
    zeros = np.zeros(docs.size, dtype=np.uint8)
    return Posting(docs, ones, zeros, docs[starts],
                   np.ones(starts.size, dtype=np.int64),
                   np.zeros(starts.size, dtype=np.uint8))


def _synonym_posting(plist: list["Posting"]) -> "Posting | None":
    """Merge one field's postings for a synonym group into ONE pseudo-term
    posting (Lucene SynonymQuery semantics): docs = union, tf = Σ variant
    freqs per doc, norm = the doc's field-length norm (identical across
    variants — it's a per-(doc, field) quantity, so any variant's byte is
    THE byte). Block metadata is rebuilt so block-max WAND can prune the
    merged clause like any term clause."""
    live = [p for p in plist if p.df > 0]
    if not live:
        return None
    if len(live) == 1:
        return live[0]
    docs = np.concatenate([p.docs for p in live])
    tfs = np.concatenate([p.tfs for p in live])
    norms = np.concatenate([p.norms for p in live])
    u, inv = np.unique(docs, return_inverse=True)
    tf_sum = np.zeros(u.size, np.int64)
    np.add.at(tf_sum, inv, tfs)
    norm_u = np.zeros(u.size, np.uint8)
    norm_u[inv] = norms
    B = codec.BLOCK_SIZE
    starts = np.arange(0, u.size, B)
    return Posting(u, tf_sum, norm_u, u[starts],
                   np.maximum.reduceat(tf_sum, starts),
                   np.minimum.reduceat(norm_u, starts))


def _mask_posting(p: "Posting", keep_docs: np.ndarray) -> "Posting | None":
    """Restrict a posting to ``keep_docs`` (sorted unique), rebuilding block
    metadata — used to scope a nested group's scoring members to the group's
    match set (Lucene scores a BooleanQuery subclause only where the
    subquery as a whole matches)."""
    keep = np.isin(p.docs, keep_docs, assume_unique=True)
    docs = p.docs[keep]
    if docs.size == 0:
        return None
    tfs, norms = p.tfs[keep], p.norms[keep]
    B = codec.BLOCK_SIZE
    starts = np.arange(0, docs.size, B)
    return Posting(docs, tfs, norms, docs[starts],
                   np.maximum.reduceat(tfs, starts),
                   np.minimum.reduceat(norms, starts))


def _postings_from_table(tbl: pa.Table, codec_name: str):
    """Decode a postings-parquet slice into {(field, term): Posting} with columnar
    access — one to_pylist per scalar column and offset-sliced flat buffers for the
    block-metadata list columns (no per-row .as_py(), which dominated activation
    time in profiling)."""
    out: dict[tuple[str, str], Posting] = {}
    if len(tbl) == 0:
        return out
    tbl = tbl.combine_chunks()
    fields = tbl["field"].to_pylist()
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_pylist()
    doc_b = tbl["doc_bytes"].to_pylist()
    tf_b = tbl["tf_bytes"].to_pylist()
    norm_b = tbl["norm_bytes"].to_pylist()
    pos_b = tbl["pos_bytes"].to_pylist() if "pos_bytes" in tbl.column_names \
        else [b""] * len(tbl)

    def _flat(col_name, dtype):
        col = tbl[col_name].combine_chunks() \
            if isinstance(tbl[col_name], pa.ChunkedArray) else tbl[col_name].chunk(0)
        offs = col.offsets.to_numpy().astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False).astype(dtype)
        return offs, vals

    bf_o, bf_v = _flat("block_first", np.int64)
    bm_o, bm_v = _flat("block_max_tf", np.int64)
    bn_o, bn_v = _flat("block_min_norm", np.uint8)
    docs, tfs, norms, po = codec.decode_postings_batch(
        doc_b, tf_b, norm_b, np.asarray(dfs, dtype=np.int64), codec_name=codec_name)
    for row in range(len(tbl)):
        out[(fields[row], terms[row])] = Posting(
            docs[po[row]:po[row + 1]], tfs[po[row]:po[row + 1]],
            norms[po[row]:po[row + 1]],
            bf_v[bf_o[row]:bf_o[row + 1]],
            bm_v[bm_o[row]:bm_o[row + 1]],
            bn_v[bn_o[row]:bn_o[row + 1]],
            pos_blob=pos_b[row] or b"")
    return out


class BucketSearcher:
    """Stateful per-bucket searcher: loads its postings/doc-store slice lazily and
    caches decoded postings — the engine's segment-actor workhorse."""

    def __init__(self, manifest_data: dict, bucket: int, cache_postings: int = 4096,
                 gen: int | None = None):
        self.gen = GenerationReader(manifest_data, gen)
        self.stats = StatsView(manifest_data, self.gen)
        self.bucket = bucket
        self._postings_cache: OrderedDict[tuple[str, str], Posting] = OrderedDict()
        self._cache_cap = cache_postings
        self._docstore_cols: dict[str, pa.ChunkedArray] = {}
        self._docstore_len: int | None = None
        self._tombstones = self.gen.tombstones()
        self._ts_in_bucket = self._tombstones[self._bucket_of(self._tombstones) == bucket] \
            if self._tombstones.size else self._tombstones

    # ---------- storage access ----------

    def _bucket_of(self, doc_ids: np.ndarray) -> np.ndarray:
        from byzer_retrieval_ray.index.postings import bucket_of
        return bucket_of(doc_ids, self.gen.bucket_spec)

    def _docstore(self, columns: list[str]) -> pa.Table:
        paths = self.gen.docstore_paths(self.bucket)
        missing = [c for c in columns if c not in self._docstore_cols]
        if missing:
            if not paths:
                raise KeyError(f"bucket {self.bucket} has no docstore")
            t = pa.concat_tables([pq.read_table(p, columns=missing) for p in paths])
            for c in missing:
                self._docstore_cols[c] = t[c]
            self._docstore_len = len(t)
        return pa.table({c: self._docstore_cols[c] for c in columns})

    def doc_ids(self) -> np.ndarray:
        return self._docstore(["doc_id"])["doc_id"].to_numpy()

    def preload(self) -> int:
        """Decode this bucket's full postings slice into the cache (ST1 semantics:
        the segment loads its partition once; queries then never touch storage).
        Returns the number of postings loaded. Intended for serving actors where
        the per-bucket slice fits in heap — the lazy path remains the default."""
        self._cache_cap = 1 << 62
        n = 0
        for r in range(max(self.gen.info["num_term_parts"], 1)):
            self.gen._load_ts_cache(r)    # warm term stats too (first-query latency)
            path = self.gen.postings_path(r)
            if path is None or not os.path.exists(path):
                continue
            tbl = pq.read_table(path, filters=[("bucket", "=", self.bucket)])
            decoded = _postings_from_table(tbl, self.gen.codec)
            for key, p in decoded.items():
                self._postings_cache[key] = p
                n += p.df
        return n

    def fetch_postings(self, pairs: list[tuple[str, str]]) -> dict[tuple[str, str], Posting]:
        out = {}
        todo_by_part: dict[int, list[tuple[str, str]]] = {}
        for key in pairs:
            if key in self._postings_cache:
                self._postings_cache.move_to_end(key)
                out[key] = self._postings_cache[key]
            else:
                todo_by_part.setdefault(self.gen.route_term(key[1]), []).append(key)
        for r, keys in todo_by_part.items():
            path = self.gen.postings_path(r)
            found = {}
            if path is not None and os.path.exists(path):
                terms = list({t for _, t in keys})
                tbl = pq.read_table(path, filters=[("bucket", "=", self.bucket),
                                                   ("term", "in", terms)])
                found = _postings_from_table(tbl, self.gen.codec)
            for key in keys:
                p = found.get(key, _EMPTY)
                out[key] = p
                self._postings_cache[key] = p
                if len(self._postings_cache) > self._cache_cap:
                    self._postings_cache.popitem(last=False)
        return out

    # ---------- filter / candidates ----------

    def _stored_columns(self) -> list[str]:
        return [f.name for f in self.gen.schema.fields if not f.analyze]

    def filter_candidates(self, tree: dict) -> np.ndarray | None:
        """Sorted doc_ids of this bucket matching the filter tree (None = no filter)."""
        if not tree:
            return None
        cols = sorted({"doc_id"} | _filter_fields(tree))
        tbl = self._docstore(cols)
        mask = F.evaluate(tbl, tree, analyzed=self.gen.analyzed)
        ids = tbl.filter(mask)["doc_id"].to_numpy()
        return self._drop_tombstones(np.sort(ids))

    def _drop_tombstones(self, sorted_ids: np.ndarray) -> np.ndarray:
        ts = self._ts_in_bucket
        if ts.size == 0 or sorted_ids.size == 0:
            return sorted_ids
        keep = ~np.isin(sorted_ids, ts, assume_unique=False)
        return sorted_ids[keep]

    # ---------- keyword search ----------

    def search_keyword(self, q: SearchQuery, precision: str = "float32",
                       algorithm: str = "bmw",
                       fuzzy_transpositions: bool = True,
                       explain_doc: int | None = None):
        """Per-bucket top-limit (doc_ids, scores) for a keyword recall.

        ``explain_doc`` (Lucene ``IndexSearcher.explain`` shape): instead of
        searching, return a per-clause score breakdown dict for that doc_id —
        built from the SAME scorer list, weights and gating the search uses,
        so the explained total equals the doc's search score exactly (same
        per-clause dtype scores, same float64 accumulation order)."""
        dtype = np.float32 if precision == "float32" else np.float64
        # per-call sloppy-phrase order mode (SearchQuery.slop_in_order);
        # read by _sloppy_posting on every path of this call (main clauses,
        # msm member sets, nested groups). Queries run serially per searcher
        # (one driver loop / single-threaded actor), so a per-call attribute
        # cannot race
        self._slop_ordered = bool(getattr(q, "slop_in_order", True))
        limit = q.limit
        after = getattr(q, "search_after", None)
        if after is not None:
            # BMW's top-k pruning threshold ignores the cursor and would skip
            # blocks whose post-cursor hits we need; TAAT is exact and returns
            # the identical total order (same clause-order float addition)
            algorithm = "taat"
        # dis_max (Lucene DisjunctionMaxQuery across fields): per-clause
        # max + tb·(sum − max) field combination. Scoring-only — matching
        # and gating are untouched; forces TAAT (BMW's block bounds assume
        # the sum combination when accumulating exact range scores)
        dismax_tb = getattr(q, "dis_max_tie_breaker", None)
        if dismax_tb is not None:
            dismax_tb = float(dismax_tb)
            if not 0.0 <= dismax_tb <= 1.0:
                raise ValueError(
                    f"dis_max_tie_breaker must be in [0, 1], got {dismax_tb}")
            if getattr(q, "combined_fields", None):
                raise ValueError(
                    "dis_max_tie_breaker is incompatible with combined_fields"
                    " (BM25F already blends fields into one pseudo-field)")
            if explain_doc is not None:
                raise ValueError("explain() does not support dis_max queries")
            algorithm = "taat"
        if getattr(q, "combined_fields", None) and (q.keyword or "") != "*":
            # BM25F pseudo-field scoring (CombinedFieldQuery) — separate
            # evaluator; match-all falls through to the standard path
            # ("*" scores 1.0 regardless of field blending)
            return self._search_combined(q, precision, after=after,
                                         explain_doc=explain_doc)

        candidates = self.filter_candidates(q.filters)
        keyword = (q.keyword or "").strip()

        if keyword == "*":
            if explain_doc is not None:
                ids = candidates if candidates is not None \
                    else self._drop_tombstones(np.sort(self.doc_ids()))
                hit = bool(np.isin(np.int64(explain_doc), ids))
                return {"doc_id": int(explain_doc), "matched": hit,
                        "score": 1.0 if hit else 0.0,
                        "clauses": [{"field": None, "clause": "*",
                                     "kind": "match_all", "score": 1.0}]
                        if hit else [],
                        "in_candidates": hit, "excluded": False}
            ids = candidates if candidates is not None \
                else self._drop_tombstones(np.sort(self.doc_ids()))
            if after is not None:
                ids = ids[_cursor_mask(ids, np.ones(ids.size, np.float64), after)]
            ids = ids[:limit]
            return ids, np.ones(ids.size, dtype=dtype)

        from byzer_retrieval_ray.functions.queryparser import parse_keyword

        pk = parse_keyword(keyword)
        should, must, must_not = pk.should, pk.must, pk.must_not
        phrases, must_phrases, not_phrases = pk.phrases, pk.must_phrases, pk.not_phrases
        # per-field boosts (extension — the classic Lucene multi-field
        # "field^B" weighting; the reference searches all fields at 1.0):
        # "title^2" boosts every clause scored against title by ×2 — linear
        # in the BM25 weight for scored clauses, the constant for
        # constant-score clauses. Matching/gating is unaffected.
        fboost: dict[str, float] = {}
        fields = []
        for f in (q.fields or sorted(self.gen.analyzed)):
            if "^" in f:
                name, _, b = f.rpartition("^")
                fields.append(name)
                fboost[name] = float(b)
            else:
                fields.append(f)
        bad = [f for f in fields if f not in self.gen.analyzed]
        if bad:
            raise ValueError(
                f"search fields {bad} are not analyzed (schema options: analyze); "
                f"analyzed fields: {sorted(self.gen.analyzed)}")
        # group members are TYPED (str = term; tuples for phrase/slop/prefix/
        # fuzzy — those are also registered in the matching SHOULD list by the
        # parser, so they fetch and score through the regular clause sections)
        group_terms = [m for g in pk.must_groups for m in g
                       if isinstance(m, str)]
        # MUST clauses score too (Lucene BooleanQuery); required groups' members
        # score as term clauses — clause order: should, must, group members
        scored_terms = should + must + group_terms
        pairs = [(f, t) for t in scored_terms for f in fields]
        mult: dict[tuple[str, str], float] = {}
        for p in pairs:
            mult[p] = mult.get(p, 0) + 1
        # term^B boosts: the clause weight is linear in the BM25 weight, so
        # an extra (B−1) on the multiplicity scores exactly like B copies of
        # the term (the oracle replicates integer boosts as duplicate terms)
        for t, extra in pk.boosts.items():
            for f in fields:
                if (f, t) in mult:
                    mult[(f, t)] += extra
        uniq_pairs = list(mult.keys())  # insertion-ordered = clause order
        must_pairs = [(f, t) for t in must for f in fields]
        not_pairs = [(f, t) for t in must_not for f in fields]
        all_phrases = phrases + must_phrases + not_phrases
        phrase_pairs = [(f, t) for ph in all_phrases for t in ph for f in fields]
        all_sphrases = pk.slop_phrases + pk.must_slop_phrases + pk.not_slop_phrases
        sphrase_pairs = [(f, t) for ph, _ in all_sphrases for t in ph for f in fields]
        all_pphrases = pk.pphrases + pk.must_pphrases + pk.not_pphrases
        pp_pairs = [(f, t) for tt, _ in all_pphrases for t in tt for f in fields]
        fetch = list(dict.fromkeys(uniq_pairs + must_pairs + not_pairs
                                   + phrase_pairs + sphrase_pairs + pp_pairs))
        stats = self.stats.term_stats(fetch)
        posts = self.fetch_postings([p for p in fetch if stats[p][0] > 0])

        # query-time synonyms (Lucene SynonymQuery): a plain TERM clause whose
        # term has a {term: [alts]} entry scores as one merged pseudo-term —
        # tf = Σ variant freqs, df = max variant df. The merge lives in a
        # SIDE table consulted only by TERM-clause consumers (scoring, +term
        # gating, -term exclusion, min_should_match counting): the shared
        # posts/stats dicts stay untouched, because a phrase/slop/pprefix
        # clause may read the SAME (field, term) key and must see the real
        # positional posting, not a merged one (a merged posting has no
        # positions, and a single-variant merge would alias the alternative's
        # positions under the query term — both corrupt phrase matching).
        syn_posts: dict[tuple[str, str], Posting] = {}
        syn_stats: dict[tuple[str, str], tuple[int, int]] = {}
        syn_map = getattr(q, "synonyms", None) or {}
        if syn_map:
            term_clauses = set(scored_terms) | set(must_not)
            for t, alts in syn_map.items():
                if t not in term_clauses:
                    continue
                variants = list(dict.fromkeys([t] + list(alts)))
                for fld in fields:
                    vpairs = [(fld, v) for v in variants]
                    vstats = self.stats.term_stats(vpairs)
                    live = [p for p in vpairs if vstats[p][0] > 0]
                    vposts = self.fetch_postings(live)
                    merged = _synonym_posting([vposts[p] for p in live])
                    if merged is None:
                        continue
                    syn_posts[(fld, t)] = merged
                    syn_stats[(fld, t)] = (max(vstats[p][0] for p in live),
                                           sum(vstats[p][1] for p in live))

        def _eff(key):
            """(df, posting) of a TERM clause — synonym-merged when mapped."""
            if key in syn_posts:
                return syn_stats[key][0], syn_posts[key]
            return stats[key][0], posts.get(key)

        def _field_scoring(fld):
            fstats = self.stats.stats["fields"][fld]
            avgdl = bm25.avg_field_length(fstats["sum_ttf"], fstats["doc_count"],
                                          dtype=dtype)
            return bm25.norm_inverse_cache(avgdl, dtype=dtype), fstats["doc_count"]

        scorers = []
        for key in uniq_pairs:
            df, posting = _eff(key)
            if df == 0:
                continue
            cache, doc_count = _field_scoring(key[0])
            w = bm25.term_weight(doc_count, df, boost=float(mult[key]) * fboost.get(key[0], 1.0), dtype=dtype)
            scorers.append((key, posting, cache, w))

        # phrase clauses (Lucene PhraseQuery over BM25: tf = phrase frequency,
        # idf = Σ per-term idf) — appended after term clauses in a fixed order
        phrase_docs: dict[tuple, np.ndarray] = {}   # (field, phrase) → matching docs
        for ph in dict.fromkeys(all_phrases):
            for fld in fields:
                if any(stats[(fld, t)][0] == 0 for t in ph):
                    continue
                pp = self._phrase_posting(fld, ph, posts)
                if pp is None:
                    continue
                phrase_docs[(fld, ph)] = pp.docs
                if ph in phrases or ph in must_phrases:
                    cache, doc_count = _field_scoring(fld)
                    w = sum(bm25.term_weight(doc_count, stats[(fld, t)][0],
                                             dtype=dtype) for t in ph)
                    scorers.append(((fld, " ".join(ph)), pp, cache, dtype(w * fboost.get(fld, 1.0))))

        # sloppy phrase clauses ("a b"~N): same Σ per-term idf weight as exact
        # phrases, tf = Lucene sloppy frequency (see _sloppy_posting); appended
        # after exact phrases in the fixed clause order
        sphrase_docs: dict[tuple, np.ndarray] = {}   # (field, (terms, slop)) → docs
        for sp in dict.fromkeys(all_sphrases):
            ph, slop = sp
            for fld in fields:
                if any(stats[(fld, t)][0] == 0 for t in ph):
                    continue
                pp = self._sloppy_posting(fld, ph, slop, posts)
                if pp is None:
                    continue
                sphrase_docs[(fld, sp)] = pp.docs
                if sp in pk.slop_phrases or sp in pk.must_slop_phrases:
                    cache, doc_count = _field_scoring(fld)
                    w = sum(bm25.term_weight(doc_count, stats[(fld, t)][0],
                                             dtype=dtype) for t in ph)
                    scorers.append(((fld, " ".join(ph) + f"~{slop}"),
                                    pp, cache, dtype(w * fboost.get(fld, 1.0))))

        # prefix clauses (term*): CONSTANT score 1.0 per matching doc (the Lucene
        # constant-score MultiTermQuery rewrite) — the clause's docs are the union
        # of the expanded terms' postings in this bucket
        all_prefixes = pk.prefixes + pk.must_prefixes + pk.not_prefixes
        prefix_docs: dict[tuple[str, str], np.ndarray] = {}
        if all_prefixes:
            for pre in dict.fromkeys(all_prefixes):
                for fld in fields:
                    terms = self.stats.expand_prefix(fld, pre)
                    if not terms:
                        continue
                    tpairs = [(fld, t) for t in terms]
                    tposts = self.fetch_postings(tpairs)
                    docs_any = [tposts[p].docs for p in tpairs if tposts[p].df > 0]
                    if not docs_any:
                        continue
                    docs = np.unique(np.concatenate(docs_any))
                    prefix_docs[(fld, pre)] = docs
                    if pre in pk.prefixes or pre in pk.must_prefixes:
                        scorers.append(((fld, pre + "*"),
                                        _const_posting(docs), None, dtype(fboost.get(fld, 1.0))))

        # fuzzy clauses (term~N): constant 1.0 per doc containing a dictionary
        # term within edit distance N (expansion like prefixes)
        all_fuzzies = pk.fuzzies + pk.must_fuzzies + pk.not_fuzzies
        fuzzy_docs: dict[tuple[str, tuple], np.ndarray] = {}
        if all_fuzzies:
            for fz in dict.fromkeys(all_fuzzies):
                term, n_edits = fz
                for fld in fields:
                    terms = self.stats.expand_fuzzy(fld, term, n_edits,
                                                    fuzzy_transpositions)
                    if not terms:
                        continue
                    tpairs = [(fld, t) for t in terms]
                    tposts = self.fetch_postings(tpairs)
                    docs_any = [tposts[p].docs for p in tpairs if tposts[p].df > 0]
                    if not docs_any:
                        continue
                    docs = np.unique(np.concatenate(docs_any))
                    fuzzy_docs[(fld, fz)] = docs
                    if fz in pk.fuzzies or fz in pk.must_fuzzies:
                        scorers.append(((fld, f"{term}~{n_edits}"),
                                        _const_posting(docs), None, dtype(fboost.get(fld, 1.0))))

        # wildcard clauses (t?st / s*t): constant 1.0 per doc containing a
        # dictionary term matching the pattern (expansion like prefixes);
        # appended LAST in the fixed clause order (the oracle adds its CASE
        # term last to mirror the float-addition order)
        all_wilds = pk.wildcards + pk.must_wildcards + pk.not_wildcards
        wild_docs: dict[tuple[str, str], np.ndarray] = {}
        if all_wilds:
            for wc in dict.fromkeys(all_wilds):
                for fld in fields:
                    terms = self.stats.expand_wildcard(fld, wc)
                    if not terms:
                        continue
                    tpairs = [(fld, t) for t in terms]
                    tposts = self.fetch_postings(tpairs)
                    docs_any = [tposts[p].docs for p in tpairs if tposts[p].df > 0]
                    if not docs_any:
                        continue
                    docs = np.unique(np.concatenate(docs_any))
                    wild_docs[(fld, wc)] = docs
                    if wc in pk.wildcards or wc in pk.must_wildcards:
                        scorers.append(((fld, wc),
                                        _const_posting(docs), None, dtype(fboost.get(fld, 1.0))))

        # regexp clauses (/re/): constant 1.0 per doc containing a dictionary
        # term fully matching the RE2 pattern (expansion like wildcards);
        # appended after wildcards in the fixed clause order
        all_rx = pk.regexps + pk.must_regexps + pk.not_regexps
        rx_docs: dict[tuple[str, str], np.ndarray] = {}
        if all_rx:
            for rx in dict.fromkeys(all_rx):
                for fld in fields:
                    terms = self.stats.expand_regexp(fld, rx)
                    if not terms:
                        continue
                    tpairs = [(fld, t) for t in terms]
                    tposts = self.fetch_postings(tpairs)
                    docs_any = [tposts[p].docs for p in tpairs if tposts[p].df > 0]
                    if not docs_any:
                        continue
                    docs = np.unique(np.concatenate(docs_any))
                    rx_docs[(fld, rx)] = docs
                    if rx in pk.regexps or rx in pk.must_regexps:
                        scorers.append(((fld, f"/{rx}/"),
                                        _const_posting(docs), None, dtype(fboost.get(fld, 1.0))))

        # phrase-prefix clauses ("a b*"): the leading terms followed by ANY
        # dictionary term starting with the prefix — ONE union position slot
        # (Lucene MultiPhraseQuery), evaluated by merging the expanded terms'
        # positions into a pseudo-posting and running the standard vectorized
        # phrase adjacency; CONSTANT score 1.0 per matching doc (the
        # constant-score multi-term rewrite, like prefix/fuzzy/wildcard)
        pp_docs: dict[tuple, np.ndarray] = {}
        if all_pphrases:
            PSEUDO = "\x00pprefix"
            for ppx in dict.fromkeys(all_pphrases):
                pterms, pre = ppx
                for fld in fields:
                    if any(stats[(fld, t)][0] == 0 for t in pterms):
                        continue
                    exp = self.stats.expand_prefix(fld, pre)
                    if not exp:
                        continue
                    epairs = [(fld, t) for t in exp]
                    eposts = self.fetch_postings(epairs)
                    merged = self._union_positions_posting(
                        [eposts[p] for p in epairs])
                    if merged is None:
                        continue
                    posts2 = dict(posts)
                    posts2[(fld, PSEUDO)] = merged
                    pp = self._phrase_posting(
                        fld, tuple(pterms) + (PSEUDO,), posts2)
                    if pp is None:
                        continue
                    pp_docs[(fld, ppx)] = pp.docs
                    if ppx in pk.pphrases or ppx in pk.must_pphrases:
                        scorers.append(
                            ((fld, " ".join(pterms) + " " + pre + "*"),
                             _const_posting(pp.docs), None, dtype(fboost.get(fld, 1.0))))

        # nested groups (round 4): a should_group matches where its OWN
        # musts/nots say, and its scoring members score only inside that
        # match set (masked postings) — appended LAST in the clause order;
        # not_groups are excluded conjunctions handled with the other
        # exclusions below
        sg_docs: dict[int, np.ndarray] = {}
        for g in pk.should_groups:
            sg_docs[id(g)] = self._group_match_docs(g, fields,
                                                    fuzzy_transpositions)
        for g in pk.should_groups:
            if sg_docs[id(g)].size:
                scorers += self._group_scorers(g, sg_docs[id(g)], fields,
                                               dtype, fuzzy_transpositions,
                                               fboost)

        # +term: candidates must contain the term in ≥1 searched field (OR over
        # fields, AND over must terms/phrases); -term: excluded if present anywhere
        if must or must_phrases or pk.must_slop_phrases or pk.must_prefixes \
                or pk.must_fuzzies or pk.must_wildcards or pk.must_regexps \
                or pk.must_pphrases or pk.must_groups:
            for grp in pk.must_groups:
                # +(a | "b c" | d*): the doc must match ≥1 group member in
                # ≥1 field; members' doc sets come from the clause sections
                # above (typed members — str is a term)
                docs_any = []
                for m in grp:
                    for f in fields:
                        if isinstance(m, str):
                            mdf, mpost = _eff((f, m))
                            if mdf > 0:
                                docs_any.append(mpost.docs)
                        elif m[0] == "phrase":
                            if (f, m[1]) in phrase_docs:
                                docs_any.append(phrase_docs[(f, m[1])])
                        elif m[0] == "slop":
                            if (f, (m[1], m[2])) in sphrase_docs:
                                docs_any.append(sphrase_docs[(f, (m[1], m[2]))])
                        elif m[0] == "prefix":
                            if (f, m[1]) in prefix_docs:
                                docs_any.append(prefix_docs[(f, m[1])])
                        elif m[0] == "fuzzy":
                            if (f, (m[1], m[2])) in fuzzy_docs:
                                docs_any.append(fuzzy_docs[(f, (m[1], m[2]))])
                        elif m[0] == "wildcard":
                            if (f, m[1]) in wild_docs:
                                docs_any.append(wild_docs[(f, m[1])])
                        elif m[0] == "regexp":
                            if (f, m[1]) in rx_docs:
                                docs_any.append(rx_docs[(f, m[1])])
                        elif m[0] == "pprefix":
                            if (f, (m[1], m[2])) in pp_docs:
                                docs_any.append(pp_docs[(f, (m[1], m[2]))])
                    if not isinstance(m, str) and m[0] == "group":
                        # group members match per-group (already OR over
                        # fields), once — not per searched field
                        gd = sg_docs.get(id(m[1]))
                        if gd is None:
                            gd = self._group_match_docs(
                                m[1], fields, fuzzy_transpositions)
                            sg_docs[id(m[1])] = gd
                        if gd.size:
                            docs_any.append(gd)
                g_docs = (np.unique(np.concatenate(docs_any))
                          if docs_any else np.empty(0, np.int64))
                candidates = g_docs if candidates is None else \
                    candidates[np.isin(candidates, g_docs, assume_unique=True)]
            for t in must:
                docs_any = [_eff((f, t))[1].docs for f in fields
                            if _eff((f, t))[0] > 0]
                term_docs = (np.unique(np.concatenate(docs_any))
                             if docs_any else np.empty(0, np.int64))
                candidates = term_docs if candidates is None else \
                    candidates[np.isin(candidates, term_docs, assume_unique=True)]
            for ph in must_phrases:
                docs_any = [phrase_docs[(f, ph)] for f in fields
                            if (f, ph) in phrase_docs]
                ph_docs = (np.unique(np.concatenate(docs_any))
                           if docs_any else np.empty(0, np.int64))
                candidates = ph_docs if candidates is None else \
                    candidates[np.isin(candidates, ph_docs, assume_unique=True)]
            for sp in pk.must_slop_phrases:
                docs_any = [sphrase_docs[(f, sp)] for f in fields
                            if (f, sp) in sphrase_docs]
                sp_docs = (np.unique(np.concatenate(docs_any))
                           if docs_any else np.empty(0, np.int64))
                candidates = sp_docs if candidates is None else \
                    candidates[np.isin(candidates, sp_docs, assume_unique=True)]
            for pre in pk.must_prefixes:
                docs_any = [prefix_docs[(f, pre)] for f in fields
                            if (f, pre) in prefix_docs]
                pr_docs = (np.unique(np.concatenate(docs_any))
                           if docs_any else np.empty(0, np.int64))
                candidates = pr_docs if candidates is None else \
                    candidates[np.isin(candidates, pr_docs, assume_unique=True)]
            for fz in pk.must_fuzzies:
                docs_any = [fuzzy_docs[(f, fz)] for f in fields
                            if (f, fz) in fuzzy_docs]
                fz_docs = (np.unique(np.concatenate(docs_any))
                           if docs_any else np.empty(0, np.int64))
                candidates = fz_docs if candidates is None else \
                    candidates[np.isin(candidates, fz_docs, assume_unique=True)]
            for wc in pk.must_wildcards:
                docs_any = [wild_docs[(f, wc)] for f in fields
                            if (f, wc) in wild_docs]
                wc_docs = (np.unique(np.concatenate(docs_any))
                           if docs_any else np.empty(0, np.int64))
                candidates = wc_docs if candidates is None else \
                    candidates[np.isin(candidates, wc_docs, assume_unique=True)]
            for rx in pk.must_regexps:
                docs_any = [rx_docs[(f, rx)] for f in fields
                            if (f, rx) in rx_docs]
                r_docs = (np.unique(np.concatenate(docs_any))
                          if docs_any else np.empty(0, np.int64))
                candidates = r_docs if candidates is None else \
                    candidates[np.isin(candidates, r_docs, assume_unique=True)]
            for ppx in pk.must_pphrases:
                docs_any = [pp_docs[(f, ppx)] for f in fields
                            if (f, ppx) in pp_docs]
                pd = (np.unique(np.concatenate(docs_any))
                      if docs_any else np.empty(0, np.int64))
                candidates = pd if candidates is None else \
                    candidates[np.isin(candidates, pd, assume_unique=True)]
            candidates = self._drop_tombstones(candidates)

        # minimum_should_match (Lucene BooleanQuery.setMinimumNumberShouldMatch):
        # a hit must satisfy ≥ msm SHOULD clauses, each counted once when it
        # matches in ANY searched field (duplicate clauses count separately,
        # like duplicate BooleanQuery subclauses). Scoring is unchanged —
        # every matched clause still contributes. msm > #clauses ⟹ no hits.
        # msm == 1 is a no-op ONLY for a pure-OR query (matching already
        # requires one SHOULD hit); with MUST clauses or filters present,
        # SHOULD clauses are otherwise optional and msm = 1 is load-bearing
        # (Lucene enforces it independently of the MUST side).
        msm = int(getattr(q, "min_should_match", 0) or 0)
        has_must_side = bool(must or must_phrases or pk.must_slop_phrases
                             or pk.must_prefixes or pk.must_fuzzies
                             or pk.must_wildcards or pk.must_regexps
                             or pk.must_pphrases or pk.must_groups)
        if msm > 1 or (msm == 1 and (has_must_side or bool(q.filters))):
            # one doc set per TOP-LEVEL SHOULD unit (pk.msm_units — Lucene
            # counts BooleanQuery clauses BEFORE flattening, so a pure-OR
            # group is ONE unit and members spliced out of required groups
            # don't count at all); a unit's members OR together
            clause_docs: list[np.ndarray] = []

            def _member_set(m) -> list[np.ndarray]:
                if isinstance(m, str):
                    return [_eff((f, m))[1].docs for f in fields
                            if _eff((f, m))[0] > 0]
                if m[0] == "phrase":
                    return [phrase_docs[(f, m[1])] for f in fields
                            if (f, m[1]) in phrase_docs]
                if m[0] == "slop":
                    key = (m[1], m[2])
                    return [sphrase_docs[(f, key)] for f in fields
                            if (f, key) in sphrase_docs]
                if m[0] == "prefix":
                    return [prefix_docs[(f, m[1])] for f in fields
                            if (f, m[1]) in prefix_docs]
                if m[0] == "fuzzy":
                    key = (m[1], m[2])
                    return [fuzzy_docs[(f, key)] for f in fields
                            if (f, key) in fuzzy_docs]
                if m[0] == "wildcard":
                    return [wild_docs[(f, m[1])] for f in fields
                            if (f, m[1]) in wild_docs]
                if m[0] == "regexp":
                    return [rx_docs[(f, m[1])] for f in fields
                            if (f, m[1]) in rx_docs]
                if m[0] == "pprefix":
                    key = (m[1], m[2])
                    return [pp_docs[(f, key)] for f in fields
                            if (f, key) in pp_docs]
                if m[0] == "group":
                    gd = sg_docs.get(id(m[1]))
                    return [gd] if gd is not None and gd.size else []
                return []

            for unit in pk.msm_units:
                arrs = [a for m in unit for a in _member_set(m)]
                clause_docs.append(
                    np.unique(np.concatenate(arrs)) if arrs
                    else np.empty(0, np.int64))
            merged = (np.concatenate(clause_docs) if clause_docs
                      else np.empty(0, np.int64))
            u, cnt = np.unique(merged, return_counts=True)
            ok_docs = self._drop_tombstones(u[cnt >= msm])
            candidates = ok_docs if candidates is None else \
                candidates[np.isin(candidates, ok_docs, assume_unique=True)]
        excluded = None
        ex = [_eff(p)[1].docs for p in not_pairs if _eff(p)[0] > 0]
        ex += [phrase_docs[(f, ph)] for ph in not_phrases for f in fields
               if (f, ph) in phrase_docs]
        ex += [sphrase_docs[(f, sp)] for sp in pk.not_slop_phrases for f in fields
               if (f, sp) in sphrase_docs]
        ex += [prefix_docs[(f, pre)] for pre in pk.not_prefixes for f in fields
               if (f, pre) in prefix_docs]
        ex += [fuzzy_docs[(f, fz)] for fz in pk.not_fuzzies for f in fields
               if (f, fz) in fuzzy_docs]
        ex += [wild_docs[(f, wc)] for wc in pk.not_wildcards for f in fields
               if (f, wc) in wild_docs]
        ex += [rx_docs[(f, rx)] for rx in pk.not_regexps for f in fields
               if (f, rx) in rx_docs]
        ex += [pp_docs[(f, ppx)] for ppx in pk.not_pphrases for f in fields
               if (f, ppx) in pp_docs]
        for g in pk.not_groups:
            # -(+a +b): excluded conjunction — docs matching the sub-query
            gd = self._group_match_docs(g, fields, fuzzy_transpositions)
            if gd.size:
                ex.append(gd)
        if ex:
            excluded = np.unique(np.concatenate(ex))

        if explain_doc is not None:
            return self._explain_at(int(explain_doc), scorers, candidates,
                                    excluded, dtype)

        if not scorers:
            if candidates is None:
                return np.empty(0, np.int64), np.empty(0, dtype)
            ids = candidates
            if excluded is not None:
                ids = ids[~np.isin(ids, excluded, assume_unique=True)]
            if after is not None:
                ids = ids[_cursor_mask(ids, np.zeros(ids.size, np.float64),
                                       after)]
            ids = ids[:limit]
            return ids, np.zeros(ids.size, dtype=dtype)

        if algorithm == "bmw" and candidates is None and excluded is None \
                and self._ts_in_bucket.size == 0:
            ids, scores = self._search_bmw(scorers, limit, dtype)
        else:
            ids, scores = self._search_taat(
                scorers, candidates, limit, dtype, excluded=excluded,
                zero_fill=(bool(q.filters) and not must and not must_phrases
                           and not pk.must_slop_phrases and not pk.must_prefixes
                           and not pk.must_fuzzies and not pk.must_wildcards
                           and not pk.must_regexps and not pk.must_pphrases
                           and not pk.must_groups),
                after=after, dismax_tb=dismax_tb)
        return ids, scores

    def _phrase_posting(self, fld: str, terms: tuple, posts) -> "Posting | None":
        """Synthetic posting for an exact phrase in one field: docs where the
        terms occur at consecutive positions, tf = number of phrase occurrences
        (Lucene ExactPhraseMatcher semantics), with block metadata so block-max
        WAND can prune phrase clauses like any term clause."""
        plist = [posts.get((fld, t), _EMPTY) for t in terms]
        docs = plist[0].docs
        for p in plist[1:]:
            if docs.size == 0:
                break
            docs = docs[np.isin(docs, p.docs, assume_unique=True)]
        if docs.size == 0:
            return None
        # vectorized adjacency across ALL candidate docs at once: pack each
        # occurrence as key = doc_index·B + position, then iteratively keep
        # candidate start keys whose key+j exists in term j's key set (sorted-
        # array membership; no per-doc Python loop — a stopword-scale phrase
        # measured ~300 ms with the loop, ~10 ms vectorized). B is sized to the
        # actual max token position (byte4 norms cap the QUANTIZED doc length,
        # not real positions — a >=2^21-token doc must not alias into the next
        # doc's key space), min 2^21.
        max_pos = 0
        for p in plist:
            pos_all, _ = p.positions()
            if pos_all.size:
                max_pos = max(max_pos, int(pos_all.max()))
        BIGP = np.int64(1 << max(21, (max_pos + len(plist) + 1).bit_length()))
        if docs.size and int(docs.size) * int(BIGP) >= (1 << 62):
            raise RuntimeError(
                f"phrase key space overflow: {docs.size} candidate docs × "
                f"max position {max_pos} exceed int64 packing")

        def _keys(p: Posting) -> np.ndarray:
            pos, offs = p.positions()
            idx = np.searchsorted(p.docs, docs)
            from byzer_retrieval_ray.index.postings import _concat_ranges
            tfs = p.tfs[idx]
            gather = _concat_ranges(offs[idx], tfs)
            dcomp = np.repeat(np.arange(docs.size, dtype=np.int64), tfs)
            return dcomp * BIGP + pos[gather]

        cand = _keys(plist[0])
        for k in range(1, len(plist)):
            keys_k = _keys(plist[k])
            q_keys = cand + k
            loc = np.searchsorted(keys_k, q_keys)
            ok = loc < keys_k.size
            ok[ok] &= keys_k[loc[ok]] == q_keys[ok]
            cand = cand[ok]
            if cand.size == 0:
                return None
        freqs = np.bincount(cand // BIGP, minlength=docs.size)
        keep = freqs > 0
        docs, freqs = docs[keep], freqs[keep].astype(np.int64)
        if docs.size == 0:
            return None
        norms = plist[0].norms[np.searchsorted(plist[0].docs, docs)]
        B = codec.BLOCK_SIZE
        starts = np.arange(0, docs.size, B)
        return Posting(docs, freqs, norms, docs[starts],
                       np.maximum.reduceat(freqs, starts),
                       np.minimum.reduceat(norms, starts))

    @staticmethod
    def _union_positions_posting(plist: list) -> "Posting | None":
        """Merged pseudo-posting for ONE multi-term position slot (the Lucene
        MultiPhraseQuery union): docs = union of the terms' docs, positions =
        per-doc ascending merge. Whitespace analysis puts exactly one token
        per position, so the expanded terms' position sets are disjoint per
        doc and tfs add. Fully vectorized (repeat + lexsort + unique)."""
        live = [p for p in plist if p.df > 0]
        if not live:
            return None
        if len(live) == 1:
            return live[0]
        doc_arrs, pos_arrs = [], []
        for p in live:
            pos, _ = p.positions()
            doc_arrs.append(np.repeat(p.docs, p.tfs))
            pos_arrs.append(pos)
        d = np.concatenate(doc_arrs)
        po = np.concatenate(pos_arrs)
        order = np.lexsort((po, d))
        d, po = d[order], po[order]
        docs, tfs = np.unique(d, return_counts=True)
        tfs = tfs.astype(np.int64)
        norms = np.zeros(docs.size, np.uint8)
        for p in live:
            norms[np.searchsorted(docs, p.docs)] = p.norms
        B = codec.BLOCK_SIZE
        starts = np.arange(0, docs.size, B)
        out = Posting(docs, tfs, norms, docs[starts],
                      np.maximum.reduceat(tfs, starts),
                      np.minimum.reduceat(norms, starts))
        offs = np.zeros(docs.size + 1, np.int64)
        np.cumsum(tfs, out=offs[1:])
        out._pos = (po, offs)
        return out

    def _sloppy_posting(self, fld: str, terms: tuple, slop: int,
                        posts) -> "Posting | None":
        """Synthetic posting for a sloppy phrase (``"a b"~N``): IN-ORDER
        alignments p_1 < … < p_k over the terms' positions, ONE tightest match
        per last-term occurrence (each step takes the rightmost predecessor
        strictly left of the current position — by exchange argument that chain
        has the minimal span for that end position), kept when
        cost = (p_k − p_1) − (k−1) ≤ slop. tf = Σ 1/(1+cost) over kept matches —
        the Lucene sloppy frequency — so slop=0 degenerates to the exact-phrase
        tf (cost 0 ⇒ weight 1 per match, same match count), asserted in tests.
        Fully vectorized across candidate docs with the same key packing as
        ``_phrase_posting``; float tf flows through the same BM25 kernels
        (score_tf_norm casts). Documented divergence from Lucene's
        SloppyPhraseMatcher: transposed (out-of-order) matches don't match, and
        repeated-term window enumeration differs. Opt-in Lucene parity:
        ``SearchQuery(slop_in_order=False)`` routes to
        ``_sloppy_posting_unordered`` (the published stream algorithm;
        repeated terms use the collide/lesser/advanceRpts grouping)."""
        if not getattr(self, "_slop_ordered", True):
            return self._sloppy_posting_unordered(fld, terms, slop, posts)
        plist = [posts.get((fld, t), _EMPTY) for t in terms]
        docs = plist[0].docs
        for p in plist[1:]:
            if docs.size == 0:
                break
            docs = docs[np.isin(docs, p.docs, assume_unique=True)]
        if docs.size == 0:
            return None
        max_pos = 0
        for p in plist:
            pos_all, _ = p.positions()
            if pos_all.size:
                max_pos = max(max_pos, int(pos_all.max()))
        BIGP = np.int64(1 << max(21, (max_pos + len(plist) + slop + 2).bit_length()))
        if docs.size and int(docs.size) * int(BIGP) >= (1 << 62):
            raise RuntimeError(
                f"sloppy-phrase key space overflow: {docs.size} candidate docs × "
                f"max position {max_pos} exceed int64 packing")

        def _keys(p: Posting) -> np.ndarray:
            pos, offs = p.positions()
            idx = np.searchsorted(p.docs, docs)
            from byzer_retrieval_ray.index.postings import _concat_ranges
            tfs = p.tfs[idx]
            gather = _concat_ranges(offs[idx], tfs)
            dcomp = np.repeat(np.arange(docs.size, dtype=np.int64), tfs)
            return dcomp * BIGP + pos[gather]

        end = _keys(plist[-1])       # one candidate match per last-term occurrence
        cand = end
        for j in range(len(plist) - 2, -1, -1):
            keys_j = _keys(plist[j])
            loc = np.searchsorted(keys_j, cand, side="left") - 1
            ok = loc >= 0
            ok[ok] = (keys_j[loc[ok]] // BIGP) == (cand[ok] // BIGP)
            cand, end = keys_j[loc[ok]], end[ok]
            if cand.size == 0:
                return None
        cost = (end - cand) - np.int64(len(plist) - 1)
        kept = cost <= slop
        if not kept.any():
            return None
        weights = 1.0 / (1.0 + cost[kept].astype(np.float64))
        freqs = np.bincount(end[kept] // BIGP, weights=weights, minlength=docs.size)
        keep = freqs > 0
        docs, freqs = docs[keep], freqs[keep]
        norms = plist[0].norms[np.searchsorted(plist[0].docs, docs)]
        B = codec.BLOCK_SIZE
        starts = np.arange(0, docs.size, B)
        return Posting(docs, freqs, norms, docs[starts],
                       np.maximum.reduceat(freqs, starts),
                       np.minimum.reduceat(norms, starts))

    def _sloppy_posting_unordered(self, fld: str, terms: tuple, slop: int,
                                  posts) -> "Posting | None":
        """Lucene-parity sloppy posting (``SearchQuery(slop_in_order=False)``):
        out-of-order alignments match, with tf from the SloppyPhraseMatcher
        stream (``_lucene_sloppy_freq``) over ADJUSTED positions (pos − term
        offset) — ``"b a"~2`` matches a doc containing ``a b`` at cost 2.
        REPEATED terms route through the repeats-aware stream
        (``_lucene_sloppy_freq_rpts``: Lucene's collide/lesser/advanceRpts
        grouping — two slots of the same term never consume one token
        occurrence). Candidate docs are the same all-terms intersection as
        the ordered path; the per-doc stream is a Python loop by nature
        (Lucene's own matcher is a per-doc stream) and runs only on that
        intersection."""
        has_rpts = len(set(terms)) != len(terms)
        gid = [terms.index(t) for t in terms]      # same term → same group
        plist = [posts.get((fld, t), _EMPTY) for t in terms]
        docs = plist[0].docs
        for p in plist[1:]:
            if docs.size == 0:
                break
            docs = docs[np.isin(docs, p.docs, assume_unique=True)]
        if docs.size == 0:
            return None
        per_term = []
        for j, p in enumerate(plist):
            pos_all, offs = p.positions()
            idx = np.searchsorted(p.docs, docs)
            per_term.append((pos_all, offs[idx], p.tfs[idx], np.int64(j)))
        freqs = np.zeros(docs.size, np.float64)
        for di in range(docs.size):
            pls = [pos_all[int(st[di]):int(st[di]) + int(tf[di])] - j
                   for pos_all, st, tf, j in per_term]
            if has_rpts:
                # a doc with fewer occurrences of a repeated term than its
                # phrase slots can never align collision-free
                if any(len(pls[j]) < sum(1 for g in gid if g == gid[j])
                       for j in range(len(pls))):
                    continue
                freqs[di] = _lucene_sloppy_freq_rpts(pls, gid, slop)
            else:
                freqs[di] = _lucene_sloppy_freq(pls, slop)
        keep = freqs > 0
        if not keep.any():
            return None
        docs, freqs = docs[keep], freqs[keep]
        norms = plist[0].norms[np.searchsorted(plist[0].docs, docs)]
        B = codec.BLOCK_SIZE
        starts = np.arange(0, docs.size, B)
        return Posting(docs, freqs, norms, docs[starts],
                       np.maximum.reduceat(freqs, starts),
                       np.minimum.reduceat(norms, starts))

    def _term_scores(self, posting: Posting, cache, w, dtype, lo=None, hi=None):
        s = slice(lo, hi)
        if cache is None:    # constant-score clause (prefix queries)
            docs = posting.docs[s]
            return docs, np.full(docs.size, w, dtype=dtype)
        return posting.docs[s], bm25.score_tf_norm(posting.tfs[s], posting.norms[s],
                                                   cache, w, dtype=dtype)

    # ---------- BM25F (CombinedFieldQuery) ----------

    def _field_dlq(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """(sorted doc_ids, quantized lengths float64) for EVERY live doc of
        the bucket in ``field`` — one vectorized pass over the bucket's
        docstore analyzed column (the same whitespace tokenization and
        Lucene byte4 quantization the indexer used), cached per searcher.
        Bucket-local by construction: the docstore slice is this bucket's."""
        cache = getattr(self, "_dlq_cache", None)
        if cache is None:
            cache = self._dlq_cache = {}
        if field in cache:
            return cache[field]
        t = self._docstore(["doc_id", field])
        ids = t["doc_id"].to_numpy()
        col = t[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        toks = pc.utf8_split_whitespace(col)
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        ok = pc.not_equal(flat, "")
        cnt = np.bincount(
            pc.filter(par, ok).to_numpy(zero_copy_only=False),
            minlength=len(t)).astype(np.int64)
        dlq = smallfloat.quantize_length_np(cnt).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        cache[field] = (ids[order], dlq[order])
        return cache[field]

    def _search_combined(self, q: SearchQuery, precision: str,
                         after=None, explain_doc: int | None = None):
        """BM25F top-limit (Lucene sandbox CombinedFieldQuery semantics):
        tf = Σ_f w_f·tf_f, dl = Σ_f w_f·quantized_len_f, avgdl =
        Σ_f w_f·sumTotalTermFreq_f / docCount (docCount = max over fields),
        df = max over fields. Term clauses only; scoring accumulates
        per-term dtype scores in float64 in clause order like TAAT."""
        from byzer_retrieval_ray.functions.queryparser import parse_keyword

        dtype = np.float32 if precision == "float32" else np.float64
        fw: dict[str, float] = {}
        for f in q.combined_fields:
            if "^" in f:
                name, _, b = f.rpartition("^")
                fw[name] = float(b)
            else:
                fw[f] = 1.0
        bad = [f for f in fw if f not in self.gen.analyzed]
        if bad:
            raise ValueError(
                f"combined_fields {bad} are not analyzed; analyzed fields: "
                f"{sorted(self.gen.analyzed)}")
        pk = parse_keyword((q.keyword or "").strip())
        unsupported = (pk.phrases or pk.must_phrases or pk.not_phrases
                       or pk.prefixes or pk.must_prefixes or pk.not_prefixes
                       or pk.fuzzies or pk.must_fuzzies or pk.not_fuzzies
                       or pk.wildcards or pk.must_wildcards
                       or pk.not_wildcards or pk.regexps or pk.must_regexps
                       or pk.not_regexps or pk.pphrases or pk.must_pphrases
                       or pk.not_pphrases or pk.slop_phrases
                       or pk.must_slop_phrases or pk.not_slop_phrases
                       or pk.must_groups or pk.should_groups or pk.not_groups)
        if unsupported:
            raise ValueError("combined_fields (BM25F) supports term clauses "
                             "only (+term / -term / term^B)")
        if int(getattr(q, "min_should_match", 0) or 0) > 0 \
                or getattr(q, "synonyms", None):
            raise ValueError("combined_fields (BM25F) does not support "
                             "min_should_match or synonyms")
        fields = sorted(fw)
        # pseudo-field collection stats (CombinedFieldQuery.rewrite)
        fstats = self.stats.stats["fields"]
        doc_count = max(fstats[f]["doc_count"] for f in fields)
        sum_ttf = sum(fw[f] * fstats[f]["sum_ttf"] for f in fields)
        avgdl = dtype(sum_ttf / doc_count) if doc_count > 0 else dtype(1.0)
        k1, b = dtype(bm25.K1), dtype(bm25.B)
        one = dtype(1.0)

        scored_terms = pk.should + pk.must
        mult: dict[str, float] = {}
        for t in scored_terms:
            mult[t] = mult.get(t, 0) + 1
        for t, extra in pk.boosts.items():
            if t in mult:
                mult[t] += extra
        pairs = [(f, t) for t in mult for f in fields]
        pairs += [(f, t) for t in pk.must_not for f in fields]
        stats = self.stats.term_stats(pairs)
        posts = self.fetch_postings([p for p in pairs if stats[p][0] > 0])

        dlqs = {f: self._field_dlq(f) for f in fields}

        def _dl_combined(docs: np.ndarray) -> np.ndarray:
            dl = np.zeros(docs.size, dtype=np.float64)
            for f in fields:
                ids_f, dlq_f = dlqs[f]
                loc = np.searchsorted(ids_f, docs)
                ok = loc < ids_f.size
                ok[ok] = ids_f[loc[ok]] == docs[ok]
                dl[ok] += fw[f] * dlq_f[loc[ok]]
            return dl

        def _term_docs(t: str) -> np.ndarray:
            arrs = [posts[(f, t)].docs for f in fields
                    if stats[(f, t)][0] > 0]
            return (np.unique(np.concatenate(arrs)) if arrs
                    else np.empty(0, np.int64))

        term_scores = []   # (term, docs, scores, tf_c, dl_c, w), clause order
        for t in mult:
            df_c = max((stats[(f, t)][0] for f in fields), default=0)
            if df_c == 0:
                continue
            parts_docs, parts_tf = [], []
            for f in fields:
                if stats[(f, t)][0] == 0:
                    continue
                p = posts[(f, t)]
                parts_docs.append(p.docs)
                parts_tf.append(fw[f] * p.tfs.astype(np.float64))
            docs = np.concatenate(parts_docs)
            u, inv = np.unique(docs, return_inverse=True)
            tfc = np.zeros(u.size, dtype=np.float64)
            np.add.at(tfc, inv, np.concatenate(parts_tf))
            dlc = _dl_combined(u)
            norm_inv = one / (k1 * ((one - b) + b * dlc.astype(dtype) / avgdl))
            w = bm25.term_weight(doc_count, df_c, boost=float(mult[t]),
                                 dtype=dtype)
            s = (w - w / (one + tfc.astype(dtype) * norm_inv)).astype(dtype)
            term_scores.append((t, u, s, tfc, dlc, w))

        candidates = self.filter_candidates(q.filters)
        for t in pk.must:
            td = _term_docs(t)
            candidates = td if candidates is None else \
                candidates[np.isin(candidates, td, assume_unique=True)]
        excluded = None
        ex = [_term_docs(t) for t in pk.must_not]
        ex = [e for e in ex if e.size]
        if ex:
            excluded = np.unique(np.concatenate(ex))

        if explain_doc is not None:
            # Lucene-explain shape for BM25F (same contract as _explain_at:
            # per-clause dtype scores accumulated in float64 in clause
            # order — the explained total equals the doc's search score)
            d = np.int64(int(explain_doc))
            in_cand = candidates is None or bool(np.isin(d, candidates))
            is_excl = (excluded is not None and bool(np.isin(d, excluded))) \
                or bool(self._ts_in_bucket.size
                        and np.isin(d, self._ts_in_bucket))
            label = "combined(" + ",".join(
                f"{f}^{fw[f]:g}" if fw[f] != 1.0 else f
                for f in fields) + ")"
            clauses: list[dict] = []
            acc = np.float64(0.0)
            for t, u, s, tfc, dlc, w in term_scores:
                idx = int(np.searchsorted(u, d))
                if idx >= u.size or u[idx] != d:
                    continue
                clauses.append({"field": label, "clause": t,
                                "kind": "bm25f", "tf": float(tfc[idx]),
                                "dl": float(dlc[idx]), "weight": float(w),
                                "score": float(s[idx])})
                acc += np.float64(s[idx])
            matched = bool(clauses) and in_cand and not is_excl
            return {"doc_id": int(explain_doc), "matched": matched,
                    "score": float(dtype(acc)) if matched else 0.0,
                    "clauses": clauses, "in_candidates": in_cand,
                    "excluded": is_excl}

        all_docs = [u for _, u, _, _, _, _ in term_scores]
        union = (np.unique(np.concatenate(all_docs)) if all_docs
                 else np.empty(0, np.int64))
        if candidates is not None:
            union = union[np.isin(union, candidates, assume_unique=True)]
        ts = self._ts_in_bucket
        if ts.size and union.size:
            union = union[~np.isin(union, ts)]
        if excluded is not None and union.size:
            union = union[~np.isin(union, excluded, assume_unique=True)]
        acc = np.zeros(union.size, dtype=np.float64)
        for _, docs, scores, _, _, _ in term_scores:   # clause order = float addition order
            idx = np.searchsorted(union, docs)
            valid = idx < union.size
            valid[valid] &= union[idx[valid]] == docs[valid]
            np.add.at(acc, idx[valid], scores[valid].astype(np.float64))
        scores = acc.astype(dtype)
        if candidates is not None and not pk.must:
            # zero-score filter matches still qualify (SHOULD + FILTER
            # BooleanQuery semantics — same zero_fill rule as _search_taat)
            zero = candidates[~np.isin(candidates, union, assume_unique=True)]
            if ts.size and zero.size:
                zero = zero[~np.isin(zero, ts)]
            if excluded is not None and zero.size:
                zero = zero[~np.isin(zero, excluded, assume_unique=True)]
            union = np.concatenate([union, zero])
            scores = np.concatenate([scores, np.zeros(zero.size, dtype=dtype)])
        if after is not None:
            keep = _cursor_mask(union, scores, after)
            union, scores = union[keep], scores[keep]
        order = np.lexsort((union, -scores.astype(np.float64)))[:q.limit]
        return union[order], scores[order]

    # ---------- nested-group evaluation (should_groups / not_groups) ----------

    def _member_docs(self, m, fields, fuzzy_transpositions) -> np.ndarray:
        """Sorted unique docs matching ONE typed clause member in ≥1 searched
        field (str = term; tuples per the parser's member model; ("group", g)
        recurses). Fetches its own postings — the BucketSearcher posting
        cache absorbs overlap with the main clause sections."""
        arrs: list[np.ndarray] = []
        if isinstance(m, str):
            pairs = [(f, m) for f in fields]
            st = self.stats.term_stats(pairs)
            live = [p for p in pairs if st[p][0] > 0]
            ps = self.fetch_postings(live)
            arrs = [ps[p].docs for p in live]
        elif m[0] in ("phrase", "slop"):
            terms = tuple(m[1])
            slop = m[2] if m[0] == "slop" else 0
            for f in fields:
                pairs = [(f, t) for t in terms]
                st = self.stats.term_stats(pairs)
                if any(st[p][0] == 0 for p in pairs):
                    continue
                ps = self.fetch_postings(pairs)
                pp = (self._phrase_posting(f, terms, ps) if slop == 0
                      else self._sloppy_posting(f, terms, slop, ps))
                if pp is not None:
                    arrs.append(pp.docs)
        elif m[0] in ("prefix", "fuzzy", "wildcard", "regexp"):
            for f in fields:
                if m[0] == "prefix":
                    terms = self.stats.expand_prefix(f, m[1])
                elif m[0] == "fuzzy":
                    terms = self.stats.expand_fuzzy(f, m[1], m[2],
                                                    fuzzy_transpositions)
                elif m[0] == "wildcard":
                    terms = self.stats.expand_wildcard(f, m[1])
                else:
                    terms = self.stats.expand_regexp(f, m[1])
                if not terms:
                    continue
                tpairs = [(f, t) for t in terms]
                tposts = self.fetch_postings(tpairs)
                arrs += [tposts[p].docs for p in tpairs if tposts[p].df > 0]
        elif m[0] == "pprefix":
            pterms, pre = tuple(m[1]), m[2]
            for f in fields:
                pairs = [(f, t) for t in pterms]
                st = self.stats.term_stats(pairs)
                if any(st[p][0] == 0 for p in pairs):
                    continue
                exp = self.stats.expand_prefix(f, pre)
                if not exp:
                    continue
                epairs = [(f, t) for t in exp]
                eposts = self.fetch_postings(epairs)
                merged = self._union_positions_posting(
                    [eposts[p] for p in epairs])
                if merged is None:
                    continue
                ps = dict(self.fetch_postings(pairs))
                PSEUDO = "\x00pprefix"
                ps[(f, PSEUDO)] = merged
                pp = self._phrase_posting(f, pterms + (PSEUDO,), ps)
                if pp is not None:
                    arrs.append(pp.docs)
        elif m[0] == "group":
            return self._group_match_docs(m[1], fields, fuzzy_transpositions)
        return (np.unique(np.concatenate(arrs)) if arrs
                else np.empty(0, np.int64))

    def _group_match_docs(self, sub, fields,
                          fuzzy_transpositions) -> np.ndarray:
        """Full recursive match-set evaluation of a nested ParsedKeyword
        (Lucene BooleanQuery matching): with MUSTs, match = ∩ musts; else
        match = ∪ shoulds; minus ∪ nots. must_groups are required OR-groups
        (∪ of members, intersected in)."""
        musts: list = list(sub.must)
        musts += [("phrase", tt) for tt in sub.must_phrases]
        musts += [("slop", tt, n) for tt, n in sub.must_slop_phrases]
        musts += [("prefix", t) for t in sub.must_prefixes]
        musts += [("fuzzy", t, n) for t, n in sub.must_fuzzies]
        musts += [("wildcard", t) for t in sub.must_wildcards]
        musts += [("regexp", t) for t in sub.must_regexps]
        musts += [("pprefix", tt, pre) for tt, pre in sub.must_pphrases]
        must_sets = [self._member_docs(m, fields, fuzzy_transpositions)
                     for m in musts]
        must_sets += [
            np.unique(np.concatenate(
                [self._member_docs(m, fields, fuzzy_transpositions)
                 for m in grp] or [np.empty(0, np.int64)]))
            for grp in sub.must_groups]
        if must_sets:
            M = must_sets[0]
            for s in must_sets[1:]:
                if M.size == 0:
                    break
                M = M[np.isin(M, s, assume_unique=True)]
        else:
            should_sets = [self._member_docs(m, fields, fuzzy_transpositions)
                           for m in sub._should_members()]
            M = (np.unique(np.concatenate(should_sets)) if should_sets
                 else np.empty(0, np.int64))
        nots: list = list(sub.must_not)
        nots += [("phrase", tt) for tt in sub.not_phrases]
        nots += [("slop", tt, n) for tt, n in sub.not_slop_phrases]
        nots += [("prefix", t) for t in sub.not_prefixes]
        nots += [("fuzzy", t, n) for t, n in sub.not_fuzzies]
        nots += [("wildcard", t) for t in sub.not_wildcards]
        nots += [("regexp", t) for t in sub.not_regexps]
        nots += [("pprefix", tt, pre) for tt, pre in sub.not_pphrases]
        nots += [("group", g) for g in sub.not_groups]
        for m in nots:
            if M.size == 0:
                break
            nd = self._member_docs(m, fields, fuzzy_transpositions)
            if nd.size:
                M = M[~np.isin(M, nd, assume_unique=True)]
        return M

    def _group_scorers(self, sub, M: np.ndarray, fields, dtype,
                       fuzzy_transpositions, fboost=None) -> list:
        """Masked scorers for a nested group's scoring members (SHOULD and
        MUST members both score — Lucene BooleanQuery): each member's
        posting/doc-set is restricted to the group match set ``M``. Clause
        order inside the group mirrors the top level: terms (should, must,
        required-group members), phrases, slops, then constant multi-term
        clauses, then nested groups."""
        out: list = []
        fboost = fboost or {}

        def _fs(fld):
            fstats = self.stats.stats["fields"][fld]
            avgdl = bm25.avg_field_length(fstats["sum_ttf"],
                                          fstats["doc_count"], dtype=dtype)
            return bm25.norm_inverse_cache(avgdl, dtype=dtype), \
                fstats["doc_count"]

        group_terms = [m for g in sub.must_groups for m in g
                       if isinstance(m, str)]
        scored_terms = sub.should + sub.must + group_terms
        mult: dict[tuple[str, str], float] = {}
        for t in scored_terms:
            for f in fields:
                mult[(f, t)] = mult.get((f, t), 0) + 1
        for t, extra in sub.boosts.items():
            for f in fields:
                if (f, t) in mult:
                    mult[(f, t)] += extra
        st = self.stats.term_stats(list(mult.keys()))
        ps = self.fetch_postings([p for p in mult if st[p][0] > 0])
        for key in mult:
            df = st[key][0]
            if df == 0:
                continue
            masked = _mask_posting(ps[key], M)
            if masked is None:
                continue
            cache, doc_count = _fs(key[0])
            w = bm25.term_weight(doc_count, df,
                                 boost=float(mult[key])
                                 * fboost.get(key[0], 1.0), dtype=dtype)
            out.append((key, masked, cache, w))
        for ph in list(sub.phrases) + list(sub.must_phrases):
            for fld in fields:
                pairs = [(fld, t) for t in ph]
                pst = self.stats.term_stats(pairs)
                if any(pst[p][0] == 0 for p in pairs):
                    continue
                pp = self._phrase_posting(fld, tuple(ph),
                                          self.fetch_postings(pairs))
                if pp is None:
                    continue
                masked = _mask_posting(pp, M)
                if masked is None:
                    continue
                cache, doc_count = _fs(fld)
                w = sum(bm25.term_weight(doc_count, pst[(fld, t)][0],
                                         dtype=dtype) for t in ph)
                out.append(((fld, " ".join(ph)), masked, cache,
                            dtype(w * fboost.get(fld, 1.0))))
        for sp in list(sub.slop_phrases) + list(sub.must_slop_phrases):
            tt, n = sp
            for fld in fields:
                pairs = [(fld, t) for t in tt]
                pst = self.stats.term_stats(pairs)
                if any(pst[p][0] == 0 for p in pairs):
                    continue
                pp = self._sloppy_posting(fld, tuple(tt), n,
                                          self.fetch_postings(pairs))
                if pp is None:
                    continue
                masked = _mask_posting(pp, M)
                if masked is None:
                    continue
                cache, doc_count = _fs(fld)
                w = sum(bm25.term_weight(doc_count, pst[(fld, t)][0],
                                         dtype=dtype) for t in tt)
                out.append(((fld, " ".join(tt) + f"~{n}"), masked, cache,
                            dtype(w * fboost.get(fld, 1.0))))
        const_members: list[tuple[str, object]] = []
        const_members += [("pre", t) for t in
                          list(sub.prefixes) + list(sub.must_prefixes)]
        const_members += [("fz", m) for m in
                          list(sub.fuzzies) + list(sub.must_fuzzies)]
        const_members += [("wc", t) for t in
                          list(sub.wildcards) + list(sub.must_wildcards)]
        const_members += [("rx", t) for t in
                          list(sub.regexps) + list(sub.must_regexps)]
        const_members += [("ppx", m) for m in
                          list(sub.pphrases) + list(sub.must_pphrases)]
        for kind, payload in const_members:
            typed = {"pre": lambda: ("prefix", payload),
                     "fz": lambda: ("fuzzy", payload[0], payload[1]),
                     "wc": lambda: ("wildcard", payload),
                     "rx": lambda: ("regexp", payload),
                     "ppx": lambda: ("pprefix", payload[0], payload[1])}[kind]()
            for fld in fields:
                docs = self._member_docs(typed, [fld], fuzzy_transpositions)
                docs = docs[np.isin(docs, M, assume_unique=True)]
                if docs.size == 0:
                    continue
                label = {"pre": lambda: f"{payload}*",
                         "fz": lambda: f"{payload[0]}~{payload[1]}",
                         "wc": lambda: str(payload),
                         "rx": lambda: f"/{payload}/",
                         "ppx": lambda: " ".join(payload[0]) + " "
                         + payload[1] + "*"}[kind]()
                out.append(((fld, label), _const_posting(docs), None,
                            dtype(fboost.get(fld, 1.0))))
        for g2 in sub.should_groups:
            M2 = self._group_match_docs(g2, fields, fuzzy_transpositions)
            M2 = M2[np.isin(M2, M, assume_unique=True)]
            if M2.size:
                out += self._group_scorers(g2, M2, fields, dtype,
                                           fuzzy_transpositions, fboost)
        return out

    def _explain_at(self, doc: int, scorers, candidates, excluded, dtype) -> dict:
        """Per-clause score breakdown for one doc (Lucene Explanation shape):
        clause entries carry the label, weight, tf/norm (BM25 clauses) and the
        dtype per-clause score; the total is the clause scores accumulated in
        float64 IN CLAUSE ORDER then cast — the exact arithmetic of
        ``_search_taat``/``_search_bmw``, so explain total == search score."""
        d = np.int64(doc)
        in_cand = candidates is None or bool(np.isin(d, candidates))
        is_excl = excluded is not None and bool(np.isin(d, excluded))
        tombstoned = self._drop_tombstones(np.array([d])).size == 0
        clauses: list[dict] = []
        acc = np.float64(0.0)
        for key, posting, cache, w in scorers:
            idx = int(np.searchsorted(posting.docs, d))
            if idx >= posting.docs.size or posting.docs[idx] != d:
                continue
            if cache is None:    # constant-score clause (prefix/fuzzy/…)
                s = dtype(w)
                entry = {"field": key[0], "clause": key[1],
                         "kind": "constant", "weight": float(w),
                         "score": float(s)}
            else:
                tf = posting.tfs[idx:idx + 1]
                nb = posting.norms[idx:idx + 1]
                s = bm25.score_tf_norm(tf, nb, cache, w, dtype=dtype)[0]
                entry = {"field": key[0], "clause": key[1], "kind": "bm25",
                         "tf": int(tf[0]), "norm_byte": int(nb[0]),
                         "weight": float(w), "score": float(s)}
            clauses.append(entry)
            acc += np.float64(s)
        matched = bool(clauses) and in_cand and not is_excl and not tombstoned
        return {"doc_id": int(doc), "matched": matched,
                "score": float(dtype(acc)) if matched else 0.0,
                "clauses": clauses, "in_candidates": in_cand,
                "excluded": is_excl or tombstoned}

    def _search_taat(self, scorers, candidates, limit, dtype, excluded=None,
                     zero_fill=False, after=None, dismax_tb=None):
        """Vectorized term-at-a-time; exact; supports filter candidates, +/- term
        constraints and tombstones. ``zero_fill`` adds zero-score filter matches
        (SHOULD + FILTER BooleanQuery semantics). ``after`` is the
        (score, doc_id) pagination cursor — only hits strictly after it in
        the (score desc, doc_id asc) total order survive. ``dismax_tb`` (a
        float in [0, 1]) switches the per-clause field combination from sum
        to Lucene DisjunctionMaxQuery: a clause's per-field scorers are
        emitted as one CONSECUTIVE run sharing the clause label (key[1] —
        every scorer-building section iterates fields in the inner loop),
        and each run folds to max + tb·(sum − max) per doc before joining
        the clause-order float64 addition."""
        all_docs = []
        for _, posting, cache, w in scorers:
            all_docs.append(posting.docs)
        union = np.unique(np.concatenate(all_docs)) if all_docs else np.empty(0, np.int64)
        if candidates is not None:
            union = union[np.isin(union, candidates, assume_unique=True)]
        else:
            ts = self._ts_in_bucket
            if ts.size:
                union = union[~np.isin(union, ts)]
        if excluded is not None and union.size:
            union = union[~np.isin(union, excluded, assume_unique=True)]
        acc = np.zeros(union.size, dtype=np.float64)
        if dismax_tb is None:
            for _, posting, cache, w in scorers:   # clause order = float addition order
                docs, scores = self._term_scores(posting, cache, w, dtype)
                idx = np.searchsorted(union, docs)
                valid = (idx < union.size)
                valid[valid] &= union[idx[valid]] == docs[valid]
                np.add.at(acc, idx[valid], scores[valid].astype(np.float64))
        else:
            tb, i = float(dismax_tb), 0
            while i < len(scorers):
                j = i
                while j < len(scorers) \
                        and scorers[j][0][1] == scorers[i][0][1]:
                    j += 1
                gsum = np.zeros(union.size, dtype=np.float64)
                gmax = np.zeros(union.size, dtype=np.float64)
                for k in range(i, j):       # field order = float addition order
                    _, posting, cache, w = scorers[k]
                    docs, sc = self._term_scores(posting, cache, w, dtype)
                    idx = np.searchsorted(union, docs)
                    valid = (idx < union.size)
                    valid[valid] &= union[idx[valid]] == docs[valid]
                    arr = np.zeros(union.size, dtype=np.float64)
                    arr[idx[valid]] = sc[valid].astype(np.float64)
                    gsum += arr
                    np.maximum(gmax, arr, out=gmax)
                # BM25/constant clause scores are > 0, so the zero init is
                # "clause absent" and contributes nothing for non-matches
                acc += gmax + tb * (gsum - gmax)
                i = j
        scores = acc.astype(dtype)
        if candidates is not None and zero_fill:
            # zero-score filter matches still qualify (SHOULD + FILTER semantics)
            zero = candidates[~np.isin(candidates, union, assume_unique=True)]
            if excluded is not None and zero.size:
                zero = zero[~np.isin(zero, excluded, assume_unique=True)]
            union = np.concatenate([union, zero])
            scores = np.concatenate([scores, np.zeros(zero.size, dtype=dtype)])
        if after is not None:
            keep = _cursor_mask(union, scores, after)
            union, scores = union[keep], scores[keep]
        order = np.lexsort((union, -scores.astype(np.float64)))[:limit]
        return union[order], scores[order]

    def _search_bmw(self, scorers, limit, dtype):
        """Block-max WAND at block-range granularity.

        Sweep candidate doc ranges delimited by the union of all terms' block starts;
        a range whose summed per-term block score bounds can't beat the running top-k
        threshold is skipped without decoding scores; surviving ranges are scored
        vectorized in clause order (identical float addition order to TAAT).
        """
        n_t = len(scorers)
        bounds_per_term = []
        for key, posting, cache, w in scorers:
            if cache is None:    # constant-score clause: bound = the constant
                bb = np.full(posting.blk_first.size, float(w), dtype=np.float64)
            else:
                bb = bm25.max_block_score_bound(posting.blk_max_tf,
                                                posting.blk_min_norm,
                                                cache, w, dtype=dtype).astype(np.float64)
            bounds_per_term.append(bb)
        # breakpoints: every block start of every term, plus +inf sentinel
        edges = np.unique(np.concatenate([s[1].blk_first for s in scorers]))
        topk: list[float] = []   # min-heap of the current top-k scores
        out_docs, out_scores = [], []
        B = codec.BLOCK_SIZE

        for ei in range(edges.size):
            lo_doc = edges[ei]
            hi_doc = edges[ei + 1] if ei + 1 < edges.size else np.iinfo(np.int64).max
            # upper bound: sum of the active block bound of each term in this range
            ub = 0.0
            active = []
            for ti, (key, posting, cache, w) in enumerate(scorers):
                bi = np.searchsorted(posting.blk_first, lo_doc, side="right") - 1
                if bi < 0:
                    continue
                blk_start = bi * B
                blk_end = min(blk_start + B, posting.df)
                # does this term have postings in [lo_doc, hi_doc)?
                plo = np.searchsorted(posting.docs, lo_doc)
                if plo >= posting.df or posting.docs[plo] >= hi_doc:
                    continue
                phi = np.searchsorted(posting.docs, hi_doc)
                # range may span into the next block for the LAST edge gap; bound with
                # max over touched blocks
                bi2 = np.searchsorted(posting.blk_first, posting.docs[phi - 1], side="right") - 1
                ub += float(bounds_per_term[ti][bi:bi2 + 1].max())
                active.append((ti, plo, phi))
            if not active:
                continue
            if len(topk) >= limit and ub <= topk[0]:
                continue
            # score the range exactly (vectorized), clause order preserved
            segs = []
            for ti, plo, phi in active:
                segs.append(scorers[ti][1].docs[plo:phi])
            union = np.unique(np.concatenate(segs))
            acc = np.zeros(union.size, dtype=np.float64)
            for ti, plo, phi in active:
                key, posting, cache, w = scorers[ti]
                docs, scores = self._term_scores(posting, cache, w, dtype, plo, phi)
                idx = np.searchsorted(union, docs)
                np.add.at(acc, idx, scores.astype(np.float64))
            sc = acc.astype(dtype)
            # prune below the running threshold VECTORIZED; only the (few)
            # survivors touch the Python heap. Appending a superset of the strict
            # per-doc loop's output is harmless — the final lexsort keeps the same
            # top-limit (ties broken by doc_id asc), so TAAT parity is preserved.
            if len(topk) >= limit:
                cand = np.flatnonzero(sc > topk[0])
            else:
                cand = np.arange(sc.size)
            for i in cand.tolist():
                s = float(sc[i])
                if len(topk) < limit:
                    heapq.heappush(topk, s)
                    out_docs.append(int(union[i]))
                    out_scores.append(s)
                elif s > topk[0]:
                    heapq.heapreplace(topk, s)
                    out_docs.append(int(union[i]))
                    out_scores.append(s)
        docs = np.array(out_docs, dtype=np.int64)
        scores = np.array(out_scores, dtype=dtype)
        order = np.lexsort((docs, -scores.astype(np.float64)))[:limit]
        return docs[order], scores[order]

    # ---------- vector search ----------

    def _vectors(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        tbl = self._docstore(["doc_id", field])
        col = tbl[field].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        n = len(col)
        dim = flat.size // n if n else 0
        return tbl["doc_id"].to_numpy(), flat.reshape(n, dim)

    def _ivf_state(self, field: str, n_centroids: int):
        """Per-bucket IVF coarse index over the vector column, built once per
        searcher (actor state, ST1 semantics) and cached: a k-means codebook
        trained on this bucket's vectors plus per-row cell assignments. The
        coarse-quantization serving dial next to brute/hnsw: recall is tuned
        with ``nprobe``; nprobe == n_centroids degenerates to exact brute
        force. ``n_centroids <= 0`` auto-sizes the codebook to √(bucket size)
        and trains on every bucket vector (they are already actor-resident) —
        the 10^9-vector shape, where a fixed 16-cell codebook would make every
        probe scan n/16 rows."""
        if not hasattr(self, "_ivf_cache"):
            self._ivf_cache: dict = {}
        key = (field, n_centroids)
        if key not in self._ivf_cache:
            from byzer_retrieval_ray.ops.ann import train_codebook
            ids, mat = self._vectors(field)
            m64 = mat.astype(np.float64)
            norms = np.linalg.norm(m64, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = m64 / norms
            cent = assign = None
            if n_centroids <= 0:
                # auto codebook: prefer the structure persisted at build time
                # (index/ann_store.py — byte-identical training arithmetic)
                loaded = self._load_ann(field, len(ids))
                if loaded is not None:
                    from byzer_retrieval_ray.index.ann_store import load_ivf
                    got = load_ivf(loaded)
                    if got is not None:
                        cent, assign = got
                if cent is None:
                    n_c = max(1, int(np.sqrt(len(unit))))
                    cent = train_codebook(unit, n_c)
            else:
                cent = train_codebook(unit[:min(len(unit), 4096)], n_centroids)
            if assign is None:
                assign = (np.argmax(unit @ cent.T, axis=1) if len(unit)
                          else np.empty(0, np.int64))
            self._ivf_cache[key] = (ids, mat, cent, assign)
        return self._ivf_cache[key]

    def _load_ann(self, field: str, n_rows: int,
                  max_conn: int | None = None,
                  beam_width: int | None = None) -> str | None:
        """Path of this bucket's persisted ANN npz when it matches the request
        (row count and, when given, graph params) — None falls back to the
        legacy lazy in-actor build (pre-ann generations)."""
        ent = self.gen.info.get("ann", {}).get(field)
        if not ent:
            return None
        if max_conn is not None and ent.get("max_conn") != max_conn:
            return None
        if beam_width is not None and ent.get("beam_width") != beam_width:
            return None
        b = ent.get("buckets", {}).get(str(self.bucket))
        if not b or b.get("n") != n_rows or not os.path.exists(b["path"]):
            return None
        return b["path"]

    def _hnsw_state(self, field: str, max_conn: int, beam_width: int):
        """Per-bucket HNSW graph over the vector column — restored from the
        structure PERSISTED at build time (index/ann_store.py; Lucene builds
        the graph at flush: XLucene95HnswVectorsFormat.java:119,130) and cached
        as actor state. Pre-ann generations or non-default params fall back to
        the in-actor build (RetrievalWorker.java:346-366 serving semantics;
        defaults maxConn=16, beamWidth=100)."""
        if not hasattr(self, "_hnsw_cache"):
            self._hnsw_cache: dict = {}
        key = (field, max_conn, beam_width)
        if key not in self._hnsw_cache:
            from byzer_retrieval_ray.ops.hnsw import HNSWIndex
            ids, mat = self._vectors(field)
            m64 = mat.astype(np.float64)
            norms = np.linalg.norm(m64, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = (m64 / norms).astype(np.float32)
            index = None
            path = self._load_ann(field, len(ids), max_conn, beam_width)
            if path is not None:
                # graph persisted at build time (index/ann_store.py): O(edges)
                # restore — the per-node insertion loop never runs here
                from byzer_retrieval_ray.index.ann_store import load_hnsw
                index = load_hnsw(path, unit)
            if index is None:
                index = HNSWIndex(unit, max_conn, beam_width)
            self._hnsw_cache[key] = (ids, mat, index)
        return self._hnsw_cache[key]

    def search_vector(self, q: SearchQuery, precision: str = "float32",
                      algorithm: str = "brute", nprobe: int = 4,
                      n_centroids: int = 16, ef: int = 100,
                      max_conn: int = 16, beam_width: int = 100):
        """Cosine KNN scored (1+cos)/2 (Lucene COSINE), with optional filter.

        algorithm="brute" scans the bucket exactly; "ivf" probes only the
        ``nprobe`` cells nearest the query in this bucket's coarse codebook;
        "hnsw" walks the bucket's HNSW graph with beam ``ef`` (ef >= bucket
        size is the exact exhaustive configuration). Both approximate paths
        re-score their candidate rows with arithmetic identical to the brute
        path, so recall is the only divergence axis. For hnsw the filter (and
        tombstones) ride INTO the traversal as an allowed-mask — the
        reference's filtered-KNN semantics (KnnFloatVectorQuery(field, vec,
        k, filter), RetrievalWorker.java:346-366) with Lucene's exact
        fallbacks for selective filters (ops/hnsw.HNSWIndex.search)."""
        after = getattr(q, "search_after", None)
        if after is not None and algorithm != "brute":
            # ANN recalls return approximate top-k — a deeper page would need
            # over-fetch heuristics; hybrid RRF re-scores by rank, where a
            # score cursor is meaningless. Cursor pagination for vector
            # recalls is EXACT-scan only (round-5; scores are
            # depth-independent there, so pages tile the global order).
            raise ValueError("vector search_after pagination requires the "
                             "exact brute algorithm (ANN top-k is "
                             "approximate; use offset for ANN paging)")
        dtype = np.float32 if precision == "float32" else np.float64
        qv = np.asarray(q.vector, dtype=dtype)
        candidates = self.filter_candidates(q.filters)
        prefiltered = False
        if algorithm == "hnsw":
            ids, mat = self._vectors(q.vectorField)
            if ef < len(ids):
                ids, mat, index = self._hnsw_state(q.vectorField, max_conn,
                                                   beam_width)
                allowed = None
                if candidates is not None:
                    allowed = np.isin(ids, candidates)
                else:
                    ts = self._ts_in_bucket
                    if ts.size:
                        allowed = ~np.isin(ids, ts)
                q64 = np.asarray(q.vector, dtype=np.float64)
                qn = np.linalg.norm(q64)
                qunit = (q64 / qn if qn > 0 else q64).astype(np.float32)
                sel = index.search(qunit, q.limit, ef=ef, allowed=allowed)
                ids, mat = ids[sel], mat[sel]
                prefiltered = allowed is not None
            # ef >= bucket size: exact exhaustive configuration — skip the
            # graph entirely (identical to the brute path)
        elif algorithm == "ivf":
            ids, mat, cent, assign = self._ivf_state(q.vectorField, n_centroids)
            q64 = np.asarray(q.vector, dtype=np.float64)
            qn = np.linalg.norm(q64)
            qunit = q64 / qn if qn > 0 else q64
            order_c = np.argsort(-(cent @ qunit))[:max(1, nprobe)]
            keep = np.isin(assign, order_c)
            ids, mat = ids[keep], mat[keep]
        else:
            ids, mat = self._vectors(q.vectorField)
        mat = mat.astype(dtype)
        if not prefiltered:
            if candidates is not None:
                keep = np.isin(ids, candidates)
                ids, mat = ids[keep], mat[keep]
            else:
                ts = self._ts_in_bucket
                if ts.size:
                    keep = ~np.isin(ids, ts)
                    ids, mat = ids[keep], mat[keep]
        if ids.size == 0:
            return np.empty(0, np.int64), np.empty(0, dtype)
        dots = mat @ qv
        norms = np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((qv * qv).sum())
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(norms > 0, dots / norms, 0.0)
        scores = ((1.0 + cos) / 2.0).astype(dtype)
        if after is not None:
            keep = _cursor_mask(ids, scores, after)
            ids, scores = ids[keep], scores[keep]
        order = np.lexsort((ids, -scores.astype(np.float64)))[:q.limit]
        return ids[order], scores[order]

    # ---------- unscored filter op ----------

    def filter_op(self, q: SearchQuery) -> pa.Table:
        """Filter + typed multi-field sort + limit (RetrievalWorker.java:273-307)."""
        sort_fields = [list(s.keys())[0] for s in q.sorts]
        cols = sorted({"doc_id", *_filter_fields(q.filters), *sort_fields,
                       *[c for c in self._stored_columns()]})
        cols = [c for c in cols if c in _available_columns(self)]
        tbl = self._docstore(cols)
        mask = F.evaluate(tbl, q.filters, analyzed=self.gen.analyzed)
        tbl = tbl.filter(mask)
        ts = self._ts_in_bucket
        if ts.size:
            keep = ~np.isin(tbl["doc_id"].to_numpy(), ts)
            tbl = tbl.filter(pa.array(keep))
        keys = [(list(s.keys())[0], "descending" if list(s.values())[0] == "desc"
                 else "ascending") for s in q.sorts]
        keys.append(("doc_id", "ascending"))
        tbl = tbl.sort_by(keys)
        return tbl.slice(0, q.limit)

    # ---------- result materialization ----------

    def _matchset(self, q: SearchQuery, precision: str):
        """(ids, scores) of the ENTIRE keyword match set — the exact TAAT
        run with an unbounded limit every full-match-set endpoint starts
        from — memoized per searcher instance (≤ 4 entries, keyed by the
        full query dict + precision). The round-5 bounded facet folds
        legitimately scatter 2-3 rounds per call (top-S → probe →
        escalate) and each round re-ran the identical TAAT; the memo makes
        the re-rounds O(partial) instead of O(match set). Safe lifetime:
        every mutation path (build/delete/compact/NRT reload) constructs
        NEW BucketSearcher instances, so a cache can never serve a stale
        generation. Callers must not mutate the returned arrays."""
        from dataclasses import replace

        qq = replace(q, limit=int(1 << 62), search_after=None)
        try:
            import json
            key = (json.dumps(qq.__dict__, sort_keys=True, default=repr),
                   precision)
        except TypeError:
            key = None
        cache = getattr(self, "_matchset_cache", None)
        if cache is None:
            cache = self._matchset_cache = {}
        if key is not None and key in cache:
            return cache[key]
        ids, scores = self.search_keyword(qq, precision=precision,
                                          algorithm="taat")
        out = (np.asarray(ids), np.asarray(scores))
        if key is not None:
            if len(cache) >= 4:
                cache.pop(next(iter(cache)))
            cache[key] = out
        return out

    def _memo_partial(self, kind: str, q: SearchQuery, extra: tuple, fn):
        """Memoize a full-match-set PARTIAL (facet value_counts, sigterms
        foreground counts) per searcher instance, ≤ 2 entries per kind —
        the bounded threshold folds call the same partial 2-3 times per
        query (top-S round, probe round, escalation) and the docstore
        read + tokenize dominates, not the TAAT. Same safe lifetime as
        ``_matchset`` (mutations construct new searcher instances)."""
        import json
        try:
            key = (kind, json.dumps(q.__dict__, sort_keys=True,
                                    default=repr), extra)
        except TypeError:
            return fn()
        cache = getattr(self, "_partial_cache", None)
        if cache is None:
            cache = self._partial_cache = {}
        if key in cache:
            return cache[key]
        out = fn()
        mine = [k for k in cache if k[0] == kind]
        if len(mine) >= 2:
            del cache[mine[0]]
        cache[key] = out
        return out

    def facet_keyword(self, q: SearchQuery, facet_field,
                      precision: str = "float32") -> pa.Table:
        extra = (tuple(facet_field) if isinstance(facet_field, (list, tuple))
                 else facet_field)
        return self._memo_partial(
            "facet", q, (extra, precision),
            lambda: self._facet_keyword_impl(q, facet_field, precision))

    def _facet_keyword_impl(self, q: SearchQuery, facet_field,
                            precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL facet counts over the ENTIRE keyword match set
        (the Lucene facets shape: FacetsCollector counts every hit, not the
        top-k). Returns (value, cnt) rows for this bucket — the master sums
        partials across buckets. Facet values are returned as strings (Lucene
        facet labels are strings); null/missing values don't count. Runs the
        exact TAAT path with an unbounded limit — facets need every match's
        id, never its rank — and reads ONE narrow stored column per bucket
        (fetch_docs column pruning), so the per-bucket payload is
        (distinct values × 16B), independent of match count.

        ``facet_field`` may be a LIST of fields (the elasticsearch
        ``multi_terms`` shape): the bucket key is the value tuple, shipped
        as a \\x1f-joined string; a doc with a null in ANY component
        belongs to no bucket (ES multi_terms semantics); list-typed
        components are rejected. Every downstream fold (bounded threshold
        facet, composite paging, rare_terms) composes unchanged."""
        import pyarrow.compute as pc
        from dataclasses import replace

        empty = pa.table({"value": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        if isinstance(facet_field, (list, tuple)):
            fields = [str(f) for f in facet_field]
            tbl = self.fetch_docs(ids, columns=sorted(set(fields)))
            if any(f not in tbl.column_names for f in fields):
                return empty
            cols, valid = [], None
            for f in fields:
                c = tbl[f].combine_chunks()
                if pa.types.is_list(c.type) or pa.types.is_large_list(c.type):
                    raise ValueError(
                        f"multi_terms component {f!r} is list-typed — a "
                        "doc can only belong to one tuple bucket")
                c = pc.cast(c, pa.string())
                v = pc.is_valid(c)
                valid = v if valid is None else pc.and_(valid, v)
                cols.append(c)
            key = cols[0]
            for c in cols[1:]:
                key = pc.binary_join_element_wise(key, c, "\x1f")
            key = key.filter(valid)
            if len(key) == 0:
                return empty
            vc = pc.value_counts(key)
            return pa.table({
                "value": pc.cast(vc.field("values"), pa.string()),
                "cnt": pc.cast(vc.field("counts"), pa.int64())})
        tbl = self.fetch_docs(ids, columns=[facet_field])
        if facet_field not in tbl.column_names:
            return empty
        col = tbl[facet_field].combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            # multi-valued (array) field: a doc counts ONCE per DISTINCT
            # element it carries (the elasticsearch terms-agg doc_count
            # convention for array fields); vectorized flatten + distinct
            # (parent, value) pairs + per-value count
            flat = pc.cast(col.flatten(), pa.string())
            pairs = pa.table({
                "parent": pc.list_parent_indices(col),
                "value": flat,
            }).filter(pc.is_valid(flat))
            uniq = pairs.group_by(["parent", "value"]).aggregate([])
            agg = uniq.group_by("value").aggregate([("parent", "count")])
            return pa.table({"value": agg["value"],
                             "cnt": pc.cast(agg["parent_count"], pa.int64())})
        vc = pc.value_counts(col)
        vals, cnts = vc.field("values"), vc.field("counts")
        keep = pc.is_valid(vals)
        return pa.table({"value": pc.cast(vals.filter(keep), pa.string()),
                         "cnt": pc.cast(cnts.filter(keep), pa.int64())})

    def collapse_keyword(self, q: SearchQuery, collapse_field: str,
                         precision: str = "float32",
                         group_size: int = 1) -> pa.Table:
        """Per-bucket field collapsing (the elasticsearch ``collapse`` /
        Lucene grouping shape; ``group_size`` > 1 is the Lucene
        DiversifiedTopDocsCollector semantic — at most g hits per key in
        the final ranking): the top hits per distinct value of a stored
        field, ranked by (score desc, doc_id asc). Exact TAAT over the
        ENTIRE match set — a group's best doc may rank far below the plain
        top-k — with ONE narrow column-pruned docstore read. The bucket
        ships its top ``limit`` KEYS × at most g members each (≤ limit·g
        rows) and the master re-collapses. Exactness: a hit d in the global
        answer has < limit globally-kept hits outranking it; every bucket
        key with a member outranking d has a globally-KEPT member
        outranking d (a member dropped globally implies g kept same-key
        outrankers), so < limit keys outrank d's key inside its bucket —
        top-limit-keys shipping suffices. Docs with a null/missing value
        collapse into ONE null group (elasticsearch semantics); keys are
        shipped as strings (Lucene facet-label convention)."""
        from dataclasses import replace

        score_t = pa.float64() if precision == "float64" else pa.float32()
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score": pa.array([], score_t),
                          "key": pa.array([], pa.string())})
        ids, scores = self._matchset(q, precision)
        ids, scores = np.asarray(ids), np.asarray(scores)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[collapse_field])
        if collapse_field not in tbl.column_names:
            raise ValueError(
                f"collapse field {collapse_field!r} is not a stored column")
        if pa.types.is_list(tbl[collapse_field].type) or \
                pa.types.is_large_list(tbl[collapse_field].type):
            raise ValueError(
                f"collapse field {collapse_field!r} is list-typed — a doc "
                "can only collapse into one group")
        fid = tbl["doc_id"].to_numpy()
        order = np.argsort(fid, kind="stable")
        pos = np.searchsorted(fid, ids, sorter=order)
        keys = pc.cast(tbl[collapse_field].combine_chunks(), pa.string()) \
            .take(pa.array(order[pos], pa.int64()))
        enc = keys.dictionary_encode()
        codes = pc.fill_null(pc.cast(enc.indices, pa.int64()), -1) \
            .to_numpy(zero_copy_only=False)
        # ids/scores arrive rank-ordered (score desc, doc_id asc): keep the
        # first g members of each key, restricted to the first `limit`
        # distinct keys (see docstring for why that ships enough)
        first = _diversified_select(codes, int(q.limit),
                                    max(1, int(group_size)),
                                    key_budget=True)
        sel = pa.array(first, pa.int64())
        return pa.table({"doc_id": pa.array(ids[first], pa.int64()),
                         "score": pa.array(scores[first], score_t),
                         "key": keys.take(sel)})

    def tophits_keyword(self, q: SearchQuery, key_field: str, keys: list,
                        per_key: int, precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL per-key top hits — phase 2 of the two-phase
        elasticsearch ``terms`` + ``top_hits`` sub-aggregation (phase 1 =
        facet_keyword picking the bucket keys by match count): for each
        REQUESTED key, this bucket's top ``per_key`` hits by
        (score desc, doc_id asc) over the ENTIRE match set. Ships at most
        len(keys)·per_key (key, doc_id, score) rows; the master fold re-takes
        per_key per key, which is exact — a hit below a bucket's own top
        per_key for its key can never enter the global top per_key.
        Multi-valued (list) key fields are rejected: a hit would land in
        several buckets, which is grouping, not collapsing."""
        from dataclasses import replace

        score_t = pa.float32() if precision == "float32" else pa.float64()
        empty = pa.table({"key": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "score": pa.array([], score_t)})
        ids, scores = self._matchset(q, precision)
        ids, scores = np.asarray(ids), np.asarray(scores)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[key_field])
        if key_field not in tbl.column_names:
            return empty
        col = tbl[key_field].combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            raise ValueError(
                f"top_hits key field {key_field!r} is list-typed — a hit "
                "can only belong to one bucket")
        fid = tbl["doc_id"].to_numpy()
        order = np.argsort(fid, kind="stable")
        pos = np.searchsorted(fid, ids, sorter=order)
        kcol = pc.cast(col, pa.string()).take(pa.array(order[pos], pa.int64()))
        codes = pc.fill_null(pc.cast(
            pc.index_in(kcol, pa.array([str(k) for k in keys], pa.string())),
            pa.int64()), -1).to_numpy(zero_copy_only=False)
        m = codes >= 0
        if not m.any():
            return empty
        c, i, s = codes[m], ids[m], scores[m]
        o = np.lexsort((i, -s.astype(np.float64), c))
        c, i, s = c[o], i[o], s[o]
        new_grp = np.r_[True, c[1:] != c[:-1]]
        starts = np.flatnonzero(new_grp)
        rank = np.arange(c.size) - starts[np.cumsum(new_grp) - 1]
        keep = rank < int(per_key)
        kk = np.asarray([str(k) for k in keys], object)[c[keep]]
        return pa.table({"key": pa.array(kk, pa.string()),
                         "doc_id": pa.array(i[keep], pa.int64()),
                         "score": pa.array(s[keep], score_t)})

    def composite_keyword(self, q: SearchQuery, field: str, size: int,
                          after: str | None = None,
                          precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL page for the elasticsearch ``composite``
        aggregation (single terms source, ascending key order, after-key
        pagination): the bucket's FIRST ``size`` distinct values of
        ``field`` strictly AFTER the cursor, with their match-set counts.
        Exact despite the prune: a value in the global first-``size`` page
        has < size distinct values before it in EVERY bucket where it
        appears, so each such bucket ships it with its full local count —
        the fold sums complete counts. Ships ≤ size (value, count) rows
        per bucket regardless of field cardinality (the composite agg's
        point at scale — unlike facet_counts' full-vocabulary partial)."""
        t = self.facet_keyword(q, field, precision)
        if len(t) == 0:
            return t
        if after is not None:
            t = t.filter(pc.greater(t["value"], pa.scalar(str(after))))
        return t.sort_by("value").slice(0, int(size))

    def facet_top_keyword(self, q: SearchQuery, facet_field: str,
                          shard_size: int,
                          precision: str = "float32") -> pa.Table:
        """Per-bucket BOUNDED facet partial — phase 1 of the exact
        threshold-algorithm facet fold (the Fagin/TPUT distributed-top-k
        family): this bucket's top ``shard_size`` (value, count) rows by
        (count desc, value asc) over the ENTIRE match set, sorted in that
        order so the master can read the truncation threshold off the
        LAST row. Local compute is still the full value_counts (bounded
        by the bucket's own data) — what's bounded is the SHIPPED
        partial: ≤ shard_size rows instead of the full match-set
        vocabulary. The master detects truncation as len == shard_size
        (conservatively — an exactly-shard_size vocabulary re-scatters
        once at 4× and then folds exactly)."""
        t = self.facet_keyword(q, facet_field, precision)
        t = t.sort_by([("cnt", "descending"), ("value", "ascending")])
        return t.slice(0, int(shard_size))

    def facet_probe_keyword(self, q: SearchQuery, facet_field: str,
                            values: list,
                            precision: str = "float32") -> pa.Table:
        """Per-bucket EXACT counts of the requested candidate values over
        the ENTIRE match set — phase 2 of the threshold-algorithm facet
        fold (and of the bounded rare_terms fold): values this bucket
        never saw are simply absent (count 0). Ships ≤ len(values) rows;
        the bucket's own vocabulary never leaves the shard."""
        t = self.facet_keyword(q, facet_field, precision)
        if len(t) == 0 or not values:
            return t.slice(0, 0)
        vs = pa.array([str(v) for v in values], pa.string())
        return t.filter(pc.is_in(t["value"], value_set=vs))

    def rare_partial_keyword(self, q: SearchQuery, facet_field: str,
                             max_doc_count: int,
                             precision: str = "float32") -> pa.Table:
        """Per-bucket LOCALLY-RARE facet partial — phase 1 of the bounded
        exact rare_terms fold: only values with a local match-set count
        ≤ ``max_doc_count`` ship. Exactness: a value with GLOBAL count
        ≤ max_doc_count necessarily has count ≤ max_doc_count in every
        bucket, so every bucket where it appears ships it — the candidate
        union is a superset of the answer, and the probe phase
        (``facet_probe_keyword``) supplies exact global counts to drop
        locally-rare-but-globally-common values. Common values never
        leave their shard."""
        t = self.facet_keyword(q, facet_field, precision)
        if len(t) == 0:
            return t
        return t.filter(pc.less_equal(t["cnt"], int(max_doc_count)))

    def filters_agg_keyword(self, q: SearchQuery, named: dict,
                            other_bucket: bool = False,
                            precision: str = "float32") -> dict:
        """Per-bucket PARTIAL counts for the elasticsearch ``filters``
        aggregation: for each named filter tree, how many docs of the
        ENTIRE keyword match set also satisfy that filter (buckets are
        independent — a doc may count in several, unlike ``terms``).
        ``other_bucket`` adds an ``_other_`` count for match-set docs
        satisfying NONE of the named filters. Ships len(named)(+1) ints
        per bucket — match ids never leave the shard."""
        from dataclasses import replace

        ids, _ = self._matchset(q, precision)
        ids = np.sort(np.asarray(ids))
        out: dict[str, int] = {}
        in_any = np.zeros(ids.size, dtype=bool) if other_bucket else None
        for name, tree in named.items():
            cand = self.filter_candidates(tree)
            if cand is None:          # empty tree = match-all filter
                out[name] = int(ids.size)
                if other_bucket:
                    in_any[:] = True
                continue
            hit = np.isin(ids, cand, assume_unique=True)
            out[name] = int(np.count_nonzero(hit))
            if other_bucket:
                in_any |= hit
        if other_bucket:
            out["_other_"] = int(ids.size - np.count_nonzero(in_any))
        return out

    def matrix_stats_keyword(self, q: SearchQuery, fields: list,
                             precision: str = "float32") -> dict:
        """Per-bucket PARTIAL joint-moment sums for the ``matrix_stats``
        aggregation over the ENTIRE keyword match set: over ROW-COMPLETE
        docs (every requested field non-null — the elasticsearch
        matrix_stats missing-doc exclusion), ships n, per-field Σv and the
        upper-triangle Σ(v_i·v_j) (diagonal = Σv²) — one
        k + k·(k+1)/2 + 1 value partial per bucket, float64, match ids
        never leave the shard. Timestamps aggregate as epoch micros."""
        from dataclasses import replace

        k = len(fields)
        empty = {"n": 0, "sums": [0.0] * k,
                 "prods": [0.0] * (k * (k + 1) // 2)}
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=list(fields))
        cols = []
        for f in fields:
            if f not in tbl.column_names:
                return empty
            col = tbl[f]
            if pa.types.is_timestamp(col.type):
                col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
            cols.append(pc.cast(col, pa.float64()))
        ok = None
        for col in cols:
            v = pc.is_valid(col)
            ok = v if ok is None else pc.and_(ok, v)
        vals = [col.filter(ok).to_numpy(zero_copy_only=False)
                for col in cols]
        n = int(vals[0].size)
        if n == 0:
            return empty
        sums = [float(np.sum(v)) for v in vals]
        prods = [float(np.sum(vals[i] * vals[j]))
                 for i in range(k) for j in range(i, k)]
        return {"n": n, "sums": sums, "prods": prods}

    def weighted_avg_keyword(self, q: SearchQuery, value_field: str,
                             weight_field: str,
                             precision: str = "float32") -> dict:
        """Per-bucket PARTIAL for the elasticsearch ``weighted_avg``
        aggregation over the ENTIRE match set: Σ(value·weight) and Σweight
        over docs where BOTH fields are non-null (the ES skip-missing
        default) — one 3-value float64 partial per bucket."""
        from dataclasses import replace

        empty = {"n": 0, "vw": 0.0, "w": 0.0}
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[value_field, weight_field])
        if value_field not in tbl.column_names \
                or weight_field not in tbl.column_names:
            return empty
        v = pc.cast(tbl[value_field], pa.float64())
        w = pc.cast(tbl[weight_field], pa.float64())
        ok = pc.and_(pc.is_valid(v), pc.is_valid(w))
        va = v.filter(ok).to_numpy(zero_copy_only=False)
        wa = w.filter(ok).to_numpy(zero_copy_only=False)
        if va.size == 0:
            return empty
        return {"n": int(va.size), "vw": float(np.sum(va * wa)),
                "w": float(np.sum(wa))}

    def named_matches(self, named: dict, ids) -> dict:
        """For each named filter tree, which of the given doc_ids (this
        bucket's subset) satisfy it — the elasticsearch ``matched_queries``
        per-hit annotation. Ships ≤ len(named)·len(ids) int64s (ids are a
        top-k hit list, so the payload is bounded by F × limit); an empty
        tree is match-all (every given id that lives in this bucket
        matches)."""
        ids = np.sort(np.asarray(ids, dtype=np.int64))
        out: dict[str, np.ndarray] = {}
        for name, tree in named.items():
            cand = self.filter_candidates(tree)
            if cand is None:
                # match-all filter: restrict to ids present in this bucket
                mine = self.fetch_docs(ids, columns=["doc_id"])["doc_id"] \
                    .to_numpy()
                out[name] = ids[np.isin(ids, mine)]
            else:
                out[name] = ids[np.isin(ids, cand, assume_unique=True)]
        return out

    def adjacency_keyword(self, q: SearchQuery, named: dict,
                          separator: str = "&",
                          precision: str = "float32") -> dict:
        """Per-bucket PARTIAL counts for the elasticsearch
        ``adjacency_matrix`` aggregation: for each named filter tree the
        count of match-set docs satisfying it, AND for each unordered pair
        ``a{sep}b`` (names in given order, i < j) the count satisfying
        BOTH. Ships F + F·(F−1)/2 integers per bucket — match ids never
        leave the shard. Empty buckets are the driver's concern (ES drops
        them after the global fold, not per shard)."""
        from dataclasses import replace

        ids, _ = self._matchset(q, precision)
        ids = np.sort(np.asarray(ids))
        names = list(named)
        masks = []
        for name in names:
            cand = self.filter_candidates(named[name])
            if cand is None:          # empty tree = match-all filter
                masks.append(np.ones(ids.size, dtype=bool))
            else:
                masks.append(np.isin(ids, cand, assume_unique=True))
        out: dict[str, int] = {}
        for i, name in enumerate(names):
            out[name] = int(np.count_nonzero(masks[i]))
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                out[f"{names[i]}{separator}{names[j]}"] = \
                    int(np.count_nonzero(masks[i] & masks[j]))
        return out

    def top_metrics_keyword(self, q: SearchQuery, sort_field: str,
                            metric_fields: list, ascending: bool,
                            size: int,
                            precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL for the elasticsearch ``top_metrics``
        aggregation: the metric field values of the bucket's top ``size``
        match-set docs ordered by a stored numeric/timestamp sort field
        (ties broken doc_id asc — the repo's deterministic convention; ES
        leaves sort ties unspecified). Exact unbounded TAAT + ONE narrow
        docstore read; the bucket ships ≤ size rows of
        (doc_id, sort value, metrics…); the master re-sorts and re-takes
        ``size``, which is exact — a row below a bucket's own top ``size``
        can never enter the global top. Docs with a null SORT value are
        excluded (the sort_keyword convention: Lucene sorts missing last,
        so they can never reach the top anyway for finite data); null
        metric values ship as nulls (ES top_metrics returns null)."""
        from dataclasses import replace

        fields = [f for f in metric_fields if f != sort_field]
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "sort_value": pa.array([], pa.float64()),
                          **{f: pa.array([], pa.float64()) for f in fields}})
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[sort_field] + fields)
        if sort_field not in tbl.column_names:
            return empty
        scol = tbl[sort_field]
        if pa.types.is_timestamp(scol.type):
            scol = pc.cast(pc.cast(scol, pa.timestamp("us")), pa.int64())
        valid = pc.is_valid(scol)
        tbl = tbl.filter(valid)
        if len(tbl) == 0:
            return empty
        svals = pc.cast(scol.filter(valid), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        dids = tbl["doc_id"].to_numpy()
        order = np.lexsort((dids, svals if ascending else -svals))[:int(size)]
        cols = {"doc_id": pa.array(dids[order], pa.int64()),
                "sort_value": pa.array(svals[order], pa.float64())}
        sel = pa.array(order, pa.int64())
        for f in fields:
            if f in tbl.column_names:
                mcol = tbl[f]
                if pa.types.is_timestamp(mcol.type):
                    mcol = pc.cast(pc.cast(mcol, pa.timestamp("us")),
                                   pa.int64())
                cols[f] = pc.cast(mcol.combine_chunks(), pa.float64()) \
                    .take(sel)
            else:
                cols[f] = pa.nulls(len(order), pa.float64())
        return pa.table(cols)

    def string_stats_keyword(self, q: SearchQuery, field: str,
                             precision: str = "float32") -> dict:
        """Per-bucket PARTIAL for the elasticsearch ``string_stats``
        aggregation over the ENTIRE match set: over non-null values of a
        string field (stored OR analyzed — analyzed columns are read via
        the docstore like highlight does), ships (count, Σ char length,
        min/max length, {codepoint: count}) — lengths in CHARACTERS
        (utf8_length), the char distribution for the driver's Shannon
        entropy. The alphabet is bounded (≤ distinct codepoints), so the
        partial is tiny regardless of match count; match ids and values
        never leave the shard."""
        from dataclasses import replace

        empty = {"cnt": 0, "sum_len": 0, "min_len": None, "max_len": None,
                 "chars": {}}
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        if field in self.gen.analyzed:
            tbl = self.fetch_analyzed(np.asarray(ids), field)
        else:
            tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return empty
        col = tbl[field].combine_chunks().drop_null()
        if len(col) == 0:
            return empty
        col = pc.cast(col, pa.string())
        lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        # vectorized codepoint histogram: one utf-32 decode of the
        # concatenated values, then np.unique — C-speed, no Python loop
        blob = "".join(col.to_pylist())
        cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
        uniq, cnts = np.unique(cps, return_counts=True)
        return {"cnt": int(len(col)), "sum_len": int(lens.sum()),
                "min_len": int(lens.min()), "max_len": int(lens.max()),
                "chars": {int(u): int(c) for u, c in zip(uniq, cnts)}}

    def function_score_keyword(self, q: SearchQuery, spec: dict,
                               precision: str = "float32"):
        """Per-bucket function scoring (the elasticsearch ``function_score``
        / ``field_value_factor`` shape; Lucene ``FunctionScoreQuery`` over a
        ``DoubleValuesSource``): every BM25 hit is rescored as

            multiply:  score × modifier(factor × field_value)
            sum:       score + modifier(factor × field_value)

        with modifier ∈ {none, log1p, sqrt, square, reciprocal} and nulls
        replaced by ``missing`` (default 1.0) BEFORE the modifier. Rescoring
        is non-monotone in the BM25 order, so the bucket scores its ENTIRE
        match set (exact TAAT — block-max pruning would be unsound), reads
        ONE narrow docstore column, re-sorts by (new score desc, doc_id asc)
        and ships only its top ``q.limit``; the scatter-gather top-k
        argument applies to the REscored order, so the master merge stays
        exact. Arithmetic in float64 (log1p computed as ln(1+x), the
        SQL-oracle expression shape), cast to the query precision at the
        end.

        A spec with ``decay_function`` instead of ``modifier`` selects the
        elasticsearch decay shape (gauss | exp | linear) on a numeric or
        timestamp field:

            d      = max(0, |v − origin| − offset)
            gauss  = exp(ln(decay) · (d/scale)²)
            exp    = exp(ln(decay) · d/scale)
            linear = max(0, 1 − (1−decay) · d/scale)

        (algebraically identical to the published σ/λ/s forms but written so
        the float64 op sequence is SQL-replicable verbatim). Docs missing
        the field get function value 1.0 — the documented elasticsearch
        behavior for decay functions.

        A spec with ``random_score`` instead selects the elasticsearch
        ``random_score`` function (deterministic, seed + field — ES since
        7.0 requires both for consistent scores):

            boost = fmix32(Horner31(f"{seed}:{value}")) / 2^32  ∈ [0, 1)

        — the repo's SQL-replicable hash family (ops/hll.py uses the same
        one), over the STRING rendering of the field value (nulls render
        as the empty string; values must not contain newlines, the
        poly_hash separator). With ``mode="replace"`` (ES boost_mode
        replace, supported for every function kind) the hit's score IS the
        boost — a deterministic per-seed shuffle of the match set."""
        from dataclasses import replace

        dtype = np.float32 if precision == "float32" else np.float64
        rnd = spec.get("random_score")
        field = spec["field"] if rnd is None else rnd["field"]
        factor = float(spec.get("factor", 1.0))
        missing = float(spec.get("missing", 1.0))
        modifier = spec.get("modifier", "none")
        decay_fn = spec.get("decay_function")
        mode = spec.get("mode", "multiply")
        mods = {"none": lambda v: v,
                "log1p": lambda v: np.log(1.0 + v),
                "sqrt": np.sqrt,
                "square": np.square,
                "reciprocal": lambda v: 1.0 / v}
        if decay_fn is not None:
            if decay_fn not in ("gauss", "exp", "linear"):
                raise ValueError(f"unknown decay_function {decay_fn!r} "
                                 "(one of ['exp', 'gauss', 'linear'])")
            if "origin" not in spec or "scale" not in spec:
                raise ValueError("decay spec needs 'origin' and 'scale'")
            d_origin = float(spec["origin"])
            d_scale = float(spec["scale"])
            d_offset = float(spec.get("offset", 0.0))
            d_decay = float(spec.get("decay", 0.5))
            if d_scale <= 0:
                raise ValueError("decay 'scale' must be > 0")
            if not (0.0 < d_decay < 1.0):
                raise ValueError("'decay' must be in (0, 1)")
        elif rnd is not None:
            if "seed" not in rnd or "field" not in rnd:
                raise ValueError("random_score needs 'seed' and 'field' "
                                 "(the ES >= 7 deterministic form)")
        elif modifier not in mods:
            raise ValueError(f"unknown modifier {modifier!r} "
                             f"(one of {sorted(mods)})")
        if mode not in ("multiply", "sum", "replace"):
            raise ValueError("mode must be 'multiply', 'sum' or 'replace'")
        ids, scores = self._matchset(q, precision)
        ids, scores = np.asarray(ids), np.asarray(scores)
        if ids.size == 0:
            return ids, scores.astype(dtype)
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            raise ValueError(
                f"function-score field {field!r} is not a stored column")
        fid = tbl["doc_id"].to_numpy()
        order = np.argsort(fid, kind="stable")
        pos = np.searchsorted(fid, ids, sorter=order)
        col = tbl[field].combine_chunks().take(
            pa.array(order[pos], pa.int64()))
        if pa.types.is_temporal(col.type):
            # dates/timestamps factor by their epoch integer (Lucene
            # LongField doc-values semantics)
            col = col.cast(pa.int64())
        if decay_fn is not None:
            # nulls decay to 1.0 (documented ES behavior), applied AFTER the
            # kernel so `missing` never shifts a real value's distance
            raw = pc.cast(col, pa.float64())
            isnull = np.asarray(pc.is_null(raw).to_numpy(
                zero_copy_only=False))
            vals = raw.fill_null(d_origin).to_numpy(zero_copy_only=False)
            d = np.maximum(0.0, np.abs(vals - d_origin) - d_offset)
            r = d / d_scale
            if decay_fn == "gauss":
                boost = np.exp(np.log(d_decay) * (r * r))
            elif decay_fn == "exp":
                boost = np.exp(np.log(d_decay) * r)
            else:
                boost = np.maximum(0.0, 1.0 - (1.0 - d_decay) * r)
            boost[isnull] = 1.0
        elif rnd is not None:
            from byzer_retrieval_ray.functions.polyhash import (fmix32_np,
                                                                poly_hash_np)
            seed = str(rnd["seed"])
            svals = pc.fill_null(pc.cast(col, pa.string()), "").to_pylist()
            h = fmix32_np(poly_hash_np([f"{seed}:{v}" for v in svals],
                                       bits=32))
            boost = h.astype(np.float64) / 4294967296.0
        else:
            vals = pc.cast(col, pa.float64()).fill_null(missing) \
                .to_numpy(zero_copy_only=False)
            boost = mods[modifier](factor * vals)
        if mode == "replace":
            new = boost.astype(np.float64)
        elif mode == "multiply":
            new = scores.astype(np.float64) * boost
        else:
            new = scores.astype(np.float64) + boost
        top = np.lexsort((ids, -new))[: q.limit]
        return ids[top], new[top].astype(dtype)

    def boosting_keyword(self, q: SearchQuery, negative_keyword: str,
                         negative_boost: float,
                         precision: str = "float32"):
        """Per-bucket elasticsearch ``boosting`` query (Lucene's
        FunctionScoreQuery#boostByQuery demotion shape): every positive hit
        whose doc ALSO matches ``negative_keyword`` is demoted to
        score × negative_boost (0 ≤ β ≤ 1); other hits keep their score.
        The negative recall reuses the FULL query machinery (terms,
        phrases, prefix/fuzzy/wildcard/regexp, groups, msm) over the same
        searched fields, matching only — its scores are ignored and it
        never narrows the match set (demotion ≠ exclusion). Demotion is
        non-monotone in the BM25 order, so the bucket demotes its ENTIRE
        match set (exact TAAT), re-sorts by (new score desc, doc_id asc)
        and ships only its top ``q.limit`` — the scatter-gather top-k
        argument applies to the demoted order, so the master merge stays
        exact. Arithmetic: float64 score × β, cast to the query
        precision."""
        from dataclasses import replace

        dtype = np.float32 if precision == "float32" else np.float64
        beta = float(negative_boost)
        if not 0.0 <= beta <= 1.0:
            raise ValueError(
                f"negative_boost must be in [0, 1], got {beta}")
        ids, scores = self._matchset(q, precision)
        ids, scores = np.asarray(ids), np.asarray(scores)
        if ids.size == 0:
            return ids, scores.astype(dtype)
        nq = replace(q, keyword=negative_keyword, filters={},
                     limit=int(1 << 62), search_after=None,
                     min_should_match=0)
        nids, _ = self.search_keyword(nq, precision=precision,
                                      algorithm="taat")
        new = scores.astype(np.float64)
        nids = np.asarray(nids)
        if nids.size:
            hit = np.isin(ids, nids)
            new[hit] = new[hit] * beta
        top = np.lexsort((ids, -new))[: q.limit]
        return ids[top], new[top].astype(dtype)

    def sigterms_keyword(self, q: SearchQuery, field: str,
                         precision: str = "float32",
                         shard_min_doc_count: int = 0) -> tuple[pa.Table, int]:
        return self._memo_partial(
            "sigterms", q, (field, precision, int(shard_min_doc_count)),
            lambda: self._sigterms_keyword_impl(q, field, precision,
                                                shard_min_doc_count))

    def _sigterms_keyword_impl(self, q: SearchQuery, field: str,
                               precision: str = "float32",
                               shard_min_doc_count: int = 0) \
            -> tuple[pa.Table, int]:
        """Per-bucket PARTIAL foreground term counts for significant-terms
        aggregation (the elasticsearch ``significant_terms`` shape): for
        every term of ``field`` appearing in the ENTIRE match set, the
        number of matching docs containing it — plus the bucket's match
        count. Exact TAAT, one column-pruned docstore read, whitespace
        analysis identical to indexing (``term_frequencies``); the bucket
        ships only (term, fg) distinct-vocabulary partials — match ids
        never leave the shard, and the driver folds |fg vocabulary| rows.
        No shard-level truncation (elasticsearch's ``shard_size`` cut is a
        recall trade this engine doesn't need to make — partials are counts,
        not docs), so the fold is exact."""
        from dataclasses import replace

        from byzer_retrieval_ray.functions.tokenize import term_frequencies

        empty = pa.table({"term": pa.array([], pa.string()),
                          "fg": pa.array([], pa.int64())})
        ids, _ = self._matchset(q, precision)
        ids = np.asarray(ids)
        if ids.size == 0:
            return empty, 0
        if field not in {f.name for f in self.gen.schema.fields}:
            raise ValueError(
                f"significant-terms field {field!r} is not in the schema")
        tbl = self.fetch_analyzed(ids, field)
        if len(tbl) == 0:
            return empty, int(ids.size)
        texts = pc.cast(tbl[field].combine_chunks(), pa.string())
        tf_rows = term_frequencies(texts, tbl["doc_id"].to_numpy())
        fg = tf_rows.group_by("term").aggregate([("doc_id", "count")])
        out = pa.table({"term": pc.cast(fg["term"], pa.string()),
                        "fg": pc.cast(fg["doc_id_count"], pa.int64())})
        if shard_min_doc_count > 0:
            # elasticsearch's shard_min_doc_count: drop shard-rare terms
            # BEFORE shipping — a memory/recall trade for broad queries at
            # scale (a term below the cut in EVERY bucket can't reach the
            # global min_doc_count anyway unless split across buckets;
            # default 0 keeps the fold exact)
            out = out.filter(pc.greater_equal(out["fg"],
                                              int(shard_min_doc_count)))
        return out, int(ids.size)

    def sigterms_top_keyword(self, q: SearchQuery, field: str,
                             shard_size: int,
                             precision: str = "float32") \
            -> tuple[pa.Table, int]:
        """Per-bucket BOUNDED significant-terms partial — phase 1 of the
        exact threshold fold (see ``facet_top_keyword``): the bucket's top
        ``shard_size`` (term, fg) rows by (fg desc, term asc), sorted so
        the master reads the truncation threshold off the last row, plus
        the bucket's match count. Ships ≤ shard_size rows instead of the
        full foreground vocabulary."""
        t, n = self.sigterms_keyword(q, field, precision)
        t = t.sort_by([("fg", "descending"), ("term", "ascending")])
        return t.slice(0, int(shard_size)), n

    def sigterms_probe_keyword(self, q: SearchQuery, field: str,
                               terms: list,
                               precision: str = "float32") \
            -> tuple[pa.Table, int]:
        """Per-bucket EXACT foreground counts for the requested candidate
        terms over the ENTIRE match set — phase 2 of the threshold
        significant-terms fold. Ships ≤ len(terms) rows; the bucket's own
        foreground vocabulary never leaves the shard."""
        t, n = self.sigterms_keyword(q, field, precision)
        if len(t) == 0 or not terms:
            return t.slice(0, 0), n
        ts = pa.array([str(x) for x in terms], pa.string())
        return t.filter(pc.is_in(t["term"], value_set=ts)), n

    def cardinality_keyword(self, q: SearchQuery, field: str, p: int = 12,
                            precision: str = "float32") -> np.ndarray:
        """Per-bucket HyperLogLog register partial for approximate distinct
        values of a stored field over the ENTIRE keyword match set (the
        elasticsearch ``cardinality`` aggregation shape). Exact TAAT match
        set + ONE column-pruned stored read; the bucket ships a single
        2^p-long register vector (8·2^p bytes, key strings never leave the
        shard) that the master max-folds — the same zero-shuffle sketch
        family as ``ops/hll.py``, whose deterministic fmix32∘Horner31 hash
        and integer register sum keep the estimate SQL-replicable. Nulls
        don't count (COUNT(DISTINCT col) semantics)."""
        from dataclasses import replace

        from byzer_retrieval_ray.ops.hll import _registers

        m = 1 << p
        ids, _ = self._matchset(q, precision)
        ids = np.asarray(ids)
        if ids.size == 0:
            return np.zeros(m, dtype=np.int64)
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            raise ValueError(
                f"cardinality field {field!r} is not a stored column")
        keys = tbl[field].combine_chunks()
        if pa.types.is_list(keys.type) or pa.types.is_large_list(keys.type):
            # multi-valued (array) field: distinct count over the elements
            keys = keys.flatten()
        keys = keys.drop_null()
        if len(keys) == 0:
            return np.zeros(m, dtype=np.int64)
        return _registers(pc.cast(keys, pa.string()).to_pylist(), p)

    def count_keyword(self, q: SearchQuery,
                      precision: str = "float32") -> int:
        """Per-bucket total-hits count for a keyword query (the Lucene
        ``TotalHitCountCollector`` shape): exact TAAT match-set size with an
        unbounded limit — the bucket ships ONE integer, match ids never
        leave the shard. Filter-only zero-score hits count (BooleanQuery
        FILTER semantics), exactly as they appear in search results."""
        from dataclasses import replace

        ids, _ = self._matchset(q, precision)
        return int(ids.size)

    def stats_keyword(self, q: SearchQuery, field: str,
                      precision: str = "float32") -> dict:
        """Per-bucket PARTIAL numeric stats (count / min / max / sum) of a
        stored field over the ENTIRE keyword match set (the Lucene
        StatsResults / elasticsearch stats-aggregation shape). Same scale
        shape as facet_keyword: exact TAAT with an unbounded limit, ONE
        narrow column-pruned docstore read, and the bucket ships a single
        4-value partial — match ids never leave the shard. Nulls don't
        count (SQL COUNT(col) semantics); integer sums stay integers (the
        Arrow sum kernel widens to int64), so the driver fold is exact."""
        from dataclasses import replace

        empty = {"cnt": 0, "min": None, "max": None, "sum": None,
                 "sumsq": 0.0}
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return empty
        col = tbl[field]
        if pa.types.is_timestamp(col.type):
            # timestamps aggregate as epoch microseconds (the elasticsearch
            # stats-on-date convention; same domain as histogram_keyword)
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        cnt = len(col) - col.null_count
        if cnt == 0:
            return empty
        mm = pc.min_max(col)
        # extended_stats partial: Σv² in float64 (the documented ES
        # extended_stats arithmetic — naive sum-of-squares, not Welford);
        # Arrow's float64 sum kernel matches SQL SUM(v*v) to within the
        # gate's ROUND(.,4)
        fv = pc.cast(col, pa.float64())
        sumsq = pc.sum(pc.multiply(fv, fv)).as_py() or 0.0
        return {"cnt": int(cnt), "min": mm["min"].as_py(),
                "max": mm["max"].as_py(), "sum": pc.sum(col).as_py(),
                "sumsq": float(sumsq)}

    def range_facets_keyword(self, q: SearchQuery, field: str,
                             edges: list, precision: str = "float32") -> np.ndarray:
        """Per-bucket PARTIAL histogram of ``field`` over the ENTIRE keyword
        match set: counts per half-open bin [edges[i], edges[i+1]) — the
        Lucene LongRangeFacetCounts shape. Same scale discipline as
        facet/stats: exact unbounded TAAT, one narrow docstore read, and the
        bucket ships len(edges)-1 int64 counts. Nulls and values outside
        [edges[0], edges[-1]) don't count."""
        from dataclasses import replace

        nbins = len(edges) - 1
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return np.zeros(nbins, np.int64)
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return np.zeros(nbins, np.int64)
        col = tbl[field].combine_chunks()
        vals = col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        e = np.asarray(edges, np.float64)
        binned = np.searchsorted(e, vals, side="right") - 1
        ok = (binned >= 0) & (binned < nbins) & (vals < e[-1])
        return np.bincount(binned[ok], minlength=nbins).astype(np.int64)

    def phrase_pair_counts(self, pairs: list, field: str) -> np.ndarray:
        """Per-bucket corpus counts of exact adjacent occurrences for each
        ``(a, b)`` term pair in ``field`` — the bigram statistics a phrase
        suggester's language model needs, served straight from positional
        postings (the same ExactPhraseMatcher adjacency `_phrase_posting`
        uses for phrase queries; no corpus scan). Occurrences in tombstoned
        docs don't count; the master sums counts across buckets and
        generations. Ships ONE int64 per pair."""
        terms = sorted({t for p in pairs for t in p})
        posts = self.fetch_postings([(field, t) for t in terms])
        out = np.zeros(len(pairs), np.int64)
        ts = self._ts_in_bucket
        for i, (a, b) in enumerate(pairs):
            pp = self._phrase_posting(field, (str(a), str(b)), posts)
            if pp is None:
                continue
            freqs = pp.tfs
            if ts.size:
                freqs = freqs[~np.isin(pp.docs, ts)]
            out[i] = int(freqs.sum())
        return out

    def histogram_keyword(self, q: SearchQuery, field: str, interval: int,
                          offset: int = 0,
                          precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL fixed-interval histogram of a stored
        timestamp/integer field over the ENTIRE keyword match set (the
        elasticsearch ``date_histogram`` fixed_interval / ``histogram``
        shape). Bucket key = floor((v - offset) / interval) · interval +
        offset in the column's integer domain (timestamps are bucketed as
        epoch microseconds — the Arrow storage value of timestamp[us]);
        floor division, so pre-epoch values land in the right bucket. Same
        scale discipline as facet/stats/range_facets: exact unbounded TAAT,
        ONE narrow column-pruned docstore read, and the bucket ships only
        (bucket, cnt) pairs — at most |distinct buckets| rows, independent
        of match count. Nulls don't count."""
        from dataclasses import replace

        empty = pa.table({"bucket": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return empty
        col = tbl[field].combine_chunks().drop_null()
        if len(col) == 0:
            return empty
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        elif not (pa.types.is_integer(col.type)):
            raise ValueError(
                f"histogram field {field!r} must be a timestamp or integer "
                f"stored column, got {col.type}")
        vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
        step = np.int64(interval)
        keys = (vals - np.int64(offset)) // step * step + np.int64(offset)
        uniq, cnts = np.unique(keys, return_counts=True)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64), pa.int64())})

    def terms_metric_keyword(self, q: SearchQuery, key_field: str,
                             metric_field: str,
                             precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL terms aggregation with a numeric metric
        sub-aggregation (the elasticsearch ``terms`` bucket + ``avg``/
        ``sum`` sub-agg shape): per distinct value of ``key_field`` over
        the ENTIRE keyword match set, (doc count, non-null metric count,
        metric sum). Exact unbounded TAAT + ONE two-column docstore read;
        the bucket ships |distinct keys| (key, cnt, mcnt, msum) rows —
        match ids never leave the shard; the master fold is keys-sized.
        Metric sums accumulate in float64 (exact for integer columns while
        |sum| < 2^53 — every intermediate integer addition below that bound
        is representable, so the fold is order-independent and matches the
        SQL oracle's CAST(SUM(..) AS DOUBLE)). Docs with a null key
        don't count (elasticsearch terms-agg missing-value semantics, same
        as facet_keyword); null metric values count the doc but not the
        metric (SQL COUNT(col)/SUM(col) semantics)."""
        from dataclasses import replace

        empty = pa.table({"key": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "mcnt": pa.array([], pa.int64()),
                          "msum": pa.array([], pa.float64())})
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[key_field, metric_field])
        if key_field not in tbl.column_names:
            return empty
        if metric_field not in tbl.column_names:
            raise ValueError(
                f"metric field {metric_field!r} is not a stored column")
        raw_keys = tbl[key_field].combine_chunks()
        if pa.types.is_list(raw_keys.type) or pa.types.is_large_list(raw_keys.type):
            raise ValueError(
                f"terms_stats key {key_field!r} is list-typed — use "
                "facet_counts for multi-valued fields")
        keys = pc.cast(raw_keys, pa.string())
        metric = tbl[metric_field].combine_chunks()
        if pa.types.is_timestamp(metric.type):
            # timestamps aggregate as epoch microseconds (the elasticsearch
            # avg-on-date convention; same domain as histogram_keyword)
            metric = pc.cast(pc.cast(metric, pa.timestamp("us")), pa.int64())
        grp = pa.table({
            "key": keys,
            "metric": pc.cast(metric, pa.float64()),
        }).filter(pc.is_valid(keys))
        if len(grp) == 0:
            return empty
        agg = grp.group_by("key").aggregate([
            ("key", "count"), ("metric", "count"), ("metric", "sum")])
        return pa.table({
            "key": agg["key"],
            "cnt": pc.cast(agg["key_count"], pa.int64()),
            "mcnt": pc.cast(agg["metric_count"], pa.int64()),
            "msum": pc.fill_null(pc.cast(agg["metric_sum"], pa.float64()),
                                 0.0),
        })

    def bucket_metrics_keyword(self, q: SearchQuery, key_spec: dict,
                               keys: list, fields: list,
                               precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL metric moments for the REQUESTED bucket keys
        — phase 2 of the composable sub-aggregation pass (elasticsearch
        bucket-agg × metric-sub-agg composition; the bucket keys were
        selected in phase 1 by the bounded facet/composite/histogram
        fold). ``key_spec`` names the bucketing:

            {"kind": "terms", "field": f}                   — string keys
            {"kind": "histogram", "field": f,
             "interval": i, "offset": o}                    — int64 bin keys

        For every (requested key × metric field) with at least one
        non-null metric value this bucket ships ONE
        (key, field, mcnt, msum, mmin, mmax, msumsq) row — ≤ |keys|·|fields|
        rows regardless of match count or key cardinality; unrequested
        keys never leave the shard. Sums/moments accumulate in float64
        (exact for integer columns while |Σ| < 2^53 — the terms_stats
        convention); timestamps aggregate as epoch microseconds. Docs with
        a null key belong to no bucket; null metric values don't count
        (SQL COUNT(col) semantics)."""
        from dataclasses import replace

        empty = pa.table({"key": pa.array([], pa.string()),
                          "field": pa.array([], pa.string()),
                          "mcnt": pa.array([], pa.int64()),
                          "msum": pa.array([], pa.float64()),
                          "mmin": pa.array([], pa.float64()),
                          "mmax": pa.array([], pa.float64()),
                          "msumsq": pa.array([], pa.float64())})
        if not keys or not fields:
            return empty
        kind = key_spec["kind"]
        key_field = key_spec["field"]
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        cols = sorted({key_field, *fields})
        tbl = self.fetch_docs(ids, columns=cols)
        if key_field not in tbl.column_names:
            return empty
        raw_keys = tbl[key_field].combine_chunks()
        if pa.types.is_list(raw_keys.type) or \
                pa.types.is_large_list(raw_keys.type):
            raise ValueError(
                f"bucket key {key_field!r} is list-typed — a doc can only "
                "belong to one bucket")
        if kind == "histogram":
            kcol = raw_keys
            if pa.types.is_timestamp(kcol.type):
                kcol = pc.cast(pc.cast(kcol, pa.timestamp("us")), pa.int64())
            elif not pa.types.is_integer(kcol.type):
                raise ValueError(
                    f"histogram key {key_field!r} must be a timestamp or "
                    f"integer stored column, got {kcol.type}")
            valid = pc.is_valid(kcol)
            vals = pc.fill_null(pc.cast(kcol, pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            step = np.int64(int(key_spec["interval"]))
            off = np.int64(int(key_spec.get("offset", 0)))
            bins = (vals - off) // step * step + off
            kstr = pa.array([str(b) for b in bins], pa.string())
        else:
            kstr = pc.cast(raw_keys, pa.string())
            valid = pc.is_valid(kstr)
        want = pa.array([str(k) for k in keys], pa.string())
        sel = pc.and_(valid, pc.is_in(kstr, value_set=want))
        if not pc.any(sel).as_py():
            return empty
        parts = []
        kept_keys = kstr.filter(sel)
        for f in fields:
            if f not in tbl.column_names:
                raise ValueError(f"metric field {f!r} is not a stored column")
            m = tbl[f].combine_chunks()
            if pa.types.is_timestamp(m.type):
                m = pc.cast(pc.cast(m, pa.timestamp("us")), pa.int64())
            m = pc.cast(m, pa.float64()).filter(sel)
            grp = pa.table({"key": kept_keys, "v": m,
                            "v2": pc.multiply(m, m)}) \
                .filter(pc.is_valid(m))
            if len(grp) == 0:
                continue
            agg = grp.group_by("key").aggregate([
                ("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max"),
                ("v2", "sum")])
            parts.append(pa.table({
                "key": agg["key"],
                "field": pa.array([f] * len(agg), pa.string()),
                "mcnt": pc.cast(agg["v_count"], pa.int64()),
                "msum": pc.cast(agg["v_sum"], pa.float64()),
                "mmin": pc.cast(agg["v_min"], pa.float64()),
                "mmax": pc.cast(agg["v_max"], pa.float64()),
                "msumsq": pc.cast(agg["v2_sum"], pa.float64())}))
        return pa.concat_tables(parts) if parts else empty

    def _matchset_values(self, q: SearchQuery, field: str,
                         precision: str) -> np.ndarray:
        """float64 values of ``field`` over the ENTIRE keyword match set
        (nulls dropped; timestamps as epoch microseconds) — the shared
        read for the percentile probes."""
        from dataclasses import replace

        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return np.empty(0, np.float64)
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return np.empty(0, np.float64)
        col = tbl[field].combine_chunks().drop_null()
        if len(col) == 0:
            return np.empty(0, np.float64)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return v[~np.isnan(v)]

    def histogram_hll_keyword(self, q: SearchQuery, time_field: str,
                              interval: int, offset: int, value_field: str,
                              p: int, precision: str = "float32") -> list:
        """Per-bucket PARTIAL (bin, HLL registers) pairs — the distributed
        leg of ``cumulative_cardinality`` (the elasticsearch pipeline over
        a date_histogram parent, served in ONE pass): per time bin, the
        2^p register vector of the bin's non-null ``value_field`` strings
        (the ops/hll deterministic SQL-replicable sketch). Ships
        |bins| × 2^p small ints — values never leave the shard; the
        master max-folds per bin, prefix-max-folds ascending bins, and
        reads the estimator per prefix. Nulls in either column drop."""
        from byzer_retrieval_ray.ops.hll import _registers

        ids, _ = self._matchset(q, precision)
        if np.asarray(ids).size == 0:
            return []
        cols = sorted({time_field, value_field})
        tbl = self.fetch_docs(np.asarray(ids), columns=cols)
        if time_field not in tbl.column_names or \
                value_field not in tbl.column_names:
            return []
        tcol = tbl[time_field].combine_chunks()
        if pa.types.is_timestamp(tcol.type):
            tcol = pc.cast(pc.cast(tcol, pa.timestamp("us")), pa.int64())
        elif not pa.types.is_integer(tcol.type):
            raise ValueError(
                f"histogram field {time_field!r} must be a timestamp or "
                f"integer stored column, got {tcol.type}")
        vcol = pc.cast(tbl[value_field].combine_chunks(), pa.string())
        ok = pc.and_(pc.is_valid(tcol), pc.is_valid(vcol))
        if not pc.any(ok).as_py():
            return []
        tv = pc.fill_null(pc.cast(tcol, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        okm = ok.to_numpy(zero_copy_only=False)
        step = np.int64(int(interval))
        off = np.int64(int(offset))
        bins = (tv - off) // step * step + off
        vals = vcol.to_pylist()
        out = []
        for b in np.unique(bins[okm]):
            sel = okm & (bins == b)
            keys = [vals[i] for i in np.flatnonzero(sel)]
            out.append((int(b), _registers(keys, int(p))))
        return out

    def rank_counts_keyword(self, q: SearchQuery, field: str, xs: list,
                            precision: str = "float32") \
            -> tuple[np.ndarray, int]:
        """Per-bucket PARTIAL for the ``percentile_ranks`` aggregation
        (elasticsearch shape, EXACT instead of t-digest): for each probe
        value x, how many match-set values of ``field`` are ≤ x, plus the
        bucket's non-null value count. ONE exact TAAT + ONE narrow
        docstore read serves every probe; the bucket ships len(xs)+1
        integers — values never leave the shard. Timestamps compare as
        epoch microseconds; float64 comparisons (ints above 2^53 lose
        ulps, same caveat as percentiles)."""
        vals = self._matchset_values(q, field, precision)
        probes = np.asarray([float(x) for x in xs], np.float64)
        counts = np.array([int(np.count_nonzero(vals <= x))
                           for x in probes], np.int64)
        return counts, int(vals.size)

    def whisker_keyword(self, q: SearchQuery, field: str, fence: float,
                        low: bool, precision: str = "float32") \
            -> float | None:
        """Per-bucket PARTIAL for the boxplot whisker clamp: the smallest
        match-set value ≥ ``fence`` (low) / largest ≤ ``fence`` (high), or
        None when no value qualifies in this bucket. One float ships."""
        vals = self._matchset_values(q, field, precision)
        if low:
            v = vals[vals >= fence]
            return float(v.min()) if v.size else None
        v = vals[vals <= fence]
        return float(v.max()) if v.size else None

    def missing_count_keyword(self, q: SearchQuery, field: str,
                              precision: str = "float32") -> tuple[int, int]:
        """Per-bucket PARTIAL for the ``missing`` aggregation
        (elasticsearch shape): (docs with a null/absent ``field``, match
        count) over the ENTIRE match set — any field type; a list-typed
        field counts as missing when the list itself is null (empty lists
        are present, matching ES exists semantics). Two integers ship."""
        ids, _ = self._matchset(q, precision)
        ids = np.asarray(ids)
        if ids.size == 0:
            return 0, 0
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return int(ids.size), int(ids.size)
        return int(tbl[field].null_count), int(ids.size)

    def range_counts_keyword(self, q: SearchQuery, field: str,
                             brackets: list,
                             precision: str = "float32",
                             center: float | None = None) -> list:
        """Per-bucket PARTIAL histograms for the distributed-selection
        rounds of ``percentiles`` (ops/quantiles semantics: per bracket
        (lo, hi, edges), values filtered to [lo, hi]; bucket i is
        (edges[i-1], edges[i]], bucket 0 is [lo, edges[0]] — searchsorted
        side='left'). ONE exact TAAT + ONE narrow docstore read serves
        EVERY bracket in the round; the bucket ships len(edges)+1 int64
        counts per bracket, values never leave the shard. With ``center``
        set the selection domain is |v − center| (the
        median_absolute_deviation transform — float64, exact for the
        integer fields the docstore carries)."""
        vals = self._matchset_values(q, field, precision)
        if center is not None:
            vals = np.abs(vals - float(center))
        out = []
        for lo, hi, edges in brackets:
            e = np.asarray(edges, np.float64)
            v = vals[(vals >= lo) & (vals <= hi)]
            out.append(np.bincount(np.searchsorted(e, v, side="left"),
                                   minlength=e.size + 1).astype(np.int64))
        return out

    def range_values_keyword(self, q: SearchQuery, field: str,
                             ranges: list, cap: int,
                             precision: str = "float32",
                             center: float | None = None) -> list:
        """The final value pull of the percentile selection: per (lo, hi)
        range, the match-set values inside [lo, hi]. The narrowing rounds
        guarantee each surviving bracket holds ≤ collect_limit values
        GLOBALLY; ``cap`` enforces that bound per bucket (a violation is a
        driver bug, not data skew). ``center`` selects the |v − center|
        domain (see range_counts_keyword)."""
        vals = self._matchset_values(q, field, precision)
        if center is not None:
            vals = np.abs(vals - float(center))
        out = []
        for lo, hi in ranges:
            v = vals[(vals >= lo) & (vals <= hi)]
            if v.size > cap:
                raise RuntimeError(
                    f"percentile bracket [{lo}, {hi}] holds {v.size} values "
                    f"in one bucket — exceeds the narrowing bound {cap}")
            out.append(v)
        return out

    def sort_keyword(self, q: SearchQuery, field: str, ascending: bool,
                     precision: str = "float32") -> pa.Table:
        """Per-bucket PARTIAL top-limit of the keyword match set ordered by a
        stored field (the Lucene ``Sort(SortField)`` shape — sorted collection
        skips scoring, ``needsScores=false``). Exact unbounded TAAT for the
        match set, ONE narrow docstore read, then a vectorized partial top-k
        by (value, doc_id): the bucket ships at most ``limit`` (doc_id, value)
        rows — never the match set. Docs with a null sort value are excluded
        (documented divergence: Lucene sorts missing values last)."""
        from dataclasses import replace

        limit = q.limit
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "value": pa.array([], pa.float64())})
        ids, _ = self._matchset(q, precision)
        if ids.size == 0:
            return empty
        tbl = self.fetch_docs(ids, columns=[field])
        if field not in tbl.column_names:
            return empty
        col = tbl[field].combine_chunks()
        valid = pc.is_valid(col)
        tbl = tbl.filter(valid)
        if len(tbl) == 0:
            return empty
        vals = tbl[field].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dids = tbl["doc_id"].to_numpy()
        order = np.lexsort((dids, vals if ascending else -vals))[:limit]
        return pa.table({"doc_id": pa.array(dids[order], pa.int64()),
                         "value": pa.array(vals[order], pa.float64())})

    def fetch_analyzed(self, doc_ids: np.ndarray, field: str) -> pa.Table:
        """(doc_id, field) rows for the given ids where ``field`` is an
        ANALYZED column — excluded from search results (Lucene TextField
        parity: indexed, not stored) but retained in the docstore parquet
        (posting re-emission reads it), which makes snippet/highlight
        generation free where Lucene would require stored=true. Same
        predicate-pushdown read discipline as fetch_docs."""
        paths = self.gen.docstore_paths(self.bucket)
        if not paths:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             field: pa.array([], pa.string())})
        ids_arr = np.asarray(doc_ids)
        if self._ts_in_bucket.size and ids_arr.size:
            ids_arr = ids_arr[~np.isin(ids_arr, self._ts_in_bucket)]
        ids = [int(d) for d in ids_arr]
        return pa.concat_tables([
            pq.read_table(p, columns=["doc_id", field],
                          filters=[("doc_id", "in", ids)])
            for p in paths])

    def fetch_docs(self, doc_ids: np.ndarray,
                   columns: list | None = None) -> pa.Table:
        """Stored fields for the given ids — a direct predicate-pushdown parquet read
        (row-group pruned on the sorted doc_id column), deliberately NOT cached:
        stored fields can carry wide payloads (html) that must not live in the
        serving actor's heap. ``columns`` prunes to the named stored fields
        (facet counting reads one narrow column, never the whole row)."""
        cols = [c for c in self._stored_columns() if c in _available_columns(self)]
        if columns is not None:
            cols = [c for c in cols if c in columns]
        if "doc_id" not in cols:
            cols = ["doc_id"] + cols
        paths = self.gen.docstore_paths(self.bucket)
        if not paths:
            return pa.table({c: [] for c in cols})
        ids_arr = np.asarray(doc_ids)
        if self._ts_in_bucket.size and ids_arr.size:
            # a replaced key's OLD copy must not shadow the live delta doc when a
            # cross-generation fetch asks every searcher for the same id set
            ids_arr = ids_arr[~np.isin(ids_arr, self._ts_in_bucket)]
        ids = [int(d) for d in ids_arr]
        return pa.concat_tables([
            pq.read_table(p, columns=cols, filters=[("doc_id", "in", ids)])
            for p in paths])


def _filter_fields(tree: dict) -> set[str]:
    out: set[str] = set()

    def go(node):
        if "field" in node:
            out.add(node["field"])
        for k in ("and", "or"):
            for c in node.get(k, []):
                go(c)
        if "not" in node:
            go(node["not"])

    if tree:
        go(tree)
    return out


def _available_columns(searcher: BucketSearcher) -> set[str]:
    paths = searcher.gen.docstore_paths(searcher.bucket)
    if not paths:
        return set()
    if not hasattr(searcher, "_avail_cols"):
        searcher._avail_cols = set(pq.ParquetFile(paths[0]).schema_arrow.names)
    return searcher._avail_cols
