"""Index-segment serving actors (ST1/ST2 equivalents).

A long-lived Ray actor owns one or MORE serving buckets (each a BucketSearcher
with its lazily-loaded decoded-posting cache) — the stateful stage of query
serving. Queries are RPC-shaped, so this is plain ``@ray.remote`` (SURVEY.md
§7.3: don't force queries through Dataset). Storage partitioning (bucket count,
chosen at build time for build-side balance) is therefore DECOUPLED from the
serving pool size, which is sized to the node's cores: at 10^12 docs a table may
have thousands of buckets served by a few hundred actors.

Per-bucket results are returned UNMERGED (a list of per-bucket (ids, scores)
tuples) so the master's merge sees exactly the same per-shard top-limit lists as
with one actor per bucket — rank semantics (RRF per-bucket ranks) are unchanged
by the actor grouping.

``reload`` re-reads the manifest so a newly committed generation becomes visible
without restarting actors — the generation-reload equivalent of the reference's
NRT reopen thread (RetrievalWorker.java:84-89).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.index.searcher import BucketSearcher
from byzer_retrieval_ray.table.query import SearchQuery


def gen_bucket_pairs(manifest_data: dict) -> list[tuple[int, int]]:
    """(generation, bucket) serving pairs over every active generation — the
    deterministic pair universe actors partition among themselves."""
    from byzer_retrieval_ray.index.searcher import GenerationReader
    gens = manifest_data.get("active_generations") or (
        [manifest_data["generation"]] if manifest_data.get("generation") else [])
    pairs: list[tuple[int, int]] = []
    for g in gens:
        gr = GenerationReader(manifest_data, int(g))
        pairs.extend((int(g), b) for b in gr.buckets())
    return pairs


class SegmentActorImpl:
    def __init__(self, manifest_data: dict, buckets: list,
                 location: str | None = None, poll_sec: float = 0.0,
                 assignment: tuple[int, int] | None = None):
        # buckets: list of (generation, bucket) pairs, or bare bucket ints
        # (current generation) — an actor may serve slices of several
        # generations (base + deltas)
        self.buckets = [b if isinstance(b, (tuple, list)) else (None, b)
                        for b in buckets]
        # (pool index, pool size): lets reload() re-derive this actor's share of
        # the (gen, bucket) pair universe from a freshly polled manifest — a
        # DELTA generation published by another process then becomes visible
        # (pairs split pairs[i::n], exactly activate()'s grouping)
        self.assignment = tuple(assignment) if assignment else None
        self.database = manifest_data.get("database")
        self.table = manifest_data.get("table")
        self.location = location
        self.searchers = [BucketSearcher(manifest_data, b, gen=g)
                          for g, b in self.buckets]
        self._fp = self._fingerprint(manifest_data)
        if location and poll_sec > 0:
            # ST2 parity: the reference reopens searchers every 1 s
            # (ControlledRealTimeReopenThread, RetrievalWorker.java:84-89). Here a
            # daemon thread re-reads the manifest so a generation published or a
            # tombstone written by ANOTHER process becomes visible without an
            # explicit reload. (A change to the bucket SET itself still needs the
            # owner to respawn the pool via activate()/_invalidate.)
            import threading

            def poll():
                from byzer_retrieval_ray.index.manifest import Manifest
                while not self._stop.wait(poll_sec):
                    try:
                        m = Manifest(self.location, self.database, self.table)
                        fp = self._fingerprint(m.data)
                        if fp != self._fp:
                            self.reload(m.data)
                    except Exception:
                        pass   # transient read race with an in-flight publish

            self._stop = threading.Event()
            threading.Thread(target=poll, daemon=True).start()

    @staticmethod
    def _fingerprint(manifest_data: dict):
        return (manifest_data.get("generation"),
                tuple(manifest_data.get("active_generations") or []),
                tuple(manifest_data.get("tombstone_files") or []))

    def reload(self, manifest_data: dict) -> bool:
        # Atomic searcher-list replacement; in-flight queries keep the old
        # snapshot. With a pool assignment, re-derive this actor's pairs from
        # the NEW manifest (pairs[i::n]) so generations published by another
        # process — including append-mode deltas — become visible; without one
        # (legacy/direct construction) keep the original pairs that still exist.
        if self.assignment is not None:
            i, n = self.assignment
            self.buckets = [tuple(p) for p in gen_bucket_pairs(manifest_data)[i::n]]
            searchers = [BucketSearcher(manifest_data, b, gen=g)
                         for g, b in self.buckets]
        else:
            gens = set(manifest_data.get("active_generations")
                       or [manifest_data.get("generation")])
            searchers = []
            for g, b in self.buckets:
                if g is None or g in gens:
                    searchers.append(BucketSearcher(manifest_data, b, gen=g))
        self.searchers = searchers
        self._fp = self._fingerprint(manifest_data)
        return True

    def preload(self) -> int:
        return sum(s.preload() for s in self.searchers)

    def search_keyword(self, q: dict, precision: str, algorithm: str,
                       with_docs: bool = False, fuzzy_transpositions: bool = True):
        query = SearchQuery.from_dict(q)
        out = []
        for s in self.searchers:
            ids, scores = s.search_keyword(query, precision=precision,
                                           algorithm=algorithm,
                                           fuzzy_transpositions=fuzzy_transpositions)
            if with_docs:
                # ship the stored fields of this shard's top-limit with the scores —
                # one round trip, like the reference workers (RetrievalWorker.java:372-376)
                out.append((np.asarray(ids), np.asarray(scores), s.fetch_docs(ids)))
            else:
                out.append((np.asarray(ids), np.asarray(scores)))
        return out

    def search_vector(self, q: dict, precision: str, with_docs: bool = False,
                      algorithm: str = "brute", nprobe: int = 4,
                      n_centroids: int = 16, ef: int = 100):
        query = SearchQuery.from_dict(q)
        out = []
        for s in self.searchers:
            ids, scores = s.search_vector(query, precision=precision,
                                          algorithm=algorithm, nprobe=nprobe,
                                          n_centroids=n_centroids, ef=ef)
            if with_docs:
                out.append((np.asarray(ids), np.asarray(scores), s.fetch_docs(ids)))
            else:
                out.append((np.asarray(ids), np.asarray(scores)))
        return out

    def facet_keyword(self, q: dict, facet_field: str,
                      precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.facet_keyword(query, facet_field, precision)
                for s in self.searchers]

    def facet_top_keyword(self, q: dict, facet_field: str, shard_size: int,
                          precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.facet_top_keyword(query, facet_field, shard_size,
                                    precision)
                for s in self.searchers]

    def facet_probe_keyword(self, q: dict, facet_field: str, values: list,
                            precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.facet_probe_keyword(query, facet_field, values, precision)
                for s in self.searchers]

    def rare_partial_keyword(self, q: dict, facet_field: str,
                             max_doc_count: int,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.rare_partial_keyword(query, facet_field, max_doc_count,
                                       precision)
                for s in self.searchers]

    def collapse_keyword(self, q: dict, collapse_field: str,
                         precision: str = "float32",
                         group_size: int = 1) -> list:
        query = SearchQuery.from_dict(q)
        return [s.collapse_keyword(query, collapse_field, precision,
                                   group_size)
                for s in self.searchers]

    def function_score_keyword(self, q: dict, spec: dict,
                               precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        out = []
        for s in self.searchers:
            ids, scores = s.function_score_keyword(query, spec, precision)
            out.append((np.asarray(ids), np.asarray(scores)))
        return out

    def composite_keyword(self, q: dict, field: str, size: int,
                          after=None, precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.composite_keyword(query, field, size, after, precision)
                for s in self.searchers]

    def filters_agg_keyword(self, q: dict, named: dict,
                            other_bucket: bool = False,
                            precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.filters_agg_keyword(query, named, other_bucket, precision)
                for s in self.searchers]

    def named_matches(self, named: dict, ids) -> list:
        return [s.named_matches(named, ids) for s in self.searchers]

    def adjacency_keyword(self, q: dict, named: dict,
                          separator: str = "&",
                          precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.adjacency_keyword(query, named, separator, precision)
                for s in self.searchers]

    def top_metrics_keyword(self, q: dict, sort_field: str,
                            metric_fields: list, ascending: bool,
                            size: int, precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.top_metrics_keyword(query, sort_field, metric_fields,
                                      ascending, size, precision)
                for s in self.searchers]

    def string_stats_keyword(self, q: dict, field: str,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.string_stats_keyword(query, field, precision)
                for s in self.searchers]

    def matrix_stats_keyword(self, q: dict, fields: list,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.matrix_stats_keyword(query, fields, precision)
                for s in self.searchers]

    def weighted_avg_keyword(self, q: dict, value_field: str,
                             weight_field: str,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.weighted_avg_keyword(query, value_field, weight_field,
                                       precision)
                for s in self.searchers]

    def boosting_keyword(self, q: dict, negative_keyword: str,
                         negative_boost: float,
                         precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        out = []
        for s in self.searchers:
            ids, scores = s.boosting_keyword(query, negative_keyword,
                                             negative_boost, precision)
            out.append((np.asarray(ids), np.asarray(scores)))
        return out

    def sigterms_keyword(self, q: dict, field: str,
                         precision: str = "float32",
                         shard_min_doc_count: int = 0) -> list:
        query = SearchQuery.from_dict(q)
        return [s.sigterms_keyword(query, field, precision,
                                   shard_min_doc_count)
                for s in self.searchers]

    def sigterms_top_keyword(self, q: dict, field: str, shard_size: int,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.sigterms_top_keyword(query, field, shard_size, precision)
                for s in self.searchers]

    def sigterms_probe_keyword(self, q: dict, field: str, terms: list,
                               precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.sigterms_probe_keyword(query, field, terms, precision)
                for s in self.searchers]

    def cardinality_keyword(self, q: dict, field: str, p: int = 12,
                            precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.cardinality_keyword(query, field, p, precision)
                for s in self.searchers]

    def count_keyword(self, q: dict, precision: str = "float32") -> int:
        query = SearchQuery.from_dict(q)
        return sum(s.count_keyword(query, precision)
                   for s in self.searchers)

    def stats_keyword(self, q: dict, field: str,
                      precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.stats_keyword(query, field, precision)
                for s in self.searchers]

    def tophits_keyword(self, q: dict, key_field: str, keys: list,
                        per_key: int, precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.tophits_keyword(query, key_field, keys, per_key, precision)
                for s in self.searchers]

    def phrase_pair_counts(self, pairs: list, field: str) -> np.ndarray:
        return np.sum([s.phrase_pair_counts(pairs, field)
                       for s in self.searchers], axis=0)

    # ---------- suggest family: actor-cached termstats dictionary ----------
    # The master splits the termstats parquet parts round-robin across the
    # actor pool and passes each actor ITS assigned subset per call; the
    # actor loads a part once (column-pruned) and keeps it in memory — the
    # BucketSearcher pattern applied to the term dictionary, so a suggest
    # call is an RPC over cached arrays instead of a per-query Ray Data
    # scan. NRT/compaction safety: unknown paths load on demand, paths no
    # longer assigned are evicted, so the cache tracks the live manifest.
    # Memory contract: one actor holds |assigned parts| dictionary slices
    # (term+df+ttf columns only) — the same ≤-heap sizing knob as the
    # posting caches (add actors to shrink the per-actor slice).

    def _termstats(self, paths: list) -> list:
        import pyarrow.parquet as pq
        cache = getattr(self, "_ts_dict_cache", None)
        if cache is None:
            cache = self._ts_dict_cache = {}
        out = []
        for p in paths:
            t = cache.get(p)
            if t is None:
                t = cache[p] = pq.read_table(
                    p, columns=["field", "term", "df", "ttf"])
            out.append(t)
        want = set(paths)
        for k in [k for k in cache if k not in want]:
            del cache[k]
        return out

    def warm_termstats(self, paths: list) -> int:
        """Preload this actor's assigned dictionary slice (activate
        preload=True) so the first suggest call doesn't pay the parquet
        read. Returns the cached part count."""
        return len(self._termstats(paths))

    def suggest_candidates(self, paths: list, field: str, term: str,
                           max_edits: int, transpositions: bool) -> list:
        from byzer_retrieval_ray.functions import suggest_kernels as K
        return [K.spell_candidates(t, field, term, max_edits, transpositions)
                for t in self._termstats(paths)]

    def complete_candidates(self, paths: list, field: str,
                            prefix: str) -> list:
        from byzer_retrieval_ray.functions import suggest_kernels as K
        return [K.prefix_candidates(t, field, prefix)
                for t in self._termstats(paths)]

    def phrase_token_candidates(self, paths: list, field: str, tokens: list,
                                max_edits: int, transpositions: bool) -> list:
        from byzer_retrieval_ray.functions import suggest_kernels as K
        return [K.token_candidates(t, field, tokens, max_edits,
                                   transpositions)
                for t in self._termstats(paths)]

    def histogram_keyword(self, q: dict, field: str, interval: int,
                          offset: int = 0,
                          precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.histogram_keyword(query, field, interval, offset,
                                    precision)
                for s in self.searchers]

    def bucket_metrics_keyword(self, q: dict, key_spec: dict, keys: list,
                               fields: list,
                               precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.bucket_metrics_keyword(query, key_spec, keys, fields,
                                         precision)
                for s in self.searchers]

    def terms_metric_keyword(self, q: dict, key_field: str,
                             metric_field: str,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.terms_metric_keyword(query, key_field, metric_field,
                                       precision)
                for s in self.searchers]

    def range_facets_keyword(self, q: dict, field: str, edges: list,
                             precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.range_facets_keyword(query, field, edges, precision)
                for s in self.searchers]

    def rank_counts_keyword(self, q: dict, field: str, xs: list,
                            precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.rank_counts_keyword(query, field, xs, precision)
                for s in self.searchers]

    def missing_count_keyword(self, q: dict, field: str,
                              precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.missing_count_keyword(query, field, precision)
                for s in self.searchers]

    def whisker_keyword(self, q: dict, field: str, fence: float, low: bool,
                        precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.whisker_keyword(query, field, fence, low, precision)
                for s in self.searchers]

    def histogram_hll_keyword(self, q: dict, time_field: str, interval: int,
                              offset: int, value_field: str, p: int,
                              precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.histogram_hll_keyword(query, time_field, interval, offset,
                                        value_field, p, precision)
                for s in self.searchers]

    def range_counts_keyword(self, q: dict, field: str, brackets: list,
                             precision: str = "float32",
                             center: float | None = None) -> list:
        query = SearchQuery.from_dict(q)
        return [s.range_counts_keyword(query, field, brackets, precision,
                                       center)
                for s in self.searchers]

    def range_values_keyword(self, q: dict, field: str, ranges: list,
                             cap: int, precision: str = "float32",
                             center: float | None = None) -> list:
        query = SearchQuery.from_dict(q)
        return [s.range_values_keyword(query, field, ranges, cap, precision,
                                       center)
                for s in self.searchers]

    def sort_keyword(self, q: dict, field: str, ascending: bool,
                     precision: str = "float32") -> list:
        query = SearchQuery.from_dict(q)
        return [s.sort_keyword(query, field, ascending, precision)
                for s in self.searchers]

    def filter_op(self, q: dict) -> pa.Table:
        query = SearchQuery.from_dict(q)
        tbls = [s.filter_op(query) for s in self.searchers]
        return pa.concat_tables(tbls, promote_options="default")

    def fetch_docs(self, doc_ids: np.ndarray) -> pa.Table:
        tbls = [s.fetch_docs(doc_ids) for s in self.searchers]
        return pa.concat_tables(tbls, promote_options="default")

    def fetch_analyzed(self, doc_ids: np.ndarray, field: str) -> pa.Table:
        tbls = [s.fetch_analyzed(doc_ids, field) for s in self.searchers]
        return pa.concat_tables(tbls, promote_options="default")


def make_segment_actor(manifest_data: dict, buckets: list, num_cpus: float = 1,
                       location: str | None = None, poll_sec: float = 0.0,
                       assignment: tuple[int, int] | None = None,
                       node_ip: str | None = None,
                       resources: dict | None = None,
                       scheduling_strategy=None):
    """Spawn one segment actor owning ``buckets`` (ray must already be initialized
    by the caller). ``poll_sec`` > 0 enables the NRT manifest poll; ``assignment``
    is the actor's (index, pool size) for reload-time pair re-derivation.

    Placement (multi-node deployments with node-local index dirs): ``node_ip``
    pins the actor to the node advertising Ray's built-in ``node:<ip>``
    resource — the same custom-resource scheme the reference uses to re-pin
    workers to the node holding their shard dirs (RetrievalMaster.java:54-56,
    RetrievalGateway.java:90-137). ``resources`` passes arbitrary custom
    resource demands; ``scheduling_strategy`` accepts any Ray scheduling
    strategy (e.g. NodeAffinitySchedulingStrategy) for finer control. On a
    shared filesystem none of these are needed."""
    import ray

    # Fault tolerance (the reference's master restarts dead workers and
    # re-pins them to their shard dirs — RetrievalMaster.java:54-56): Ray
    # restarts a crashed segment actor up to 4 times, re-running __init__
    # from the by-value (manifest_data, buckets, …) args; serving methods
    # are read-only/idempotent, so in-flight calls retry transparently
    # (max_task_retries) instead of surfacing an ActorDiedError to every
    # concurrent client.
    opts: dict = {"num_cpus": num_cpus, "max_restarts": 4,
                  "max_task_retries": 2}
    res = dict(resources) if resources else {}
    if node_ip is not None:
        # fractional demand: pinning must not consume schedulable capacity
        res[f"node:{node_ip}"] = 0.001
    if res:
        opts["resources"] = res
    if scheduling_strategy is not None:
        opts["scheduling_strategy"] = scheduling_strategy
    cls = ray.remote(**opts)(SegmentActorImpl)
    return cls.remote(manifest_data, buckets, location, poll_sec, assignment)
