"""Index-segment serving actors (ST1/ST2 equivalents).

One long-lived Ray actor per serving bucket, holding that bucket's lazily-loaded,
decoded-posting cache — the stateful stage of query serving. Queries are RPC-shaped,
so this is plain ``@ray.remote`` (SURVEY.md §7.3: don't force queries through Dataset);
the actor pool is sized to the number of buckets chosen at build time.

``reload`` re-reads the manifest so a newly committed generation becomes visible
without restarting actors — the generation-reload equivalent of the reference's NRT
reopen thread (RetrievalWorker.java:84-89).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.index.searcher import BucketSearcher
from byzer_retrieval_ray.table.query import SearchQuery


class SegmentActorImpl:
    def __init__(self, manifest_data: dict, bucket: int):
        self.searcher = BucketSearcher(manifest_data, bucket)
        self.bucket = bucket

    def reload(self, manifest_data: dict) -> bool:
        self.searcher = BucketSearcher(manifest_data, self.bucket)
        return True

    def preload(self) -> int:
        return self.searcher.preload()

    def search_keyword(self, q: dict, precision: str, algorithm: str,
                       with_docs: bool = False):
        ids, scores = self.searcher.search_keyword(
            SearchQuery.from_dict(q), precision=precision, algorithm=algorithm)
        if with_docs:
            # ship the stored fields of this shard's top-limit with the scores —
            # one round trip, like the reference workers (RetrievalWorker.java:372-376)
            return np.asarray(ids), np.asarray(scores), self.searcher.fetch_docs(ids)
        return np.asarray(ids), np.asarray(scores)

    def search_vector(self, q: dict, precision: str, with_docs: bool = False):
        ids, scores = self.searcher.search_vector(SearchQuery.from_dict(q),
                                                  precision=precision)
        if with_docs:
            return np.asarray(ids), np.asarray(scores), self.searcher.fetch_docs(ids)
        return np.asarray(ids), np.asarray(scores)

    def filter_op(self, q: dict) -> pa.Table:
        return self.searcher.filter_op(SearchQuery.from_dict(q))

    def fetch_docs(self, doc_ids: np.ndarray) -> pa.Table:
        return self.searcher.fetch_docs(doc_ids)


def make_segment_actor(manifest_data: dict, bucket: int, num_cpus: float = 1):
    """Spawn one segment actor (ray must already be initialized by the caller)."""
    import ray

    cls = ray.remote(num_cpus=num_cpus)(SegmentActorImpl)
    return cls.remote(manifest_data, bucket)
