"""byzer_retrieval_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of
allwefantasy/BYZER-RETRIEVAL (reference, read-only at /root/reference): schema DSL,
whitespace analysis, BM25 (k1=1.2, b=0.75, Lucene-style byte4 length normalization),
filter trees, sorts, top-k scatter/gather, RRF hybrid fusion, and the full table
lifecycle (create/build/commit/search/filter/delete/truncate/close/restore) — but
executed as ray.data.Dataset pipelines over zero-copy Arrow batches instead of Lucene
shards inside JVM actors.

Nothing in this package calls ray.init()/ray.shutdown(); the embedding application
(driver, bench.py, pytest fixture) owns the Ray session.
"""

__version__ = "0.1.0"

from byzer_retrieval_ray.table.api import RetrievalCluster  # noqa: F401
from byzer_retrieval_ray.table.query import SearchQuery, TableSettings  # noqa: F401
