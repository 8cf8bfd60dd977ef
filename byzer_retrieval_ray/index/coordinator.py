"""Query-coordinator actor tier: scatter-gather-fold OFF the driver.

The reference's master hands each client query to a virtual thread that
fans out to the worker actors and folds the partial results
(RetrievalMaster.java:290-324) — many folds run in parallel because JVM
threads do. This engine's driver-side folds are Python, so a single
client process saturates at ~1/fold-time QPS no matter how many segment
actors serve underneath (GIL: measured flat ~90 QPS from 4 → 32 client
threads at sf0.1).

A coordinator is a slim actor holding its OWN ``RetrievalCluster``
pointed at the same storage location, with the shared segment-actor
handles injected — so every read endpoint (search, facets, aggregate,
suggest, …) runs its existing actor-mode scatter + fold inside the
coordinator process, and the driver's only per-query work is one RPC.
K coordinators = K parallel folds; the driver round-robins. Coordinators
are stateless between calls (their inner cluster caches manifests and
suggest-path metadata only), so the pool respawns cheaply whenever the
table is rebuilt/invalidated — the same lifecycle as the segment pool.
"""

from __future__ import annotations


class CoordinatorImpl:
    def __init__(self, location: str, database: str, table: str,
                 segment_actors: list):
        # imported here: the class body must not bind ray at module import
        from byzer_retrieval_ray.table.api import RetrievalCluster
        self.cluster = RetrievalCluster(location)
        # inject the SHARED segment pool — the inner cluster now routes
        # every read endpoint through actor mode; it never registers
        # coordinators of its own, so dispatch cannot recurse
        self.cluster._actors[(database, table)] = list(segment_actors)

    def call(self, method: str, *args, **kwargs):
        return getattr(self.cluster, method)(*args, **kwargs)


def make_coordinator_actor(location: str, database: str, table: str,
                           segment_actors: list, num_cpus: float = 0.5):
    """Spawn one coordinator (ray must already be initialized). The CPU
    reservation is fractional for the same reason as the segment pool —
    the whole tier must always schedule alongside it."""
    import ray

    # same fault-tolerance contract as the segment pool: coordinators are
    # stateless between calls, so Ray restarting one (re-running __init__
    # with the by-value args + actor handles) and retrying the idempotent
    # read call is always safe
    cls = ray.remote(num_cpus=num_cpus, max_restarts=4,
                     max_task_retries=2)(CoordinatorImpl)
    return cls.remote(location, database, table, segment_actors)
