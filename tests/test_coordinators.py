"""Query-coordinator tier + replicated segment pools (round-5 serving-at-
QPS work): coordinators run each read endpoint's actor-mode scatter+fold
in their own process (index/coordinator.py), replicas multiply the
pool-saturation ceiling. These tests pin result parity (coordinator mode
must be byte-identical to driver-fold mode), lifecycle (respawn on
invalidate, cleanup on deactivate), and the pool bookkeeping."""

import pytest

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
          "field(cat,string),field(n,long))")


def _build(loc, n=200):
    c = RetrievalCluster(loc)
    c.create_table(TableSettings("db", "t", SCHEMA, loc))
    docs = [{"_id": i, "content": f"hit w{i % 7}",
             "cat": ["a", "b", "c"][i % 3], "n": i} for i in range(n)]
    c.build_from_local("db", "t", docs, key_field="_id",
                       num_doc_parts=4, num_term_parts=2)
    return c


def _q(limit=5):
    return SearchQuery("db", "t", keyword="hit", fields=["content"],
                       limit=limit)


class TestCoordinatorParity:
    def test_endpoints_match_driver_fold(self, ray_session, tmp_path):
        c = _build(str(tmp_path))
        c.activate("db", "t")
        try:
            base = {
                "search": c.search("db", "t", _q()),
                "facets": c.facet_counts("db", "t", _q(), "cat"),
                "agg": c.aggregate("db", "t", _q(),
                                   {"terms": {"field": "cat", "size": 3}},
                                   {"a": {"avg": {"field": "n"}},
                                    "top": {"top_hits": {"size": 2}}}),
                "complete": c.complete("db", "t", "content", "w1"),
                "sig": c.significant_terms("db", "t",
                                           SearchQuery("db", "t",
                                                       keyword="w1",
                                                       fields=["content"],
                                                       limit=5),
                                           "content", limit=5),
                "pct": c.percentiles("db", "t", _q(), "n", [0.5]),
            }
            c.add_coordinators("db", "t", 3)
            assert c.search("db", "t", _q()) == base["search"]
            assert c.facet_counts("db", "t", _q(), "cat") == base["facets"]
            assert c.aggregate("db", "t", _q(),
                               {"terms": {"field": "cat", "size": 3}},
                               {"a": {"avg": {"field": "n"}},
                                "top": {"top_hits": {"size": 2}}}) == \
                base["agg"]
            assert c.complete("db", "t", "content", "w1") == base["complete"]
            assert c.significant_terms("db", "t",
                                       SearchQuery("db", "t", keyword="w1",
                                                   fields=["content"],
                                                   limit=5),
                                       "content", limit=5) == base["sig"]
            assert c.percentiles("db", "t", _q(), "n", [0.5]) == base["pct"]
        finally:
            c.deactivate("db", "t")

    def test_round_robin_covers_all_coordinators(self, ray_session,
                                                 tmp_path):
        c = _build(str(tmp_path), n=60)
        c.activate("db", "t", num_coordinators=3)
        try:
            # 6 calls round-robin over 3 coordinators — all must answer
            outs = [c.count("db", "t", _q()) for _ in range(6)]
            assert set(outs) == {60}
        finally:
            c.deactivate("db", "t")


class TestReplicas:
    def test_replica_pools_spawn_and_answer(self, ray_session, tmp_path):
        c = _build(str(tmp_path), n=120)
        n = c.activate("db", "t", num_replicas=2, num_coordinators=4)
        try:
            pools = c._actor_pools[("db", "t")]
            assert len(pools) == 2 and len(pools[0]) == len(pools[1]) == n
            assert c._actors[("db", "t")] is pools[0]
            # every coordinator (fronting alternating pools) gives the
            # same answer
            outs = [c.count("db", "t", _q()) for _ in range(8)]
            assert set(outs) == {120}
        finally:
            c.deactivate("db", "t")
        assert ("db", "t") not in c._actor_pools
        assert ("db", "t") not in c._coordinators

    def test_delta_build_reloads_all_replicas(self, ray_session, tmp_path):
        c = _build(str(tmp_path), n=50)
        c.activate("db", "t", num_replicas=2, num_coordinators=2,
                   nrt_poll_sec=0)
        try:
            assert c.count("db", "t", _q(limit=500)) == 50
            c.build_from_local(
                "db", "t", [{"_id": 900, "content": "hit w0",
                             "cat": "a", "n": 900}],
                key_field="_id", num_doc_parts=4, num_term_parts=2)
            # invalidate reloaded/respawned BOTH pools + the coordinators:
            # every round-robin target must see the new generation
            outs = [c.count("db", "t", _q(limit=500)) for _ in range(4)]
            assert set(outs) == {51}
            assert len(c._coordinators[("db", "t")]) == 2
            assert len(c._actor_pools[("db", "t")]) == 2
        finally:
            c.deactivate("db", "t")

    def test_coordinators_require_activation(self, ray_session, tmp_path):
        c = _build(str(tmp_path), n=20)
        with pytest.raises(RuntimeError, match="not activated"):
            c.add_coordinators("db", "t", 2)


class TestFaultTolerance:
    """Round-5: segment actors and coordinators restart on crash
    (max_restarts + idempotent-read task retries) — queries issued after
    (or racing) a crash succeed instead of raising ActorDiedError."""

    def test_segment_actor_crash_recovers(self, ray_session, tmp_path):
        import ray
        c = _build(str(tmp_path), n=80)
        c.activate("db", "t")
        try:
            before = c.search("db", "t", _q())
            # crash (not a graceful kill): restart-eligible
            victim = c._actors[("db", "t")][0]
            ray.kill(victim, no_restart=False)
            assert c.search("db", "t", _q()) == before
            assert c.count("db", "t", _q()) == 80
        finally:
            c.deactivate("db", "t")

    def test_coordinator_crash_recovers(self, ray_session, tmp_path):
        import ray
        c = _build(str(tmp_path), n=60)
        c.activate("db", "t", num_coordinators=2)
        try:
            before = c.facet_counts("db", "t", _q(), "cat")
            for co in c._coordinators[("db", "t")]:
                ray.kill(co, no_restart=False)
            outs = [c.facet_counts("db", "t", _q(), "cat")
                    for _ in range(4)]
            assert all(o == before for o in outs)
        finally:
            c.deactivate("db", "t")
