"""Arrow Flight serving boundary: real-socket round trip of the reference's
client protocol (RetrievalFlightServer.java actions + do_get stream;
test_retrieval.py / python_client.py consumer shape)."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def flight_pair(ray_session, tmp_path_factory):
    from byzer_retrieval_ray import RetrievalCluster
    from byzer_retrieval_ray.table.flight import (RetrievalFlightClient,
                                                  RetrievalFlightServer)

    loc = str(tmp_path_factory.mktemp("flight_cluster"))
    cluster = RetrievalCluster(loc)
    server = RetrievalFlightServer(cluster, "grpc://127.0.0.1:0")
    client = RetrievalFlightClient(f"grpc://127.0.0.1:{server.port}")
    yield cluster, server, client
    server.shutdown()


SCHEMA = ("st(field(_id,long),field(content,string,analyze),"
          "field(raw_content,string,no_index),field(vector,array(float)))")


class TestFlightRoundTrip:
    def test_create_build_search(self, flight_pair):
        _, _, client = flight_pair
        assert client.create_table("db", "t", SCHEMA)
        docs = [
            {"_id": 1, "content": "hello flight world", "raw_content": "raw1",
             "vector": [1.0, 0.0]},
            {"_id": 2, "content": "another document here", "raw_content": "raw2",
             "vector": [0.0, 1.0]},
            {"_id": 3, "content": "hello again friend", "raw_content": "raw3",
             "vector": [0.7, 0.7]},
        ]
        assert client.build_from_local("db", "t", docs)
        assert client.commit("db", "t")

        res = client.search("db", "t", keyword="hello", fields=["content"], limit=10)
        assert sorted(r["_id"] for r in res) == [1, 3]
        assert all("_score" in r for r in res)
        # stored fields come back; analyzed-only content is not stored
        assert res[0]["raw_content"].startswith("raw")

        # hybrid keyword+vector through the same action
        res = client.search("db", "t", keyword="hello", fields=["content"],
                            vector=[1.0, 0.0], vectorField="vector", limit=2)
        assert len(res) == 2

    def test_do_get_stream_schema(self, flight_pair):
        _, _, client = flight_pair
        t = client.search_stream("db", "t", keyword="hello", fields=["content"],
                                 limit=10)
        # reference stream schema: (id: utf8, score: float32)
        assert t.schema.names == ["id", "score"]
        assert t.schema.types == [pa.string(), pa.float32()]
        assert sorted(t["id"].to_pylist()) == ["1", "3"]

    def test_filter_and_mutations(self, flight_pair):
        _, _, client = flight_pair
        res = client.filter("db", "t",
                            filters={"and": [{"field": "_id", "min": 2}]},
                            sorts=[{"_id": "desc"}], limit=10)
        assert [r["_id"] for r in res] == [3, 2]

        assert client.delete_by_ids("db", "t", [2])
        res = client.search("db", "t", keyword="another", fields=["content"], limit=10)
        assert res == []

        info = client.cluster_info()
        assert any(t["table"] == "t" for t in info["tables"])

        assert client.delete_by_filter("db", "t", {"_id": 3})
        res = client.search("db", "t", keyword="hello", fields=["content"], limit=10)
        assert sorted(r["_id"] for r in res) == [1]

    def test_unknown_action_raises(self, flight_pair):
        import pyarrow.flight as fl
        _, _, client = flight_pair
        with pytest.raises(fl.FlightServerError):
            list(client.client.do_action(fl.Action("NoSuchAction", b"")))

    def test_truncate_and_close(self, flight_pair):
        _, _, client = flight_pair
        assert client.truncate("db", "t")
        assert client.close_table("db", "t")
        info = client.cluster_info()
        row = [x for x in info["tables"] if x["table"] == "t"][0]
        assert row["status"] == "close"
