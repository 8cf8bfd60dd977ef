"""Arrow Flight serving boundary — the reference's out-of-process client surface.

The reference exposes the whole engine through an Arrow Flight server
(`RetrievalFlightServer.java:84-93` — actions CreateTable / BuildFromLocal /
Search / Commit / DeleteByFilter / Shutdown …, each carrying ONE Arrow IPC
record batch of utf8 columns; responses are utf8 bytes, "true" or a JSON
document) plus a ``do_get`` stream returning ``(id: utf8, score: float32)``
batches for a query ticket (`RetrievalFlightServer.java:369-407`). Its Python
consumer builds those IPC payloads by hand (`test_retrieval.py:24-165`,
`python_client.py`).

This module provides the same wire protocol over ``pyarrow.flight``:

* ``RetrievalFlightServer`` wraps a ``RetrievalCluster`` (state on disk, so any
  number of servers can front the same location);
* ``RetrievalFlightClient`` mirrors the reference client's method surface.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.flight as fl

from byzer_retrieval_ray.table.api import RetrievalCluster
from byzer_retrieval_ray.table.query import TableSettings


def _ipc_batch(names: list[str], values: list) -> bytes:
    batch = pa.RecordBatch.from_arrays([pa.array([v]) for v in values], names=names)
    sink = pa.BufferOutputStream()
    with pa.RecordBatchStreamWriter(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue().to_pybytes()


def _read_row(body: bytes) -> dict:
    """First row of the action's IPC batch as {column: value}."""
    with pa.ipc.open_stream(pa.BufferReader(body)) as reader:
        tbl = reader.read_all()
    return {name: tbl[name][0].as_py() for name in tbl.column_names}


def _jsonable(obj):
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


class RetrievalFlightServer(fl.FlightServerBase):
    """Flight front-end for a RetrievalCluster (reference parity surface)."""

    def __init__(self, cluster: RetrievalCluster, location: str = "grpc://127.0.0.1:0"):
        super().__init__(location)
        self.cluster = cluster

    # ------------- actions -------------

    def do_action(self, context, action):
        t = action.type
        body = action.body.to_pybytes() if action.body is not None else b""
        c = self.cluster
        if t == "CreateTable":
            row = _read_row(body)
            ok = c.create_table(TableSettings(
                row["database"], row["table"], row["schema"],
                row.get("location") or c.location,
                int(row.get("numShards") or 1)))
            return iter([fl.Result(b"true" if ok else b"false")])
        if t == "BuildFromLocal":
            row = _read_row(body)
            docs = [json.loads(s) for s in row["data"]]
            ok = c.build_from_local(row["database"], row["table"], docs)
            return iter([fl.Result(b"true" if ok else b"false")])
        if t == "Search":
            row = _read_row(body)
            queries = json.loads(row["query"])
            res = c.search(row["database"], row["table"], queries)
            # the reference returns ONE json array for the (single) query
            out = res[0] if len(res) == 1 else res
            return iter([fl.Result(json.dumps(_jsonable(out)).encode())])
        if t == "Filter":
            row = _read_row(body)
            queries = json.loads(row["query"])
            res = c.filter(row["database"], row["table"], queries)
            out = res[0] if len(res) == 1 else res
            return iter([fl.Result(json.dumps(_jsonable(out)).encode())])
        if t == "Commit":
            row = _read_row(body)
            return iter([fl.Result(b"true" if c.commit(row["database"], row["table"])
                                   else b"false")])
        if t == "DeleteByIds":
            row = _read_row(body)
            ok = c.delete_by_ids(row["database"], row["table"], json.loads(row["ids"]))
            return iter([fl.Result(b"true" if ok else b"false")])
        if t == "DeleteByFilter":
            row = _read_row(body)
            ok = c.delete_by_filter(row["database"], row["table"],
                                    json.loads(row["condition"]))
            return iter([fl.Result(b"true" if ok else b"false")])
        if t == "Truncate":
            row = _read_row(body)
            return iter([fl.Result(b"true" if c.truncate(row["database"], row["table"])
                                   else b"false")])
        if t == "Close":
            row = _read_row(body)
            return iter([fl.Result(b"true" if c.close(row["database"], row["table"])
                                   else b"false")])
        if t == "CloseAndDeleteFile":
            row = _read_row(body)
            ok = c.close_and_delete_file(row["database"], row["table"])
            return iter([fl.Result(b"true" if ok else b"false")])
        if t == "ClusterInfo":
            return iter([fl.Result(json.dumps(c.cluster_info()).encode())])
        if t == "Shutdown":
            # ack first; the server object is shut down by the owner (tests call
            # server.shutdown()); mirrors the reference's graceful stop
            return iter([fl.Result(b"true")])
        raise fl.FlightServerError(f"unknown action {t!r}")

    def list_actions(self, context):
        return [(t, t) for t in (
            "CreateTable", "BuildFromLocal", "Search", "Filter", "Commit",
            "DeleteByIds", "DeleteByFilter", "Truncate", "Close",
            "CloseAndDeleteFile", "ClusterInfo", "Shutdown")]

    # ------------- do_get stream (S8) -------------

    def get_flight_info(self, context, descriptor):
        # reference: FlightInfo with the query path echoed as the ticket
        ticket = fl.Ticket(descriptor.path[0] if descriptor.path else b"")
        schema = pa.schema([("id", pa.string()), ("score", pa.float32())])
        endpoint = fl.FlightEndpoint(ticket, [])
        return fl.FlightInfo(schema, descriptor, [endpoint], -1, -1)

    def do_get(self, context, ticket):
        """Ticket = the search-query JSON (single query or list); stream =
        ``(id: utf8, score: float32)`` — RetrievalFlightServer.java:369-407."""
        payload = json.loads(ticket.ticket.decode())
        if isinstance(payload, dict):
            payload = [payload]
        db = payload[0]["database"]
        table = payload[0]["table"]
        tbls = self.cluster.search_arrow(db, table, payload)
        out = pa.concat_tables(tbls) if tbls else pa.table(
            {"id": pa.array([], pa.string()), "score": pa.array([], pa.float32())})
        return fl.RecordBatchStream(out)


class RetrievalFlightClient:
    """Client mirroring the reference's python_client.py / test_retrieval.py."""

    def __init__(self, location: str):
        self.client = fl.connect(location)

    def _action(self, name: str, body: bytes = b"") -> bytes:
        results = list(self.client.do_action(fl.Action(name, body)))
        return results[0].body.to_pybytes() if results else b""

    def create_table(self, database: str, table: str, schema: str,
                     location: str = "", num_shards: int = 1) -> bool:
        body = _ipc_batch(["database", "table", "schema", "location", "numShards"],
                          [database, table, schema, location, str(num_shards)])
        return self._action("CreateTable", body) == b"true"

    def build_from_local(self, database: str, table: str, data: list[dict]) -> bool:
        body = _ipc_batch(["database", "table", "data"],
                          [database, table, [json.dumps(d) for d in data]])
        return self._action("BuildFromLocal", body) == b"true"

    def search(self, database: str, table: str, **query) -> list[dict]:
        q = {"database": database, "table": table, **query}
        body = _ipc_batch(["database", "table", "query"],
                          [database, table, json.dumps([q])])
        return json.loads(self._action("Search", body).decode())

    def filter(self, database: str, table: str, **query) -> list[dict]:
        q = {"database": database, "table": table, **query}
        body = _ipc_batch(["database", "table", "query"],
                          [database, table, json.dumps([q])])
        return json.loads(self._action("Filter", body).decode())

    def search_stream(self, database: str, table: str, **query) -> pa.Table:
        """S8: the (id, score) Arrow stream for a query ticket."""
        q = {"database": database, "table": table, **query}
        reader = self.client.do_get(fl.Ticket(json.dumps([q]).encode()))
        return reader.read_all()

    def commit(self, database: str, table: str) -> bool:
        return self._action("Commit", _ipc_batch(["database", "table"],
                                                 [database, table])) == b"true"

    def delete_by_ids(self, database: str, table: str, ids: list) -> bool:
        body = _ipc_batch(["database", "table", "ids"],
                          [database, table, json.dumps(ids)])
        return self._action("DeleteByIds", body) == b"true"

    def delete_by_filter(self, database: str, table: str, condition: dict) -> bool:
        body = _ipc_batch(["database", "table", "condition"],
                          [database, table, json.dumps(condition)])
        return self._action("DeleteByFilter", body) == b"true"

    def truncate(self, database: str, table: str) -> bool:
        return self._action("Truncate", _ipc_batch(["database", "table"],
                                                   [database, table])) == b"true"

    def close_table(self, database: str, table: str) -> bool:
        return self._action("Close", _ipc_batch(["database", "table"],
                                                [database, table])) == b"true"

    def cluster_info(self) -> dict:
        return json.loads(self._action("ClusterInfo").decode())

    def shutdown(self) -> bool:
        return self._action("Shutdown") == b"true"
