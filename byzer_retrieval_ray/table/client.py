"""High-level client API — parity with byzerllm's ``LocalByzerStorage``
(python_api.md:16-260; builder surface in the external byzerllm package,
local_simple_api). A user of the reference's Python client can switch to this class:
same builder idioms (schema_builder / write_builder / query_builder), same field
types/options, same lifecycle calls (commit / delete_by_id(s) / truncate_table /
get_by_id(s)).

The embedding model hook (``emb_llm``) is a plain callable ``str → list[float]``
(optional); the reference resolves it client-side too (python_api.md:29-38).
"""

from __future__ import annotations

from enum import Enum
from typing import Callable, Optional

from byzer_retrieval_ray.table.api import RetrievalCluster
from byzer_retrieval_ray.table.query import SearchQuery, TableSettings


class DataType(str, Enum):
    STRING = "string"
    INTEGER = "int"
    LONG = "long"
    DOUBLE = "double"
    FLOAT = "float"
    BOOLEAN = "boolean"


class FieldOption(str, Enum):
    ANALYZE = "analyze"
    NO_INDEX = "no_index"
    SORT = "sort"


class SortOption(str, Enum):
    ASC = "asc"
    DESC = "desc"


class SchemaBuilder:
    def __init__(self, storage: "ByzerStorage"):
        self._storage = storage
        self._fields: list[str] = []

    def add_field(self, name: str, data_type: DataType,
                  options: list[FieldOption] | None = None) -> "SchemaBuilder":
        opt = f",{options[0].value}" if options else ""
        self._fields.append(f"field({name},{data_type.value}{opt})")
        return self

    def add_array_field(self, name: str, data_type: DataType) -> "SchemaBuilder":
        self._fields.append(f"field({name},array({data_type.value}))")
        return self

    def execute(self) -> bool:
        dsl = "st(" + ",".join(self._fields) + ")"
        return self._storage._create(dsl)


class WriteBuilder:
    def __init__(self, storage: "ByzerStorage"):
        self._storage = storage
        self._items: list[dict] = []

    def add_item(self, item: dict, vector_fields: list[str] | None = None,
                 search_fields: list[str] | None = None) -> "WriteBuilder":
        self._items.append(self._embed(item, vector_fields or []))
        return self

    def add_items(self, items: list[dict], vector_fields: list[str] | None = None,
                  search_fields: list[str] | None = None) -> "WriteBuilder":
        for it in items:
            self.add_item(it, vector_fields, search_fields)
        return self

    def _embed(self, item: dict, vector_fields: list[str]) -> dict:
        out = dict(item)
        for f in vector_fields:
            v = out.get(f)
            if isinstance(v, str):
                if self._storage.emb_llm is None:
                    raise ValueError(
                        f"field {f!r} is a string but no emb_llm callable was given")
                out[f] = list(self._storage.emb_llm(v))
        return out

    def execute(self) -> bool:
        return self._storage._write(self._items)


class _FilterBuilder:
    def __init__(self, qb: "QueryBuilder", kind: str):
        self._qb = qb
        self._kind = kind
        self._conds: list[dict] = []

    def add_condition(self, field: str, value) -> "_FilterBuilder":
        self._conds.append({"field": field, "value": value})
        return self

    def add_range(self, field: str, min=None, max=None) -> "_FilterBuilder":
        self._conds.append({"field": field, "min": min, "max": max})
        return self

    def build(self) -> "QueryBuilder":
        self._qb._filters.setdefault(self._kind, []).extend(self._conds)
        return self._qb


class QueryBuilder:
    def __init__(self, storage: "ByzerStorage"):
        self._storage = storage
        self._filters: dict = {}
        self._sorts: list[dict] = []
        self._keyword: Optional[str] = None
        self._fields: list[str] = []
        self._vector: list[float] = []
        self._vector_field: Optional[str] = None
        self._limit: int = 10

    def and_filter(self) -> _FilterBuilder:
        return _FilterBuilder(self, "and")

    def or_filter(self) -> _FilterBuilder:
        return _FilterBuilder(self, "or")

    def add_sort(self, field: str, order: SortOption = SortOption.DESC) -> "QueryBuilder":
        self._sorts.append({field: order.value})
        return self

    def set_search_query(self, keyword: str, fields: list[str]) -> "QueryBuilder":
        self._keyword = keyword
        self._fields = list(fields)
        return self

    def set_vector_query(self, vector, fields: list[str]) -> "QueryBuilder":
        if isinstance(vector, str):
            if self._storage.emb_llm is None:
                raise ValueError("string vector query requires an emb_llm callable")
            vector = list(self._storage.emb_llm(vector))
        self._vector = list(vector)
        self._vector_field = fields[0]
        return self

    def set_limit(self, limit: int) -> "QueryBuilder":
        self._limit = limit
        return self

    def execute(self) -> list[dict]:
        q = SearchQuery(self._storage.database, self._storage.table,
                        filters=self._filters, sorts=self._sorts,
                        keyword=self._keyword, fields=self._fields,
                        vector=self._vector, vectorField=self._vector_field,
                        limit=self._limit)
        if q.has_keyword or q.has_vector:
            return self._storage.cluster.search(
                self._storage.database, self._storage.table, q)[0]
        return self._storage.cluster.filter(
            self._storage.database, self._storage.table, q)[0]


class ByzerStorage:
    """LocalByzerStorage-equivalent facade over RetrievalCluster."""

    def __init__(self, namespace: str, database: str, table: str,
                 location: str = "/tmp/byzer_storage",
                 emb_llm: Callable[[str], list] | None = None,
                 num_doc_parts: int = 4, num_term_parts: int = 4):
        self.namespace = namespace
        self.database = database
        self.table = table
        self.location = f"{location}/{namespace}"
        self.emb_llm = emb_llm
        self.num_doc_parts = num_doc_parts
        self.num_term_parts = num_term_parts
        self.cluster = RetrievalCluster(self.location, name=namespace)

    # builders ------------------------------------------------------------
    def schema_builder(self) -> SchemaBuilder:
        return SchemaBuilder(self)

    def write_builder(self) -> WriteBuilder:
        return WriteBuilder(self)

    def query_builder(self) -> QueryBuilder:
        return QueryBuilder(self)

    # internals -----------------------------------------------------------
    def _create(self, dsl: str) -> bool:
        return self.cluster.create_table(
            TableSettings(self.database, self.table, dsl, self.location))

    def _write(self, items: list[dict]) -> bool:
        return self.cluster.build_from_local(
            self.database, self.table, items, key_field="_id",
            num_doc_parts=self.num_doc_parts, num_term_parts=self.num_term_parts)

    # lifecycle -----------------------------------------------------------
    def commit(self) -> bool:
        return self.cluster.commit(self.database, self.table)

    def delete_by_id(self, doc_id) -> bool:
        return self.cluster.delete_by_ids(self.database, self.table, [doc_id])

    def delete_by_ids(self, ids: list) -> bool:
        return self.cluster.delete_by_ids(self.database, self.table, ids)

    def truncate_table(self) -> bool:
        return self.cluster.truncate(self.database, self.table)

    def compact(self) -> bool:
        """Fold the delta-generation chain into one generation (Lucene
        forceMerge equivalent; see RetrievalCluster.compact)."""
        self.cluster.compact(self.database, self.table)
        return True

    def compact_deltas(self) -> bool:
        """Tiered merge: fold only the delta generations into one, leaving the
        base untouched (see RetrievalCluster.compact_deltas)."""
        self.cluster.compact_deltas(self.database, self.table)
        return True

    def vacuum(self) -> dict:
        """Delete retired generation directories (disk GC after compactions;
        see RetrievalCluster.vacuum for the reader-race caveat)."""
        return self.cluster.vacuum(self.database, self.table)

    # reads ---------------------------------------------------------------
    def get_by_id(self, doc_id) -> Optional[dict]:
        out = self.get_by_ids([doc_id])
        return out[0] if out else None

    def get_by_ids(self, ids: list) -> list[dict]:
        m = self.cluster.manifest(self.database, self.table)
        from byzer_retrieval_ray.index.searcher import GenerationReader
        key = GenerationReader(m.data).key_field
        tree = {"or": [{"field": key, "value": i} for i in ids]}
        q = SearchQuery(self.database, self.table, filters=tree, limit=len(ids))
        return self.cluster.filter(self.database, self.table, q)[0]
