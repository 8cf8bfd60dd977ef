"""Schema-DSL parser and filter-tree compiler conformance (reference:
SchemaParseTest.java, UtilsTest.java:58-73, SimpleSchemaParser.java grammar)."""

import pyarrow as pa
import pytest

from byzer_retrieval_ray.schema import dsl
from byzer_retrieval_ray.functions import filters


REF_SCHEMA = "st(field(_id,long),field(name,string),field(content,string,analyze),field(vector,array(float)))"


class TestSchemaDSL:
    def test_reference_schema(self):
        # SchemaParseTest.java:14 — 4 fields with the right types/options
        st = dsl.parse_schema(REF_SCHEMA)
        assert len(st.fields) == 4
        assert st.field("_id").data_type == dsl.SingleType("long")
        assert st.field("content").analyze
        assert not st.field("name").analyze
        assert st.field("vector").data_type == dsl.ArrayType(dsl.SingleType("float"))

    def test_multiline(self):
        # SchemaParseTest.java:25-32 — whitespace/newlines are insignificant
        s = """st(
            field(_id,long),
            field(content,string,analyze)
        )"""
        st = dsl.parse_schema(s)
        assert st.names() == ["_id", "content"]

    def test_options(self):
        st = dsl.parse_schema(
            "st(field(a,string,analyze),field(b,long,sort),field(c,binary,no_index))")
        assert st.field("a").analyze and not st.field("a").sort
        assert st.field("b").sort
        assert st.field("c").no_index

    def test_parse_only_types(self):
        # parse accepted, but not indexable (SchemaUtils.java:32-117)
        st = dsl.parse_schema(
            "st(field(m,map(string,string)),field(s,st(field(x,long))),field(bool,boolean),"
            "field(d,decimal),field(bin,binary))")
        assert len(st.fields) == 5
        for f in st.fields:
            assert not dsl.indexable(f)

    def test_webpage_schema_to_arrow(self):
        st = dsl.parse_schema(
            "st(field(url,string),field(warc_ts,date,sort),field(html,binary,no_index),"
            "field(text,string,analyze),field(lang,string))")
        schema = dsl.to_arrow_schema(st)
        assert schema.field("url").type == pa.string()
        assert schema.field("warc_ts").type == pa.timestamp("us")
        assert schema.field("html").type == pa.binary()
        assert schema.field("text").metadata[b"analyze"] == b"true"
        assert schema.field("html").metadata[b"no_index"] == b"true"

    def test_bad_schema_raises(self):
        with pytest.raises(ValueError):
            dsl.parse_schema("st(field(a,unknown_type))")
        with pytest.raises(ValueError):
            dsl.parse_schema("st(field(a,long)")


class TestFilterTree:
    @pytest.fixture()
    def table(self):
        return pa.table({
            "lang": ["en", "zh", "en", "de"],
            "n": [1, 5, 10, 7],
            "text": ["hello world", "foo bar", "hello there", "other text"],
        })

    def test_exact_leaf(self, table):
        mask = filters.evaluate(table, {"and": [{"field": "lang", "value": "en"}]})
        assert mask.to_pylist() == [True, False, True, False]

    def test_nested_and_or(self, table):
        # UtilsTest.java:58-73 shape — and with nested or
        tree = {"and": [
            {"field": "lang", "value": "en"},
            {"or": [{"field": "n", "value": 1}, {"field": "n", "value": 10}]},
        ]}
        mask = filters.evaluate(table, tree)
        assert mask.to_pylist() == [True, False, True, False]

    def test_range_leaf(self, table):
        mask = filters.evaluate(table, {"and": [{"field": "n", "min": 5, "max": 9}]})
        assert mask.to_pylist() == [False, True, False, True]
        mask = filters.evaluate(table, {"and": [{"field": "n", "min": 6}]})
        assert mask.to_pylist() == [False, False, True, True]

    def test_analyzed_leaf_token_match(self, table):
        mask = filters.evaluate(table, {"and": [{"field": "text", "value": "hello"}]},
                                analyzed={"text"})
        assert mask.to_pylist() == [True, False, True, False]
        # multi-token value = OR of tokens (SimpleQueryParser default OR)
        mask = filters.evaluate(table, {"and": [{"field": "text", "value": "bar other"}]},
                                analyzed={"text"})
        assert mask.to_pylist() == [False, True, False, True]
        # no substring false-positive: "hell" should not match "hello"
        mask = filters.evaluate(table, {"and": [{"field": "text", "value": "hell"}]},
                                analyzed={"text"})
        assert mask.to_pylist() == [False, False, False, False]

    def test_empty_tree_matches_all(self, table):
        assert filters.evaluate(table, {}).to_pylist() == [True] * 4

    def test_expression_pushdown(self, table):
        expr = filters.to_expression({"and": [{"field": "lang", "value": "en"},
                                              {"field": "n", "min": 2}]})
        import pyarrow.dataset as pads
        got = pads.dataset(table).to_table(filter=expr)
        assert got["n"].to_pylist() == [10]
        # analyzed leaves are not expressible
        assert filters.to_expression({"and": [{"field": "text", "value": "x"}]},
                                     analyzed={"text"}) is None


class TestArrayStringFields:
    """Multi-valued keyword fields (array(string)/array(long) extension —
    the reference parses array(T) but indexes only array(float)): filters
    match on ANY element, facets count a doc once per DISTINCT element,
    cardinality counts distinct elements; single-group endpoints reject."""

    def _cluster(self, loc):
        from byzer_retrieval_ray import RetrievalCluster, TableSettings
        c = RetrievalCluster(loc)
        c.create_table(TableSettings(
            "db", "a", "st(field(_id,long),field(content,string,analyze),"
            "field(tags,array(string)),field(ns,array(long)))", loc))
        docs = [{"_id": i, "content": "hit",
                 "tags": (["red", "blue"] if i % 2 else ["green", "green"]),
                 "ns": [i, i + 100]}
                for i in range(20)]
        docs[5]["tags"] = None          # null list never matches / counts
        docs[6]["tags"] = []
        import pyarrow as pa
        import ray.data
        t = pa.table({
            "_id": pa.array([d["_id"] for d in docs], pa.int64()),
            "content": pa.array([d["content"] for d in docs]),
            "tags": pa.array([d["tags"] for d in docs],
                             pa.list_(pa.string())),
            "ns": pa.array([d["ns"] for d in docs], pa.list_(pa.int64())),
        })
        c.build_from_parquet("db", "a", ray.data.from_arrow(t),
                             key_field="_id", num_doc_parts=3,
                             num_term_parts=2)
        return c

    def test_any_element_value_filter(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = {"keyword": "hit", "fields": ["content"], "limit": 100,
             "filters": {"and": [{"field": "tags", "value": "red"}]}}
        got = sorted(r["_id"] for r in c.search("db", "a", q)[0])
        assert got == [i for i in range(20) if i % 2 and i != 5]
        # null and empty lists match nothing
        q2 = {"keyword": "hit", "fields": ["content"], "limit": 100,
              "filters": {"and": [{"field": "tags", "value": "green"}]}}
        got2 = sorted(r["_id"] for r in c.search("db", "a", q2)[0])
        assert got2 == [i for i in range(20) if i % 2 == 0 and i not in (5, 6)]

    def test_any_element_range_filter(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        # ns = [i, i+100]: min=102,max=104 hits i in {102..104} via i+100
        q = {"keyword": "hit", "fields": ["content"], "limit": 100,
             "filters": {"and": [{"field": "ns", "min": 102, "max": 104}]}}
        got = sorted(r["_id"] for r in c.search("db", "a", q)[0])
        assert got == [2, 3, 4]

    def test_or_tree_mixing_list_and_scalar(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = {"keyword": "hit", "fields": ["content"], "limit": 100,
             "filters": {"or": [{"field": "tags", "value": "red"},
                                {"field": "_id", "value": 6}]}}
        got = sorted(r["_id"] for r in c.search("db", "a", q)[0])
        assert got == sorted([i for i in range(20) if i % 2 and i != 5] + [6])

    def test_facet_counts_per_doc_distinct(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = {"keyword": "hit", "fields": ["content"], "limit": 1}
        out = c.facet_counts("db", "a", q, "tags")
        # green docs carry ["green","green"] but count ONCE each: evens
        # minus the emptied 6 -> 9; red/blue on odds minus the nulled 5 ->
        # 9 each; ties rank (count desc, value asc)
        assert out == [{"value": "blue", "count": 9},
                       {"value": "green", "count": 9},
                       {"value": "red", "count": 9}]

    def test_cardinality_counts_distinct_elements(self, ray_session,
                                                  tmp_path):
        import numpy as np
        from byzer_retrieval_ray.ops.hll import _estimate, _registers
        c = self._cluster(str(tmp_path))
        q = {"keyword": "hit", "fields": ["content"], "limit": 1}
        got = c.cardinality("db", "a", q, "tags", p=12)
        # element-level multiset: every non-null element occurrence feeds
        # the sketch (registers are max-folded, duplicates are free)
        keys = []
        for i in range(20):
            if i == 5 or i == 6:
                continue
            keys += (["red", "blue"] if i % 2 else ["green", "green"])
        assert got == _estimate(_registers(keys, 12), 12)
        assert round(got["estimate"]) == 3

    def test_single_group_endpoints_reject_lists(self, ray_session,
                                                 tmp_path):
        import pytest as _pytest
        c = self._cluster(str(tmp_path))
        q = {"keyword": "hit", "fields": ["content"], "limit": 5}
        with _pytest.raises(ValueError, match="list-typed"):
            c.collapse_search("db", "a", q, "tags")
        with _pytest.raises(ValueError, match="list-typed"):
            c.terms_stats("db", "a", q, "tags", "_id")

    def test_delete_by_filter_on_list(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        c.delete_by_filter("db", "a", {"tags": "green"})
        q = {"keyword": "hit", "fields": ["content"], "limit": 100}
        got = sorted(r["_id"] for r in c.search("db", "a", q)[0])
        # greens (evens except the emptied 6) deleted; odds + 6 remain
        assert got == sorted([i for i in range(20) if i % 2] + [6])

    def test_actor_parity(self, ray_session, tmp_path):
        c = self._cluster(str(tmp_path))
        q = {"keyword": "hit", "fields": ["content"], "limit": 100,
             "filters": {"and": [{"field": "tags", "value": "red"}]}}
        inproc = [(r["_id"], r["_score"]) for r in c.search("db", "a", q)[0]]
        fac = c.facet_counts("db", "a", q, "tags")
        c.activate("db", "a")
        assert [(r["_id"], r["_score"])
                for r in c.search("db", "a", q)[0]] == inproc
        assert c.facet_counts("db", "a", q, "tags") == fac
