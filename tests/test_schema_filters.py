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
