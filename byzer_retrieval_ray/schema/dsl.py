"""The reference's compact schema DSL, re-implemented as a recursive-descent parser
producing both a StructType tree and a ``pyarrow.Schema``.

Grammar (SimpleSchemaParser.java:24-93):

    schema  := st( field* )
    field   := field( name , type [, option] )
    type    := boolean|byte|short|date|long|float|double|decimal|binary|string|int
             | array( type ) | map( type , type ) | st( ... )
    option  := analyze | sort | no_index      (at most one, 3rd token)

Of these, the reference actually *indexes* only string/int/long/double/float and
array(float); everything else parses but is rejected at indexing time
(SchemaUtils.java:32-117). We mirror that: `indexable` marks what the engine supports;
`parse_schema` accepts the full grammar. EXTENSION beyond the reference:
array(string)/array(long) columns are supported as multi-valued keyword fields
(the elasticsearch array-field convention) — stored in the docstore, filters
match when ANY element matches (functions/filters._list_any_mask), facets count
a doc once per DISTINCT element, cardinality counts distinct elements; they are
not BM25-indexed and single-group endpoints (collapse, terms_stats) reject them.

Per-field options land in Arrow field metadata so they survive round-trips:
  analyze → tokenized full-text (indexed, not stored in the searchable sense)
  no_index → stored only
  sort    → sortable doc-values equivalent
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pyarrow as pa


@dataclass(frozen=True)
class SingleType:
    name: str


@dataclass(frozen=True)
class ArrayType:
    element: "DataType"


@dataclass(frozen=True)
class MapType:
    key: "DataType"
    value: "DataType"


@dataclass(frozen=True)
class StructField:
    name: str
    data_type: "DataType"
    analyze: bool = False
    sort: bool = False
    no_index: bool = False
    nullable: bool = True


@dataclass(frozen=True)
class StructType:
    fields: tuple

    def field(self, name: str) -> StructField:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def names(self):
        return [f.name for f in self.fields]


DataType = SingleType | ArrayType | MapType | StructType

_SIMPLE_TYPES = {
    "boolean", "byte", "short", "date", "long", "float", "double",
    "decimal", "binary", "string", "int",
}


class _Parser:
    def __init__(self, text: str):
        # whitespace (incl. newlines) is insignificant everywhere in the DSL
        self.text = "".join(text.split())
        self.pos = 0

    def _expect(self, token: str):
        if not self.text.startswith(token, self.pos):
            raise ValueError(
                f"schema parse error at {self.pos}: expected {token!r} in {self.text!r}")
        self.pos += len(token)

    def _peek(self, token: str) -> bool:
        return self.text.startswith(token, self.pos)

    def _ident(self) -> str:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] not in ",()":
            self.pos += 1
        if self.pos == start:
            raise ValueError(f"schema parse error at {start}: empty identifier")
        return self.text[start:self.pos]

    def parse_struct(self) -> StructType:
        self._expect("st(")
        fields = []
        while not self._peek(")"):
            fields.append(self.parse_field())
            if self._peek(","):
                self.pos += 1
        self._expect(")")
        return StructType(tuple(fields))

    def parse_field(self) -> StructField:
        self._expect("field(")
        name = self._ident()
        self._expect(",")
        dtype = self.parse_type()
        analyze = sort = no_index = False
        if self._peek(","):
            self.pos += 1
            opt = self._ident()
            if opt == "analyze":
                analyze = True
            elif opt == "sort":
                sort = True
            elif opt == "no_index":
                no_index = True
            else:
                raise ValueError(f"unknown field option {opt!r}")
        self._expect(")")
        return StructField(name, dtype, analyze=analyze, sort=sort, no_index=no_index)

    def parse_type(self) -> DataType:
        if self._peek("array("):
            self.pos += len("array(")
            elem = self.parse_type()
            self._expect(")")
            return ArrayType(elem)
        if self._peek("map("):
            self.pos += len("map(")
            k = self.parse_type()
            self._expect(",")
            v = self.parse_type()
            self._expect(")")
            return MapType(k, v)
        if self._peek("st("):
            return self.parse_struct()
        ident = self._ident()
        if ident not in _SIMPLE_TYPES:
            raise ValueError(f"unknown type {ident!r}")
        return SingleType(ident)


def parse_schema(dsl: str) -> StructType:
    p = _Parser(dsl)
    st = p.parse_struct()
    if p.pos != len(p.text):
        raise ValueError(f"trailing characters after schema: {p.text[p.pos:]!r}")
    return st


_ARROW_TYPES = {
    "string": pa.string(),
    "int": pa.int32(),
    "long": pa.int64(),
    "double": pa.float64(),
    "float": pa.float32(),
    "boolean": pa.bool_(),
    "byte": pa.int8(),
    "short": pa.int16(),
    "date": pa.timestamp("us"),
    "binary": pa.binary(),
    "decimal": pa.decimal128(38, 18),
}


def _to_arrow_type(dt: DataType) -> pa.DataType:
    if isinstance(dt, SingleType):
        return _ARROW_TYPES[dt.name]
    if isinstance(dt, ArrayType):
        return pa.list_(_to_arrow_type(dt.element))
    if isinstance(dt, MapType):
        return pa.map_(_to_arrow_type(dt.key), _to_arrow_type(dt.value))
    if isinstance(dt, StructType):
        return pa.struct([pa.field(f.name, _to_arrow_type(f.data_type)) for f in dt.fields])
    raise TypeError(dt)


def indexable(f: StructField) -> bool:
    """What the reference can actually index (SchemaUtils.java:32-117): string, int,
    long, double, float, array(float); anything else is parse-only."""
    if isinstance(f.data_type, SingleType):
        return f.data_type.name in {"string", "int", "long", "double", "float", "date"}
    if isinstance(f.data_type, ArrayType) and isinstance(f.data_type.element, SingleType):
        return f.data_type.element.name == "float"
    return False


def to_arrow_schema(st: StructType) -> pa.Schema:
    fields = []
    for f in st.fields:
        meta = {}
        if f.analyze:
            meta[b"analyze"] = b"true"
        if f.sort:
            meta[b"sort"] = b"true"
        if f.no_index:
            meta[b"no_index"] = b"true"
        fields.append(pa.field(f.name, _to_arrow_type(f.data_type),
                               nullable=f.nullable, metadata=meta or None))
    return pa.schema(fields)
