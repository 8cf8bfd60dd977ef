"""Filter-tree compiler.

The reference compiles a JSON filter tree into a Lucene BooleanQuery
(Utils.buildFilter, Utils.java:258-304): ``{"and":[...]}`` → MUST, ``{"or":[...]}`` →
SHOULD, leaves are ``{"field": f, "value": v}`` (exact match, or — for ``analyze``
fields — parsed-query match, i.e. OR over the whitespace tokens of ``v``) or
``{"field": f, "min": a, "max": b}`` (inclusive range, either bound optional).

Extensions beyond the reference DSL (the reference's Utils.buildFilter has
neither): ``{"not": <subtree>}`` negates a subtree with SQL three-valued
logic — the Kleene mask is inverted BEFORE the top-level null→False fill,
so a null leaf stays null through ``not`` and still drops at the top
(matching SQL ``NOT(...)``; this deliberately DIVERGES from Lucene
must_not, which would include null docs — combine with ``exists`` to get
that). ``{"field": f, "exists": true}`` matches docs whose field is
non-null (for list columns: non-null with at least one non-null element,
the elasticsearch ``exists`` array convention); ``"exists": false``
negates with the same null-free mask on both sides.

Here the same tree compiles to two targets:
  * ``to_expression``: a ``pyarrow.dataset`` expression for parquet predicate pushdown
    (only when no analyzed-field leaf is present);
  * ``evaluate``: a boolean mask over an Arrow table using pyarrow.compute kernels —
    fully vectorized, analyzed leaves included (token containment via
    ``match_substring`` on a space-padded copy of the text).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


def _is_leaf(node: dict) -> bool:
    return "field" in node


def _leaf_expression(node: dict, analyzed: set[str]):
    f = node["field"]
    if "exists" in node:
        e = pads.field(f).is_valid()
        return e if node["exists"] else ~e
    if f in analyzed:
        return None  # token-match not expressible as a dataset expression
    if "value" in node:
        return pads.field(f) == node["value"]
    expr = None
    if node.get("min") is not None:
        expr = pads.field(f) >= node["min"]
    if node.get("max") is not None:
        e2 = pads.field(f) <= node["max"]
        expr = e2 if expr is None else expr & e2
    if expr is None:
        raise ValueError(f"empty range filter on {f!r}")
    return expr


def to_expression(tree: dict, analyzed: set[str] | None = None):
    """Compile to a pyarrow.dataset expression, or None if not expressible."""
    analyzed = analyzed or set()
    if not tree:
        return None

    def go(node):
        if _is_leaf(node):
            return _leaf_expression(node, analyzed)
        if "and" in node:
            parts = [go(c) for c in node["and"]]
            if any(p is None for p in parts):
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out & p
            return out
        if "or" in node:
            parts = [go(c) for c in node["or"]]
            if any(p is None for p in parts):
                return None
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            return out
        if "not" in node:
            inner = go(node["not"])
            return None if inner is None else ~inner
        raise ValueError(f"bad filter node: {node!r}")

    return go(tree)


def _list_any_mask(col: pa.ChunkedArray, node: dict) -> pa.Array:
    """ANY-element semantics for a list-typed column (the elasticsearch
    array-field convention: a filter matches a doc when any element
    matches). Vectorized: flatten once, compare elements, scatter hits back
    to parent rows via list_parent_indices. Null lists and null elements
    never match."""
    import numpy as np

    arr = col.combine_chunks()
    values = arr.flatten()
    parents = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
    if "value" in node:
        hit = pc.equal(values, pa.scalar(node["value"]).cast(values.type))
    else:
        hit = None
        if node.get("min") is not None:
            hit = pc.greater_equal(values,
                                   pa.scalar(node["min"]).cast(values.type))
        if node.get("max") is not None:
            h2 = pc.less_equal(values,
                               pa.scalar(node["max"]).cast(values.type))
            hit = h2 if hit is None else pc.and_(hit, h2)
        if hit is None:
            raise ValueError(f"empty range filter on {node['field']!r}")
    hit = pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
    mask = np.zeros(len(col), dtype=bool)
    mask[parents[hit]] = True
    return pa.array(mask)


def _leaf_mask(table: pa.Table, node: dict, analyzed: set[str]) -> pa.ChunkedArray:
    f = node["field"]
    col = table[f]
    if "exists" in node:
        # null-free mask by construction, so Kleene and/or/not stay exact
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            import numpy as np
            arr = col.combine_chunks()
            parents = pc.list_parent_indices(arr) \
                .to_numpy(zero_copy_only=False)
            elem_ok = pc.fill_null(pc.is_valid(arr.flatten()), False) \
                .to_numpy(zero_copy_only=False)
            m = np.zeros(len(col), dtype=bool)
            m[parents[elem_ok]] = True
            mask = pa.array(m)
        else:
            mask = pc.is_valid(col)
        return mask if node["exists"] else pc.invert(mask)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        return _list_any_mask(col, node)
    if "value" in node:
        v = node["value"]
        if f in analyzed:
            # OR over the whitespace tokens of v (SimpleQueryParser default OR).
            # Normalize ALL whitespace to single spaces first so tokens delimited by
            # tabs/newlines (whitespace-analyzer separators) still match, then pad.
            # last arg of binary_join_element_wise is the separator: " "+text+" "
            norm = pc.replace_substring_regex(
                pc.cast(col, pa.string()), pattern=r"\s", replacement=" ")
            padded = pc.binary_join_element_wise(
                pa.scalar(" "), norm, pa.scalar(" "), pa.scalar(""),
                null_handling="replace")
            mask = None
            for tok in str(v).split():
                m = pc.match_substring(padded, f" {tok} ")
                mask = m if mask is None else pc.or_(mask, m)
            if mask is None:
                return pc.equal(pa.nulls(len(table), pa.bool_()), True)
            return mask
        # numeric leaves arrive as JSON numbers; cast the literal to the column type
        return pc.equal(col, pa.scalar(v).cast(col.type))
    mask = None
    if node.get("min") is not None:
        mask = pc.greater_equal(col, pa.scalar(node["min"]).cast(col.type))
    if node.get("max") is not None:
        m2 = pc.less_equal(col, pa.scalar(node["max"]).cast(col.type))
        mask = m2 if mask is None else pc.and_(mask, m2)
    if mask is None:
        raise ValueError(f"empty range filter on {f!r}")
    return mask


def evaluate(table: pa.Table, tree: dict, analyzed: set[str] | None = None) -> pa.ChunkedArray:
    """Boolean mask (nulls treated as False) over ``table`` for the filter tree."""
    analyzed = analyzed or set()
    if not tree:
        import numpy as np
        return pa.chunked_array([pa.array(np.ones(len(table), dtype=bool))])

    def go(node):
        if _is_leaf(node):
            return _leaf_mask(table, node, analyzed)
        if "and" in node:
            parts = [go(c) for c in node["and"]]
            out = parts[0]
            for p in parts[1:]:
                out = pc.and_kleene(out, p)
            return out
        if "or" in node:
            parts = [go(c) for c in node["or"]]
            out = parts[0]
            for p in parts[1:]:
                out = pc.or_kleene(out, p)
            return out
        if "not" in node:
            # Kleene NOT: null stays null and falls to False at the top —
            # SQL three-valued semantics (see module docstring)
            return pc.invert(go(node["not"]))
        raise ValueError(f"bad filter node: {node!r}")

    mask = go(tree)
    return pc.fill_null(mask, False)
