"""URL canonicalization, registrable domains, and per-domain stats.

Web corpora key almost everything on URLs — dedup by canonical form, crawl
frequency caps and quality priors per site, train/eval splits by domain so
near-identical pages don't straddle the split. The reference engine treats
documents as opaque rows (SURVEY.md §2); these are extensions.

``canonicalize`` applies the safe, widely-agreed normalizations (RFC 3986
§6 syntax-based normalization plus tracking-param stripping):

* scheme and host lowercased (path/query stay case-sensitive),
* default ports dropped (``:80`` http, ``:443`` https), others kept,
* empty path → ``/``,
* tracking parameters removed — names matching ``utm_*``, ``gclid``,
  ``fbclid`` — with the surviving params left in their original order
  (re-sorting params changes semantics on some sites); a query left empty
  loses its ``?``,
* fragment dropped.

``registrable_domain`` approximates the public-suffix list with the common
multi-label suffixes (co.uk, com.au, …) + a last-two-labels fallback; a
production deployment should load the full PSL — the extraction regex is
the plug-in point.

Everything is Arrow/RE2 kernels (``extract_regex`` with named groups, one
flatten/filter/rebuild for the query params — no per-row Python), and every
rule is replicable in DuckDB's RE2, so the gate value-checks canonical
URLs byte-for-byte. 100 TB shape: canonicalization is a stateless
streaming ``map_batches`` (zero shuffle); ``domain_stats`` pre-aggregates
per batch and shuffles one (domain, partial-count) row per distinct domain
per batch into a bucketed fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from byzer_retrieval_ray.functions.polyhash import poly_hash_np

URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/:?#]+)"
          r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
          r"(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$")
TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid)(=|$)"
# leftmost match is the registrable domain: label + multi-label public
# suffix, else the last two labels (RE2 in both Arrow and DuckDB)
DOMAIN_RE = (r"(?P<dom>[^.]+\.(?:co\.uk|org\.uk|ac\.uk|com\.au|co\.jp|"
             r"com\.br|co\.in|com\.cn)|[^.]+\.[^.]+)$")
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _strip_tracking(query: pa.Array) -> pa.Array:
    """Remove tracking params from each query string (order preserved)."""
    parts = pc.split_pattern(query, "&")
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts)
    keep = pc.invert(pc.match_substring_regex(flat, TRACKING_RE))
    kept = pc.filter(flat, keep).to_numpy(zero_copy_only=False)
    par = pc.filter(parents, keep).to_numpy(zero_copy_only=False)
    counts = np.bincount(par, minlength=len(query))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(kept, pa.string()))
    return pc.binary_join(rebuilt, "&")


def canonicalize(urls) -> dict[str, pa.Array]:
    """{'url': canonical, 'host': lowercased host, 'domain': registrable}.

    Rows that don't parse as ``scheme://host...`` come back null in all
    three arrays (callers decide whether to drop or quarantine them).
    """
    col = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    g = pc.extract_regex(col, URL_RE)
    valid = g.is_valid()
    scheme = pc.utf8_lower(pc.struct_field(g, "scheme"))
    host = pc.utf8_lower(pc.struct_field(g, "host"))
    port = pc.struct_field(g, "port")
    path = pc.struct_field(g, "path")
    query = pc.struct_field(g, "query")

    default_port = pc.if_else(
        pc.equal(scheme, "http"), "80",
        pc.if_else(pc.equal(scheme, "https"), "443", ""))
    # a non-participating optional group extracts as "" (not null) — an
    # absent port must not emit a bare ":"
    port_nonempty = pc.and_(port.is_valid(),
                            pc.invert(pc.equal(pc.fill_null(port, ""), "")))
    keep_port = pc.and_(port_nonempty,
                        pc.invert(pc.equal(port, default_port)))
    port_part = pc.if_else(
        keep_port,
        pc.binary_join_element_wise(":", pc.fill_null(port, ""), ""),
        "")
    path_part = pc.if_else(pc.equal(pc.fill_null(path, ""), ""), "/", path)
    q = _strip_tracking(pc.fill_null(query, ""))
    query_part = pc.if_else(
        pc.equal(q, ""), "",
        pc.binary_join_element_wise("?", q, ""))

    url = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path_part, query_part, "")
    domain = pc.struct_field(pc.extract_regex(host, DOMAIN_RE), "dom")
    null_mask = pc.invert(valid)
    return {
        "url": pc.if_else(null_mask, pa.nulls(len(col), pa.string()), url),
        "host": host,
        "domain": domain,
    }


def add_canonical_urls(batch: pa.Table, url_col: str,
                       out_prefix: str = "canon_") -> pa.Table:
    """Streaming kernel: append canonical url / host / registrable domain."""
    parts = canonicalize(batch[url_col])
    for name in ("url", "host", "domain"):
        batch = batch.append_column(out_prefix + name, parts[name])
    return batch


def domain_stats(ds, url_col: str, num_buckets: int = 64):
    """(domain, n_docs) over the corpus — combiner-first, narrow shuffle.

    Each batch ships one (domain, partial n) row per distinct domain it
    saw; the bucketed fold sums exact counts. Unparseable URLs count under
    the NULL domain (surfaced, not dropped — broken URLs are a data-quality
    signal).
    """
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        dom = canonicalize(batch[url_col])["domain"]
        t = pa.table({"domain": pc.fill_null(dom, "")})
        agg = t.group_by("domain").aggregate([("domain", "count")])
        h = poly_hash_np(agg["domain"].to_pylist(), bits=32)
        return pa.table({
            "domain": agg["domain"],
            "n": agg["domain_count"].cast(pa.int64()),
            "__b": pa.array((h % np.uint64(nb)).astype(np.int32)),
        })

    def fold(group: pa.Table) -> pa.Table:
        agg = group.group_by("domain").aggregate([("n", "sum")])
        return pa.table({"domain": agg["domain"],
                         "n_docs": agg["n_sum"].cast(pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("__b").map_groups(fold, batch_format="pyarrow")
