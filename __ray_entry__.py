"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here calls
ray.init()/ray.shutdown(). Each ``queries()`` callable takes an sf_dir and returns a
pyarrow Table / pandas DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent SQL over
the pre-registered views (documents, events, embeddings). Column names and rounding
match on both sides (scores are float64 computed with the identical formula, rounded
to 4 decimals).

The engine under test is byzer_retrieval_ray: a Ray-Data-native inverted-index +
BM25 engine (see SURVEY.md). BM25 entries run through the real index build
(docstore → posting-run combiner → term-range shuffle → merged skew-balanced
partitions) and the block-max-WAND/TAAT searcher with float64 scoring, which is the
same algorithm as the float32 serving path (both verified rank-identical against the
brute-force oracle in tests/).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from byzer_retrieval_ray import RetrievalCluster, SearchQuery, TableSettings

DOCS_SCHEMA = ("st(field(doc_id,long),field(text,string,analyze),field(lang,string),"
               "field(source,string),field(n_chars,long,sort))")
EVENTS_SCHEMA = ("st(field(event_id,long),field(ts,date,sort),field(user_id,long),"
                 "field(event_type,string),field(value,double,sort),"
                 "field(props,string,no_index))")
DOCSVEC_SCHEMA = ("st(field(doc_id,long),field(text,string,analyze),"
                  "field(lang,string),field(vector,array(float)))")
DOCS2_SCHEMA = ("st(field(doc_id,long),field(title,string,analyze),"
                "field(content,string,analyze),field(lang,string))")

P_DOC = 4      # doc partitions / serving buckets (doc_id % 4 for long keys)
P_TERM = 4     # term-range partitions

_CLUSTERS: dict[tuple[str, str], RetrievalCluster] = {}

# DuckDB fragments shared by the BM25 oracles -------------------------------------
# whitespace tokens, empty-dropped (byte-compatible with WhitespaceAnalyzer)
_SQL_TOKS = """
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
  FROM documents
),
dls AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS dl
  FROM documents
),
stats AS (SELECT count(*) AS n, sum(dl) AS sum_ttf FROM dls),
-- Lucene SmallFloat byte4 quantization: values < 24 exact, else top-4-bit truncation
dlq AS (
  SELECT doc_id, CASE WHEN dl < 24 THEN dl
    ELSE 24 + (CASE WHEN dl - 24 < 8 THEN dl - 24
               ELSE ((dl - 24) >> (length(bin(dl - 24)) - 4)) << (length(bin(dl - 24)) - 4)
               END) END AS dl_q
  FROM dls
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""


def _sql_term_scores(terms: list[str]) -> str:
    """Per-doc summed BM25 (k1=1.2, b=0.75, Lucene quantized dl) for the OR query."""
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
qterms AS (SELECT unnest([{quoted}]) AS term),
scored AS (
  -- Lucene BM25: weight = (k1+1)*idf; score = weight - weight/(1 + tf*normInv);
  -- all arithmetic forced to DOUBLE (e0 literals) to match the engine's float64 path
  SELECT tf.doc_id,
         SUM( (2.2e0 * ln(1.0e0 + (CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5e0)
                                   / (CAST(df.df AS DOUBLE) + 0.5e0)))
              - (2.2e0 * ln(1.0e0 + (CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5e0)
                                     / (CAST(df.df AS DOUBLE) + 0.5e0)))
                / (1.0e0 + CAST(tf.tf AS DOUBLE)
                   * (1.0e0 / (1.2e0 * (0.25e0 + 0.75e0 * CAST(dlq.dl_q AS DOUBLE)
                                         / (CAST(stats.sum_ttf AS DOUBLE) / CAST(stats.n AS DOUBLE)))))) ) AS score
  FROM tf
  JOIN qterms ON tf.term = qterms.term
  JOIN df ON df.term = tf.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
"""


def _docs_cluster(sf_dir: str) -> RetrievalCluster:
    return _get_cluster(sf_dir, "docs", DOCS_SCHEMA, "doc_id",
                        lambda: os.path.join(sf_dir, "documents.parquet"))


def _events_cluster(sf_dir: str) -> RetrievalCluster:
    return _get_cluster(sf_dir, "events", EVENTS_SCHEMA, "event_id",
                        lambda: os.path.join(sf_dir, "events.parquet"))


def _docsvec_cluster(sf_dir: str) -> RetrievalCluster:
    def make_source():
        import ray.data
        import pyarrow.compute as pc_
        d = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text", "lang"]).sort_by("doc_id")
        e = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).sort_by("vec_id")
        # inner join on doc_id == vec_id (matches the oracle SQL's JOIN)
        d = d.filter(pc_.is_in(d["doc_id"], value_set=e["vec_id"].combine_chunks()))
        e = e.filter(pc_.is_in(e["vec_id"], value_set=d["doc_id"].combine_chunks()))
        assert d["doc_id"].to_pylist() == e["vec_id"].to_pylist()
        joined = d.append_column("vector", e["embedding"])
        return ray.data.from_arrow(joined)
    return _get_cluster(sf_dir, "docsvec", DOCSVEC_SCHEMA, "doc_id", make_source)


def _docs2_cluster(sf_dir: str) -> RetrievalCluster:
    """documents split into two analyzed fields: title = first 3 whitespace tokens,
    content = the rest — exercises the multi-field search path (Q1 fields list)."""
    def make_source():
        import ray.data
        d = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text", "lang"])
        texts = d["text"].to_pylist()
        titles = [" ".join(t.split()[:3]) for t in texts]
        contents = [" ".join(t.split()[3:]) for t in texts]
        t = pa.table({"doc_id": d["doc_id"], "title": titles,
                      "content": contents, "lang": d["lang"]})
        return ray.data.from_arrow(t)
    return _get_cluster(sf_dir, "docs2", DOCS2_SCHEMA, "doc_id", make_source)


def _get_cluster(sf_dir: str, table: str, schema: str, key: str, source_fn) -> RetrievalCluster:
    cache_key = (sf_dir, table)
    if cache_key in _CLUSTERS:
        return _CLUSTERS[cache_key]
    tag = hashlib.md5(f"{sf_dir}:{table}:v5".encode()).hexdigest()[:10]
    loc = f"/tmp/byzer_ray_gate/{tag}"
    c = RetrievalCluster(loc)
    try:
        c.manifest("db", table)
        built = c.manifest("db", table).data["generation"] > 0
    except KeyError:
        built = False
    if not built:
        c.create_table(TableSettings("db", table, schema, loc))
        src = source_fn()
        c.build_from_parquet("db", table, src, key_field=key,
                             num_doc_parts=P_DOC, num_term_parts=P_TERM)
    _CLUSTERS[cache_key] = c
    return c


def _search_rows(cluster: RetrievalCluster, table: str, q: SearchQuery) -> pa.Table:
    res = cluster.search("db", table, q, precision="float64", algorithm="bmw")[0]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in res], pa.int64()),
        "score": pa.array(np.round(np.array([r["_score"] for r in res], np.float64), 4)),
    })


# ------------------------------- BM25 entries -------------------------------

def _bm25(sf_dir: str, keyword: str, limit: int, filters: dict | None = None) -> pa.Table:
    c = _docs_cluster(sf_dir)
    q = SearchQuery("db", "docs", filters=filters or {}, keyword=keyword,
                    fields=["text"], limit=limit)
    return _search_rows(c, "docs", q)


def _sql_bm25(terms: list[str], limit: int, candidates_sql: str | None = None) -> str:
    """Top-limit by (score desc, doc_id). candidates_sql: SQL producing candidate
    doc_ids (filter semantics: zero-score candidates included)."""
    base = "WITH " + _SQL_TOKS + ", " + _sql_term_scores(terms)
    if candidates_sql is None:
        return base + f"""
SELECT doc_id, ROUND(score, 4) AS score FROM scored
ORDER BY score DESC, doc_id LIMIT {limit}"""
    return base + f""",
cand AS ({candidates_sql})
SELECT cand.doc_id AS doc_id, ROUND(COALESCE(scored.score, 0.0), 4) AS score
FROM cand LEFT JOIN scored ON scored.doc_id = cand.doc_id
ORDER BY score DESC, doc_id LIMIT {limit}"""


# ------------------------------- entry/queries -------------------------------

def entry() -> Any:
    """Flagship: build the sf0.001 documents index end-to-end (docstore → posting
    runs → term-range shuffle → merged partitions) and run the reference-shaped
    query set through block-max WAND."""
    sf = "/root/testdata/sf0.001"
    c = _docs_cluster(sf)
    out = []
    for kw in ("the", "merge sort", "scan join order", "*"):
        t = _bm25(sf, kw, 10)
        out.append(t.append_column("keyword", pa.array([kw] * len(t))))
    return pa.concat_tables(out)


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}

    # --- BM25 search (Q1/Q5): single/multi/absent term, match-all ---
    q["bm25_single_term"] = lambda sf: _bm25(sf, "merge", 10)
    q["bm25_multi_term"] = lambda sf: _bm25(sf, "scan join order sort", 20)
    q["bm25_absent_term"] = lambda sf: _bm25(sf, "zzz_not_a_term", 10)
    q["match_all"] = lambda sf: _bm25(sf, "*", 50)

    # --- filters (Q3): exact / nested and-or / range, incl. zero-score fill ---
    q["bm25_filter_lang"] = lambda sf: _bm25(
        sf, "merge sort", 1000, {"and": [{"field": "lang", "value": "en"}]})
    q["bm25_filter_nested"] = lambda sf: _bm25(
        sf, "data", 100,
        {"and": [{"field": "lang", "value": "en"},
                 {"or": [{"field": "source", "value": "src0"},
                         {"field": "source", "value": "src1"}]}]})
    q["bm25_filter_range"] = lambda sf: _bm25(
        sf, "the", 50, {"and": [{"field": "n_chars", "min": 100, "max": 300}]})

    # --- unscored filter op with sorts (Q4) over documents and events ---
    def filter_sort_docs(sf):
        c = _docs_cluster(sf)
        rows = c.filter("db", "docs", {
            "filters": {"and": [{"field": "lang", "value": "zh"}]},
            "sorts": [{"n_chars": "desc"}], "limit": 100})[0]
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "lang": pa.array([r["lang"] for r in rows]),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        })
    q["filter_sort_docs"] = filter_sort_docs

    def filter_events(sf):
        c = _events_cluster(sf)
        rows = c.filter("db", "events", {
            "filters": {"and": [{"field": "event_type", "value": "click"},
                                {"field": "value", "min": 10.0}]},
            "sorts": [{"ts": "desc"}], "limit": 100})[0]
        return pa.table({
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "value": pa.array([round(r["value"], 4) for r in rows], pa.float64()),
        })
    q["filter_events"] = filter_events

    # --- vector KNN (Q2) and hybrid RRF (Q6/Q7) ---
    def _query_vector(sf, vid=7):
        t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        row = t.filter(pa.compute.equal(t["vec_id"], vid))
        return list(row["embedding"][0].as_py())

    def vector_knn(sf):
        c = _docsvec_cluster(sf)
        qq = SearchQuery("db", "docsvec", vector=_query_vector(sf),
                         vectorField="vector", limit=10)
        return _search_rows(c, "docsvec", qq)
    q["vector_knn"] = vector_knn

    def hybrid_rrf(sf):
        c = _docsvec_cluster(sf)
        qq = SearchQuery("db", "docsvec", keyword="merge sort", fields=["text"],
                         vector=_query_vector(sf), vectorField="vector", limit=10)
        return _search_rows(c, "docsvec", qq)
    q["hybrid_rrf"] = hybrid_rrf

    # --- multi-field search (fields list, per-field stats) ---
    def bm25_multi_field(sf):
        c = _docs2_cluster(sf)
        qq = SearchQuery("db", "docs2", keyword="merge sort", fields=["title", "content"],
                         limit=20)
        return _search_rows(c, "docs2", qq)
    q["bm25_multi_field"] = bm25_multi_field

    # --- full scan export (S5/S6: iterateAllDocs / Arrow batch export) ---
    def full_scan(sf):
        c = _docs_cluster(sf)
        df = c.scan_table("db", "docs").to_pandas()
        df = df.sort_values("doc_id").reset_index(drop=True)
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "text": pa.array(df["text"], pa.string()),
            "lang": pa.array(df["lang"], pa.string()),
            "source": pa.array(df["source"], pa.string()),
            "n_chars": pa.array(df["n_chars"], pa.int64()),
        })
    q["full_scan"] = full_scan

    # --- aggregations over the index (term stats, collection stats) ---
    def term_df(sf):
        c = _docs_cluster(sf)
        info = c.manifest("db", "docs").current_gen_info()
        tbls = [pq.read_table(m["termstats_path"])
                for m in info["postings"].values()
                if os.path.exists(m["termstats_path"])]
        t = pa.concat_tables(tbls)
        t = t.sort_by([("df", "descending"), ("term", "ascending")]).slice(0, 20)
        return t.select(["term", "df", "ttf"]).cast(pa.schema([
            ("term", pa.string()), ("df", pa.int64()), ("ttf", pa.int64())]))
    q["term_df"] = term_df

    def collection_stats(sf):
        c = _docs_cluster(sf)
        s = c.manifest("db", "docs").current_gen_info()["stats"]
        return pa.table({"n_docs": pa.array([s["n_docs"]], pa.int64()),
                         "sum_ttf": pa.array([s["fields"]["text"]["sum_ttf"]], pa.int64())})
    q["collection_stats"] = collection_stats

    # --- dedup family ---
    def dedup_exact(sf):
        import ray.data
        from byzer_retrieval_ray.ops.dedup import exact_dedup
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = exact_dedup(ds, "text", "doc_id").to_pandas()
        return pa.table({"doc_id": pa.array(sorted(out["doc_id"]), pa.int64())})
    q["dedup_exact"] = dedup_exact

    def dedup_minhash(sf):
        import ray.data
        from byzer_retrieval_ray.ops.dedup import minhash_lsh_dedup
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = minhash_lsh_dedup(ds, "text", "doc_id", num_perm=64, bands=16,
                                shingle_k=3, jaccard=0.9).to_pandas()
        out = out.sort_values(["id", "dup_of"]).reset_index(drop=True)
        return pa.table({"id": pa.array(out["id"], pa.int64()),
                         "dup_of": pa.array(out["dup_of"], pa.int64())})
    q["dedup_minhash"] = dedup_minhash

    def dedup_simhash(sf):
        import ray.data
        from byzer_retrieval_ray.ops.dedup import simhash_dedup
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = simhash_dedup(ds, "text", "doc_id").to_pandas()
        ids = sorted(out["id"]) if "id" in out.columns else []
        return pa.table({"id": pa.array(ids, pa.int64())})
    q["dedup_simhash"] = dedup_simhash

    def dedup_embedding(sf):
        import ray.data
        from byzer_retrieval_ray.ops.dedup import embedding_dedup
        ds = ray.data.read_parquet(os.path.join(sf, "embeddings.parquet"))
        out = embedding_dedup(ds, "embedding", "vec_id", threshold=0.99).to_pandas()
        if "id" not in out.columns:
            return pa.table({"id": pa.array([], pa.int64()),
                             "dup_of": pa.array([], pa.int64())})
        out = out.sort_values(["id", "dup_of"]).reset_index(drop=True)
        return pa.table({"id": pa.array(out["id"], pa.int64()),
                         "dup_of": pa.array(out["dup_of"], pa.int64())})
    q["dedup_embedding"] = dedup_embedding

    # --- similarity search over embeddings ---
    def ann_bruteforce(sf):
        import ray.data
        from byzer_retrieval_ray.ops.ann import brute_force_topk
        t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qs = np.stack([np.asarray(t["embedding"][i].as_py(), dtype=np.float64)
                       for i in range(3)])
        ds = ray.data.read_parquet(os.path.join(sf, "embeddings.parquet"))
        out = brute_force_topk(ds, "embedding", "vec_id", qs, k=5)
        return pa.table({
            "query_id": pa.array(out["query_id"].astype(np.int32)),
            "vec_id": pa.array(out["id"], pa.int64()),
            "score": pa.array(np.round(out["score"].to_numpy(), 4), pa.float64()),
        })
    q["ann_bruteforce"] = ann_bruteforce

    def ann_ivf(sf):
        import ray.data
        from byzer_retrieval_ray.ops.ann import ivf_topk
        t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
        qs = np.stack([np.asarray(t["embedding"][i].as_py(), dtype=np.float64)
                       for i in range(3)])
        ds = ray.data.read_parquet(os.path.join(sf, "embeddings.parquet"))
        out = ivf_topk(ds, "embedding", "vec_id", qs, k=5, n_centroids=8, nprobe=4)
        return pa.table({
            "query_id": pa.array(out["query_id"].astype(np.int32)),
            "vec_id": pa.array(out["id"], pa.int64()),
            "score": pa.array(np.round(out["score"].to_numpy(), 4), pa.float64()),
        })
    q["ann_ivf"] = ann_ivf

    # --- text analysis ---
    def token_counts(sf):
        import ray.data
        from byzer_retrieval_ray.ops.text import add_token_counts
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = ds.map_batches(add_token_counts, batch_format="pyarrow") \
                .select_columns(["doc_id", "n_tokens"]).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "n_tokens": pa.array(out["n_tokens"], pa.int64())})
    q["token_counts"] = token_counts

    def lang_id(sf):
        import ray.data
        from byzer_retrieval_ray.ops.text import LangId
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = ds.map_batches(LangId(), batch_format="pyarrow", batch_size=256,
                             concurrency=2) \
                .select_columns(["doc_id", "lang_pred"]).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)
    q["lang_id"] = lang_id

    def quality(sf):
        import ray.data
        from byzer_retrieval_ray.ops.text import QualityScorer
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = ds.map_batches(QualityScorer(), batch_format="pyarrow", batch_size=256,
                             concurrency=2) \
                .select_columns(["doc_id", "quality"]).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        out["quality"] = np.round(out["quality"].to_numpy(), 4)
        return pa.Table.from_pandas(out, preserve_index=False)
    q["quality_score"] = quality

    def fingerprints(sf):
        import ray.data
        from byzer_retrieval_ray.ops.text import add_fingerprints
        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])
        out = ds.map_batches(add_fingerprints, batch_format="pyarrow") \
                .select_columns(["doc_id"]).to_pandas()
        return pa.table({"doc_id": pa.array(sorted(out["doc_id"]), pa.int64())})
    q["fingerprint"] = fingerprints

    # --- grouped top-k (per-group sort inside map_groups) ---
    def top_docs_per_lang(sf):
        import ray.data

        def topk(group: pa.Table) -> pa.Table:
            g = group.sort_by([("n_chars", "descending"), ("doc_id", "ascending")])
            return g.slice(0, 3)

        ds = ray.data.read_parquet(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "lang", "n_chars"])
        out = ds.groupby("lang").map_groups(topk, batch_format="pyarrow").to_pandas()
        out = out.sort_values(["lang", "doc_id"]).reset_index(drop=True)
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        })
    q["top_docs_per_lang"] = top_docs_per_lang

    # --- windowed aggregate over the event stream (tumbling 1h, combiner) ---
    def events_window(sf):
        import ray.data
        from byzer_retrieval_ray.ops.windows import tumbling_window_agg
        ds = ray.data.read_parquet(os.path.join(sf, "events.parquet"),
                                   columns=["ts", "event_type", "value"])
        out = tumbling_window_agg(ds, "ts", "event_type", "value", 3600).to_pandas()
        out = out.sort_values(["key", "window_start"]).reset_index(drop=True)
        return pa.table({
            "key": pa.array(out["key"], pa.string()),
            "window_start": pa.array(out["window_start"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
            "sum_v": pa.array(np.round(out["sum_v"].to_numpy(), 3), pa.float64()),
            "min_v": pa.array(np.round(out["min_v"].to_numpy(), 6), pa.float64()),
            "max_v": pa.array(np.round(out["max_v"].to_numpy(), 6), pa.float64()),
        })
    q["events_window"] = events_window

    # --- multimodal plumbing (stubbed decode, real Ray plumbing) ---
    def multimodal_image(sf):
        import ray.data
        from byzer_retrieval_ray.ops.multimodal import ImageDecode, synth_media_table
        ds = ray.data.from_arrow(synth_media_table(64, "image"))
        out = ds.map_batches(ImageDecode(fake=True), batch_format="pyarrow",
                             batch_size=16, concurrency=2).to_pandas()
        return pa.table({"media_id": pa.array(sorted(out["media_id"]), pa.int64())})
    q["multimodal_image"] = multimodal_image

    return q


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["bm25_single_term"] = _sql_bm25(["merge"], 10)
    sql["bm25_multi_term"] = _sql_bm25(["scan", "join", "order", "sort"], 20)
    sql["bm25_absent_term"] = _sql_bm25(["zzz_not_a_term"], 10)
    sql["match_all"] = ("SELECT doc_id, 1.0e0 AS score FROM documents "
                        "ORDER BY doc_id LIMIT 50")

    sql["bm25_filter_lang"] = _sql_bm25(
        ["merge", "sort"], 1000, "SELECT doc_id FROM documents WHERE lang = 'en'")
    sql["bm25_filter_nested"] = _sql_bm25(
        ["data"], 100,
        "SELECT doc_id FROM documents WHERE lang = 'en' AND (source = 'src0' OR source = 'src1')")
    sql["bm25_filter_range"] = _sql_bm25(
        ["the"], 50, "SELECT doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300")

    sql["filter_sort_docs"] = """
SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'zh'
ORDER BY n_chars DESC, doc_id LIMIT 100"""
    sql["filter_events"] = """
SELECT event_id, user_id, ROUND(value, 4) AS value FROM events
WHERE event_type = 'click' AND value >= 10.0
ORDER BY ts DESC, event_id LIMIT 100"""

    _vec = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 7)"
    sql["vector_knn"] = f"""
WITH vec AS (
  SELECT d.doc_id AS doc_id,
         (1.0e0 + list_cosine_similarity(e.embedding::DOUBLE[], {_vec})) / 2.0e0 AS score
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT doc_id, ROUND(score, 4) AS score FROM vec ORDER BY score DESC, doc_id LIMIT 10"""

    sql["hybrid_rrf"] = f"""
WITH {_SQL_TOKS}, {_sql_term_scores(["merge", "sort"])},
kwb AS (SELECT s.doc_id, s.score, s.doc_id % {P_DOC} AS b
        FROM scored s JOIN embeddings e ON s.doc_id = e.vec_id),
kwt AS (SELECT doc_id, score FROM (
          SELECT *, row_number() OVER (PARTITION BY b ORDER BY score DESC, doc_id) rn
          FROM kwb) WHERE rn <= 10),
kwr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) - 1 AS r FROM kwt),
vec AS (SELECT d.doc_id AS doc_id,
               (1.0e0 + list_cosine_similarity(e.embedding::DOUBLE[], {_vec})) / 2.0e0 AS score,
               d.doc_id % {P_DOC} AS b
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
vet AS (SELECT doc_id, score FROM (
          SELECT *, row_number() OVER (PARTITION BY b ORDER BY score DESC, doc_id) rn
          FROM vec) WHERE rn <= 10),
ver AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) - 1 AS r FROM vet),
fused AS (SELECT doc_id, SUM(1.0e0 / (CAST(r AS DOUBLE) + 60.0e0)) AS score
          FROM (SELECT * FROM kwr UNION ALL SELECT * FROM ver) GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score FROM fused ORDER BY score DESC, doc_id LIMIT 10"""

    sql["bm25_multi_field"] = """
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS all_toks
  FROM documents
),
flds AS (
  SELECT doc_id, 'title' AS fld, list_slice(all_toks, 1, 3) AS toks FROM base
  UNION ALL
  SELECT doc_id, 'content' AS fld, list_slice(all_toks, 4, len(all_toks)) AS toks FROM base
),
toks AS (SELECT doc_id, fld, unnest(toks) AS term FROM flds),
dls AS (SELECT doc_id, fld, len(toks) AS dl FROM flds),
stats AS (SELECT fld, count(*) AS n, sum(dl) AS sum_ttf FROM dls GROUP BY fld),
dlq AS (
  SELECT doc_id, fld, CASE WHEN dl < 24 THEN dl
    ELSE 24 + (CASE WHEN dl - 24 < 8 THEN dl - 24
               ELSE ((dl - 24) >> (length(bin(dl - 24)) - 4)) << (length(bin(dl - 24)) - 4)
               END) END AS dl_q
  FROM dls
),
tf AS (SELECT doc_id, fld, term, count(*) AS tf FROM toks GROUP BY doc_id, fld, term),
df AS (SELECT fld, term, count(*) AS df FROM tf GROUP BY fld, term),
qterms AS (SELECT unnest(['merge', 'sort']) AS term),
scored AS (
  SELECT tf.doc_id,
         SUM( (2.2e0 * ln(1.0e0 + (CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5e0)
                                   / (CAST(df.df AS DOUBLE) + 0.5e0)))
              - (2.2e0 * ln(1.0e0 + (CAST(stats.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5e0)
                                     / (CAST(df.df AS DOUBLE) + 0.5e0)))
                / (1.0e0 + CAST(tf.tf AS DOUBLE)
                   * (1.0e0 / (1.2e0 * (0.25e0 + 0.75e0 * CAST(dlq.dl_q AS DOUBLE)
                                         / (CAST(stats.sum_ttf AS DOUBLE) / CAST(stats.n AS DOUBLE)))))) ) AS score
  FROM tf
  JOIN qterms ON tf.term = qterms.term
  JOIN df ON df.fld = tf.fld AND df.term = tf.term
  JOIN dlq ON dlq.doc_id = tf.doc_id AND dlq.fld = tf.fld
  JOIN stats ON stats.fld = tf.fld
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score FROM scored
ORDER BY score DESC, doc_id LIMIT 20"""

    sql["full_scan"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"""

    sql["term_df"] = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS term
  FROM documents
)
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf FROM toks
GROUP BY term ORDER BY df DESC, term LIMIT 20"""

    sql["collection_stats"] = """
SELECT count(*) AS n_docs,
       CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS sum_ttf
FROM documents"""

    sql["dedup_exact"] = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1 ORDER BY doc_id"""

    sql["ann_bruteforce"] = """
WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
sims AS (
  SELECT CAST(qs.query_id AS INTEGER) AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], qs.qv) AS score
  FROM embeddings e CROSS JOIN qs
)
SELECT query_id, vec_id, ROUND(score, 4) AS score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) rn
  FROM sims) WHERE rn <= 5"""

    sql["top_docs_per_lang"] = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 3 ORDER BY lang, doc_id"""

    sql["events_window"] = """
SELECT event_type AS key,
       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
       count(*) AS n,
       ROUND(SUM(value), 3) AS sum_v,
       ROUND(MIN(value), 6) AS min_v,
       ROUND(MAX(value), 6) AS max_v
FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

    sql["token_counts"] = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens
FROM documents ORDER BY doc_id"""

    # rows-only entries (non-SQL-expressible: sketches/heuristics/approx/actor stubs):
    # dedup_minhash, dedup_simhash, dedup_embedding, ann_ivf, lang_id, quality_score,
    # fingerprint, multimodal_image
    return sql
