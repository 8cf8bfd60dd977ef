"""Gopher quality rules (Rae et al. 2021 A1.1): per-rule discrimination,
edge cases, streaming shape."""

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.ops.gopher import (gopher_quality_filter,
                                            gopher_stats,
                                            gopher_stats_batch)

# 12 plain words incl. 2 distinct stop words, all alphabetic, mean len ~4
GOOD_LINE = "the table scans rows and merges them into sorted batches just now"
GOOD_DOC = "\n".join([GOOD_LINE] * 5)  # 60 words


def tbl(rows):
    return pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                     "text": pa.array(rows, pa.string())})


def stats(doc, **rules):
    return gopher_stats_batch(tbl([doc]), **rules).to_pylist()[0]


class TestWordRules:
    def test_good_doc_kept(self):
        s = stats(GOOD_DOC)
        assert s["n_words"] == 60 and s["keep"]

    def test_word_count_bounds(self):
        assert not stats("\n".join([GOOD_LINE] * 4))["keep"]  # 48 < 50
        assert stats(GOOD_DOC, max_words=59)["keep"] is False

    def test_mean_word_length(self):
        s = stats(GOOD_DOC)
        total = sum(len(w) for w in GOOD_DOC.split())
        assert s["mean_word_len"] == round(total / 60, 4)
        # a doc of 1-char words fails the >=3 mean rule
        assert not stats(" ".join(["a"] * 60 + ["the", "of"]))["keep"]

    def test_whitespace_runs_and_empties(self):
        # double spaces / tabs / newlines never create empty words
        s = stats(GOOD_LINE.replace(" ", "  ", 3) + "\t" + GOOD_LINE)
        assert s["n_words"] == 24

    def test_alpha_fraction(self):
        doc = GOOD_DOC + "\n" + " ".join(["123"] * 20)  # 60 alpha, 20 not
        s = stats(doc)
        assert s["alpha_frac"] == 0.75 and not s["keep"]

    def test_stop_word_distinct_count(self):
        # 'the' repeated is ONE distinct stop word
        s = stats(" ".join(["the"] * 25 + ["word"] * 30))
        assert s["n_stop"] == 1 and not s["keep"]
        assert stats(GOOD_DOC)["n_stop"] == 2
        s = stats(GOOD_DOC + "\nof that have with")
        assert s["n_stop"] == 6


class TestSymbolAndLineRules:
    def test_symbol_ratio_hash_and_ellipsis(self):
        doc = GOOD_DOC + "\n" + "# # # # # # #"  # 7 hashes / 67 words
        s = stats(doc)
        assert s["symbol_ratio"] == round(7 / 67, 4) and not s["keep"]
        # non-overlapping '...' count: '....' is ONE occurrence
        s2 = stats(GOOD_DOC + " ....")
        assert s2["symbol_ratio"] == round(1 / 61, 4)

    def test_bullet_fraction(self):
        doc = "\n".join(["• " + GOOD_LINE] * 5)
        s = stats(doc)
        assert s["bullet_frac"] == 1.0 and not s["keep"]
        assert stats("\n".join(["- " + GOOD_LINE] + [GOOD_LINE] * 9))[
            "bullet_frac"] == 0.1

    def test_ellipsis_line_fraction(self):
        doc = "\n".join([GOOD_LINE + "..."] * 2 + [GOOD_LINE] * 3)
        s = stats(doc, max_symbol_ratio=1.0)
        assert s["ellipsis_frac"] == 0.4 and not s["keep"]
        # unicode ellipsis also counts as a line ending (not as a symbol)
        s2 = stats("\n".join([GOOD_LINE + "…"] * 2 + [GOOD_LINE] * 3))
        assert s2["ellipsis_frac"] == 0.4 and s2["symbol_ratio"] == 0.0

    def test_empty_doc_metrics(self):
        s = stats("")
        assert s["n_words"] == 0 and s["mean_word_len"] == 0.0
        assert not s["keep"]


class TestDataset:
    def test_filter_and_partition_invariance(self, ray_session):
        import ray.data
        rows = []
        for i in range(60):
            doc = GOOD_DOC
            if i % 4 == 0:
                doc = "\n".join(["• " + GOOD_LINE] * 5)  # bullets kill it
            if i % 5 == 0:
                doc = GOOD_LINE  # too short
            rows.append(doc)
        t = tbl(rows)
        a = gopher_quality_filter(ray.data.from_arrow(t).repartition(1),
                                  "text").to_pandas()
        b = gopher_quality_filter(ray.data.from_arrow(t).repartition(7),
                                  "text").to_pandas()
        key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
        assert key(a).equals(key(b))
        want = [i for i in range(60) if i % 4 != 0 and i % 5 != 0]
        assert sorted(a["doc_id"]) == want
        # stats variant keeps every row and flags the same set
        s = gopher_stats(ray.data.from_arrow(t), "text").to_pandas()
        assert len(s) == 60
        assert sorted(s[s["keep"]]["doc_id"]) == want

    def test_stats_batch_boundary_invariance(self):
        rows = [GOOD_DOC, "", GOOD_LINE, GOOD_DOC + "\n### ###"]
        whole = gopher_stats_batch(tbl(rows)).to_pylist()
        parts = []
        for r in range(len(rows)):
            parts.extend(gopher_stats_batch(tbl(rows).slice(r, 1)).to_pylist())
        for w, p in zip(whole, parts):
            w.pop("doc_id"), p.pop("doc_id")
            assert w == p
