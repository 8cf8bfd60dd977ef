"""C4-style cleaning pass: line rules, page rules, streaming shape."""

import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops.c4 import c4_filter_batch, c4_quality_filter

GOOD_LINE = "this line has plenty of words and ends well."


def tbl(rows):
    return pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                     "text": pa.array(rows, pa.string())})


class TestLineRules:
    def test_terminal_punct_required(self):
        out = c4_filter_batch(tbl(["\n".join([GOOD_LINE, GOOD_LINE,
                                              "no terminal punctuation here",
                                              GOOD_LINE])]))
        assert out["text"][0].as_py() == "\n".join([GOOD_LINE] * 3)

    def test_min_words_per_line(self):
        out = c4_filter_batch(tbl(["\n".join([GOOD_LINE, "too short.",
                                              GOOD_LINE, GOOD_LINE])]))
        assert out["text"][0].as_py() == "\n".join([GOOD_LINE] * 3)

    def test_all_terminal_punct_variants(self):
        lines = ["does this one count as a sentence?",
                 "yes it certainly does count!",
                 'he said "it ends with a quote"']
        out = c4_filter_batch(tbl(["\n".join(lines)]))
        assert out["text"][0].as_py() == "\n".join(lines)


class TestPageRules:
    def test_min_lines_drops_page(self):
        assert len(c4_filter_batch(tbl(["\n".join([GOOD_LINE, GOOD_LINE])]))) == 0
        assert len(c4_filter_batch(tbl(["\n".join([GOOD_LINE] * 3)]))) == 1

    def test_lorem_ipsum_drops_page_case_insensitive(self):
        doc = "\n".join([GOOD_LINE] * 3 + ["Lorem IPSUM dolor sit amet okay."])
        assert len(c4_filter_batch(tbl([doc]))) == 0

    def test_braces_drop_page_even_on_filtered_line(self):
        # the brace line itself would be dropped by the line rules, but the
        # page rule looks at the ORIGINAL text (C4 semantics)
        doc = "\n".join([GOOD_LINE] * 3 + ["x = {}"])
        assert len(c4_filter_batch(tbl([doc]))) == 0

    def test_custom_badwords(self):
        doc = "\n".join([GOOD_LINE] * 3 + ["the forbidden word appears here."])
        assert len(c4_filter_batch(tbl([doc]), badwords=("forbidden",))) == 0
        assert len(c4_filter_batch(tbl([doc]), badwords=())) == 1


class TestDataset:
    def test_streaming_and_partition_invariance(self, ray_session):
        import ray.data
        rows = []
        for i in range(40):
            lines = [GOOD_LINE] * (i % 5)
            if i % 7 == 0:
                lines.append("lorem ipsum should kill this page fully.")
            rows.append("\n".join(lines) if lines else "")
        t = tbl(rows)
        a = c4_quality_filter(ray.data.from_arrow(t).repartition(1),
                              "text").to_pandas()
        b = c4_quality_filter(ray.data.from_arrow(t).repartition(6),
                              "text").to_pandas()
        key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
        assert key(a).equals(key(b))
        # i%5 in {3,4} gives >=3 good lines; i%7==0 killed by lorem
        want = [i for i in range(40) if i % 5 >= 3 and i % 7 != 0]
        assert sorted(a["doc_id"]) == want
