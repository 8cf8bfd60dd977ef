"""Training-data ops: dedup family, ANN, text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from byzer_retrieval_ray.ops import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def ray_mod(ray_session):
    import ray.data
    return ray.data


class TestExactDedup:
    def test_keeps_min_id_per_text(self, ray_mod):
        rows = [{"id": i, "text": f"doc {i % 7} body"} for i in range(30)]
        ds = ray_mod.from_items(rows)
        out = dedup.exact_dedup(ds, "text", "id").to_pandas()
        assert sorted(out["id"]) == list(range(7))


class TestLineDedup:
    DOCS = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            "cookie banner\nunique one\nfooter",
            "cookie banner\nunique two\nfooter",
            "cookie banner\nfooter",          # fully boilerplate -> dropped
            "unique one\nx",                  # 'unique one' first seen in doc 1
            "\nshort\n",                      # empty lines exempt (min_chars=1)
        ],
        "lang": ["en"] * 5,
    })

    def expected(self):
        return {1: "cookie banner\nunique one\nfooter",
                2: "unique two", 4: "x", 5: "\nshort\n"}

    def test_first_occurrence_wins_and_empty_docs_drop(self, ray_mod):
        out = dedup.line_dedup(ray_mod.from_arrow(self.DOCS), "text",
                               "doc_id").to_pandas()
        got = dict(zip(out["doc_id"], out["text"]))
        assert got == self.expected()
        assert list(out.columns) == ["doc_id", "text", "lang"]

    def test_antijoin_fallback_identical(self, ray_mod):
        a = dedup.line_dedup(ray_mod.from_arrow(self.DOCS), "text",
                             "doc_id").to_pandas().sort_values("doc_id")
        b = dedup.line_dedup(ray_mod.from_arrow(self.DOCS), "text", "doc_id",
                             broadcast_limit=0).to_pandas().sort_values("doc_id")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))

    def test_partitioning_invariance(self, ray_mod):
        big = pa.concat_tables([self.DOCS.set_column(
            0, "doc_id", pa.array([i * 10 + d for d in range(1, 6)], pa.int64()))
            for i in range(8)])
        one = dedup.line_dedup(ray_mod.from_arrow(big).repartition(1),
                               "text", "doc_id").to_pandas()
        many = dedup.line_dedup(ray_mod.from_arrow(big).repartition(7),
                                "text", "doc_id").to_pandas()
        key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
        assert key(one).equals(key(many))

    def test_min_chars_exempts_short_lines(self, ray_mod):
        docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": ["ab\nlong shared line",
                                  "ab\nlong shared line\ntail"]})
        out = dedup.line_dedup(ray_mod.from_arrow(docs), "text", "doc_id",
                               min_chars=3).to_pandas()
        got = dict(zip(out["doc_id"], out["text"]))
        # 'ab' (< 3 chars) survives in both docs; the long line dedups
        assert got == {1: "ab\nlong shared line", 2: "ab\ntail"}

    def test_string_ids(self, ray_mod):
        docs = pa.table({"k": ["a", "b"], "text": ["dup line\nown a",
                                                   "dup line\nown b"]})
        out = dedup.line_dedup(ray_mod.from_arrow(docs), "text", "k").to_pandas()
        got = dict(zip(out["k"], out["text"]))
        assert got == {"a": "dup line\nown a", "b": "own b"}


class TestMinHash:
    def test_detects_planted_near_dups(self, ray_mod):
        rng = np.random.default_rng(0)
        vocab = [f"w{i}" for i in range(500)]
        base = [" ".join(rng.choice(vocab, 60)) for _ in range(20)]
        rows = [{"id": i, "text": t} for i, t in enumerate(base)]
        # planted near-dups: copy of doc 0 and doc 5 with one word changed
        for j, src in enumerate((0, 5)):
            toks = base[src].split()
            toks[3] = "CHANGED"
            rows.append({"id": 100 + j, "text": " ".join(toks)})
        ds = ray_mod.from_items(rows)
        out = dedup.minhash_lsh_dedup(ds, "text", "id", num_perm=64, bands=16,
                                      shingle_k=3, jaccard=0.5).to_pandas()
        got = dict(zip(out["id"], out["dup_of"]))
        assert got.get(100) == 0
        assert got.get(101) == 5
        # unrelated docs are not flagged
        assert not (set(got) & set(range(20)))

    def test_jaccard_kernel(self):
        assert dedup.ngram_jaccard("a b c d e", "a b c d e") == 1.0
        assert dedup.ngram_jaccard("a b c d e", "x y z w v") == 0.0

    def test_high_dup_rate_corpus_verifies_in_cluster(self, ray_mod):
        # 50 %-duplicate corpus (the common 100 TB shape): pass-2 verification
        # runs as bucketed group passes — correctness must hold when the
        # candidate set is corpus-scale
        rng = np.random.default_rng(4)
        vocab = [f"w{i}" for i in range(800)]
        n_base = 300
        base = [" ".join(rng.choice(vocab, 40)) for _ in range(n_base)]
        rows = [{"id": i, "text": t} for i, t in enumerate(base)]
        for i in range(n_base):          # one near-copy per base doc
            toks = base[i].split()
            toks[5] = "MUT"
            rows.append({"id": 1000 + i, "text": " ".join(toks)})
        ds = ray_mod.from_items(rows)
        out = dedup.minhash_lsh_dedup(ds, "text", "id", num_perm=64, bands=16,
                                      shingle_k=3, jaccard=0.5).to_pandas()
        got = dict(zip(out["id"], out["dup_of"]))
        hit = sum(1 for i in range(n_base) if got.get(1000 + i) == i)
        assert hit >= 0.9 * n_base          # LSH recall on 1-word mutations
        assert not (set(got) & set(range(n_base)))   # originals never dropped


class TestNgramJaccard:
    def test_exact_and_truncated_copies(self, ray_mod):
        rng = np.random.default_rng(2)
        vocab = [f"w{i}" for i in range(600)]
        base = [" ".join(rng.choice(vocab, 50)) for _ in range(25)]
        rows = [{"id": i, "text": t} for i, t in enumerate(base)]
        rows.append({"id": 100, "text": base[3]})                       # J = 1
        rows.append({"id": 101, "text": " ".join(base[7].split()[:40])})  # J ≈ 0.8
        ds = ray_mod.from_items(rows)
        out = dedup.ngram_jaccard_dedup(ds, "text", "id", threshold=0.6).to_pandas()
        got = dict(zip(out["id"], out["dup_of"]))
        assert got == {100: 3, 101: 7}

    def test_matches_bruteforce_at_any_threshold(self, ray_mod):
        """Full recall: the prefix-filtered join equals the brute-force
        all-pairs definition dup_of = min{j < i : J(S_i,S_j) >= t}."""
        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(200)]
        texts = []
        for b in [list(rng.choice(vocab, 30)) for _ in range(8)]:
            texts.append(" ".join(b))
            for _ in range(5):            # variants spanning J ≈ 0.1 … 1.0
                toks = list(b)
                mode = rng.integers(0, 3)
                if mode == 0:
                    toks = toks[: rng.integers(5, 31)]
                elif mode == 1:
                    for p in rng.choice(30, rng.integers(1, 9), replace=False):
                        toks[p] = str(rng.choice(vocab))
                else:
                    toks = toks[rng.integers(0, 12):]
                texts.append(" ".join(toks))
        ids = list(range(len(texts)))
        for t in (0.3, 0.5, 0.8, 1.0):
            sets = []
            for s in texts:
                f, o = dedup._distinct_shingles(np.array([s], object), 3)
                sets.append(set(f.tolist()))
            expect = {}
            for i in range(len(ids)):
                for j in range(i):
                    u = sets[i] | sets[j]
                    if u and len(sets[i] & sets[j]) / len(u) >= t:
                        expect[i] = j
                        break
            ds = ray_mod.from_items(
                [{"id": i, "text": s} for i, s in zip(ids, texts)])
            out = dedup.ngram_jaccard_dedup(ds, "text", "id", threshold=t,
                                            shingle_k=3).to_pandas()
            got = dict(zip(out["id"], out["dup_of"])) if len(out) else {}
            assert got == expect, f"threshold {t}"
            if t <= 0.5:
                assert expect, "corpus must produce real matches"

    def test_threshold_boundary_exact(self, ray_mod):
        # shingle_k=1: sets {a,b,c} vs {a,b,d} → J = 2/4 = 0.5 exactly
        ds = ray_mod.from_items([{"id": 1, "text": "a b c"},
                                 {"id": 2, "text": "a b d"}])
        hit = dedup.ngram_jaccard_dedup(ds, "text", "id", threshold=0.5,
                                        shingle_k=1).to_pandas()
        assert dict(zip(hit["id"], hit["dup_of"])) == {2: 1}
        miss = dedup.ngram_jaccard_dedup(ds, "text", "id", threshold=0.51,
                                         shingle_k=1).to_pandas()
        assert len(miss) == 0

    def test_empty_and_short_docs(self, ray_mod):
        ds = ray_mod.from_items([{"id": 1, "text": ""}, {"id": 2, "text": ""},
                                 {"id": 3, "text": "xy"}, {"id": 4, "text": "xy"}])
        out = dedup.ngram_jaccard_dedup(ds, "text", "id", threshold=0.9).to_pandas()
        # empty docs never match; sub-k docs fold to a single shingle and do
        assert dict(zip(out["id"], out["dup_of"])) == {4: 3}

    def test_distinct_shingles_sorted_unique(self):
        texts = np.array(["a b c d e", "a a a a", "", "x y"], dtype=object)
        f, o = dedup._distinct_shingles(texts, 3)
        lens = list(np.diff(o))
        assert lens == [3, 1, 0, 1]      # dups collapse; sub-k folds to one
        assert all(np.all(np.diff(f[o[i]:o[i + 1]].astype(np.int64)) > 0)
                   for i in range(4))    # ascending within each doc


class TestSimHash:
    def test_exact_copies_collide(self, ray_mod):
        rows = [{"id": i, "text": f"unique text number {i} with words"} for i in range(10)]
        rows.append({"id": 99, "text": rows[4]["text"]})
        ds = ray_mod.from_items(rows)
        out = dedup.simhash_dedup(ds, "text", "id").to_pandas()
        assert list(out["id"]) == [99]

    def test_simhash_locality(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        toks = a.split()
        toks[7] = "cat"
        b = " ".join(toks)
        ha, hb = dedup.simhash_values(np.array([a, b], dtype=object))
        ham = bin(int(ha) ^ int(hb)).count("1")
        assert ham <= 16  # near-identical docs → small hamming distance


class TestEmbeddingDedup:
    def test_cosine_neardup(self, ray_mod):
        rng = np.random.default_rng(1)
        vecs = rng.standard_normal((40, 16))
        vecs[30] = vecs[3] + 1e-3 * rng.standard_normal(16)  # planted near-dup
        rows = [{"id": i, "emb": vecs[i].astype(np.float32).tolist()} for i in range(40)]
        ds = ray_mod.from_items(rows)
        out = dedup.embedding_dedup(ds, "emb", "id", threshold=0.98).to_pandas()
        got = dict(zip(out["id"], out["dup_of"]))
        assert got.get(30) == 3


class TestANN:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_mod):
        return ray_mod.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_brute_force_matches_numpy(self, emb_ds):
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        queries = mat[:3]
        got = ann.brute_force_topk(emb_ds, "embedding", "vec_id", queries, k=5)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        sims = matn @ qn.T
        for qi in range(3):
            order = np.lexsort((ids, -sims[:, qi]))[:5]
            g = got[got.query_id == qi]
            assert list(g["id"]) == list(ids[order])
            np.testing.assert_allclose(g["score"].to_numpy(), sims[order, qi], rtol=1e-9)

    def test_ivf_recall(self, emb_ds):
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        queries = mat[10:13]
        exact = ann.brute_force_topk(emb_ds, "embedding", "vec_id", queries, k=10)
        approx = ann.ivf_topk(emb_ds, "embedding", "vec_id", queries, k=10,
                              n_centroids=8, nprobe=4)
        recalls = []
        for qi in range(3):
            e = set(exact[exact.query_id == qi]["id"])
            a = set(approx[approx.query_id == qi]["id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.6  # nprobe=half the cells → decent recall

    def _clustered_ds(self, ray_mod, n=4000, cells=64, dim=16, seed=11):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((cells, dim))
        assign = rng.integers(0, cells, n)
        mat = centers[assign] + 0.05 * rng.standard_normal((n, dim))
        mat[:, 0] = np.arange(n)   # component 0 encodes the row id (spread test)
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(mat.astype(np.float32).tolist(),
                                  pa.list_(pa.float32(), dim)),
        })
        return ray_mod.from_arrow(t), mat

    def test_ivf_sqrtn_codebook_at_scale(self, ray_mod):
        # 10× corpus: sqrt(n) auto codebook, nprobe << cells, one distributed
        # refinement pass — recall@10 stays high on clustered embeddings
        ds, mat = self._clustered_ds(ray_mod)
        queries = mat[[5, 500, 1500, 3999]]
        exact = ann.brute_force_topk(ds, "embedding", "vec_id", queries, k=10)
        approx = ann.ivf_topk(ds, "embedding", "vec_id", queries, k=10,
                              n_centroids=None, nprobe=8, sample_size=None,
                              refine_iters=1)
        recalls = []
        for qi in range(4):
            e = set(exact[exact.query_id == qi]["id"])
            a = set(approx[approx.query_id == qi]["id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.8, recalls

    def test_sample_vectors_spreads_over_blocks(self, ray_mod):
        # a ds.limit()-style sample sees only the first blocks; the hash-spread
        # sample must cover head AND tail of the id range
        ds, _ = self._clustered_ds(ray_mod)
        sample = ann.sample_vectors(ds, "embedding", "vec_id", 256)
        ids = np.sort(sample[:, 0])
        assert 64 <= len(ids) <= 1024          # roughly the requested size
        assert ids.min() < 1000 and ids.max() > 3000

    def test_refine_codebook_moves_centroids(self, ray_mod):
        ds, mat = self._clustered_ds(ray_mod, n=1000, cells=16)
        sample = ann.sample_vectors(ds, "embedding", "vec_id", 128)
        cent0 = ann.train_codebook(sample, 16)
        cent1 = ann.refine_codebook(ds, "embedding", cent0, iters=1)
        assert cent1.shape == cent0.shape
        # refined centroids stay unit-norm and reflect the full dataset
        np.testing.assert_allclose(np.linalg.norm(cent1, axis=1), 1.0, rtol=1e-9)
        assert not np.allclose(cent0, cent1)


class TestTextOps:
    def test_token_counts(self):
        t = pa.table({"text": ["hello world", "a b  c", ""]})
        out = text.add_token_counts(t)
        assert out["n_tokens"].to_pylist() == [2, 3, 0]
        assert out["n_bpe_tokens"].to_pylist()[0] >= 2

    def test_quality_scorer(self):
        t = pa.table({"text": [
            "the cat sat on the mat and it was a good day for everyone involved",
            "!!! ??? ### $$$ %%%",
        ]})
        out = text.QualityScorer()(t)
        q = out["quality"].to_pylist()
        assert q[0] > q[1]

    def test_lang_id(self):
        t = pa.table({"text": [
            "the cat is on the mat and it is a fine day",
            "der hund ist nicht mit der katze und das ist gut",
            "el perro es de la casa y los gatos en el patio",
            "这是一个中文文档的例子 其中包含很多汉字",
        ]})
        out = text.LangId()(t)
        assert out["lang_pred"].to_pylist() == ["en", "de", "es", "zh"]

    def test_fingerprint_overlap(self):
        a = " ".join(f"tok{i}" for i in range(100))
        b = " ".join(f"tok{i}" for i in range(50, 150))   # 50-token shared passage
        c = " ".join(f"other{i}" for i in range(100))
        fa, fb, fc = text.rolling_fingerprint(np.array([a, b, c], dtype=object))
        assert set(fa) & set(fb)          # shared passage → shared fingerprints
        assert not (set(fa) & set(fc))    # disjoint text → disjoint fingerprints


class TestMultimodal:
    def test_image_pipeline_plumbing(self, ray_mod):
        t = multimodal.synth_media_table(32, "image")
        ds = ray_mod.from_arrow(t)
        out = ds.map_batches(multimodal.ImageDecode(fake=True), batch_format="pyarrow",
                             batch_size=8, concurrency=2).to_pandas()
        assert len(out) == 32 and "channel_mean" in out
        out2 = ds.map_batches(multimodal.ImageResize(fake=True), batch_format="pyarrow",
                              batch_size=8, concurrency=2).to_pandas()
        assert len(out2["image_embedding"].iloc[0]) == 64

    def test_real_decode_raises(self):
        t = multimodal.synth_media_table(2, "image")
        with pytest.raises(NotImplementedError):
            multimodal.ImageDecode(fake=False)(t)

    def test_audio_plumbing(self, ray_mod):
        t = multimodal.synth_media_table(8, "audio")
        ds = ray_mod.from_arrow(t)
        out = ds.map_batches(multimodal.AudioFrameSample(fake=True),
                             batch_format="pyarrow", batch_size=4).to_pandas()
        assert len(out) == 8 and "frame_energy" in out

    def test_fake_decode_deterministic(self):
        t = multimodal.synth_media_table(4, "image")
        a = multimodal.ImageDecode(fake=True)(t)
        b = multimodal.ImageDecode(fake=True)(t)
        assert a["channel_mean"].to_pylist() == b["channel_mean"].to_pylist()

    def test_video_plumbing(self, ray_mod):
        t = multimodal.synth_media_table(8, "video")
        ds = ray_mod.from_arrow(t)
        out = ds.map_batches(multimodal.VideoFrameSample(fake=True),
                             batch_format="pyarrow", batch_size=4).to_pandas()
        assert len(out) == 8 and "frame_luma" in out and "n_frames" in out

    def test_video_real_decode_raises(self):
        t = multimodal.synth_media_table(2, "video")
        with pytest.raises(NotImplementedError):
            multimodal.VideoFrameSample(fake=False)(t)


class TestNarrowShuffles:
    """100 TB shape: the dedup shuffles carry sketches only — never documents or
    per-band signature copies (round-1 review items 2-3)."""

    def test_exact_dedup_shuffle_schema(self, ray_mod):
        rows = [{"id": i, "text": f"payload {i}"} for i in range(10)]
        ds = ray_mod.from_items(rows)
        names = dedup._hash_rows(ds, "text", "id", 8).schema().names
        assert sorted(names) == ["__b", "__h", "id"]  # no text column

    def test_minhash_band_shuffle_schema(self, ray_mod):
        rows = [{"id": i, "text": f"tok{i} alpha beta gamma delta"} for i in range(10)]
        ds = ray_mod.from_items(rows)
        names = dedup._band_rows(ds, "text", "id", 64, 16, 3, 8).schema().names
        assert sorted(names) == ["__b", "band", "bh", "id"]  # no text, no signature


class TestPolyHash:
    def test_poly_hash_values(self):
        from byzer_retrieval_ray.functions.polyhash import poly_hash_np
        # Horner(31) over codepoints: "a" -> 97, "ab" -> 97*31+98
        h = poly_hash_np(["a", "ab", ""], bits=64)
        assert int(h[0]) == 97 and int(h[1]) == 97 * 31 + 98 and int(h[2]) == 0
        h32 = poly_hash_np(["x" * 40], bits=32)
        assert int(h32[0]) < 2 ** 32

    def test_poly_signatures_match_legacy_semantics(self):
        texts = np.array(["a b c d e f", "a b c d e f", "totally different words here",
                          "", "one"], dtype=object)
        sig = dedup.minhash_signatures(texts, 32, 3, hash_fn="poly")
        assert (sig[0] == sig[1]).all()            # identical texts → identical sigs
        assert not (sig[0] == sig[2]).all()
        assert (sig[3] == np.iinfo(np.int64).max).all()   # no shingles → max lanes

    def test_minhash_poly_mode_exact_dups(self, ray_mod):
        rows = [{"id": i, "text": f"alpha bravo charlie delta echo unique{i}"}
                for i in range(12)]
        rows.append({"id": 50, "text": rows[3]["text"]})
        rows.append({"id": 51, "text": rows[3]["text"]})
        ds = ray_mod.from_items(rows)
        out = dedup.minhash_lsh_dedup(ds, "text", "id", num_perm=64, bands=16,
                                      shingle_k=3, jaccard=1.0,
                                      hash_fn="poly").to_pandas()
        got = dict(zip(out["id"], out["dup_of"]))
        assert got == {50: 3, 51: 3}

    def test_fingerprint_poly_deterministic_and_shared(self):
        a = "the quick brown fox jumps over the lazy dog again and again " * 3
        b = a + "completely different tail with many extra words appended here now"
        fps = text.rolling_fingerprint(np.array([a, a, b], dtype=object), hash_fn="poly")
        assert fps[0] == fps[1]
        shared = set(fps[0]) & set(fps[2])
        assert shared  # overlapping passages share fingerprint values


class TestRealMultimodalCodecs:
    """PPM/BMP image and PCM WAV audio decode for REAL (stdlib + numpy)."""

    def test_ppm_roundtrip(self):
        rng = np.random.default_rng(1)
        px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
        data = multimodal.encode_ppm(px)
        assert data[:2] == b"P6"
        assert np.array_equal(multimodal.decode_ppm(data), px)

    def test_ppm_with_comment_header(self):
        px = np.full((2, 3, 3), 9, dtype=np.uint8)
        data = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
        assert np.array_equal(multimodal.decode_ppm(data), px)

    def test_bmp_roundtrip_with_row_padding(self):
        rng = np.random.default_rng(2)
        for w in (5, 4, 3):                      # 3*w % 4 != 0 exercises padding
            px = rng.integers(0, 256, size=(6, w, 3), dtype=np.uint8)
            data = multimodal.encode_bmp(px)
            assert data[:2] == b"BM"
            assert np.array_equal(multimodal.decode_bmp(data), px)

    def test_png_roundtrip_every_filter(self):
        # round-5 stdlib PNG: each of the five row filters must invert
        # exactly (encode applies the filter, decode the defilter)
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
        for ft in (0, 1, 2, 3, 4):
            data = multimodal.encode_png(px, row_filters=[ft])
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            assert np.array_equal(multimodal.decode_png(data), px), ft
        # mixed filters across rows
        data = multimodal.encode_png(px, row_filters=[0, 1, 2, 3, 4])
        assert np.array_equal(multimodal.decode_png(data), px)

    def test_png_color_types(self):
        # grayscale (type 0), gray+alpha (4), RGBA (6) and palette (3)
        # payloads built by hand; decode must widen/drop to (h, w, 3)
        import struct as _struct
        import zlib as _zlib

        def _chunk(typ, payload):
            return _struct.pack(">I", len(payload)) + typ + payload + \
                _struct.pack(">I", _zlib.crc32(typ + payload) & 0xFFFFFFFF)

        def _png(w, h, ctype, raw, plte=None):
            ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
            out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            if plte is not None:
                out += _chunk(b"PLTE", plte)
            return out + _chunk(b"IDAT", _zlib.compress(raw)) + \
                _chunk(b"IEND", b"")

        gray = bytes([0, 10, 20, 0, 30, 40])          # 2x2 gray, filter 0
        px = multimodal.decode_png(_png(2, 2, 0, gray))
        assert np.array_equal(px[:, :, 0], [[10, 20], [30, 40]])
        assert np.array_equal(px[:, :, 0], px[:, :, 1])
        ga = bytes([0, 10, 255, 20, 0])               # 2x1 gray+alpha
        px = multimodal.decode_png(_png(2, 1, 4, ga))
        assert np.array_equal(px[0, :, 0], [10, 20])
        rgba = bytes([0, 1, 2, 3, 255, 4, 5, 6, 0])   # 2x1 RGBA
        px = multimodal.decode_png(_png(2, 1, 6, rgba))
        assert np.array_equal(px[0], [[1, 2, 3], [4, 5, 6]])
        plte = bytes([255, 0, 0, 0, 0, 255])          # palette: red, blue
        pal = bytes([0, 1, 0])                        # 2x1 indices 1, 0
        px = multimodal.decode_png(_png(2, 1, 3, pal, plte))
        assert np.array_equal(px[0], [[0, 0, 255], [255, 0, 0]])

    def test_png_rejects_unsupported(self):
        with pytest.raises(ValueError, match="not a PNG"):
            multimodal.decode_png(b"JUNK")
        px = np.zeros((2, 2, 3), np.uint8)
        data = bytearray(multimodal.encode_png(px))
        data[24] = 16                                  # IHDR bit depth byte
        with pytest.raises(ValueError, match="bit depth"):
            multimodal.decode_png(bytes(data))

    def test_image_stage_decodes_real_png(self, ray_mod):
        ds = ray_mod.from_arrow(multimodal.synth_media_table(12, "png"))
        out = ds.map_batches(multimodal.ImageDecode(), batch_format="pyarrow",
                             batch_size=4, concurrency=2).to_pandas()
        out = out.sort_values("media_id").reset_index(drop=True)
        for i, cm in enumerate(out["channel_mean"]):
            assert list(cm) == [(i * 37) % 256, (i * 59) % 256, (i * 83) % 256]
        assert all(max(cs) == 0.0 for cs in out["channel_std"])

    def test_wav_roundtrip_and_rms(self):
        rate = 8000
        t = np.arange(rate // 4) / rate
        sig = 0.5 * np.sin(2 * np.pi * 200 * t)
        data = multimodal.encode_wav(sig, rate)
        samples, got_rate = multimodal.decode_wav(data)
        assert got_rate == rate and samples.size == sig.size
        assert np.abs(samples - sig).max() < 1e-3    # 16-bit quantization
        # full-signal RMS of a sine ≈ amplitude/sqrt(2)
        assert np.sqrt((samples ** 2).mean()) == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)

    def test_image_stage_decodes_real_ppm(self, ray_mod):
        ds = ray_mod.from_arrow(multimodal.synth_media_table(12, "ppm"))
        out = ds.map_batches(multimodal.ImageDecode(), batch_format="pyarrow",
                             batch_size=4, concurrency=2).to_pandas()
        out = out.sort_values("media_id").reset_index(drop=True)
        for i, cm in enumerate(out["channel_mean"]):
            assert list(cm) == [(i * 37) % 256, (i * 59) % 256, (i * 83) % 256]
        # solid color ⇒ zero std
        assert all(max(cs) == 0.0 for cs in out["channel_std"])

    def test_audio_stage_decodes_real_wav(self, ray_mod):
        ds = ray_mod.from_arrow(multimodal.synth_media_table(6, "wav"))
        out = ds.map_batches(multimodal.AudioFrameSample(), batch_format="pyarrow",
                             batch_size=2, concurrency=2).to_pandas()
        # a sine tone has near-constant frame RMS ≈ 0.5/sqrt(2)
        for es in out["frame_energy"]:
            assert len(es) >= 1
            assert abs(np.mean(es) - 0.5 / np.sqrt(2)) < 0.05

    def test_y4m_round_trip(self):
        y = np.arange(3 * 8 * 12, dtype=np.uint8).reshape(3, 8, 12) % 251
        frames, w, h = multimodal.decode_y4m(multimodal.encode_y4m(y))
        assert (w, h) == (12, 8)
        assert np.array_equal(frames, y)
        with pytest.raises(ValueError, match="YUV4MPEG2"):
            multimodal.decode_y4m(b"not a video")
        with pytest.raises(ValueError, match="truncated"):
            multimodal.decode_y4m(multimodal.encode_y4m(y)[:-10])
        with pytest.raises(ValueError, match="chroma"):
            multimodal.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + b"\0" * 48)

    def test_video_stage_decodes_real_y4m(self, ray_mod):
        ds = ray_mod.from_arrow(multimodal.synth_media_table(10, "y4m"))
        out = ds.map_batches(multimodal.VideoFrameSample(stride=4),
                             batch_format="pyarrow", batch_size=4,
                             concurrency=2).to_pandas()
        out = out.sort_values("media_id").reset_index(drop=True)
        for i, row in out.iterrows():
            nf = 5 + (i * 11) % 60
            assert row["n_frames"] == nf
            want = [(i * 13 + 7 * f) % 256 for f in range(0, nf, 4)][:64]
            assert list(row["frame_luma"]) == want

    def test_bmp_through_resize_stage(self, ray_mod):
        ds = ray_mod.from_arrow(multimodal.synth_media_table(8, "bmp"))
        out = ds.map_batches(multimodal.ImageResize(out=(4, 4)),
                             batch_format="pyarrow", batch_size=4).to_pandas()
        for i, feat in enumerate(out.sort_values("media_id")["image_embedding"]):
            want = ((i * 37) % 256 + (i * 59) % 256 + (i * 83) % 256) / 3 / 255.0
            assert np.allclose(feat, want, atol=1e-6)


class TestSampleAndNgrams:
    def test_hash_sample_deterministic_and_uniform(self, ray_mod):
        from byzer_retrieval_ray.ops import sample
        rows = [{"k": i, "v": i * 2} for i in range(2000)]
        outs = []
        for _ in range(2):
            ds = ray_mod.from_items(rows)
            outs.append(sorted(sample.hash_sample(ds, "k", 0.3).to_pandas()["k"]))
        assert outs[0] == outs[1]                     # deterministic across runs
        frac = len(outs[0]) / 2000
        assert 0.25 < frac < 0.35                     # roughly the requested rate
        # subset property: a lower rate's sample is contained in a higher rate's
        ds = ray_mod.from_items(rows)
        small = set(sample.hash_sample(ds, "k", 0.1).to_pandas()["k"])
        assert small <= set(outs[0])

    def test_top_ngrams_counts(self, ray_mod):
        from byzer_retrieval_ray.ops import sample
        rows = [{"text": "a b c a b"}, {"text": "a b x"}, {"text": "b"},
                {"text": ""}]
        ds = ray_mod.from_items(rows)
        out = sample.top_ngrams(ds, "text", n=2, k=10)
        got = dict(zip(out["ngram"], out["count"]))
        # "a b" appears 3x (twice in doc0 incl. the wraparound pair 'b a'? no:
        # doc0 bigrams = a b, b c, c a, a b), never across docs
        assert got["a b"] == 3 and got["b c"] == 1 and got["c a"] == 1
        assert "x a" not in got and "b a" not in got  # no cross-doc grams
        assert list(out["ngram"])[0] == "a b"          # ranked by count desc

    def test_top_ngrams_trigram_and_bucket_invariance(self, ray_mod):
        from byzer_retrieval_ray.ops import sample
        rows = [{"text": " ".join(f"w{i % 7}" for i in range(50))} for _ in range(5)]
        outs = []
        for nb in (4, 64):
            ds = ray_mod.from_items(rows)
            o = sample.top_ngrams(ds, "text", n=3, k=5, num_buckets=nb)
            outs.append(list(zip(o["ngram"], o["count"])))
        assert outs[0] == outs[1]
