"""Unit tests for the training-data operators (dataops package)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.dataops import (
    decontam,
    dedup,
    multimodal,
    similarity,
    textstats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different words here entirely unrelated text"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "ab"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact_groups(self, docs):
        g = dedup.exact_dedup_groups(docs).collect()
        dups = [r for r in g if r["n"] > 1]
        assert len(dups) == 1 and dups[0]["keep_id"] == 0

    def test_shingles_count_and_short_doc(self, docs):
        sh = dedup.shingles(docs).collect()
        by_id = {}
        for r in sh:
            by_id.setdefault(r["id"], set()).add(r["sh"])
        assert len(by_id[0]) == 7  # 9 tokens -> 7 distinct 3-grams
        assert 4 not in by_id  # 2 tokens -> no shingles
        assert "the quick brown" in by_id[0]

    def test_minhash_finds_near_dup(self, docs):
        sh = dedup.shingles(docs)
        cand = dedup.minhash_candidate_pairs(
            dedup.minhash_signatures(sh)
        ).collect()
        pairs = {(r["a"], r["b"]) for r in cand}
        assert (0, 3) in pairs  # identical docs always collide
        assert (0, 1) in pairs  # 6/8 shared shingles -> near-certain
        assert (0, 2) not in pairs

    def test_jaccard_exact_values(self, docs):
        sh = dedup.shingles(docs)
        jac = {(r["a"], r["b"]): r
               for r in dedup.jaccard_pairs(sh, allow_unfiltered=True).collect()}
        assert jac[(0, 3)]["jac"] == 1.0
        r = jac[(0, 1)]
        assert r["inter"] == 6 and r["union_n"] == 8 and r["jac"] == 0.75

    def test_simhash_shape_and_identity(self, docs):
        sim = {r["id"]: r["simhash"]
               for r in dedup.simhash(dedup.shingles(docs)).collect()}
        assert all(len(v) == 32 and set(v) <= {"0", "1"}
                   for v in sim.values())
        assert sim[0] == sim[3]

    def test_simhash_engines_differential(self, docs):
        sh = dedup.shingles(docs)
        a = {r["id"]: r["simhash"]
             for r in dedup.simhash(sh, engine="explode").collect()}
        b = {r["id"]: r["simhash"]
             for r in dedup.simhash(sh, engine="agg").collect()}
        assert a == b and len(a) > 0
        with pytest.raises(ValueError):
            dedup.simhash(sh, engine="nope")

    def test_hamming_pairs(self, docs):
        out = dedup.hamming_pairs(
            dedup.simhash(dedup.shingles(docs)), max_dist=0
        ).collect()
        assert {(r["a"], r["b"]) for r in out} == {(0, 3)}


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_cosine(self, vecs):
        r = vecs.filter("vec_id = 0").select(
            similarity.cosine(
                F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
            ).alias("c")
        ).first()
        assert abs(r["c"] - 1.0) < 1e-9

    def test_topk_order(self, vecs):
        out = similarity.topk_bruteforce(
            vecs, vecs.filter("vec_id = 0"), k=3
        ).orderBy("rank").collect()
        assert [r["nid"] for r in out] == [1, 2, 3]
        assert out[0]["cos"] > 0.99

    def test_topk_plan_broadcasts(self, vecs):
        plan = similarity.topk_bruteforce(
            vecs, vecs.filter("vec_id = 0"), k=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan

    def test_neardup_threshold(self, vecs):
        out = similarity.neardup_pairs(vecs, threshold=0.9).collect()
        assert {(r["a"], r["b"]) for r in out} == {(0, 1)}

    def test_neardup_lsh_plan_has_no_cartesian(self, vecs):
        # the r01 'weak' shape was an all-pairs a<b join; the LSH path
        # must be a bucket EQUI-join — no cartesian/nested-loop node
        plan = similarity.neardup_lsh(
            vecs, threshold=0.9, n_tables=2, n_bits=2, dim=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_lsh_topk_self_bucket(self, vecs):
        out = similarity.topk_lsh(vecs, vecs.filter("vec_id = 0"), k=3,
                                  n_bits=2).collect()
        # bucket-mates only; vector 3 (opposite sign) lands elsewhere
        assert all(r["nid"] != 3 for r in out)


    def test_lsh_topk_matches_reference_buckets(self, vecs):
        # topk_lsh now computes buckets via the one-matmul Arrow path;
        # sign_lsh_buckets is the engine-independent reference spec —
        # the two must induce the SAME bucket partition of the corpus
        ref = {
            r["vec_id"]: r["bucket"]
            for r in similarity.sign_lsh_buckets(
                vecs, n_bits=2, dim=3
            ).select("vec_id", "bucket").collect()
        }
        fast = {
            r["vec_id"]: r["bucket"]
            for r in similarity.lsh_bucket_table(
                vecs, n_tables=1, n_bits=2, dim=3
            ).select("vec_id", "bucket").collect()
        }
        # bitstring '10' == integer 0b10: same packing order
        assert {k: int(v, 2) for k, v in ref.items()} == fast


    def test_multi_table_topk_recall_and_plan(self, vecs):
        # r4 multi-table OR-banding: candidates from >=1 of N tables,
        # deduped; equi-joins only (no cartesian), and with enough
        # tables the tiny graph recalls brute exactly
        brute = {
            (r["qid"], r["rank"]): r["nid"]
            for r in similarity.topk_bruteforce(
                vecs, vecs.filter("vec_id = 0"), k=2
            ).collect()
        }
        multi = similarity.topk_lsh(
            vecs, vecs.filter("vec_id = 0"), k=2, n_bits=2,
            n_tables=8, dim=3,
        )
        got = {(r["qid"], r["rank"]): r["nid"] for r in multi.collect()}
        assert got == brute
        plan = multi._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ivf_anchor_selection_in_engine(self, vecs):
        # the r3 verdict's last scale-killer: anchor selection must be
        # TakeOrderedAndProject (k rows to the driver), NOT a full
        # corpus collect sorted driver-side
        import hashlib

        plan = (
            vecs.select("vec_id")
            .orderBy(
                F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
            )
            .limit(2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "CollectLimit" not in plan
        # identical anchors to the pre-r4 driver-side formulation
        anchors = similarity.ivf_anchor_ids(vecs, 2)
        ids = [r[0] for r in vecs.select("vec_id").collect()]
        ref = sorted(
            ids,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:2]
        assert anchors == ref

    def test_ivf_topk_probes_cover_neighbors(self, vecs):
        import numpy as np

        anchors = similarity.ivf_anchor_ids(vecs, 2)
        rows = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
        cents = np.array(
            [np.floor(np.asarray(rows[i], dtype=np.float64) * 1000 + 0.5)
             for i in anchors], dtype=np.int64)
        out = similarity.topk_ivf(
            vecs, vecs.filter("vec_id = 0"), cents, k=3, nprobe=2
        ).orderBy("rank").collect()
        # nprobe = n_lists here, so IVF degrades to exact: same order
        # as brute force
        assert [r["nid"] for r in out] == [1, 2, 3]

    def test_ivf_assignment_deterministic(self, vecs):
        import numpy as np

        anchors = similarity.ivf_anchor_ids(vecs, 2)
        rows = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
        cents = np.array(
            [np.floor(np.asarray(rows[i], dtype=np.float64) * 1000 + 0.5)
             for i in anchors], dtype=np.int64)
        a1 = sorted(
            (r["vec_id"], r["cid"])
            for r in similarity.ivf_assignments(vecs, cents).collect()
        )
        a2 = sorted(
            (r["vec_id"], r["cid"])
            for r in similarity.ivf_assignments(vecs, cents).collect()
        )
        assert a1 == a2 and len(a1) == vecs.count()


class TestTextstats:
    def test_lang_id_pred(self, spark):
        df = spark.createDataFrame(
            [(0, "the cat and the dog in the house"),
             (1, "el perro y la casa en la calle que es"),
             (2, "zzz qqq www")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["lang_pred"]
               for r in textstats.lang_id(df).collect()}
        assert out[0] == "en" and out[1] == "es" and out[2] == "und"

    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [(0, "abcd efghijkl x")], "doc_id long, text string"
        )
        r = textstats.token_counts(df).first()
        assert r["ws_tokens"] == 3
        assert r["bpe_tokens"] == 1 + 2 + 1  # ceil(4/4)+ceil(8/4)+ceil(1/4)

    def test_fingerprint_deterministic(self, spark):
        df = spark.createDataFrame(
            [(0, "abcdefghijklmnop"), (1, "abcdefghijklmnop")],
            "doc_id long, text string",
        )
        out = textstats.fingerprint(df).collect()
        fps = {r["id"]: r["fp"] for r in out}
        assert fps[0] == fps[1] and len(fps[0]) == 4 * 32


class TestMultimodal:
    def test_payload_meta(self, spark):
        df = spark.createDataFrame([(0, "hello")], "doc_id long, text string")
        r = multimodal.with_binary_payload(df).first()
        assert bytes(r["payload"]) == b"hello"
        assert r["media_meta"]["nbytes"] == 5

    def test_decode_stub_raises(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"xx")

    def test_fake_features_deterministic(self, spark):
        df = spark.createDataFrame(
            [(0, "hello"), (1, "hello")], "doc_id long, text string"
        )
        out = multimodal.extract_features(
            multimodal.with_binary_payload(df)
        ).collect()
        assert len(out) == 2
        f0, f1 = (sorted(out, key=lambda r: r["id"]))
        assert list(f0["features"]) == list(f1["features"])
        assert len(f0["features"]) == 8
        assert all(0 <= v <= 1 for v in f0["features"])


class TestImageHeaderKernel:
    """REAL container-header metadata (r5): PNG IHDR / JPEG SOF / GIF /
    BMP dims via stdlib struct — pixel decode stays stubbed."""

    @staticmethod
    def _png(w, h, bit_depth=8, color_type=6):
        import struct

        return (
            b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h)
            + bytes([bit_depth, color_type, 0, 0, 0])
        )

    @staticmethod
    def _jpeg(w, h, ncomp=3):
        import struct

        app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                + b"\x01\x01\x00" + b"\x00" * 6)
        sof = (b"\xff\xc2" + struct.pack(">H", 8 + 3 * ncomp) + bytes([8])
               + struct.pack(">HH", h, w) + bytes([ncomp])
               + b"\x00" * (3 * ncomp))
        return b"\xff\xd8" + app0 + sof

    def test_png(self):
        m = multimodal.image_header_meta(self._png(640, 480))
        assert m == {"format": "png", "width": 640, "height": 480,
                     "channels": 4, "bit_depth": 8}
        # grayscale color type -> 1 channel
        assert multimodal.image_header_meta(
            self._png(3, 2, color_type=0))["channels"] == 1

    def test_jpeg_progressive_sof2(self):
        m = multimodal.image_header_meta(self._jpeg(1024, 768))
        assert (m["format"], m["width"], m["height"], m["channels"]) == (
            "jpeg", 1024, 768, 3)

    def test_gif_and_bmp(self):
        import struct

        gif = b"GIF87a" + struct.pack("<HH", 320, 200) + bytes([0xF7, 0, 0])
        m = multimodal.image_header_meta(gif)
        assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
        # top-down BMP (negative height) reports abs()
        bmp = (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
               + struct.pack("<ii", 800, -600) + struct.pack("<HH", 1, 24))
        m = multimodal.image_header_meta(bmp)
        assert (m["format"], m["width"], m["height"], m["channels"]) == (
            "bmp", 800, 600, 3)

    def test_rejects(self):
        assert multimodal.image_header_meta(b"") is None
        assert multimodal.image_header_meta(b"xx") is None
        # truncated PNG magic without a full IHDR
        assert multimodal.image_header_meta(b"\x89PNG\r\n\x1a\nsh") is None
        # JPEG with entropy data but no SOF
        assert multimodal.image_header_meta(b"\xff\xd8\xff\xda\x00\x04ab") \
            is None

    def test_decode_image_real_dims_stubbed_pixels(self):
        d = multimodal.decode_image(self._png(7, 9))
        assert d["width"] == 7 and d["height"] == 9 and d["pixels"] is None
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"not an image")

    def test_image_meta_containment(self, spark):
        rows = [
            (0, self._png(10, 20)),
            (1, self._jpeg(30, 40)),
            (2, b"corrupt bytes"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["id"]: r for r in multimodal.image_meta(df).collect()}
        assert out[0]["format"] == "png" and out[0]["width"] == 10
        assert out[1]["format"] == "jpeg" and out[1]["height"] == 40
        assert out[2]["ok"] is False and out[2]["format"] is None


class TestShingleEngines:
    def test_arrow_matches_sql(self, docs):
        a = dedup.shingles(docs)
        b = dedup.shingles(docs, engine="sql")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_short_docs_no_grams(self, spark):
        df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
        assert dedup.shingles(df, k=3).count() == 0


class TestDecontam:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # eval doc 10; doc 20 = exact copy; doc 21 = half-overlapping
        # window; doc 22 = disjoint; doc 23 = shorter than k
        rows = [
            (10, "a b c d e f g h"),
            (20, "a b c d e f g h"),
            (21, "x a b c d e f y"),
            (22, "p q r s t u v w"),
            (23, "a b"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _run(self, corpus, engine):
        ev = corpus.filter("doc_id = 10")
        out = decontam.kgram_contamination(
            corpus, ev, k=4, threshold=0.8, engine=engine
        )
        return {r["id"]: r for r in out.collect()}

    @pytest.mark.parametrize("engine", ["set", "join"])
    def test_planted_overlap(self, corpus, engine):
        by = self._run(corpus, engine)
        assert len(by) == 5
        # 8 tokens -> 5 distinct 4-grams; exact copy hits all of them
        assert (by[20]["n_grams"], by[20]["n_hit"]) == (5, 5)
        assert by[20]["contaminated"]
        # doc 21 shares the 3 grams inside 'a b c d e f'
        assert (by[21]["n_grams"], by[21]["n_hit"]) == (5, 3)
        assert not by[21]["contaminated"]
        assert (by[22]["n_hit"], by[22]["contaminated"]) == (0, False)
        # sub-k doc: zero grams, frac defined as 0.0, never flagged
        assert (by[23]["n_grams"], by[23]["frac"],
                by[23]["contaminated"]) == (0, 0.0, False)

    @pytest.mark.parametrize("engine", ["set", "join"])
    def test_zero_threshold_never_flags_subk(self, corpus, engine):
        # threshold <= 0: a sub-k doc (0 grams) must STILL be
        # contaminated=False (0.0 >= 0.0 is true, but the contract and
        # the oracle's CASE WHEN n_grams > 0 say never-flagged)
        ev = corpus.filter("doc_id = 10")
        out = decontam.kgram_contamination(
            corpus, ev, k=4, threshold=0.0, engine=engine
        )
        by = {r["id"]: r for r in out.collect()}
        assert not by[23]["contaminated"]
        assert by[22]["contaminated"]  # 0 hits but frac 0.0 >= 0.0

    def test_engines_agree(self, corpus):
        a, b = self._run(corpus, "set"), self._run(corpus, "join")
        assert {k: tuple(v) for k, v in a.items()} == \
               {k: tuple(v) for k, v in b.items()}

    def test_set_engine_corpus_side_has_no_shuffle(self, corpus):
        ev = corpus.filter("doc_id = 10")
        plan = decontam.kgram_contamination(
            corpus, ev, k=4, engine="set"
        )._jdf.queryExecution().executedPlan().toString()
        # the corpus side is one scan + one mapInPandas: no Exchange
        assert "Exchange" not in plan


class TestRepetition:
    def test_hand_computed(self, spark):
        rows = [
            # 'a a a b': top tok 3/4; top 2-gram 'a a' x2 * 1 char / 4
            # chars; no 5-grams
            (1, "a a a b"),
            # all-distinct: top tok 1/8, every 2-gram unique (x1), no
            # duplicated 5-gram
            (2, "q w e r t y u i"),
            # 'ab cd ab cd ab cd ab cd': 'ab cd' appears 4x (+ 'cd ab'
            # 3x) -> top2 4*4/16; 5-gram 'ab cd ab cd ab' x2 and
            # 'cd ab cd ab cd' x2 -> (2*10 + 2*10)/16
            (3, "ab cd ab cd ab cd ab cd"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        by = {r["id"]: r for r in textstats.repetition_stats(df).collect()}
        assert by[1]["top_tok_frac"] == 3 / 4
        assert by[1]["top2gram_char_frac"] == 2 * 2 / 4
        assert by[1]["dup5gram_char_frac"] == 0.0
        assert by[2]["top_tok_frac"] == 1 / 8
        # ties break (count desc, gram asc): 'e r' wins at count 1
        assert by[2]["top2gram_char_frac"] == 1 * 2 / 8
        assert by[3]["top_tok_frac"] == 4 / 8
        assert by[3]["top2gram_char_frac"] == 4 * 4 / 16
        assert by[3]["dup5gram_char_frac"] == (2 * 10 + 2 * 10) / 16

    def test_short_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, "")], "doc_id long, text string"
        )
        by = {r["id"]: r for r in textstats.repetition_stats(df).collect()}
        assert by[1] == (1, 1.0, 0.0, 0.0)
        assert by[2] == (2, 0.0, 0.0, 0.0)

    def test_no_shuffle_plan(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = textstats.repetition_stats(
            df
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDecontamFuzz:
    """Differential fuzz: the zero-shuffle broadcast-set engine and the
    broadcast-join engine must agree on random corpora, and both must
    agree with an independent pure-Python oracle."""

    def test_random_corpora_agree(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        words = st.sampled_from(["a", "b", "c", "d", "e"])
        doc = st.lists(words, min_size=0, max_size=12).map(" ".join)

        @given(texts=st.lists(doc, min_size=1, max_size=8))
        @settings(max_examples=15, deadline=None)
        def check(texts):
            rows = [(i, t) for i, t in enumerate(texts)]
            df = spark.createDataFrame(rows, "doc_id long, text string")
            ev = df.filter("doc_id % 3 = 0")
            k = 3
            got = {}
            for eng in ("set", "join"):
                out = decontam.kgram_contamination(
                    df, ev, k=k, threshold=0.5, engine=eng
                )
                got[eng] = {
                    r["id"]: (r["n_grams"], r["n_hit"], r["contaminated"])
                    for r in out.collect()
                }
            assert got["set"] == got["join"]
            # independent python oracle
            def grams(t):
                tk = t.split(" ")
                return {
                    " ".join(tk[j:j + k]) for j in range(len(tk) - k + 1)
                }
            evg = set().union(
                *(grams(t) for i, t in rows if i % 3 == 0)
            ) if rows else set()
            for i, t in rows:
                g = grams(t)
                hit = len(g & evg)
                exp = (
                    len(g), hit,
                    bool(g) and round(hit / len(g), 6) >= 0.5,
                )
                assert got["set"][i] == exp, (i, t, got["set"][i], exp)

        check()


class TestVocab:
    def test_counts_and_rank(self, spark):
        rows = [
            (1, "a b a"),
            (2, "a c"),
            (3, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        full = {r["token"]: (r["tf"], r["df"])
                for r in textstats.vocab_stats(df).collect()}
        assert full == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}
        top = textstats.vocab_stats(df, top_k=2).collect()
        assert [(r["rank"], r["token"], r["tf"]) for r in top] == [
            (1, "a", 3), (2, "b", 1)  # tie b/c broken by token asc
        ]


class TestAudioKernel:
    """decode_audio/audio_features: REAL PCM-WAV kernel (stdlib wave +
    audioop, found by the round-4 codec probe). WAVs synthesized
    deterministically in-test — no external data."""

    @staticmethod
    def _wav(freq=440, sr=8000, secs=0.25, channels=1, amp=12000):
        import io
        import math
        import struct
        import wave

        n = int(sr * secs)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(sr)
            frames = bytearray()
            for i in range(n):
                s = int(amp * math.sin(2 * math.pi * freq * i / sr))
                frames += struct.pack("<h", s) * channels
            w.writeframes(bytes(frames))
        return buf.getvalue()

    def test_decode_header(self):
        meta = multimodal.decode_audio(self._wav(sr=16000, secs=0.5,
                                                 channels=2))
        assert meta == {
            "channels": 2, "sample_rate": 16000, "sample_width": 2,
            "n_frames": 8000, "duration_s": 0.5,
        }

    def test_decode_rejections(self):
        with pytest.raises(ValueError, match="not a PCM WAV"):
            multimodal.decode_audio(b"definitely not audio")
        with pytest.raises(NotImplementedError, match="compressed"):
            multimodal.decode_audio(b"ID3\x04" + b"\x00" * 64)
        with pytest.raises(NotImplementedError, match="compressed"):
            multimodal.decode_audio(b"\x00\x00\x00 ftypM4A " + b"\x00" * 8)

    def test_features_distributed(self, spark):
        rows = [
            (0, self._wav(amp=12000)),          # loud tone
            (1, self._wav(amp=300)),            # quiet tone
            (2, self._wav(amp=0)),              # silence
            (3, b"corrupt payload"),            # per-row containment
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        by = {r["id"]: r for r in multimodal.audio_features(df).collect()}
        assert len(by) == 4
        assert by[3]["ok"] is False and by[3]["rms"] is None
        assert by[0]["ok"] and by[0]["sample_rate"] == 8000
        assert by[0]["duration_s"] == 0.25
        # energy ordering: silence < quiet < loud; peak tracks amp
        assert by[2]["rms"] == 0
        assert 0 < by[1]["rms"] < by[0]["rms"]
        assert 11000 < by[0]["peak"] <= 12000

    def test_bogus_width_contained(self, spark):
        # valid wave header, 40-bit samples: audioop raises
        # audioop.error, which must be contained per-row too
        # the wave WRITER refuses width 5, so patch a valid 16-bit WAV's
        # fmt chunk to claim 40 bits/sample (offset 34) — the READER
        # accepts it and audioop then raises audioop.error
        data = bytearray(self._wav())
        data[32:34] = (5).to_bytes(2, "little")      # block align
        data[34:36] = (40).to_bytes(2, "little")     # bits per sample
        df = spark.createDataFrame(
            [(0, bytes(data)), (1, self._wav())],
            "doc_id long, payload binary",
        )
        by = {r["id"]: r for r in multimodal.audio_features(df).collect()}
        assert by[0]["ok"] is False and by[1]["ok"] is True
