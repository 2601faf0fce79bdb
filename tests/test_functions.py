"""Tests for the training-data operators: dedup family, similarity search,
text stats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestDedup:
    def test_exact_dedup_groups(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import exact_dedup_groups

        df = pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5], "text": ["a", "b", "a", "c", "a"]}
        )
        out = exact_dedup_groups(rd.from_pandas(df))
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert out.loc[out["doc_id"] == 1, "n_copies"].iloc[0] == 3
        assert set(out["doc_id"]) == {1, 2, 4}

    def test_minhash_finds_planted_near_dups(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import minhash_near_dups

        rng = np.random.default_rng(5)
        words = [f"w{i}" for i in range(500)]
        docs = [" ".join(rng.choice(words, 60)) for _ in range(40)]
        near = docs[0].replace("w", "x", 1)  # tiny edit -> high jaccard
        df = pd.DataFrame(
            {"doc_id": range(41), "text": docs + [near]}
        )
        pairs = minhash_near_dups(
            rd.from_pandas(df), threshold=0.6, concurrency=2
        )
        assert ((pairs["id_a"] == 0) & (pairs["id_b"] == 40)).any()
        assert (pairs["jaccard"] >= 0.6).all()

    def test_minhash_hot_bucket_capped_no_driver_blowup(self, ray_session):
        """Skew: 10k identical docs collapse every band into one 10k-member
        bucket. The per-bucket cap must bound pair emission (C(cap,2), not
        C(10k,2) ~ 5*10^7) and the run must complete quickly."""
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import minhash_near_dups

        n, cap = 10_000, 64
        df = pd.DataFrame({"doc_id": range(n),
                           "text": ["the same document text " * 8] * n})
        for dcap in (5_000_000, 0):  # driver path AND distributed path
            pairs = minhash_near_dups(
                rd.from_pandas(df), threshold=0.9, concurrency=2,
                bucket_cap=cap, driver_cap=dcap,
            )
            assert len(pairs) == cap * (cap - 1) // 2
            assert (pairs["jaccard"] == 1.0).all()
            # cap keeps the smallest ids
            assert pairs["id_b"].max() < cap

    def test_minhash_cross_block_bucket_stitched(self, ray_session):
        """A planted near-dup pair must survive even when the input arrives
        as many tiny blocks (bucket members can land in different sorted
        blocks -> the boundary stitch must emit the cross-block pair)."""
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import minhash_near_dups

        rng = np.random.default_rng(11)
        words = [f"w{i}" for i in range(400)]
        docs = [" ".join(rng.choice(words, 50)) for _ in range(30)]
        near = docs[7].replace("w", "y", 1)
        frames = [
            pd.DataFrame({"doc_id": [i], "text": [t]})
            for i, t in enumerate(docs + [near])
        ]
        ds = rd.from_pandas(frames)  # one block per doc
        # driver_cap=0 forces the distributed sort + boundary-stitch path
        pairs = minhash_near_dups(ds, threshold=0.6, concurrency=2,
                                  driver_cap=0)
        assert ((pairs["id_a"] == 7) & (pairs["id_b"] == 30)).any()
        # and the two paths agree exactly
        driver = minhash_near_dups(ds, threshold=0.6, concurrency=2)
        pd.testing.assert_frame_equal(pairs, driver)

    def test_simhash_near_dups_pipeline(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import simhash_near_dups

        rng = np.random.default_rng(17)
        words = [f"w{i}" for i in range(400)]
        docs = [" ".join(rng.choice(words, 60)) for _ in range(40)]
        near = docs[5].replace("w", "w", 1)[:-3] + "zzz"  # tiny suffix edit
        df = pd.DataFrame({"doc_id": range(41), "text": docs + [near]})
        ds = rd.from_pandas(df)
        out = simhash_near_dups(ds, max_hamming=6)
        assert ((out["id_a"] == 5) & (out["id_b"] == 40)).any()
        assert (out["hamming"] <= 6).all()
        # distributed path agrees
        dist = simhash_near_dups(ds, max_hamming=6, driver_cap=0)
        pd.testing.assert_frame_equal(out, dist)

    def test_simhash_exact_dups_planted(self, ray_session):
        """simhash_exact_dups = full-width simhash bucket + exact Jaccard
        1.0 verify: planted exact copies must pair up, near-but-not-equal
        docs must NOT, and the driver/distributed paths must agree."""
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import simhash_exact_dups

        rng = np.random.default_rng(23)
        words = [f"w{i}" for i in range(300)]
        docs = [" ".join(rng.choice(words, 50)) for _ in range(25)]
        copies = [docs[3], docs[11]]           # ids 25, 26: exact dups
        near = docs[5][:-3] + "zzz"            # id 27: near, set-unequal
        df = pd.DataFrame({"doc_id": range(28),
                           "text": docs + copies + [near]})
        ds = rd.from_pandas(df)
        out = simhash_exact_dups(ds, concurrency=2)
        assert set(zip(out["id_a"], out["id_b"])) == {(3, 25), (11, 26)}
        assert (out["jaccard"] == 1.0).all()
        dist = simhash_exact_dups(ds, concurrency=2, driver_cap=0)
        pd.testing.assert_frame_equal(out, dist)

    def test_ngram_jaccard_dups(self, ray_session):
        """Word n-gram Jaccard dedup: a doc sharing most word 3-grams with
        another pairs up at a sub-1.0 threshold; unrelated docs don't; the
        pipeline jaccard matches the scalar reference; paths agree."""
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import (
            ngram_jaccard,
            ngram_jaccard_dups,
        )

        rng = np.random.default_rng(41)
        words = [f"w{i}" for i in range(300)]
        docs = [" ".join(rng.choice(words, 60)) for _ in range(30)]
        toks = docs[4].split()
        toks[-1] = "CHANGED"                 # one-word edit: high overlap
        near = " ".join(toks)
        df = pd.DataFrame({"doc_id": range(31), "text": docs + [near]})
        ds = rd.from_pandas(df)
        out = ngram_jaccard_dups(ds, threshold=0.6, concurrency=2)
        hit = out[(out["id_a"] == 4) & (out["id_b"] == 30)]
        assert len(hit) == 1
        assert abs(hit["jaccard"].iloc[0]
                   - round(ngram_jaccard(docs[4], near), 6)) < 1e-9
        assert (out["jaccard"] >= 0.6).all()
        dist = ngram_jaccard_dups(ds, threshold=0.6, concurrency=2,
                                  driver_cap=0)
        pd.testing.assert_frame_equal(out, dist)

    def test_quantize_embeddings(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.similarity import (
            quantize_embeddings,
        )

        rng = np.random.default_rng(43)
        V = rng.standard_normal((20, 8)).astype(np.float32)
        V[3] = 0.0  # zero vector -> all-zero quants
        df = pd.DataFrame({"vec_id": range(20),
                           "embedding": [list(v) for v in V]})
        out = quantize_embeddings(rd.from_pandas(df))
        assert len(out) == 20 * 8
        q = out.set_index(["vec_id", "dim"])["q"]
        assert q.abs().max() <= 127
        assert (q.loc[3] == 0).all()
        # per-vector max-|x| component hits exactly +-127
        for i in (0, 7):
            assert q.loc[i].abs().max() == 127
        # sign preserved on non-tiny components
        big = np.abs(V[0]) > 0.1
        assert all(np.sign(q.loc[0].to_numpy()[big]) == np.sign(V[0][big]))

    def test_embedding_near_dups_paths_agree(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import embedding_near_dups

        rng = np.random.default_rng(9)
        base = rng.standard_normal((30, 16)).astype(np.float32)
        base[7] = base[3] + rng.standard_normal(16).astype(np.float32) * 0.01
        base[20] = base[11] * 2.0  # exact direction dup
        df = pd.DataFrame(
            {"vec_id": range(len(base)), "embedding": [list(v) for v in base]}
        )
        ds = rd.from_pandas(df)
        driver = embedding_near_dups(ds, threshold=0.98)
        dist = embedding_near_dups(ds, threshold=0.98, driver_cap=0)
        pd.testing.assert_frame_equal(driver, dist)
        assert ((driver["id_a"] == 3) & (driver["id_b"] == 7)).any()
        assert ((driver["id_a"] == 11) & (driver["id_b"] == 20)).any()

    def test_add_simhash_matches_scalar_reference(self):
        from bio_data_validation_ray.functions.dedup import add_simhash, simhash64

        rng = np.random.default_rng(21)
        texts = ["".join(rng.choice(list("abcdef "), 40)) for _ in range(50)]
        texts += ["", "ab", "x" * 5]
        df = add_simhash(pd.DataFrame({"text": texts}))
        ref = [np.int64(simhash64(s).astype(np.int64)) for s in texts]
        assert (df["simhash"].to_numpy() == np.array(ref)).all()

    def test_char_shingle_windows_batch_matches_per_doc(self):
        """Per-doc unique of the batched window-multiset kernel is
        bit-identical to char_shingles, including short (<k bytes), empty
        and multibyte unicode docs — so a min-reduce over the multiset
        equals a min over the shingle set."""
        from bio_data_validation_ray.functions.dedup import (
            char_shingle_windows_batch,
            char_shingles,
        )

        rng = np.random.default_rng(7)
        texts = ["".join(rng.choice(list("abcdef "), rng.integers(0, 60)))
                 for _ in range(80)]
        texts += ["", "ab", "abcd", "abcde", "héllo wörld ünïcode",
                  "日本語のテキスト", "x" * 4, "y" * 5]
        from bio_data_validation_ray.functions.dedup import char_shingles_batch

        for k in (3, 5, 9):
            cat, lens = char_shingle_windows_batch(texts, k)
            off = np.concatenate([[0], np.cumsum(lens)])
            assert off[-1] == cat.size
            for i, s in enumerate(texts):
                np.testing.assert_array_equal(
                    np.unique(cat[off[i]:off[i + 1]]), char_shingles(s, k))
            # the set variant is bit-identical to the per-doc concatenation
            ref = [char_shingles(s, k) for s in texts]
            ucat, ulens = char_shingles_batch(texts, k)
            assert ulens.tolist() == [r.size for r in ref]
            np.testing.assert_array_equal(ucat, np.concatenate(ref))
        cat, lens = char_shingle_windows_batch([], 5)
        assert cat.size == 0 and lens.size == 0

    def test_jaccard_exact(self):
        from bio_data_validation_ray.functions.dedup import jaccard

        assert jaccard("abcdefgh", "abcdefgh") == 1.0
        assert jaccard("abcdefgh", "zzzzzzzz") == 0.0

    def test_simhash_similar_texts_close(self):
        from bio_data_validation_ray.functions.dedup import hamming64, simhash64

        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a.replace("lazy", "hazy")
        c = "completely different content with other words entirely " * 5
        hab = hamming64(np.array([simhash64(a)]), np.array([simhash64(b)]))[0]
        hac = hamming64(np.array([simhash64(a)]), np.array([simhash64(c)]))[0]
        assert hab < hac
        assert hab <= 12

    def test_embedding_near_dups(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import embedding_near_dups

        rng = np.random.default_rng(9)
        base = rng.standard_normal((20, 16)).astype(np.float32)
        base[7] = base[3] + rng.standard_normal(16).astype(np.float32) * 0.01
        df = pd.DataFrame(
            {"vec_id": range(20), "embedding": [list(v) for v in base]}
        )
        out = embedding_near_dups(rd.from_pandas(df), threshold=0.98)
        assert ((out["id_a"] == 3) & (out["id_b"] == 7)).any()


class TestSimilarity:
    def test_topk_exact_matches_numpy(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.similarity import topk_cosine

        rng = np.random.default_rng(11)
        m = rng.standard_normal((200, 32))
        q = rng.standard_normal(32)
        df = pd.DataFrame(
            {"vec_id": range(200), "embedding": [list(v) for v in m]}
        )
        out = topk_cosine(rd.from_pandas(df), q, k=5, batch_size=64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ (q / np.linalg.norm(q)), 6)
        expect = np.lexsort((np.arange(200), -sims))[:5]
        assert list(out["vec_id"]) == list(expect)

    def test_ivf_recall_on_clustered_data(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.similarity import (
            IVFIndex,
            ivf_topk,
            topk_cosine,
        )

        rng = np.random.default_rng(13)
        centers = rng.standard_normal((8, 32)) * 5
        pts = np.concatenate(
            [c + rng.standard_normal((50, 32)) for c in centers]
        )
        df = pd.DataFrame(
            {"vec_id": range(len(pts)), "embedding": [list(v) for v in pts]}
        )
        ds = rd.from_pandas(df)
        index = IVFIndex.train(pts[::3], n_lists=8)
        q = centers[2] + rng.standard_normal(32) * 0.1
        exact = topk_cosine(ds, q, k=10)
        approx = ivf_topk(ds, q, k=10, index=index, nprobe=3)
        recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
        assert recall >= 0.8

    def test_ivf_store_partition_pruned_matches_scan(self, ray_session, tmp_path):
        """IVFStore writes ivf_list-partitioned parquet once; its
        partition-pruned topk must equal the one-shot assign+filter path."""
        import os

        import ray.data as rd

        from bio_data_validation_ray.functions.similarity import (
            IVFIndex,
            IVFStore,
            ivf_topk,
        )

        rng = np.random.default_rng(13)
        centers = rng.standard_normal((8, 32)) * 5
        pts = np.concatenate(
            [c + rng.standard_normal((50, 32)) for c in centers]
        )
        df = pd.DataFrame(
            {"vec_id": range(len(pts)), "embedding": [list(v) for v in pts]}
        )
        ds = rd.from_pandas(df)
        index = IVFIndex.train(pts[::3], n_lists=8)
        store = IVFStore.build(ds, index, str(tmp_path / "ivf"))
        # hive partition dirs exist -> probes are partition-pruned reads
        parts = [d for d in os.listdir(tmp_path / "ivf")
                 if d.startswith("ivf_list=")]
        assert len(parts) > 1
        q = centers[2] + rng.standard_normal(32) * 0.1
        a = store.topk(q, k=10, nprobe=3)
        b = ivf_topk(ds, q, k=10, index=index, nprobe=3)
        assert list(a["vec_id"]) == list(b["vec_id"])


class TestTextStats:
    def test_token_count_vs_python(self):
        from bio_data_validation_ray.functions.textstats import add_token_count

        texts = ["a b  c", "  leading", "trailing  ", "", "one"]
        t = pa.table({"text": texts})
        out = add_token_count(t)["n_tokens"].to_pylist()
        assert out == [len(s.split()) for s in texts]

    def test_langid(self):
        from bio_data_validation_ray.functions.textstats import LangId

        li = LangId()
        df = pd.DataFrame(
            {
                "text": [
                    "the cat and the dog sat in a corner of the room",
                    "der Hund und die Katze ist ein Tier nicht zu",
                    "le chat est une petite chose pour que les gens",
                    "xyzzy qwerty",
                ]
            }
        )
        out = li(df)
        assert list(out["lang_pred"]) == ["en", "de", "fr", "und"]

    def test_langid_seven_languages_and_index_robustness(self):
        from bio_data_validation_ray.functions.textstats import LangId

        li = LangId()
        df = pd.DataFrame({"text": [
            "the cat sat on the mat and it was happy that day",
            "der Hund ist nicht mit der Katze zu sehen und sie werden",
            "le chat est dans la maison et les enfants sont pour une",
            "el perro es una mascota y no come con los gatos para",
            "il cane è un animale che non sono per la casa",
            "o cachorro é um animal que não está em casa para o dono",
            "de hond is een dier dat niet in het huis van de buurman",
        ]})
        assert list(li(df)["lang_pred"]) == ["en", "de", "fr", "es", "it",
                                             "pt", "nl"]
        sub = df.iloc[2:5].copy()  # non-default index must not misalign
        assert list(li(sub)["lang_pred"]) == ["fr", "es", "it"]

    def test_rolling_hash_shift_invariance(self):
        from bio_data_validation_ray.functions.textstats import rolling_hashes

        a = rolling_hashes("hello world, this is content", window=8)
        b = rolling_hashes("XXhello world, this is content", window=8)
        # shared windows produce identical hashes regardless of prefix
        assert len(set(a) & set(b)) >= len(a) - 2
        # window count and near-uniqueness of distinct windows
        assert a.size == len("hello world, this is content") - 8 + 1
        assert len(set(a)) == a.size

    def test_langid_accuracy_gate(self):
        """Output-QUALITY gate (not just mechanics): over a deterministic
        multilingual corpus built from each language's own function words
        plus shared filler, per-language accuracy must be perfect. (The
        sf fixtures' `lang` column is uncorrelated with the generated text —
        every doc shares one English-ish token vocabulary — so the quality
        gate lives here, against text whose language is real.)"""
        from bio_data_validation_ray.functions.textstats import STOPWORDS, LangId

        rng = np.random.default_rng(31)
        filler = [f"tok{i}" for i in range(50)]
        rows = []
        for lang, words in STOPWORDS.items():
            w = sorted(words)
            for _ in range(40):
                toks = list(rng.choice(w, 12)) + list(rng.choice(filler, 6))
                rng.shuffle(toks)
                rows.append((lang, " ".join(toks)))
        df = pd.DataFrame(rows, columns=["lang", "text"])
        out = LangId()(df)
        acc = (out["lang"] == out["lang_pred"]).groupby(out["lang"]).mean()
        assert len(acc) == len(STOPWORDS)
        # stopword-dense text must classify essentially perfectly; a few
        # collisions are tolerated for languages with overlapping function
        # words (es/pt, de/nl share forms)
        assert (acc >= 0.9).all(), acc.to_dict()
        assert (out["lang"] == out["lang_pred"]).mean() >= 0.95


class TestSpectrogram:
    def test_sine_peaks_at_expected_bin(self):
        from bio_data_validation_ray.functions.multimodal import spectrogram

        rate, n_fft = 16000, 256
        f = 2000.0  # -> bin f * n_fft / rate = 32
        t = np.arange(rate) / rate
        sig = (np.sin(2 * np.pi * f * t) * 20000).astype(np.int16)[:, None]
        spec = spectrogram(sig, n_fft=n_fft, hop=128)
        assert spec.shape[1] == n_fft // 2 + 1
        peak = spec.mean(axis=0).argmax()
        assert abs(int(peak) - 32) <= 1

    def test_spectral_stage_plumbing(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.multimodal import (
            FEATURE_DIM,
            SpectrogramStage,
            encode_wav,
        )

        rng = np.random.default_rng(5)
        rows = []
        for i, f in enumerate([500.0, 1000.0, 4000.0, 6000.0]):
            t = np.arange(8000) / 16000
            sig = (np.sin(2 * np.pi * f * t) * 15000
                   + rng.standard_normal(t.size) * 100).astype(np.int16)
            rows.append({"media_id": i, "payload": encode_wav(sig)})
        ds = rd.from_items(rows)
        out = ds.map_batches(SpectrogramStage, batch_format="pyarrow",
                             concurrency=2, max_restarts=0).to_pandas()
        assert len(out) == 4
        assert "payload" not in out.columns  # heavy bytes dropped
        feats = np.stack(out.sort_values("media_id")["spectral"].to_numpy())
        assert feats.shape == (4, FEATURE_DIM)
        assert np.allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
        # distinct tones -> distinct spectral signatures
        assert float(feats[0] @ feats[3]) < 0.999


class TestMultimodal:
    def test_featurizer_plumbing(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.multimodal import (
            FEATURE_DIM,
            MediaFeaturizer,
            synthesize_media_table,
        )

        t = synthesize_media_table(64)
        out = rd.from_arrow(t).map_batches(
            MediaFeaturizer,
            fn_constructor_kwargs={"fake_decode": True},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
        ).to_pandas()
        assert len(out) == 64
        assert "payload" not in out.columns  # heavy bytes dropped
        assert all(len(f) == FEATURE_DIM for f in out["feature"])
        # deterministic: same payload -> same feature
        out2 = rd.from_arrow(t).map_batches(
            MediaFeaturizer,
            fn_constructor_kwargs={"fake_decode": True},
            batch_format="pyarrow",
            batch_size=32,
            concurrency=2,
        ).to_pandas()
        f1 = out.sort_values("media_id")["feature"].iloc[0]
        f2 = out2.sort_values("media_id")["feature"].iloc[0]
        assert np.allclose(list(f1), list(f2))

    def test_decode_compressed_raises(self):
        from bio_data_validation_ray.functions.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG-not-supported")

    def test_ppm_roundtrip_and_resize(self):
        from bio_data_validation_ray.functions.multimodal import (
            decode_image,
            encode_ppm,
            resize_image,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
        back = decode_image(encode_ppm(img))
        assert (back == img).all()
        small = resize_image(img, (4, 3))
        assert small.shape == (4, 3, 3)
        assert (small[0, 0] == img[0, 0]).all()  # nearest-neighbor corners

    def test_png_roundtrip_all_color_types(self):
        from bio_data_validation_ray.functions.multimodal import (
            decode_image,
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(5)
        for shape in [(9, 7), (9, 7, 2), (9, 7, 3), (9, 7, 4)]:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            back = decode_png(encode_png(img))
            assert back.shape == img.shape
            assert (back == img).all(), shape
        # dispatcher recognizes the PNG signature
        rgb = rng.integers(0, 256, size=(5, 5, 3), dtype=np.uint8)
        assert (decode_image(encode_png(rgb)) == rgb).all()

    def test_png_all_five_filters_reconstruct(self):
        """Hand-filter scanlines with every PNG filter type (the encoder
        only emits filter 0) and assert exact reconstruction — pins the
        Sub-cumsum, Average, and Paeth paths against the spec's
        reference filter math."""
        import struct
        import zlib

        from bio_data_validation_ray.functions.multimodal import decode_png

        rng = np.random.default_rng(11)
        ch = 3
        img = rng.integers(0, 256, size=(5, 6, ch), dtype=np.uint8)
        h, w, _ = img.shape

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        raw = b""
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):
            row = img[y].reshape(-1).astype(np.int64)
            f = y % 5
            filt = np.zeros(w * ch, dtype=np.int64)
            for x in range(w * ch):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                        4: paeth(a, b, c)}[f]
                filt[x] = (row[x] - pred) & 0xFF
            raw += bytes([f]) + bytes(filt.astype(np.uint8))
            prev = row

        def chunk(typ, body):
            return (struct.pack(">I", len(body)) + typ + body
                    + struct.pack(">I", zlib.crc32(typ + body)))

        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (sig + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
        assert (decode_png(payload) == img).all()

    def test_png_degenerate_shapes(self):
        from bio_data_validation_ray.functions.multimodal import (
            decode_png, encode_png)

        rng = np.random.default_rng(0)
        for shape in [(1, 1), (1, 1, 3), (1, 8, 4), (8, 1, 2)]:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            back = decode_png(encode_png(img))
            assert back.shape == img.shape and (back == img).all(), shape

    def test_y4m_mono_roundtrip_and_sampling(self):
        from bio_data_validation_ray.functions.multimodal import (
            decode_y4m, encode_y4m, sample_y4m_frames)

        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, size=(10, 6, 8), dtype=np.uint8)
        payload = encode_y4m(frames, fps=(30, 1))
        back, fps = decode_y4m(payload)
        assert fps == (30, 1)
        assert (back == frames).all()
        # evenly-spaced sampling decodes ONLY the sampled frames
        got = sample_y4m_frames(payload, 4)
        assert [i for i, _ in got] == [0, 3, 6, 9]
        for i, f in got:
            assert (f == frames[i]).all()
        # k=1 -> first frame; k > n -> every frame once
        assert [i for i, _ in sample_y4m_frames(payload, 1)] == [0]
        assert len(sample_y4m_frames(payload, 99)) == 10

    def test_y4m_c420_bt601_conversion(self):
        """Hand-built C420 payload: flat YUV planes whose BT.601 RGB is
        computed independently here — pins the limited-range matrix and
        the nearest chroma upsample."""
        from bio_data_validation_ray.functions.multimodal import decode_y4m

        w, h = 4, 2
        y_, u_, v_ = 120, 90, 200
        head = b"YUV4MPEG2 W4 H2 F25:1 C420\n"
        planes = (bytes([y_] * (w * h)) + bytes([u_] * ((w // 2) * (h // 2)))
                  + bytes([v_] * ((w // 2) * (h // 2))))
        payload = head + b"FRAME\n" + planes
        frames, fps = decode_y4m(payload)
        assert frames.shape == (1, h, w, 3)
        yf = 1.164383 * (y_ - 16)
        exp = np.clip(np.round([yf + 1.596027 * (v_ - 128),
                                yf - 0.391762 * (u_ - 128)
                                - 0.812968 * (v_ - 128),
                                yf + 2.017232 * (u_ - 128)]),
                      0, 255).astype(np.uint8)
        assert (frames[0] == exp).all()

    def test_frame_sampler_real_y4m_path(self, ray_session):
        """FrameSampler emits real PPM frames for Y4M payloads (decodable
        downstream) and keeps the labelled byte-slice stub otherwise."""
        import pyarrow as pa

        from bio_data_validation_ray.functions.multimodal import (
            FrameSampler, decode_image, encode_y4m)

        rng = np.random.default_rng(1)
        vid = rng.integers(0, 256, size=(6, 4, 5), dtype=np.uint8)
        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["video", "video"]),
            "payload": pa.array([encode_y4m(vid), b"\x00" * 64],
                                pa.binary()),
        })
        out = FrameSampler(k=3)(t).to_pandas()
        real = out[out.media_id == 1]
        assert real["frame_idx"].tolist() == [0, 2, 5]
        for _, r in real.iterrows():
            img = decode_image(bytes(r["frame_payload"]))
            i = int(r["frame_idx"])
            assert (img[:, :, 0] == vid[i]).all()
        assert len(out[out.media_id == 2]) == 3  # stub fan-out intact

    def test_y4m_edge_cases_from_review(self):
        """Odd-dimension C420 (ceil chroma, ffmpeg convention), exact
        colorspace matching (C422/C420p10 -> NotImplementedError, not a
        misleading marker error), legal empty stream, k<1 rejection,
        writable owning mono frames."""
        import pytest

        from bio_data_validation_ray.functions.multimodal import (
            decode_y4m, encode_y4m, sample_y4m_frames)

        # odd 3x3 C420: ceil chroma = 2x2
        head = b"YUV4MPEG2 W3 H3 F25:1 C420\n"
        planes = bytes([100] * 9) + bytes([90] * 4) + bytes([200] * 4)
        frames, _ = decode_y4m(head + b"FRAME\n" + planes)
        assert frames.shape == (1, 3, 3, 3)
        # unsupported variants fail loudly by NAME
        for cs in (b"C422", b"C420p10", b"Cmono10", b"C444alpha"):
            bad = b"YUV4MPEG2 W2 H2 F25:1 " + cs + b"\nFRAME\n" + b"\0" * 64
            with pytest.raises(NotImplementedError):
                decode_y4m(bad)
        # header-only stream decodes to an empty frame stack
        empty, fps = decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Cmono\n")
        assert empty.shape == (0, 2, 2) and fps == (25, 1)
        # k < 1 rejected truthfully
        vid = encode_y4m(np.zeros((3, 2, 2), dtype=np.uint8))
        with pytest.raises(ValueError, match="k must be"):
            sample_y4m_frames(vid, 0)
        # mono frames own their memory and are writable
        (_, f0), = sample_y4m_frames(vid, 1)
        assert f0.flags.owndata and f0.flags.writeable
        f0[0, 0] = 7  # must not raise

    def test_frame_sampler_unsupported_y4m_falls_back_to_stub(
            self, ray_session):
        import pyarrow as pa

        from bio_data_validation_ray.functions.multimodal import FrameSampler

        c422 = b"YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n" + b"\0" * 8
        t = pa.table({
            "media_id": pa.array([9], pa.int64()),
            "kind": pa.array(["video"]),
            "payload": pa.array([c422], pa.binary()),
        })
        out = FrameSampler(k=2)(t).to_pandas()
        # one bad clip must not fail the stage: byte-slice stub fan-out
        assert len(out) == 2 and (out["media_id"] == 9).all()

    def test_video_features_deterministic(self):
        from bio_data_validation_ray.functions.multimodal import (
            encode_y4m, video_features)

        rng = np.random.default_rng(2)
        vid = rng.integers(0, 256, size=(5, 8, 8), dtype=np.uint8)
        p = encode_y4m(vid)
        f1, f2 = video_features(p), video_features(p)
        assert f1.shape == f2.shape and (f1 == f2).all()
        assert abs(np.linalg.norm(f1) - 1.0) < 1e-5

    def test_png_unsupported_variants_raise(self):
        import struct
        import zlib

        import pytest

        from bio_data_validation_ray.functions.multimodal import (
            decode_png, encode_png)

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
        good = encode_png(img)

        def with_ihdr(depth, ctype, interlace):
            sig = b"\x89PNG\r\n\x1a\n"
            ihdr = struct.pack(">IIBBBBB", 3, 3, depth, ctype, 0, 0,
                               interlace)

            def chunk(typ, body):
                return (struct.pack(">I", len(body)) + typ + body
                        + struct.pack(">I", zlib.crc32(typ + body)))

            return (sig + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(b"\x00" * 30))
                    + chunk(b"IEND", b""))

        with pytest.raises(NotImplementedError):
            decode_png(with_ihdr(8, 2, interlace=1))   # Adam7
        with pytest.raises(NotImplementedError):
            decode_png(with_ihdr(8, 3, interlace=0))   # palette
        with pytest.raises(NotImplementedError):
            decode_png(with_ihdr(16, 2, interlace=0))  # 16-bit
        with pytest.raises(ValueError):
            decode_png(b"nope" + good[4:])

    def test_bmp_decode(self):
        from bio_data_validation_ray.functions.multimodal import decode_image

        # hand-built 2x2 24-bit BMP, bottom-up, BGR, 4-byte-aligned rows
        import struct

        px_rows = [
            bytes([255, 0, 0]) + bytes([0, 255, 0]) + b"\x00\x00",  # bottom
            bytes([0, 0, 255]) + bytes([255, 255, 255]) + b"\x00\x00",  # top
        ]
        raster = b"".join(px_rows)
        header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster),
                           2835, 2835, 0, 0)
        img = decode_image(header + info + raster)
        assert img.shape == (2, 2, 3)
        assert (img[0, 0] == [255, 0, 0]).all()   # top-left: RGB red
        assert (img[1, 0] == [0, 0, 255]).all()   # bottom-left: blue

    def test_wav_roundtrip_and_features(self):
        from bio_data_validation_ray.functions.multimodal import (
            audio_features,
            decode_wav,
            encode_wav,
        )

        t = np.arange(16000)
        mono = (np.sin(2 * np.pi * 440 * t / 16000) * 10000).astype(np.int16)
        samples, rate = decode_wav(encode_wav(mono, 16000))
        assert rate == 16000 and samples.shape == (16000, 1)
        assert (samples[:, 0] == mono).all()
        f = audio_features(samples)
        assert f.shape == (64,) and abs(np.linalg.norm(f) - 1.0) < 1e-5

    def test_featurizer_uses_real_decoders(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.multimodal import (
            FEATURE_DIM,
            MediaFeaturizer,
            encode_ppm,
            encode_wav,
            image_features,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        wav = (rng.standard_normal(8000) * 5000).astype(np.int16)
        t = pa.table({
            "media_id": pa.array([0, 1], type=pa.int64()),
            "kind": ["image", "audio"],
            "payload": pa.array([encode_ppm(img), encode_wav(wav)],
                                type=pa.binary()),
        })
        out = rd.from_arrow(t).map_batches(
            MediaFeaturizer, batch_format="pyarrow", concurrency=1,
        ).to_pandas().sort_values("media_id")
        # no fake_decode needed: both payloads decode natively, and the
        # image feature matches the direct computation exactly
        assert np.allclose(list(out["feature"].iloc[0]), image_features(img))
        assert len(out["feature"].iloc[1]) == FEATURE_DIM

    def test_frame_sampler_fanout(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.multimodal import (
            FrameSampler,
            synthesize_media_table,
        )

        t = synthesize_media_table(30)
        n_videos = sum(1 for k in t["kind"].to_pylist() if k == "video")
        out = rd.from_arrow(t).map_batches(
            FrameSampler, fn_constructor_kwargs={"k": 4},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        ).to_pandas()
        assert len(out) == n_videos * 4
        assert set(out["frame_idx"]) == {0, 1, 2, 3}


def test_round_half_away_matches_sql_round():
    """Integer-scaling derivations paired with DuckDB round() oracles must
    round .5 ties AWAY from zero, not to-even (ADVICE r3: a value*100
    landing on a representable .5 flips the percentile input)."""
    import duckdb

    from bio_data_validation_ray.pipelines.queries import _round_half_away

    vals = np.array([12.5, 13.5, -12.5, -0.5, 0.5, 2.675, 1.0, 0.0])
    got = _round_half_away(vals).astype(np.int64)
    exp = duckdb.sql(
        "SELECT list_transform(?::DOUBLE[], v -> CAST(round(v) AS BIGINT))",
        params=[vals.tolist()],
    ).fetchone()[0]
    assert got.tolist() == exp
    # the classic to-even divergence
    assert _round_half_away([12.5])[0] == 13 and np.round(12.5) == 12


class TestPII:
    def _table(self):
        import pyarrow as pa

        return pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "mail a@b.com and c.d-e@f.org now",
                "call +1-202-555-0147 then ssn 123-45-6789 at 10.0.0.1",
                "no pii at all",
                "weird 999.999.999.999 still counts as ipv4-shaped",
            ],
        })

    def test_counts(self):
        from bio_data_validation_ray.functions.pii import pii_stats

        s = pii_stats(self._table())
        assert s["n_email"].to_pylist() == [2, 0, 0, 0]
        assert s["n_phone"].to_pylist() == [0, 1, 0, 0]
        assert s["n_ssn"].to_pylist() == [0, 1, 0, 0]
        assert s["n_ipv4"].to_pylist() == [0, 1, 0, 1]
        assert s["n_pii"].to_pylist() == [2, 3, 0, 1]

    def test_redaction_order_and_placeholders(self):
        from bio_data_validation_ray.functions.pii import redact_pii

        r = redact_pii(self._table())["text"].to_pylist()
        assert r[0] == "mail [EMAIL] and [EMAIL] now"
        assert r[1] == "call [PHONE] then ssn [SSN] at [IPV4]"
        assert r[2] == "no pii at all"
        # the phone pass must run before SSN: a phone's 3-2-4-shaped
        # substring never leaks into the SSN screen
        assert "[SSN]" not in r[1].replace("ssn [SSN]", "")

    def test_redact_to_new_column_keeps_original(self):
        from bio_data_validation_ray.functions.pii import redact_pii

        r = redact_pii(self._table(), out="clean")
        assert "a@b.com" in r["text"].to_pylist()[0]
        assert "[EMAIL]" in r["clean"].to_pylist()[0]

    def test_dataset_scan_and_redact(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.pii import (redact_dataset,
                                                           scan_pii)

        ds = rd.from_arrow(self._table())
        got = scan_pii(ds).to_pandas().sort_values("doc_id")
        assert got["n_pii"].tolist() == [2, 3, 0, 1]
        red = redact_dataset(ds).to_pandas().sort_values("doc_id")
        assert "[PHONE]" in red["text"].iloc[1]

    def test_matches_duckdb_semantics(self):
        """RE2 count/replace parity with DuckDB on adversarial strings
        (overlap candidates, placeholder-adjacent digits)."""
        import duckdb

        from bio_data_validation_ray.functions.pii import (PII_PATTERNS,
                                                           pii_stats)
        import pyarrow as pa

        texts = ["x 1.2.3.4.5.6 y", "a@b.cd@e.fg", "+12-345-678-9012 9",
                 "123-45-6789-123-45-6789", "....", "a@b.c"]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        s = pii_stats(t)
        con = duckdb.connect()
        for name, pat in PII_PATTERNS:
            exp = [con.execute(
                "SELECT length(regexp_extract_all(?, ?))",
                [txt, pat]).fetchone()[0] for txt in texts]
            assert s[f"n_{name}"].to_pylist() == exp, name


class TestRepetition:
    def test_known_answers(self):
        import pyarrow as pa

        from bio_data_validation_ray.functions.textstats import (
            repetition_metrics,
        )

        t = pa.table({"doc_id": [0, 1, 2, 3],
                      "text": ["a b a b a", "x", "", "p q  p q r\tp"]})
        r = repetition_metrics(t)
        assert r["n_words"].to_pylist() == [5, 1, 0, 6]
        assert r["n_distinct_words"].to_pylist() == [2, 1, 0, 3]
        assert r["top_word_n"].to_pylist() == [3, 1, 0, 3]
        assert r["n_bigrams"].to_pylist() == [4, 0, 0, 5]
        assert r["n_distinct_bigrams"].to_pylist() == [2, 0, 0, 4]
        assert r["top_bigram_n"].to_pylist() == [2, 0, 0, 2]

    def test_batch_composition_invariance(self):
        """Row-local by construction: any batch split gives the same rows
        (vocab codes are per-batch but identities are per-doc)."""
        import pyarrow as pa

        from bio_data_validation_ray.functions.textstats import (
            repetition_metrics,
        )

        texts = [f"w{i % 7} w{i % 3} w{i % 7} end" for i in range(40)]
        t = pa.table({"doc_id": list(range(40)), "text": texts})
        whole = repetition_metrics(t).to_pandas()
        parts = pd.concat(
            [repetition_metrics(t.slice(i, 13)).to_pandas()
             for i in range(0, 40, 13)],
            ignore_index=True,
        )
        pd.testing.assert_frame_equal(whole, parts)

    def test_matches_duckdb_unnest_semantics(self):
        import duckdb
        import pyarrow as pa

        from bio_data_validation_ray.functions.textstats import (
            repetition_metrics,
        )

        texts = ["  lead and trail  ", "one", "dup dup dup",
                 "a\nb\r\nc\ta  a", "solo pair solo pair solo"]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got = repetition_metrics(t).to_pandas().sort_values("doc_id")
        con = duckdb.connect()
        con.register("docs", t)
        exp = con.sql(r"""
            WITH base AS (SELECT doc_id,
                    list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '') AS ws FROM docs),
            w AS (SELECT doc_id, unnest(ws) AS word FROM base),
            wc AS (SELECT doc_id, word, count(*) AS c FROM w
                   GROUP BY doc_id, word)
            SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct_words,
                   max(c) AS top_word_n
            FROM wc GROUP BY doc_id ORDER BY doc_id""").df()
        assert got["n_words"].tolist() == exp["n_words"].astype(int).tolist()
        assert (got["n_distinct_words"].tolist()
                == exp["n_distinct_words"].astype(int).tolist())
        assert (got["top_word_n"].tolist()
                == exp["top_word_n"].astype(int).tolist())


class TestSemDedup:
    def _ds(self, vecs, ids=None):
        import pyarrow as pa
        import ray.data as rd

        ids = ids if ids is not None else list(range(len(vecs)))
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([[float(x) for x in v] for v in vecs]),
        }))

    def test_assign_ties_to_lowest_centroid(self, ray_session):
        from bio_data_validation_ray.functions.similarity import cluster_assign

        # centroids = ids 0,1 at (127,0) and (0,127) after quantization;
        # id 2 is equidistant -> must take centroid 0
        ds = self._ds([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        out = cluster_assign(ds, n_clusters=2).to_pandas().sort_values("vec_id")
        assert out["cluster"].tolist() == [0, 1, 0]

    def test_planted_duplicate_dropped_original_kept(self, ray_session):
        from bio_data_validation_ray.functions.similarity import semdedup

        vecs = [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7], [1.0, 0.0]]
        out = (semdedup(self._ds(vecs), n_clusters=2, radius2=0)
               .to_pandas().sort_values("vec_id"))
        # id 3 duplicates id 0 exactly -> dropped; everyone else kept
        assert out["keep"].tolist() == [True, True, True, False]
        assert out.loc[out.vec_id == 3, "cluster"].item() == \
            out.loc[out.vec_id == 0, "cluster"].item()

    def test_radius_widens_the_ball(self, ray_session):
        from bio_data_validation_ray.functions.similarity import semdedup

        # quantized: (127,0) vs (127,13) -> d2 = 169
        vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 0.1]]
        tight = (semdedup(self._ds(vecs), n_clusters=2, radius2=100)
                 .to_pandas().sort_values("vec_id"))
        loose = (semdedup(self._ds(vecs), n_clusters=2, radius2=200)
                 .to_pandas().sort_values("vec_id"))
        assert tight["keep"].tolist() == [True, True, True]
        assert loose["keep"].tolist() == [True, True, False]

    def test_chunked_kernel_matches_unchunked(self, ray_session):
        import numpy as np

        from bio_data_validation_ray.functions.similarity import semdedup

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(60, 8)).tolist()
        vecs += vecs[:10]  # ten exact dups with higher ids
        ds = self._ds(vecs)
        a = (semdedup(ds, n_clusters=4, radius2=0, chunk=3)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
        b = (semdedup(ds, n_clusters=4, radius2=0, chunk=4096)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert (~a["keep"]).sum() == 10

    def test_trained_centroids_balance_skewed_corpus(self, ray_session):
        """centroids='trained' (hash-sample mini k-means) must spread a
        corpus whose LOWEST-id vectors all sit in one tight blob — the
        exact failure mode of seed-by-lowest-id — across clusters."""
        import numpy as np

        from bio_data_validation_ray.functions.similarity import (
            cluster_assign, semdedup)

        rng = np.random.default_rng(3)
        # the LOW-ID HEAD of the corpus — more rows than train_sample=4096,
        # so a sample that secretly prefers low ids would train on the
        # blob alone (the exact bias a monotone id hash reintroduces) —
        # is one tight off-mode blob; the tail spreads over 4 modes
        blob = (rng.normal(scale=0.01, size=(4200, 6)) + 5.0).tolist()
        modes = np.eye(4)
        rest = [(modes[i % 4] * 10
                 + rng.normal(scale=0.05, size=4)).tolist() + [0.0, 0.0]
                for i in range(2000)]
        rest = [r[:6] for r in rest]
        vecs = blob + rest
        ds = self._ds(vecs)
        trained = cluster_assign(ds, n_clusters=4,
                                 centroids="trained").to_pandas()
        # trained centroids must use all 4 clusters AND keep each tight
        # mode pure (all its points share one label) — seed centroids all
        # sit inside the blob, so mode points split on quantization noise
        assert trained["cluster"].nunique() == 4
        lab = trained.sort_values("vec_id")["cluster"].to_numpy()
        mode_of = np.arange(len(rest)) % 4
        for m in range(4):
            labs = lab[len(blob):][mode_of == m]
            assert len(set(labs.tolist())) == 1, f"mode {m} split: {set(labs)}"
        # determinism: same input -> same assignment
        trained2 = cluster_assign(ds, n_clusters=4,
                                  centroids="trained").to_pandas()
        pd.testing.assert_frame_equal(
            trained.sort_values("vec_id").reset_index(drop=True),
            trained2.sort_values("vec_id").reset_index(drop=True))
        # semdedup accepts the same option
        out = (semdedup(ds, n_clusters=4, radius2=0, centroids="trained")
               .to_pandas())
        assert len(out) == len(vecs)

    def test_hash_sample_is_not_a_lowest_id_prefix(self, ray_session):
        """The training sample must be pseudo-random over ids: picking
        the n smallest hashes of sequential ids must not reduce to the n
        smallest ids (a bare Knuth multiply mod 2^64 is order-preserving
        and silently would)."""
        import numpy as np

        from bio_data_validation_ray.functions.similarity import (
            _hash_sample, _mix64)

        n_rows, n = 3000, 500
        vecs = [[float(i), 0.0] for i in range(n_rows)]
        ds = self._ds(vecs)
        samp = _hash_sample(ds, n, "vec_id", "embedding")
        ids = samp[:, 0].astype(int)
        assert len(ids) == n
        assert ids.max() > n * 2, "sample collapsed to the low-id prefix"
        # deterministic across calls and equal to the direct computation
        h = _mix64(np.arange(n_rows))
        expect = np.sort(np.argsort(h)[:n])
        assert (np.sort(ids) == expect).all()

    def test_cluster_cap_bounds_work_and_logs(self, ray_session, caplog):
        """One degenerate cluster: cluster_cap truncates the comparison
        set to the lowest-id prefix with a logged warning; duplicates of
        a PREFIX member still drop, every row still gets a decision, and
        an uncapped run matches a large-cap run exactly."""
        import logging

        import numpy as np

        from bio_data_validation_ray.functions.similarity import semdedup

        rng = np.random.default_rng(9)
        vecs = rng.normal(size=(40, 4)).tolist()
        vecs += [vecs[0]] * 3  # dups of id 0 (always in the prefix)
        ds = self._ds(vecs)
        with caplog.at_level(logging.WARNING,
                             logger="bio_data_validation_ray.functions"
                                    ".similarity"):
            capped = (semdedup(ds, n_clusters=1, radius2=0, cluster_cap=5)
                      .to_pandas().sort_values("vec_id")
                      .reset_index(drop=True))
        assert len(capped) == len(vecs)
        # dups of id 0 compare against the 5-row prefix and still drop
        assert not capped.loc[capped.vec_id >= 40, "keep"].any()
        uncapped = (semdedup(ds, n_clusters=1, radius2=0, cluster_cap=None)
                    .to_pandas().sort_values("vec_id")
                    .reset_index(drop=True))
        big_cap = (semdedup(ds, n_clusters=1, radius2=0, cluster_cap=10_000)
                   .to_pandas().sort_values("vec_id")
                   .reset_index(drop=True))
        pd.testing.assert_frame_equal(uncapped, big_cap)


class TestDupClusters:
    def test_transitive_chain_and_min_label(self):
        from bio_data_validation_ray.functions.dedup import dup_clusters

        pairs = pd.DataFrame({"id_a": [9, 2, 5, 1], "id_b": [2, 3, 6, 9]})
        out = dup_clusters(pairs).set_index("doc_id")["cluster_id"]
        assert out.loc[[1, 2, 3, 9]].tolist() == [1, 1, 1, 1]
        assert out.loc[[5, 6]].tolist() == [5, 5]

    def test_empty_pairs(self):
        from bio_data_validation_ray.functions.dedup import dup_clusters

        out = dup_clusters(pd.DataFrame({"id_a": [], "id_b": []}))
        assert list(out.columns) == ["doc_id", "cluster_id"]
        assert len(out) == 0

    def test_random_graph_matches_networkx_free_reference(self):
        from bio_data_validation_ray.functions.dedup import dup_clusters

        rng = np.random.default_rng(3)
        a = rng.integers(0, 200, 300)
        b = rng.integers(0, 200, 300)
        pairs = pd.DataFrame({"id_a": a, "id_b": b})
        out = dup_clusters(pairs)
        # reference: O(n^2) label propagation to fixpoint
        label = {int(x): int(x) for x in np.union1d(a, b)}
        changed = True
        while changed:
            changed = False
            for u, v in zip(a.tolist(), b.tolist()):
                m = min(label[u], label[v])
                if label[u] != m or label[v] != m:
                    label[u] = label[v] = m
                    changed = True
        exp = pd.DataFrame(sorted(label.items()),
                           columns=["doc_id", "cluster_id"])
        pd.testing.assert_frame_equal(
            out.sort_values("doc_id").reset_index(drop=True),
            exp.astype(np.int64))

    def test_distributed_label_prop_matches_union_find(self, ray_session):
        """dup_clusters_ds (pointer-doubling label propagation, the scale
        path for pair lists that exceed the driver) must equal the driver
        union-find exactly — including a long chain (diameter >> rounds
        without doubling) and a giant-star hot component."""
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import (
            dup_clusters, dup_clusters_ds)

        rng = np.random.default_rng(17)
        pairs = [(i, i + 1) for i in range(100, 164)]      # chain, diam 64
        pairs += [(500, x) for x in range(501, 540)]       # star
        for _ in range(400):                               # random comps
            u, v = (int(x) for x in rng.integers(0, 150, 2))
            if u != v:
                pairs.append((1000 + min(u, v), 1000 + max(u, v)))
        df = pd.DataFrame(pairs, columns=["id_a", "id_b"]).drop_duplicates()
        want = dup_clusters(df).sort_values("doc_id").reset_index(drop=True)
        got = (dup_clusters_ds(rd.from_pandas(df, override_num_blocks=4))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_distributed_label_prop_empty(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import dup_clusters_ds

        out = dup_clusters_ds(rd.from_pandas(
            pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64)})))
        assert out.count() == 0


class TestPrefixScan:
    def test_packed_bins_matches_pandas_scan(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.scan import packed_bins

        rng = np.random.default_rng(11)
        n = 5000
        df = pd.DataFrame({
            "id": rng.permutation(n).astype(np.int64),
            "tok": rng.integers(1, 300, n).astype(np.int64),
        })
        ds = rd.from_pandas([df.iloc[i:i + 333].reset_index(drop=True)
                             for i in range(0, n, 333)])
        out = packed_bins(ds, order_col="id", value_col="tok",
                          capacity=1000)
        s = df.sort_values("id").reset_index(drop=True)
        before = s["tok"].cumsum() - s["tok"]
        exp = (pd.DataFrame({"bin": before // 1000, "tok": s["tok"]})
               .groupby("bin", as_index=False)
               .agg(n_docs=("tok", "size"), sum_tokens=("tok", "sum")))
        for c in exp.columns:
            exp[c] = exp[c].astype(np.int64)
        pd.testing.assert_frame_equal(out, exp)
        # bins fill to capacity: every bin except possibly the last ends
        # because the next doc would start at/after the boundary
        assert (out["sum_tokens"].iloc[:-1] + 300 >= 1000).all()

    def test_block_prefix_offsets_empty(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.scan import (
            block_prefix_offsets,
        )

        ds = rd.from_pandas(pd.DataFrame({"id": [], "v": []})).materialize()
        assert block_prefix_offsets(ds, "id", "v") in ({},)


class TestTfidf:
    def _docs(self):
        return pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["the cat sat", "the the the", "cat cat dog",
                     "", "unique words only here", "dog the cat"],
        })

    def test_matches_bruteforce_and_block_invariant(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.textstats import tfidf_scores

        docs = self._docs()
        outs = []
        for blocks in (1, 5):
            ds = rd.from_pandas(docs).repartition(blocks)
            out = tfidf_scores(ds, concurrency=2).to_pandas()
            outs.append(out.sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        out = outs[0]
        # brute-force twin: integer ppm idf over pandas
        e = (docs.assign(word=docs["text"].str.split())
             .explode("word").dropna(subset=["word"]))
        n = len(docs)
        dfreq = e.drop_duplicates(["doc_id", "word"])["word"].value_counts()
        tf = e.groupby(["doc_id", "word"], as_index=False).size()
        idf = np.floor((1e6 * n) / dfreq.loc[tf["word"]].to_numpy() + 0.5)
        tf["s"] = tf["size"].to_numpy() * idf.astype(np.int64)
        tot = tf.groupby("doc_id")["s"].sum()
        assert dict(zip(out["doc_id"], out["tfidf_ppm"])) == tot.to_dict()
        # empty doc drops; rarest-word doc's top term is deterministic
        assert 3 not in set(out["doc_id"])
        row4 = out[out["doc_id"] == 4].iloc[0]
        assert row4["top_word"] == "here"  # all unique -> tie on score,
        # broken by word ascending


class TestDecontam:
    def test_hits_and_short_docs(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import (
            bench_shingle_set, decontaminate,
        )

        bench = ["a b c d e f g h i j", "short doc"]
        grams = bench_shingle_set(bench, n=8)
        # 10-word doc -> 3 distinct 8-grams; whole short doc counts as one
        assert "a b c d e f g h" in grams and "short doc" in grams
        train = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "x y z a b c d e f g h i j",   # 2 shared 8-grams (suffix)
                "nothing in common here at all with anyone anywhere",
                "short doc",                    # exact short-text match
                "a b c d e f g q",             # near miss: no shared 8-gram
            ],
        })
        out = decontaminate(
            rd.from_pandas(train).repartition(2), bench, n=8, concurrency=2,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["contaminated"].tolist() == [1, 0, 1, 0]
        assert out.loc[0, "n_hits"] == 3  # b..i, c..j and a..h via suffix
        assert out.loc[2, "n_hits"] == 1


class TestSharedWindowDocs:
    def test_planted_exact_substrings(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import (
            shared_window_docs,
        )

        shared = "X" * 5 + "the quick brown fox jumps over it all" + "Y" * 5
        assert len(shared) >= 32
        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "aaa" + shared + "bbb",         # shares `shared` windows
                "ccc" + shared + "ddd",         # with doc 1
                "unrelated " + "z" * 60,        # alone
                "short",                        # < 32 bytes -> no windows
                ("p" * 40) + ("p" * 40),        # internal repeat only
            ],
        })
        out = shared_window_docs(rd.from_pandas(df).repartition(3),
                                 window=32)
        got = dict(zip(out["doc_id"], out["n_shared_windows"]))
        # docs 1 and 2 share exactly the windows inside `shared`
        n_wins = len(shared) - 32 + 1
        assert got == {1: n_wins, 2: n_wins}

    def test_non_ascii_windows_group_on_bytes(self, ray_session):
        """Byte-distinct windows whose decode-ignore forms COLLIDE (window
        slicing splits a multibyte char: a9|61.. and a8|61.. both strip to
        'abcdefg') must stay distinct groups; the per-doc count is checked
        against a byte-level brute force over every doc pair."""
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import (
            shared_window_docs,
        )

        w = 8
        texts = {
            1: "\u00e9abcdefg--pad--\u00e8abcdefg",  # shares with 2 AND 3
            2: "\u00e9abcdefgZZ",                     # é-windows with 1
            3: "\u00e8abcdefgQQ",                     # è-windows with 1
            4: "no overlap here at all 123456",
        }
        df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        out = shared_window_docs(rd.from_pandas(df).repartition(4),
                                 window=w)
        got = dict(zip(out["doc_id"], out["n_shared_windows"]))

        def wins(s):
            bb = s.encode("utf-8")
            return {bb[i:i + w] for i in range(len(bb) - w + 1)}

        allw = {d: wins(t) for d, t in texts.items()}
        want = {}
        for d, wd in allw.items():
            others = set().union(*(v for k, v in allw.items() if k != d))
            n = len(wd & others)
            if n:
                want[d] = n
        # the construction really exercises the decode collision: doc 1
        # carries byte-distinct windows from both the \u00e9 and \u00e8
        # regions that strip to identical ascii
        a9 = "\u00e9abcdefg".encode()[1:1 + w]
        a8 = "\u00e8abcdefg".encode()[1:1 + w]
        assert a9 != a8
        assert (a9.decode("utf-8", "ignore")
                == a8.decode("utf-8", "ignore"))
        assert got == want

    def test_no_dups_returns_empty(self, ray_session):
        import ray.data as rd

        from bio_data_validation_ray.functions.dedup import (
            shared_window_docs,
        )

        df = pd.DataFrame({"doc_id": [1, 2],
                           "text": ["a" * 20 + "b" * 20,
                                    "c" * 20 + "d" * 20]})
        out = shared_window_docs(rd.from_pandas(df), window=32)
        assert len(out) == 0


def test_drift_ks_exact_matches_bruteforce(ray_session):
    """The integer-rational KS must equal the float KS computed naively
    from the raw per-shard length samples."""
    import glob

    from bio_data_validation_ray.pipelines.queries import (
        t_drift_ks_exact,
        transcripts_dir,
    )

    sf = "/root/testdata/sf0.001"
    out = t_drift_ks_exact(sf)
    assert len(out) > 0 and (out["ks_num"] <= out["ks_den"]).all()
    frames = [pd.read_parquet(p).assign(shard=p.rsplit("/", 1)[-1])
              for p in sorted(glob.glob(transcripts_dir(sf) + "/*.parquet"))]
    df = pd.concat(frames, ignore_index=True)
    df = df[df["text"].notna()]
    df["len"] = df["text"].str.len()
    base = np.sort(df["len"].to_numpy())
    grid = np.unique(base)
    fb = np.searchsorted(base, grid, side="right") / base.size
    for r in out.itertuples():
        s = np.sort(df.loc[df["shard"] == r.shard, "len"].to_numpy())
        fs = np.searchsorted(s, grid, side="right") / s.size
        ks = np.max(np.abs(fs - fb))
        assert abs(r.ks_num / r.ks_den - ks) < 1e-12, r.shard
