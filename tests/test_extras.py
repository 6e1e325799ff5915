"""Validation for the training-data-pipeline extras: dedup family,
similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    from verdictray.corpus import generate_corpus

    return generate_corpus("/tmp/vr_corpus_test", 20_000, seed=42)


# ------------------------------------------------------------------ dedup
class TestMinHashDedup:
    def test_finds_exact_duplicates_in_corpus(self, ray_session, corpus):
        """The generated corpus has ~5% exact content dups (row i copies
        i-1 when i%20==0): jaccard=1.0 pairs that LSH must recall 100%."""
        import duckdb
        import ray.data as rd

        from verdictray.dedup import minhash_dedup_pairs

        # NOTE shingle_k: the synthetic corpus draws from a ~540-token
        # vocabulary, so 5-byte shingles are shared by EVERY doc and LSH
        # would bucket everything together; 14-byte shingles span 2-3
        # tokens and discriminate. Real prose needs no such tuning.
        docs = (
            rd.read_parquet(corpus, columns=["path", "content"])
            .limit(1500)
            .map_batches(
                lambda b: pa.table({
                    "doc_id": pa.array(
                        [int(__import__("re").search(r"/f(\d+)\.", p).group(1))
                         for p in b["path"].to_pylist()],
                        pa.int64()),
                    "text": b["content"],
                }),
                batch_format="pyarrow",
            )
        )
        pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.8,
                                    num_perm=64, bands=8, shingle_k=14).to_pandas()
        # ground truth exact-dup pairs among the first 1500 rows
        truth = duckdb.sql(
            f"""with d as (select cast(regexp_extract(path, 'f(\\d+)\\.', 1) as bigint) id, content
                 from '{corpus}/*.parquet' where cast(regexp_extract(path, 'f(\\d+)\\.', 1) as bigint) < 1500)
               select a.id, b.id from d a join d b on a.content = b.content and a.id < b.id"""
        ).fetchall()
        found = set(zip(pairs.id_a, pairs.id_b))
        missing = [t for t in truth if t not in found]
        assert not missing, f"missed {len(missing)}/{len(truth)} exact-dup pairs"
        # precision: every returned pair really has jaccard >= threshold
        assert (pairs.jaccard >= 0.8).all()

    def test_clusters_and_drop(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from verdictray.dedup import drop_neardups, neardup_clusters

        pairs = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
        roots = neardup_clusters(pairs)
        assert roots[1] == roots[2] == roots[3] == 1
        assert roots[10] == roots[11] == 10
        ds = rd.from_arrow(__import__("pyarrow").table(
            {"doc_id": list(range(15))}))
        kept = sorted(drop_neardups(ds, pairs, "doc_id").to_pandas().doc_id)
        assert kept == [0, 1, 4, 5, 6, 7, 8, 9, 10, 12, 13, 14]

    def test_distributed_clusters_match_union_find(self, ray_session):
        """Min-label propagation (the scale fallback) produces the same
        {id: min-id-of-component} map as driver union-find, including on a
        long chain (forces several propagation rounds) and on real LSH
        pairs from the corpus."""
        import pandas as pd
        import ray.data as rd

        from verdictray.dedup import (neardup_clusters,
                                      neardup_clusters_distributed)

        # chain 0-1-2-...-12 (diameter 12), a triangle, and an isolated pair
        edges = [(i, i + 1) for i in range(12)] + \
                [(20, 21), (21, 22), (20, 22), (30, 31)]
        df = pd.DataFrame(edges, columns=["id_a", "id_b"])
        want = neardup_clusters(df)
        got_ds = neardup_clusters_distributed(
            rd.from_pandas(df).repartition(4)).to_pandas()
        got = dict(zip(got_ds.nd, got_ds.lbl))
        assert got == want

    def test_distributed_drop_matches_driver_drop(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from verdictray.dedup import drop_neardups

        pairs = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(15), pa.int64()),
                                     "tag": [f"t{i}" for i in range(15)]}))
        drv = drop_neardups(ds, pairs, "doc_id", mode="driver").to_pandas()
        dist = drop_neardups(ds, rd.from_pandas(pairs), "doc_id",
                             mode="distributed").to_pandas()
        canon = lambda d: d.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "tag"]]
        pd.testing.assert_frame_equal(canon(drv), canon(dist))

    def test_jaccard_exact(self):
        from verdictray.dedup import ngram_jaccard

        assert ngram_jaccard(b"hello world", b"hello world") == 1.0
        assert ngram_jaccard(b"abcdefgh", b"zzzzzzzz") == 0.0
        mid = ngram_jaccard(b"the quick brown fox jumps", b"the quick brown cat jumps")
        assert 0.2 < mid < 0.9


class TestSimHash:
    def test_identical_zero_hamming(self):
        from verdictray.dedup import simhash64

        a = simhash64(b"some document content here", 5)
        b = simhash64(b"some document content here", 5)
        assert a == b

    def test_similar_low_distant_high(self):
        from verdictray.dedup import simhash64

        base = b"the quick brown fox jumps over the lazy dog " * 10
        near = base[:-20] + b"the lazy cat instead"
        far = b"completely different words entirely elsewhere " * 10
        d_near = bin(simhash64(base) ^ simhash64(near)).count("1")
        d_far = bin(simhash64(base) ^ simhash64(far)).count("1")
        assert d_near < d_far

    def test_pipeline_finds_exact_dups(self, ray_session):
        import ray.data as rd

        from verdictray.dedup import simhash_dedup_pairs

        texts = [f"unique document number {i} with plenty of text " * 5 for i in range(50)]
        texts[10] = texts[3]  # exact dup
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(50), pa.int64()),
                                     "text": pa.array(texts, pa.string())}))
        pairs = simhash_dedup_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
        assert (3, 10) in set(zip(pairs.id_a, pairs.id_b))


# ------------------------------------------------------------------ similarity
class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, sf01_dir):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf01_dir}/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        return ids, mat

    def test_brute_force_matches_numpy(self, ray_session, sf01_dir, emb):
        import ray.data as rd

        from verdictray.similarity import ann_brute_force

        ids, mat = emb
        q = mat[:3]
        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = ann_brute_force(ds, q, ids[:3], "embedding", "vec_id", k=5).to_pandas()

        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for qi in range(3):
            sims = nm[qi] @ nm.T
            sims[qi] = -np.inf
            expect = ids[np.argsort(-sims, kind="stable")[:5]]
            got = out[out.query_id == ids[qi]].sort_values("rank").neighbor_id.to_numpy()
            assert set(got) == set(expect), (qi, got, expect)

    def test_lsh_recall(self, ray_session, sf01_dir, emb):
        import ray.data as rd

        from verdictray.similarity import ann_brute_force, ann_lsh

        ids, mat = emb
        q = mat[:5]
        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = ann_brute_force(ds, q, ids[:5], "embedding", "vec_id", k=10).to_pandas()
        approx = ann_lsh(ds, q, ids[:5], "embedding", "vec_id", k=10,
                         planes=6, multiprobe=2).to_pandas()
        recalls = []
        for qid in ids[:5]:
            e = set(exact[exact.query_id == qid].neighbor_id)
            a = set(approx[approx.query_id == qid].neighbor_id)
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5, recalls

    def test_embedding_neardup_matches_numpy(self, ray_session, sf01_dir, emb):
        import ray.data as rd

        from verdictray.dedup import embedding_neardup_pairs

        ids, mat = emb
        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        got = embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.45).to_pandas()
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = nm @ nm.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= 0.45
        expect = set(zip(ids[iu[0][mask]], ids[iu[1][mask]]))
        assert set(zip(got.id_a, got.id_b)) == expect


# ------------------------------------------------------------------ text
class TestCurate:
    def test_end_to_end_curation(self, ray_session):
        """curate.curate_documents: quality filter drops junk, exact dedup
        keeps the min-id copy, near-dup drop keeps one cluster rep."""
        import ray.data as rd

        from verdictray.curate import curate_documents

        good = ("the quick brown fox jumps over the lazy dog and then "
                "runs into the forest to find some food for the winter, "
                "because it is a hungry fox that likes to eat in the cold")
        other = ("a completely different document about the weather in "
                 "the mountains where it snows a lot during the winter "
                 "and the rivers freeze over for months at a time there")
        rows = {
            1: good,
            2: other,
            3: good.replace("hungry", "clever"),   # near-dup of 1
            4: "!!!???!!!***(((%%%)))!!!???",       # low quality -> dropped
            5: other,                                # exact dup of 2
            6: "same line\n" * 50,                   # repetitive -> dropped
            7: "the small house is on the hill and it has a red roof "
               "with a chimney that smokes in the evening when it is cold",
        }
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(rows), pa.int64()),
            "lang": pa.array(["en"] * len(rows)),
            "text": pa.array(list(rows.values())),
        })).repartition(3)
        kept = sorted(curate_documents(ds, minhash_threshold=0.5,
                                       shingle_k=8).to_pandas().doc_id)
        # 4 & 6 fail quality; 5 loses exact dedup to 2; 3 loses the
        # near-dup cluster to 1 (min-id representative)
        assert kept == [1, 2, 7]


class TestText:
    def test_token_count_matches_duckdb(self):
        import duckdb

        from verdictray.text import with_token_count

        texts = ["one two  three", "  padded  ", "single", "a b c d e"]
        t = with_token_count(pa.table({"text": pa.array(texts)}))
        expect = [duckdb.sql(
            rf"select len(regexp_split_to_array(trim('{s}'), '\s+'))").fetchone()[0]
            for s in texts]
        assert t["n_tokens"].to_pylist() == expect

    def test_fingerprint_pure_function_of_text(self):
        from verdictray.text import fingerprint64

        a = fingerprint64(pa.array(["doc one", "doc two", "doc one"]))
        assert a[0] == a[2] and a[0] != a[1]

    def test_lang_id_on_marker_texts(self):
        from verdictray.text import with_lang_id

        t = with_lang_id(pa.table({"text": pa.array([
            "this is the house and the garden of that man",
            "das ist der Mann und die Frau in das Haus",
            "le chat est dans la maison avec les enfants",
            "el perro es grande y los gatos una casa",
            "xyzzy qwerty",
        ])}))
        assert t["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "und"]

    def test_explode_tokens_matches_duckdb_unnest(self):
        import duckdb

        from verdictray.text import explode_tokens

        texts = ["One two  TWO", "  padded text ", "", "a\nb\tc"]
        langs = ["en", "en", "fr", "de"]
        t = explode_tokens(pa.table({"text": pa.array(texts),
                                     "lang": pa.array(langs)}))
        got = sorted(zip(t["lang"].to_pylist(), t["token"].to_pylist()))
        want = []
        for s, lg in zip(texts, langs):
            rows = duckdb.sql(
                rf"select unnest(regexp_split_to_array(lower('{s}'), '\s+'))"
            ).fetchall()
            want += [(lg, r[0]) for r in rows if r[0] != ""]
        assert got == sorted(want)

    def test_token_counts_combine_preserves_totals(self):
        """The per-batch (lang, token) combine must give the same totals as
        raw explode regardless of how rows are batched."""
        import pandas as pd

        from verdictray.text import explode_tokens, token_counts

        t = pa.table({"text": pa.array(["a b a", "b c", "a"]),
                      "lang": pa.array(["en", "en", "fr"])})
        raw = explode_tokens(t).to_pandas().groupby(["lang", "token"]).size()
        combined = pd.concat([token_counts(t.slice(i, 1)).to_pandas()
                              for i in range(len(t))]) \
            .groupby(["lang", "token"])["n"].sum()
        assert dict(raw) == dict(combined)

    def test_quality_score_orders_sensibly(self):
        from verdictray.text import with_quality_features

        good = "The quick brown fox jumps over the lazy dog and runs through the field " * 4
        bad = "@@## !! ???? ## @@ !!"
        t = with_quality_features(pa.table({"text": pa.array([good, bad])}))
        scores = t["quality_score"].to_pylist()
        assert scores[0] > scores[1]


# ------------------------------------------------------------------ multimodal
# NOTE: the toy codec factories below are defined INSIDE each test, not at
# module level — cloudpickle serializes nested functions by value, while a
# module-level function pickles as a reference to `test_extras`, which Ray
# WORKERS cannot import (tests/ is only on the pytest driver's sys.path);
# the worker then dies with a SYSTEM_ERROR and the actor pool restarts it
# forever (observed as an infinite hang, not a failure).
class TestMultimodal:
    def test_real_codec_is_stubbed(self):
        from verdictray.multimodal import (DecodeStage, FrameSampleStage,
                                           ResizeStage)

        with pytest.raises(NotImplementedError):
            DecodeStage(codec="real")
        with pytest.raises(NotImplementedError):
            ResizeStage(8, 8, codec="real")
        with pytest.raises(NotImplementedError):
            FrameSampleStage(codec="real")

    def test_injected_decoder_through_actor_pool(self, ray_session):
        """The codec seam (VERDICT r3 item 8): a user decoder_factory runs
        once per actor and drives codec='real' end-to-end through the
        actor-pool map_batches path. The factory is a NESTED function so
        cloudpickle ships it by value (see module note above)."""
        import ray.data as rd

        from verdictray.multimodal import decode_features

        def toy_decoder_factory():
            def decode(b: bytes):
                import numpy as np

                return np.array([len(b), b[0] if b else 0,
                                 b[-1] if b else 0, 1.0], dtype=np.float32)

            return decode

        payloads = [bytes([i]) * (i + 1) for i in range(40)]
        ds = rd.from_arrow(pa.table({
            "media_id": pa.array(range(40), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }))
        out = decode_features(
            ds, codec="real", feature_dim=4, batch_size=8, concurrency=2,
            decoder_factory=toy_decoder_factory).to_pandas()
        out = out.sort_values("media_id").reset_index(drop=True)
        assert len(out) == 40
        for i, f in enumerate(out.features):
            exp = toy_decoder_factory()(payloads[i])
            assert np.allclose(np.asarray(f), exp)

        # a wrong-dimension decoder fails loudly, not silently (exercised
        # WITHOUT the actor pool: a UserCodeException aborts execution,
        # but a pool would also restart-loop a worker that dies outside
        # user code, so keep the negative path local and deterministic)
        from verdictray.multimodal import DecodeStage

        tbl = pa.table({"media_id": pa.array([1], pa.int64()),
                        "payload": pa.array([b"xy"], pa.binary())})
        stage = DecodeStage(codec="real", feature_dim=7,
                            decoder_factory=toy_decoder_factory)
        with pytest.raises(ValueError, match="features"):
            stage(tbl)

    def test_injected_resizer_and_sampler(self, ray_session):
        from verdictray.multimodal import FrameSampleStage, ResizeStage

        def toy_resizer_factory():
            def resize(b: bytes, w: int, h: int) -> bytes:
                return b[: w * h * 3]

            return resize

        def toy_sampler_factory():
            def sample(b: bytes, n: int):
                step = max(1, len(b) // n)
                return [b[i * step:(i + 1) * step] for i in range(n)]

            return sample

        tbl = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"abcdefgh", b"ij"], pa.binary()),
        })
        r = ResizeStage(2, 2, codec="real",
                        resizer_factory=toy_resizer_factory)(tbl)
        assert r["payload"].to_pylist() == [b"abcdefgh"[:12], b"ij"]
        assert r["width"].to_pylist() == [2, 2]

        s = FrameSampleStage(n_frames=2, codec="real",
                             sampler_factory=toy_sampler_factory)(tbl)
        assert len(s) == 4
        assert s["payload"].to_pylist() == [b"abcd", b"efgh", b"i", b"j"]

    def test_fake_decode_deterministic_schema(self, ray_session):
        import ray.data as rd

        from verdictray.multimodal import DEFAULT_FEATURE_DIM, decode_features

        payloads = [f"payload-{i}".encode() for i in range(100)]
        ds = rd.from_arrow(pa.table({
            "media_id": pa.array(range(100), pa.int64()),
            "mime": pa.array(["image/png"] * 100),
            "payload": pa.array(payloads, pa.binary()),
        }))
        out = decode_features(ds, batch_size=16, concurrency=2)
        t = out.to_pandas()
        assert list(t.columns) == ["media_id", "mime", "n_bytes", "features"]
        assert all(len(f) == DEFAULT_FEATURE_DIM for f in t.features)
        assert (t.n_bytes == [len(p) for p in payloads]).all()
        # deterministic: same payload → same features
        t2 = decode_features(ds, batch_size=32, concurrency=2).to_pandas()
        m1 = t.sort_values("media_id").features.tolist()
        m2 = t2.sort_values("media_id").features.tolist()
        assert all((np.asarray(x) == np.asarray(y)).all() for x, y in zip(m1, m2))

    def test_large_payloads_small_batches(self, ray_session):
        """Memory-aware batching: 2MB payloads stream through the decode
        stage with batch_size=4 without materializing the payload column
        downstream (it is dropped after decode)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from verdictray.multimodal import decode_features

        rng = np.random.default_rng(0)
        payloads = [rng.integers(0, 256, size=2_000_000, dtype=np.uint8).tobytes()
                    for _ in range(12)]
        ds = rd.from_arrow(pa.table({
            "media_id": pa.array(range(12), pa.int64()),
            "mime": pa.array(["application/octet-stream"] * 12),
            "payload": pa.array(payloads, pa.binary()),
        }))
        out = decode_features(ds, batch_size=4, concurrency=2).to_pandas()
        assert len(out) == 12
        assert "payload" not in out.columns
        assert (out.n_bytes == 2_000_000).all()


# ------------------------------------------------- scale-path equivalence (r2)
class TestScaleSafeVerify:
    """The 10^12-scale verify paths must answer exactly like the
    driver-materializing fast paths they replace (VERDICT r1 items 2-4)."""

    def test_minhash_join_verify_equals_broadcast(self, ray_session, sf01_dir):
        import pandas as pd
        import ray.data as rd

        from verdictray.dedup import minhash_dedup_pairs

        docs = rd.read_parquet(f"{sf01_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        kw = dict(threshold=0.5, num_perm=64, bands=8, shingle_k=14)

        def canon(df):
            return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

        bc = canon(minhash_dedup_pairs(docs, "text", "doc_id",
                                       verify_mode="broadcast", **kw).to_pandas())
        jn = canon(minhash_dedup_pairs(docs, "text", "doc_id",
                                       verify_mode="join", **kw).to_pandas())
        assert len(bc) > 0
        pd.testing.assert_frame_equal(bc, jn.astype(bc.dtypes.to_dict()))

    def test_embedding_lsh_recall_vs_exact(self, ray_session, sf01_dir):
        import ray.data as rd

        from verdictray.dedup import embedding_neardup_pairs

        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                        threshold=0.45, mode="exact").to_pandas()
        lsh = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                      threshold=0.45, mode="lsh").to_pandas()
        e = set(zip(exact.id_a, exact.id_b))
        l = set(zip(lsh.id_a, lsh.id_b))
        assert len(e) > 0
        assert l <= e, f"LSH emitted pairs the exact path rejects: {l - e}"
        assert len(e & l) / len(e) >= 0.95, f"recall {len(e & l)/len(e)} < 0.95"

    def test_auto_mode_picks_fast_path_for_small_input(self, ray_session, sf01_dir):
        """size_bytes of the tiny driver table is known and under the
        limit → auto resolves to the broadcast/exact paths (and still
        answers identically, per the two tests above)."""
        import ray.data as rd

        from verdictray.dedup import _dataset_small_enough

        ds = rd.read_parquet(f"{sf01_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        assert _dataset_small_enough(ds, 64 << 20)
        assert not _dataset_small_enough(ds, 10)

    def test_dropped_bucket_counter_fires(self, ray_session, tmp_path):
        """A constructed hot bucket (identical docs beyond max_bucket) must
        emit a JSONL drop record — no silent truncation (ADVICE r1)."""
        import json

        import ray.data as rd

        from verdictray.dedup import minhash_dedup_pairs

        n = 40
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["identical hot-bucket document body " * 4] * n),
        })).repartition(4)
        mdir = str(tmp_path / "dedup_metrics")
        pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5,
                                    num_perm=64, bands=8, shingle_k=14,
                                    max_bucket=8, metrics_dir=mdir).to_pandas()
        assert len(pairs) == 0  # every bucket was over-cap → all dropped
        import glob

        recs = []
        for p in glob.glob(f"{mdir}/dropped-*.jsonl"):
            with open(p) as f:
                recs.extend(json.loads(x) for x in f if x.strip())
        assert recs, "no dropped-bucket record emitted"
        assert all(r["size"] == n and r["algo"] == "minhash" for r in recs)
        assert all(r["dropped_pairs"] == n * (n - 1) // 2 for r in recs)

    def test_dedup_exact_narrow_equals_wide(self, ray_session, sf01_dir):
        """dedup_exact_narrow (fingerprint shuffle + winner rejoin) keeps
        exactly one row per distinct text, deterministically (min doc_id)."""
        import duckdb
        import ray.data as rd

        from verdictray.ops import dedup_exact_narrow

        ds = rd.read_parquet(f"{sf01_dir}/documents.parquet",
                             columns=["doc_id", "lang", "text"])
        kept = dedup_exact_narrow(ds, "text", "doc_id").to_pandas()
        truth = duckdb.sql(
            f"select min(doc_id) doc_id, text from "
            f"'{sf01_dir}/documents.parquet' group by text"
        ).df()
        assert len(kept) == len(truth)
        assert set(kept.doc_id) == set(truth.doc_id)
        assert set(kept.columns) == {"doc_id", "lang", "text"}


class TestAnnIvf:
    def test_ivf_recall_vs_exact(self, ray_session, sf01_dir):
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from verdictray.similarity import ann_brute_force, ann_ivf

        t = pq.read_table(f"{sf01_dir}/embeddings.parquet").slice(0, 5)
        q = np.stack(t["embedding"].to_pandas().to_numpy())
        ids = t["vec_id"].to_numpy()
        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        exact = ann_brute_force(ds, q, ids, "embedding", "vec_id", k=10).to_pandas()
        approx = ann_ivf(ds, q, ids, "embedding", "vec_id", k=10,
                         n_centroids=16, nprobe=6).to_pandas()
        recalls = []
        for qid in ids:
            e = set(exact[exact.query_id == qid].neighbor_id)
            a = set(approx[approx.query_id == qid].neighbor_id)
            recalls.append(len(e & a) / len(e))
        assert sum(recalls) / len(recalls) >= 0.8, recalls

    def test_centroids_deterministic(self, ray_session, sf01_dir):
        import numpy as np
        import ray.data as rd

        from verdictray.similarity import build_ivf_centroids

        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        a = build_ivf_centroids(ds, "embedding", n_centroids=8, seed=3)
        b = build_ivf_centroids(ds, "embedding", n_centroids=8, seed=3)
        assert np.array_equal(a, b)

    def test_indexed_layout_prunes_io_and_matches_filter_path(
            self, ray_session, sf01_dir, tmp_path):
        """build_ivf_index + ann_ivf_indexed: (a) the probe run opens only
        the probed ivf_cell= partition dirs — strictly fewer than exist;
        (b) rows are identical to the compute-side ann_ivf filter path
        given the same centroids/nprobe."""
        import os

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq
        import ray.data as rd

        from verdictray.similarity import (_normalize, _probe_cells, ann_ivf,
                                           ann_ivf_indexed, build_ivf_index)

        t = pq.read_table(f"{sf01_dir}/embeddings.parquet").slice(0, 5)
        q = np.stack(t["embedding"].to_pandas().to_numpy())
        ids = t["vec_id"].to_numpy()
        ds = rd.read_parquet(f"{sf01_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        idx = str(tmp_path / "ivf_index")
        centroids = build_ivf_index(ds, idx, "embedding", n_centroids=16)

        cell_dirs = [d for d in os.listdir(idx) if d.startswith("ivf_cell=")]
        # nprobe=2: at this tiny scale 5 queries x 6 probes union to every
        # cell; 2 probes demonstrates the pruning property the layout buys
        probed = _probe_cells(centroids,
                              _normalize(np.asarray(q, np.float64)), nprobe=2)
        assert len(probed) < len(cell_dirs), (probed, cell_dirs)

        def canon(tbl):
            return tbl.to_pandas().sort_values(
                ["query_id", "rank"]).reset_index(drop=True)

        indexed = canon(ann_ivf_indexed(idx, q, ids, "embedding", "vec_id",
                                        k=10, nprobe=2))
        filtered = canon(ann_ivf(ds, q, ids, "embedding", "vec_id", k=10,
                                 centroids=centroids, nprobe=2))
        pd.testing.assert_frame_equal(indexed, filtered)


class TestMultimodalStages:
    """r2: resize + frame-sample plumbing (stub codecs, real Ray wiring)."""

    def test_resize_stage_updates_payload_and_metadata(self):
        from verdictray.multimodal import ResizeStage

        t = pa.table({
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"img-a" * 100, b"img-b"], pa.binary()),
        })
        out = ResizeStage(target_w=8, target_h=4)(t)
        assert [len(b) for b in out["payload"].to_pylist()] == [8 * 4 * 3] * 2
        assert out["width"].to_pylist() == [8, 8]
        assert out["height"].to_pylist() == [4, 4]
        # deterministic
        out2 = ResizeStage(target_w=8, target_h=4)(t)
        assert out["payload"].to_pylist() == out2["payload"].to_pylist()

    def test_resize_real_codec_raises(self):
        from verdictray.multimodal import ResizeStage

        with pytest.raises(NotImplementedError):
            ResizeStage(target_w=8, target_h=8, codec="real")

    def test_frame_sample_explodes_rows(self, ray_session):
        import ray.data as rd

        from verdictray.multimodal import decode_features, sample_frames

        media = rd.from_arrow(pa.table({
            "media_id": pa.array([10, 11], pa.int64()),
            "payload": pa.array([bytes(range(256)) * 4, b"tiny"], pa.binary()),
        }))
        frames = sample_frames(media, n_frames=4, concurrency=1)
        df = frames.to_pandas()
        assert len(df) == 8
        assert sorted(df.frame_idx.unique()) == [0, 1, 2, 3]
        # frames flow into the decode stage unchanged
        feats = decode_features(frames, concurrency=1).to_pandas()
        assert len(feats) == 8
        assert {"features", "n_bytes"} <= set(feats.columns)


class TestEntropyVocab:
    def test_token_entropy_known_answer(self, ray_session):
        import numpy as np
        import ray.data as rd

        from verdictray.text import token_entropy

        # "a a b" per doc → counts a:4, b:2 → H = ln6 − (4ln4 + 2ln2)/6
        ds = rd.from_arrow(pa.table({
            "lang": ["py", "py"], "text": ["a a b", "b A a"]}))
        out = token_entropy(ds, keep=("lang",)).to_pandas()
        h = np.log(6) - (4 * np.log(4) + 2 * np.log(2)) / 6
        assert out.loc[0, "total_tokens"] == 6
        assert out.loc[0, "distinct_tokens"] == 2
        assert abs(out.loc[0, "entropy"] - round(h, 4)) < 1e-9

    def test_build_vocab_rank_min_count_and_ties(self, ray_session):
        import ray.data as rd

        from verdictray.text import build_vocab

        ds = rd.from_arrow(pa.table({
            "text": ["x x x y y z", "y x w", "q"]})).repartition(2)
        out = build_vocab(ds, size=2, min_count=2).to_pandas()
        # counts: x=4, y=3, z=1, w=1, q=1 → vocab [x, y]; z/w/q cut
        assert list(out["token"]) == ["x", "y"]
        assert list(out["token_id"]) == [1, 2]
        assert list(out["cnt"]) == [4, 3]
        # tie-break: equal counts rank alphabetically
        ds2 = rd.from_arrow(pa.table({"text": ["b a", "a b"]}))
        out2 = build_vocab(ds2, size=2, min_count=1).to_pandas()
        assert list(out2["token"]) == ["a", "b"]


class TestEditDistJoin:
    def test_levenshtein_leq_banded_matches_duckdb(self):
        import duckdb
        import numpy as np

        from verdictray.dedup import levenshtein_leq

        rng = np.random.default_rng(11)
        alpha = list("abcde")
        for _ in range(500):
            a = "".join(rng.choice(alpha, rng.integers(0, 9)))
            b = "".join(rng.choice(alpha, rng.integers(0, 9)))
            true = duckdb.sql(f"select levenshtein('{a}','{b}')").fetchone()[0]
            for d in (1, 2, 3):
                assert levenshtein_leq(a, b, d) == (true if true <= d else None)

    def test_pairs_exact_vs_bruteforce_d1_and_d2(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from verdictray.dedup import editdist_neardup_pairs

        # substitution, deletion, insertion, and far-apart strings
        names = ["alpha", "alpho", "alph", "alphax", "beta", "betta",
                 "gamma", "gamm", "delta", "zeta", "zzzzz"]
        df = pd.DataFrame({"id": range(len(names)), "name": names})
        ds = rd.from_pandas(df).repartition(3)
        duckdb.register("names_t", df)
        for d in (1, 2):
            mine = (editdist_neardup_pairs(ds, "name", "id", max_dist=d)
                    .to_pandas().sort_values(["id_a", "id_b"])
                    .reset_index(drop=True))
            exact = duckdb.sql(
                f"select a.id as id_a, b.id as id_b, "
                f"CAST(levenshtein(a.name, b.name) AS BIGINT) as dist "
                f"from names_t a join names_t b on a.id < b.id "
                f"and levenshtein(a.name, b.name) <= {d} "
                f"order by id_a, id_b").df()
            assert mine.values.tolist() == exact.values.tolist(), d

    def test_overfull_bucket_dropped_and_logged(self, ray_session, tmp_path):
        import json

        import pandas as pd
        import ray.data as rd

        from verdictray.dedup import editdist_neardup_pairs

        # 10 identical strings: one variant bucket of size 10 > max_bucket
        df = pd.DataFrame({"id": range(10), "name": ["same"] * 10})
        ds = rd.from_pandas(df)
        mdir = str(tmp_path / "m")
        out = editdist_neardup_pairs(ds, "name", "id", max_dist=1,
                                     max_bucket=5, metrics_dir=mdir
                                     ).to_pandas()
        assert len(out) == 0
        recs = [json.loads(line) for p in __import__("pathlib").Path(mdir).glob("*.jsonl")
                for line in open(p)]
        assert any(r.get("algo") == "editdist" for r in recs)


class TestRedaction:
    def test_rules_fire_in_order_and_counts(self, ray_session):
        from verdictray.text import redact_text

        b = pa.table({"t": [
            "mail bob.smith+x@corp.example.com from 10.0.3.7 "
            "call +1-415-555-0199 ref 12345",
            "no pii here",
            "a@b.io and c@d.org",
            "+4930123456789 twice +4930123456789",
        ]})
        out = redact_text(b, "t", count=True)
        assert out["t_redacted"].to_pylist() == [
            "mail <EMAIL> from <IP> call <PHONE> ref <NUM>",
            "no pii here",
            "<EMAIL> and <EMAIL>",
            "<PHONE> twice <PHONE>",
        ]
        assert out["n_email"].to_pylist() == [1, 0, 2, 0]
        assert out["n_ipv4"].to_pylist() == [1, 0, 0, 0]
        assert out["n_phone"].to_pylist() == [1, 0, 0, 2]
        # the number fallback only counts digits earlier rules left behind
        assert out["n_number"].to_pylist() == [1, 0, 0, 0]

    def test_matches_duckdb_regexp_replace_chain_fuzz(self, ray_session):
        import duckdb
        import numpy as np

        from verdictray.text import PII_RULES, redact_text

        rng = np.random.default_rng(4)
        frags = ["x", "9", ".", "@", "a@b.co", "1.2.3.4", "+12345678901",
                 " ", "u7@e.io", "256.1.1.1", "..", "@@", "7.8"]
        texts = ["".join(rng.choice(frags, rng.integers(1, 12)))
                 for _ in range(300)]
        mine = redact_text(pa.table({"t": texts}), "t")["t_redacted"].to_pylist()
        expr = "t"
        for _, pat, repl in PII_RULES:
            expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
        duckdb.register("fuzz_t", __import__("pandas").DataFrame({"t": texts}))
        exact = [r[0] for r in
                 duckdb.sql(f"select {expr} from fuzz_t").fetchall()]
        assert mine == exact


class TestPackSequences:
    def _packed(self, ray_session, n=2000, budget=128, buckets=8, parts=5,
                seed=2):
        import pandas as pd
        import ray.data as rd

        from verdictray.curate import pack_sequences

        rng = np.random.default_rng(seed)
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "n_tokens": rng.integers(1, 200, n).astype(np.int64),
        })
        ds = rd.from_pandas(df).repartition(parts)
        out = pack_sequences(ds, budget=budget, buckets=buckets).to_pandas()
        return df, out, budget

    def test_every_doc_exactly_once_and_budget_respected(self, ray_session):
        df, out, budget = self._packed(ray_session)
        assert sorted(out["doc_id"]) == sorted(df["doc_id"])
        merged = out.merge(df, on="doc_id", suffixes=("", "_true"))
        assert (merged["n_tokens"] == merged["n_tokens_true"]).all()
        sums = out.groupby("pack_id").agg(
            tot=("n_tokens", "sum"), n=("doc_id", "size"),
            over=("oversize", "any"))
        # oversize docs (> budget) sit alone in their own flagged pack
        assert (sums.loc[sums["over"], "n"] == 1).all()
        assert (sums.loc[~sums["over"], "tot"] <= budget).all()
        assert (out["oversize"] == (out["n_tokens"] > budget)).to_numpy().all()

    def test_deterministic_under_block_layout(self, ray_session):
        _, a, _ = self._packed(ray_session, parts=1)
        _, b, _ = self._packed(ray_session, parts=11)
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)

    def test_ffd_pack_count_near_optimal(self, ray_session):
        df, out, budget = self._packed(ray_session, n=5000, buckets=8)
        n_packs = out["pack_id"].nunique()
        over = df["n_tokens"] > budget  # forced single-doc packs
        rest = int(df.loc[~over, "n_tokens"].sum())
        lower = int(over.sum()) + -(-rest // budget)  # ceil on packable mass
        # FFD ≤ 11/9·OPT + 1 per bucket; cross-bucket waste ≤ 1 bin/bucket
        assert lower <= n_packs <= int(over.sum() + -(-rest // budget) * 11 / 9) + 2 * 8


class TestSubstringDupStats:
    """Exact substring-span dedup (dedup.substring_dup_stats)."""

    def test_matches_duckdb_and_block_invariant(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        from verdictray.dedup import substring_dup_stats

        W = 8
        exact = duckdb.sql(f"""
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '') AS t
              FROM '{sf_dir}/documents.parquet'),
            pos AS (
              SELECT doc_id, lang, t,
                     unnest(generate_series(1, greatest(len(t)-{W}+1, 0))) AS i
              FROM toks),
            wins AS (
              SELECT DISTINCT doc_id, lang,
                     array_to_string(list_slice(t, i, i+{W}-1), ' ') AS w
              FROM pos),
            dup AS (SELECT lang, w FROM wins GROUP BY lang, w
                    HAVING count(DISTINCT doc_id) >= 2),
            aff AS (SELECT wins.lang, wins.doc_id FROM wins
                    JOIN dup ON wins.lang = dup.lang AND wins.w = dup.w)
            SELECT a.lang, a.n_shared_windows, b.n_docs_affected
            FROM (SELECT lang, CAST(count(*) AS BIGINT) n_shared_windows
                  FROM dup GROUP BY lang) a
            JOIN (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT)
                         n_docs_affected FROM aff GROUP BY lang) b
            USING (lang) ORDER BY lang""").df()
        base = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
        for blocks in (1, 7):
            out = (substring_dup_stats(base.repartition(blocks), "text",
                                       "doc_id", ["lang"], window=W)
                   .to_pandas().sort_values("lang").reset_index(drop=True))
            pdt.assert_frame_equal(out, exact, check_dtype=False)

    def test_window_boundaries_and_cross_doc_masking(self, ray_session):
        import ray.data as rd

        from verdictray.dedup import substring_dup_stats

        # doc 0/1 share a 3-token span; doc 2 ends with the first 2 tokens
        # and doc 3 starts with the last — a window crossing their boundary
        # would fabricate a third match if masking were wrong
        df = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["x a b c y", "z a b c w", "q r a b", "c s t u"],
            "lang": ["en"] * 4,
        })
        out = substring_dup_stats(rd.from_pandas(df).repartition(4), "text",
                                  "doc_id", ["lang"], window=3)
        res = out.to_pandas()
        assert len(res) == 1
        assert res.loc[0, "n_shared_windows"] == 1  # only "a b c"
        assert res.loc[0, "n_docs_affected"] == 2

    def test_short_docs_and_empty_groups(self, ray_session):
        import ray.data as rd

        from verdictray.dedup import substring_dup_stats

        df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "a b"],
                           "lang": ["en", "en"]})
        out = substring_dup_stats(rd.from_pandas(df), "text", "doc_id",
                                  ["lang"], window=3).to_pandas()
        assert len(out) == 0  # no doc long enough for a single window


class TestNgramDecontaminate:
    def test_handcrafted_overlap_and_kept_set(self, ray_session):
        import ray.data as rd

        from verdictray.dedup import ngram_decontaminate

        train = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["the quick brown fox jumps high today",  # shares span
                     "completely unrelated training text here now",
                     "the quick brown fox differs from here on"],  # <3-tok
        })
        evalset = pd.DataFrame({
            "eval_id": [100],
            "eval_text": ["prefix the quick brown fox jumps high suffix"],
        })
        kept, contaminated = ngram_decontaminate(
            rd.from_pandas(train).repartition(3), rd.from_pandas(evalset),
            "text", "doc_id", "eval_text", "eval_id", window=5)
        cdf = contaminated.to_pandas()
        # doc 1 shares "the quick brown fox jumps" (and "quick brown fox
        # jumps high") with the eval doc; doc 3 shares only a 4-token span
        assert sorted(cdf["doc_id"].tolist()) == [1]
        assert cdf.set_index("doc_id").loc[1, "n_shared_windows"] == 2
        kdf = kept.to_pandas()
        assert sorted(kdf["doc_id"].tolist()) == [2, 3]

    def test_no_overlap_keeps_everything(self, ray_session):
        import ray.data as rd

        from verdictray.dedup import ngram_decontaminate

        train = pd.DataFrame({"doc_id": [1], "text": ["a b c d e f"]})
        ev = pd.DataFrame({"eval_id": [9], "eval_text": ["u v w x y z"]})
        kept, cont = ngram_decontaminate(rd.from_pandas(train),
                                         rd.from_pandas(ev), "text",
                                         "doc_id", "eval_text", "eval_id",
                                         window=3)
        assert kept.count() == 1 and cont.count() == 0


def test_window_hasher_equals_naive_reference_random():
    """Seeded-random equivalence: WindowHasher's per-doc distinct window
    hash count and cross-doc collision structure must match a naive
    Python tokenize+tuple reference (unicode tokens included)."""
    import numpy as np
    import re

    from verdictray.dedup import WindowHasher

    rng = np.random.default_rng(11)
    vocab = ["foo", "bar", "héllo", "日本", "x", "longer-token", "42", "β"]
    docs = []
    for _ in range(60):
        n = int(rng.integers(0, 30))
        docs.append(" ".join(rng.choice(vocab, n)) +
                    ("  " if rng.random() < 0.3 else ""))
    W = 4
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                    "g": pa.array(["g"] * len(docs), pa.string())})
    out = WindowHasher("text", "doc_id", ("g",), W)(tbl).to_pandas()

    # naive reference: window tuples per doc
    ref = {}
    for i, d in enumerate(docs):
        toks = [t for t in re.split(r"\s+", d.strip()) if t != ""]
        ref[i] = {tuple(toks[j:j + W]) for j in range(len(toks) - W + 1)}
    got_counts = out.groupby("doc_id").size().to_dict()
    for i, wins in ref.items():
        assert got_counts.get(i, 0) == len(wins), i
    # collision structure: two docs share a hash iff they share a window
    hmap = out.groupby("doc_id")["win_hash"].apply(set).to_dict()
    for a in ref:
        for b in ref:
            if a < b:
                share_ref = bool(ref[a] & ref[b])
                share_hash = bool(hmap.get(a, set()) & hmap.get(b, set()))
                assert share_ref == share_hash, (a, b)


# ---------------------------------------------------------------- gopher
def test_gopher_flags_match_duckdb_on_torture_strings(ray_session):
    """Every rule exercised: bullets, ellipsis line-ends, symbol soup,
    non-alpha words, short/long docs, nulls, empty strings, multi-line."""
    import duckdb
    import pyarrow as pa

    from verdictray.text import with_gopher_flags

    docs = [
        "short doc",                                  # fails n_words
        " ".join(["word"] * 60),                      # passes everything
        " ".join(["supercalifragilistic"] * 55),      # fails mean_word_len
        " ".join(["ok"] * 30) + " " + " ".join(["#"] * 30),  # symbol+alpha
        "\n".join(f"- bullet {i} text here" for i in range(40))
        + "\n" + " ".join(["pad"] * 60),              # high bullet frac
        "\n".join(f"line {i} trails off..." for i in range(30))
        + "\n" + " ".join(["pad"] * 60),              # high ellipsis frac
        " ".join(["12345"] * 70),                     # fails alpha frac
        "",                                           # empty
        None,                                         # null text
        " ".join([chr(0x2026)] * 60),                 # … symbols, non-alpha
    ]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    mine = with_gopher_flags(t).to_pandas().sort_values("doc_id")

    con = duckdb.connect()
    con.register("documents_t", t.to_pandas())
    ora = con.sql("""
    WITH feat AS (
      SELECT doc_id,
        len(regexp_extract_all(coalesce(text,''), '\\S+')) AS n_words,
        CAST(list_sum(list_transform(regexp_extract_all(coalesce(text,''),
             '\\S+'), w -> length(w))) AS DOUBLE)
          / greatest(len(regexp_extract_all(coalesce(text,''), '\\S+')), 1)
          AS mwl,
        CAST((length(coalesce(text,'')) -
              length(replace(coalesce(text,''), '#', ''))) +
             (length(coalesce(text,'')) -
              length(replace(coalesce(text,''), '…', ''))) AS DOUBLE)
          / greatest(len(regexp_extract_all(coalesce(text,''), '\\S+')), 1)
          AS sym,
        CAST(len(regexp_extract_all(coalesce(text,''),
             '(?m)^\\s*[-*•]')) AS DOUBLE)
          / greatest(len(string_split(coalesce(text,''), chr(10))), 1)
          AS bullet,
        CAST(len(regexp_extract_all(coalesce(text,''),
             '(?m)(\\.\\.\\.|…)$')) AS DOUBLE)
          / greatest(len(string_split(coalesce(text,''), chr(10))), 1)
          AS ell,
        CAST(len(list_filter(regexp_extract_all(coalesce(text,''), '\\S+'),
             w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
          / greatest(len(regexp_extract_all(coalesce(text,''), '\\S+')), 1)
          AS alpha
      FROM documents_t
    )
    SELECT doc_id,
      CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END AS f_nw,
      CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 1 ELSE 0 END AS f_wl,
      CASE WHEN sym > 0.1 THEN 1 ELSE 0 END AS f_sy,
      CASE WHEN bullet > 0.9 THEN 1 ELSE 0 END AS f_bu,
      CASE WHEN ell > 0.3 THEN 1 ELSE 0 END AS f_el,
      CASE WHEN alpha < 0.8 THEN 1 ELSE 0 END AS f_al
    FROM feat ORDER BY doc_id
    """).df()
    pairs = [("fail_nwords", "f_nw"), ("fail_wordlen", "f_wl"),
             ("fail_symbol", "f_sy"), ("fail_bullet", "f_bu"),
             ("fail_ellipsis", "f_el"), ("fail_alpha", "f_al")]
    for a, b in pairs:
        assert mine[a].tolist() == ora[b].tolist(), (a, mine[a].tolist(),
                                                     ora[b].tolist())
    # at least one doc fails each rule and at least one passes everything
    for a, _ in pairs:
        assert mine[a].sum() >= 1, a
    assert mine["gopher_pass"].sum() >= 1
    assert (mine["gopher_pass"]
            == (1 - mine[[a for a, _ in pairs]].max(axis=1))).all()


def test_gopher_filter_streams_and_keeps_only_passing(ray_session, sf01_dir):
    import ray.data as rd

    from verdictray.text import gopher_filter, with_gopher_flags

    ds = rd.read_parquet(f"{sf01_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    kept = gopher_filter(ds, "text").to_pandas()
    flags = ds.map_batches(with_gopher_flags, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    expect = set(flags.loc[flags.gopher_pass == 1, "doc_id"])
    assert set(kept.doc_id) == expect and len(expect) > 0
    # the filter keeps the input schema (no feature columns leak through)
    assert list(kept.columns) == ["doc_id", "text"]


def test_top_ngram_frac_matches_naive_reference(ray_session):
    """Vectorized top-n-gram coverage vs a per-doc Python reference,
    including count ties with different gram lengths (the coverage-max
    definition resolves them deterministically)."""
    import collections

    import pyarrow as pa

    from verdictray.text import with_top_ngram_frac

    docs = [
        "a b a b a b",                     # dominant 2-gram
        "xx yy zz xx yy qq xx yy",         # 'xx yy' x3
        "tie a tie a longword b longword b",  # count tie, longer gram wins
        "one",                              # < n words
        "",
        None,
        "  spaced   out   words   spaced   out  ",  # whitespace runs
    ]
    t = pa.table({"i": list(range(len(docs))), "text": docs})
    for n in (2, 3):
        got = with_top_ngram_frac(t, n=n).to_pandas()[f"top{n}gram_frac"]
        for i, d in enumerate(docs):
            words = (d or "").split()
            grams = [words[j:j + n] for j in range(len(words) - n + 1)]
            cnt = collections.Counter(" ".join(g) for g in grams)
            best = max((c * len(g) for g, c in cnt.items()), default=0)
            want = best / max(len(d or ""), 1)
            assert abs(got[i] - want) < 1e-12, (n, i, got[i], want)
