"""Actor-pool updater equivalence + checkpoint/resume (SURVEY.md §5.3)."""

import shutil

import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    from verdictray.corpus import generate_corpus

    return generate_corpus("/tmp/vr_corpus_test", 20_000, seed=42)


@pytest.fixture(scope="module")
def spec(corpus):
    from verdictray.pipeline import SketchJobSpec

    return SketchJobSpec(input_path=corpus, group_key="lang", salts=4,
                         bloom_capacity=50_000)


def test_actor_pool_equals_udaf_path(ray_session, corpus, spec):
    """Split-invariance: the stateful actor-pool updater and the pure UDAF
    groupby path must produce identical HLL/Bloom state and CMS tables."""
    import ray.data as rd

    from verdictray.pipeline import build_sketches_direct
    from verdictray.sketches import Sketch
    from verdictray.updater import build_sketches_actor_pool

    udaf = build_sketches_direct(spec).to_pandas().set_index("lang").sort_index()
    ds = rd.read_parquet(corpus)
    pool = (
        build_sketches_actor_pool(ds, spec, concurrency=(1, 2),
                                  metrics_dir="/tmp/vr_metrics_test")
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert list(udaf.index) == list(pool.index)
    for lang in udaf.index:
        assert udaf.loc[lang, "hll_blob"] == pool.loc[lang, "hll_blob"], lang
        assert udaf.loc[lang, "bloom_blob"] == pool.loc[lang, "bloom_blob"], lang
        a = Sketch.from_bytes(udaf.loc[lang, "cms_blob"])
        b = Sketch.from_bytes(pool.loc[lang, "cms_blob"])
        assert (a.dense_table() == b.dense_table()).all() and a.n == b.n
        ka = Sketch.from_bytes(udaf.loc[lang, "kll_blob"])
        kb = Sketch.from_bytes(pool.loc[lang, "kll_blob"])
        assert ka.n == kb.n
        for phi in (0.25, 0.5, 0.75):
            ra = ka.quantile(phi)
            rb = kb.quantile(phi)
            # estimate-stable, not byte-stable: both within bound of each other
            assert abs(ka.rank(rb) - phi) <= 2 * ka.error_bound() + 0.01


def test_actor_pool_mode_equivalent(ray_session, corpus, spec):
    """The contract-literal stateful actor-pool form must produce the same
    merged state as the default task mode."""
    import ray.data as rd

    from verdictray.sketches import Sketch
    from verdictray.updater import build_sketches_actor_pool

    tasks = build_sketches_actor_pool(
        rd.read_parquet(corpus), spec, updater_mode="tasks"
    ).to_pandas().set_index("lang").sort_index()
    actors = build_sketches_actor_pool(
        rd.read_parquet(corpus), spec, concurrency=(1, 2), updater_mode="actors"
    ).to_pandas().set_index("lang").sort_index()
    assert list(tasks.index) == list(actors.index)
    for lang in tasks.index:
        assert tasks.loc[lang, "hll_blob"] == actors.loc[lang, "hll_blob"], lang
        assert tasks.loc[lang, "bloom_blob"] == actors.loc[lang, "bloom_blob"], lang
        a = Sketch.from_bytes(tasks.loc[lang, "cms_blob"])
        b = Sketch.from_bytes(actors.loc[lang, "cms_blob"])
        assert (a.dense_table() == b.dense_table()).all() and a.n == b.n


def test_updater_metrics_emitted(ray_session):
    import glob
    import json

    files = glob.glob("/tmp/vr_metrics_test/updater-*.jsonl")
    assert files, "updater metrics JSONL not written"
    recs = [json.loads(line) for f in files for line in open(f)]
    assert sum(r["rows"] for r in recs) == 20_000
    assert all({"rows", "bytes", "keys", "secs"} <= set(r) for r in recs)


class TestCheckpointResume:
    def test_resume_matches_uninterrupted(self, ray_session, corpus, spec, tmp_path):
        from verdictray.checkpoint import CheckpointedJob
        from verdictray.sketches import Sketch

        # uninterrupted run
        full = CheckpointedJob(spec, str(tmp_path / "a"), fragments_per_partition=2)
        assert len(full.partitions) >= 3
        t_full = full.run().to_pandas().set_index("lang").sort_index()

        # interrupted run: fault after 2 partitions, then resume
        job = CheckpointedJob(spec, str(tmp_path / "b"), fragments_per_partition=2)
        with pytest.raises(RuntimeError, match="fault injection"):
            job.run(fail_after=2)
        assert len(job.manifest["done"]) == 2
        resumed = CheckpointedJob(spec, str(tmp_path / "b"), fragments_per_partition=2)
        assert resumed.pending() == job.pending()
        t_res = resumed.run().to_pandas().set_index("lang").sort_index()

        assert list(t_full.index) == list(t_res.index)
        for lang in t_full.index:
            # HLL/Bloom byte-identical; digests estimate-identical in n
            assert t_full.loc[lang, "hll_blob"] == t_res.loc[lang, "hll_blob"]
            assert t_full.loc[lang, "bloom_blob"] == t_res.loc[lang, "bloom_blob"]
            a = Sketch.from_bytes(t_full.loc[lang, "cms_blob"])
            b = Sketch.from_bytes(t_res.loc[lang, "cms_blob"])
            assert (a.dense_table() == b.dense_table()).all()
            ka = Sketch.from_bytes(t_full.loc[lang, "kll_blob"])
            kb = Sketch.from_bytes(t_res.loc[lang, "kll_blob"])
            assert ka.n == kb.n

    def test_refuses_changed_spec(self, ray_session, corpus, spec, tmp_path):
        from dataclasses import replace

        from verdictray.checkpoint import CheckpointedJob

        job = CheckpointedJob(spec, str(tmp_path / "c"), fragments_per_partition=2)
        job.run_partition(0)
        changed = replace(spec, hll_p=12)
        with pytest.raises(ValueError, match="different job spec"):
            CheckpointedJob(changed, str(tmp_path / "c"), fragments_per_partition=2)

    def test_lineage_records(self, ray_session, corpus, spec, tmp_path):
        from verdictray.checkpoint import CheckpointedJob

        job = CheckpointedJob(spec, str(tmp_path / "d"), fragments_per_partition=4)
        job.run_partition(0)
        lin = job.lineage()
        assert len(lin) == 1
        assert lin[0]["rows"] > 0 and lin[0]["fragments"] and lin[0]["secs"] >= 0


def teardown_module(module):
    shutil.rmtree("/tmp/vr_metrics_test", ignore_errors=True)


class TestStreamingCheckpoint:
    """r2: the checkpoint runner executes all pending partitions in ONE
    streaming run with per-partition in-pipeline commits (no per-partition
    driver barriers)."""

    def test_streaming_equals_flagship(self, ray_session, corpus, spec, tmp_path):
        """Same final state as the flagship two-stage merge: HLL/Bloom
        byte-identical, CMS count matrix identical (point queries are
        merge-order-invariant), digests estimate-stable."""
        from verdictray.checkpoint import CheckpointedJob
        from verdictray.pipeline import build_sketches
        from verdictray.sketches import Sketch

        flag = build_sketches(spec).to_pandas().set_index("lang").sort_index()
        job = CheckpointedJob(spec, str(tmp_path / "s"), fragments_per_partition=2)
        assert len(job.partitions) >= 3
        got = job.run().to_pandas().set_index("lang").sort_index()
        assert list(flag.index) == list(got.index)
        for lang in flag.index:
            assert flag.loc[lang, "hll_blob"] == got.loc[lang, "hll_blob"]
            assert flag.loc[lang, "bloom_blob"] == got.loc[lang, "bloom_blob"]
            a = Sketch.from_bytes(flag.loc[lang, "cms_blob"])
            b = Sketch.from_bytes(got.loc[lang, "cms_blob"])
            assert a.n == b.n
            assert (a.dense_table() == b.dense_table()).all()
            ka = Sketch.from_bytes(flag.loc[lang, "kll_blob"])
            kb = Sketch.from_bytes(got.loc[lang, "kll_blob"])
            assert ka.n == kb.n
            assert abs(ka.quantile(0.5) - kb.quantile(0.5)) <= \
                2 * ka.error_bound() * max(ka.quantile(0.99), 1.0)
        # lineage present for every partition, streaming-mode tagged
        lin = job.lineage()
        assert len(lin) == len(job.partitions)
        assert sum(r["rows"] for r in lin) == 20_000

    def test_crash_reconcile_from_part_files(self, ray_session, corpus, spec, tmp_path):
        """A crash between task-side part commits and the driver manifest
        write must not re-run committed partitions: the part+lineage pair
        on disk IS the commit, and manifest load reconciles it."""
        import json
        import os

        from verdictray.checkpoint import CheckpointedJob

        d = str(tmp_path / "c")
        job = CheckpointedJob(spec, d, fragments_per_partition=2)
        job.run()
        # simulate the crash: roll the manifest's done-set back to empty
        mpath = os.path.join(d, "job", "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        m["done"] = []
        with open(mpath, "w") as f:
            json.dump(m, f)
        fresh = CheckpointedJob(spec, d, fragments_per_partition=2)
        assert fresh.pending() == []  # reconciled from part files on disk


def test_fused_equals_unfused_actor_path(ray_session, corpus, spec):
    """The fused wire format must be invisible in the final answer: the
    actor-pool pipeline with fuse_hash_sketches=False produces identical
    HLL/Bloom bytes and CMS tables to the fused default."""
    from dataclasses import replace

    from verdictray.pipeline import build_sketches
    from verdictray.sketches import Sketch

    fused = build_sketches(spec).to_pandas().set_index("lang").sort_index()
    unfused = build_sketches(replace(spec, fuse_hash_sketches=False)) \
        .to_pandas().set_index("lang").sort_index()
    assert list(fused.index) == list(unfused.index)
    for lang in fused.index:
        assert fused.loc[lang, "hll_blob"] == unfused.loc[lang, "hll_blob"]
        a = Sketch.from_bytes(fused.loc[lang, "bloom_blob"])
        b = Sketch.from_bytes(unfused.loc[lang, "bloom_blob"])
        assert a.dense_bits().tobytes() == b.dense_bits().tobytes()
        ca = Sketch.from_bytes(fused.loc[lang, "cms_blob"])
        cb = Sketch.from_bytes(unfused.loc[lang, "cms_blob"])
        assert ca.n == cb.n
        assert (ca.dense_table() == cb.dense_table()).all()


def test_updater_preserves_nonstring_key_dtype(ray_session):
    """Partial-output key dtype must follow the input schema in BOTH the
    empty and non-empty paths (ADVICE r2 covered only the empty path)."""
    import numpy as np
    import pyarrow as pa

    from verdictray import ops
    from verdictray.pipeline import SketchJobSpec
    from verdictray.updater import SketchUpdater

    t = pa.table({"gk": pa.array(np.arange(200) % 5, pa.int64()),
                  "content": [f"doc-{i}" for i in range(200)]})
    t = ops.derive_features(ops.with_sha256(t))
    u = SketchUpdater(SketchJobSpec(input_path="", group_key="gk", salts=0))
    assert u(t).schema.field("gk").type == pa.int64()
    assert u(t.slice(0, 0)).schema.field("gk").type == pa.int64()
