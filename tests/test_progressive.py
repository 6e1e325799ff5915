"""Progressive (Verdict-style) streaming estimates from checkpoint
partials — replay determinism, monotone envelope tightening, envelope
soundness vs DuckDB exact, live streaming while a job runs."""

import threading

import numpy as np
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


@pytest.fixture(scope="module")
def finished_job(ray_session, corpus, spec, tmp_path_factory):
    from verdictray.checkpoint import CheckpointedJob

    d = str(tmp_path_factory.mktemp("prog"))
    job = CheckpointedJob(spec, d, fragments_per_partition=2)
    assert len(job.partitions) >= 3
    job.run()
    return job


def test_replay_emits_per_partition_and_final_is_canonical(
        ray_session, spec, finished_job):
    from verdictray.pipeline import estimates_table
    from verdictray.progressive import estimates_stream

    ems = list(estimates_stream(finished_job))
    assert len(ems) == len(finished_job.partitions)
    # progress is monotone and ends complete
    fracs = [e.progress["fraction"] for e in ems]
    assert all(b > a for a, b in zip(fracs, fracs[1:]))
    assert ems[-1].progress["fraction"] == 1.0
    assert ems[-1].progress["rows_done"] == 20_000

    # final emission is byte-identical to the canonical batch finalize
    canon = estimates_table(finished_job.merged(), spec)
    assert ems[-1].estimates.equals(canon)


def test_envelope_monotone_tightening_and_sound(ray_session, spec,
                                                finished_job):
    """Additive-metric envelope widths strictly decrease per emission, and
    every envelope contains the exact full-data answer (DuckDB oracle)."""
    import duckdb

    from verdictray.progressive import estimates_stream

    ems = list(estimates_stream(finished_job))
    corpus = spec.input_path
    exact = duckdb.sql(f"""
        SELECT lang, count(*)::DOUBLE AS n_rows,
               count(DISTINCT sha256(content))::DOUBLE AS nd
        FROM '{corpus}/*.parquet' GROUP BY lang""").df().set_index("lang")

    def widths(em, stype, metric):
        t = em.envelope.to_pandas()
        t = t[(t.sketch_type == stype) & (t.metric == metric)]
        return t.set_index("group_key")

    for stype, metric in (("cms", "total_count"), ("kll", "n_rows"),
                          ("hll", "count_distinct")):
        prev = None
        for em in ems:
            t = widths(em, stype, metric)
            w = float((t.hi - t.lo).sum())
            if prev is not None:
                assert w < prev, (stype, metric, w, prev)
            prev = w
        # soundness of every emission's envelope vs the exact full answer
        col = {"total_count": "n_rows", "n_rows": "n_rows",
               "count_distinct": "nd"}[metric]
        for em in ems:
            t = widths(em, stype, metric)
            for lang, row in t.iterrows():
                truth = float(exact.loc[lang, col])
                assert row.lo - 1e-9 <= truth <= row.hi + 1e-9, (
                    stype, metric, lang, truth, row.lo, row.hi)

    # quantile envelopes: final emission must bracket the exact medians
    q_exact = duckdb.sql(f"""
        SELECT lang, quantile_cont(length(content), 0.5) AS med
        FROM '{corpus}/*.parquet' GROUP BY lang""").df().set_index("lang")
    t = ems[-1].envelope.to_pandas()
    t = t[(t.sketch_type == "kll") & (t.metric == "q0.5")] \
        .set_index("group_key")
    for lang, row in t.iterrows():
        med = float(q_exact.loc[lang, "med"])
        assert row.lo <= med <= row.hi, (lang, med, row.lo, row.hi)


def test_live_stream_while_job_runs(ray_session, corpus, spec, tmp_path):
    """estimates_stream observes a job running concurrently (commits land
    task-side on the shared FS) and terminates with the complete answer."""
    from verdictray.checkpoint import CheckpointedJob
    from verdictray.pipeline import estimates_table
    from verdictray.progressive import estimates_stream

    job = CheckpointedJob(spec, str(tmp_path / "live"),
                          fragments_per_partition=2)
    err = []

    def run():
        try:
            job.run()
        except Exception as e:  # pragma: no cover - surfaced below
            err.append(e)

    th = threading.Thread(target=run)
    th.start()
    try:
        ems = list(estimates_stream(job, poll_interval=0.1, timeout=120))
    finally:
        th.join(timeout=180)
    assert not err, err
    assert ems and ems[-1].progress["fraction"] == 1.0
    canon = estimates_table(job.merged(), spec)
    assert ems[-1].estimates.equals(canon)


def test_stream_timeout_on_stalled_job(ray_session, spec, corpus, tmp_path):
    from verdictray.checkpoint import CheckpointedJob
    from verdictray.progressive import estimates_stream

    job = CheckpointedJob(spec, str(tmp_path / "stall"),
                          fragments_per_partition=2)
    with pytest.raises(TimeoutError):
        list(estimates_stream(job, poll_interval=0.05, timeout=0.3))
