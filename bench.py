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
SCALING_ROWS = int(os.environ.get("VR_SCALING_ROWS", "4000000"))


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
    # batch size from data size only — enough parallel units for 32 CPUs
    batch_rows = max(16_384, min(65_536, n_rows // 64))
    spec = SketchJobSpec(input_path=corpus, group_key="lang", salts=16,
                         bloom_capacity=max(100_000, n_rows),
                         updater_batch_rows=batch_rows)

    # untimed warm-up: one FULL pipeline execution spins up workers, warms
    # imports and the object store, so the timed run measures steady-state
    # throughput (the scaling criterion's regime) — identical treatment at
    # every CPU level
    build_sketches(spec, concurrency=(2, max(2, NCPU // 2))).to_pandas()

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
    times: dict[int, list[float]] = {8: [], 32: []}
    loads: list[float] = []
    for _ in range(n_runs):
        for ncpu in (8, 32):
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

    t8, t32 = median(times[8]), median(times[32])
    eff = (t8 / t32) / (32 / 8)
    # min-based companion estimator: external tenants on this shared box
    # (load average ~4-5 with nothing of ours running) contend with the
    # 32-cpu level far more than the 8-cpu level, so the median carries a
    # systematic anti-scaling bias; min approximates the uncontended run.
    eff_min = (min(times[8]) / min(times[32])) / (32 / 8)
    return {
        "metric": "scaling efficiency (num_cpus 8 -> 32, fresh processes, same input)",
        "estimator": f"median of {n_runs} interleaved fresh-process runs per level",
        "sec_8": round(t8, 3),
        "sec_32": round(t32, 3),
        "runs_8": [round(x, 3) for x in times[8]],
        "runs_32": [round(x, 3) for x in times[32]],
        "rows_per_sec_8": round(SCALING_ROWS / t8, 1),
        "rows_per_sec_32": round(SCALING_ROWS / t32, 1),
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
