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

# Optional allocator tuning (VR_ALLOC_TUNING=1; applied BEFORE any
# pyarrow/ray import so the env is inherited by every Ray worker): route
# Arrow allocations through the system allocator and keep freed heap pages
# backed (1 GiB mmap/trim thresholds) instead of returning them to the OS,
# plus jemalloc decay -1 in every worker. Measured on this host's
# PATHOLOGICAL phase (first-touch faults ~70 us/page, ~300 MiB/s box-wide
# straw — BASELINE.md §Scaling r3): 16M-row/32-CPU headline 91.7 s
# (default, cold) → 35-51 s with retention. Measured on the same host's
# HEALTHY phase an hour later (interleaved A/B): default 18-21 s vs
# retention 44-89 s at 32 CPUs — 32 retained worker heaps create their own
# memory pressure once faults are cheap again. Default therefore stays the
# allocator default; the knob exists for hosts pinned in the pathological
# regime.
if os.environ.get("VR_ALLOC_TUNING"):
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    # glibc reads these at process start: they take effect in the Ray
    # workers (forked after ray.init inherits this env), not this driver —
    # the driver does no batch compute.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

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


def _tune_allocator():
    """Per-process half of the allocator tuning (driver + every Ray worker
    via worker_process_setup_hook): disable jemalloc dirty-page decay so
    any allocation still routed through Arrow's jemalloc keeps its arena
    pages backed between tasks. See the module-top env block for the
    rationale and measurements."""
    import pyarrow as _pa

    try:
        _pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass  # non-jemalloc build


def run_benchmarks() -> dict:
    import ray

    init_kwargs = {}
    if os.environ.get("VR_ALLOC_TUNING"):
        _tune_allocator()
        init_kwargs["runtime_env"] = {
            "worker_process_setup_hook": _tune_allocator}
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR", **init_kwargs)
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
        from verdictray.entry_queries import q_sql_tpch_q1, q_sql_tpch_q10

        timed("sql_tpch_q1", lambda: q_sql_tpch_q1(SF_DIR))
        # multi-join stressor: two bucketed hash joins + broadcast enrich
        timed("sql_tpch_q10", lambda: q_sql_tpch_q10(SF_DIR))
        # grouped-membership stressor (r5): nested aggregate build feeding
        # an exact semi join, then a three-table join chain + aggregate
        from verdictray.entry_queries import q_sql_tpch_q18

        timed("sql_tpch_q18", lambda: q_sql_tpch_q18(SF_DIR))

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
    """Same job, same input, fresh processes across a CPU ladder.

    Protocol (r3, per ADVICE r2): measure a LADDER of CPU levels (default
    1,2,4,8,32) and report every 4x N->4N pair unconditionally, so the
    headline 8->32 number stays comparable across rounds AND the
    below-the-DRAM-knee pairs (1->4, 2->8) are visible side by side —
    this box's memory subsystem saturates at ~8-16 concurrent
    memory-heavy streams (controls in BASELINE.md), so pairs above the
    knee measure single-box DRAM bandwidth, not the algorithm; real
    N->4N clusters add memory bandwidth with every node.

    VR_SCALING_RUNS (default 5) fresh-process runs per level, interleaved
    across levels so slow background drift hits all levels equally;
    headline-only in each subprocess; MEDIAN per level is the estimator,
    min-based companion included (external tenants on this shared box tax
    higher CPU levels disproportionately), full distribution reported.
    Override the ladder with VR_SCALING_CPUS="8,32" etc."""
    global BENCH_ROWS
    BENCH_ROWS = str(SCALING_ROWS)
    prepare_corpus()
    n_runs = int(os.environ.get("VR_SCALING_RUNS", "5"))
    levels = [int(x) for x in
              os.environ.get("VR_SCALING_CPUS", "1,2,4,8,32").split(",")]
    times: dict[int, list[float]] = {n: [] for n in levels}
    loads: list[float] = []
    for _ in range(n_runs):
        for ncpu in levels:
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

    med = {n: median(ts) for n, ts in times.items()}
    pairs = {}
    for lo in levels:
        hi = lo * 4
        if hi in med:
            pairs[f"{lo}->{hi}"] = {
                "sec_lo": round(med[lo], 3),
                "sec_hi": round(med[hi], 3),
                "efficiency": round((med[lo] / med[hi]) / 4, 3),
                "efficiency_min": round(
                    (min(times[lo]) / min(times[hi])) / 4, 3),
            }
    # headline pair: the largest N->4N pair present (8->32 on the default
    # ladder) — the r1-comparable definition; the below-knee pairs ride
    # alongside rather than replacing it (ADVICE r2)
    head_lo = max(n for n in levels if n * 4 in med)
    head = pairs[f"{head_lo}->{head_lo * 4}"]
    return {
        "metric": "scaling efficiency ladder (fresh processes, same input)",
        "estimator": f"median of {n_runs} interleaved fresh-process runs per level",
        "cpus": levels,
        "headline_pair": f"{head_lo}->{head_lo * 4}",
        "scaling_efficiency": head["efficiency"],
        "scaling_efficiency_min": head["efficiency_min"],
        "pairs": pairs,
        "runs": {str(n): [round(x, 3) for x in ts] for n, ts in times.items()},
        "rows_per_sec": {str(n): round(SCALING_ROWS / med[n], 1) for n in levels},
        "loadavg_before_runs": loads,
        "sf": _sf_tag(),
        "corpus_rows": SCALING_ROWS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_benchmarks()))
