"""The verification path (SURVEY.md §3.3; BASELINE.json north_star:
"Estimates must land within each algorithm's published error bound against
exact answers computed on a sampled reference slice").

Flow:
    deterministic hash-sample slice (ops.deterministic_sample — membership
    is a pure function of the row, reproducible across runs)
      → exact per-key answers on the slice (Ray exact groupby)
      → flagship build_sketches on the SAME slice
      → driver-side join on (group key, metric)
      → within-bound verdict per (key, metric)

Mirrors VerdictDB's relative-error acceptance tests: run approximate and
exact side by side, assert relative error ≤ the published threshold.
"""

from __future__ import annotations


import pandas as pd

import ray.data as rd

from . import ops
from .pipeline import SketchJobSpec, build_sketches
from .sketches import Sketch
from .udaf import ExactDistinct


def exact_slice_answers(slice_ds: rd.Dataset, spec: SketchJobSpec) -> pd.DataFrame:
    """Exact per-key answers on the (small) slice via Ray exact aggregates."""
    from ray.data.aggregate import Count

    prepped = ops_prepare_cached(slice_ds, spec)
    exact = (
        prepped.groupby(spec.group_key)
        .aggregate(
            Count(alias_name="n_rows"),
            ExactDistinct(on=spec.sketch_cols["hll"], alias_name="exact_distinct"),
        )
        .to_pandas()
    )
    return exact


def ops_prepare_cached(ds: rd.Dataset, spec: SketchJobSpec) -> rd.Dataset:
    from .pipeline import prepare

    return prepare(ds, spec)


def calibration_report(input_path: str, spec: SketchJobSpec,
                       sample_rate: float = 0.2, seed: int = 1234) -> pd.DataFrame:
    """Per-(key, metric) within-bound verdicts on a deterministic slice.

    Returns columns: group_key, metric, estimate, exact, rel_err,
    bound, within_bound.
    """
    def sample(ds):
        withsha = ds.map_batches(ops.with_sha256, batch_format="pyarrow",
                                 zero_copy_batch=True)
        return withsha.map_batches(
            lambda b: ops.deterministic_sample(b, on="content_sha256",
                                               rate=sample_rate, seed=seed),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    slice_a = sample(rd.read_parquet(input_path))
    exact = exact_slice_answers(slice_a, spec).set_index(spec.group_key)

    slice_b = sample(rd.read_parquet(input_path))
    merged = build_sketches(spec, ds=slice_b).to_pandas()

    rows = []
    for _, row in merged.iterrows():
        key = row[spec.group_key]
        if key not in exact.index:
            continue
        hll = Sketch.from_bytes(row["hll_blob"])
        ex = float(exact.loc[key, "exact_distinct"])
        est = hll.estimate()
        rel = abs(est - ex) / max(ex, 1.0)
        bound = 3 * hll.error_bound()
        rows.append({"group_key": key, "metric": "count_distinct",
                     "estimate": est, "exact": ex, "rel_err": rel,
                     "bound": bound, "within_bound": rel <= bound})
        cms = Sketch.from_bytes(row["cms_blob"])
        ex_n = float(exact.loc[key, "n_rows"])
        rows.append({"group_key": key, "metric": "total_count",
                     "estimate": float(cms.n), "exact": ex_n,
                     "rel_err": abs(cms.n - ex_n) / max(ex_n, 1.0),
                     "bound": 0.0, "within_bound": cms.n == ex_n})
    report = pd.DataFrame(rows)
    return report.sort_values(["group_key", "metric"]).reset_index(drop=True)


def acceptance(report: pd.DataFrame, min_within_rate: float = 0.97) -> bool:
    """The VerdictDB-style acceptance verdict: the fraction of (key,
    metric) cells within bound must reach min_within_rate (3σ bounds hold
    ~99.7% per cell; 0.97 leaves room for small-sample noise)."""
    if len(report) == 0:
        return False
    return bool((report["within_bound"].mean()) >= min_within_rate)
