"""Interactive query layer over built sketches (SURVEY.md §3.2, §2.4, §2.7).

The heavy scan happens once (pipeline.build_sketches); queries here run
driver-side over the merged per-key sketch blobs (KiB–MiB each) in
sub-second time — the "interactive" half of Verdict-style querying.
Also: Bloom-gated semi/anti joins and approximate dedup as distributed
map_batches probes with the filter broadcast via the object store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketches import BloomFilter, Sketch


class SketchStore:
    """Per-key sketch blobs → interactive answers.

    Built from the output of pipeline.build_sketches (one row per group
    key, one binary column per sketch type)."""

    def __init__(self, rows: pd.DataFrame, key_col: str):
        self._sketches: dict[str, dict[str, Sketch]] = {}
        self._key_col = key_col
        blob_cols = [c for c in rows.columns if c.endswith("_blob")]
        for _, row in rows.iterrows():
            per_key = {}
            for c in blob_cols:
                if row[c] is not None:
                    per_key[c.removesuffix("_blob")] = Sketch.from_bytes(row[c])
            self._sketches[row[key_col]] = per_key

    @classmethod
    def from_dataset(cls, merged_ds, key_col: str) -> "SketchStore":
        return cls(merged_ds.to_pandas(), key_col)

    def keys(self) -> list[str]:
        return sorted(self._sketches)

    def sketch(self, key: str, sketch_type: str) -> Sketch:
        return self._sketches[key][sketch_type]

    # ---- the four Verdict-style query classes (BASELINE.json north_star)
    def count_distinct(self, key: str) -> float:
        return self.sketch(key, "hll").estimate()

    def frequency(self, key: str, item) -> int:
        return self.sketch(key, "cms").query_one(item)

    def heavy_hitters(self, key: str, k: int = 10) -> list[tuple[object, int]]:
        return self.sketch(key, "cms").top_k(k)

    def quantile(self, key: str, phi: float, which: str = "kll") -> float:
        return self.sketch(key, which).quantile(phi)

    def contains(self, key: str, item) -> bool:
        return self.sketch(key, "bloom").contains_one(item)

    # ---- rollups: sketch union across keys (SURVEY.md §2.7)
    def rollup(self, sketch_type: str, keys: list[str] | None = None) -> Sketch:
        keys = keys if keys is not None else self.keys()
        acc = None
        for key in keys:
            sk = Sketch.from_bytes(self.sketch(key, sketch_type).to_bytes())  # copy
            acc = sk if acc is None else acc.merge(sk)
        return acc

    def count_distinct_rollup(self, keys: list[str] | None = None) -> float:
        return self.rollup("hll", keys).estimate()

    def intersection_estimate(self, key_a: str, key_b: str) -> float:
        """|A∩B| ≈ |A| + |B| − |A∪B| via inclusion–exclusion on HLLs.
        High variance when the intersection is small relative to the union
        (folklore extension of Flajolet 2007) — documented caveat."""
        a = self.sketch(key_a, "hll")
        b = self.sketch(key_b, "hll")
        union = Sketch.from_bytes(a.to_bytes()).merge(b)
        return max(0.0, a.estimate() + b.estimate() - union.estimate())


# ------------------------------------------------------------------ Bloom joins
def build_bloom(ds, on: str, capacity: int, fpp: float = 0.01, seed: int = 0) -> BloomFilter:
    """Distributed Bloom build: one aggregate over the dataset."""
    from .udaf import BloomAgg

    row = ds.aggregate(BloomAgg(on=on, alias_name="blob", capacity=capacity,
                                fpp=fpp, seed=seed))
    return Sketch.from_bytes(row["blob"])


class BloomProbe:
    """Actor-pool map_batches stage probing a broadcast Bloom filter —
    the idiomatic sketch replacement for a shuffle semi-join (SURVEY.md
    §2.4). The blob is deserialized ONCE per actor in __init__; the
    filter rides the object store to every worker."""

    def __init__(self, blob: bytes, on: str, keep_members: bool = True):
        self._filter = Sketch.from_bytes(blob)
        self._on = on
        self._keep = keep_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self._filter.contains(batch[self._on])
        if not self._keep:
            mask = ~mask
        return batch.filter(pa.array(mask))


def semi_join_bloom(probe_ds, build_ds, probe_on: str, build_on: str,
                    capacity: int, fpp: float = 0.01, concurrency=(1, 4)):
    """probe_ds rows whose probe_on key (probably) appears in
    build_ds.build_on. Approximate: keeps ~fpp extra non-matching rows;
    never drops a true match (zero false negatives). concurrency is an
    AUTOSCALING (min, max) pool: a fixed pool equal to the CPU count
    reserves every CPU for idle actors and starves the upstream read
    outright (observed deadlock at num_cpus=4)."""
    bloom = build_bloom(build_ds, on=build_on, capacity=capacity, fpp=fpp)
    return probe_ds.map_batches(
        BloomProbe,
        fn_constructor_kwargs={"blob": bloom.to_bytes(), "on": probe_on},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def anti_join_bloom(probe_ds, build_ds, probe_on: str, build_on: str,
                    capacity: int, fpp: float = 0.01, concurrency=(1, 4)):
    """probe_ds rows whose key definitely does NOT appear in build_ds.
    Approximate: may drop ~fpp of true non-matches (false positives of the
    filter); kept rows are guaranteed non-matches."""
    bloom = build_bloom(build_ds, on=build_on, capacity=capacity, fpp=fpp)
    return probe_ds.map_batches(
        BloomProbe,
        fn_constructor_kwargs={"blob": bloom.to_bytes(), "on": probe_on,
                               "keep_members": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


class ApproxDedupFilter:
    """Approximate duplicate-drop: keeps a row only if its key was not
    already seen by THIS actor's Bloom filter. Explicitly approximate on
    two axes (documented per SURVEY.md §2.7): false positives drop ~fpp of
    novel rows, and each actor sees only its own stream — use
    dedup_exact for exactness."""

    def __init__(self, on: str, capacity: int, fpp: float = 0.01):
        self._filter = BloomFilter(capacity=capacity, fpp=fpp)
        self._on = on

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self._on]
        seen = self._filter.contains(col)
        # also drop in-batch duplicates after the first occurrence
        vals = col.to_pandas()
        first = ~vals.duplicated().to_numpy()
        keep = (~seen) & first
        self._filter.update(vals[first].to_numpy())
        return batch.filter(pa.array(keep))


# ------------------------------------------------------------------ calibration
def estimate_vs_exact(estimates: pd.DataFrame, exact: pd.DataFrame,
                      on=("group_key", "metric")) -> pd.DataFrame:
    """Join the estimates table with exact answers for error reporting —
    both sides are tiny, so a driver-side merge (SURVEY.md §2.4)."""
    joined = estimates.merge(exact, on=list(on), suffixes=("_est", "_exact"))
    joined["abs_err"] = (joined["estimate"] - joined["exact"]).abs()
    joined["rel_err"] = joined["abs_err"] / joined["exact"].abs().clip(lower=1e-12)
    joined["within_bound"] = joined["abs_err"] <= joined["error_bound"].where(
        joined["error_bound"] > 0, np.inf
    )
    return joined


def cms_join_size(left, right, left_on: str, right_on: str,
                  eps: float = 1e-3, delta: float = 1e-2, seed: int = 0):
    """Approximate equi-join cardinality WITHOUT running the join: build
    one CMS per side over its join-key column (two streaming aggregates —
    each side is scanned once, nothing is shuffled except KiB-sized sketch
    partials) and take the CM inner-product estimate
    (CountMin.inner_product). Returns a dict with the estimate, both input
    counts and the published additive bound eps·N_left·N_right (holds with
    probability ≥ 1 − delta; the estimate itself is never below the true
    join size). The sketch-algebra answer to "how big would this join be"
    — the planner-style use VerdictDB serves with scramble statistics."""
    from .udaf import CmsAgg

    la = left.aggregate(CmsAgg(on=left_on, alias_name="blob", eps=eps,
                               delta=delta, seed=seed, output="blob"))
    ra = right.aggregate(CmsAgg(on=right_on, alias_name="blob", eps=eps,
                                delta=delta, seed=seed, output="blob"))
    a = Sketch.from_bytes(la["blob"])
    b = Sketch.from_bytes(ra["blob"])
    est = a.inner_product(b)
    return {
        "n_left": int(a.n),
        "n_right": int(b.n),
        "est_join_size": int(est),
        "eps_bound": float(eps) * a.n * b.n,
    }
