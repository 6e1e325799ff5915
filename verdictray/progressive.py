"""Progressive (block-by-block) query answers — the Verdict-style
interactive surface (public VerdictDB streams per-block estimates with
converging error envelopes; "VerdictDB: Universalizing Approximate Query
Processing", SIGMOD'18 — no reference file:line, /root/reference is empty).

A CheckpointedJob (checkpoint.py) commits one partial-sketch parquet per
input partition; those committed partials form a monotone stream of
mergeable state. ``estimates_stream(job)`` consumes the commits AS THEY
LAND (live, from a job running in another thread/process on the shared
checkpoint FS) or replays a finished job's done-set deterministically,
yielding one ``ProgressiveEmission`` per newly committed partition:

- ``progress``: partitions/rows done vs total (row totals come from the
  parquet footers, known up front — no data pass).
- ``estimates``: the full long-format estimates table over the data seen
  so far — IDENTICAL schema and construction to
  pipeline.finalize_estimates. The FINAL emission re-merges the complete
  done-set in partition-index order (``job.merged()``), so it is
  byte-identical to the canonical batch result.
- ``envelope``: deterministic per-(group_key, metric) bounds [lo, hi] on
  the FULL-data answer given only the data seen:

  * additive counters (cms ``total_count``, kll ``n_rows``): unseen rows
    add between 0 and rows_unseen → width == rows_unseen, strictly
    decreasing at every emission (the monotone-tightening invariant the
    tests assert).
  * hll ``count_distinct``: [est·(1−3σ), est·(1+3σ) + rows_unseen] —
    width = 6σ·est + rows_unseen, also strictly decreasing for σ < 1/6
    (est grows by at most the rows that left rows_unseen).
  * quantiles: with n values seen and ≤ m unseen, the full-data
    φ-quantile lies between the seen-data quantiles at ranks
    (φ·(n+m) − m)/n and φ·(n+m)/n (rank-displacement bound), widened by
    the sketch's own rank ε. Tightens to [φ−ε, φ+ε] as m → 0.

Scale: each emission touches only per-key KiB blobs (keys × sketches) —
never raw rows; incremental merge is O(parts) total, the canonical final
re-merge O(parts) once.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import (SketchJobSpec, estimates_table, fused_active,
                       partial_blob_cols, split_fused_batch)
from .sketches import Sketch


@dataclass
class ProgressiveEmission:
    progress: dict          # partitions_done/total, rows_done/total, fraction
    estimates: pa.Table     # finalize_estimates schema, data seen so far
    envelope: pa.Table      # (group_key, sketch_type, metric, lo, hi)

    def __iter__(self):     # tuple-unpacking convenience
        return iter((self.progress, self.estimates, self.envelope))


def _committed(job) -> set[int]:
    """The on-disk commit signal: a part+lineage pair (exactly the pair
    checkpoint.py's crash reconcile trusts). Reading it directly — not the
    manifest — lets a stream observe a run in flight, whose manifest is
    only written at the end of the streaming execution."""
    out = set()
    for i in range(len(job.partitions)):
        if (os.path.exists(os.path.join(job.dir, f"part-{i}.parquet"))
                and os.path.exists(
                    os.path.join(job.dir, f"part-{i}.lineage.json"))):
            out.add(i)
    return out


def _snapshot_table(per_key: dict, key_col: str, pcols: list[str],
                    fused: bool) -> pa.Table:
    keys = sorted(per_key)
    t = pa.table({
        key_col: pa.array(keys, pa.string()),
        **{c: pa.array([per_key[k][c].to_bytes() for k in keys], pa.binary())
           for c in pcols},
    })
    return split_fused_batch(t) if fused else t


def _envelope(blobs: pa.Table, spec: SketchJobSpec, key_col: str,
              rows_unseen: int, rows_total: int) -> pa.Table:
    keys, types, metrics, lo, hi = [], [], [], [], []

    def emit(k, st, m, lo_v, hi_v):
        keys.append(k)
        types.append(st)
        metrics.append(m)
        lo.append(float(lo_v))
        hi.append(float(hi_v))

    m_unseen = rows_unseen
    for row in blobs.to_pylist():
        k = row[key_col]
        hll = Sketch.from_bytes(row["hll_blob"])
        est, rel = hll.estimate(), 3 * hll.error_bound()
        emit(k, "hll", "count_distinct",
             max(0.0, est * (1 - rel)), est * (1 + rel) + m_unseen)
        cms = Sketch.from_bytes(row["cms_blob"])
        emit(k, "cms", "total_count", cms.n, cms.n + m_unseen)
        kll = Sketch.from_bytes(row["kll_blob"])
        emit(k, "kll", "n_rows", kll.n, kll.n + m_unseen)
        n = max(int(kll.n), 1)
        eps = kll.error_bound()
        for phi in spec.phis:
            # rank-displacement bound: F-quantile between seen ranks
            # (φ(n+m)−m)/n and φ(n+m)/n, widened by the sketch's rank ε
            lo_phi = max(0.0, (phi * (n + m_unseen) - m_unseen) / n - eps)
            hi_phi = min(1.0, phi * (n + m_unseen) / n + eps)
            emit(k, "kll", f"q{phi}", kll.quantile(lo_phi),
                 kll.quantile(hi_phi))
    return pa.table({
        "group_key": pa.array(keys, pa.string()),
        "sketch_type": pa.array(types, pa.string()),
        "metric": pa.array(metrics, pa.string()),
        "lo": pa.array(lo, pa.float64()),
        "hi": pa.array(hi, pa.float64()),
    })


def estimates_stream(job, poll_interval: float = 0.25,
                     timeout: float | None = None):
    """Yield a ProgressiveEmission per newly committed partition of a
    CheckpointedJob — live while the job runs elsewhere, or a
    deterministic replay of a finished job. See module docstring for the
    emission contract; raises TimeoutError if no new partition commits
    within ``timeout`` seconds (None = wait forever)."""
    spec = job.spec
    key_col = spec.group_key
    pcols = partial_blob_cols(spec)
    fused = fused_active(spec)
    n_parts = len(job.partitions)
    rows_of = {i: sum(pq.read_metadata(f).num_rows for f in job.partitions[i])
               for i in range(n_parts)}
    rows_total = sum(rows_of.values())

    per_key: dict[str, dict[str, Sketch]] = {}
    seen: set[int] = set()
    rows_seen = 0
    last_new = time.monotonic()
    while len(seen) < n_parts:
        new = sorted(_committed(job) - seen)
        if not new:
            if timeout is not None and time.monotonic() - last_new > timeout:
                raise TimeoutError(
                    f"no new partition committed in {timeout}s; "
                    f"{sorted(seen)} of {n_parts} done")
            time.sleep(poll_interval)
            continue
        last_new = time.monotonic()
        for i in new:
            t = pq.read_table(os.path.join(job.dir, f"part-{i}.parquet"))
            key_l = t[key_col].to_pylist()
            blob_l = {c: t[c].to_pylist() for c in pcols}
            for r, key in enumerate(key_l):
                slot = per_key.setdefault(key, {})
                for c in pcols:
                    sk = Sketch.from_bytes(blob_l[c][r])
                    slot[c] = sk if c not in slot else slot[c].merge(sk)
            seen.add(i)
            rows_seen += rows_of[i]
            done = len(seen) == n_parts
            if done:
                # canonical final state: re-merge the complete done-set in
                # partition-index order — byte-identical to the batch
                # result (merged() + finalize) regardless of commit order
                blobs = job.merged()
            else:
                blobs = _snapshot_table(per_key, key_col, pcols, fused)
            yield ProgressiveEmission(
                progress={
                    "partitions_done": len(seen),
                    "partitions_total": n_parts,
                    "rows_done": rows_seen,
                    "rows_total": rows_total,
                    "fraction": rows_seen / max(rows_total, 1),
                },
                estimates=estimates_table(blobs, spec),
                envelope=_envelope(blobs, spec, key_col,
                                   rows_total - rows_seen, rows_total),
            )
