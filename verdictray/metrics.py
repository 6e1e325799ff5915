"""Metrics aggregation (SURVEY.md §2.1 emit_metrics).

Workers append one JSONL record per processed partition (SketchUpdater
with metrics_dir set: rows, bytes, keys, secs, pid-keyed files); the
driver aggregates them at job end with ``summarize``. CheckpointedJob
additionally writes per-partition lineage JSON — ``summarize_lineage``
folds those. Everything is plain files: no Ray state, survives crashes,
greppable.
"""

from __future__ import annotations

import glob
import json
import os


def read_records(metrics_dir: str) -> list[dict]:
    recs = []
    for path in sorted(glob.glob(os.path.join(metrics_dir, "updater-*.jsonl"))):
        with open(path) as f:
            recs.extend(json.loads(line) for line in f if line.strip())
    return recs


def summarize(metrics_dir: str) -> dict:
    """Fold worker JSONL into job totals + rates."""
    recs = read_records(metrics_dir)
    if not recs:
        return {"partitions": 0, "rows": 0, "bytes": 0, "secs": 0.0}
    rows = sum(r["rows"] for r in recs)
    secs = sum(r["secs"] for r in recs)
    return {
        "partitions": len(recs),
        "rows": rows,
        "bytes": sum(r["bytes"] for r in recs),
        "keys_max": max(r["keys"] for r in recs),
        "secs": round(secs, 3),
        "rows_per_cpu_sec": round(rows / secs, 1) if secs else None,
        "workers": len({os.path.basename(p) for p in
                        glob.glob(os.path.join(metrics_dir, "updater-*.jsonl"))}),
    }


def summarize_lineage(ckpt_job_dir: str) -> dict:
    """Fold CheckpointedJob part-<i>.lineage.json records."""
    recs = []
    for path in sorted(glob.glob(os.path.join(ckpt_job_dir, "part-*.lineage.json"))):
        with open(path) as f:
            recs.append(json.load(f))
    return {
        "partitions_done": len(recs),
        "rows": sum(r["rows"] for r in recs),
        "fragments": sum(len(r["fragments"]) for r in recs),
        "secs": round(sum(r["secs"] for r in recs), 3),
    }
