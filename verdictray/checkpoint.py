"""Per-partition checkpointing, resume, and lineage (SURVEY.md §4.4;
BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

Unit of recovery = input partition = one group of Parquet fragments.
Layout under ``ckpt_dir/<job_id>/``:

    manifest.json            job-spec hash + partition list + done-set
    part-<i>.parquet         per-key partial sketch blobs for partition i
    part-<i>.lineage.json    rows/bytes/wall-time + fragment list (lineage)

A run plans partitions from the input file list, skips those in the
done-set, executes each remaining partition as a (distributed) Ray Data
sub-job, and commits its partials atomically (write temp → rename —
idempotent under retry). The final answer merges every partition's
partials; associative/commutative sketch merge is exactly what makes
resume-by-union sound. Resuming with a changed spec is refused via the
spec hash.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import _BLOB_COLS, SketchJobSpec, prepare
from .udaf import SketchMergeAgg
from .updater import SketchUpdater


def _spec_hash(spec: SketchJobSpec) -> str:
    d = asdict(spec)
    d.pop("checkpoint_dir", None)
    d.pop("metrics_dir", None)
    d.pop("out_dir", None)
    return hashlib.sha256(json.dumps(d, sort_keys=True, default=str).encode()).hexdigest()[:16]


def _list_fragments(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        frags = []
        for root, _dirs, files in os.walk(input_path):
            frags.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
        return sorted(frags)
    return [input_path]


class CheckpointedJob:
    """Drives the flagship job partition-by-partition with resume."""

    def __init__(self, spec: SketchJobSpec, ckpt_dir: str, job_id: str = "job",
                 fragments_per_partition: int = 4):
        self.spec = spec
        self.dir = os.path.join(ckpt_dir, job_id)
        os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json")
        frags = _list_fragments(spec.input_path)
        self.partitions = [
            frags[i : i + fragments_per_partition]
            for i in range(0, len(frags), fragments_per_partition)
        ]
        self._load_or_init_manifest()

    # ------------------------------------------------------------ manifest
    def _load_or_init_manifest(self) -> None:
        spec_h = _spec_hash(self.spec)
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            if m["spec_hash"] != spec_h:
                raise ValueError(
                    f"checkpoint at {self.dir} was written by a different job spec "
                    f"({m['spec_hash']} != {spec_h}); refusing to resume"
                )
            if m["n_partitions"] != len(self.partitions):
                raise ValueError("input partition list changed; refusing to resume")
            self.manifest = m
        else:
            self.manifest = {
                "spec_hash": spec_h,
                "n_partitions": len(self.partitions),
                "done": [],
            }
            self._write_manifest()

    def _write_manifest(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self._manifest_path)  # atomic

    # ------------------------------------------------------------ execution
    def pending(self) -> list[int]:
        done = set(self.manifest["done"])
        return [i for i in range(len(self.partitions)) if i not in done]

    def run_partition(self, i: int) -> None:
        """Run ONE input partition as a distributed sub-job and commit its
        per-key partial blobs atomically."""
        import ray.data as rd

        t0 = time.monotonic()
        frags = self.partitions[i]
        ds = rd.read_parquet(frags)
        n_rows = ds.count()
        ds = prepare(ds, self.spec)
        partials = ds.map_batches(
            SketchUpdater,
            fn_constructor_kwargs={"spec": self.spec},
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 4),
        )
        aggs = [SketchMergeAgg(on=c, alias_name=c, wire="bytes") for c in _BLOB_COLS]
        merged = partials.groupby(self.spec.group_key, num_partitions=4).aggregate(*aggs)
        table = pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)

        part_path = os.path.join(self.dir, f"part-{i}.parquet")
        tmp = part_path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, part_path)
        lineage = {
            "partition": i,
            "fragments": frags,
            "rows": n_rows,
            "keys": table.num_rows,
            "secs": round(time.monotonic() - t0, 3),
            "ts": time.time(),
        }
        lin_tmp = os.path.join(self.dir, f"part-{i}.lineage.json.tmp")
        with open(lin_tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(lin_tmp, os.path.join(self.dir, f"part-{i}.lineage.json"))
        self.manifest["done"] = sorted(set(self.manifest["done"]) | {i})
        self._write_manifest()

    def run(self, fail_after: int | None = None):
        """Run all pending partitions (optionally fault-inject after N for
        the resume test), then merge. Already-done partitions are never
        re-read — resume-by-union over their persisted partials."""
        for n, i in enumerate(self.pending()):
            if fail_after is not None and n >= fail_after:
                raise RuntimeError(f"fault injection: stopping after {fail_after} partitions")
            self.run_partition(i)
        return self.merged()

    def merged(self) -> pa.Table:
        """Union all committed partition partials → final per-key blobs."""
        if self.pending():
            raise RuntimeError(f"partitions {self.pending()} not finished")
        from .sketches import Sketch

        per_key: dict[str, dict[str, object]] = {}
        for i in range(len(self.partitions)):
            t = pq.read_table(os.path.join(self.dir, f"part-{i}.parquet"))
            for row in t.to_pylist():
                key = row[self.spec.group_key]
                slot = per_key.setdefault(key, {})
                for c in _BLOB_COLS:
                    sk = Sketch.from_bytes(row[c])
                    slot[c] = sk if c not in slot else slot[c].merge(sk)
        keys = sorted(per_key)
        cols: dict[str, list] = {self.spec.group_key: keys}
        for c in _BLOB_COLS:
            cols[c] = [per_key[k][c].to_bytes() for k in keys]
        return pa.table(
            {
                self.spec.group_key: pa.array(cols[self.spec.group_key], pa.string()),
                **{c: pa.array(cols[c], pa.binary()) for c in _BLOB_COLS},
            }
        )

    def lineage(self) -> list[dict]:
        out = []
        for i in sorted(self.manifest["done"]):
            with open(os.path.join(self.dir, f"part-{i}.lineage.json")) as f:
                out.append(json.load(f))
        return out
