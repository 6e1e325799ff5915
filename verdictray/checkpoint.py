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
import threading
import time
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import (SketchJobSpec, fused_active, partial_blob_cols,
                       prepare, split_fused_batch)
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
        self._manifest_lock = threading.Lock()
        self._plan_lock = threading.Lock()
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
            # reconcile: a crash between a task-side part commit and the
            # driver-side manifest write leaves committed partitions
            # unrecorded — their part+lineage pair on disk IS the commit
            done = set(m["done"])
            for i in range(len(self.partitions)):
                if i in done:
                    continue
                if (os.path.exists(os.path.join(self.dir, f"part-{i}.parquet"))
                        and os.path.exists(
                            os.path.join(self.dir, f"part-{i}.lineage.json"))):
                    done.add(i)
            m["done"] = sorted(done)
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
        per-key partial blobs atomically. Thread-safe: partitions touch
        disjoint part files and the manifest update is lock-guarded."""
        import ray.data as rd

        t0 = time.monotonic()
        frags = self.partitions[i]
        # lineage row count comes from parquet footers — a ds.count() here
        # would execute a second full read of the partition (ADVICE r1)
        n_rows = sum(pq.read_metadata(f).num_rows for f in frags)
        # plan construction is serialized: Ray's driver-side path resolution
        # re-attempts a fsspec http import per call, and concurrent attempts
        # race into a plain ImportError it doesn't catch. Execution (the
        # long part, below) still overlaps across partitions.
        with self._plan_lock:
            ds = rd.read_parquet(frags)
            ds = prepare(ds, self.spec)
        spec = self.spec

        # stateless-task updater: each concurrent partition sub-job with
        # its own actor pool would reserve CPUs and can starve the shuffle
        # tasks outright on small CPU budgets (pool CPU reservation)
        def update_batch(batch: pa.Table) -> pa.Table:
            return SketchUpdater(spec)(batch)

        partials = ds.map_batches(
            update_batch,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # compact the partials per key HERE, not with a groupby: a
        # per-partition all-to-all adds two barriers and ~1s of driver-side
        # executor overhead per sub-job, which serializes (GIL) across the
        # in-flight window. Partial volume per partition is keys x blocks
        # tiny blobs — merging them on the driver is microseconds, and the
        # part file stays one row per key either way.
        raw = pa.Table.from_pandas(partials.to_pandas(), preserve_index=False)
        from .sketches import Sketch

        per_key: dict[str, dict[str, object]] = {}
        key_np = raw[self.spec.group_key].to_pylist()
        pcols = partial_blob_cols(self.spec)
        blob_np = {c: raw[c].to_pylist() for c in pcols}
        for r, key in enumerate(key_np):
            slot = per_key.setdefault(key, {})
            for c in pcols:
                sk = Sketch.from_bytes(blob_np[c][r])
                slot[c] = sk if c not in slot else slot[c].merge(sk)
        keys = sorted(per_key)
        table = pa.table({
            self.spec.group_key: pa.array(keys, pa.string()),
            **{c: pa.array([per_key[k][c].to_bytes() for k in keys], pa.binary())
               for c in pcols},
        })

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
        with self._manifest_lock:
            self.manifest["done"] = sorted(set(self.manifest["done"]) | {i})
            self._write_manifest()

    def run(self, fail_after: int | None = None):
        """Run all pending partitions, then merge. Already-done partitions
        are never re-read — resume-by-union over their persisted partials.

        The normal path is ONE streaming Ray Data execution over every
        pending partition (run_streaming): partition-per-sub-job loops pay
        ~1 s of driver-side planning/executor overhead per partition, which
        serializes on the driver GIL no matter how many sub-jobs run in
        parallel — measured 4-9x the flagship wall-time on 8 partitions,
        whether sequential or thread-windowed.

        ``fail_after=N`` (the resume test's fault hook) runs the
        partition-at-a-time path sequentially and raises after N commits —
        a deterministic failure point needs a deterministic execution
        order."""
        pending = self.pending()
        if fail_after is not None:
            for n, i in enumerate(pending):
                if n >= fail_after:
                    raise RuntimeError(
                        f"fault injection: stopping after {fail_after} partitions")
                self.run_partition(i)
            return self.merged()
        if pending:
            self.run_streaming(pending)
        return self.merged()

    def run_streaming(self, pending: list[int]) -> None:
        """All pending partitions in ONE streaming execution, with
        per-partition atomic commits inside the pipeline:

            read(pending fragments, include_paths)
            → tag rows with _part (fragment → partition id)
            → prepare (sha256 + features, content projected away)
            → SketchUpdater keyed on the composite (_part, key)
              — map-side combine exactly as in the flagship
            → groupby(_part).map_groups(commit)
              — merge that partition's partial blobs per key, write
                part-<i>.parquet + lineage atomically (temp + rename,
                idempotent under task retry)

        Only KiB blob partials cross the one shuffle; a 10^12-row run is a
        single backpressured stream, not a serial loop of cluster barriers.
        Commit tasks write to the checkpoint dir (shared FS on a real
        cluster — same assumption the metrics JSONL files make)."""
        import ray.data as rd

        from .sketches import Sketch

        SEP = "\x1f"
        frag_by_base: dict[str, int] = {}
        for i in pending:
            for f in self.partitions[i]:
                base = os.path.basename(f)
                if base in frag_by_base:
                    raise ValueError(f"duplicate fragment basename {base}; "
                                     "cannot map read paths to partitions")
                frag_by_base[base] = i
        frags = [f for i in pending for f in self.partitions[i]]
        part_rows = {
            i: sum(pq.read_metadata(f).num_rows for f in self.partitions[i])
            for i in pending
        }
        spec = self.spec
        key_col = spec.group_key
        out_dir = self.dir

        # zero-row partitions produce no group downstream — commit their
        # empty part files here so the done-set stays complete
        empties = [i for i in pending if part_rows[i] == 0]
        for i in empties:
            table = pa.table({
                key_col: pa.array([], pa.string()),
                **{c: pa.array([], pa.binary()) for c in partial_blob_cols(spec)},
            })
            part_path = os.path.join(out_dir, f"part-{i}.parquet")
            pq.write_table(table, part_path + ".tmp")
            os.replace(part_path + ".tmp", part_path)
            with open(os.path.join(out_dir, f"part-{i}.lineage.json.tmp"), "w") as f:
                json.dump({"partition": i, "fragments": self.partitions[i],
                           "rows": 0, "keys": 0, "secs": 0.0,
                           "mode": "streaming", "ts": time.time()}, f)
            os.replace(os.path.join(out_dir, f"part-{i}.lineage.json.tmp"),
                       os.path.join(out_dir, f"part-{i}.lineage.json"))
        pending = [i for i in pending if part_rows[i] > 0]
        if not pending:
            with self._manifest_lock:
                self.manifest["done"] = sorted(set(self.manifest["done"]) | set(empties))
                self._write_manifest()
            return
        frags = [f for i in pending for f in self.partitions[i]]

        # prune at the read exactly like the flagship (group key + content
        # only); pruning also frees the "path" name for include_paths —
        # the corpus has its own path column we'd otherwise collide with
        if key_col == "path":
            raise ValueError('streaming checkpoint run cannot use group_key="path" '
                             "(collides with include_paths); use run_partition")
        cols = sorted({key_col, "content"})
        ds = rd.read_parquet(frags, columns=cols, include_paths=True)

        def tag(b: pa.Table) -> pa.Table:
            # paths repeat per block — map the dictionary, not the rows
            enc = b["path"].combine_chunks().dictionary_encode()
            pid_of = [frag_by_base[os.path.basename(p)]
                      for p in enc.dictionary.to_pylist()]
            pids = pa.array(pid_of, pa.int32()).take(enc.indices)
            return b.append_column("_part", pids).drop_columns(["path"])

        ds = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        ds = prepare(ds, spec, extra_cols=["_part"])

        def composite(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            pk = pc.binary_join_element_wise(
                pc.cast(b["_part"], pa.string()), pc.cast(b[key_col], pa.string()),
                SEP)
            b = b.append_column("_pk", pk)
            return b.drop_columns(["_part"] + ([key_col] if key_col != "_pk" else []))

        ds = ds.map_batches(composite, batch_format="pyarrow", zero_copy_batch=True)
        from dataclasses import replace

        pk_spec = replace(spec, group_key="_pk")

        def update_batch(batch: pa.Table) -> pa.Table:
            return SketchUpdater(pk_spec)(batch)

        partials = ds.map_batches(update_batch, batch_size=spec.updater_batch_rows,
                                  batch_format="pyarrow", zero_copy_batch=True)

        def split_pk(b: pa.Table) -> pa.Table:
            parts, keys = [], []
            for s in b["_pk"].to_pylist():
                p, k = s.split(SEP, 1)
                parts.append(int(p))
                keys.append(k)
            b = b.append_column("_part", pa.array(parts, pa.int32()))
            b = b.append_column(key_col, pa.array(keys, pa.string()))
            return b.drop_columns(["_pk"])

        partials = partials.map_batches(split_pk, batch_format="pyarrow")

        def commit(group: pa.Table) -> pa.Table:
            t0 = time.monotonic()
            i = int(group["_part"][0].as_py())
            per_key: dict[str, dict[str, object]] = {}
            pcols = partial_blob_cols(spec)
            keys_l = group[key_col].to_pylist()
            blobs_l = {c: group[c].to_pylist() for c in pcols}
            for r, key in enumerate(keys_l):
                slot = per_key.setdefault(key, {})
                for c in pcols:
                    sk = Sketch.from_bytes(blobs_l[c][r])
                    slot[c] = sk if c not in slot else slot[c].merge(sk)
            keys = sorted(per_key)
            table = pa.table({
                key_col: pa.array(keys, pa.string()),
                **{c: pa.array([per_key[k][c].to_bytes() for k in keys],
                               pa.binary()) for c in pcols},
            })
            part_path = os.path.join(out_dir, f"part-{i}.parquet")
            tmp = f"{part_path}.tmp.{os.getpid()}"
            pq.write_table(table, tmp)
            os.replace(tmp, part_path)
            lineage = {
                "partition": i,
                "fragments": list(_frags_of(i)),
                "rows": part_rows[i],
                "keys": table.num_rows,
                "secs": round(time.monotonic() - t0, 3),
                "mode": "streaming",
                "ts": time.time(),
            }
            lin_tmp = os.path.join(out_dir, f"part-{i}.lineage.json.tmp.{os.getpid()}")
            with open(lin_tmp, "w") as f:
                json.dump(lineage, f)
            os.replace(lin_tmp, os.path.join(out_dir, f"part-{i}.lineage.json"))
            return pa.table({"partition": pa.array([i], pa.int32()),
                             "keys": pa.array([table.num_rows], pa.int64())})

        parts_list = self.partitions

        def _frags_of(i: int) -> list[str]:
            return parts_list[i]

        committed = partials.groupby("_part").map_groups(
            commit, batch_format="pyarrow").to_pandas()
        done_now = sorted(int(p) for p in committed["partition"])
        missing = set(pending) - set(done_now)
        if missing:
            raise RuntimeError(f"streaming run produced no rows for partitions "
                               f"{sorted(missing)} — refusing to mark them done")
        with self._manifest_lock:
            self.manifest["done"] = sorted(
                set(self.manifest["done"]) | set(done_now) | set(empties))
            self._write_manifest()

    def merged(self) -> pa.Table:
        """Union all committed partition partials → final per-key blobs."""
        if self.pending():
            raise RuntimeError(f"partitions {self.pending()} not finished")
        from .sketches import Sketch

        pcols = partial_blob_cols(self.spec)
        per_key: dict[str, dict[str, object]] = {}
        for i in range(len(self.partitions)):
            t = pq.read_table(os.path.join(self.dir, f"part-{i}.parquet"))
            for row in t.to_pylist():
                key = row[self.spec.group_key]
                slot = per_key.setdefault(key, {})
                for c in pcols:
                    sk = Sketch.from_bytes(row[c])
                    slot[c] = sk if c not in slot else slot[c].merge(sk)
        keys = sorted(per_key)
        out = pa.table(
            {
                self.spec.group_key: pa.array(keys, pa.string()),
                **{c: pa.array([per_key[k][c].to_bytes() for k in keys],
                               pa.binary()) for c in pcols},
            }
        )
        if fused_active(self.spec):
            out = split_fused_batch(out)
        return out

    def lineage(self) -> list[dict]:
        out = []
        for i in sorted(self.manifest["done"]):
            with open(os.path.join(self.dir, f"part-{i}.lineage.json")) as f:
                out.append(json.load(f))
        return out
