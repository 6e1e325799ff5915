"""Stateful actor-pool sketch updater (SURVEY.md §2.3; BASELINE.json
north_star: "stateful actor-pool stage using map_batches over zero-copy
Arrow batches that updates per-partition sketch state").

``SketchUpdater`` is a callable CLASS → Ray runs it as an actor pool:
construction cost (sketch factories, hash setup) is paid once per actor;
each ``__call__`` receives one whole block (``batch_size=None``) and
builds the per-partition sketch state {group key → 5 sketches} for that
block, emitting one partial-blob row per key. The partials then flow into
the same Stage-B blob merge as the pure-UDAF path — split-invariance
(tests/test_properties.py) makes the two paths answer-equivalent, which
tests/test_updater.py asserts.

Map-side combining: each emitted row summarizes a whole block, so the
downstream groupby shuffles ~keys×blocks tiny blob rows instead of raw
rows — at 10^12-file scale this is the difference between shuffling
terabytes and shuffling megabytes.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .pipeline import SketchJobSpec, fused_active, partial_blob_cols
from .sketches import BloomFilter, CountMin, FusedHashSketch, HyperLogLog, KLL, TDigest


def _factories(spec: SketchJobSpec):
    return {
        "hll_blob": lambda: HyperLogLog(p=spec.hll_p),
        "cms_blob": lambda: CountMin(eps=spec.cms_eps, delta=spec.cms_delta,
                                     hh_capacity=spec.hh_capacity),
        "bloom_blob": lambda: BloomFilter(capacity=spec.bloom_capacity, fpp=spec.bloom_fpp),
        "kll_blob": lambda: KLL(k=spec.kll_k),
        "tdigest_blob": lambda: TDigest(compression=spec.tdigest_compression),
        "fused_blob": lambda: FusedHashSketch(
            hll_p=spec.hll_p, cms_eps=spec.cms_eps, cms_delta=spec.cms_delta,
            hh_capacity=spec.hh_capacity, bloom_capacity=spec.bloom_capacity,
            bloom_fpp=spec.bloom_fpp),
    }


class SketchUpdater:
    """Actor-pool map_batches stage: Arrow block in → per-key partial
    sketch blobs out."""

    def __init__(self, spec: SketchJobSpec, metrics_dir: str | None = None,
                 salts: int = 0):
        self._spec = spec
        self._factories = _factories(spec)
        self._cols = spec.sketch_cols
        # fused mode: one (hash, count) blob replaces the three hash-sketch
        # blobs — half the shuffle bytes, one union per merge
        self._blob_cols = partial_blob_cols(spec)
        self._metrics_dir = metrics_dir or spec.metrics_dir
        self._salts = salts  # >0 → emit a _salt column for the two-stage merge
        # fused + salts>1 → HASH-RANGE sharding: each per-key unique-hash
        # array splits into `salts` disjoint range shards (searchsorted on
        # the already-sorted uniques, ~free) and one partial row is emitted
        # per (key, shard). Stage A's (key, _salt) groups then own disjoint
        # hash ranges, so the global per-key unique happens ONCE, in
        # parallel across shards — and hot shards can materialize dense
        # components there (promote_if_projected_dense), leaving Stage B a
        # vectorized max/add/OR instead of the serial per-hot-key
        # concat-unique + scatter tail (measured ~5 s for a 4.6M-distinct
        # key; BASELINE.md §Scaling).
        self._shard_mode = salts > 1 and "fused_blob" in self._blob_cols
        if self._shard_mode:
            self._shard_bounds = (np.arange(1, salts, dtype=np.uint64)
                                  * np.uint64((1 << 64) // salts))
            # value sketches (KLL/t-digest) are not hash-shardable; their
            # full state rides shard 0 and empty states pad the other rows
            self._empty_value_blobs = {
                c: self._factories[c]().to_bytes()
                for c in self._blob_cols if c != "fused_blob"
            }
        self._blocks_seen = 0
        if self._metrics_dir:
            import os

            os.makedirs(self._metrics_dir, exist_ok=True)
            # keyed by worker pid: valid for both actor-pool and task mode
            self._metrics_path = f"{self._metrics_dir}/updater-{os.getpid()}.jsonl"

    def __call__(self, block: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        key_col = self._spec.group_key
        if len(block) == 0:
            # empty blocks are legal (empty parquet fragments, fully
            # filtered batches) — emit an empty table with the output
            # schema; the key type must follow the input (a non-string
            # group key hardcoded to string would fail the downstream
            # union/groupby — ADVICE r2)
            key_type = (block.schema.field(key_col).type
                        if key_col in block.schema.names else pa.string())
            fields = [(key_col, key_type)]
            if self._salts:
                fields.append(("_salt", pa.int32()))
            fields += [(c, pa.binary()) for c in self._blob_cols]
            return pa.table({n: pa.array([], t) for n, t in fields})
        # group the block by key via dictionary codes: the argsort runs on
        # int32 codes (no per-row Python key objects, ~10x faster compare)
        # and key VALUES materialize once per distinct key, not per row
        enc = pc.dictionary_encode(block[key_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        key_values = enc.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        boundaries = np.flatnonzero(
            np.concatenate([[True], sorted_codes[1:] != sorted_codes[:-1]])
        )
        # the three hash-sketches share one base hash of the item column,
        # computed once per batch (they derive seeded variants internally).
        # Hash from the ARROW column: fixed-width strings (sha256 hex) take
        # the buffer-level SipHash fast path — no per-row Python objects
        from .sketches.hashing import derive64, hash_base

        hash_cols = {self._cols[k] for k in ("hll", "cms", "bloom")}
        base_np = {name: hash_base(block[name]) for name in hash_cols}
        # one Arrow→numpy conversion per column needed as VALUES (the
        # value sketches' numeric inputs; the hash column only when
        # heavy-hitter candidates need representative values); per-key
        # slices are then cheap fancy-indexing
        value_cols = {c for k, c in self._cols.items()
                      if k not in ("hll", "cms", "bloom")}
        if self._spec.hh_capacity:
            value_cols |= hash_cols
        col_np = {
            name: block[name].to_numpy(zero_copy_only=False)
            for name in value_cols
        }
        out_keys: list[str] = []
        out_salts: list[int] = []
        out_blobs: dict[str, list[bytes]] = {c: [] for c in self._blob_cols}
        for i, start in enumerate(boundaries):
            end = boundaries[i + 1] if i + 1 < len(boundaries) else len(sorted_codes)
            sel = order[start:end]
            if self._shard_mode:
                self._emit_shards(key_values[sorted_codes[start]], sel, col_np, base_np,
                                  out_keys, out_salts, out_blobs)
                continue
            out_keys.append(key_values[sorted_codes[start]])
            # dedupe the item-hash slice ONCE; HLL/CMS/Bloom all consume the
            # unique set (duplicates cannot change any of them) — one sort
            # per key-slice instead of one per sketch
            uniq_cache: dict[str, tuple] = {}

            def uniq_of(col):
                if col not in uniq_cache:
                    raw = base_np[col][sel]
                    uniq_cache[col] = (*np.unique(raw, return_index=True,
                                                  return_counts=True), len(raw))
                return uniq_cache[col]

            for blob_col in self._blob_cols:
                sk = self._factories[blob_col]()
                if blob_col == "fused_blob":
                    col = self._cols["hll"]
                    bu, first_ix, cnt, n_raw = uniq_of(col)
                    reps = col_np[col][sel][first_ix] if sk.hh_capacity else None
                    sk.update_unique(bu, cnt, reps=reps, n_raw=n_raw)
                elif blob_col in ("hll_blob", "cms_blob", "bloom_blob"):
                    col = self._cols[blob_col.removesuffix("_blob")]
                    bu, first_ix, cnt, n_raw = uniq_of(col)
                    if blob_col == "hll_blob":
                        sk.update_hashed(derive64(bu, sk.seed), assume_unique=True)
                    elif blob_col == "cms_blob":
                        reps = col_np[col][sel][first_ix] if sk.hh_capacity else None
                        sk.update_unique(bu, cnt, reps=reps, n_raw=n_raw)
                    else:
                        sk.update_hashed(bu, assume_unique=True, n_raw=n_raw)
                else:
                    col = self._cols[blob_col.removesuffix("_blob")]
                    sk.update(col_np[col][sel])
                out_blobs[blob_col].append(sk.to_bytes())
        self._blocks_seen += 1
        if self._metrics_dir:
            self._emit_metrics(block, len(out_keys), time.monotonic() - t0)
        # key dtype follows the input schema (a non-string group key
        # hardcoded to string would fail the downstream union/groupby)
        cols = {key_col: pa.array(out_keys, block.schema.field(key_col).type)}
        if self._shard_mode:
            cols["_salt"] = pa.array(out_salts, pa.int32())
        elif self._salts:
            # non-fused fallback: block-random salting. Any block→salt
            # assignment yields the same final merged state (merge
            # associativity); hashing the block's first row spreads each
            # key's partials over the salt domain deterministically and
            # works in both actor and per-batch-task mode
            from .sketches.hashing import hash64

            first = block[self._cols["hll"]][0].as_py()
            salt = int(hash64(np.array([first], dtype=object), seed=99)[0]
                       % np.uint64(self._salts))
            cols["_salt"] = pa.array([salt] * len(out_keys), pa.int32())
        cols.update({c: pa.array(v, pa.binary()) for c, v in out_blobs.items()})
        return pa.table(cols)

    def _emit_shards(self, key, sel, col_np, base_np, out_keys, out_salts,
                     out_blobs) -> None:
        """Hash-range-sharded partial rows for one key slice: `salts` rows,
        shard s owning base hashes in [s, s+1) x 2^64/salts. Disjoint
        ranges make Stage A's (key, _salt) reduces partition the key's
        unique-hash work exactly once; raw-row count, heavy-hitter
        candidates and the value sketches (KLL/t-digest) ride shard 0."""
        hash_col = self._cols["hll"]
        raw = base_np[hash_col][sel]
        bu, first_ix, cnt = np.unique(raw, return_index=True, return_counts=True)
        cuts = np.searchsorted(bu, self._shard_bounds)
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(bu)]])
        value_blobs = {}
        for c in self._empty_value_blobs:
            sk = self._factories[c]()
            sk.update(col_np[self._cols[c.removesuffix("_blob")]][sel])
            value_blobs[c] = sk.to_bytes()
        for s in range(self._salts):
            sk = self._factories["fused_blob"]()
            sk.update_unique(bu[starts[s]:ends[s]], cnt[starts[s]:ends[s]],
                             reps=None, n_raw=len(raw) if s == 0 else 0)
            if s == 0 and self._spec.hh_capacity:
                sk._track_candidates(col_np[hash_col][sel][first_ix], cnt)
            out_keys.append(key)
            out_salts.append(s)
            out_blobs["fused_blob"].append(sk.to_bytes())
            for c, empty in self._empty_value_blobs.items():
                out_blobs[c].append(value_blobs[c] if s == 0 else empty)

    def _emit_metrics(self, block: pa.Table, n_keys: int, secs: float) -> None:
        import json

        rec = {
            "ts": time.time(),
            "rows": len(block),
            "bytes": block.nbytes,
            "keys": n_keys,
            "secs": round(secs, 4),
            "blocks_seen": self._blocks_seen,
        }
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def build_sketches_actor_pool(ds, spec: SketchJobSpec, concurrency=(2, 8),
                              metrics_dir: str | None = None,
                              updater_mode: str = "tasks"):
    """The flagship shape: prepare → SketchUpdater (per-partition partials)
    → SALTED two-stage blob merge:

      Stage A: groupby((key, _salt)) merges each hot key's partials across
               `salts` parallel reduce tasks — at 10^12-row scale a dominant
               language contributes ~one partial per input block (millions),
               which must not serialize through a single reduce task.
               In fused mode the salt is a HASH-RANGE shard (updater emits
               one partial per (key, shard), disjoint hash ranges): each
               reduce owns its range outright, the global per-key unique
               happens once instead of once per salt plus a re-unique, and
               shards of projected-dense keys materialize their component
               sketches here in parallel (promote_if_projected_dense).
      Stage B: groupby(key) merges the ≤`salts` survivors per key — for
               hot keys a vectorized register-max/table-add/bitmap-OR of
               the pre-materialized dense shards, no longer the serial
               concat-unique + scatter tail (~5 s per 4.6M-distinct key,
               the r2 scaling limiter; BASELINE.md §Scaling).

    ``updater_mode`` picks the physical mapping of the updater stage:

      - "tasks" (default): SketchUpdater constructed per batch in plain
        map_batches tasks. The per-partition sketch state lives for exactly
        one partition's processing either way (the updater holds no
        cross-partition state), and tasks reuse warm worker processes —
        measured 0.83 scaling efficiency 8→32 CPUs vs ~0.35 for a fresh
        actor pool, whose creation cost grows with pool size and dominates
        short runs.
      - "actors": the contract-literal stateful actor pool — pays one pool
        spin-up per execution (amortized on hours-long 100 TB jobs, and the
        right choice when the stage holds real cross-batch state: metrics
        files, checkpoint buffers, broadcast probe filters).

    Equivalent in final sketch state to pipeline.build_sketches_direct
    (split-invariance + merge associativity, tested in test_updater.py);
    only blob partials ever shuffle — raw rows never leave the map stage.
    """
    from .pipeline import prepare

    ds = prepare(ds, spec)
    # large batches = the "partition" the updater sketches in one state
    # update; coalescing small input blocks cuts the partial-blob count
    # (and thus Stage-A merge work) by the same factor. Rows here are
    # already narrow (content was projected away in prepare()).
    common = dict(
        batch_size=spec.updater_batch_rows,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if updater_mode == "actors":
        partials = ds.map_batches(
            SketchUpdater,
            fn_constructor_kwargs={"spec": spec, "metrics_dir": metrics_dir,
                                   "salts": spec.salts},
            concurrency=concurrency,
            **common,
        )
    else:
        salts = spec.salts

        def update_batch(batch: pa.Table) -> pa.Table:
            return SketchUpdater(spec, metrics_dir=metrics_dir, salts=salts)(batch)

        partials = ds.map_batches(update_batch, **common)
    if spec.stage_partials:
        # Stage the blob partials before the all-to-all. The groupby is a
        # barrier either way (sort-shuffle consumes ALL input before
        # reducing); staging here stops the shuffle's map tasks from
        # running concurrently with — and starving — the updater tasks
        # under constrained CPU budgets: measured 20.5s → 11.1s at
        # num_cpus=8 on the 4M-row bench (32-cpu level 6.9 → 5.4s).
        # Partials are the map-side-combined small data (~0.4% of input
        # bytes), so pinning them is cheap at any scale and spill handles
        # overflow.
        partials = partials.materialize()
    cols = partial_blob_cols(spec)
    # Both merge stages run as map_groups with a K-WAY merge, not as
    # aggregate(): AggregateFnV2's combine() folds accumulators PAIRWISE
    # with a serialize/deserialize round-trip per step, so a hot key whose
    # `salts` multi-MB partials arrive from different Stage-A partitions
    # pays ~salts x (deserialize + union sort + reserialize) inside one
    # reduce task — measured as a ~12 s CPU-count-invariant wall at 16M
    # rows. map_groups hands each group's rows to one task in one table;
    # merge_many does one concatenate + one sort.
    shard_mode = spec.salts > 1 and fused_active(spec)
    stage_a = partials.groupby(
        [spec.group_key, "_salt"], num_partitions=min(32, spec.salts * 2),
    ).map_groups(
        _merge_group_fn(spec.group_key, cols, extra_cols=["_salt"],
                        force_promote_shards=spec.salts if shard_mode else 0),
        batch_format="pyarrow",
    )
    if spec.stage_partials:
        # same starvation logic as the partials staging above, one stage
        # later: Stage B's sort-shuffle map tasks otherwise run concurrent
        # with (and preempt) the Stage-A merge tasks under small CPU
        # budgets. Stage A output is ≤ groups x salts rows — pinning it is
        # cheap at any scale.
        stage_a = stage_a.materialize()
    merged = stage_a.groupby(spec.group_key, num_partitions=16).map_groups(
        _merge_group_fn(spec.group_key, cols,
                        split_fused=fused_active(spec)),
        batch_format="pyarrow",
    )
    return merged


def merge_sketch_blobs(blobs: list[bytes]):
    """K-way merge of serialized sketches → one live sketch."""
    from .sketches import Sketch

    sketches = [Sketch.from_bytes(b) for b in blobs]
    acc = sketches[0]
    if len(sketches) > 1:
        if hasattr(acc, "merge_many"):
            acc.merge_many(sketches[1:])
        else:
            for sk in sketches[1:]:
                acc.merge(sk)
    return acc


def _merge_group_fn(key_col: str, cols: list[str], extra_cols: list[str] = (),
                    split_fused: bool = False, force_promote_shards: int = 0):
    """Per-group merge task: one output row per group with merged blobs;
    optionally splits the fused blob into the canonical component blobs
    (so the final stage emits the 5-column schema directly).

    ``force_promote_shards``: Stage A under hash-range sharding — this
    group holds one of N disjoint hash-range shards of its key, so if the
    key's projected total would promote, materialize the dense components
    HERE (parallel across shards) and hand Stage B a vectorized
    max/add/OR merge instead of the serial per-hot-key scatter."""

    def merge_group(g: pa.Table) -> pa.Table:
        out: dict[str, list] = {key_col: [g[key_col][0].as_py()]}
        for e in extra_cols:
            out[e] = [g[e][0].as_py()]
        merged = {c: merge_sketch_blobs(g[c].to_pylist()) for c in cols}
        if force_promote_shards and "fused_blob" in merged:
            merged["fused_blob"].promote_if_projected_dense(force_promote_shards)
        if split_fused:
            hll, cms, bloom = merged.pop("fused_blob").split()
            out["hll_blob"] = [hll.to_bytes()]
            out["cms_blob"] = [cms.to_bytes()]
            out["bloom_blob"] = [bloom.to_bytes()]
        for c, sk in merged.items():
            out[c] = [sk.to_bytes()]
        arrays = {}
        for name, vals in out.items():
            if name == key_col:
                arrays[name] = pa.array(vals, g.schema.field(key_col).type)
            elif name in extra_cols:
                arrays[name] = pa.array(vals)
            else:
                arrays[name] = pa.array(vals, pa.binary())
        return pa.table(arrays)

    return merge_group
