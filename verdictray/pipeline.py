"""The flagship build_sketches job (SURVEY.md §3.1; BASELINE.json north_star).

Shape mandated by the contract:

    read corpus → map_batches(sha256 + features)        stateless Arrow tasks
    → project content away (narrow rows shuffle)        select_columns
    → map_batches(add_salt)                             stateless
    → STAGE A: groupby((key, salt)).aggregate(sketch UDAFs → blobs)
        — the explicit shuffle whose aggregate step merges sketches
          associatively; the salt splits hot keys (dominant languages)
          across `salts` reduce partitions
    → STAGE B: groupby(key).aggregate(SketchMergeAgg)
        — merges the ≤`salts` salted partials per key; input is tiny
    → finalize → estimates rows (long format) → write_parquet

Stage B merges *sketch blobs*, never re-accumulates raw values, so salted
two-stage aggregation cannot double-count (SURVEY.md §7 watch list).

Scale notes (100 TB / 10^12 rows): only narrow columns (key, 64-char sha,
two int64s, salt) cross the Stage-A shuffle — `content` never leaves the
first map stage; Stage B moves ≤ groups×salts blob rows (KiB each).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

import ray.data as rd

from . import io as vio
from . import ops
from .sketches import Sketch
from .udaf import BloomAgg, CmsAgg, HllAgg, KllAgg, SketchMergeAgg, TDigestAgg

DEFAULT_PHIS = (0.01, 0.25, 0.5, 0.75, 0.99)


@dataclass
class SketchJobSpec:
    """Config for a build_sketches run (SURVEY.md §3.1)."""

    input_path: str
    group_key: str = "lang"
    salts: int = 16
    hll_p: int = 14
    cms_eps: float = 1e-3
    cms_delta: float = 1e-2
    hh_capacity: int = 32
    tdigest_compression: float = 100.0
    kll_k: int = 200
    bloom_capacity: int = 1_000_000
    bloom_fpp: float = 0.01
    phis: tuple = DEFAULT_PHIS
    # reduce partitions for the raw-row Stage-A shuffle; None → Ray default
    # (200). Set ~2× the CPU count: each extra partition costs per-block
    # slicing overhead in the sort-shuffle map tasks.
    shuffle_partitions: int | None = 64
    # rows per SketchUpdater call (the per-partition state unit); narrow
    # post-projection rows (~100 B) make 64k-row batches ~6 MiB. None →
    # whole-block batches (no cross-block bundling; pair with
    # read_num_blocks for block-aligned updates)
    updater_batch_rows: int | None = 65536
    # override_num_blocks for the corpus read. Fewer, bigger blocks cut
    # the driver's per-block event handling — at 16M rows the default
    # ~25k-row blocks capped the whole pipeline at ~530k rows/s
    # regardless of CPU count (driver event loop); 64 blocks lifted it to
    # ~700k+. Keep it independent of CPU count so scaling runs compare
    # identical jobs.
    read_num_blocks: int | None = None
    # coalesce prepared blocks to this many before the raw-row groupby
    # (direct path only): the sort-aggregate's map side pre-aggregates per
    # (block × group) slice, so many small blocks mean many tiny sketch
    # partials — coalescing measured 3x on the direct path. None disables.
    pre_shuffle_blocks: int | None = 32
    out_dir: str | None = None
    checkpoint_dir: str | None = None
    metrics_dir: str | None = None
    # re-compute sha256 at the end of prepare() and assert equality with
    # the carried column — the contract's end-to-end invariant check
    # (doubles the hash work; enable for acceptance runs)
    verify_sha: bool = False
    # stage (materialize) the KiB-blob partials before the Stage-A
    # all-to-all: the shuffle is a barrier regardless, and staging keeps
    # its map tasks from starving the updater stage on small CPU budgets
    # (measured 2x at 8 CPUs; see updater.build_sketches_actor_pool)
    stage_partials: bool = True
    # fuse the three hash sketches' partials into ONE (hash, count) blob
    # per key (sketches/fused.py): ~2x less shuffle volume and one union
    # merge instead of three; split back into the canonical three blobs
    # after the final merge (byte-identical output — tested). Applies
    # only when hll/cms/bloom share an input column.
    fuse_hash_sketches: bool = True
    sketch_cols: dict = field(
        default_factory=lambda: {
            "hll": "content_sha256",
            "cms": "content_sha256",
            "bloom": "content_sha256",
            "kll": "n_bytes",
            "tdigest": "n_bytes",
        }
    )


def _stage_a_aggs(spec: SketchJobSpec):
    # blob outputs feed the Stage-B merge; wire="bytes" keeps partial
    # accumulators Arrow-native at stage boundaries (see udaf.SketchAgg)
    c = spec.sketch_cols
    return [
        HllAgg(on=c["hll"], alias_name="hll_blob", p=spec.hll_p, output="blob",
               wire="bytes"),
        CmsAgg(on=c["cms"], alias_name="cms_blob", eps=spec.cms_eps,
               delta=spec.cms_delta, hh_capacity=spec.hh_capacity, output="blob",
               wire="bytes"),
        BloomAgg(on=c["bloom"], alias_name="bloom_blob",
                 capacity=spec.bloom_capacity, fpp=spec.bloom_fpp, output="blob",
                 wire="bytes"),
        KllAgg(on=c["kll"], alias_name="kll_blob", k=spec.kll_k, output="blob",
               wire="bytes"),
        TDigestAgg(on=c["tdigest"], alias_name="tdigest_blob",
                   compression=spec.tdigest_compression, output="blob",
                   wire="bytes"),
    ]


_BLOB_COLS = ["hll_blob", "cms_blob", "bloom_blob", "kll_blob", "tdigest_blob"]
_FUSED_COLS = ["fused_blob", "kll_blob", "tdigest_blob"]


def fused_active(spec: "SketchJobSpec") -> bool:
    c = spec.sketch_cols
    return bool(spec.fuse_hash_sketches) and c["hll"] == c["cms"] == c["bloom"]


def partial_blob_cols(spec: "SketchJobSpec") -> list[str]:
    """Blob columns the updater emits / the merge stages aggregate."""
    return _FUSED_COLS if fused_active(spec) else _BLOB_COLS


def split_fused_batch(batch: pa.Table) -> pa.Table:
    """fused_blob → the three canonical component blobs (post-merge)."""
    hll_b, cms_b, bloom_b = [], [], []
    for blob in batch["fused_blob"].to_pylist():
        hll, cms, bloom = Sketch.from_bytes(blob).split()
        hll_b.append(hll.to_bytes())
        cms_b.append(cms.to_bytes())
        bloom_b.append(bloom.to_bytes())
    out = batch.drop_columns(["fused_blob"])
    out = out.append_column("hll_blob", pa.array(hll_b, pa.binary()))
    out = out.append_column("cms_blob", pa.array(cms_b, pa.binary()))
    out = out.append_column("bloom_blob", pa.array(bloom_b, pa.binary()))
    keys = [n for n in out.schema.names if n not in _BLOB_COLS]
    return out.select(keys + _BLOB_COLS)


def prepare(ds: rd.Dataset, spec: SketchJobSpec,
            extra_cols: tuple | list = ()) -> rd.Dataset:
    """Stateless prep: sha256 + features, then drop `content` so only
    narrow rows reach the shuffle. ``extra_cols`` survive the projection
    (e.g. the checkpoint runner's partition tag)."""
    ds = ds.map_batches(
        lambda b: ops.derive_features(ops.with_sha256(b)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if spec.verify_sha:
        ds = ds.map_batches(ops.verify_sha256, batch_format="pyarrow",
                            zero_copy_batch=True)
    keep = list(extra_cols) + [spec.group_key, "content_sha256", "n_bytes", "n_lines"]
    seen = set()
    keep = [c for c in keep if not (c in seen or seen.add(c))]
    return ds.select_columns(keep)


def sketch_partials(ds: rd.Dataset, spec: SketchJobSpec) -> rd.Dataset:
    """Stage A: salted groupby-aggregate → one blob row per (key, salt)."""
    ds = ds.map_batches(
        lambda b: ops.add_salt(b, on="content_sha256", salts=spec.salts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if spec.pre_shuffle_blocks:
        ds = ds.repartition(spec.pre_shuffle_blocks)
    return ds.groupby(
        [spec.group_key, "_salt"], num_partitions=spec.shuffle_partitions
    ).aggregate(*_stage_a_aggs(spec))


def merge_partials(partials: rd.Dataset, spec: SketchJobSpec) -> rd.Dataset:
    """Stage B: merge the salted partials per key — blob-only, tiny input
    (≤ groups×salts rows), so few reduce partitions."""
    aggs = [SketchMergeAgg(on=c, alias_name=c, wire="bytes") for c in _BLOB_COLS]
    return partials.groupby(spec.group_key, num_partitions=8).aggregate(*aggs)


def estimates_table(batch: pa.Table, spec: SketchJobSpec) -> pa.Table:
    """ONE merged blob table → the long-format estimates table. The
    table-level core of finalize_estimates, shared with the progressive
    surface (progressive.estimates_stream) so a progressive run's final
    emission is byte-identical to the batch finalize by construction."""
    phis = list(spec.phis)

    def to_rows(batch: pa.Table) -> pa.Table:
        keys, types, metrics, estimates, bounds, blobs = [], [], [], [], [], []

        def emit(key, stype, metric, est, bound, blob):
            keys.append(key)
            types.append(stype)
            metrics.append(metric)
            estimates.append(float(est))
            bounds.append(float(bound))
            blobs.append(blob)

        for row in batch.to_pylist():
            key = row[spec.group_key]
            hll = Sketch.from_bytes(row["hll_blob"])
            emit(key, "hll", "count_distinct", hll.estimate(),
                 hll.estimate() * 3 * hll.error_bound(), row["hll_blob"])
            cms = Sketch.from_bytes(row["cms_blob"])
            emit(key, "cms", "total_count", cms.n, cms.error_bound(), row["cms_blob"])
            for item, est in cms.top_k(5):
                emit(key, "cms", f"topk:{item}", est, cms.error_bound(), None)
            bloom = Sketch.from_bytes(row["bloom_blob"])
            emit(key, "bloom", "fill_ratio", bloom.fill_ratio(),
                 bloom.fpp, row["bloom_blob"])
            kll = Sketch.from_bytes(row["kll_blob"])
            for phi in phis:
                emit(key, "kll", f"q{phi}", kll.quantile(phi),
                     kll.error_bound(), None)
            td = Sketch.from_bytes(row["tdigest_blob"])
            for phi in phis:
                emit(key, "tdigest", f"q{phi}", td.quantile(phi), 0.01, None)
            emit(key, "kll", "n_rows", kll.n, 0.0, row["kll_blob"])
        return pa.table(
            {
                "group_key": pa.array(keys, pa.string()),
                "sketch_type": pa.array(types, pa.string()),
                "metric": pa.array(metrics, pa.string()),
                "estimate": pa.array(estimates, pa.float64()),
                "error_bound": pa.array(bounds, pa.float64()),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    return to_rows(batch)


def finalize_estimates(merged: rd.Dataset, spec: SketchJobSpec) -> rd.Dataset:
    """Blob rows → long-format estimates table (SURVEY.md §1.1):
    (group_key, sketch_type, metric, estimate, error_bound, sketch)."""
    return merged.map_batches(lambda b: estimates_table(b, spec),
                              batch_format="pyarrow")


def build_sketches(spec: SketchJobSpec, ds: rd.Dataset | None = None,
                   concurrency=(2, 8)) -> rd.Dataset:
    """Full flagship job: stateful actor-pool updater (map-side combine)
    followed by the salted two-stage blob merge (updater.py). Returns the
    merged per-key blob table (one row per group key, five blob columns) —
    call finalize_estimates for the long-format estimates table, or write
    via spec.out_dir.

    Only KiB-sized blob partials cross the shuffle; the raw-row variant
    below (build_sketches_direct) exists as the lower-memory alternative
    and as the equivalence baseline for tests.
    """
    from .updater import build_sketches_actor_pool

    if ds is None:
        # prune at the read: the sketch job needs only the group key and
        # the content column (sha256 + features derive from content) —
        # repo/path/commit never leave storage unless they ARE the key
        cols = sorted({spec.group_key, "content"})
        ds = vio.read_corpus(spec.input_path, columns=cols,
                             override_num_blocks=spec.read_num_blocks)
    merged = build_sketches_actor_pool(ds, spec, concurrency=concurrency,
                                       metrics_dir=spec.metrics_dir)
    if spec.out_dir:
        est = finalize_estimates(merged, spec)
        est.write_parquet(spec.out_dir)
    return merged


def build_sketches_direct(spec: SketchJobSpec, ds: rd.Dataset | None = None) -> rd.Dataset:
    """Raw-row variant: salted groupby((key, salt)) directly over prepared
    rows (no map-side combine), then the Stage-B blob merge. Simpler
    memory profile (no per-actor sketch dict); shuffles narrow raw rows."""
    if ds is None:
        ds = vio.read_corpus(spec.input_path, columns=sorted({spec.group_key, "content"}),
                             override_num_blocks=spec.read_num_blocks)
    ds = prepare(ds, spec)
    partials = sketch_partials(ds, spec)
    merged = merge_partials(partials, spec)
    if spec.out_dir:
        est = finalize_estimates(merged, spec)
        est.write_parquet(spec.out_dir)
    return merged
