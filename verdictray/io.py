"""Sources and sinks (SURVEY.md §2.1).

Reads prune columns at the source (only requested columns leave storage)
and validate the fixed corpus schema up front, failing fast on mismatch.
Library code never calls ray.init(); the caller owns the session.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_corpus(path: str, columns: list[str] | None = None,
                validate: bool = True, **kwargs) -> rd.Dataset:
    """Read the 5-column code-corpus Parquet table (BASELINE.json
    input_hint: repo, path, commit, lang, content — all string).

    Column pruning happens at the read; schema is validated from parquet
    metadata only (no data read) so a wrong input fails before any work.
    """
    if validate:
        schema = pq.read_schema(_first_parquet_file(path))
        for col in CORPUS_COLUMNS:
            if col not in schema.names:
                raise ValueError(f"corpus at {path} missing column {col!r}; has {schema.names}")
            if not pa.types.is_string(schema.field(col).type) and not pa.types.is_large_string(
                schema.field(col).type
            ):
                raise ValueError(f"corpus column {col!r} must be string, got {schema.field(col).type}")
    return rd.read_parquet(path, columns=columns, **kwargs)


def _first_file(path: str, suffix: str) -> str:
    import os

    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(suffix):
                    return os.path.join(root, f)
        raise FileNotFoundError(f"no {suffix} files under {path}")
    return path


def _first_parquet_file(path: str) -> str:
    return _first_file(path, ".parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read one driver star-schema table (TESTDATA.md)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def read_corpus_any(path: str, fmt: str = "parquet",
                    columns: list[str] | None = None,
                    validate: bool = True, **kwargs) -> rd.Dataset:
    """Format-dispatching corpus read: parquet (preferred — real column
    pruning at the read), csv, or jsonl. CSV prunes via Arrow's
    include_columns (per-file projection during parse — still avoids
    materializing unread columns as Ray blocks); JSONL parses whole
    records, so pruning happens immediately post-read via select_columns —
    the wide columns never survive past the first operator but DO leave
    storage (documented cost; convert to parquet for the scale path)."""
    if fmt == "parquet":
        return read_corpus(path, columns=columns, validate=validate, **kwargs)
    if fmt == "csv":
        from pyarrow import csv as pa_csv

        if columns:
            if validate:
                # sniff the header locally so a bad projection fails fast
                # with a clear error instead of inside a read task
                with pa_csv.open_csv(_first_file(path, ".csv")) as r:
                    have = set(r.schema.names)
                missing = set(columns) - have
                if missing:
                    raise ValueError(
                        f"corpus at {path} missing columns {sorted(missing)}")
        # the corpus contract is all-string columns; pin them so CSV type
        # inference can't turn numeric-looking content into int64
        types = {c: pa.string() for c in (columns or CORPUS_COLUMNS)}
        kwargs.setdefault(
            "convert_options",
            pa_csv.ConvertOptions(
                include_columns=list(columns) if columns else None,
                column_types=types))
        ds = rd.read_csv(path, **kwargs)
    elif fmt in ("json", "jsonl"):
        ds = rd.read_json(path, lines=(fmt == "jsonl"), **kwargs)
        if columns:
            ds = ds.select_columns(list(columns))
        want_str = [c for c in (columns or CORPUS_COLUMNS)]

        def pin_strings(b: pa.Table) -> pa.Table:
            # corpus contract: all-string columns — JSON numbers (e.g. a
            # commit of digits) must not arrive as int64
            for c in want_str:
                if c in b.schema.names and not (
                        pa.types.is_string(b[c].type)
                        or pa.types.is_large_string(b[c].type)):
                    i = b.schema.get_field_index(c)
                    b = b.set_column(i, c, b[c].cast(pa.string()))
            return b

        ds = ds.map_batches(pin_strings, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}; "
                         "expected parquet, csv, json or jsonl")
    if validate:
        schema = ds.schema()
        want = set(columns) if columns else set(CORPUS_COLUMNS)
        missing = want - set(schema.names)
        if missing:
            raise ValueError(f"corpus at {path} missing columns {sorted(missing)}")
    return ds


def write_estimates(ds: rd.Dataset, out_dir: str, **kwargs) -> None:
    """Write the estimates table as partitioned parquet (a directory of
    part files — resumable layout, never one giant file)."""
    ds.write_parquet(out_dir, **kwargs)


def write_parquet_partitioned(ds: rd.Dataset, out_dir: str, by: str,
                              resume: bool = True, buckets: int | None = None,
                              max_rows_per_file: int = 1_000_000) -> dict:
    """Resumable partitioned parquet sink (task brief: "write partitioned
    Parquet so a failed run can skip finished partitions; never one giant
    file").

    Layout: hive-style ``out_dir/<by>=<value>/part-*.parquet`` when
    ``buckets`` is None (low-cardinality key, e.g. lang), or
    ``out_dir/bucket=<i>/`` hash-bucket dirs (``hash64(by) % buckets``)
    for high-cardinality keys. Each partition directory is written by
    EXACTLY ONE task and committed by a ``_SUCCESS`` marker written LAST,
    so the commit is per-partition atomic in the only sense that matters
    for resume: a marker exists iff every row of that partition landed.

    Resume (``resume=True``): committed partitions are detected from
    their markers and their rows are FILTERED OUT at the read — before
    the shuffle, so a 99%-done rerun moves ~1% of the data. Uncommitted
    (crashed mid-write) partition dirs are wiped by their writer task
    before rewriting, making reruns idempotent.

    Scale shape: one groupby(partition) shuffle; one partition is written
    by one task (the documented assumption of every partitioned writer —
    size ``buckets`` so a partition fits; files chunk at
    ``max_rows_per_file`` rows). Returns {"written": [...], "skipped":
    [...], "rows_written": n}.
    """
    import os
    import shutil
    import uuid

    import numpy as np
    import pyarrow.compute as pc

    from .sketches.hashing import hash64

    os.makedirs(out_dir, exist_ok=True)
    part_col = "bucket" if buckets else by

    def dirname(val) -> str:
        return f"{part_col}={val}"

    done: set[str] = set()
    if resume:
        done = {d for d in os.listdir(out_dir)
                if os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}
    done_vals = sorted(d.split("=", 1)[1] for d in done)
    done_set = pa.array([int(v) for v in done_vals], pa.int64()) if buckets \
        else pa.array(done_vals, pa.string())

    def tag(b: pa.Table) -> pa.Table:
        if buckets:
            pid = (hash64(b[by], seed=71) % np.uint64(buckets)).astype(
                np.int64)
            b = b.append_column("_part", pa.array(pid))
        else:
            b = b.append_column("_part", pc.cast(b[by], pa.string()))
        if len(done_set):
            b = b.filter(pc.invert(pc.is_in(b["_part"],
                                            value_set=done_set)))
        return b

    written: list[str] = []

    def write_group(g: pa.Table) -> pa.Table:
        val = g["_part"][0].as_py()
        g = g.drop_columns(["_part"])
        pdir = os.path.join(out_dir, dirname(val))
        # wipe an uncommitted partial dir from a crashed prior run
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        os.makedirs(pdir)
        n = len(g)
        files = 0
        for lo in range(0, n, max_rows_per_file):
            pq.write_table(g.slice(lo, max_rows_per_file),
                           os.path.join(pdir,
                                        f"part-{uuid.uuid4().hex}.parquet"))
            files += 1
        # the commit: marker written only after every file landed
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write(f"rows={n} files={files}\n")
        return pa.table({"partition": pa.array([dirname(val)]),
                         "n_rows": pa.array([n], pa.int64()),
                         "n_files": pa.array([files], pa.int64())})

    manifest = (ds.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("_part")
                .map_groups(write_group, batch_format="pyarrow")
                .to_pandas())
    written = sorted(manifest["partition"]) if len(manifest) else []
    return {"written": written, "skipped": sorted(done),
            "rows_written": int(manifest["n_rows"].sum())
            if len(manifest) else 0}
