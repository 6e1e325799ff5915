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


def _first_parquet_file(path: str) -> str:
    import os

    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
        raise FileNotFoundError(f"no parquet files under {path}")
    return path


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read one driver star-schema table (TESTDATA.md)."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)


def write_estimates(ds: rd.Dataset, out_dir: str, **kwargs) -> None:
    """Write the estimates table as partitioned parquet (a directory of
    part files — resumable layout, never one giant file)."""
    ds.write_parquet(out_dir, **kwargs)
