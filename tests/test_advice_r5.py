"""Regression tests for the round-4 ADVICE findings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- ADVICE #1
def test_plain_scan_order_by_alias(ray_session, sf_dir):
    """Plain-scan route: ORDER BY an alias of a plain column (and ORDER BY
    ordinal, which resolves to the alias) must sort on the source column
    instead of crashing with "no such column"."""
    from verdictray.sqlrouter import run_sql

    out = run_sql(
        "SELECT o_orderkey AS k FROM orders ORDER BY k LIMIT 5", sf_dir
    ).to_pandas()
    assert list(out.columns) == ["k"]
    assert out["k"].is_monotonic_increasing and len(out) == 5

    # ordinal form resolves to the alias name, then back to the source
    out2 = run_sql(
        "SELECT o_orderkey AS k FROM orders ORDER BY 1 DESC LIMIT 5", sf_dir
    ).to_pandas()
    assert out2["k"].is_monotonic_decreasing and len(out2) == 5

    # expression aliases keep working (derived column carries the alias)
    out3 = run_sql(
        "SELECT o_orderkey + 0 AS k FROM orders ORDER BY k LIMIT 3", sf_dir
    ).to_pandas()
    assert out3["k"].is_monotonic_increasing and len(out3) == 3


# ---------------------------------------------------------------- ADVICE #2
def test_rows_frame_null_partition_keys(ray_session):
    """A nullable PARTITION BY column: ROWS-frame rolling scans must not
    drop NaN-keyed rows (length-mismatch ValueError), and null keys form
    ONE partition like SQL — for both frame modes."""
    import ray.data as rd

    from verdictray.window import partitioned_window

    df = pd.DataFrame({
        "k": ["a", "a", None, None, "b", None],
        "t": [1, 2, 1, 2, 1, 3],
        "v": [10.0, 20.0, 1.0, 2.0, 5.0, 4.0],
    })
    ds = rd.from_pandas(df)

    # ROWS frame (previously: ValueError length mismatch on null keys)
    out = partitioned_window(
        ds, ["k"], [("t", False)],
        [{"func": "sum", "col": "v", "alias": "s"}],
        buckets=2, frame=("rows", 1, 0),
    ).to_pandas().sort_values(["k", "t"], na_position="last")
    by_key = {(row.k if isinstance(row.k, str) else None, row.t): row.s
              for row in out.itertuples()}
    assert by_key[("a", 1)] == 10.0 and by_key[("a", 2)] == 30.0
    # null keys are ONE partition ordered by t: frames [1], [1,2], [2,3]
    assert by_key[(None, 1)] == 1.0
    assert by_key[(None, 2)] == 3.0
    assert by_key[(None, 3)] == 6.0

    # cumulative (default RANGE) path agrees on the same null partition
    out2 = partitioned_window(
        ds, ["k"], [("t", False)],
        [{"func": "sum", "col": "v", "alias": "s"},
         {"func": "row_number", "col": None, "alias": "rn"}],
        buckets=2, frame=None,
    ).to_pandas()
    nulls = out2[out2["k"].isna()].sort_values("t")
    assert list(nulls["s"]) == [1.0, 3.0, 7.0]
    assert list(nulls["rn"]) == [1, 2, 3]

    # DuckDB agreement on the exact same frame spec
    import duckdb

    oracle = duckdb.sql(
        "SELECT k, t, SUM(v) OVER (PARTITION BY k ORDER BY t "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM df"
    ).df()
    om = {(row.k if isinstance(row.k, str) else None, row.t): row.s
          for row in oracle.itertuples()}
    assert om == by_key
