"""Driver-harness simulation: run queries() vs oracle_sql() via DuckDB.

Usage: python bench/check_oracles.py [sf_dir]
Owns its Ray session (scripts may; library may not).
"""

import os
import sys

import duckdb
import pandas as pd

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        df = res.to_pandas()
    else:
        df = pd.DataFrame(res)
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str) -> int:
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = {n for n in os.environ.get("VR_ONLY", "").split(",") if n}
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(mine)} rows, cols={list(mine.columns)})")
            continue
        ora = canon(con.sql(oracles[name]).df())
        if len(mine) != len(ora):
            print(f"FAIL  {name}: rows {len(mine)} != oracle {len(ora)}")
            failures += 1
            continue
        if list(mine.columns) != list(ora.columns):
            print(f"FAIL  {name}: cols {list(mine.columns)} != {list(ora.columns)}")
            failures += 1
            continue
        # order-insensitive value compare (approximating the driver's hash).
        # dtypes must ALSO agree: r1's two hash-FAILs were DuckDB HUGEINT
        # (sum of BIGINT) vs Ray int64 with identical values — invisible
        # under astype+check_dtype=False, so compare dtypes strictly first.
        dt_mine = [str(d) for d in mine.dtypes]
        dt_ora = [str(d) for d in ora.dtypes]
        if dt_mine != dt_ora:
            print(f"FAIL  {name}: dtypes {dt_mine} != oracle {dt_ora}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, ora, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            print(f"ok    {name}: {len(mine)} rows hash-match")
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch: {str(e)[:300]}")
            failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf))
