"""Round-5 distributed global exact quantile: ops.global_quantile_cont
must match np.quantile/DuckDB bit-for-bit on every path (direct, skew
recursion, empty, all-null) and the router's global QUANTILE_CONT must
route through it (no repartition(1) funnel)."""

import duckdb
import numpy as np
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pytest


def test_global_quantile_matches_numpy_and_duckdb(ray_session, sf01_dir):
    import ray.data as rd

    from verdictray.ops import global_quantile_cont

    li = rd.read_parquet(f"{sf01_dir}/lineitem.parquet")
    vals = li.select_columns(["l_extendedprice"]).to_pandas()[
        "l_extendedprice"].to_numpy()
    for phi in (0.0, 0.123, 0.5, 0.9, 0.99, 1.0):
        got = global_quantile_cont(li, "l_extendedprice", phi)
        want = float(np.quantile(vals, phi, method="linear"))
        duck = duckdb.sql(
            f"select quantile_cont(l_extendedprice, {phi}) from "
            f"'{sf01_dir}/lineitem.parquet'").fetchone()[0]
        assert got == want == duck, (phi, got, want, duck)


def test_global_quantile_skew_recursion_and_edges(ray_session):
    import ray.data as rd

    from verdictray.ops import global_quantile_cont

    # heavy skew: 90% of the mass in one tiny value region forces the
    # target range over local_limit -> the within-range recursion runs
    rng = np.random.default_rng(7)
    v = np.concatenate([rng.uniform(0.0, 1.0, 9000),
                        rng.uniform(100.0, 200.0, 1000)])
    ds = rd.from_arrow(pa.table({"x": v})).repartition(8)
    got = global_quantile_cont(ds, "x", 0.5, local_limit=300, ranges=8)
    assert got == float(np.quantile(v, 0.5, method="linear"))

    # all-null column -> SQL NULL
    nulls = rd.from_arrow(pa.table({"x": pa.array([None, None],
                                                  pa.float64())}))
    assert global_quantile_cont(nulls, "x", 0.5) is None

    # nulls ignored like SQL
    mixed = rd.from_arrow(pa.table({"x": [1.0, None, 3.0, None, 2.0]}))
    assert global_quantile_cont(mixed, "x", 0.5) == 2.0


def test_router_global_quantile_no_funnel(ray_session, sf01_dir):
    from verdictray.sqlrouter import explain_sql, run_sql

    sql = """SELECT QUANTILE_CONT(l_extendedprice, 0.5) AS med_price,
      QUANTILE_CONT(l_quantity, 0.9) AS p90_qty
     FROM lineitem WHERE l_returnflag = 'R'"""
    trace = explain_sql(sql, sf01_dir)
    assert "NO single-task funnel" in trace
    mine = run_sql(sql, sf01_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"'{sf01_dir}/lineitem.parquet'")
    pdt.assert_frame_equal(mine, con.sql(sql).df(), check_dtype=False)
