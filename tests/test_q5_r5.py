"""TPC-H Q5: six-table join chain with a non-chain join condition
(c_nationkey = s_nationkey) running as a vectorized post-join filter."""

import duckdb
import pandas.testing as pdt


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "supplier", "nation",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def test_q5_six_table_chain_matches_duckdb(ray_session, sf01_dir):
    from verdictray.entry_queries import (SQL_TPCH_Q5, SQL_TPCH_Q5_ORACLE,
                                          q_sql_tpch_q5)
    from verdictray.sqlrouter import explain_sql

    want = _duck(sf01_dir, SQL_TPCH_Q5_ORACLE)
    mine = q_sql_tpch_q5(sf01_dir).to_pandas()
    pdt.assert_frame_equal(mine, want, check_dtype=False)
    trace = explain_sql(SQL_TPCH_Q5, sf01_dir)
    # all five dims broadcast (zero shuffle), pushdown below the joins,
    # and the cross-dim equality is a post-join filter
    assert trace.count("BROADCAST") == 5
    assert "BELOW the join" in trace
    assert "FILTER (after joins" in trace
    assert "c_nationkey = s_nationkey" in trace
