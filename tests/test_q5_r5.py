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


def test_q7ish_dual_nation_pipeline_matches_duckdb(ray_session, sf_dir):
    """Q7 core shape — nation joined twice (supplier side + customer
    side); Ray pipeline with two bucketed hash joins and broadcast
    nation/supplier lookups vs the DuckDB self-join oracle."""
    from verdictray.entry_queries import (SQL_TPCH_Q7ISH_ORACLE,
                                          q_sql_tpch_q7ish)

    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "supplier", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.sql(SQL_TPCH_Q7ISH_ORACLE).df()
    mine = q_sql_tpch_q7ish(sf_dir).to_pandas()
    assert len(mine) > 0
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_q8ish_market_share_matches_duckdb(ray_session, sf01_dir):
    """Q8 shape — customer nation routes to the region filter, supplier
    nation is the share dimension; CASE-summed cents / summed cents."""
    from verdictray.entry_queries import (SQL_TPCH_Q8ISH_ORACLE,
                                          q_sql_tpch_q8ish)

    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "supplier", "nation",
              "region", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf01_dir}/{t}.parquet'")
    want = con.sql(SQL_TPCH_Q8ISH_ORACLE).df()
    mine = q_sql_tpch_q8ish(sf01_dir).to_pandas()
    assert len(mine) == 2
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_q15ish_top_supplier_matches_duckdb(ray_session, sf01_dir):
    """Q15 shape — revenue view computed once, scalar MAX + equality on
    the materialized supplier-count aggregate, names broadcast."""
    from verdictray.entry_queries import (SQL_TPCH_Q15ISH_ORACLE,
                                          q_sql_tpch_q15ish)

    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf01_dir}/{t}.parquet'")
    want = con.sql(SQL_TPCH_Q15ISH_ORACLE).df()
    mine = q_sql_tpch_q15ish(sf01_dir).to_pandas()
    assert len(mine) >= 1
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_q9ish_profit_matches_duckdb(ray_session, sf_dir):
    """Q9 shape — five-table chain, LIKE pushdown below the part join,
    profit expression spanning three tables' columns, exact cents."""
    from verdictray.entry_queries import (SQL_TPCH_Q9ISH_ORACLE,
                                          q_sql_tpch_q9ish)

    con = duckdb.connect()
    for t in ("orders", "lineitem", "supplier", "nation", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.sql(SQL_TPCH_Q9ISH_ORACLE).df()
    mine = q_sql_tpch_q9ish(sf_dir).to_pandas()
    assert len(mine) > 0
    pdt.assert_frame_equal(mine, want, check_dtype=False)
