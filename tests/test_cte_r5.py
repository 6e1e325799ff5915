"""WITH (CTE) support: each CTE materializes once into a session
overlay (distributed write_parquet spool) and reads back as a plain
table in every position — FROM, JOIN, scalar subqueries."""

import duckdb
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def test_cte_q15_verbatim_matches_duckdb(ray_session, sf01_dir):
    from verdictray.entry_queries import (SQL_CTE_Q15, SQL_CTE_Q15_ORACLE,
                                          q_sql_cte_q15)
    from verdictray.sqlrouter import explain_sql

    want = _duck(sf01_dir, SQL_CTE_Q15_ORACLE)
    mine = q_sql_cte_q15(sf01_dir).to_pandas()
    assert len(mine) >= 1
    pdt.assert_frame_equal(mine, want, check_dtype=False)
    trace = explain_sql(SQL_CTE_Q15, sf01_dir)
    assert "CTE revenue -> materialized ONCE" in trace
    assert "SCALAR SUBQUERY" in trace


def test_chained_ctes_and_shadowing(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    # second CTE reads the first; a CTE may also shadow a base table
    # (scoping is SEQUENTIAL: the earlier CTE reads the BASE orders,
    # the main query reads the shadow — DuckDB's mutually-scoped WITH
    # calls this circular, so the oracle alpha-renames the shadow)
    sql = """WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                          GROUP BY o_custkey HAVING COUNT(*) > 10),
                  orders AS (SELECT o_custkey AS k, COUNT(*) AS m
                             FROM big GROUP BY o_custkey)
             SELECT COUNT(*) AS rows_out FROM orders"""
    mine = run_sql(sql, sf01_dir).to_pandas()
    want = _duck(sf01_dir, sql.replace("orders AS", "orders2 AS")
                 .replace("FROM orders\"\"\"", "FROM orders2\"\"\"")
                 .replace("SELECT COUNT(*) AS rows_out FROM orders",
                          "SELECT COUNT(*) AS rows_out FROM orders2"))
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_cte_join_group_matches_duckdb(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    sql = """WITH cust_orders AS (
               SELECT o_custkey, COUNT(*) AS n_orders
               FROM orders WHERE o_totalprice > 100000.0
               GROUP BY o_custkey)
             SELECT c_mktsegment, SUM(n_orders) AS total
             FROM customer JOIN cust_orders ON c_custkey = o_custkey
             GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    mine = run_sql(sql, sf01_dir).to_pandas()
    want = _duck(sf01_dir, sql)
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_cte_parse_errors(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="duplicate CTE name"):
        run_sql("WITH a AS (SELECT COUNT(*) AS n FROM orders), "
                "a AS (SELECT COUNT(*) AS n FROM customer) "
                "SELECT n FROM a", sf01_dir)
    with pytest.raises(ValueError, match="unbalanced"):
        run_sql("WITH a AS (SELECT COUNT(*) AS n FROM orders "
                "SELECT n FROM a", sf01_dir)


def test_nested_with_inside_cte_body(ray_session, sf01_dir):
    """A CTE body may itself start with WITH — the hook recurses, the
    inner overlay symlinks the outer one."""
    from verdictray.sqlrouter import run_sql

    sql = """WITH top AS (
               WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                            GROUP BY o_custkey HAVING COUNT(*) > 12)
               SELECT COUNT(*) AS m FROM big)
             SELECT m FROM top"""
    mine = run_sql(sql, sf01_dir).to_pandas()
    want = _duck(sf01_dir, sql)
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_cte_feeding_window(ray_session, sf01_dir):
    """Window functions run over a CTE spool like over any table."""
    from verdictray.sqlrouter import run_sql

    sql = """WITH per_cust AS (
               SELECT o_custkey, COUNT(*) AS n_orders,
                      MONEY_SUM(o_totalprice) AS total
               FROM orders GROUP BY o_custkey)
             SELECT o_custkey, n_orders, total,
                    RANK() OVER (PARTITION BY n_orders
                                 ORDER BY total DESC) AS rnk
             FROM per_cust ORDER BY o_custkey LIMIT 500"""
    mine = run_sql(sql, sf01_dir).to_pandas()
    want = _duck(sf01_dir, sql.replace(
        "MONEY_SUM(o_totalprice)",
        "SUM(CAST(round(o_totalprice*100) AS BIGINT))/100.0"))
    pdt.assert_frame_equal(mine, want, check_dtype=False)
