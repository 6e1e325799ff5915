"""Continuation-feature INTERACTION matrix: each test combines a
round-5-continuation feature with an earlier one (ROLLUP, CTEs, joins,
QUALIFY, windows) and must match DuckDB exactly — the cross-feature
seams are where planner rewrites usually break."""

import duckdb
import pandas.testing as pdt


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _cmp(sf_dir, sql):
    from verdictray.sqlrouter import run_sql

    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    ref = _duck(sf_dir, sql).reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False, rtol=1e-9)


def test_order_by_hidden_agg_over_rollup(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY n DESC, 1 NULLS FIRST, 2 NULLS FIRST LIMIT 10
    """)


def test_distinct_on_with_join(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT DISTINCT ON (n_name) n_name, c_name, c_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 0
        ORDER BY n_name, c_acctbal DESC, c_name
    """)


def test_self_join_grouped_and_left(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT a.n_regionkey AS rk, COUNT(*) AS pairs
        FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        WHERE a.n_nationkey < b.n_nationkey
        GROUP BY a.n_regionkey ORDER BY rk
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n
        FROM nation a LEFT JOIN nation b ON a.n_nationkey = b.n_regionkey
    """)


def test_ratio_expr_with_qualify(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, ROUND(100 * o_totalprice /
            SUM(o_totalprice) OVER (PARTITION BY o_orderstatus), 6)
            AS pct
        FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) <= 2
        ORDER BY o_orderkey
    """)


def test_correlated_item_with_outer_join(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT c_custkey, n_name,
               (SELECT COUNT(*) FROM orders
                WHERE o_custkey = c_custkey) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        ORDER BY c_custkey LIMIT 20
    """)


def test_cte_with_distinct_on_and_aliases(ray_session, sf_dir):
    _cmp(sf_dir, """
        WITH big AS (SELECT * FROM orders WHERE o_totalprice > 100000.0)
        SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey
        FROM big ORDER BY o_orderstatus, o_orderkey
    """)
    _cmp(sf_dir, """
        WITH t AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
                   GROUP BY o_custkey)
        SELECT c.c_name, t.n FROM customer c JOIN t ON c.c_custkey = t.k
        ORDER BY t.n DESC, c.c_name LIMIT 10
    """)


def test_offset_over_window_query(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, RANK() OVER (
            ORDER BY o_totalprice DESC, o_orderkey) AS r
        FROM orders ORDER BY r LIMIT 10 OFFSET 5
    """)


def test_group_by_all_with_having(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY ALL HAVING COUNT(*) > 50 ORDER BY ALL
    """)
