"""Round-5 continuation SQL-surface additions, block 1: LIMIT … OFFSET,
ILIKE / NOT ILIKE, IS [NOT] DISTINCT FROM, and SELECT without FROM.

Every positive test runs the SAME SQL through DuckDB and compares
frames exactly (these are all exact relational features)."""

import duckdb
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "events", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _cmp(sf_dir, sql, oracle=None):
    from verdictray.sqlrouter import run_sql

    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    ref = _duck(sf_dir, oracle or sql).reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False)


def test_limit_offset_plain_scan(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 10 OFFSET 5
    """)


def test_limit_offset_grouped(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderpriority, COUNT(*) AS n FROM orders
        GROUP BY o_orderpriority
        ORDER BY n DESC, o_orderpriority LIMIT 2 OFFSET 1
    """)


def test_offset_requires_order_and_limit(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="OFFSET requires"):
        run_sql("SELECT o_orderkey FROM orders LIMIT 5 OFFSET 2", sf_dir)
    with pytest.raises(ValueError, match="OFFSET requires"):
        run_sql("SELECT o_orderkey FROM orders ORDER BY o_orderkey "
                "OFFSET 2", sf_dir)


def test_ilike_and_not_ilike(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_orderpriority ILIKE '%urgent%')
                   AS n_urgent
        FROM orders WHERE o_orderpriority NOT ILIKE '%low%'
    """)


def test_is_distinct_from_literal_and_null(ray_session, sf_dir):
    # events.props is nullable: IS DISTINCT FROM NULL == IS NOT NULL,
    # and a NULL row IS DISTINCT FROM any literal (never yields NULL)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS a FROM events WHERE props IS DISTINCT FROM NULL
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS b FROM events
        WHERE props IS NOT DISTINCT FROM NULL
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS c FROM orders
        WHERE o_orderstatus IS DISTINCT FROM 'F'
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS d FROM orders
        WHERE o_orderstatus IS NOT DISTINCT FROM 'F'
    """)


def test_select_without_from(ray_session, sf_dir):
    _cmp(sf_dir, "SELECT 1 + 2 AS x, 'y' AS s, 2.5 * 4 AS f")


def test_select_without_from_rejects_columns(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="without a FROM"):
        run_sql("SELECT o_orderkey", sf_dir)


def test_order_by_expression_plain_scan(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice * -1, o_orderkey LIMIT 10
    """)
    # unselected expression key (hidden derived column, dropped after sort)
    _cmp(sf_dir, """
        SELECT o_orderkey FROM orders
        ORDER BY o_totalprice - o_orderkey, o_orderkey LIMIT 10
    """)


def test_order_by_aggregate_expression(ray_session, sf_dir):
    # ORDER BY an aggregate that is not in the SELECT list (hidden agg)
    _cmp(sf_dir, """
        SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
        ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 3
    """)
    # and one that text-matches a SELECTed aggregate (reuses its column)
    _cmp(sf_dir, """
        SELECT o_orderpriority, COUNT(*) AS n FROM orders
        GROUP BY o_orderpriority ORDER BY COUNT(*) DESC, o_orderpriority
    """)


def test_order_by_hidden_agg_with_having(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
        HAVING COUNT(*) > 10 ORDER BY SUM(o_totalprice) DESC LIMIT 2
    """)


def test_group_by_expression(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT EXTRACT(year FROM o_orderdate) AS y, COUNT(*) AS n
        FROM orders GROUP BY EXTRACT(year FROM o_orderdate) ORDER BY y
    """)
    _cmp(sf_dir, """
        SELECT SUBSTR(o_orderpriority, 1, 1) AS p, COUNT(*) AS n
        FROM orders GROUP BY SUBSTR(o_orderpriority, 1, 1) ORDER BY p
    """)


def test_group_by_unselected_expression(ray_session, sf_dir):
    # grouping key not in the SELECT list: hidden derived column
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n, SUM(o_totalprice) AS s FROM orders
        GROUP BY o_orderkey % 3 ORDER BY n, s
    """)


def test_global_window_ranking(ray_session, sf_dir):
    # OVER (ORDER BY …) with no PARTITION BY — one global partition
    _cmp(sf_dir, """
        SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_orderkey) AS q,
               PERCENT_RANK() OVER (ORDER BY o_orderkey) AS pr,
               CUME_DIST() OVER (ORDER BY o_orderkey) AS cd
        FROM orders ORDER BY o_orderkey LIMIT 20
    """)


def test_global_window_cumulative_and_empty_over(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, SUM(o_totalprice) OVER (ORDER BY o_orderkey)
            AS cs FROM orders ORDER BY o_orderkey LIMIT 15
    """)
    # OVER () — full-table frame for a cumulative aggregate
    _cmp(sf_dir, """
        SELECT o_orderkey, SUM(o_totalprice) OVER () AS tot
        FROM orders ORDER BY o_orderkey LIMIT 5
    """)


def test_nth_value_default_frame(ray_session, sf_dir):
    # ANSI default frame: rows BEFORE the k-th visible row get NULL
    _cmp(sf_dir, """
        SELECT o_orderkey,
               NTH_VALUE(o_totalprice, 2) OVER (
                   PARTITION BY o_orderstatus ORDER BY o_orderkey) AS nv
        FROM orders ORDER BY o_orderkey LIMIT 20
    """)
    _cmp(sf_dir, """
        SELECT o_orderkey,
               NTH_VALUE(o_totalprice, 3) OVER (ORDER BY o_orderkey) AS n3
        FROM orders ORDER BY o_orderkey LIMIT 6
    """)


def test_nth_value_requires_count(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="NTH_VALUE"):
        run_sql("SELECT NTH_VALUE(o_totalprice) OVER (ORDER BY "
                "o_orderkey) AS v FROM orders", sf_dir)


def _duck_all(sf_dir, sql):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _cmp_all(sf_dir, sql):
    from verdictray.sqlrouter import run_sql

    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    ref = _duck_all(sf_dir, sql).reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False, rtol=1e-9)


def test_right_join(ray_session, sf_dir):
    # RIGHT JOIN preserves the dim side (nations with zero customers)
    _cmp_all(sf_dir, """
        SELECT n_name, COUNT(c_custkey) AS n
        FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """)


def test_full_outer_join(ray_session, sf_dir):
    _cmp_all(sf_dir, """
        SELECT COUNT(*) AS n, COUNT(o_orderkey) AS no,
               COUNT(c_custkey) AS nc
        FROM orders FULL OUTER JOIN customer ON o_custkey = c_custkey
    """)


def test_cross_join(ray_session, sf_dir):
    _cmp_all(sf_dir, """
        SELECT r_name, n_name FROM nation CROSS JOIN region
        WHERE n_regionkey = r_regionkey ORDER BY r_name, n_name
    """)
    # projection-free side: pure row replication
    _cmp_all(sf_dir, "SELECT COUNT(*) AS n FROM customer CROSS JOIN region")


def test_inner_keyword(ray_session, sf_dir):
    _cmp_all(sf_dir, """
        SELECT n_name, COUNT(*) AS n
        FROM customer INNER JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """)


def test_cross_join_size_gate(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="CROSS JOIN"):
        run_sql("SELECT COUNT(*) AS n FROM orders CROSS JOIN lineitem",
                sf_dir, max_broadcast_rows=10)


def test_right_join_rejects_membership(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="RIGHT/FULL"):
        run_sql("""
            SELECT n_name, COUNT(c_custkey) AS n
            FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            GROUP BY n_name
        """, sf_dir)


def test_table_aliases_and_qualified_refs(ray_session, sf_dir):
    # FROM t a / FROM t AS a with alias.col everywhere (SELECT, ON,
    # WHERE, GROUP BY) — the pre-pass strips the redundant qualifiers
    _cmp_all(sf_dir, """
        SELECT n.n_name, COUNT(*) AS cnt
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
    """)
    _cmp_all(sf_dir, """
        SELECT c.c_name, n.n_name
        FROM customer AS c JOIN nation AS n
             ON c.c_nationkey = n.n_nationkey
        ORDER BY c.c_name LIMIT 10
    """)


def test_aliased_correlated_exists(ray_session, sf_dir):
    _cmp_all(sf_dir, """
        SELECT COUNT(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
    """)


def test_alias_scan_ignores_extract_from(ray_session, sf_dir):
    # EXTRACT(part FROM col) must not bind a fake table/alias
    _cmp_all(sf_dir, """
        SELECT EXTRACT(year FROM o.o_orderdate) AS y, COUNT(*) AS n
        FROM orders o GROUP BY y ORDER BY y
    """)


def test_self_join_no_longer_raises(ray_session, sf_dir):
    # continuation block 2 made self-joins WORK (virtual renamed table
    # spooled into the session overlay); the old loud error is gone
    _cmp_all(sf_dir, "SELECT COUNT(*) AS n FROM nation a JOIN nation b "
                     "ON a.n_regionkey = b.n_regionkey")


def test_unknown_qualifier_raises(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="unknown table qualifier"):
        run_sql("SELECT z.c_name FROM customer c", sf_dir)


def test_count_distinct_expression(ray_session, sf_dir):
    _cmp(sf_dir, "SELECT COUNT(DISTINCT o_custkey % 100) AS n FROM orders")
    _cmp(sf_dir, """
        SELECT o_orderstatus, COUNT(DISTINCT o_custkey % 10) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)
    _cmp(sf_dir, "SELECT CAST(SUM(DISTINCT o_custkey % 7) AS BIGINT) AS s "
                 "FROM orders")
    # COUNT(expr) counts non-null expression values
    _cmp(sf_dir, "SELECT COUNT(o_orderkey + 0) AS n FROM orders")


def test_any_all_rewrites(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_custkey = ANY (SELECT c_custkey FROM customer
                               WHERE c_acctbal > 5000)
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_custkey <> ALL (SELECT c_custkey FROM customer
                                WHERE c_acctbal > 5000)
    """)


def test_order_comparison_all_raises(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="ALL subqueries"):
        run_sql("SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > "
                "ALL (SELECT c_acctbal FROM customer)", sf_dir)


def test_distinct_with_window_items(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT DISTINCT o_orderstatus,
               SUM(o_totalprice) OVER (PARTITION BY o_orderstatus) AS s
        FROM orders ORDER BY o_orderstatus
    """)
    _cmp(sf_dir, """
        SELECT DISTINCT o_orderstatus,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        FROM orders ORDER BY n DESC, o_orderstatus
    """)


def test_select_star(ray_session, sf_dir):
    _cmp_all(sf_dir, "SELECT * FROM region ORDER BY r_regionkey")
    _cmp_all(sf_dir, """
        SELECT * FROM orders WHERE o_totalprice > 400000
        ORDER BY o_orderkey LIMIT 20
    """)
    # star inside a derived table expands before the outer plan routes
    _cmp_all(sf_dir, """
        SELECT t.o_orderpriority, COUNT(*) AS n
        FROM (SELECT * FROM orders WHERE o_totalprice > 1000) t
        GROUP BY t.o_orderpriority ORDER BY 1
    """)


def test_select_star_with_join_raises(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match=r"SELECT \* with JOIN"):
        run_sql("SELECT * FROM customer JOIN nation "
                "ON c_nationkey = n_nationkey", sf_dir)


def test_full_join_between_ctes(ray_session, sf_dir):
    # derived sides of a FULL OUTER JOIN via WITH (CTEs materialize as
    # session-overlay tables); COALESCE over the null-padded key handles
    # a null-TYPED all-null bucket column (the _unify_branch cast)
    _cmp_all(sf_dir, """
        WITH a AS (SELECT o_orderstatus AS k, COUNT(*) AS an
                   FROM orders GROUP BY o_orderstatus),
             b AS (SELECT l_linestatus AS k2, COUNT(*) AS bn
                   FROM lineitem GROUP BY l_linestatus)
        SELECT COALESCE(k, k2) AS kk, an, bn
        FROM a FULL OUTER JOIN b ON k = k2
        ORDER BY kk
    """)


def test_on_clause_extra_conjuncts(ray_session, sf_dir):
    # ON a = b AND pred — dim-side filter BELOW the join (ON semantics
    # for INNER and LEFT; the preserved fact side is untouched)
    _cmp_all(sf_dir, """
        SELECT c_custkey, COUNT(o_orderkey) AS n
        FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey ORDER BY c_custkey LIMIT 10
    """)


def test_tpch_q13_shape(ray_session, sf_dir):
    _cmp_all(sf_dir, """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey) t
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """)


def test_on_pred_wrong_table_raises(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="ON-clause predicates"):
        run_sql("""
            SELECT COUNT(*) AS n FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                 AND c_acctbal > 0
        """, sf_dir)


def test_like_escape(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_orderpriority LIKE '1!-%' ESCAPE '!'
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_orderpriority NOT LIKE '1!-UR%' ESCAPE '!'
    """)


def test_setops_inside_derived_table(ray_session, sf_dir):
    _cmp_all(sf_dir, """
        SELECT COUNT(*) AS n
        FROM (SELECT o_orderstatus AS k FROM orders
              UNION
              SELECT l_linestatus AS k FROM lineitem) t
    """)


def test_explicit_default_range_frame(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, SUM(o_custkey) OVER (
            PARTITION BY o_orderstatus ORDER BY o_orderkey
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)


def test_in_select_distinct(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_custkey IN (SELECT DISTINCT c_custkey FROM customer
                            WHERE c_acctbal > 0)
    """)


def test_position_and_not_pred(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT POSITION('-' IN o_orderpriority) AS p
        FROM orders ORDER BY o_orderkey LIMIT 5
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE NOT (o_orderstatus = 'F' OR o_orderpriority = '2-HIGH')
    """)


def test_multi_key_equi_join(ray_session, sf_dir):
    # secondary ON equality on an INNER join = post-join refinement of
    # the primary-key buckets
    _cmp_all(sf_dir, """
        SELECT COUNT(*) AS n FROM orders JOIN lineitem
        ON o_orderkey = l_orderkey AND o_orderstatus = l_linestatus
    """)


def test_cross_table_on_left_join_raises(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="LEFT join"):
        run_sql("""
            SELECT COUNT(*) AS n FROM orders LEFT JOIN lineitem
            ON o_orderkey = l_orderkey AND o_orderstatus = l_linestatus
        """, sf_dir)


def test_between_symmetric(ray_session, sf_dir):
    # DuckDB has no BETWEEN SYMMETRIC; assert against the swapped form
    from verdictray.sqlrouter import run_sql

    mine = run_sql("SELECT COUNT(*) AS n FROM orders WHERE o_totalprice "
                   "BETWEEN SYMMETRIC 50000 AND 1000", sf_dir).to_pandas()
    ref = _duck(sf_dir, "SELECT COUNT(*) AS n FROM orders WHERE "
                        "o_totalprice BETWEEN 1000 AND 50000")
    pdt.assert_frame_equal(mine.reset_index(drop=True),
                           ref.reset_index(drop=True), check_dtype=False)


def test_group_by_all(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY ALL ORDER BY 1, 2
    """)


def test_new_string_fns(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT LPAD(o_orderstatus, 3, 'x') AS l,
               RPAD(o_orderstatus, 3, 'y') AS r,
               LPAD(o_orderpriority, 4, '*') AS lt,
               CONCAT_WS('-', o_orderstatus, o_orderpriority) AS cw
        FROM orders ORDER BY o_orderkey LIMIT 20
    """)


def test_last_day(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT LAST_DAY(o_orderdate) AS d, COUNT(*) AS n
        FROM orders GROUP BY d ORDER BY d LIMIT 10
    """)


def test_window_agg_over_expression(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, SUM(o_totalprice * 2) OVER (
            PARTITION BY o_orderstatus ORDER BY o_orderkey) AS s
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)


def test_date_part_and_window_nulls_last(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT DATE_PART('year', o_orderdate) AS y, COUNT(*) AS n
        FROM orders GROUP BY y ORDER BY y
    """)
    _cmp(sf_dir, """
        SELECT o_orderkey, RANK() OVER (
            PARTITION BY o_orderstatus
            ORDER BY o_totalprice DESC NULLS LAST) AS r
        FROM orders ORDER BY o_orderkey LIMIT 20
    """)
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="NULLS LAST only"):
        run_sql("SELECT RANK() OVER (PARTITION BY o_orderstatus ORDER "
                "BY o_totalprice NULLS FIRST) AS r FROM orders", sf_dir)


def test_count_star_over_empty(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderkey, COUNT(*) OVER () AS n
        FROM orders ORDER BY o_orderkey LIMIT 5
    """)


def test_window_functions_inside_expressions(ray_session, sf_dir):
    # ratio-to-report and friends: arithmetic OVER window results
    _cmp(sf_dir, """
        SELECT o_orderkey, ROW_NUMBER() OVER (
            PARTITION BY o_orderstatus ORDER BY o_orderkey) + 100 AS r
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)
    _cmp(sf_dir, """
        SELECT o_orderkey, ROUND(100 * o_totalprice /
            SUM(o_totalprice) OVER (PARTITION BY o_orderstatus), 6)
            AS pct
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)
    # two window leaves in ONE expression
    _cmp(sf_dir, """
        SELECT o_orderkey,
               SUM(o_totalprice) OVER (PARTITION BY o_orderstatus) /
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS avg_grp
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)


def test_window_expr_rejects_plain_agg_mix(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="cannot mix"):
        run_sql("SELECT SUM(o_totalprice) + ROW_NUMBER() OVER (ORDER "
                "BY o_orderkey) AS x FROM orders", sf_dir)


def test_distinct_on(ray_session, sf_dir):
    # first row per key via the hidden ROW_NUMBER + QUALIFY rewrite
    _cmp(sf_dir, """
        SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey,
               o_totalprice
        FROM orders ORDER BY o_orderstatus, o_orderkey
    """)
    # residual ORDER BY column NOT in the SELECT list (hidden passthrough)
    _cmp(sf_dir, """
        SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey
        FROM orders
        ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
    """)


def test_distinct_on_requires_order(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="DISTINCT ON"):
        run_sql("SELECT DISTINCT ON (o_orderstatus) o_orderkey "
                "FROM orders", sf_dir)


def test_sha256_scalar_fn(ray_session, sf_dir):
    # the repo's buffer-level vectorized sha256 kernel, surfaced in SQL;
    # DuckDB's sha256() must agree byte-for-byte
    _cmp(sf_dir, """
        SELECT o_orderkey, SHA256(o_orderpriority) AS h
        FROM orders ORDER BY o_orderkey LIMIT 50
    """)


def test_qualify_with_inline_window_fns(ray_session, sf_dir):
    # window functions directly in QUALIFY (no SELECTed window item)
    _cmp(sf_dir, """
        SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) = 1
        ORDER BY o_orderstatus
    """)
    _cmp(sf_dir, """
        SELECT o_orderkey, o_totalprice FROM orders
        QUALIFY o_totalprice > 0.9 * MAX(o_totalprice) OVER ()
        ORDER BY o_orderkey
    """)


def test_order_by_all_and_if(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY ALL ORDER BY ALL
    """)
    _cmp(sf_dir, """
        SELECT SUM(IF(o_orderstatus = 'F', 1, 0)) AS n,
               SUM(IF(o_totalprice > 100000, o_totalprice, 0.0)) AS s
        FROM orders
    """)


def test_self_join_via_virtual_table(ray_session, sf_dir):
    # nation bound twice: the second instance reads as a renamed virtual
    # table (n2__*) spooled once into the session overlay
    _cmp_all(sf_dir, """
        SELECT a.n_name, b.n_name AS peer
        FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        WHERE a.n_nationkey < b.n_nationkey
        ORDER BY a.n_name, peer LIMIT 20
    """)
    _cmp_all(sf_dir, """
        SELECT COUNT(*) AS n
        FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        WHERE a.n_nationkey < b.n_nationkey
    """)


def test_tpch_q7_textbook(ray_session, sf_dir):
    from verdictray.entry_queries import SQL_TPCH_Q7

    _cmp_all(sf_dir, SQL_TPCH_Q7)


def test_in_subquery_join_build_via_cte(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    # direct JOIN in the build raises with the CTE-rewrite guidance …
    with pytest.raises(ValueError, match="wrap the build in a CTE"):
        run_sql("""
            SELECT COUNT(*) AS n FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                JOIN nation ON c_nationkey = n_nationkey
                WHERE n_name = 'NATION_3')
        """, sf_dir)
    # … and the rewrite itself is exact
    _cmp_all(sf_dir, """
        WITH k AS (SELECT c_custkey FROM customer
                   JOIN nation ON c_nationkey = n_nationkey
                   WHERE n_name = 'NATION_3')
        SELECT COUNT(*) AS n FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM k)
    """)


def test_row_value_in(ray_session, sf_dir):
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE (o_orderstatus, o_orderpriority)
              IN (('F', '1-URGENT'), ('O', '2-HIGH'))
    """)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE (o_orderstatus, o_orderpriority)
              NOT IN (('F', '1-URGENT'), ('O', '2-HIGH'))
    """)
    # ordinary parenthesized predicate still parses (backtracking)
    _cmp(sf_dir, """
        SELECT COUNT(*) AS n FROM orders
        WHERE (o_orderstatus = 'F' OR o_orderstatus = 'O')
          AND o_totalprice > 1000
    """)


def test_rollup_over_empty_input(ray_session, sf_dir):
    # fuzz-found: ROLLUP/CUBE over an EMPTY filtered input must emit the
    # grand-total () row (COUNT 0, value aggregates NULL), not crash the
    # sort's range sampler with a None partial
    _cmp(sf_dir, """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders WHERE o_totalprice < -1
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY n DESC, 1 NULLS FIRST, 2 NULLS FIRST
    """)
    _cmp(sf_dir, """
        SELECT o_orderstatus, COUNT(*) AS n, SUM(o_custkey) AS s
        FROM orders WHERE o_totalprice < -1
        GROUP BY CUBE (o_orderstatus)
        ORDER BY n, 1 NULLS FIRST
    """)


def test_cte_with_empty_result(ray_session, sf_dir):
    # fuzz-found CRASH fix: a CTE whose WHERE drops EVERY row left Ray's
    # lazy Dataset schemaless and the spool's zero-row pin blew up — the
    # spool now probes the body's schema with filters stripped and pins
    # a typed zero-row part. (The grouped result over the empty spool is
    # row-empty on both engines; Ray's empty grouped Dataset carries no
    # schema, so only row-emptiness is comparable — same caveat as the
    # fuzz suites.)
    from verdictray.sqlrouter import run_sql

    mine = run_sql("""
        WITH f AS (SELECT * FROM orders WHERE o_totalprice < -1)
        SELECT o_orderstatus, COUNT(*) AS n
        FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus
    """, sf_dir).to_pandas()
    assert len(mine) == 0


def test_sort_on_all_null_key(ray_session, tmp_path):
    # fuzz-found: an ALL-null sort key (surfacing as Arrow NULL type out
    # of the window stage's pandas round-trip) crashed Ray's
    # range-partition sampler; every sort key now travels as a
    # (sentinel, null-filled) pair
    import duckdb as dd
    import pandas.testing as pdtt
    import pyarrow as pa
    import pyarrow.parquet as pq

    from verdictray.sqlrouter import run_sql

    d = str(tmp_path)
    pq.write_table(pa.table({
        "a": list(range(200)),
        "b": [i % 7 for i in range(200)],
        "c": pa.array([None] * 100 + [1] * 100, pa.int64()),
        "g": ["x" if i % 2 else "y" for i in range(200)],
    }), f"{d}/t.parquet")
    sql = """
        SELECT a, c, SUM(b) OVER (PARTITION BY g ORDER BY a) AS s
        FROM t WHERE c IS NULL
        ORDER BY c NULLS LAST, a LIMIT 50
    """
    mine = run_sql(sql, d).to_pandas().reset_index(drop=True)
    con = dd.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{d}/t.parquet'")
    ref = con.sql(sql).df().reset_index(drop=True)
    pdtt.assert_frame_equal(mine, ref, check_dtype=False, rtol=1e-9)


def test_cube_over_derived_key_and_empty_corr_build(ray_session, sf_dir):
    # fuzz-found pair: (a) CUBE/ROLLUP over a DERIVED key (EXTRACT
    # alias) — the rolled-up level's typed NULLs now take the key type
    # from the finest pass (or a zero-row expression evaluation when
    # even that is empty); (b) a correlated-item build that matches
    # NOTHING pins a typed zero-row spool (COUNT coalesces to 0)
    _cmp(sf_dir, """
        SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS y,
               COUNT(*) AS n
        FROM orders WHERE o_orderpriority ILIKE '%high%'
        GROUP BY CUBE (o_orderstatus, y)
        ORDER BY n DESC, 1 NULLS FIRST, 2 NULLS FIRST LIMIT 15
    """)
    _cmp(sf_dir, """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders
                WHERE o_custkey = c_custkey AND o_orderkey < -1) AS n
        FROM customer ORDER BY c_custkey LIMIT 15
    """)


def test_window_fn_inside_case_predicate(ray_session, sf_dir):
    # a window leaf INSIDE a CASE WHEN comparison — detection and the
    # hidden-item rewrite walk _Pred operands too
    _cmp(sf_dir, """
        SELECT o_orderkey,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderkey) = 1
                    THEN 'first' ELSE 'rest' END AS tag
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)
