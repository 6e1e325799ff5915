"""Round-5 SQL-surface additions: GROUP BY ROLLUP, bare UNION (distinct),
ORDER BY … NULLS FIRST/LAST, COALESCE/NULLIF, and null group keys through
Ray's sort-based groupby (the null-safe key wrap)."""

import duckdb
import pandas as pd
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "events", "lineitem", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _cmp_ordered(sf_dir, sql, oracle=None):
    from verdictray.sqlrouter import run_sql

    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    ref = _duck(sf_dir, oracle or sql).reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False)


def test_rollup_matches_duckdb(ray_session, sf01_dir):
    """ROLLUP levels (k1,k2) / (k1) / (): counts, exact cents, min/max and
    AVG all re-derive from the finest partials; rolled-up keys are NULL
    and sort first via the explicit NULLS FIRST."""
    _cmp_ordered(sf01_dir, """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               MONEY_SUM(o_totalprice) AS total,
               MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
               AVG(o_totalprice) AS av
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """, oracle="""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                   AS total,
               MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
               AVG(o_totalprice) AS av
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """)


def test_rollup_single_input_pass(ray_session, sf01_dir):
    """Row-count identity: |ROLLUP(a,b)| == |group(a,b)| + |group(a)| + 1
    (orders has no null keys, so levels never merge)."""
    from verdictray.sqlrouter import run_sql

    fine = run_sql("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n "
                   "FROM orders GROUP BY o_orderpriority, o_orderstatus",
                   sf01_dir).count()
    mid = run_sql("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
                  "GROUP BY o_orderpriority", sf01_dir).count()
    roll = run_sql("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n "
                   "FROM orders GROUP BY ROLLUP (o_orderpriority, "
                   "o_orderstatus)", sf01_dir).count()
    assert roll == fine + mid + 1


def test_rollup_rejects_non_decomposable(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="decomposable"):
        run_sql("SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS nd "
                "FROM orders GROUP BY ROLLUP (o_orderstatus)", sf01_dir)


def test_union_distinct_matches_duckdb(ray_session, sf01_dir):
    _cmp_ordered(sf01_dir, """
        SELECT o_orderstatus, o_orderpriority FROM orders
        WHERE o_totalprice > 200000
        UNION
        SELECT o_orderstatus, o_orderpriority FROM orders
        WHERE o_totalprice < 5000
        ORDER BY o_orderstatus, o_orderpriority
    """)


def test_union_mixed_flavors_rejected():
    from verdictray.sqlrouter import parse_sql

    with pytest.raises(ValueError, match="mixing UNION ALL"):
        parse_sql("SELECT a FROM t UNION ALL SELECT a FROM u "
                  "UNION SELECT a FROM v")


def test_nulls_first_last_scan(ray_session, sf01_dir):
    """Plain-scan route: explicit NULLS FIRST/LAST adds the is-null
    sentinel sort key; row order compared verbatim vs DuckDB."""
    _cmp_ordered(sf01_dir, """
        SELECT NULLIF(o_orderstatus, 'F') AS st, o_orderkey FROM orders
        ORDER BY st NULLS FIRST, o_orderkey LIMIT 25
    """)
    _cmp_ordered(sf01_dir, """
        SELECT NULLIF(o_orderstatus, 'O') AS st, o_orderkey FROM orders
        ORDER BY st DESC NULLS LAST, o_orderkey DESC LIMIT 25
    """)


def test_null_group_key_aggregate(ray_session, sf01_dir):
    """Null group keys survive Ray's sort-based groupby via the
    (is-null, filled) key wrap and come back as SQL NULLs."""
    _cmp_ordered(sf01_dir, """
        SELECT NULLIF(o_orderstatus, 'F') AS st, COUNT(*) AS n,
               MONEY_SUM(o_totalprice) AS total
        FROM orders GROUP BY st ORDER BY st NULLS FIRST
    """, oracle="""
        SELECT NULLIF(o_orderstatus, 'F') AS st, COUNT(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                   AS total
        FROM orders GROUP BY st ORDER BY st NULLS FIRST
    """)


def test_intersect_matches_duckdb(ray_session, sf01_dir):
    _cmp_ordered(sf01_dir, """
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_totalprice < 10000
        ORDER BY o_custkey
    """)


def test_except_chain_matches_duckdb(ray_session, sf01_dir):
    """Left-associative A EXCEPT B EXCEPT C in one presence count."""
    _cmp_ordered(sf01_dir, """
        SELECT o_orderstatus, o_orderpriority FROM orders
        EXCEPT
        SELECT o_orderstatus, o_orderpriority FROM orders
        WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_orderstatus, o_orderpriority FROM orders
        WHERE o_orderpriority = '1-URGENT'
        ORDER BY o_orderstatus, o_orderpriority
    """)


def test_set_op_nulls_compare_equal(ray_session, sf01_dir):
    """SQL set semantics: NULL = NULL inside INTERSECT/EXCEPT."""
    _cmp_ordered(sf01_dir, """
        SELECT NULLIF(o_orderstatus, 'F') AS st FROM orders
        INTERSECT
        SELECT NULLIF(o_orderstatus, 'O') AS st FROM orders
        ORDER BY st NULLS FIRST
    """)


def test_mixed_set_operators_rejected():
    from verdictray.sqlrouter import parse_sql

    with pytest.raises(ValueError, match="mixing set operators"):
        parse_sql("SELECT a FROM t UNION SELECT a FROM u "
                  "INTERSECT SELECT a FROM v")


def test_coalesce_nullif_kernels(ray_session, sf01_dir):
    _cmp_ordered(sf01_dir, """
        SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
               COUNT(*) AS n
        FROM orders GROUP BY st ORDER BY st
    """)
    # int/float promotion inside COALESCE, NULLIF on a numeric column
    _cmp_ordered(sf01_dir, """
        SELECT o_orderkey, COALESCE(NULLIF(o_custkey, 1), -1.5) AS p
        FROM orders ORDER BY o_orderkey LIMIT 10
    """)


def test_cube_matches_duckdb(ray_session, sf01_dir):
    """CUBE levels = all key subsets (a,b)/(a)/(b)/(); same one-pass
    re-aggregation machinery as ROLLUP."""
    _cmp_ordered(sf01_dir, """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               MONEY_SUM(o_totalprice) AS total, AVG(o_totalprice) AS av
        FROM orders WHERE o_totalprice > 100000.0
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """, oracle="""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                   AS total, AVG(o_totalprice) AS av
        FROM orders WHERE o_totalprice > 100000.0
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """)


def test_cube_level_count(ray_session, sf01_dir):
    """|CUBE(a,b)| == |group(a,b)| + |group(a)| + |group(b)| + 1."""
    from verdictray.sqlrouter import run_sql

    fine = run_sql("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n "
                   "FROM orders GROUP BY o_orderpriority, o_orderstatus",
                   sf01_dir).count()
    a = run_sql("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
                "GROUP BY o_orderpriority", sf01_dir).count()
    b = run_sql("SELECT o_orderstatus, COUNT(*) AS n FROM orders "
                "GROUP BY o_orderstatus", sf01_dir).count()
    cube = run_sql("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n "
                   "FROM orders GROUP BY CUBE (o_orderpriority, "
                   "o_orderstatus)", sf01_dir).count()
    assert cube == fine + a + b + 1


def test_multi_window_specs_match_duckdb(ray_session, sf01_dir):
    """Three DISTINCT window specs chain as three partitioned_window
    passes on one streaming Dataset; bit-exact vs DuckDB."""
    from verdictray.entry_queries import (SQL_MULTI_WINDOW,
                                          q_sql_multi_window)
    from verdictray.sqlrouter import explain_sql

    mine = q_sql_multi_window(sf01_dir).to_pandas()
    ref = _duck(sf01_dir, SQL_MULTI_WINDOW)
    pdt.assert_frame_equal(mine, ref, check_dtype=False)
    trace = explain_sql(SQL_MULTI_WINDOW, sf01_dir)
    assert trace.count("WINDOW OVER") == 3


def test_multi_window_range_frame_mix_raises(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="RANGE INTERVAL frame cannot"):
        run_sql("""SELECT user_id,
            SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS r,
            ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts)
                AS rn
            FROM events""", sf01_dir)


def test_date_trunc_and_strftime_match_duckdb(ray_session, sf01_dir):
    from verdictray.entry_queries import (SQL_DATE_TRUNC,
                                          SQL_DATE_TRUNC_ORACLE,
                                          q_sql_date_trunc)
    from verdictray.sqlrouter import run_sql

    mine = q_sql_date_trunc(sf01_dir).to_pandas()
    ref = _duck(sf01_dir, SQL_DATE_TRUNC_ORACLE)
    pdt.assert_frame_equal(mine, ref, check_dtype=False)

    sql = """SELECT STRFTIME(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
             FROM events GROUP BY day ORDER BY day LIMIT 10"""
    pdt.assert_frame_equal(run_sql(sql, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql), check_dtype=False)

    with pytest.raises(ValueError, match="DATE_TRUNC part"):
        run_sql("SELECT DATE_TRUNC('fortnight', o_orderdate) AS x, "
                "COUNT(*) AS n FROM orders GROUP BY x", sf01_dir)


def test_grouping_and_having_over_rollup(ray_session, sf01_dir):
    """GROUPING(col) markers + HAVING filtering the union of levels,
    bit-exact vs DuckDB (identical SQL text, incl. CUBE double
    GROUPING)."""
    from verdictray.sqlrouter import run_sql

    sql = """SELECT o_orderpriority, o_orderstatus,
             GROUPING(o_orderstatus) AS g_status, COUNT(*) AS n
             FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
             HAVING COUNT(*) > 100
             ORDER BY o_orderpriority NULLS FIRST,
                      o_orderstatus NULLS FIRST"""
    pdt.assert_frame_equal(run_sql(sql, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql), check_dtype=False)

    sql2 = """SELECT o_orderpriority, o_orderstatus,
              GROUPING(o_orderpriority) AS gp,
              GROUPING(o_orderstatus) AS gs, COUNT(*) AS n
              FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
              ORDER BY gp, gs, o_orderpriority NULLS FIRST,
                       o_orderstatus NULLS FIRST"""
    pdt.assert_frame_equal(run_sql(sql2, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql2), check_dtype=False)

    with pytest.raises(ValueError, match="requires GROUP BY"):
        run_sql("SELECT o_orderstatus, GROUPING(o_orderstatus) AS g, "
                "COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
                sf01_dir)
    with pytest.raises(ValueError, match="not \\w*ROLLUP/CUBE keys"):
        run_sql("SELECT o_orderstatus, GROUPING(o_custkey) AS g, "
                "COUNT(*) AS n FROM orders "
                "GROUP BY ROLLUP (o_orderstatus)", sf01_dir)


def test_topk_pushdown_matches_full_sort(ray_session, sf01_dir):
    """ORDER BY + LIMIT pre-truncates every block to its local top-n
    before the global sort (identical comparator incl. null sentinels);
    result is bit-identical to DuckDB's full sort."""
    from verdictray.sqlrouter import run_sql

    sql = """SELECT o_orderkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25"""
    pdt.assert_frame_equal(run_sql(sql, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql), check_dtype=False)
    # alias + ordinal + NULLS FIRST through the same path
    sql2 = """SELECT o_orderkey AS k, o_totalprice AS p FROM orders
              ORDER BY 2 ASC NULLS FIRST, k DESC LIMIT 30"""
    pdt.assert_frame_equal(run_sql(sql2, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql2), check_dtype=False)


def test_qualify_top_n_per_group(ray_session, sf01_dir):
    """QUALIFY rn <= 2 (top-N per customer) bit-exact vs DuckDB; loud
    errors for non-window use and unselected references."""
    from verdictray.entry_queries import SQL_QUALIFY, q_sql_qualify
    from verdictray.sqlrouter import run_sql

    pdt.assert_frame_equal(q_sql_qualify(sf01_dir).to_pandas(),
                           _duck(sf01_dir, SQL_QUALIFY),
                           check_dtype=False)
    with pytest.raises(ValueError, match="window function"):
        run_sql("SELECT o_orderkey FROM orders QUALIFY o_orderkey > 5",
                sf01_dir)
    with pytest.raises(ValueError, match="SELECTed items"):
        run_sql("SELECT ROW_NUMBER() OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderkey) AS rn FROM orders "
                "QUALIFY o_totalprice > 5", sf01_dir)


def test_hll_rollup_within_bound_every_level(ray_session, sf01_dir):
    """APPROX_COUNT_DISTINCT over ROLLUP: finest level keeps HLL blobs,
    coarser levels re-merge them (exact DISTINCT is non-decomposable;
    the sketch is). Every level's estimate within the 3-sigma bound of
    DuckDB's exact ROLLUP; exact COUNT(*) rides along bit-exact."""
    import numpy as np

    from verdictray.entry_queries import q_sql_hll_rollup

    mine = q_sql_hll_rollup(sf01_dir).to_pandas()
    ref = _duck(sf01_dir, """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(DISTINCT o_custkey) AS nd, COUNT(*) AS n
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """)
    assert len(mine) == len(ref)
    assert (mine["n"].values == ref["n"].values).all()
    rel = 3 * 1.04 / (2 ** 14) ** 0.5
    err = (np.abs(mine["nd"].values - ref["nd"].values)
           / np.maximum(ref["nd"].values, 1))
    assert (err <= rel).all(), f"max rel err {err.max()} > {rel}"


def test_rollup_rejects_non_mergeable(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    # exact QUANTILE_CONT cannot re-aggregate from level outputs
    with pytest.raises(ValueError, match="cannot roll up"):
        run_sql("SELECT o_orderstatus, QUANTILE_CONT(o_totalprice, "
                "0.5) AS q FROM orders GROUP BY ROLLUP (o_orderstatus)",
                sf01_dir)


def test_quantile_sketches_over_rollup_and_tdigest_route(ray_session,
                                                         sf01_dir):
    """KLL and t-digest blobs merge across ROLLUP levels (quantiles are
    non-decomposable exactly; the sketches are mergeable); also covers
    the APPROX_QUANTILE_TDIGEST grouped route, which previously parsed
    but never appended an aggregate (crashed with 'requires at least
    one aggregation')."""
    import numpy as np

    from verdictray.sqlrouter import run_sql

    out = run_sql("""SELECT o_orderstatus,
                     APPROX_QUANTILE(o_totalprice, 0.5) AS med,
                     APPROX_QUANTILE_TDIGEST(o_totalprice, 0.99) AS p99,
                     COUNT(*) AS n
                     FROM orders GROUP BY ROLLUP (o_orderstatus)
                     ORDER BY o_orderstatus NULLS FIRST""",
                  sf01_dir).to_pandas()
    ref = _duck(sf01_dir, """SELECT o_orderstatus,
                 quantile_cont(o_totalprice, 0.5) AS med,
                 quantile_cont(o_totalprice, 0.99) AS p99, COUNT(*) AS n
                 FROM orders GROUP BY ROLLUP (o_orderstatus)
                 ORDER BY o_orderstatus NULLS FIRST""")
    assert (out["n"].values == ref["n"].values).all()
    # KLL: eps = 1.65/k rank error; on this distribution the value-space
    # deviation stays well under 2% — assert a loose envelope
    assert (np.abs(out["med"].values - ref["med"].values)
            / ref["med"].values).max() < 0.02
    assert (np.abs(out["p99"].values - ref["p99"].values)
            / ref["p99"].values).max() < 0.02

    # plain grouped t-digest route (the regression)
    out2 = run_sql("SELECT o_orderstatus, "
                   "APPROX_QUANTILE_TDIGEST(o_totalprice, 0.9) AS q "
                   "FROM orders GROUP BY o_orderstatus "
                   "ORDER BY o_orderstatus", sf01_dir).to_pandas()
    ref2 = _duck(sf01_dir, "SELECT o_orderstatus, "
                 "quantile_cont(o_totalprice, 0.9) AS q FROM orders "
                 "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    assert (np.abs(out2["q"].values - ref2["q"].values)
            / ref2["q"].values).max() < 0.02
