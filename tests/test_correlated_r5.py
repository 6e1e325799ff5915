"""Round-5 correlated subqueries: decorrelated scalar comparisons
(TPC-H Q17/Q2 shapes), EXISTS/NOT EXISTS rewrites, both join routes
(broadcast build + bucketed hash build), and loud errors on the shapes
the planner refuses to decorrelate."""

import duckdb
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "events", "lineitem", "part",
              "nation", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


Q17 = """SELECT MONEY_SUM(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) AS co FROM lineitem
                    WHERE l_partkey = p_partkey)"""
Q17_DUCK = """SELECT SUM(CAST(round(l_extendedprice*100) AS BIGINT))
  /100.0/7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2*AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)"""


def test_correlated_avg_broadcast_and_hash_paths(ray_session, sf01_dir):
    """Q17 shape on both build-join routes: the broadcast enrich (default
    gates) and the bucketed hash join (max_broadcast_rows=0) must agree
    with DuckDB bit-for-bit (exact cents)."""
    from verdictray.sqlrouter import explain_sql, run_sql

    want = _duck(sf01_dir, Q17_DUCK)
    for opts, marker in (({}, "BROADCAST enrich"),
                         ({"max_broadcast_rows": 0}, "HASH JOIN")):
        mine = run_sql(Q17, sf01_dir, **opts).to_pandas()
        pdt.assert_frame_equal(mine, want, check_dtype=False)
        trace = explain_sql(Q17, sf01_dir, **opts)
        assert "CORRELATED SUBQUERY" in trace
        assert marker in trace.split("CORRELATED SUBQUERY")[1]


def test_correlated_min_equality_matches_duckdb(ray_session, sf01_dir):
    """Q2's core shape — argmin per group via a correlated MIN equality;
    also exercises SELECTing a dim join key restored after the enrich."""
    from verdictray.sqlrouter import run_sql

    sql = """SELECT c_custkey, o_orderkey, o_totalprice
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE o_totalprice = (SELECT MIN(o_totalprice) AS m FROM orders
                            WHERE o_custkey = c_custkey)
      ORDER BY o_totalprice, c_custkey, o_orderkey LIMIT 100"""
    duck = """SELECT c_custkey, o_orderkey, o_totalprice
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE o_totalprice = (SELECT MIN(o2.o_totalprice) FROM orders o2
                            WHERE o2.o_custkey = c_custkey)
      ORDER BY o_totalprice, c_custkey, o_orderkey LIMIT 100"""
    pdt.assert_frame_equal(run_sql(sql, sf01_dir).to_pandas(),
                           _duck(sf01_dir, duck), check_dtype=False)


def test_exists_and_not_exists_match_duckdb(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    semi = """SELECT c_mktsegment, COUNT(*) AS n FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_totalprice > 300000.0)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    pdt.assert_frame_equal(run_sql(semi, sf01_dir).to_pandas(),
                           _duck(sf01_dir, semi), check_dtype=False)

    anti = """SELECT COUNT(*) AS n FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey)"""
    pdt.assert_frame_equal(run_sql(anti, sf01_dir).to_pandas(),
                           _duck(sf01_dir, anti), check_dtype=False)

    # EXISTS also routes through the Bloom probe (zero false negatives:
    # semi keeps a superset; with default fpp at this scale it is exact)
    bloom = run_sql(semi, sf01_dir, approx_membership=True,
                    bloom_fpp=1e-4).to_pandas()
    exact = _duck(sf01_dir, semi)
    assert (bloom["n"] >= exact["n"]).all()


def test_exists_under_or_and_bad_shapes_raise(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="top-level AND"):
        run_sql("""SELECT COUNT(*) AS n FROM customer
          WHERE c_acctbal < 0 OR EXISTS (SELECT 1 FROM orders
                                         WHERE o_custkey = c_custkey)""",
                sf01_dir)
    with pytest.raises(ValueError, match="correlation equality"):
        run_sql("""SELECT COUNT(*) AS n FROM customer
          WHERE EXISTS (SELECT 1 FROM orders
                        WHERE o_totalprice > 100)""", sf01_dir)
    with pytest.raises(ValueError, match="decorrelate"):
        run_sql("""SELECT COUNT(*) AS n FROM customer
          WHERE c_acctbal > (SELECT AVG(o_totalprice) AS a FROM orders
                             WHERE o_totalprice > c_acctbal)""",
                sf01_dir)
    # correlated subquery buried inside an arithmetic expression: the
    # planner must refuse, not silently run it uncorrelated
    with pytest.raises(ValueError, match="top-level AND|decorrelate"):
        run_sql("""SELECT COUNT(*) AS n
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_quantity < 1 + (SELECT AVG(l_quantity) AS a
                                  FROM lineitem
                                  WHERE l_partkey = p_partkey)""",
                sf01_dir)


def test_uncorrelated_scalar_subquery_still_resolves(ray_session,
                                                     sf01_dir):
    """The rewrite pass must leave uncorrelated scalar subqueries to the
    literal-substitution path."""
    from verdictray.sqlrouter import run_sql

    sql = """SELECT COUNT(*) AS n FROM orders
      WHERE o_totalprice > (SELECT AVG(o_totalprice) AS a FROM orders)"""
    pdt.assert_frame_equal(run_sql(sql, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql), check_dtype=False)


def test_correlated_scalar_item_count(ray_session, sf_dir):
    """Correlated scalar subquery AS a SELECT item — COUNT wraps in
    COALESCE(v, 0) through the LEFT-joined grouped build (a customer
    with no orders gets 0, not NULL)."""
    import duckdb
    import pandas.testing as pdt

    from verdictray.sqlrouter import run_sql

    sql = ("SELECT c_custkey, (SELECT COUNT(*) FROM orders "
           "WHERE o_custkey = c_custkey AND o_totalprice > 400000.0) "
           "AS n FROM customer ORDER BY c_custkey LIMIT 50")
    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    ref = con.sql(sql).df().reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False)
    assert (mine["n"] == 0).any(), "fixture should include 0-order rows"


def test_correlated_scalar_item_sum_null(ray_session, sf_dir):
    """Non-COUNT aggregates stay NULL where no correlated rows exist."""
    import duckdb
    import pandas.testing as pdt

    from verdictray.sqlrouter import run_sql

    sql = ("SELECT c_custkey, (SELECT SUM(o_totalprice) FROM orders "
           "WHERE o_custkey = c_custkey AND o_orderstatus = 'F') AS s "
           "FROM customer ORDER BY c_custkey LIMIT 50")
    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    ref = con.sql(sql).df().reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False, rtol=1e-9)
