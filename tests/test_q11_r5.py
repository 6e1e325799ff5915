"""TPC-H Q11 shape — HAVING compared against an UNCORRELATED scalar
subquery that itself carries a JOIN (join-aware correlation classifier:
a column the subquery attaches via its own JOIN is inner, not an outer
reference)."""

import duckdb
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def test_q11ish_having_scalar_subquery_matches_duckdb(ray_session,
                                                      sf01_dir):
    from verdictray.entry_queries import (SQL_TPCH_Q11ISH,
                                          SQL_TPCH_Q11ISH_ORACLE,
                                          q_sql_tpch_q11ish)
    from verdictray.sqlrouter import explain_sql

    want = _duck(sf01_dir, SQL_TPCH_Q11ISH_ORACLE)
    mine = q_sql_tpch_q11ish(sf01_dir).to_pandas()
    assert len(mine) > 0
    pdt.assert_frame_equal(mine, want, check_dtype=False)
    # the subquery resolves FIRST as its own streaming plan (one scalar
    # crosses the driver), not as a decorrelated grouped build
    trace = explain_sql(SQL_TPCH_Q11ISH, sf01_dir)
    assert "SCALAR SUBQUERY" in trace


def test_correlated_subquery_with_join_still_raises(ray_session,
                                                    sf01_dir):
    """A genuinely correlated scalar subquery that ALSO joins must raise
    loudly (the grouped decorrelation build has no join stage) rather
    than mis-executing."""
    from verdictray.sqlrouter import run_sql

    sql = """SELECT COUNT(*) AS n FROM part
             WHERE p_retailprice < (SELECT AVG(l_extendedprice) AS a
                                    FROM lineitem
                                    JOIN supplier ON l_suppkey = s_suppkey
                                    WHERE l_partkey = p_partkey)"""
    with pytest.raises(ValueError, match="no GROUP BY / JOIN / UNION"):
        run_sql(sql, sf01_dir)
