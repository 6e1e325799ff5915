"""Round-5 grouped membership builds (TPC-H Q18 shape): ``IN (SELECT k
FROM t [WHERE …] GROUP BY k HAVING agg_pred)`` executes the build side
as a nested aggregate plan whose surviving keys feed the exact bucketed
semi/anti join (or the Bloom probe)."""

import duckdb
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


Q18 = """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100"""


def test_q18_grouped_membership_matches_duckdb(ray_session, sf_dir):
    """Full Q18 vs DuckDB, bit-exact (SUM over integer-valued doubles is
    order-independent); the explain trace shows the nested build plan."""
    from verdictray.sqlrouter import explain_sql, run_sql

    want = _canon(_duck(sf_dir, Q18))
    mine = _canon(run_sql(Q18, sf_dir).to_pandas())
    pdt.assert_frame_equal(mine, want, check_dtype=False)
    trace = explain_sql(Q18, sf_dir)
    assert "grouped build: GROUP BY l_orderkey HAVING" in trace
    # the nested plan's own routing decisions are in the trace too
    assert trace.count("GROUP BY ['l_orderkey']") == 1


def test_grouped_membership_with_where_and_not_in(ray_session, sf_dir):
    """WHERE + GROUP BY + HAVING compose inside the subquery, and NOT IN
    takes the anti side of the same build."""
    from verdictray.sqlrouter import run_sql

    sql = """SELECT COUNT(*) AS n FROM orders
      WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
        WHERE l_discount > 0.02
        GROUP BY l_orderkey HAVING COUNT(*) >= 3)"""
    want = _duck(sf_dir, sql)
    mine = run_sql(sql, sf_dir).to_pandas()
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_grouped_membership_group_key_must_match_select(ray_session):
    from verdictray.sqlrouter import parse_sql

    with pytest.raises(ValueError, match="GROUP BY column"):
        parse_sql("SELECT o_orderkey FROM orders WHERE o_orderkey IN "
                  "(SELECT l_orderkey FROM lineitem GROUP BY l_suppkey "
                  "HAVING COUNT(*) > 1)")


def test_q21ish_double_grouped_membership(ray_session, sf_dir):
    """Q21 shape — the correlated EXISTS/NOT EXISTS supplier-inequality
    pair decomposed into one semi + one anti grouped COUNT(DISTINCT)
    membership build; bit-exact vs DuckDB running the same SQL."""
    from verdictray.entry_queries import (SQL_TPCH_Q21ISH,
                                          q_sql_tpch_q21ish)

    con = duckdb.connect()
    for t in ("orders", "lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.sql(SQL_TPCH_Q21ISH).df()
    mine = q_sql_tpch_q21ish(sf_dir).to_pandas()
    assert len(mine) > 0
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_q20ish_supplier_membership(ray_session, sf01_dir):
    """Q20 shape — supplier fact scan + broadcast nation (filter below
    the join) probing a grouped shipped-quantity membership build."""
    from verdictray.entry_queries import (SQL_TPCH_Q20ISH,
                                          q_sql_tpch_q20ish)

    con = duckdb.connect()
    for t in ("nation", "lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf01_dir}/{t}.parquet'")
    want = con.sql(SQL_TPCH_Q20ISH).df()
    mine = q_sql_tpch_q20ish(sf01_dir).to_pandas()
    assert len(mine) > 0
    pdt.assert_frame_equal(mine, want, check_dtype=False)


def test_membership_key_set_prunes_dim_reads(ray_session, sf01_dir):
    """A broadcast membership key set also pre-filters LATER dim reads
    joined on the probed column (a dim row whose key the probe removed
    can never match): Q18's lineitem broadcast shrinks to the surviving
    orders' rows. Asserted via the EXPLAIN note and a hash-exact result
    vs DuckDB."""
    import duckdb
    import pandas.testing as pdt

    from verdictray.entry_queries import SQL_TPCH_Q18
    from verdictray.sqlrouter import explain_sql, run_sql

    trace = explain_sql(SQL_TPCH_Q18, sf01_dir)
    assert "pre-filter" in trace and "membership key set" in trace
    mine = run_sql(SQL_TPCH_Q18, sf01_dir).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf01_dir}/{t}.parquet'")
    ref = con.sql(SQL_TPCH_Q18).df()
    pdt.assert_frame_equal(mine.reset_index(drop=True), ref,
                           check_dtype=False, atol=1e-9, rtol=0)
