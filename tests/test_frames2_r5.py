"""Two-sided ROWS frames: ROWS BETWEEN {n|UNBOUNDED} PRECEDING AND
{CURRENT ROW|m|UNBOUNDED FOLLOWING}. SUM/AVG/COUNT resolve both frame
endpoints from ONE cumulative pass (prefix sums indexed at the clamped
per-partition positions); MIN/MAX combine a backward and a forward
(reversed per-key rolling) window with NaN-ignoring fmin/fmax."""

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _cmp(sf_dir, sql, tables=("lineitem",)):
    from verdictray.sqlrouter import run_sql

    mine = run_sql(sql, sf_dir).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    ref = con.sql(sql).df().reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False,
                           atol=1e-9, rtol=0)


def test_two_sided_rows_frames_match_duckdb(ray_session, sf_dir):
    """All endpoint combinations over integer-valued quantities (exact
    in float64): bounded/bounded, UNBOUNDED/m, n/UNBOUNDED, and the
    whole-partition UNBOUNDED/UNBOUNDED."""
    _cmp(sf_dir, """
        SELECT l_orderkey, l_linenumber,
          SUM(l_quantity) OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber
              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s11,
          COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
              ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS c21,
          AVG(l_quantity) OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber
              ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS a12,
          MIN(l_quantity) OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber
              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mn11,
          MAX(l_quantity) OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS mx_all,
          SUM(l_quantity) OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS s_u1,
          MIN(l_quantity) OVER (PARTITION BY l_orderkey
              ORDER BY l_linenumber
              ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING) AS mn_2u
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 3000
    """)


def test_two_sided_frames_null_semantics(ray_session, tmp_path):
    """NULL values inside frames (skipped by SQL aggs; an all-null frame
    is NULL) and NULL partition keys (one partition, not one per row)."""
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "k": ["a"] * 5 + ["b"] * 3 + [None] * 2,
        "o": [1, 2, 3, 4, 5, 1, 2, 3, 1, 2],
        "x": pa.array([10, None, 30, None, 50, None, None, 8, 7, None],
                      type=pa.int64()),
    }), d / "orders.parquet")
    sql = """SELECT k, o,
      SUM(x) OVER (PARTITION BY k ORDER BY o
          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s,
      MIN(x) OVER (PARTITION BY k ORDER BY o
          ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS mn,
      MAX(x) OVER (PARTITION BY k ORDER BY o
          ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING) AS mx,
      COUNT(x) OVER (PARTITION BY k ORDER BY o
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS c
      FROM orders ORDER BY k NULLS FIRST, o"""
    from verdictray.sqlrouter import run_sql

    mine = run_sql(sql, str(d)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"'{d / 'orders.parquet'}'")
    ref = con.sql(sql).df().reset_index(drop=True)
    pdt.assert_frame_equal(mine, ref, check_dtype=False, atol=1e-9,
                           rtol=0)


def test_two_sided_frame_errors_are_loud(ray_session, sf_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="FOLLOWING"):
        run_sql("SELECT SUM(l_quantity) OVER (PARTITION BY l_orderkey "
                "ORDER BY l_linenumber ROWS BETWEEN 1 PRECEDING AND -2 "
                "FOLLOWING) AS s FROM lineitem LIMIT 1", sf_dir)
    with pytest.raises(ValueError, match="cumulative"):
        run_sql("SELECT ROW_NUMBER() OVER (PARTITION BY l_orderkey "
                "ORDER BY l_linenumber ROWS BETWEEN 1 PRECEDING AND 1 "
                "FOLLOWING) AS r FROM lineitem LIMIT 1", sf_dir)
