"""Round-5 RANGE BETWEEN INTERVAL window frames through the SQL router
(routed to window.rolling_range_agg) — DuckDB parity incl. equal-ts
peers, AVG, rejection of unsupported shapes."""

import duckdb
import pandas.testing as pdt
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_range_interval_frame_matches_duckdb(ray_session, sf01_dir):
    from verdictray.sqlrouter import explain_sql, run_sql

    sql = """SELECT event_id,
      SUM(user_id) OVER (PARTITION BY event_type ORDER BY ts
          RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
          AS s30,
      AVG(user_id) OVER (PARTITION BY event_type ORDER BY ts
          RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
          AS a30,
      COUNT(*) OVER (PARTITION BY event_type ORDER BY ts
          RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
          AS n30
     FROM events"""
    duck = sql.replace("INTERVAL 30 MINUTE", "INTERVAL '30' MINUTE")
    mine = _canon(run_sql(sql, sf01_dir).to_pandas())
    pdt.assert_frame_equal(mine, _canon(_duck(sf01_dir, duck)),
                           check_dtype=False)
    assert "rolling_range_agg" in explain_sql(sql, sf01_dir)


def test_range_frame_rejects_unsupported_shapes(ray_session, sf01_dir):
    from verdictray.sqlrouter import run_sql

    with pytest.raises(ValueError, match="SUM/AVG/COUNT"):
        run_sql("""SELECT MAX(user_id) OVER (PARTITION BY event_type
          ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
          CURRENT ROW) AS m FROM events""", sf01_dir)
    with pytest.raises(ValueError, match="ascending timestamp"):
        run_sql("""SELECT SUM(user_id) OVER (PARTITION BY event_type
          ORDER BY ts DESC RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
          CURRENT ROW) AS m FROM events""", sf01_dir)
    with pytest.raises(ValueError, match="share one value column"):
        run_sql("""SELECT SUM(user_id) OVER (PARTITION BY event_type
          ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
          CURRENT ROW) AS a,
          SUM(value) OVER (PARTITION BY event_type ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS b
          FROM events""", sf01_dir)
    with pytest.raises(ValueError, match="SECOND/MINUTE/HOUR/DAY"):
        run_sql("""SELECT SUM(user_id) OVER (PARTITION BY event_type
          ORDER BY ts RANGE BETWEEN INTERVAL 1 MONTH PRECEDING AND
          CURRENT ROW) AS m FROM events""", sf01_dir)
