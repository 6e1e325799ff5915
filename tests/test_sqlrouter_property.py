"""Property test: random scalar expressions + predicate trees rendered to
SQL text, executed by the router AND DuckDB on the same parquet table —
the two engines must agree. Expressions stay integer-valued (+ - * over
small ints; SQL "/" is float division, covered separately with
tolerance), so SUM results compare exactly."""

import os
import random

import duckdb
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DIR = "/tmp/vr_proptest"
COLS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def prop_table():
    os.makedirs(DIR, exist_ok=True)
    rng = random.Random(7)
    n = 3000
    tbl = pa.table({
        "a": [rng.randint(-9, 9) for _ in range(n)],
        "b": [rng.randint(0, 50) for _ in range(n)],
        "c": [rng.choice([None, rng.randint(-5, 5)]) for _ in range(n)],
        "g": [rng.choice("xyz") for _ in range(n)],
    })
    pq.write_table(tbl, f"{DIR}/t.parquet")
    return DIR


def _rand_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.35:
        return rng.choice(COLS + [str(rng.randint(-4, 4))])
    kind = rng.random()
    if kind < 0.7:
        op = rng.choice(["+", "-", "*"])
        return (f"({_rand_expr(rng, depth - 1)} {op} "
                f"{_rand_expr(rng, depth - 1)})")
    if kind < 0.85:
        return f"(- {_rand_expr(rng, depth - 1)})"
    return (f"CASE WHEN {_rand_pred(rng, 1)} "
            f"THEN {_rand_expr(rng, depth - 1)} "
            f"ELSE {_rand_expr(rng, depth - 1)} END")


def _rand_pred(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.5:
        lhs = rng.choice(COLS)
        kind = rng.random()
        if kind < 0.5:
            op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
            return f"{lhs} {op} {rng.randint(-6, 6)}"
        if kind < 0.7:
            lo = rng.randint(-6, 3)
            return f"{lhs} BETWEEN {lo} AND {lo + rng.randint(0, 8)}"
        if kind < 0.85:
            return f"{lhs} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
        vals = ", ".join(str(rng.randint(-6, 6)) for _ in range(3))
        return f"{lhs} {'NOT ' if rng.random() < 0.5 else ''}IN ({vals})"
    junct = rng.choice(["AND", "OR"])
    return (f"({_rand_pred(rng, depth - 1)} {junct} "
            f"{_rand_pred(rng, depth - 1)})")


def test_random_expressions_and_predicates_match_duckdb(ray_session,
                                                        prop_table):
    from verdictray.sqlrouter import run_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{prop_table}/t.parquet'")
    rng = random.Random(20260819)
    for trial in range(25):
        expr = _rand_expr(rng, 3)
        pred = _rand_pred(rng, 2)
        sql = (f"SELECT g, SUM({expr}) AS s, COUNT(*) AS n, "
               f"MIN({expr}) AS lo, MAX({expr}) AS hi "
               f"FROM t WHERE {pred} GROUP BY g ORDER BY g")
        mine = run_sql(sql, prop_table).to_pandas().reset_index(drop=True)
        ora = con.sql(sql).df()
        if len(ora) == 0:
            # a WHERE that drops every row: Ray's empty grouped Dataset
            # carries no schema (no blocks ever ran) — only row-emptiness
            # is comparable
            assert len(mine) == 0, (trial, sql)
            continue
        # integer-valued expressions: values must agree EXACTLY
        pdt.assert_frame_equal(mine, ora, check_dtype=False, rtol=0,
                               atol=0), (trial, sql)


def test_random_division_matches_duckdb_with_tolerance(ray_session,
                                                       prop_table):
    """SQL "/" is float division on both engines; associativity is fixed
    by the shared parse, so results agree to ulps."""
    from verdictray.sqlrouter import run_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{prop_table}/t.parquet'")
    sql = ("SELECT g, SUM(a / (b + 1)) AS s, SUM((a * b) / 7) AS s2 "
           "FROM t GROUP BY g ORDER BY g")
    mine = run_sql(sql, prop_table).to_pandas().reset_index(drop=True)
    ora = con.sql(sql).df()
    pdt.assert_frame_equal(mine, ora, check_dtype=False, rtol=1e-12,
                           atol=1e-12)


def test_random_expression_group_and_order_keys(ray_session, prop_table):
    """Round-5 continuation surface under fuzz: random integer-valued
    EXPRESSIONS as GROUP BY and ORDER BY keys (selected or hidden),
    LIMIT/OFFSET, and NOT (pred) — every trial must match DuckDB
    exactly (integer arithmetic only)."""
    from verdictray.sqlrouter import run_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{prop_table}/t.parquet'")
    rng = random.Random(20260820)
    for trial in range(15):
        gexpr = _rand_expr(rng, 2)
        while not any(c in gexpr for c in "abc"):
            # a pure-literal key would parse as a GROUP BY ordinal
            gexpr = _rand_expr(rng, 2)
        pred = _rand_pred(rng, 2)
        sql = (f"SELECT {gexpr} AS k, COUNT(*) AS n, SUM(b) AS s "
               f"FROM t WHERE NOT ({pred}) GROUP BY {gexpr} "
               f"ORDER BY COUNT(*) DESC, k LIMIT 10 OFFSET 2")
        mine = run_sql(sql, prop_table).to_pandas().reset_index(drop=True)
        ora = con.sql(sql).df()
        if len(ora) == 0:
            assert len(mine) == 0, (trial, sql)
            continue
        pdt.assert_frame_equal(mine, ora, check_dtype=False, rtol=0,
                               atol=0), (trial, sql)


def test_random_quantified_and_distinct_exprs(ray_session, prop_table):
    """= ANY / <> ALL (rewritten to [NOT] IN) and COUNT/SUM(DISTINCT
    expr) under fuzz vs DuckDB."""
    from verdictray.sqlrouter import run_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{prop_table}/t.parquet'")
    rng = random.Random(7_2026)
    for trial in range(10):
        e = _rand_expr(rng, 2)
        q = rng.choice(["= ANY", "<> ALL"])
        sql = (f"SELECT COUNT(DISTINCT {e}) AS nd, "
               f"CAST(SUM(DISTINCT {e}) AS BIGINT) AS sd, COUNT(*) AS n "
               f"FROM t WHERE a {q} (SELECT b FROM t WHERE b < 25)")
        mine = run_sql(sql, prop_table).to_pandas().reset_index(drop=True)
        ora = con.sql(sql).df()
        pdt.assert_frame_equal(mine, ora, check_dtype=False, rtol=0,
                               atol=0), (trial, sql)


def test_random_join_queries_match_duckdb(ray_session):
    """Random customer⋈nation join queries (filters on both sides, LEFT
    or INNER, grouped or plain, expression keys) vs DuckDB — the join
    planner's pushdown/broadcast decisions must never change results."""
    import pytest

    from verdictray.sqlrouter import run_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "nation", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    rng = random.Random(5_2026)
    for trial in range(12):
        how = rng.choice(["JOIN", "LEFT JOIN", "INNER JOIN"])
        fact_pred = rng.choice([
            "c_acctbal > 0", "c_acctbal BETWEEN -500 AND 5000",
            "c_mktsegment <> 'BUILDING'", "c_custkey % 3 = 0"])
        dim_pred = rng.choice([
            "n_regionkey < 3", "n_name LIKE 'NATION_1%'",
            "n_nationkey BETWEEN 2 AND 20"])
        if rng.random() < 0.5:
            sql = (f"SELECT n_name, COUNT(*) AS n, "
                   f"CAST(SUM(c_custkey % 100) AS BIGINT) AS s "
                   f"FROM customer {how} nation "
                   f"ON c_nationkey = n_nationkey "
                   f"WHERE {fact_pred} AND {dim_pred} "
                   f"GROUP BY n_name ORDER BY n_name")
        else:
            sql = (f"SELECT c_custkey, n_name FROM customer {how} nation "
                   f"ON c_nationkey = n_nationkey "
                   f"WHERE {fact_pred} AND {dim_pred} "
                   f"ORDER BY c_custkey LIMIT 20")
        mine = run_sql(sql, sf).to_pandas().reset_index(drop=True)
        ora = con.sql(sql).df().reset_index(drop=True)
        if len(ora) == 0:
            assert len(mine) == 0, (trial, sql)
            continue
        pdt.assert_frame_equal(mine, ora, check_dtype=False, rtol=0,
                               atol=0), (trial, sql)
