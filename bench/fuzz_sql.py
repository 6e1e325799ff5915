"""Adversarial random-SQL fuzz harness: hundreds of generated queries per
seed, executed by the router AND DuckDB on the same parquet, compared
exactly (rtol 1e-9 where floats are involved; empty results compare on
row count — Ray's empty grouped Dataset carries no schema).

Usage:  python bench/fuzz_sql.py [seed] [trials-per-battery]

Owns its Ray session (scripts may; library may not). Three batteries:
  A. synthetic nullable table — grouped aggregates, expression keys,
     DISTINCT-set aggregates, window rankings, ROLLUP
  B. same table — set-ops, CTEs, OFFSET, two-sided ROWS frames (output
     multiset compared: per-row frames are engine-defined under order
     ties), HAVING with hidden order aggregates, DISTINCT×window
  C. the driver TPC-H tables — LEFT-join ON conjuncts, correlated
     scalar items, DISTINCT ON, derived-key CUBE, QUALIFY top-k

The round-5 campaign (~1,100 trials) found six real defects, each now a
pytest regression (see BASELINE.md §fuzz campaign).
"""
import os
import random
import sys

import duckdb
import pandas.testing as pdt
import pyarrow as pa
import pyarrow.parquet as pq

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from verdictray.sqlrouter import run_sql  # noqa: E402

DIR = "/tmp/vr_fuzz_sql"
SF = "/root/testdata/sf0.001"
COLS = ["a", "b", "c"]


def make_table(seed: int = 99) -> None:
    os.makedirs(DIR, exist_ok=True)
    rng = random.Random(seed)
    n = 5000
    pq.write_table(pa.table({
        "a": [rng.randint(-9, 9) for _ in range(n)],
        "b": [rng.randint(0, 50) for _ in range(n)],
        "c": [rng.choice([None, rng.randint(-5, 5)]) for _ in range(n)],
        "g": [rng.choice("wxyz") for _ in range(n)],
        "h": [rng.choice(["p", "q", None]) for _ in range(n)],
    }), f"{DIR}/t.parquet")


def rexpr(rng, d):
    if d <= 0 or rng.random() < 0.35:
        return rng.choice(COLS + [str(rng.randint(-4, 4))])
    k = rng.random()
    if k < 0.6:
        return (f"({rexpr(rng, d - 1)} {rng.choice(['+', '-', '*'])} "
                f"{rexpr(rng, d - 1)})")
    if k < 0.72:
        return f"(- {rexpr(rng, d - 1)})"
    if k < 0.84:
        return f"ABS({rexpr(rng, d - 1)})"
    return (f"CASE WHEN {rpred(rng, 1)} THEN {rexpr(rng, d - 1)} "
            f"ELSE {rexpr(rng, d - 1)} END")


def rpred(rng, d):
    if d <= 0 or rng.random() < 0.45:
        lhs = rng.choice(COLS + ["g", "h"])
        if lhs in ("g", "h"):
            k = rng.random()
            if k < 0.4:
                return f"{lhs} = '{rng.choice('wxyzpq')}'"
            if k < 0.6:
                return (f"{lhs} IS "
                        f"{'NOT ' if rng.random() < 0.5 else ''}NULL")
            if k < 0.8:
                return f"{lhs} IN ('w', 'p', 'x')"
            return (f"{lhs} {'NOT ' if rng.random() < 0.5 else ''}"
                    f"LIKE '%{rng.choice('wxyzpq')}%'")
        k = rng.random()
        if k < 0.45:
            return (f"{lhs} {rng.choice(['=', '!=', '<', '<=', '>', '>='])} "
                    f"{rng.randint(-6, 6)}")
        if k < 0.6:
            lo = rng.randint(-6, 3)
            return f"{lhs} BETWEEN {lo} AND {lo + rng.randint(0, 8)}"
        if k < 0.75:
            return f"{lhs} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
        if k < 0.9:
            return f"{lhs} IN (1, 2, {rng.randint(-6, 6)})"
        return f"NOT ({rpred(rng, 0)})"
    return (f"({rpred(rng, d - 1)} {rng.choice(['AND', 'OR'])} "
            f"{rpred(rng, d - 1)})")


def battery_a(rng, i):
    shape = rng.random()
    e1, e2 = rexpr(rng, 2), rexpr(rng, 2)
    p = rpred(rng, 2)
    if shape < 0.3:
        return (DIR, f"SELECT g, h, SUM({e1}) AS s, COUNT(*) AS n, "
                f"MIN({e2}) AS lo FROM t WHERE {p} GROUP BY g, h "
                f"ORDER BY g, h NULLS LAST")
    if shape < 0.5:
        ge = e1
        while not any(ch in ge for ch in "abc"):
            ge = rexpr(rng, 2)
        return (DIR, f"SELECT {ge} AS k, COUNT(*) AS n FROM t WHERE {p} "
                f"GROUP BY {ge} ORDER BY n DESC, k LIMIT 8")
    if shape < 0.65:
        return (DIR, f"SELECT g, COUNT(DISTINCT {e1}) AS nd, "
                f"SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS m "
                f"FROM t GROUP BY g ORDER BY g")
    if shape < 0.8:
        return (DIR, f"SELECT a, b, ROW_NUMBER() OVER (PARTITION BY g "
                f"ORDER BY a, b, c NULLS LAST) AS rn FROM t WHERE {p} "
                f"ORDER BY rn, a, b, c NULLS LAST LIMIT 20")
    return (DIR, f"SELECT g, h, COUNT(*) AS n FROM t WHERE {p} "
            f"GROUP BY ROLLUP (g, h) ORDER BY n DESC, g NULLS FIRST, "
            f"h NULLS FIRST LIMIT 12")


def battery_b(rng, i):
    shape = rng.random()
    e1 = rexpr(rng, 2)
    p, p2 = rpred(rng, 2), rpred(rng, 2)
    if shape < 0.2:
        op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        return (DIR, f"SELECT g AS k FROM t WHERE {p} {op} "
                f"SELECT h AS k FROM t WHERE {p2} ORDER BY k NULLS LAST")
    if shape < 0.35:
        return (DIR, f"WITH f AS (SELECT * FROM t WHERE {p}) "
                f"SELECT g, COUNT(*) AS n, SUM(b) AS s FROM f "
                f"GROUP BY g ORDER BY g")
    if shape < 0.5:
        ge = e1
        while not any(ch in ge for ch in "abc"):
            ge = rexpr(rng, 2)
        return (DIR, f"SELECT a, b, c FROM t WHERE {p} ORDER BY {ge}, "
                f"a, b, c NULLS LAST LIMIT 12 OFFSET 4")
    if shape < 0.65:
        lo, hi = rng.randint(0, 3), rng.randint(0, 3)
        return (DIR, f"SELECT a, b, c, SUM(b) OVER (PARTITION BY g "
                f"ORDER BY a, b, c NULLS LAST ROWS BETWEEN {lo} "
                f"PRECEDING AND {hi} FOLLOWING) AS s FROM t WHERE {p} "
                f"ORDER BY a, b, c NULLS LAST, s")
    if shape < 0.8:
        return (DIR, f"SELECT g FROM t WHERE {p} GROUP BY g "
                f"HAVING COUNT(*) > {rng.randint(0, 300)} "
                f"ORDER BY SUM(b) DESC, g LIMIT 5")
    return (DIR, f"SELECT DISTINCT g, COUNT(*) OVER (PARTITION BY g) "
            f"AS n FROM t WHERE {p} ORDER BY g")


O_PREDS = ["o_totalprice > 100000", "o_orderstatus = 'F'",
           "o_orderdate >= DATE '1995-01-01'",
           "o_orderpriority ILIKE '%high%'", "o_custkey % 5 = 0",
           "o_totalprice BETWEEN 1000 AND 400000",
           "NOT (o_orderstatus = 'O')", "o_orderkey < -1"]
C_PREDS = ["c_acctbal > 0", "c_mktsegment IN ('BUILDING', 'MACHINERY')",
           "c_name LIKE 'Customer%'", "c_nationkey < 12"]


def battery_c(rng, i):
    shape = rng.random()
    op_, cp_ = rng.choice(O_PREDS), rng.choice(C_PREDS)
    if shape < 0.25:
        return (SF, f"SELECT n_name, COUNT(o_orderkey) AS n, COUNT(*) "
                f"AS rows_ FROM customer LEFT JOIN orders ON c_custkey "
                f"= o_custkey AND {op_} JOIN nation ON c_nationkey = "
                f"n_nationkey WHERE {cp_} GROUP BY n_name "
                f"ORDER BY n DESC, n_name LIMIT 10")
    if shape < 0.45:
        return (SF, f"SELECT c_custkey, (SELECT COUNT(*) FROM orders "
                f"WHERE o_custkey = c_custkey AND {op_}) AS n FROM "
                f"customer WHERE {cp_} ORDER BY n DESC, c_custkey "
                f"LIMIT 15")
    if shape < 0.6:
        return (SF, f"SELECT DISTINCT ON (o_orderstatus) o_orderstatus, "
                f"o_orderkey, o_totalprice FROM orders WHERE {op_} "
                f"ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey")
    if shape < 0.75:
        return (SF, f"SELECT o_orderstatus, EXTRACT(year FROM "
                f"o_orderdate) AS y, COUNT(*) AS n FROM orders WHERE "
                f"{op_} GROUP BY CUBE (o_orderstatus, y) ORDER BY n "
                f"DESC, 1 NULLS FIRST, 2 NULLS FIRST LIMIT 15")
    return (SF, f"SELECT o_orderkey, o_totalprice FROM orders WHERE "
            f"{op_} QUALIFY ROW_NUMBER() OVER (PARTITION BY "
            f"o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) "
            f"<= 3 ORDER BY o_orderkey")


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    make_table()
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    cons = {}
    for d, tables in ((DIR, ["t"]),
                      (SF, ["region", "nation", "customer", "supplier",
                            "part", "orders", "lineitem", "events"])):
        con = duckdb.connect()
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{d}/{t}.parquet'")
        cons[d] = con
    fails = total = 0
    for name, gen in (("A", battery_a), ("B", battery_b),
                      ("C", battery_c)):
        rng = random.Random(seed * 1000 + ord(name))
        for i in range(trials):
            d, sql = gen(rng, i)
            total += 1
            try:
                mine = run_sql(sql, d).to_pandas().reset_index(drop=True)
                ora = cons[d].sql(sql).df().reset_index(drop=True)
                if len(ora) == 0:
                    assert len(mine) == 0, "row-count"
                    continue
                pdt.assert_frame_equal(mine, ora, check_dtype=False,
                                       rtol=1e-9)
            except Exception as ex:  # noqa: BLE001
                fails += 1
                print(f"FAIL {name}[{i}] {type(ex).__name__}: "
                      f"{str(ex)[:140]}")
                print("  SQL:", " ".join(sql.split()))
    print(f"fuzz seed={seed}: {total} trials, {fails} failures")
    ray.shutdown()
    return fails


if __name__ == "__main__":
    sys.exit(main())
