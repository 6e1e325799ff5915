"""Round-5 join/planner paths: broadcast expand join (dup-key small dim,
zero shuffle), owner-routed join-side predicate pushdown, LEFT-join
pushdown legality, known-schema threading through chained joins, and
filter-only column projection before the shuffle."""

import duckdb
import numpy as np
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pytest


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("orders", "customer", "events", "lineitem", "part", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_broadcast_expand_join_inner_and_left(ray_session):
    """Dup-key dim via the zero-shuffle expand kernel == pandas merge,
    including 64-bit keys above 2**53 (float promotion would corrupt
    them) and the 1:N row expansion."""
    import ray.data as rd

    from verdictray.join import broadcast_expand_join

    big = (1 << 60) + 3          # not float64-representable exactly + 1
    left_df = pd.DataFrame({
        "k": [1, 2, 3, big, 5] * 40,
        "lv": np.arange(200, dtype=np.int64),
    })
    dim = pa.table({
        "dk": [1, 1, 2, big, big, big, 7],       # dup keys, missing 3/5
        "dv": pa.array([10, 11, 20, 60, 61, 62, 70], pa.int64()),
        "dn": ["a", "b", "c", "d", "e", "f", "g"],
    })
    left = rd.from_pandas(left_df).repartition(4)

    for how in ("inner", "left"):
        got = (broadcast_expand_join(left, dim, "k", "dk", how=how)
               .to_pandas())
        dim_df = dim.to_pandas()
        if how == "left":
            # reference must pre-cast to nullable Int64 BEFORE the merge:
            # a plain left merge float-promotes and corrupts the 2**60
            # key — exactly the failure mode the engine kernel avoids
            for c in ("dk", "dv"):
                dim_df[c] = dim_df[c].astype("Int64")
        want = left_df.merge(dim_df, left_on="k", right_on="dk", how=how)
        if how == "left":
            for c in ("dk", "dv"):
                got[c] = got[c].astype("Int64")
        pdt.assert_frame_equal(_canon(got), _canon(want),
                               check_dtype=False)
        # the big key must survive exactly
        assert (got["k"] == big).sum() == (want["k"] == big).sum()
        if how == "inner":
            assert len(got) == 40 * (2 + 1 + 3 + 0 + 0)  # 1:N expansion


def test_expand_join_rejects_bad_how(ray_session):
    import ray.data as rd

    from verdictray.join import broadcast_expand_join

    ds = rd.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError, match="how"):
        broadcast_expand_join(ds, pa.table({"dk": [1]}), "k", "dk",
                              how="right")


def test_router_routes_dup_key_small_dim_to_expand(ray_session, sf01_dir):
    """customer JOIN orders: orders has duplicate o_custkey and fits the
    broadcast budget at sf0.01 → expand join (no shuffle), and the result
    still hash-matches DuckDB."""
    from verdictray.sqlrouter import explain_sql, run_sql

    sql = """SELECT c_mktsegment, COUNT(*) AS n
             FROM customer JOIN orders ON c_custkey = o_custkey
             WHERE o_totalprice > 150000
             GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    trace = explain_sql(sql, sf01_dir)
    assert "BROADCAST expand join" in trace
    assert "BELOW the join" in trace          # owner-routed dim pushdown
    pdt.assert_frame_equal(run_sql(sql, sf01_dir).to_pandas(),
                           _duck(sf01_dir, sql), check_dtype=False)


def test_join_side_pushdown_inner_vs_left(ray_session, sf01_dir):
    """A WHERE conjunct owned by an INNER-joined dim filters below the
    join; the same conjunct on a LEFT-joined dim must stay post-join
    (it changes the preserved row set) — both match DuckDB."""
    from verdictray.sqlrouter import explain_sql, run_sql

    inner = """SELECT COUNT(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderstatus = 'F'"""
    trace = explain_sql(inner, sf01_dir)
    assert "BELOW the join" in trace
    pdt.assert_frame_equal(run_sql(inner, sf01_dir).to_pandas(),
                           _duck(sf01_dir, inner), check_dtype=False)

    left = """SELECT COUNT(*) AS n, COUNT(o_orderkey) AS matched
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        WHERE o_orderstatus IS NULL OR o_orderstatus = 'F'"""
    trace = explain_sql(left, sf01_dir)
    assert "BELOW the join" not in trace
    assert "FILTER (after joins" in trace
    pdt.assert_frame_equal(run_sql(left, sf01_dir).to_pandas(),
                           _duck(sf01_dir, left), check_dtype=False)


def test_hash_join_known_schema_matches_inferred(ray_session, sf01_dir):
    """Threading left_schema/right_schema into hash_join must not change
    the result vs letting it call Dataset.schema()."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from verdictray.join import hash_join

    sf = sf01_dir
    cs = pq.read_schema(f"{sf}/customer.parquet")
    os_ = pq.read_schema(f"{sf}/orders.parquet")
    ccols, ocols = ["c_custkey", "c_mktsegment"], ["o_custkey",
                                                   "o_totalprice"]

    def sub(s, cols):
        m = dict(zip(s.names, s.types))
        return pa.schema([(c, m[c]) for c in cols])

    left = rd.read_parquet(f"{sf}/customer.parquet", columns=ccols)
    right = rd.read_parquet(f"{sf}/orders.parquet", columns=ocols)
    a = hash_join(left, right, "c_custkey", "o_custkey",
                  buckets=8).to_pandas()
    b = hash_join(left, right, "c_custkey", "o_custkey", buckets=8,
                  left_schema=sub(cs, ccols),
                  right_schema=sub(os_, ocols)).to_pandas()
    pdt.assert_frame_equal(_canon(a), _canon(b))


def test_filter_only_columns_projected_before_shuffle(ray_session,
                                                      sf01_dir):
    """A WHERE-only fact column must not ride through the join shuffle:
    the explain trace shows the projection, and results stay right."""
    from verdictray.sqlrouter import explain_sql, run_sql

    sql = """SELECT c_mktsegment, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 150000 AND o_orderstatus = 'F'
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    trace = explain_sql(sql, sf01_dir, max_broadcast_rows=0)
    assert "PROJECT fact" in trace
    assert "o_totalprice" not in trace.split("PROJECT fact")[1].split(
        "\n")[0]
    mine = run_sql(sql, sf01_dir, max_broadcast_rows=0).to_pandas()
    pdt.assert_frame_equal(mine, _duck(sf01_dir, sql), check_dtype=False)
