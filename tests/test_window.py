"""Windowed aggregates + as-of join (window.py) against DuckDB ground truth."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestTumblingWindow:
    def test_hourly_counts_match_duckdb(self, ray_session, sf01_dir):
        import ray.data as rd

        from verdictray.window import tumbling_window
        from ray.data.aggregate import Count

        ds = rd.read_parquet(f"{sf01_dir}/events.parquet", columns=["ts"])
        out = tumbling_window(ds, "ts", 3600).aggregate(
            Count(alias_name="n")).to_pandas()
        truth = duckdb.sql(
            f"select time_bucket(interval '1 hour', ts) w, count(*) n "
            f"from '{sf01_dir}/events.parquet' group by 1"
        ).df()
        got = dict(zip(out.window_start.astype("datetime64[us]"), out.n))
        want = dict(zip(truth.w.astype("datetime64[us]"), truth.n))
        assert got == want

    def test_window_is_pure_function_of_ts(self):
        import datetime as dt

        from verdictray.window import with_tumbling_window

        t = pa.table({"ts": pa.array([dt.datetime(2024, 5, 1, 13, 59, 59),
                                      dt.datetime(2024, 5, 1, 14, 0, 0)],
                                     pa.timestamp("us"))})
        out = with_tumbling_window(t, width_s=3600)["window_start"].to_pylist()
        assert out == [dt.datetime(2024, 5, 1, 13, 0), dt.datetime(2024, 5, 1, 14, 0)]


class TestSlidingWindow:
    def test_each_row_covered_by_width_over_slide_windows(self):
        import datetime as dt

        from verdictray.window import with_sliding_windows

        t = pa.table({"ts": pa.array([dt.datetime(2024, 1, 1, 10, 25)],
                                     pa.timestamp("us")), "v": [7]})
        out = with_sliding_windows(t, width_s=3600, slide_s=900)
        starts = sorted(out["window_start"].to_pylist())
        # 4 windows of width 1h, slide 15m, all containing 10:25
        assert len(starts) == 4
        for s in starts:
            assert s <= dt.datetime(2024, 1, 1, 10, 25) < s + dt.timedelta(hours=1)

    def test_rejects_non_divisible_slide(self):
        from verdictray.window import with_sliding_windows

        with pytest.raises(ValueError, match="multiple"):
            with_sliding_windows(pa.table({"ts": pa.array([], pa.timestamp("us"))}),
                                 width_s=3600, slide_s=700)


class TestAsofJoin:
    def test_matches_duckdb_asof(self, ray_session, sf01_dir):
        """Every event joined to the latest same-user signup at-or-before
        it; match sets must equal DuckDB's ASOF LEFT JOIN."""
        import pyarrow.compute as pc
        import ray.data as rd

        from verdictray.window import asof_join

        events = rd.read_parquet(f"{sf01_dir}/events.parquet",
                                 columns=["event_id", "user_id", "ts", "event_type"])
        signups = rd.read_parquet(f"{sf01_dir}/events.parquet",
                                  columns=["user_id", "ts", "event_type"]) \
            .map_batches(lambda b: b.filter(
                pc.equal(b["event_type"], pa.scalar("signup")))
                .drop_columns(["event_type"]),
                batch_format="pyarrow", zero_copy_batch=True)
        joined = asof_join(events, signups, on="user_id", ts_left="ts",
                           ts_right="ts", buckets=8).to_pandas()
        truth = duckdb.sql(f"""
            SELECT e.event_id, s.ts AS ts_r
            FROM '{sf01_dir}/events.parquet' e
            ASOF LEFT JOIN (SELECT user_id, ts FROM '{sf01_dir}/events.parquet'
                            WHERE event_type = 'signup') s
              ON e.user_id = s.user_id AND e.ts >= s.ts
        """).df()
        got = dict(zip(joined.event_id, joined.ts_r))
        want = dict(zip(truth.event_id, truth.ts_r))
        assert len(got) == len(want)
        import pandas as pd

        mism = [k for k in want
                if (pd.isna(got[k]) != pd.isna(want[k]))
                or (not pd.isna(want[k])
                    and pd.Timestamp(got[k]) != pd.Timestamp(want[k]))]
        assert not mism, f"{len(mism)} as-of mismatches, e.g. {mism[:5]}"

    def test_left_rows_preserved(self, ray_session):
        """No key on the right side → all left rows survive with null
        right columns (left-join semantics)."""
        import datetime as dt

        import ray.data as rd

        from verdictray.window import asof_join

        left = rd.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
        }))
        right = rd.from_arrow(pa.table({
            "k": pa.array([99], pa.int64()),
            "ts": pa.array([dt.datetime(2023, 1, 1)], pa.timestamp("us")),
            "payload": pa.array([5], pa.int64()),
        }))
        out = asof_join(left, right, on="k", ts_left="ts", ts_right="ts",
                        buckets=4).to_pandas()
        assert len(out) == 2
        assert out["payload"].isna().all()


class TestRangeJoin:
    def test_matches_duckdb_interval_join(self, ray_session, sf01_dir):
        """Pair multiplicity must equal DuckDB's non-equi join, including
        intervals that span time-bucket boundaries."""
        import pyarrow.compute as pc
        import ray.data as rd

        from verdictray.window import range_join

        events = rd.read_parquet(f"{sf01_dir}/events.parquet",
                                 columns=["event_id", "ts"])

        def mk(b):
            lo = b.filter(pc.equal(b["event_type"], pa.scalar("error")))["ts"]
            return pa.table({"lo": lo}).append_column(
                "hi", pa.compute.add(lo, pa.scalar(900_000_000, pa.duration("us"))))

        wins = rd.read_parquet(f"{sf01_dir}/events.parquet",
                               columns=["ts", "event_type"]) \
            .map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
        # bucket width (600 s) deliberately NOT the interval span (900 s):
        # every interval straddles buckets, exercising the replication path
        out = range_join(events, wins, ts_col="ts", lo_col="lo", hi_col="hi",
                         bucket_width_s=600, buckets=8).to_pandas()
        truth = duckdb.sql(f"""
            SELECT e.event_id, count(*) AS n
            FROM '{sf01_dir}/events.parquet' e
            JOIN (SELECT ts AS lo, ts + INTERVAL 15 MINUTE AS hi
                  FROM '{sf01_dir}/events.parquet' WHERE event_type = 'error') w
              ON e.ts >= w.lo AND e.ts < w.hi
            GROUP BY 1
        """).df()
        got = out.groupby("event_id").size().to_dict()
        want = dict(zip(truth.event_id, truth.n))
        assert got == want

    def test_rejects_column_clash(self, ray_session):
        import datetime as dt

        import ray.data as rd

        from verdictray.window import range_join

        side = rd.from_arrow(pa.table({
            "ts": pa.array([dt.datetime(2024, 1, 1)], pa.timestamp("us"))}))
        with pytest.raises(ValueError, match="disjoint"):
            range_join(side, side, ts_col="ts", lo_col="ts", hi_col="ts",
                       bucket_width_s=60)


class TestSessionize:
    def test_matches_sql_window_definition(self, ray_session, sf01_dir):
        import ray.data as rd

        from verdictray.window import sessionize

        ds = rd.read_parquet(f"{sf01_dir}/events.parquet",
                             columns=["user_id", "ts"])
        sess = sessionize(ds, key="user_id", ts_col="ts", gap_s=1800,
                          buckets=8).to_pandas()
        truth = duckdb.sql(f"""
            WITH d AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM '{sf01_dir}/events.parquet'
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM d GROUP BY 1
        """).df()
        got = sess.groupby("user_id")["session_seq"].agg(["max", "size"])
        want = truth.set_index("user_id")
        assert dict(got["max"]) == dict(want["n_sessions"])
        assert dict(got["size"]) == dict(want["n_events"])

    def test_gap_boundary_is_strict(self, ray_session):
        """A gap of exactly gap_s stays in the same session (matches SQL
        ``>``); one microsecond more starts a new one."""
        import datetime as dt

        import ray.data as rd

        from verdictray.window import sessionize

        t0 = dt.datetime(2024, 1, 1)
        ds = rd.from_arrow(pa.table({
            "k": pa.array(["a", "a", "a"], pa.string()),
            "ts": pa.array([t0, t0 + dt.timedelta(seconds=60),
                            t0 + dt.timedelta(seconds=120, microseconds=1)],
                           pa.timestamp("us")),
        }))
        out = sessionize(ds, key="k", ts_col="ts", gap_s=60, buckets=2) \
            .to_pandas().sort_values("ts")
        assert list(out["session_seq"]) == [1, 1, 2]


class TestRollingAgg:
    def test_matches_sql_rows_frame(self, ray_session, sf01_dir):
        import ray.data as rd

        from verdictray.window import rolling_agg

        ds = rd.read_parquet(f"{sf01_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts", "value"])
        out = rolling_agg(ds, key="user_id", ts_col="ts", value_col="value",
                          window_rows=3, aggs=("count", "min", "max"),
                          buckets=8).to_pandas()
        truth = duckdb.sql(f"""
            SELECT event_id,
                   count(*) OVER w AS c, min(value) OVER w AS lo,
                   max(value) OVER w AS hi
            FROM '{sf01_dir}/events.parquet'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """).df().set_index("event_id")
        got = out.set_index("event_id")
        assert len(got) == len(truth)
        truth = truth.reindex(got.index)
        assert (got["rolling_count"].astype(int) == truth["c"]).all()
        assert (got["rolling_min"] == truth["lo"]).all()
        assert (got["rolling_max"] == truth["hi"]).all()

    def test_rejects_unknown_agg(self, ray_session):
        import ray.data as rd

        from verdictray.window import rolling_agg

        ds = rd.from_arrow(pa.table({"k": ["a"], "ts": pa.array(
            [0], pa.timestamp("us")), "v": [1.0]}))
        with pytest.raises(ValueError, match="unsupported"):
            rolling_agg(ds, "k", "ts", "v", 3, aggs=("median",))


class TestRollingRangeAgg:
    def test_matches_sql_range_frame(self, ray_session, sf01_dir):
        import ray.data as rd

        from verdictray.window import rolling_range_agg

        ds = rd.read_parquet(f"{sf01_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts", "value"])
        out = rolling_range_agg(ds, key="user_id", ts_col="ts",
                                value_col="value", width_s=1800,
                                aggs=("count",), buckets=8).to_pandas()
        truth = duckdb.sql(f"""
            SELECT event_id, count(*) OVER w AS c
            FROM '{sf01_dir}/events.parquet'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                         AND CURRENT ROW)
        """).df().set_index("event_id")
        got = out.set_index("event_id")
        assert len(got) == len(truth)
        truth = truth.reindex(got.index)
        assert (got["rolling_count"].astype(int) == truth["c"]).all()

    def test_peer_rows_included_like_sql(self, ray_session):
        """Duplicate timestamps: RANGE frames include ALL peers of the
        current row (SQL semantics), not just preceding positions."""
        import datetime as dt

        import ray.data as rd

        from verdictray.window import rolling_range_agg

        base = dt.datetime(2024, 1, 1)
        rows = pa.table({
            "k": ["u"] * 4,
            "ts": pa.array([base, base, base + dt.timedelta(seconds=5),
                            base + dt.timedelta(seconds=100)],
                           pa.timestamp("us")),
            "v": pa.array([1, 10, 100, 1000], pa.int64()),
        })
        out = (rolling_range_agg(rd.from_arrow(rows).repartition(2), "k",
                                 "ts", "v", width_s=10,
                                 aggs=("sum", "count"), buckets=2)
               .to_pandas().sort_values(["ts", "v"]).reset_index(drop=True))
        # both t=0 rows see BOTH peers (sum 11); t=5 sees all three;
        # t=100 is alone (width 10)
        assert out["rolling_sum"].tolist() == [11, 11, 111, 1000]
        assert out["rolling_count"].tolist() == [2, 2, 3, 1]
        assert out["rolling_sum"].dtype.kind == "i"  # int column → exact int64


class TestWindowUnitsAndNegatives:
    """ADVICE r2: non-us timestamp units and pre-epoch timestamps."""

    def test_non_us_units_bucket_identically(self):
        import datetime as dt

        from verdictray.window import with_tumbling_window

        when = [dt.datetime(2024, 5, 1, 13, 59, 59),
                dt.datetime(2024, 5, 1, 14, 0, 1)]
        want = [dt.datetime(2024, 5, 1, 13, 0), dt.datetime(2024, 5, 1, 14, 0)]
        for unit in ("s", "ms", "us", "ns"):
            t = pa.table({"ts": pa.array(when, pa.timestamp(unit))})
            out = with_tumbling_window(t, width_s=3600)["window_start"]
            assert out.type == pa.timestamp(unit)
            got = [v.as_py().replace(tzinfo=None) for v in out]
            assert got == want, unit

    def test_pre_epoch_timestamps_floor_not_truncate(self):
        import datetime as dt

        from verdictray.window import with_tumbling_window

        # 1969-12-31 23:30 is in the window starting 23:00 (floor), not the
        # one starting 1970-01-01 00:00 (what toward-zero truncation gives)
        t = pa.table({"ts": pa.array([dt.datetime(1969, 12, 31, 23, 30),
                                      dt.datetime(1969, 12, 31, 23, 0)],
                                     pa.timestamp("us"))})
        out = with_tumbling_window(t, width_s=3600)["window_start"].to_pylist()
        assert out == [dt.datetime(1969, 12, 31, 23, 0)] * 2

    def test_rejects_non_timestamp_column(self):
        import pytest

        from verdictray.window import with_tumbling_window

        with pytest.raises(TypeError, match="timestamp"):
            with_tumbling_window(pa.table({"ts": pa.array([1, 2], pa.int64())}),
                                 width_s=60)


class TestConsecutiveGaps:
    def test_gaps_match_duckdb_lag(self, ray_session, sf01_dir):
        import duckdb
        import ray.data as rd

        from verdictray.window import consecutive_gaps

        ds = rd.read_parquet(f"{sf01_dir}/events.parquet",
                             columns=["user_id", "ts", "event_id", "event_type"])
        got = consecutive_gaps(ds, key="user_id", ts_col="ts",
                               tiebreak="event_id", attrs=["event_type", "user_id"],
                               out_col="gap_us", buckets=8).to_pandas()
        want = duckdb.sql(
            f"with e as (select user_id, event_type, epoch_us(ts) - "
            f"lag(epoch_us(ts)) over (partition by user_id order by ts, event_id) gap_us "
            f"from '{sf01_dir}/events.parquet') "
            f"select user_id, event_type, gap_us from e where gap_us is not null"
        ).df()
        key = ["user_id", "gap_us", "event_type"]
        a = got[key].sort_values(key).reset_index(drop=True)
        b = want[key].sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a.values == b.values).all()

    def test_ms_unit_rescaled_to_native_ticks(self, ray_session):
        import datetime as dt

        import ray.data as rd

        from verdictray.window import consecutive_gaps

        t = pa.table({
            "k": ["a", "a", "b"],
            "ts": pa.array([dt.datetime(2024, 1, 1, 0, 0, 0),
                            dt.datetime(2024, 1, 1, 0, 0, 2),
                            dt.datetime(2024, 1, 1)], pa.timestamp("ms")),
            "i": [1, 2, 3],
        })
        out = consecutive_gaps(rd.from_arrow(t), key="k", ts_col="ts",
                               tiebreak="i", attrs=["k"], out_col="gap",
                               buckets=2).to_pandas()
        # one gap (a's pair), 2 s = 2000 ms ticks
        assert out["gap"].tolist() == [2000]


class TestCumulativeAgg:
    def test_matches_duckdb_running_total(self, ray_session, sf_dir):
        import duckdb
        import pandas.testing as pdt
        import ray.data as rd

        from verdictray.window import cumulative_agg

        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts", "value"])

        def micros(b):
            import pyarrow.compute as pc
            v = pc.cast(pc.round(pc.multiply(b["value"], pa.scalar(1e6)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
            return b.drop_columns(["value"]).append_column("v", v)

        for blocks in (1, 5):
            out = cumulative_agg(
                ds.map_batches(micros, batch_format="pyarrow",
                               zero_copy_batch=True).repartition(blocks),
                key="user_id", ts_col="ts", value_col="v",
                tiebreak=["event_id"], buckets=8).to_pandas()
            mine = (out[["event_id", "cum_sum", "row_idx"]]
                    .sort_values("event_id").reset_index(drop=True))
            exact = duckdb.sql(
                f"select event_id, sum(CAST(round(value*1000000) AS BIGINT)) "
                f"over w as cum_sum, CAST(row_number() over w AS BIGINT) as row_idx "
                f"from '{sf_dir}/events.parquet' "
                f"window w as (partition by user_id order by ts, event_id "
                f"rows unbounded preceding) order by event_id"
            ).df()
            pdt.assert_frame_equal(mine, exact, check_dtype=False)


class TestFunnelCounts:
    def test_strict_order_semantics(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from verdictray.window import funnel_counts

        t0 = pd.Timestamp("2024-01-01")
        s = pd.Timedelta(seconds=1)
        rows = [
            # u1: full ordered funnel
            ("u1", t0, "signup"), ("u1", t0 + s, "click"),
            ("u1", t0 + 2 * s, "purchase"),
            # u2: click BEFORE signup -> stops at signup
            ("u2", t0 + s, "signup"), ("u2", t0, "click"),
            ("u2", t0 + 2 * s, "purchase"),
            # u3: signup+click, no purchase
            ("u3", t0, "signup"), ("u3", t0 + s, "click"),
            # u4: purchase only -> never entered the funnel
            ("u4", t0, "purchase"),
            # u5: click at SAME ts as signup -> strict '>' excludes
            ("u5", t0, "signup"), ("u5", t0, "click"),
        ]
        ds = rd.from_pandas(pd.DataFrame(
            rows, columns=["user_id", "ts", "event_type"])).repartition(3)
        out = funnel_counts(ds, "user_id", "ts", "event_type",
                            stages=["signup", "click", "purchase"]).to_pandas()
        assert out["stage"].tolist() == ["signup", "click", "purchase"]
        assert out["n_users"].tolist() == [4, 2, 1]

    def test_matches_duckdb_on_sf_events(self, ray_session, sf_dir):
        import duckdb

        import ray.data as rd

        from verdictray.window import funnel_counts

        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "event_type"])
        out = funnel_counts(ds, "user_id", "ts", "event_type",
                            stages=["signup", "click", "purchase"]).to_pandas()
        exact = duckdb.sql(
            f"with m as (select user_id, "
            f"min(case when event_type='signup' then ts end) t0, "
            f"min(case when event_type='click' then ts end) t1, "
            f"min(case when event_type='purchase' then ts end) t2 "
            f"from '{sf_dir}/events.parquet' group by user_id) "
            f"select count(t0) n0, sum(case when t1>t0 then 1 else 0 end) n1, "
            f"sum(case when t1>t0 and t2>t1 then 1 else 0 end) n2 from m"
        ).fetchone()
        assert out["n_users"].tolist() == [int(x) for x in exact]


def test_ntile_agg_matches_duckdb_and_uneven_buckets(ray_session, sf_dir):
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.window import ntile_agg

    exact = duckdb.sql(f"""
        SELECT o_orderpriority, CAST(tile AS BIGINT) tile,
               CAST(count(*) AS BIGINT) n, CAST(sum(c) AS BIGINT) sum_value
        FROM (SELECT o_orderpriority,
                     CAST(round(o_totalprice * 100) AS BIGINT) c,
                     ntile(4) OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) tile
              FROM '{sf_dir}/orders.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    base = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderpriority", "o_totalprice",
                                    "o_orderkey"])

    def cents(b):
        import pyarrow as _pa
        import pyarrow.compute as _pc
        return _pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "c": _pc.cast(_pc.round(_pc.multiply(b["o_totalprice"], 100)),
                          _pa.int64()),
            "o_orderkey": b["o_orderkey"]})

    for blocks in (1, 6):
        ds = base.repartition(blocks).map_batches(cents,
                                                  batch_format="pyarrow")
        mine = (ntile_agg(ds, ["o_orderpriority"], "c", ["o_orderkey"], 4)
                .to_pandas().sort_values(["o_orderpriority", "tile"])
                .reset_index(drop=True))
        pdt.assert_frame_equal(mine[exact.columns], exact, check_dtype=False)

    # uneven split: 5 rows into 3 tiles → sizes 2,2,1 (SQL NTILE)
    tiny = rd.from_arrow(pa.table({"g": ["x"] * 5,
                                   "v": [10, 20, 30, 40, 50],
                                   "t": [1, 2, 3, 4, 5]}))
    out = (ntile_agg(tiny, ["g"], "v", ["t"], 3).to_pandas()
           .sort_values("tile").reset_index(drop=True))
    assert out["n"].tolist() == [2, 2, 1]
    assert out["sum_value"].tolist() == [30, 70, 50]
    # more tiles than rows: each row its own tile
    out2 = ntile_agg(tiny, ["g"], "v", ["t"], 9).to_pandas()
    assert sorted(out2["n"].tolist()) == [1] * 5


def test_chunked_hot_key_matches_duckdb_and_default(ray_session):
    """VERDICT r3 item 6 — the hot-key overflow path: ONE key holds
    almost every row (far more than any chunk), so the default
    bucket-by-key plan would put the whole stream in one task; the
    range-chunked two-pass plan must split it across chunk_ranges
    tasks and still match DuckDB exactly (and the default path)."""
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.window import cumulative_agg

    n = 20_000
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # 95% of rows share one hot key
        "k": np.where(rng.random(n) < 0.95, "hot",
                      rng.choice(["a", "b", "c"], size=n)),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86_400, size=n), unit="s"),
        "v": rng.integers(-50, 50, size=n).astype(np.int64),
    })
    exact = duckdb.sql("""
        select event_id, sum(v) over w as cum_sum,
               (row_number() over w)::BIGINT as row_idx
        from df window w as (partition by k order by ts, event_id
                             rows unbounded preceding)
        order by event_id""").df()

    base = rd.from_pandas(df).repartition(6)
    chunked = (cumulative_agg(base, key="k", ts_col="ts", value_col="v",
                              tiebreak=["event_id"], chunk_ranges=16)
               .to_pandas()[["event_id", "cum_sum", "row_idx"]]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(chunked, exact, check_dtype=False)

    default = (cumulative_agg(base, key="k", ts_col="ts", value_col="v",
                              tiebreak=["event_id"], buckets=4)
               .to_pandas()[["event_id", "cum_sum", "row_idx"]]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(default, exact, check_dtype=False)


def test_rolling_chunked_hot_key_matches_duckdb_and_default(ray_session):
    """rolling_agg's hot-key overflow path: a ROWS frame only reaches
    W-1 rows back, so range-chunking with a per-(key, chunk) VALUE-tail
    carry must reproduce the single-bucket result exactly — including
    min/max (which need the carried values, not just offsets) and frames
    that straddle several chunk boundaries (hot key >> chunk size)."""
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.window import rolling_agg

    n = 20_000
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # 95% of rows share one hot key; ts strictly increasing, so the
        # per-key (ts) ordering the contract requires is unique
        "k": np.where(rng.random(n) < 0.95, "hot",
                      rng.choice(["a", "b", "c"], size=n)),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.arange(n, dtype=np.int64), unit="s"),
        "v": rng.integers(-50, 50, size=n).astype(np.int64),
    })
    exact = duckdb.sql("""
        select event_id,
               (sum(v) over w)::DOUBLE as rolling_sum,
               avg(v) over w as rolling_mean,
               (min(v) over w)::DOUBLE as rolling_min,
               (max(v) over w)::DOUBLE as rolling_max,
               (count(*) over w)::DOUBLE as rolling_count
        from df window w as (partition by k order by ts
                             rows between 6 preceding and current row)
        order by event_id""").df()
    cols = ["event_id", "rolling_sum", "rolling_mean", "rolling_min",
            "rolling_max", "rolling_count"]
    aggs = ("sum", "mean", "min", "max", "count")

    base = rd.from_pandas(df).repartition(6)
    chunked = (rolling_agg(base, key="k", ts_col="ts", value_col="v",
                           window_rows=7, aggs=aggs, chunk_ranges=16)
               .to_pandas()[cols]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(chunked, exact, check_dtype=False)

    default = (rolling_agg(base, key="k", ts_col="ts", value_col="v",
                           window_rows=7, aggs=aggs, buckets=4)
               .to_pandas()[cols]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(default, exact, check_dtype=False)
    # schemas agree between the two plans (dtype restore after the
    # pad-concat promotion)
    assert list(chunked.dtypes) == list(default.dtypes)


def test_sessionize_chunked_hot_key_matches_duckdb_and_default(ray_session):
    """sessionize's hot-key overflow path: session numbering is a prefix
    property, so each chunk needs a carried boundary flag (gap to the
    key's last ts in ANY earlier chunk) + session-start offset. A
    95%-hot-key stream with tie timestamps and cross-chunk sessions must
    match DuckDB's lag()-based numbering and the default plan exactly —
    including sessions that SPAN chunk boundaries (bd=0 carry)."""
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.window import sessionize

    n = 20_000
    rng = np.random.default_rng(11)
    # increments 0..14 s (ties at 0); gap_s=8 → plenty of breaks AND
    # plenty of continuing runs, some straddling chunk boundaries
    ts = (pd.to_datetime("2024-01-01")
          + pd.to_timedelta(np.cumsum(rng.integers(0, 15, size=n)), unit="s"))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "k": np.where(rng.random(n) < 0.95, "hot",
                      rng.choice(["a", "b", "c"], size=n)),
        "ts": ts,
    })
    exact = duckdb.sql("""
        with d as (
          select *, case when lag(ts) over w is null
                           or ts - lag(ts) over w > interval '8' second
                         then 1 else 0 end brk
          from df window w as (partition by k order by ts, event_id)
        )
        select event_id,
               (sum(brk) over (partition by k order by ts, event_id
                               rows unbounded preceding))::BIGINT
                 as session_seq
        from d order by event_id""").df()

    base = rd.from_pandas(df).repartition(6)
    chunked = (sessionize(base, key="k", ts_col="ts", gap_s=8,
                          chunk_ranges=16)
               .to_pandas()[["event_id", "session_seq"]]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(chunked, exact, check_dtype=False)

    default = (sessionize(base, key="k", ts_col="ts", gap_s=8, buckets=4)
               .to_pandas()[["event_id", "session_seq"]]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(default, exact, check_dtype=False)


def test_consecutive_gaps_chunked_hot_key_matches_duckdb_and_default(
        ray_session):
    """consecutive_gaps's hot-key overflow path: lag(1) needs exactly one
    carried scalar per (key, chunk) — the key's max ts over earlier
    chunks, computed by an ordinary Max aggregate. Boundary rows (first
    row of a key in a chunk with a predecessor in an earlier chunk) must
    get the cross-chunk gap; stream-first rows must stay excluded."""
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.window import consecutive_gaps

    n = 20_000
    rng = np.random.default_rng(13)
    # MICROsecond-granularity increments: whole-second ns epochs are
    # multiples of 512 and survive a float64 round-trip exactly, so a
    # carry that leaks through float64 (>2^53) would NOT be caught by a
    # seconds-only stream — µs epochs are only multiples of 1000 and are
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "k": np.where(rng.random(n) < 0.95, "hot",
                      rng.choice(["a", "b", "c"], size=n)),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.cumsum(rng.integers(0, 10_000_001, size=n)),
                          unit="us"),
    })
    exact = duckdb.sql("""
        select event_id,
               epoch_ns(ts - lag(ts) over (partition by k
                                           order by ts, event_id))
                 as gap_ticks
        from df qualify gap_ticks is not null
        order by event_id""").df()
    # the events frame carries ns timestamps here, so native ticks = ns
    exact["gap_ticks"] = exact["gap_ticks"].astype(np.int64)

    base = rd.from_pandas(df).repartition(6)
    chunked = (consecutive_gaps(base, key="k", ts_col="ts",
                                tiebreak="event_id", attrs=["event_id"],
                                chunk_ranges=16)
               .to_pandas()[["event_id", "gap_ticks"]]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(chunked, exact, check_dtype=False)

    default = (consecutive_gaps(base, key="k", ts_col="ts",
                                tiebreak="event_id", attrs=["event_id"],
                                buckets=4)
               .to_pandas()[["event_id", "gap_ticks"]]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(default, exact, check_dtype=False)


def test_asof_chunked_hot_key_matches_duckdb_and_default(ray_session):
    """asof_join's hot-key overflow path: both sides chunk by left-ts
    range and each key's latest right row per chunk replicates forward
    up to its next right-bearing chunk, so left rows whose predecessor
    lives several chunks back (sparse right side) still match. Must
    equal DuckDB's ASOF LEFT JOIN and the key-bucketed plan — including
    left rows before any right row (nulls)."""
    import duckdb
    import ray.data as rd

    from verdictray.window import asof_join

    n = 20_000
    rng = np.random.default_rng(19)
    ldf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "k": np.where(rng.random(n) < 0.95, "hot",
                      rng.choice(["a", "b", "c"], size=n)),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.cumsum(rng.integers(0, 5, size=n)), unit="s"),
    })
    # sparse right side: ~1% of the left density, so most chunks have no
    # right rows for the cold keys and pads must carry several chunks
    m = 250
    rdf = pd.DataFrame({
        "k": np.where(rng.random(m) < 0.7, "hot",
                      rng.choice(["a", "b", "c"], size=m)),
        "rts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(-5_000, 90_000, size=m), unit="s"),
        "rval": np.arange(m, dtype=np.int64),
    })
    truth = duckdb.sql("""
        SELECT l.event_id, r.rts, r.rval
        FROM ldf l ASOF LEFT JOIN rdf r
          ON l.k = r.k AND l.ts >= r.rts
        ORDER BY l.event_id""").df()

    lds = rd.from_pandas(ldf).repartition(6)
    rds = rd.from_pandas(rdf).repartition(3)

    def canon(res):
        df = (res.to_pandas()[["event_id", "rts", "rval"]]
              .sort_values("event_id").reset_index(drop=True))
        df["rval"] = df["rval"].astype("float64")  # nulls comparable
        return df

    want = truth.copy()
    want["rval"] = want["rval"].astype("float64")

    chunked = canon(asof_join(lds, rds, on="k", ts_left="ts",
                              ts_right="rts", chunk_ranges=16))
    pd.testing.assert_frame_equal(chunked, want, check_dtype=False)

    default = canon(asof_join(lds, rds, on="k", ts_left="ts",
                              ts_right="rts", buckets=4))
    pd.testing.assert_frame_equal(default, want, check_dtype=False)
    assert chunked["rval"].isna().any()  # some pre-first-right nulls


def test_rolling_range_chunked_hot_key_matches_duckdb_and_default(
        ray_session):
    """rolling_range_agg's hot-key overflow path: a RANGE frame reaches
    back at most width_s, so rows REPLICATE as pads into later chunks
    whose windows they feed — no driver state. Frames straddling chunk
    boundaries (including equal-ts peers at a boundary) must match
    DuckDB's RANGE BETWEEN INTERVAL frame and the default plan."""
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.window import rolling_range_agg

    n = 20_000
    rng = np.random.default_rng(17)
    # increments 0..3 s with a 60 s frame: most frames hold dozens of
    # rows and many straddle a chunk boundary; 0-increments make peers
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "k": np.where(rng.random(n) < 0.95, "hot",
                      rng.choice(["a", "b", "c"], size=n)),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.cumsum(rng.integers(0, 4, size=n)), unit="s"),
        "v": rng.integers(-50, 50, size=n).astype(np.int64),
    })
    exact = duckdb.sql("""
        select event_id,
               (sum(v) over w)::BIGINT as rolling_sum,
               (count(*) over w)::BIGINT as rolling_count
        from df window w as (partition by k order by ts
                             range between interval '60' second preceding
                                   and current row)
        order by event_id""").df()
    cols = ["event_id", "rolling_sum", "rolling_count"]

    base = rd.from_pandas(df).repartition(6)
    chunked = (rolling_range_agg(base, key="k", ts_col="ts", value_col="v",
                                 width_s=60, aggs=("sum", "count"),
                                 chunk_ranges=16)
               .to_pandas()[cols]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(chunked, exact, check_dtype=False)

    default = (rolling_range_agg(base, key="k", ts_col="ts", value_col="v",
                                 width_s=60, aggs=("sum", "count"),
                                 buckets=4)
               .to_pandas()[cols]
               .sort_values("event_id").reset_index(drop=True))
    pdt.assert_frame_equal(default, exact, check_dtype=False)
