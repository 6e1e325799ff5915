"""Coverage for the remaining SURVEY.md §2 operators: normalize_lang,
deterministic sampling, anti-join, approx dedup filter, HLL intersection,
as_aggregate extension hook, estimates write path, calibration flow."""

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    from verdictray.corpus import generate_corpus

    return generate_corpus("/tmp/vr_corpus_test", 20_000, seed=42)


def test_normalize_lang():
    from verdictray.ops import normalize_lang

    t = pa.table({"lang": pa.array(["  Python ", "JS", "golang", "RUST"])})
    out = normalize_lang(t, aliases={"js": "javascript", "golang": "go"})
    assert out["lang"].to_pylist() == ["python", "javascript", "go", "rust"]


def test_deterministic_sample_reproducible_and_unbiased():
    from verdictray.ops import deterministic_sample

    vals = pa.table({"content_sha256": pa.array([f"{i:064x}" for i in range(20_000)])})
    s1 = deterministic_sample(vals, rate=0.1, seed=7)
    s2 = deterministic_sample(vals, rate=0.1, seed=7)
    assert s1["content_sha256"].to_pylist() == s2["content_sha256"].to_pylist()
    assert 0.08 <= len(s1) / 20_000 <= 0.12
    s3 = deterministic_sample(vals, rate=0.1, seed=8)
    assert s1["content_sha256"].to_pylist() != s3["content_sha256"].to_pylist()


def test_anti_join_bloom(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.query import anti_join_bloom

    import pyarrow.compute as pc

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    # restrict the build side to low custkeys so a real anti-set exists
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]) \
        .map_batches(lambda b: b.filter(pc.less(b["o_custkey"], 75)),
                     batch_format="pyarrow")
    non_members = anti_join_bloom(cust, orders, "c_custkey", "o_custkey",
                                  capacity=10_000, fpp=1e-3, concurrency=2)
    kept = set(non_members.to_pandas()["c_custkey"])
    true_non = set(
        r[0] for r in duckdb.sql(
            f"select c_custkey from '{sf_dir}/customer.parquet' c where not exists "
            f"(select 1 from '{sf_dir}/orders.parquet' o "
            f" where o.o_custkey = c.c_custkey and o.o_custkey < 75)"
        ).fetchall()
    )
    # kept rows are GUARANTEED non-matches; fp of the filter may drop a few
    assert kept <= true_non
    assert len(kept) >= 0.99 * len(true_non)


def test_approx_dedup_filter(ray_session):
    import ray.data as rd

    from verdictray.query import ApproxDedupFilter

    vals = [f"key{i % 100}" for i in range(1000)]  # 100 distinct, 10x dup
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)})).repartition(1)
    out = ds.map_batches(
        ApproxDedupFilter,
        fn_constructor_kwargs={"on": "k", "capacity": 10_000, "fpp": 1e-3},
        batch_format="pyarrow",
        concurrency=1,
        batch_size=None,
    ).to_pandas()
    kept = out["k"].tolist()
    # no duplicates survive; ~all 100 distinct keys kept (fp may drop ~0.1%)
    assert len(kept) == len(set(kept))
    assert len(kept) >= 99


def test_hll_intersection_estimate(ray_session):
    from verdictray.query import SketchStore
    from verdictray.sketches import HyperLogLog
    import pandas as pd

    a = HyperLogLog()
    b = HyperLogLog()
    a.update(np.array([f"x{i}" for i in range(10_000)], dtype=object))
    b.update(np.array([f"x{i}" for i in range(5_000, 15_000)], dtype=object))
    df = pd.DataFrame({"key": ["a", "b"], "hll_blob": [a.to_bytes(), b.to_bytes()]})
    store = SketchStore(df, key_col="key")
    inter = store.intersection_estimate("a", "b")
    assert abs(inter - 5_000) / 5_000 < 0.15  # documented high-variance estimator


def test_as_aggregate_extension_hook(ray_session, sf_dir):
    """User-extension surface: wrap a Sketch subclass via as_aggregate."""
    import ray.data as rd

    from verdictray.sketches import HyperLogLog
    from verdictray.udaf import as_aggregate

    agg = as_aggregate(HyperLogLog, on="user_id", alias_name="nd", p=12)
    row = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]).aggregate(agg)
    assert 10 <= row["nd"] <= 30  # 15 distinct users at sf0.001, 3sigma wide


def test_write_parquet_partitioned_commit_resume_and_buckets(
        ray_session, sf01_dir, tmp_path):
    """The resumable partitioned sink: per-partition _SUCCESS commit
    markers, skip-finished resume (rows of committed partitions filtered
    at the read), uncommitted-partial wipe, and hash-bucket mode."""
    import os
    import shutil

    import pandas as pd
    import ray.data as rd

    from verdictray.io import write_parquet_partitioned

    src = rd.read_parquet(f"{sf01_dir}/documents.parquet")
    orig = (src.to_pandas().sort_values("doc_id").reset_index(drop=True))
    out = str(tmp_path / "by_lang")

    res = write_parquet_partitioned(src, out, by="lang")
    assert res["skipped"] == [] and res["rows_written"] == len(orig)
    for d in res["written"]:
        assert os.path.exists(os.path.join(out, d, "_SUCCESS"))
    back = (rd.read_parquet(out).to_pandas()[orig.columns]
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, orig, check_dtype=False)

    # full resume: everything committed → nothing moves
    res2 = write_parquet_partitioned(src, out, by="lang")
    assert res2["written"] == [] and res2["rows_written"] == 0
    assert res2["skipped"] == res["written"]

    # crash simulation: one partition's marker gone + stale partial file
    victim = res["written"][0]
    os.remove(os.path.join(out, victim, "_SUCCESS"))
    with open(os.path.join(out, victim, "part-stale.parquet"), "w") as f:
        f.write("garbage from a crashed writer")
    res3 = write_parquet_partitioned(src, out, by="lang")
    assert res3["written"] == [victim]          # only the victim rewrote
    assert len(res3["skipped"]) == len(res["written"]) - 1
    assert not os.path.exists(os.path.join(out, victim,
                                           "part-stale.parquet"))
    back3 = (rd.read_parquet(out).to_pandas()[orig.columns]
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back3, orig, check_dtype=False)

    # resume=False ignores markers and rewrites everything
    res4 = write_parquet_partitioned(src, out, by="lang", resume=False)
    assert res4["skipped"] == [] and res4["rows_written"] == len(orig)

    # hash-bucket mode for high-cardinality keys; small files chunk
    out_b = str(tmp_path / "by_bucket")
    res_b = write_parquet_partitioned(src, out_b, by="doc_id", buckets=4,
                                      max_rows_per_file=50)
    assert sorted(res_b["written"]) == [f"bucket={i}" for i in range(4)]
    some_dir = os.path.join(out_b, res_b["written"][0])
    n_files = len([f for f in os.listdir(some_dir)
                   if f.endswith(".parquet")])
    assert n_files >= 2                          # 50-row chunking kicked in
    back_b = (rd.read_parquet(out_b).to_pandas()[orig.columns]
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back_b, orig, check_dtype=False)
    shutil.rmtree(out_b)


def test_write_estimates_roundtrip(ray_session, corpus, tmp_path):
    import pyarrow.parquet as pq

    from verdictray.pipeline import SketchJobSpec, build_sketches, finalize_estimates

    spec = SketchJobSpec(input_path=corpus, salts=4, bloom_capacity=50_000,
                         out_dir=str(tmp_path / "est"))
    build_sketches(spec)
    files = list((tmp_path / "est").glob("*.parquet"))
    assert files
    t = pq.read_table(str(tmp_path / "est"))
    assert {"group_key", "sketch_type", "metric", "estimate", "error_bound",
            "sketch"} <= set(t.schema.names)
    assert t.num_rows > 0
    # blobs survive the parquet round-trip
    from verdictray.sketches import Sketch

    hll_rows = t.filter(pa.compute.equal(t["sketch_type"], "hll")).to_pylist()
    sk = Sketch.from_bytes(hll_rows[0]["sketch"])
    assert sk.estimate() > 0


def test_calibration_acceptance(ray_session, corpus):
    """SURVEY.md §3.3: the full verification path on a deterministic slice."""
    from verdictray.calibrate import acceptance, calibration_report
    from verdictray.pipeline import SketchJobSpec

    spec = SketchJobSpec(input_path=corpus, salts=4, bloom_capacity=50_000)
    report = calibration_report(corpus, spec, sample_rate=0.3)
    assert len(report) >= 20  # ≥ 2 metrics × ~20 languages (some tiny keys drop)
    assert acceptance(report, min_within_rate=0.97), report[~report.within_bound]
    # CMS total_count must be exact per slice key
    cms_rows = report[report.metric == "total_count"]
    assert cms_rows.within_bound.all()


def test_hash_join_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.join import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, cust, "o_custkey", "c_custkey", buckets=8).to_pandas()
    exact = duckdb.sql(
        f"select o.o_orderkey, c.c_mktsegment from '{sf_dir}/orders.parquet' o "
        f"join '{sf_dir}/customer.parquet' c on o.o_custkey = c.c_custkey"
    ).df()
    assert len(joined) == len(exact)
    a = joined[["o_orderkey", "c_mktsegment"]].sort_values(["o_orderkey", "c_mktsegment"]).reset_index(drop=True)
    b = exact.sort_values(["o_orderkey", "c_mktsegment"]).reset_index(drop=True)
    assert (a.values == b.values).all()


def test_semi_anti_join_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.join import semi_anti_join

    import pyarrow.compute as _pc

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    # halve the right side so the anti result is non-empty
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]) \
        .map_batches(lambda b: b.filter(
            _pc.equal(_pc.bit_wise_and(b["o_custkey"], 1), 0)),
            batch_format="pyarrow", zero_copy_batch=True)
    for how, op in (("semi", ""), ("anti", "NOT")):
        got = semi_anti_join(cust, orders, "c_custkey", "o_custkey",
                             how=how, buckets=8).to_pandas()
        exact = duckdb.sql(
            f"select c_custkey, c_mktsegment from '{sf_dir}/customer.parquet' c "
            f"where {op} exists (select 1 from '{sf_dir}/orders.parquet' o "
            f"where o.o_custkey = c.c_custkey and o.o_custkey % 2 = 0)"
        ).df()
        assert len(exact) > 0, how
        assert len(got) == len(exact), how
        a = got.sort_values("c_custkey").reset_index(drop=True)
        b = exact.sort_values("c_custkey").reset_index(drop=True)
        assert (a["c_custkey"].values == b["c_custkey"].values).all(), how
        assert str(a["c_custkey"].dtype) == str(b["c_custkey"].dtype), how
    with pytest.raises(ValueError, match="semi.*anti"):
        semi_anti_join(cust, orders, "c_custkey", "o_custkey", how="left")


def test_line_stats_empty_batch():
    """Fully-filtered (empty) batches must pass through with the typed
    output schema — reduceat cannot take an empty slice list."""
    import pyarrow as pa

    from verdictray.text import with_line_stats

    out = with_line_stats(pa.table({"text": pa.array([], pa.string())}))
    assert len(out) == 0
    assert out.schema.field("n_lines").type == pa.int64()
    assert out.schema.field("dup_line_frac").type == pa.float64()


def test_line_stats_kernel_exact():
    """with_line_stats vs a per-row Python re-derivation."""
    import pyarrow as pa

    from verdictray.text import with_line_stats

    texts = ["a\nb\na", "", "x", "l1\nl1\nl1\nl1", "one\ntwo\nthree\n",
             "\n\n", "sameline"]
    batch = pa.table({"text": texts})
    out = with_line_stats(batch)
    for i, t in enumerate(texts):
        lines = t.split("\n")
        assert out["n_lines"][i].as_py() == len(lines), t
        dup = 1.0 - len(set(lines)) / len(lines)
        assert abs(out["dup_line_frac"][i].as_py() - dup) < 1e-12, t
        mean = sum(len(x) for x in lines) / len(lines)
        assert abs(out["mean_line_len"][i].as_py() - mean) < 1e-12, t


def test_hash_join_rejects_overlapping_columns(ray_session, sf_dir):
    import ray.data as rd

    from verdictray.join import hash_join

    a = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    b = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(a, b, "c_custkey", "c_custkey")


def test_sha256_all_string_layouts():
    """large_string/large_binary carry int64 offsets — reading them as int32
    silently hashed empty slices (ADVICE r1-high). Cover all four layouts,
    sliced chunks, chunked arrays, and nulls against hashlib."""
    import hashlib

    from verdictray.ops import sha256_hex_column

    vals = ["hello", "", "héllo wörld", "x" * 10_000]
    want = [hashlib.sha256(v.encode()).hexdigest() for v in vals]
    for t in (pa.string(), pa.large_string(), pa.binary(), pa.large_binary()):
        enc = "binary" in str(t)
        arr = pa.array([v.encode() if enc else v for v in vals], type=t)
        assert sha256_hex_column(arr).to_pylist() == want, t
        assert sha256_hex_column(arr.slice(1, 3)).to_pylist() == want[1:4], t
        chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 2)])
        assert sha256_hex_column(chunked).to_pylist() == want, t
        with_null = pa.array([vals[0].encode() if enc else vals[0], None], type=t)
        assert sha256_hex_column(with_null).to_pylist() == [want[0], None], t


def test_sketch_updater_empty_block():
    """Empty blocks are legal in Ray Data (empty fragments, filtered-out
    batches) — the updater must emit an empty table with the right schema
    instead of IndexError (ADVICE r1-medium)."""
    from verdictray.pipeline import SketchJobSpec, partial_blob_cols
    from verdictray.updater import SketchUpdater

    spec = SketchJobSpec(input_path="/unused", group_key="lang")
    empty = pa.table({
        "lang": pa.array([], pa.string()),
        "content_sha256": pa.array([], pa.string()),
        "n_bytes": pa.array([], pa.int64()),
        "n_lines": pa.array([], pa.int64()),
    })
    for salts in (0, 8):
        out = SketchUpdater(spec, salts=salts)(empty)
        assert len(out) == 0
        expect = [spec.group_key] + (["_salt"] if salts else []) \
            + list(partial_blob_cols(spec))
        assert out.schema.names == expect


def test_grouped_quantiles_exact_matches_duckdb(ray_session, sf_dir):
    """quantile_disc returns actual data values — bit-exact equality."""
    import duckdb
    import ray.data as rd

    from verdictray.ops import grouped_quantiles_exact

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    out = grouped_quantiles_exact(ds, keys=["l_returnflag"],
                                  value_col="l_extendedprice",
                                  phis=[0.1, 0.5, 0.9]).to_pandas()
    truth = duckdb.sql(f"""
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, [0.1, 0.5, 0.9]) AS qs
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
    """).df()
    want = {(r.l_returnflag, phi): r.qs[i]
            for r in truth.itertuples()
            for i, phi in enumerate([0.1, 0.5, 0.9])}
    got = {(r.l_returnflag, r.phi): r.est for r in out.itertuples()}
    assert got == want


def test_pivot_counts_matches_conditional_sql(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import pivot_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    out = pivot_counts(ds, keys=["user_id"], pivot_col="event_type",
                       categories=["click", "error"]).to_pandas() \
        .set_index("user_id").sort_index()
    truth = duckdb.sql(f"""
        SELECT user_id,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
        FROM '{sf_dir}/events.parquet' GROUP BY 1
    """).df().set_index("user_id").sort_index()
    assert (out["n_click"] == truth["n_click"]).all()
    assert (out["n_error"] == truth["n_error"]).all()


def test_read_corpus_any_formats_agree(ray_session, tmp_path):
    """csv and jsonl sources must yield the same rows as parquet, with
    column pruning applied (and validation failing fast on bad schema)."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from verdictray.io import read_corpus_any

    df = pd.DataFrame({
        "repo": ["r1", "r1", "r2"],
        "path": ["a.py", "b.py", "c.py"],
        "commit": ["c1", "c2", "c3"],
        "lang": ["py", "py", "go"],
        "content": ["print(1)", "print(2)", "package main"],
    })
    df.to_parquet(tmp_path / "c.parquet")
    df.to_csv(tmp_path / "c.csv", index=False)
    df.to_json(tmp_path / "c.jsonl", orient="records", lines=True)

    want = df[["lang", "content"]].sort_values("content").reset_index(drop=True)
    for fmt, fname in [("parquet", "c.parquet"), ("csv", "c.csv"),
                       ("jsonl", "c.jsonl")]:
        got = read_corpus_any(str(tmp_path / fname), fmt=fmt,
                              columns=["lang", "content"]) \
            .to_pandas().sort_values("content").reset_index(drop=True)
        assert sorted(got.columns) == ["content", "lang"], fmt
        assert got[["lang", "content"]].equals(want), fmt

    with pytest.raises(ValueError, match="missing"):
        read_corpus_any(str(tmp_path / "c.csv"), fmt="csv",
                        columns=["lang", "nope"])
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_corpus_any(str(tmp_path / "c.csv"), fmt="xml")


def test_count_matches_includes_zero_match_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from verdictray.join import count_matches

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4]}))
    right = rd.from_arrow(pa.table({"r": [2, 2, 2, 4, 7]}))
    got = (count_matches(left, right, "k", "r", buckets=4).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": [1, 2, 3, 4], "n_matches": [0, 3, 0, 1]})
    assert (got.values == want.values).all()


def test_grouped_corr_matches_numpy(ray_session, sf_dir):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from verdictray.ops import grouped_corr

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    got = grouped_corr(ds, ["l_returnflag"], "l_quantity", "l_extendedprice",
                       out_col="r", ndigits=6).to_pandas().set_index("l_returnflag")
    raw = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    for flag, g in raw.groupby("l_returnflag"):
        want = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
        assert abs(got.loc[flag, "r"] - want) < 1e-5
        assert got.loc[flag, "n"] == len(g)


def test_sample_sha_is_engine_portable_and_chunk_invariant(ray_session):
    import hashlib

    from verdictray.ops import sample_sha

    keys = list(range(1000))
    t = pa.table({"k": keys})
    kept = sample_sha(t, "k", "2")["k"].to_pylist()
    want = [k for k in keys
            if hashlib.sha256(str(k).encode()).hexdigest() < "2"]
    assert kept == want
    assert 0 < len(kept) < 1000
    # chunk-invariance: same membership regardless of batch boundaries
    parts = [sample_sha(t.slice(i, 100), "k", "2")["k"].to_pylist()
             for i in range(0, 1000, 100)]
    assert [k for p in parts for k in p] == want


def test_sample_per_group_is_block_invariant_and_matches_bruteforce(ray_session, sf_dir):
    import hashlib

    import pandas as pd
    import ray.data as rd

    from verdictray.ops import sample_per_group

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "doc_id"])
    want = (
        docs.assign(_sha=[hashlib.sha256(str(i).encode()).hexdigest()
                          for i in docs.doc_id])
        .sort_values(["lang", "_sha", "doc_id"])
        .groupby("lang", sort=True).head(7)[["lang", "doc_id"]]
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    for nblocks in (1, 5):
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["lang", "doc_id"],
                             override_num_blocks=nblocks)
        got = (sample_per_group(ds, "lang", "doc_id", 7).to_pandas()
               .sort_values(["lang", "doc_id"]).reset_index(drop=True))
        assert (got.values == want.values).all(), f"nblocks={nblocks}"


def test_with_regex_counts_flag_vs_count_semantics(ray_session):
    from verdictray.text import with_regex_counts

    t = pa.table({"s": ["aa aa aa", "bb", ""]})
    out = with_regex_counts(t, "s", {"n_aa": r"aa", "aa_flag": r"aa"})
    assert out["n_aa"].to_pylist() == [3, 0, 0]
    assert out["aa_flag"].to_pylist() == [1, 0, 0]


def test_grouped_moments_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import grouped_moments

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    mine = (grouped_moments(ds, ["l_returnflag"], "l_quantity", ndigits=4)
            .to_pandas().sort_values("l_returnflag").reset_index(drop=True))
    exact = duckdb.sql(
        f"select l_returnflag, count(*) as n, round(avg(l_quantity),4) as mean_v, "
        f"round(var_samp(l_quantity),4) as var_v, round(stddev_samp(l_quantity),4) as std_v, "
        f"round(skewness(l_quantity),4) as skew_v, round(kurtosis(l_quantity),4) as kurt_v "
        f"from '{sf_dir}/lineitem.parquet' group by 1 order by 1"
    ).df()
    pdt.assert_frame_equal(mine[exact.columns], exact, check_dtype=False)


def test_grouped_moments_tiny_groups_null_not_crash(ray_session):
    import ray.data as rd

    from verdictray.ops import grouped_moments

    # n=2: var defined, skew (needs n>=3) and kurt (n>=4) must be null
    ds = rd.from_arrow(pa.table({"k": ["a", "a", "b", "b", "b", "b"],
                                 "v": [1.0, 3.0, 1.0, 2.0, 4.0, 9.0]}))
    out = grouped_moments(ds, ["k"], "v").to_pandas().set_index("k")
    assert out.loc["a", "var_v"] == 2.0
    assert np.isnan(out.loc["a", "skew_v"]) and np.isnan(out.loc["a", "kurt_v"])
    assert np.isfinite(out.loc["b", "kurt_v"])


def test_extrema_per_group_min_and_block_invariance(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import extrema_per_group

    cols = ["event_type", "user_id", "event_id", "value"]
    base = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
    exact = duckdb.sql(
        f"select event_type, user_id, event_id, value from ("
        f"select *, row_number() over (partition by event_type "
        f"order by value asc, user_id, event_id) rn from "
        f"(select event_type, user_id, event_id, value from '{sf_dir}/events.parquet')) "
        f"where rn = 1 order by event_type"
    ).df()
    for blocks in (1, 7):
        ds = base.repartition(blocks)
        mine = (extrema_per_group(ds, ["event_type"], "value",
                                  ["user_id", "event_id"], mode="min")
                .to_pandas().sort_values("event_type").reset_index(drop=True))
        pdt.assert_frame_equal(mine[exact.columns], exact, check_dtype=False)


def test_histogram_fixed_negative_values_floor(ray_session):
    import ray.data as rd

    from verdictray.ops import histogram_fixed

    # floor (not truncation): -0.5 must land in bucket -1, not 0
    ds = rd.from_arrow(pa.table({"v": [-0.5, -10.0, 0.0, 9.99, 10.0, 25.0]}))
    out = histogram_fixed(ds, "v", width=10.0).to_pandas().set_index("bucket")
    assert out.loc[-1, "n"] == 2 and out.loc[0, "n"] == 2 and out.loc[1, "n"] == 1
    assert out.loc[2, "sum_value"] == 25.0
    assert out.loc[-1, "bucket_lo"] == -10.0


def test_hash_join_left_and_outer_match_duckdb(ray_session, sf_dir):
    import duckdb
    import pyarrow.compute as _pc
    import ray.data as rd

    from verdictray.join import hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    # halve the right side so unmatched LEFT rows exist; keep odd custkeys
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(lambda b: b.filter(
            _pc.equal(_pc.bit_wise_and(b["o_custkey"], 1), 1)),
            batch_format="pyarrow", zero_copy_batch=True)
    sql_right = (f"(select o_orderkey, o_custkey, o_totalprice from "
                 f"'{sf_dir}/orders.parquet' where o_custkey % 2 = 1)")
    for how, sql_how in (("left", "left"), ("outer", "full outer")):
        mine = hash_join(cust, orders, "c_custkey", "o_custkey",
                         buckets=8, how=how).to_pandas()
        exact = duckdb.sql(
            f"select c_custkey, c_mktsegment, o_orderkey, o_custkey, o_totalprice "
            f"from '{sf_dir}/customer.parquet' {sql_how} join {sql_right} o "
            f"on c_custkey = o_custkey"
        ).df()
        assert len(mine) == len(exact), how
        key = ["c_custkey", "o_orderkey"]
        a = mine[exact.columns].sort_values(key).reset_index(drop=True)
        b = exact.sort_values(key).reset_index(drop=True)
        pdt.assert_frame_equal(a.astype("object").where(a.notna(), None),
                               b.astype("object").where(b.notna(), None))


def test_set_op_all_modes_match_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from verdictray.ops import set_op

    la = pd.DataFrame({"k": ["a", "a", "b", "c", "c"], "v": [1, 1, 2, 3, 3]})
    rb = pd.DataFrame({"k": ["b", "c", "d"], "v": [2, 9, 4]})
    L = rd.from_pandas(la).repartition(2)
    R = rd.from_pandas(rb).repartition(2)
    duckdb.register("la", la)
    duckdb.register("rb", rb)
    for how, sql in (("intersect", "INTERSECT"), ("except_", "EXCEPT"),
                     ("union", "UNION")):
        mine = (set_op(L, R, ["k", "v"], how=how).to_pandas()
                .sort_values(["k", "v"]).reset_index(drop=True))
        exact = duckdb.sql(
            f"SELECT k, v FROM la {sql} SELECT k, v FROM rb "
            f"ORDER BY k, v").df()
        assert mine.values.tolist() == exact.values.tolist(), how


def test_grouped_quantiles_cont_interpolates(ray_session):
    import ray.data as rd

    from verdictray.ops import grouped_quantiles_cont

    ds = rd.from_arrow(pa.table({"k": ["g"] * 5, "v": [0.0, 1.0, 2.0, 3.0, 4.0]}))
    out = grouped_quantiles_cont(ds, ["k"], "v", [0.125, 0.5]).to_pandas()
    out = out.set_index("phi")
    # 0.125 of 4 intervals → 0.5 (between the 1st and 2nd order statistic)
    assert out.loc[0.125, "est"] == 0.5
    assert out.loc[0.5, "est"] == 2.0


def test_grouping_sets_matches_duckdb_rollup_and_cube(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import grouping_sets_counts

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])
    # explicit ROLLUP-shaped grouping sets (not the full cube)
    mine = grouping_sets_counts(
        ds, keys=["o_orderstatus", "o_orderpriority"],
        sets=[["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        value_col="o_totalprice").to_pandas()
    exact = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority, "
        f"CAST(grouping(o_orderstatus)*2 + grouping(o_orderpriority) AS BIGINT)"
        f" AS grouping_id, count(*) AS n, "
        f"sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS sum_value "
        f"FROM '{sf_dir}/orders.parquet' "
        f"GROUP BY ROLLUP (o_orderstatus, o_orderpriority)").df()
    key = ["grouping_id", "o_orderstatus", "o_orderpriority"]
    a = (mine[exact.columns].sort_values(key).reset_index(drop=True)
         .astype("object"))
    b = exact.sort_values(key).reset_index(drop=True).astype("object")
    pdt.assert_frame_equal(a.where(a.notna(), None), b.where(b.notna(), None))


def test_profile_numeric_matches_pandas_and_rounds_half_away(ray_session):
    import pandas as pd
    import ray.data as rd

    from verdictray.ops import profile_numeric

    df = pd.DataFrame({
        "a": [2.0, 3.0, None, 1.0],       # mean 2.0, one null
        "b": [1.5, 1.5, 2.5, 2.5],        # 2 distinct
    })
    out = (profile_numeric(rd.from_pandas(df).repartition(2), ["a", "b"])
           .to_pandas().set_index("column"))
    assert out.loc["a", "n"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3
    assert (out.loc["a", "min_v"], out.loc["a", "max_v"]) == (1.0, 3.0)
    assert out.loc["a", "mean_v"] == 2.0
    assert out.loc["b", "n_null"] == 0 and out.loc["b", "n_distinct"] == 2
    # half-away-from-zero rounding (SQL), not banker's: mean([2,3])=2.5
    out0 = (profile_numeric(rd.from_pandas(pd.DataFrame({"x": [2.0, 3.0]})),
                            ["x"], ndigits=0).to_pandas())
    assert out0.loc[0, "mean_v"] == 3.0


def test_profile_numeric_matches_duckdb_on_lineitem(ray_session, sf_dir):
    import duckdb
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.ops import profile_numeric

    cols = ["l_quantity", "l_extendedprice"]
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    mine = (profile_numeric(ds, cols).to_pandas()
            .sort_values("column").reset_index(drop=True))
    exact = duckdb.sql(" union all ".join(
        f"select '{c}' as \"column\", CAST(count(*) AS BIGINT) n, "
        f"CAST(sum(case when {c} is null then 1 else 0 end) AS BIGINT) n_null, "
        f"CAST(count(distinct {c}) AS BIGINT) n_distinct, "
        f"round(min({c}),4) min_v, round(max({c}),4) max_v, "
        f"round(avg({c}),4) mean_v from '{sf_dir}/lineitem.parquet'"
        for c in cols)).df().sort_values("column").reset_index(drop=True)
    pdt.assert_frame_equal(mine, exact, check_dtype=False)


def test_fit_transform_scaler_zscore_and_minmax(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from verdictray.ops import fit_scaler, transform_scaled

    x = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
    df = pd.DataFrame({"x": x, "flat": [7.0] * 5, "holey": [1.0, None, 3.0, None, 5.0]})
    ds = rd.from_pandas(df).repartition(3)
    stats = fit_scaler(ds, ["x", "flat", "holey"])
    assert stats["x"]["n"] == 5
    assert abs(stats["x"]["mean"] - x.mean()) < 1e-12
    assert abs(stats["x"]["std"] - x.std()) < 1e-9  # population std
    assert stats["holey"]["n"] == 3 and stats["holey"]["mean"] == 3.0

    z = (transform_scaled(ds, stats, ["x"], method="zscore", suffix="_z")
         .to_pandas().sort_values("x"))
    np.testing.assert_allclose(z["x_z"].to_numpy(),
                               (np.sort(x) - x.mean()) / x.std(), rtol=1e-12)
    mm = (transform_scaled(ds, stats, ["x", "flat"], method="minmax")
          .to_pandas().sort_values("x"))
    np.testing.assert_allclose(mm["x_scaled"].to_numpy(),
                               (np.sort(x) - 1.0) / 9.0, rtol=1e-12)
    # degenerate column (max == min) scales to null, never a zero-division
    assert mm["flat_scaled"].isna().all()


def test_sample_weighted_per_group_bias_and_block_invariance(ray_session):
    import pandas as pd
    import ray.data as rd

    from verdictray.ops import sample_weighted_per_group

    # 100 groups; in each, doc 0 has weight 10000 vs 1 for the other 19 —
    # E-S inclusion prob for the heavy item is ~1, so it must appear in
    # nearly every group's sample (statistical property, deterministic
    # under the sha-derived uniforms)
    rows = []
    for g in range(100):
        for i in range(20):
            rows.append((f"g{g}", g * 100 + i, 10_000.0 if i == 0 else 1.0))
    df = pd.DataFrame(rows, columns=["grp", "id", "w"])
    ds = rd.from_pandas(df).repartition(7)
    out = sample_weighted_per_group(ds, "grp", "id", "w", k=3).to_pandas()
    assert (out.groupby("grp").size() == 3).all()
    heavy_hits = (out["id"] % 100 == 0).sum()
    assert heavy_hits >= 95, heavy_hits

    # block-layout invariance: same rows regardless of partitioning
    out1 = (sample_weighted_per_group(rd.from_pandas(df), "grp", "id", "w",
                                      k=3).to_pandas()
            .sort_values(["grp", "id"]).reset_index(drop=True))
    out7 = out.sort_values(["grp", "id"]).reset_index(drop=True)
    assert out1.equals(out7)

    # zero/null weights are never sampled
    df2 = pd.DataFrame({"grp": ["a"] * 4, "id": [1, 2, 3, 4],
                        "w": [0.0, None, -1.0, 5.0]})
    out2 = sample_weighted_per_group(rd.from_pandas(df2), "grp", "id", "w",
                                     k=10).to_pandas()
    assert out2["id"].tolist() == [4]


def test_split_by_hash_disjoint_exhaustive_and_proportional(ray_session):
    import pandas as pd
    import ray.data as rd

    from verdictray.ops import split_by_hash

    df = pd.DataFrame({"id": range(20_000)})
    ds = rd.from_pandas(df).repartition(5)
    out = split_by_hash(ds, "id",
                        {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    # exhaustive: every row assigned exactly one split
    assert len(out) == 20_000 and out["split"].notna().all()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # stable: identical assignment under a different layout
    out1 = (split_by_hash(rd.from_pandas(df), "id",
                          {"train": 0.8, "val": 0.1, "test": 0.1})
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert out1.equals(out.sort_values("id").reset_index(drop=True))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_by_hash(ds, "id", {"a": 0.5, "b": 0.4})


def test_unpivot_matches_pandas_melt(ray_session):
    import pandas as pd
    import pandas.testing as pdt
    import ray.data as rd

    from verdictray.ops import unpivot, unpivot_keep_nulls

    df = pd.DataFrame({"k": ["a", "b", "c"], "x": [1.0, None, 3.0],
                       "y": [4.0, 5.0, 6.0]})
    ds = rd.from_pandas(df).repartition(2)
    out = (unpivot(ds, ["k"], ["x", "y"]).to_pandas()
           .sort_values(["k", "name"]).reset_index(drop=True))
    ref = (df.melt(id_vars=["k"], value_vars=["x", "y"], var_name="name")
           .dropna(subset=["value"])
           .sort_values(["k", "name"]).reset_index(drop=True))
    pdt.assert_frame_equal(out, ref)
    withnulls = unpivot_keep_nulls(ds, ["k"], ["x", "y"]).to_pandas()
    assert len(withnulls) == 6 and withnulls["value"].isna().sum() == 1


def test_topk_per_group_matches_duckdb_and_block_invariant(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import topk_per_group

    cols = ["o_orderpriority", "o_totalprice", "o_orderkey"]
    base = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
    exact = duckdb.sql(
        f"select o_orderpriority, o_totalprice, o_orderkey from ("
        f"select *, row_number() over (partition by o_orderpriority "
        f"order by o_totalprice desc, o_orderkey) rn from "
        f"'{sf_dir}/orders.parquet') where rn <= 3 "
        f"order by o_orderpriority, o_totalprice desc, o_orderkey"
    ).df()
    for blocks in (1, 7):
        ds = base.repartition(blocks)
        mine = (topk_per_group(ds, ["o_orderpriority"], "o_totalprice",
                               ["o_orderkey"], k=3)
                .to_pandas()
                .sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                             ascending=[True, False, True])
                .reset_index(drop=True))
        pdt.assert_frame_equal(mine[exact.columns], exact, check_dtype=False)


def test_bucket_joins_exact_above_2_53(ray_session):
    """Regression: the bucketed joins must compare int64 keys exactly.
    The pandas union-padding path promoted int64 → float64, which rounds
    above 2^53 — keys differing only in the low ~11 bits (e.g. 64-bit
    span/fingerprint hashes that mix a small group discriminator into the
    low bits) then compared equal and fabricated matches."""
    import ray.data as rd

    from verdictray.join import hash_join, semi_anti_join

    base = (1 << 62) + (1 << 20)
    # left keys k, k+5: float64-identical at this magnitude, int-distinct
    left = rd.from_arrow(pa.table({
        "k": pa.array([base, base + 5, 12345], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([base, 99], pa.int64()),
        "w": pa.array([10, 20], pa.int64())}))

    semi = semi_anti_join(left, right, "k", "rk", how="semi").to_pandas()
    assert semi["k"].tolist() == [base]          # k+5 must NOT match
    anti = semi_anti_join(left, right, "k", "rk", how="anti").to_pandas()
    assert sorted(anti["k"].tolist()) == [12345, base + 5]

    j = hash_join(left, right, "k", "rk").to_pandas()
    assert j["k"].tolist() == [base] and j["w"].tolist() == [10]
    lj = hash_join(left, right, "k", "rk", how="left").to_pandas()
    assert sorted(lj["k"].tolist()) == [12345, base, base + 5]
    matched = lj.loc[lj["k"] == base, "w"]
    assert matched.tolist() == [10]
    assert lj.loc[lj["k"] == base + 5, "w"].isna().all()
    # exact values survive the non-inner join's nullable-int path
    assert lj["k"].tolist() == [int(x) for x in lj["k"].tolist()]


def test_grouped_linreg_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import grouped_linreg

    exact = duckdb.sql(
        f"select l_returnflag, count(*)::BIGINT n, "
        f"round(regr_slope(l_extendedprice, l_quantity), 6) slope, "
        f"round(regr_intercept(l_extendedprice, l_quantity), 6) intercept, "
        f"round(regr_r2(l_extendedprice, l_quantity), 6) r2 "
        f"from '{sf_dir}/lineitem.parquet' group by 1 order by 1").df()
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"]).repartition(5)
    mine = (grouped_linreg(ds, ["l_returnflag"], "l_quantity",
                           "l_extendedprice")
            .to_pandas().sort_values("l_returnflag").reset_index(drop=True))
    pdt.assert_frame_equal(mine[exact.columns], exact, check_dtype=False)
    # degenerate group: constant x ⇒ slope/r2 NULL like regr_slope
    tiny = rd.from_arrow(pa.table({"g": ["a", "a"], "x": [2.0, 2.0],
                                   "y": [1.0, 3.0]}))
    t = grouped_linreg(tiny, ["g"], "x", "y").to_pandas()
    assert t["slope"].isna().all() and t["r2"].isna().all()


def test_mix_by_weights_rates_and_determinism(ray_session):
    import ray.data as rd

    from verdictray.ops import frac_to_hex_threshold, mix_by_weights

    assert frac_to_hex_threshold(1.0) == "g"
    assert frac_to_hex_threshold(0.5) == "80000000"
    assert frac_to_hex_threshold(0.0) == "00000000"

    n = 4000
    df = pd.DataFrame({"id": range(n),
                       "g": ["a", "b", "c", "d"] * (n // 4)})
    ds = rd.from_pandas(df)
    w = {"a": 1.0, "b": 0.5, "c": 0.0}     # d falls to default=0.25
    out = mix_by_weights(ds, "g", "id", w, default=0.25).to_pandas()
    got = out.groupby("g").size().reindex(list("abcd"), fill_value=0)
    assert got["a"] == n // 4                  # keep-all is exact
    assert got["c"] == 0                       # keep-none is exact
    assert abs(got["b"] / (n // 4) - 0.5) < 0.08   # sha-uniform rate
    assert abs(got["d"] / (n // 4) - 0.25) < 0.08
    # reshard-stable: identical row set under a different block layout
    out2 = mix_by_weights(ds.repartition(7), "g", "id", w,
                          default=0.25).to_pandas()
    assert sorted(out2["id"]) == sorted(out["id"])


def test_mode_per_group_ties_and_block_invariance(ray_session):
    import ray.data as rd

    from verdictray.ops import mode_per_group

    # group a: clear mode 5; group b: tie between 1 and 2 → smallest wins
    df = pd.DataFrame({"k": list("aaaabbbb"),
                       "v": [5, 5, 5, 9, 2, 2, 1, 1]})
    for blocks in (1, 5):
        out = (mode_per_group(rd.from_pandas(df).repartition(blocks),
                              ["k"], "v")
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert out["v"].tolist() == [5, 1]
        assert out["n"].tolist() == [3, 2]


def test_mix_by_weights_upsampling_epochs(ray_session):
    import ray.data as rd

    from verdictray.ops import mix_by_weights

    n = 2000
    df = pd.DataFrame({"id": range(n), "g": ["a", "b"] * (n // 2)})
    ds = rd.from_pandas(df)
    out = mix_by_weights(ds, "g", "id", {"a": 2.0, "b": 2.5},
                         epoch_col="epoch").to_pandas()
    per = out.groupby("g").size()
    assert per["a"] == n                      # exactly 2 copies each
    frac_b = per["b"] / (n // 2) - 2.0        # 2 copies + ~50% third
    assert abs(frac_b - 0.5) < 0.1
    # per-row copy counts are 2 or 3, epoch indices are 0..copies-1
    cc = out.groupby(["g", "id"]).agg(n=("epoch", "size"),
                                      mx=("epoch", "max"))
    assert set(cc.loc["a", "n"]) == {2} and set(cc.loc["b", "n"]) <= {2, 3}
    assert (cc["mx"] == cc["n"] - 1).all()
    # reshard-stable multiset
    out2 = mix_by_weights(ds.repartition(7), "g", "id", {"a": 2.0, "b": 2.5},
                          epoch_col="epoch").to_pandas()
    k = ["g", "id", "epoch"]
    assert out.sort_values(k).reset_index(drop=True)[k].equals(
        out2.sort_values(k).reset_index(drop=True)[k])


def test_string_agg_per_group_order_and_sep(ray_session):
    import ray.data as rd

    from verdictray.ops import string_agg_per_group

    df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                       "v": ["x", "y", "z", "q"],
                       "o": [2, 1, 3, 1]})
    for blocks in (1, 4):
        out = (string_agg_per_group(rd.from_pandas(df).repartition(blocks),
                                    ["k"], "v", ["o"], [True], sep="|")
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert out["agg"].tolist() == ["z|x|y", "q"]


def test_with_row_number_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from verdictray.ops import with_row_number

    exact = duckdb.sql(
        f"select o_orderkey, row_number() over (order by o_totalprice desc, "
        f"o_orderkey)::BIGINT rn from '{sf_dir}/orders.parquet' "
        f"order by o_orderkey").df()
    base = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"])
    for blocks in (1, 9):
        out = (with_row_number(base.repartition(blocks), "o_totalprice",
                               ["o_orderkey"], descending=True,
                               out_col="rn", ranges=7)
               .to_pandas().sort_values("o_orderkey")
               .reset_index(drop=True))
        pdt.assert_frame_equal(out[["o_orderkey", "rn"]], exact,
                               check_dtype=False)
    # ascending + duplicate order values crossing a boundary
    df = pd.DataFrame({"k": [5, 5, 5, 5, 1, 9], "t": [6, 5, 4, 3, 2, 1]})
    out = (with_row_number(rd.from_pandas(df), "k", ["t"], ranges=3,
                           out_col="rn")
           .to_pandas().sort_values("rn"))
    assert out["k"].tolist() == [1, 5, 5, 5, 5, 9]
    assert out["t"].tolist() == [2, 3, 4, 5, 6, 1]
    assert out["rn"].tolist() == [1, 2, 3, 4, 5, 6]


def test_rank_table_ties_and_gaps(ray_session):
    import ray.data as rd

    from verdictray.ops import rank_table

    df = pd.DataFrame({"v": [10, 10, 10, 20, 30, 30]})
    out = (rank_table(rd.from_pandas(df).repartition(3), "v")
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["n"].tolist() == [3, 1, 2]
    assert out["dense_rank"].tolist() == [1, 2, 3]
    assert out["rank"].tolist() == [1, 4, 5]          # gaps after ties
    assert out["percent_rank"].tolist() == [0.0, 3 / 5, 4 / 5]
