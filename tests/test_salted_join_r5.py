"""Round-5 hot-key salting in hash_join: a 95%-hot key spreads over
``salt`` sub-buckets (no single-task pile-up) while the result stays
exactly DuckDB's join, for inner and left."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _canon(df):
    df = df[sorted(df.columns)]
    return (df.sort_values(by=list(df.columns)).reset_index(drop=True)
            .astype("float64"))


@pytest.fixture(scope="module")
def skewed():
    rng = np.random.default_rng(3)
    lk = np.where(rng.random(20_000) < 0.95, 7,
                  rng.integers(0, 50, 20_000))
    left = pd.DataFrame({"k": lk.astype(np.int64),
                         "lv": np.arange(20_000, dtype=np.int64)})
    rk = np.concatenate([np.full(5, 7), np.arange(0, 60)])
    right = pd.DataFrame({"rk": rk.astype(np.int64),
                          "rv": np.arange(len(rk), dtype=np.int64)})
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("salt", [1, 8])
def test_salted_join_matches_duckdb(ray_session, skewed, how, salt):
    import ray.data as rd

    from verdictray.join import hash_join

    left_df, right_df = skewed
    want = _canon(duckdb.sql(
        f"SELECT * FROM left_df {how.upper()} JOIN right_df "
        "ON k = rk").df())
    got = _canon(hash_join(rd.from_pandas(left_df).repartition(8),
                           rd.from_pandas(right_df).repartition(2),
                           "k", "rk", buckets=4, how=how,
                           salt=salt).to_pandas())
    assert got.shape == want.shape
    assert np.allclose(got.fillna(-1).to_numpy(),
                       want.fillna(-1).to_numpy())


def test_salt_spreads_hot_key_and_rejects_right(ray_session, skewed):
    import pyarrow as pa
    import ray.data as rd

    from verdictray.join import _tag_salted_left, hash_join

    left_df, right_df = skewed
    # the salted left tag must spread the hot key's rows over `salt`
    # distinct buckets (the unsalted tag puts them all in one)
    fn = _tag_salted_left("k", 4, 8,
                          [("k", pa.int64()), ("lv", pa.int64())])
    tagged = fn(pa.table(left_df))
    hot = tagged.filter(pa.compute.equal(tagged["k"], 7))
    n_buckets = len(pa.compute.unique(hot["_bucket"]))
    assert n_buckets == 8
    # per-bucket left volume shrinks ~salt x
    counts = pa.compute.value_counts(hot["_bucket"]).to_pylist()
    assert max(c["counts"] for c in counts) < 0.2 * len(hot)

    with pytest.raises(ValueError, match="inner.*left|left.*inner"):
        hash_join(rd.from_pandas(left_df), rd.from_pandas(right_df),
                  "k", "rk", how="right", salt=8)
