"""Distributed partitioned hash join (ray_guide.md "Both sides large").

The portable bucket pattern: add ``_bucket = hash64(key) % B`` to BOTH
sides, tag each side, union, ``groupby(_bucket)`` (one shuffle moves each
row exactly once), and join matching buckets pairwise with a pandas merge
inside ``map_groups``. Works on any Ray version (no dependency on the
native ``Dataset.join``), and the partitioning is explicit — B and the
skew strategy are caller-visible knobs.

Constraints (documented, checked):
- column names of the two sides must be disjoint (TPC-H-style prefixes);
- a single bucket must fit in one task's memory → size B so
  max(side bytes)/B is a few hundred MB; salt hot KEYS into sub-buckets
  by raising B (bucket id is derived from the key hash, so a single hot
  key still lands in one bucket — for pathological single-key skew use a
  broadcast join on the small side instead, query.semi_join_bloom /
  the nation-lookup pattern in entry_queries).

Small-side joins should use the broadcast pattern instead (no shuffle):
see entry_queries.q_customer_nations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketches.hashing import hash64


def _tag(side: str, on: str, buckets: int, all_cols: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        bucket = (hash64(batch[on], seed=17) % np.uint64(buckets)).astype(np.int64)
        batch = batch.append_column("_bucket", pa.array(bucket))
        batch = batch.append_column("_side", pa.array([side] * len(batch), pa.string()))
        # align to the union schema: missing columns become typed nulls
        for name, typ in all_cols:
            if name not in batch.schema.names:
                batch = batch.append_column(name, pa.nulls(len(batch), typ))
        return batch.select([n for n, _ in all_cols] + ["_bucket", "_side"])

    return fn


def hash_join(left, right, left_on: str, right_on: str, buckets: int = 32,
              how: str = "inner"):
    """Bucketed hash join of two Datasets → Dataset of joined rows.

    One groupby shuffle total; each bucket joins via pandas merge in a
    map_groups task. Column names must be disjoint across sides.
    """
    lschema = left.schema()
    rschema = right.schema()
    overlap = set(lschema.names) & set(rschema.names)
    if overlap:
        raise ValueError(f"hash_join requires disjoint column names; shared: {overlap}")
    all_cols = list(zip(lschema.names, lschema.types)) + list(
        zip(rschema.names, rschema.types)
    )
    lt = left.map_batches(_tag("l", left_on, buckets, all_cols),
                          batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_tag("r", right_on, buckets, all_cols),
                           batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)

    lcols = list(lschema.names)
    rcols = list(rschema.names)

    int_cols = {n for n, t in all_cols if pa.types.is_integer(t)}

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["_side"] == "l"][lcols]
        rrows = g[g["_side"] == "r"][rcols]
        out = lrows.merge(rrows, left_on=left_on, right_on=right_on, how=how)
        # the union's typed-null padding makes pandas promote int columns
        # to float64 in the group block; restore the declared integer
        # dtypes (nullable Int64 → Arrow int64) or downstream consumers —
        # including a second hash_join keyed on these columns — see floats
        for name in out.columns:
            if name in int_cols and out[name].dtype.kind == "f":
                # plain int64 when null-free — the nullable extension dtype
                # would leak into result schemas (Int64 vs int64)
                out[name] = out[name].astype(
                    "int64" if out[name].notna().all() else "Int64")
        return out

    return unioned.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def count_matches(left, right, left_on: str, right_on: str, buckets: int = 32):
    """LEFT-join match count per left key: Dataset of (left_on, n_matches),
    one row per distinct left key, n_matches = 0 when the right side has no
    matching row (SQL ``LEFT JOIN .. GROUP BY left_on`` with
    ``count(right_key)``).

    Distributed shape: the aggregation is FUSED into the join bucket — both
    sides are bucketed by key hash (one shuffle total), and inside each
    bucket the right side collapses to per-key counts via one vectorized
    value_counts before mapping onto the left keys. Nothing resembling the
    joined row set is ever materialized, so a 1:N key with millions of
    matches costs O(N) ints in one task, not N output rows + a second
    shuffle."""
    lt = (left.select_columns([left_on])
          .map_batches(_count_tag("l", left_on, buckets),
                       batch_format="pyarrow", zero_copy_batch=True))
    rt = (right.select_columns([right_on])
          .map_batches(_count_tag("r", right_on, buckets),
                       batch_format="pyarrow", zero_copy_batch=True))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lkeys = g.loc[g["_side"] == "l", "_key"].unique()
        rcounts = g.loc[g["_side"] == "r", "_key"].value_counts()
        n = rcounts.reindex(lkeys, fill_value=0).to_numpy(dtype=np.int64)
        return pd.DataFrame({left_on: lkeys, "n_matches": n})

    return (lt.union(rt).groupby("_bucket")
            .map_groups(count_bucket, batch_format="pandas"))


def semi_anti_join(left, right, left_on: str, right_on: str,
                   how: str = "semi", buckets: int = 32):
    """Exact distributed semi/anti join: left rows whose key IS ("semi") /
    is NOT ("anti") present in the right side — SQL ``WHERE [NOT] EXISTS``.

    The exact counterpart of the approximate Bloom filter pair
    (query.semi_join_bloom / anti_join_bloom): same single-shuffle bucket
    pattern as hash_join, but the right side is projected to its key
    column at the map stage and collapsed to the bucket's distinct-key set
    before probing, so no joined row set and no right payload ever
    materialize — the shuffle carries left rows + right keys only. Use the
    Bloom pair when a ~fpp false-match rate is acceptable and the right
    side is huge; use this when the answer must be exact (e.g. eval-set
    decontamination of a training corpus)."""
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi' or 'anti', got {how!r}")
    lschema = left.schema()
    if "_rkey" in lschema.names:
        raise ValueError("left side may not carry a '_rkey' column")
    rschema = right.schema()
    rkey_type = dict(zip(rschema.names, rschema.types))[right_on]
    all_cols = list(zip(lschema.names, lschema.types)) + [("_rkey", rkey_type)]
    lt = left.map_batches(_tag("l", left_on, buckets, all_cols),
                          batch_format="pyarrow", zero_copy_batch=True)

    def project_right(batch: pa.Table) -> pa.Table:
        return pa.table({"_rkey": batch[right_on]})

    rt = (right.map_batches(project_right, batch_format="pyarrow",
                            zero_copy_batch=True)
          .map_batches(_tag("r", "_rkey", buckets, all_cols),
                       batch_format="pyarrow", zero_copy_batch=True))

    lcols = list(lschema.names)
    keep = how == "semi"
    int_cols = {n for n, t in zip(lschema.names, lschema.types)
                if pa.types.is_integer(t)}

    def probe_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g.loc[g["_side"] == "l", lcols]
        rkeys = g.loc[g["_side"] == "r", "_rkey"].unique()
        mask = lrows[left_on].isin(rkeys)
        out = lrows[mask if keep else ~mask]
        # the union's typed-null padding (right rows carry nulls in left
        # columns) promotes ints to float64 in the group block; the left
        # rows themselves are null-free, so restore the declared dtypes
        for name in int_cols:
            if out[name].dtype.kind == "f":
                out = out.assign(**{name: out[name].astype("int64")})
        return out

    return (lt.union(rt).groupby("_bucket")
            .map_groups(probe_bucket, batch_format="pandas"))


def _count_tag(side: str, on: str, buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        bucket = (hash64(batch[on], seed=17) % np.uint64(buckets)).astype(np.int64)
        return pa.table({
            "_key": batch[on],
            "_bucket": pa.array(bucket),
            "_side": pa.array([side] * len(batch), pa.string()),
        })

    return fn
