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
  max(side bytes)/B is a few hundred MB. Bucket id derives from the key
  hash, so a single hot key lands its whole row set in one bucket; pass
  ``hash_join(..., salt=N)`` to round-robin the LEFT side's rows over N
  sub-buckets (the right side replicates into all N) — or use a
  broadcast join when the small side fits memory (broadcast_expand_join
  / query.semi_join_bloom / the nation-lookup pattern).

Small-side joins should use the broadcast pattern instead (no shuffle):
see entry_queries.q_customer_nations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketches.hashing import hash64


def _arrow_type(t) -> pa.DataType:
    """Normalize a Dataset.schema() type to pyarrow: pandas-block datasets
    report numpy dtypes (object → string, the pandas text convention)."""
    if isinstance(t, pa.DataType):
        return t
    if t is object or t == np.object_:
        return pa.string()
    return pa.from_numpy_dtype(t)


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
              how: str = "inner", left_schema=None, right_schema=None,
              salt: int = 1):
    """Bucketed hash join of two Datasets → Dataset of joined rows.

    One groupby shuffle total; each bucket joins via pandas merge in a
    map_groups task. Column names must be disjoint across sides.

    ``left_schema`` / ``right_schema``: pass a known schema (pyarrow or
    Ray Data Schema — anything with .names/.types) when the side is a
    LAZY pipeline whose schema the caller already knows. Calling
    ``Dataset.schema()`` on a lazy shuffle output EXECUTES the upstream
    plan at build time and then re-runs it on consumption — a chained
    join pays every upstream shuffle twice without this.

    ``salt``: hot-KEY skew escape hatch. The bucket id derives from the
    key hash, so a single hot key normally lands its entire row set in
    ONE bucket/task. With ``salt=N`` every left row scatters round-robin
    into one of N sub-buckets of its key bucket (per-batch ``arange % N``
    — any assignment is correct, each left row still meets the full
    right key group) and every RIGHT row replicates into all N, so the
    per-task left volume drops N× at the cost of N× the right side's
    shuffle bytes. Use when the LEFT side is the large skewed one and
    the right side is modest. Valid for how="inner"/"left" (a salted
    right side would emit unmatched right rows N times)."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if salt > 1 and how not in ("inner", "left"):
        raise ValueError(f"salt > 1 supports how='inner'/'left' only "
                         f"(got {how!r}): replicated right rows would "
                         "duplicate right-preserved output")
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    if lschema is None or rschema is None:
        # a side is empty with no typed blocks, so the joined schema cannot
        # be constructed. An empty result is only CORRECT when the empty
        # side drives the join (inner, or the preserved side is the empty
        # one); for any join that must preserve rows of the non-empty side
        # we cannot synthesize the null-padded columns — refuse loudly
        # instead of silently dropping those rows.
        empty_is_correct = (
            how == "inner"
            or (how == "left" and lschema is None)
            or (how == "right" and rschema is None)
        )
        if not empty_is_correct:
            raise ValueError(
                f"hash_join(how={how!r}): the "
                f"{'left' if lschema is None else 'right'} side is empty "
                "with no schema; the preserved side's rows cannot be "
                "null-padded. Materialize a typed empty side or use an "
                "inner join.")
        return left.limit(0) if lschema is not None else left
    overlap = set(lschema.names) & set(rschema.names)
    if overlap:
        raise ValueError(f"hash_join requires disjoint column names; shared: {overlap}")
    all_cols = [(n, _arrow_type(t))
                for n, t in list(zip(lschema.names, lschema.types))
                + list(zip(rschema.names, rschema.types))]
    if salt == 1:
        lt = left.map_batches(_tag("l", left_on, buckets, all_cols),
                              batch_format="pyarrow", zero_copy_batch=True)
        rt = right.map_batches(_tag("r", right_on, buckets, all_cols),
                               batch_format="pyarrow", zero_copy_batch=True)
    else:
        lt = left.map_batches(
            _tag_salted_left(left_on, buckets, salt, all_cols),
            batch_format="pyarrow", zero_copy_batch=True)
        rt = right.map_batches(
            _tag_replicated_right(right_on, buckets, salt, all_cols),
            batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)

    lcols = list(lschema.names)
    rcols = list(rschema.names)

    int_cols = {n for n, t in all_cols if pa.types.is_integer(t)}

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        # split the sides at the ARROW level: converting the padded union
        # block to pandas first would promote int64 columns (typed nulls →
        # float64) and silently round values above 2^53 — fatal for
        # 64-bit hash/fingerprint join keys. Side-filtered tables carry no
        # padding nulls, so each side converts exactly.
        side = g["_side"]
        lrows = g.filter(pc.equal(side, "l")).select(lcols).to_pandas()
        rrows = g.filter(pc.equal(side, "r")).select(rcols).to_pandas()
        if how != "inner":
            # non-inner joins introduce missing values on the unmatched
            # side; pre-convert ints to the nullable extension dtype so
            # the merge emits <NA> instead of float-promoting (exactness
            # above 2^53 — including the key columns themselves)
            for df in (lrows, rrows):
                for name in df.columns:
                    if name in int_cols:
                        df[name] = df[name].astype("Int64")
        out = lrows.merge(rrows, left_on=left_on, right_on=right_on, how=how)
        for name in out.columns:
            # plain int64 when null-free — the nullable extension dtype
            # would leak into result schemas (Int64 vs int64)
            if name in int_cols and out[name].dtype != np.int64 \
                    and out[name].notna().all():
                out[name] = out[name].astype("int64")
        return out

    return unioned.groupby("_bucket").map_groups(join_bucket,
                                                 batch_format="pyarrow")


def _tag_salted_left(on: str, buckets: int, salt: int,
                     all_cols: list[tuple]):
    """Left-side tag for the salted join: ``_bucket = key_bucket * salt
    + (arange % salt)`` — each left row lands in exactly ONE sub-bucket,
    so a hot key's rows spread over ``salt`` tasks."""

    def fn(batch: pa.Table) -> pa.Table:
        base = (hash64(batch[on], seed=17)
                % np.uint64(buckets)).astype(np.int64)
        sub = np.arange(len(batch), dtype=np.int64) % salt
        batch = batch.append_column("_bucket",
                                    pa.array(base * salt + sub))
        batch = batch.append_column(
            "_side", pa.array(["l"] * len(batch), pa.string()))
        for name, typ in all_cols:
            if name not in batch.schema.names:
                batch = batch.append_column(name, pa.nulls(len(batch), typ))
        return batch.select([n for n, _ in all_cols] + ["_bucket", "_side"])

    return fn


def _tag_replicated_right(on: str, buckets: int, salt: int,
                          all_cols: list[tuple]):
    """Right-side tag for the salted join: every row REPLICATES into all
    ``salt`` sub-buckets of its key bucket, so each left sub-bucket sees
    the full right key group."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        base = (hash64(batch[on], seed=17)
                % np.uint64(buckets)).astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), salt)
        sub = np.tile(np.arange(salt, dtype=np.int64), n)
        batch = batch.take(pa.array(idx))
        batch = batch.append_column(
            "_bucket", pa.array(np.repeat(base, salt) * salt + sub))
        batch = batch.append_column(
            "_side", pa.array(["r"] * len(batch), pa.string()))
        for name, typ in all_cols:
            if name not in batch.schema.names:
                batch = batch.append_column(name, pa.nulls(len(batch), typ))
        return batch.select([n_ for n_, _ in all_cols] + ["_bucket",
                                                          "_side"])

    return fn


def broadcast_expand_join(left, dim_tbl: pa.Table, left_on: str,
                          right_on: str, how: str = "inner"):
    """Broadcast hash join against a small table that MAY have duplicate
    join keys (1:N) — each fact batch pandas-merges against the broadcast
    dim inside ``map_batches``: ZERO shuffle, and unlike the unique-key
    ``index_in`` enrich, a fact row matching k dim rows expands to k
    output rows (standard SQL inner/left semantics).

    The dim is indexed ONCE on the driver (``set_index``); workers cache
    the deserialized transform per process, so the pandas Index hash
    engine builds once per worker, not once per batch. Use when the dim's
    bytes fit the broadcast budget; use ``hash_join`` when both sides are
    large. ``how``: "inner" or "left" (left = fact side preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_expand_join: how must be 'inner' or "
                         f"'left', got {how!r}")
    dim_df = dim_tbl.to_pandas()
    dim_int_cols = [n for n, t in zip(dim_tbl.schema.names,
                                      dim_tbl.schema.types)
                    if pa.types.is_integer(t)]
    if how == "left":
        # unmatched fact rows null-pad the dim columns; pre-cast dim ints
        # to the nullable extension dtype so the merge emits <NA> instead
        # of float-promoting (exactness above 2^53, incl. the key itself)
        for n in dim_int_cols:
            dim_df[n] = dim_df[n].astype("Int64")
    # index on a RENAMED copy of the key so the key column itself stays a
    # payload column in the output (both join keys survive, as in
    # hash_join's merge output)
    dim_df = dim_df.set_index(dim_df[right_on].rename("_bx_key"))

    def join_batch(b: pa.Table) -> pd.DataFrame:
        lb = b.to_pandas()
        out = lb.join(dim_df, on=left_on, how=how)
        if how == "inner":
            return out
        out = out.reset_index(drop=True)
        for name in dim_int_cols:
            # plain int64 when null-free — the nullable extension dtype
            # would leak into result schemas (Int64 vs int64)
            if out[name].dtype != np.int64 and out[name].notna().all():
                out[name] = out[name].astype("int64")
        return out

    return left.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


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
                   how: str = "semi", buckets: int = 32,
                   left_schema=None, right_schema=None):
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
    lschema = left_schema if left_schema is not None else left.schema()
    if lschema is None:      # left is empty with no typed blocks: nothing
        return left          # can match (semi) or survive (anti) anyway
    rschema = right_schema if right_schema is not None else right.schema()
    if rschema is None:
        # empty right: semi keeps nothing, anti keeps everything
        return left.limit(0) if how == "semi" else left
    if "_rkey" in lschema.names:
        raise ValueError("left side may not carry a '_rkey' column")
    rkey_type = _arrow_type(dict(zip(rschema.names, rschema.types))[right_on])
    all_cols = [(n, _arrow_type(t))
                for n, t in zip(lschema.names, lschema.types)]
    all_cols += [("_rkey", rkey_type)]
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

    def probe_bucket(g: pa.Table) -> pa.Table:
        # Arrow-level: the padded union block must NOT round-trip through
        # pandas (typed nulls promote int64 → float64, which rounds 64-bit
        # hash keys above 2^53 and fabricates matches). pc.is_in compares
        # exact typed values.
        side = g["_side"]
        lrows = g.filter(pc.equal(side, "l")).select(lcols)
        rkeys = g.filter(pc.equal(side, "r"))["_rkey"].combine_chunks()
        mask = pc.is_in(lrows[left_on], value_set=rkeys)
        if not keep:
            mask = pc.invert(mask)
        return lrows.filter(mask)

    return (lt.union(rt).groupby("_bucket")
            .map_groups(probe_bucket, batch_format="pyarrow"))


def _count_tag(side: str, on: str, buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        bucket = (hash64(batch[on], seed=17) % np.uint64(buckets)).astype(np.int64)
        return pa.table({
            "_key": batch[on],
            "_bucket": pa.array(bucket),
            "_side": pa.array([side] * len(batch), pa.string()),
        })

    return fn
