"""Windowed aggregates and as-of joins over timestamped streams.

Ray-Data-first shapes (task brief: custom operators expressed as
map_batches + groupby compositions, with the partitioning assumption
documented):

- ``tumbling_window``: window_start = floor(ts / width) derived per batch
  (pure Arrow arithmetic), then an ordinary groupby((keys, window)) —
  windows are just another grouping column, so salting/partial-agg
  strategies from the sketch pipeline apply unchanged.
- ``sliding_window``: each row is ASSIGNED to the width/slide windows that
  cover it inside map_batches (row replication factor = width/slide,
  explicit and caller-controlled), then the same groupby. No cross-batch
  state: window membership is a pure function of ts.
- ``asof_join``: for each left row, the latest right row with
  right.ts <= left.ts and equal key. Both sides hash-bucket by key (ONE
  shuffle each, the join.py pattern), each bucket sorts locally and runs a
  vectorized pandas merge_asof. Partitioning assumption: one key-bucket's
  rows fit a task (size ``buckets`` accordingly; a single hot key lands in
  one bucket — pre-aggregate or split by time range if a key alone
  overflows a task).

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketches.hashing import hash64


_TS_UNIT_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _ts_ticks_per_second(ts_type: pa.DataType) -> int:
    """Ticks per second for a timestamp column (ADVICE r2: a timestamp[s/ms/ns]
    column must not be silently bucketed with microsecond arithmetic)."""
    if not pa.types.is_timestamp(ts_type):
        raise TypeError(f"expected a timestamp column, got {ts_type}")
    return _TS_UNIT_PER_S[ts_type.unit]


def _window_start(ts: pa.ChunkedArray | pa.Array, width_s: int,
                  origin_s: int = 0) -> pa.ChunkedArray | pa.Array:
    """floor((ts - origin) / width) * width + origin, in the column's own
    timestamp unit. True floor division: int64 `pc.divide` truncates toward
    zero, which would put pre-epoch timestamps one window too late — the
    remainder-based correction below floors instead (ADVICE r2)."""
    tick = _ts_ticks_per_second(ts.type)
    us = pc.cast(ts, pa.int64())
    w = width_s * tick
    o = origin_s * tick
    d = pc.subtract(us, o)
    q = pc.divide(d, w)              # truncates toward zero on int64
    r = pc.multiply(q, w)
    # d < 0 with a nonzero remainder → truncation rounded up; floor = q-1
    adjust = pc.and_(pc.less(d, 0), pc.not_equal(r, d))
    start = pc.add(pc.subtract(r, pc.if_else(adjust, w, 0)), o)
    return pc.cast(start, ts.type)


def with_tumbling_window(batch: pa.Table, ts_col: str = "ts",
                         width_s: int = 3600,
                         out_col: str = "window_start") -> pa.Table:
    """Append the tumbling-window start column (pure batch transform)."""
    return batch.append_column(out_col, _window_start(batch[ts_col], width_s))


def tumbling_window(ds, ts_col: str, width_s: int, keys: list[str] | None = None):
    """Dataset → grouped-by-(keys, window_start) Ray Data GroupedData: call
    .aggregate(...) on the result. Windows are grouping columns — nothing
    else about the engine changes."""
    ds = ds.map_batches(
        lambda b: with_tumbling_window(b, ts_col=ts_col, width_s=width_s),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.groupby((keys or []) + ["window_start"])


def with_sliding_windows(batch: pa.Table, ts_col: str = "ts",
                         width_s: int = 3600, slide_s: int = 1800,
                         out_col: str = "window_start") -> pa.Table:
    """Replicate each row into every sliding window covering it
    (width_s must be a multiple of slide_s; replication = width/slide,
    bounded and caller-visible)."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    k = width_s // slide_s
    tick = _ts_ticks_per_second(batch[ts_col].type)
    base = _window_start(batch[ts_col], slide_s)  # finest-grained bucket
    n = len(batch)
    idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
    rep = batch.take(idx)
    base_us = pc.cast(pc.cast(base, pa.int64()), pa.int64()).to_numpy(
        zero_copy_only=False)
    offsets = (np.arange(k, dtype=np.int64) * slide_s * tick)
    starts = (np.repeat(base_us, k) - np.tile(offsets, n))
    starts_arr = pc.cast(pa.array(starts, pa.int64()), batch[ts_col].type)
    return rep.append_column(out_col, starts_arr)


def sliding_window(ds, ts_col: str, width_s: int, slide_s: int,
                   keys: list[str] | None = None):
    """Sliding-window grouping: assign-in-map, then groupby — the engine
    still sees plain grouped aggregation."""
    ds = ds.map_batches(
        lambda b: with_sliding_windows(b, ts_col=ts_col, width_s=width_s,
                                       slide_s=slide_s),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return ds.groupby((keys or []) + ["window_start"])


# ---------------------------------------------------------------- as-of join
def asof_join(left, right, on: str, ts_left: str, ts_right: str,
              buckets: int = 32, suffix: str = "_r",
              chunk_ranges: int | None = None, sample_limit: int = 10_000):
    """For each left row: attach the latest right row with the same key
    and right ts <= left ts (nulls where none exists). Distributed shape:
    tag both sides with _bucket = hash(key) % buckets, union, ONE groupby
    shuffle, vectorized pandas merge_asof per bucket.

    Column names of the two sides must be disjoint apart from ``on``
    (right's non-key columns get ``suffix`` if they collide).

    HOT-KEY OVERFLOW PATH (``chunk_ranges=N``): when one key's rows
    exceed a task, partition BOTH sides by left-ts TIME RANGE instead of
    key. The only cross-chunk state an as-of backward join needs is each
    key's latest right row before the chunk: pass 1 takes the last right
    row per (key, chunk) — arrow-native so dtypes survive — and the
    driver replicates each such tail into the chunks up to the key's
    next right-bearing chunk (a keys × N pad table, the same
    closure-shipped regime as the other chunk_ranges paths); pass 2 runs
    the identical merge_asof kernel per chunk with the pads unioned into
    the right side. Boundary-value rows land in the later chunk, so pad
    ts is strictly below the chunk's own right rows."""
    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    rename = {c: c + suffix for c in rcols
              if c != on and (c in lcols or c == ts_left)}
    if rename:
        def ren(b: pa.Table) -> pa.Table:
            return b.rename_columns([rename.get(n, n) for n in b.schema.names])

        right = right.map_batches(ren, batch_format="pyarrow", zero_copy_batch=True)
        rcols = [rename.get(c, c) for c in rcols]
        ts_right_eff = rename.get(ts_right, ts_right)
    else:
        ts_right_eff = ts_right
    rschema = right.schema()

    from .join import _arrow_type
    all_cols = [(n, _arrow_type(t)) for n, t in zip(lschema.names, lschema.types)]
    all_cols += [(n, _arrow_type(t)) for n, t in zip(rschema.names, rschema.types)
                 if n != on]

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            bucket = (hash64(batch[on], seed=23) % np.uint64(buckets)).astype(np.int64)
            batch = batch.append_column("_bucket", pa.array(bucket))
            batch = batch.append_column("_side", pa.array([side] * len(batch),
                                                          pa.string()))
            for name, typ in all_cols:
                if name not in batch.schema.names:
                    batch = batch.append_column(name, pa.nulls(len(batch), typ))
            return batch.select([n for n, _ in all_cols] + ["_bucket", "_side"])

        return fn

    lt = left.map_batches(tag("l"), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag("r"), batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)

    out_lcols = lcols
    out_rcols = [c for c in rcols if c != on]
    int_cols = {n for n, t in all_cols if pa.types.is_integer(t)}

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        # split sides at the ARROW level (see join.hash_join): converting
        # the padded union block to pandas would float-promote int64
        # columns and round values above 2^53
        side = g["_side"]
        lrows = (g.filter(pc.equal(side, "l")).select(out_lcols)
                 .to_pandas().sort_values(ts_left, kind="mergesort"))
        rrows = (g.filter(pc.equal(side, "r"))
                 .select([on, ts_right_eff] +
                         [c for c in out_rcols if c != ts_right_eff])
                 .to_pandas().sort_values(ts_right_eff, kind="mergesort"))
        # unmatched left rows get missing right values; pre-convert right
        # non-key int columns to the nullable dtype so merge_asof emits
        # <NA> instead of float-promoting (keys must stay plain int64 —
        # merge_asof rejects extension keys; they are null-free per side)
        for c in rrows.columns:
            if c in int_cols and c not in (on, ts_right_eff):
                rrows[c] = rrows[c].astype("Int64")
        out = pd.merge_asof(lrows, rrows, left_on=ts_left, right_on=ts_right_eff,
                            by=on, direction="backward")
        for c in out.columns:  # restore plain int64 where null-free
            if c in int_cols and out[c].dtype != np.int64 \
                    and out[c].notna().all():
                out[c] = out[c].astype("int64")
        return out

    if chunk_ranges:
        return _asof_join_chunked(left, right, on, ts_left, ts_right_eff,
                                  all_cols, join_bucket, chunk_ranges,
                                  sample_limit)
    return unioned.groupby("_bucket").map_groups(join_bucket,
                                                 batch_format="pyarrow")


def _asof_join_chunked(left, right, on, ts_left, ts_right_eff, all_cols,
                       join_bucket, chunk_ranges, sample_limit):
    """Two-pass time-range-chunked as-of join — see asof_join's
    hot-key-overflow docs. ``right`` arrives already suffix-renamed;
    ``join_bucket`` is the default path's merge_asof kernel, reused
    verbatim per chunk."""
    import ray
    import ray.data as rd

    from .ops import _assign_range_fn, _sample_range_bounds

    bounds = _sample_range_bounds(left, ts_left, chunk_ranges, sample_limit)
    n_chunks = len(bounds) + 1
    names = [n for n, _ in all_cols]

    def tag_range(side, ts_col):
        assign = _assign_range_fn(bounds, ts_col)

        def fn(batch: pa.Table) -> pa.Table:
            batch = assign(batch)
            batch = batch.append_column(
                "_side", pa.array([side] * len(batch), pa.string()))
            for name, typ in all_cols:
                if name not in batch.schema.names:
                    batch = batch.append_column(name,
                                                pa.nulls(len(batch), typ))
            return batch.select(names + ["_range", "_side"])

        return fn

    lt = left.map_batches(tag_range("l", ts_left), batch_format="pyarrow",
                          zero_copy_batch=True)
    # consumed twice (tails + final union): object-store resident
    rt = right.map_batches(tag_range("r", ts_right_eff),
                           batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # pass 1: last right row per (key, chunk) — arrow-native take so
    # every dtype survives the round trip into the pad table
    def last_per_key(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(on, "ascending"),
                                              (ts_right_eff, "ascending")])
        g = g.take(order)
        k = g[on].to_numpy(zero_copy_only=False)
        last = np.concatenate([k[1:] != k[:-1], [True]])
        return g.take(pa.array(np.flatnonzero(last), pa.int64()))

    tail_blocks = ray.get(
        rt.groupby("_range").map_groups(last_per_key,
                                        batch_format="pyarrow")
        .to_arrow_refs())
    tail_blocks = [b for b in tail_blocks if len(b)]
    parts = [lt, rt]
    if tail_blocks:
        tails = pa.concat_tables(tail_blocks, promote_options="default")
        meta = pd.DataFrame({
            "k": tails[on].to_numpy(zero_copy_only=False),
            "r": tails["_range"].to_numpy(zero_copy_only=False),
        })
        meta["i"] = np.arange(len(meta))
        meta = meta.sort_values(["k", "r"], kind="mergesort")
        take_idx: list[int] = []
        tgt: list[int] = []
        # the tail of a key's right-bearing chunk r_i serves chunks
        # r_i+1 .. (the key's next right-bearing chunk, inclusive — its
        # early left rows may precede that chunk's own first right row)
        for _, gk in meta.groupby("k", sort=False):
            rs = gk["r"].to_numpy()
            idx = gk["i"].to_numpy()
            nxt = np.concatenate([rs[1:], [n_chunks - 1]])
            for j in range(len(rs)):
                for t in range(int(rs[j]) + 1, int(nxt[j]) + 1):
                    take_idx.append(int(idx[j]))
                    tgt.append(t)
        if take_idx:
            pad_tbl = tails.take(pa.array(take_idx, pa.int64()))
            i = pad_tbl.schema.get_field_index("_range")
            pad_tbl = pad_tbl.set_column(
                i, "_range", pa.array(np.asarray(tgt, dtype=np.int64)))
            parts.append(rd.from_arrow(pad_tbl))

    unioned = parts[0].union(*parts[1:])
    return unioned.groupby("_range").map_groups(join_bucket,
                                                batch_format="pyarrow")


# -------------------------------------------------------------- range join
def range_join(left, right, ts_col: str, lo_col: str, hi_col: str,
               bucket_width_s: int, buckets: int = 32):
    """Interval (range) join: one output row per (left row, right interval)
    pair with ``lo <= ts < hi``. Non-equi joins have no Ray Data builtin;
    the distributed shape here is time bucketing:

    - time is cut into fixed buckets of ``bucket_width_s``;
    - a left row lands in exactly ONE time bucket; a right interval
      replicates into every bucket it overlaps (replication factor =
      span/bucket_width + 1 — explicit and caller-controlled, so pick
      ``bucket_width_s`` on the order of the typical interval span);
    - time buckets hash into ``buckets`` coarse shuffle groups so the task
      count stays bounded regardless of the time range; inside a group ONE
      vectorized pandas merge on the exact time-bucket id + a mask filter
      emits the pairs.

    Because a left row exists in exactly one time bucket, a replicated
    interval can never double-match it — multiplicity is exact. Column
    names of the two sides must be disjoint. Partitioning assumption: the
    pairs of one coarse group fit a task; raise ``buckets`` (or shrink
    ``bucket_width_s``) for denser streams."""
    lschema, rschema = left.schema(), right.schema()
    clash = set(lschema.names) & set(rschema.names)
    if clash:
        raise ValueError(f"range_join requires disjoint column names; both sides have {sorted(clash)}")
    tick = _ts_ticks_per_second(dict(zip(lschema.names, lschema.types))[ts_col])
    w = bucket_width_s * tick
    from .join import _arrow_type
    all_cols = [(n, _arrow_type(t)) for n, t in zip(lschema.names, lschema.types)]
    all_cols += [(n, _arrow_type(t)) for n, t in zip(rschema.names, rschema.types)]

    def pad(batch: pa.Table, side: str, tb: np.ndarray) -> pa.Table:
        batch = batch.append_column("_tb", pa.array(tb, pa.int64()))
        g = (hash64(batch["_tb"], seed=41) % np.uint64(buckets)).astype(np.int64)
        batch = batch.append_column("_g", pa.array(g))
        batch = batch.append_column("_side", pa.array([side] * len(batch), pa.string()))
        for name, typ in all_cols:
            if name not in batch.schema.names:
                batch = batch.append_column(name, pa.nulls(len(batch), typ))
        return batch.select([n for n, _ in all_cols] + ["_tb", "_g", "_side"])

    def tag_left(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pad(batch, "l", np.floor_divide(ts, w))

    def tag_right(batch: pa.Table) -> pa.Table:
        lo = pc.cast(batch[lo_col], pa.int64()).to_numpy(zero_copy_only=False)
        hi = pc.cast(batch[hi_col], pa.int64()).to_numpy(zero_copy_only=False)
        first = np.floor_divide(lo, w)
        # hi is exclusive: the last covered bucket holds hi-1
        last = np.floor_divide(np.maximum(hi - 1, lo), w)
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        rep = batch.take(pa.array(idx))
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        return pad(rep, "r", np.repeat(first, reps) + offs)

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)

    out_lcols = list(lschema.names)
    out_rcols = list(rschema.names)

    def join_group(g: pa.Table) -> pd.DataFrame:
        # Arrow-level side split (see join.hash_join): pandas-converting
        # the padded union block would float-promote int64 columns; the
        # inner merge itself introduces no missing values
        side = g["_side"]
        lrows = g.filter(pc.equal(side, "l")).select(out_lcols + ["_tb"]) \
                 .to_pandas()
        rrows = g.filter(pc.equal(side, "r")).select(out_rcols + ["_tb"]) \
                 .to_pandas()
        out = lrows.merge(rrows, on="_tb")
        mask = (out[ts_col] >= out[lo_col]) & (out[ts_col] < out[hi_col])
        return out[mask].drop(columns=["_tb"])

    return lt.union(rt).groupby("_g").map_groups(join_group,
                                                 batch_format="pyarrow")


# ------------------------------------------------------------- sessionize
def sessionize(ds, key: str, ts_col: str, gap_s: int, buckets: int = 32,
               out_col: str = "session_seq",
               chunk_ranges: int | None = None, sample_limit: int = 10_000):
    """Gap-based sessionization: append a per-key 1-based session sequence
    number — a new session starts at a key's first event or when the gap
    since the key's previous event EXCEEDS ``gap_s`` (strict, matching SQL
    ``ts - lag(ts) > INTERVAL``). Rows with equal (key, ts) always share a
    session, so the result is order-deterministic.

    Distributed shape (default): ONE hash-bucket shuffle on the key, then a
    single vectorized pass per bucket (sort by (key, ts), boolean break
    vector, cumulative-sum re-based per key) numbers ALL keys in the bucket
    at once — no per-key tasks. Partitioning assumption: one key's rows fit
    a task (same as asof_join); size ``buckets`` to the stream.

    HOT-KEY OVERFLOW PATH (``chunk_ranges=N``): when a single key's rows
    exceed one task's memory, partition by TIME RANGE instead (equal-ts
    rows share a chunk, so ties still share a session). Session numbering
    is a prefix property, but the only cross-chunk state a chunk needs is
    (a) whether its first row for a key starts a new session — decided by
    the gap to the key's last ts in any earlier chunk — and (b) how many
    sessions started before it. Pass 1 computes per-(key, chunk) partials
    (first/last ts, internal break count) in one vectorized scan per
    chunk; the driver turns them into per-(key, chunk) boundary flags +
    session-start offsets (a keys × N table shipped in the closure — sized
    for the few-huge-keys regime this path exists for); pass 2 numbers
    each chunk locally with the carried flag/offset. Output matches the
    default path exactly."""
    if chunk_ranges:
        return _sessionize_chunked(ds, key, ts_col, gap_s, out_col,
                                   chunk_ranges, sample_limit)

    def tag(batch: pa.Table) -> pa.Table:
        b = (hash64(batch[key], seed=53) % np.uint64(buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    gap = np.timedelta64(gap_s, "s")

    def number(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        if not len(g):
            g[out_col] = np.array([], dtype=np.int64)
            return g.drop(columns=["_bucket"])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy()
        n = len(g)
        newkey = np.empty(n, dtype=bool)
        newkey[0] = True
        newkey[1:] = k[1:] != k[:-1]
        brk = newkey.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap
        cs = np.cumsum(brk)
        # session_seq = sessions-so-far minus sessions before this key's run
        run_start = np.maximum.accumulate(np.where(newkey, cs - 1, 0))
        g[out_col] = (cs - run_start).astype(np.int64)
        return g.drop(columns=["_bucket"])

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(number, batch_format="pandas")


def _sessionize_chunked(ds, key: str, ts_col: str, gap_s: int, out_col: str,
                        chunk_ranges: int, sample_limit: int):
    """Two-pass time-range-chunked sessionization — see sessionize's
    hot-key-overflow docs."""
    from .ops import _assign_range_fn, _sample_range_bounds

    bounds = _sample_range_bounds(ds, ts_col, chunk_ranges, sample_limit)
    tagged = ds.map_batches(_assign_range_fn(bounds, ts_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    # consumed twice (partials + final pass): object-store resident
    tagged = tagged.materialize()
    gap = np.timedelta64(gap_s, "s")

    # pass 1: per-(key, chunk) first/last ts + internal break count, one
    # vectorized scan per chunk (groups bounded by the chunk size)
    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy()
        n = len(g)
        newkey = np.empty(n, dtype=bool)
        newkey[0] = True
        newkey[1:] = k[1:] != k[:-1]
        inner_brk = np.zeros(n, dtype=np.int64)
        inner_brk[1:] = ((ts[1:] - ts[:-1]) > gap) & ~newkey[1:]
        out = pd.DataFrame({key: k, "_first": ts, "_last": ts,
                            "_brk": inner_brk})
        agg = out.groupby(key, sort=False).agg(
            _first=("_first", "min"), _last=("_last", "max"),
            _brk=("_brk", "sum")).reset_index()
        agg["_range"] = int(g["_range"].iloc[0])
        return agg

    partials = (tagged.select_columns([key, ts_col, "_range"])
                .groupby("_range").map_groups(partial, batch_format="pandas")
                .to_pandas().sort_values([key, "_range"], kind="mergesort"))

    # driver: boundary flag + session-start offset per (key, chunk) —
    # keys × N rows, the same closure-shipped regime as the other
    # chunk_ranges paths
    grp = partials.groupby(key, sort=False)
    prev_last = grp["_last"].shift(1)
    bd = (prev_last.isna()
          | ((partials["_first"] - prev_last) > gap)).astype(np.int64)
    starts = partials["_brk"].to_numpy() + bd.to_numpy()
    partials["_bd"] = bd.to_numpy()
    partials["_off"] = (pd.Series(starts).groupby(
        partials[key].to_numpy(), sort=False).cumsum().to_numpy() - starts)
    carry = partials[[key, "_range", "_bd", "_off"]]

    def number(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(
            drop=True)
        r = int(g["_range"].iloc[0])
        g = g.drop(columns=["_range"])
        n = len(g)
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy()
        newkey = np.empty(n, dtype=bool)
        newkey[0] = True
        newkey[1:] = k[1:] != k[:-1]
        c_r = carry[carry["_range"] == r]
        j = (pd.DataFrame({key: k[newkey]})
             .merge(c_r, on=key, how="left"))
        bd_run = j["_bd"].fillna(1).to_numpy().astype(np.int64)
        off_run = j["_off"].fillna(0).to_numpy().astype(np.int64)
        brk = np.zeros(n, dtype=np.int64)
        brk[1:] = ((ts[1:] - ts[:-1]) > gap) & ~newkey[1:]
        brk[newkey] = bd_run
        cs = np.cumsum(brk)
        # index of each row's key-run start → per-run base/offset lookup
        run_id = np.cumsum(newkey) - 1
        base = (cs - brk)[newkey]
        g[out_col] = cs - base[run_id] + off_run[run_id]
        return g

    return tagged.groupby("_range").map_groups(number, batch_format="pandas")


# ------------------------------------------------------------ rolling agg
def rolling_agg(ds, key: str, ts_col: str, value_col: str, window_rows: int,
                aggs: tuple[str, ...] = ("sum", "mean"), buckets: int = 32,
                chunk_ranges: int | None = None, sample_limit: int = 10_000):
    """Frame-based rolling window aggregate: for every row, aggregate
    ``value_col`` over the frame ROWS BETWEEN window_rows-1 PRECEDING AND
    CURRENT ROW within its key, ordered by ``ts_col`` (SQL
    ``agg(v) OVER (PARTITION BY key ORDER BY ts ROWS ...)``; ordering must
    be unique per key for the result to be well-defined — same caveat as
    the SQL form). Appends one ``rolling_<agg>`` column per requested agg
    (sum, mean, min, max, count).

    Distributed shape (default): identical to sessionize — ONE hash-bucket
    shuffle on the key, then pandas' C rolling kernels over the whole
    sorted bucket with per-key frames (groupby(key).rolling), no per-key
    tasks. Partitioning assumption: one key's rows fit a task.

    HOT-KEY OVERFLOW PATH (``chunk_ranges=N``): when a single key's rows
    exceed one task's memory, partition by TIME RANGE instead of key —
    sampled ts boundaries split the stream into N bounded chunks (equal-ts
    rows always share a chunk, so per-key ts order is exact across
    boundaries). A ROWS frame only ever reaches ``window_rows - 1`` rows
    back, so each chunk's carry-in is the key's last ≤ W-1 VALUES from all
    earlier chunks: pass 1 extracts per-(key, chunk) tails (≤ W-1 rows
    each, groups bounded by the chunk size regardless of key skew); the
    driver concatenates tails per key in chunk order and suffixes the last
    W-1 as each chunk's carry (a keys × N × (W-1) table shipped in the
    task closure — sized for the few-huge-keys regime this path exists
    for); pass 2 prepends the carry rows, runs the same pandas rolling
    kernel, and drops them. Output matches the default path exactly."""
    allowed = {"sum", "mean", "min", "max", "count"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"unsupported rolling aggs: {sorted(bad)}")
    if chunk_ranges:
        return _rolling_agg_chunked(ds, key, ts_col, value_col, window_rows,
                                    aggs, chunk_ranges, sample_limit)

    def tag(batch: pa.Table) -> pa.Table:
        b = (hash64(batch[key], seed=59) % np.uint64(buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        g = g.drop(columns=["_bucket"])
        if len(g):
            r = g.groupby(key, sort=False)[value_col].rolling(
                window_rows, min_periods=1)
            for a in aggs:
                g[f"rolling_{a}"] = getattr(r, a)().to_numpy()
        else:
            for a in aggs:
                g[f"rolling_{a}"] = np.array([], dtype=np.float64)
        return g

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(roll, batch_format="pandas")


def _rolling_agg_chunked(ds, key: str, ts_col: str, value_col: str,
                         window_rows: int, aggs: tuple[str, ...],
                         chunk_ranges: int, sample_limit: int):
    """Two-pass time-range-chunked ROWS-frame rolling aggregate — see
    rolling_agg's hot-key-overflow docs."""
    from .ops import _assign_range_fn, _sample_range_bounds

    bounds = _sample_range_bounds(ds, ts_col, chunk_ranges, sample_limit)
    tagged = ds.map_batches(_assign_range_fn(bounds, ts_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    # consumed twice (tails + final pass): object-store resident, never
    # the driver
    tagged = tagged.materialize()

    tail_n = window_rows - 1
    carry_all = pd.DataFrame({key: [], "_range": pd.array([], dtype="int64"),
                              value_col: []})
    if tail_n > 0:
        def tail(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(ts_col, kind="mergesort").tail(tail_n)
            return g[[key, "_range", value_col]]

        # (key, chunk) groups hold at most a chunk's rows even for a
        # single all-dominating key
        tails = (tagged.select_columns([key, "_range", ts_col, value_col])
                 .groupby([key, "_range"])
                 .map_groups(tail, batch_format="pandas")
                 .to_pandas())
        carries = []
        if len(tails):
            tails = tails.sort_values([key, "_range"], kind="mergesort")
            for k, gk in tails.groupby(key, sort=False):
                vals = gk[value_col].to_numpy()
                rng = gk["_range"].to_numpy()
                for r in np.unique(rng):
                    prev = vals[rng < r]
                    if len(prev):
                        take = prev[-tail_n:]
                        carries.append(pd.DataFrame({
                            key: np.repeat(k, len(take)),
                            "_range": np.full(len(take), r, dtype=np.int64),
                            value_col: take}))
        if carries:
            carry_all = pd.concat(carries, ignore_index=True)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(
            drop=True)
        r = int(g["_range"].iloc[0])
        g = g.drop(columns=["_range"])
        dtypes = g.dtypes
        pad = carry_all[carry_all["_range"] == r]
        if len(pad):
            padf = pad[[key, value_col]].assign(_pad=True)
            # stable sort on the key ALONE: carried rows stay before the
            # chunk's real rows of the same key (padf concatenated first),
            # real rows keep their (ts) order
            body = (pd.concat([padf, g.assign(_pad=False)],
                              ignore_index=True)
                    .sort_values(key, kind="mergesort")
                    .reset_index(drop=True))
        else:
            body = g.assign(_pad=False)
        if len(body):
            rr = body.groupby(key, sort=False)[value_col].rolling(
                window_rows, min_periods=1)
            for a in aggs:
                body[f"rolling_{a}"] = getattr(rr, a)().to_numpy()
        else:
            for a in aggs:
                body[f"rolling_{a}"] = np.array([], dtype=np.float64)
        out = body[~body["_pad"]].drop(columns=["_pad"]).reset_index(
            drop=True)
        # concat-with-missing promotes e.g. int64 → float64; restore the
        # real rows' original dtypes so both paths share one schema
        return out.astype({c: dtypes[c] for c in dtypes.index})

    return tagged.groupby("_range").map_groups(roll, batch_format="pandas")


# ------------------------------------------------- range-frame rolling agg
def rolling_range_agg(ds, key: str, ts_col: str, value_col: str, width_s: int,
                      aggs: tuple[str, ...] = ("sum", "count"),
                      buckets: int = 32,
                      chunk_ranges: int | None = None,
                      sample_limit: int = 10_000):
    """Time-based rolling window aggregate with SQL RANGE-frame semantics:
    for every row, aggregate ``value_col`` over the rows of the same key
    whose ts lies in ``[ts − width_s, ts]`` — including BOTH endpoints and
    all CURRENT-ROW PEERS (rows sharing the row's exact timestamp), exactly
    like ``agg(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    INTERVAL width_s SECONDS PRECEDING AND CURRENT ROW)``. Peers make this
    well-defined under duplicate timestamps (pandas' time-based rolling is
    position-based and would NOT match SQL there).

    Aggs: sum, mean, count. Integer value columns accumulate in exact
    int64 (use the integer-micros trick for bit-stable float sums).

    Distributed shape (default): one hash-bucket shuffle on the key (same
    as sessionize/rolling_agg), then per-bucket vectorized frames — a
    prefix sum plus two np.searchsorted calls per key segment; no per-row
    Python. Partitioning assumption: one key's rows fit a task.

    HOT-KEY OVERFLOW PATH (``chunk_ranges=N``): partition by TIME RANGE —
    a RANGE frame reaches back at most ``width_s``, so NO driver-side
    carry state is needed at all: each row is REPLICATED as a pad into
    every later chunk whose lower boundary lies within (ts, ts+width]
    (replication factor ≈ width / chunk-span — size chunk_ranges so
    chunks are much wider than the frame), then ONE groupby(range) pass
    runs the identical searchsorted kernel with pads feeding frames but
    excluded from the output. Equal-ts peers always share a chunk, so
    peer semantics survive the split."""
    allowed = {"sum", "mean", "count"}
    bad = set(aggs) - allowed
    if bad:
        raise ValueError(f"unsupported rolling aggs: {sorted(bad)}")
    if chunk_ranges:
        return _rolling_range_agg_chunked(ds, key, ts_col, value_col,
                                          width_s, aggs, chunk_ranges,
                                          sample_limit)
    width_ticks_of = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def tag(batch: pa.Table) -> pa.Table:
        _ts_ticks_per_second(batch.schema.field(ts_col).type)  # validate
        b = (hash64(batch[key], seed=59) % np.uint64(buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        g = g.drop(columns=["_bucket"])
        if not len(g):
            sum_dt = (np.int64 if g[value_col].dtype.kind in "iu"
                      else np.float64)
            dtypes = {"sum": sum_dt, "mean": np.float64, "count": np.int64}
            for a in aggs:
                g[f"rolling_{a}"] = np.array([], dtype=dtypes[a])
            return g
        ts_np = g[ts_col].to_numpy()
        unit = np.datetime_data(ts_np.dtype)[0]
        width = width_s * width_ticks_of[unit]
        tsi = ts_np.view("int64")
        v = g[value_col].to_numpy()
        exact_int = v.dtype.kind in "iu"
        acc = v.astype(np.int64) if exact_int else v.astype(np.float64)
        cs = np.concatenate([[0], np.cumsum(acc)])
        keys_np = g[key].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], keys_np[1:] != keys_np[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        lo = np.empty(len(g), dtype=np.int64)
        hi = np.empty(len(g), dtype=np.int64)
        # one vectorized searchsorted pair per key segment (keys per
        # bucket << rows per bucket)
        for s, e in zip(starts, ends):
            seg = tsi[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - width, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        sums = cs[hi] - cs[lo]
        cnt = hi - lo
        if "sum" in aggs:
            g["rolling_sum"] = sums
        if "mean" in aggs:
            g["rolling_mean"] = sums / cnt
        if "count" in aggs:
            g["rolling_count"] = cnt
        return g

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(roll, batch_format="pandas")


def _rolling_range_agg_chunked(ds, key: str, ts_col: str, value_col: str,
                               width_s: int, aggs: tuple[str, ...],
                               chunk_ranges: int, sample_limit: int):
    """Replication-based time-range-chunked RANGE-frame rolling aggregate
    — see rolling_range_agg's hot-key-overflow docs. Single shuffle, no
    driver state, no materialize."""
    from .ops import _sample_range_bounds

    sch = ds.schema()
    ticks = _ts_ticks_per_second(sch.types[sch.names.index(ts_col)])
    width = width_s * ticks
    bounds = _sample_range_bounds(ds, ts_col, chunk_ranges, sample_limit)

    def assign_replicate(batch: pa.Table) -> pa.Table:
        v = (batch[ts_col].combine_chunks()
             if isinstance(batch[ts_col], pa.ChunkedArray) else batch[ts_col])
        arr = v.to_numpy(zero_copy_only=False)
        b = np.asarray(bounds, dtype=arr.dtype)
        rid = np.searchsorted(b, arr, side="right").astype(np.int64)
        base = (batch.append_column("_range", pa.array(rid))
                .append_column("_pad",
                               pa.array(np.zeros(len(arr), dtype=bool))))
        if not len(bounds):
            return base
        hi = np.searchsorted(b.view("int64"), arr.view("int64") + width,
                             side="right").astype(np.int64)
        reps = hi - rid        # chunks rid+1 .. hi need this row as a pad
        total = int(reps.sum())
        if not total:
            return base
        idx = np.repeat(np.arange(len(arr)), reps)
        offs = np.arange(total) - np.repeat(np.cumsum(reps) - reps,
                                            reps) + 1
        pads = (batch.take(pa.array(idx))
                .append_column("_range", pa.array(rid[idx] + offs))
                .append_column("_pad",
                               pa.array(np.ones(total, dtype=bool))))
        return pa.concat_tables([base, pads])

    width_ticks_of = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort").reset_index(
            drop=True)
        g = g.drop(columns=["_range"])
        ts_np = g[ts_col].to_numpy()
        unit = np.datetime_data(ts_np.dtype)[0]
        w = width_s * width_ticks_of[unit]
        tsi = ts_np.view("int64")
        v = g[value_col].to_numpy()
        exact_int = v.dtype.kind in "iu"
        acc = v.astype(np.int64) if exact_int else v.astype(np.float64)
        cs = np.concatenate([[0], np.cumsum(acc)])
        keys_np = g[key].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], keys_np[1:] != keys_np[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        lo = np.empty(len(g), dtype=np.int64)
        hi = np.empty(len(g), dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = tsi[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - w, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        sums = cs[hi] - cs[lo]
        cnt = hi - lo
        if "sum" in aggs:
            g["rolling_sum"] = sums
        if "mean" in aggs:
            g["rolling_mean"] = sums / cnt
        if "count" in aggs:
            g["rolling_count"] = cnt
        # pads fed the frames above; only real rows leave the task
        return (g[~g["_pad"]].drop(columns=["_pad"])
                .reset_index(drop=True))

    tagged = ds.map_batches(assign_replicate, batch_format="pyarrow",
                            zero_copy_batch=True)
    return tagged.groupby("_range").map_groups(roll, batch_format="pandas")


# ------------------------------------------------------- consecutive gaps
def consecutive_gaps(ds, key: str, ts_col: str, tiebreak: str,
                     attrs: list[str] | None = None, buckets: int = 32,
                     out_col: str = "gap_ticks",
                     chunk_ranges: int | None = None,
                     sample_limit: int = 10_000):
    """Per-key consecutive-event gaps (SQL ``ts - lag(ts) OVER (PARTITION
    BY key ORDER BY ts, tiebreak)``): one output row per input row that has
    a predecessor with the same key, carrying ``attrs`` of the LATER row
    plus the gap in the timestamp column's native ticks (int64; us for
    timestamp[us]). ``tiebreak`` must make (key, ts, tiebreak) unique so
    the ordering — and therefore the result — is deterministic.

    Distributed shape (default): the sessionize pattern — ONE hash-bucket
    shuffle on the key, then a single vectorized sort+diff pass numbers
    every key in the bucket at once (first-row-per-key rows masked out);
    no per-key tasks, no window state. Partitioning assumption: one key's
    rows fit a task.

    HOT-KEY OVERFLOW PATH (``chunk_ranges=N``): partition by TIME RANGE —
    a lag(1) only ever looks one row back, so the cross-chunk carry is a
    single scalar per (key, chunk): the key's max ts over earlier chunks,
    computed with an ordinary map-side-combined ``Max`` aggregate (no
    map_groups in pass 1 at all). NOTE the boundary gap is ts − max
    earlier ts, which equals the lag(1) gap because ranges are
    time-ordered; ties share a chunk so tiebreak order never straddles a
    boundary. Same keys × N closure-shipped carry regime as the other
    chunk_ranges paths."""
    attrs = attrs or []
    cols = [key, ts_col, tiebreak] + [a for a in attrs if a not in (key, ts_col, tiebreak)]
    if chunk_ranges:
        return _consecutive_gaps_chunked(ds, key, ts_col, tiebreak, attrs,
                                         cols, out_col, chunk_ranges,
                                         sample_limit)

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        b = (hash64(batch[key], seed=61) % np.uint64(buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    out_cols = attrs + [out_col]

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, tiebreak], kind="mergesort").reset_index(drop=True)
        if not len(g):
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in out_cols})
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        same[1:] = k[1:] == k[:-1]
        d = np.empty(len(g), dtype=np.int64)
        d[0] = 0
        d[1:] = ts[1:] - ts[:-1]
        out = g.loc[same, attrs].reset_index(drop=True)
        out[out_col] = d[same]
        return out[out_cols]

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    sch = ds.schema()  # ray.data.Schema: parallel .names / .types lists
    ticks = _ts_ticks_per_second(sch.types[sch.names.index(ts_col)])
    res = tagged.groupby("_bucket").map_groups(gaps, batch_format="pandas")
    if ticks != 1_000_000_000:
        # pandas promoted to ns above; scale back to native ticks
        factor = 1_000_000_000 // ticks

        def rescale(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index(out_col)
            return b.set_column(i, out_col,
                                pc.divide(b[out_col], pa.scalar(factor, pa.int64())))

        res = res.map_batches(rescale, batch_format="pyarrow", zero_copy_batch=True)
    return res


def _consecutive_gaps_chunked(ds, key: str, ts_col: str, tiebreak: str,
                              attrs: list[str], cols: list[str],
                              out_col: str, chunk_ranges: int,
                              sample_limit: int):
    """Two-pass time-range-chunked lag(1) gaps — see consecutive_gaps's
    hot-key-overflow docs. All arithmetic in ns, rescaled to native ticks
    at the end (same contract as the default path)."""
    from ray.data.aggregate import Max

    from .ops import _assign_range_fn, _sample_range_bounds

    sch = ds.schema()
    ticks = _ts_ticks_per_second(sch.types[sch.names.index(ts_col)])
    ns_factor = 1_000_000_000 // ticks
    ds = ds.select_columns(cols)
    bounds = _sample_range_bounds(ds, ts_col, chunk_ranges, sample_limit)
    tagged = ds.map_batches(_assign_range_fn(bounds, ts_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    tagged = tagged.materialize()

    def add_ticks(b: pa.Table) -> pa.Table:
        t = pc.multiply(pc.cast(b[ts_col], pa.int64()),
                        pa.scalar(ns_factor, pa.int64()))
        return b.select([key, "_range"]).append_column("_ticks", t)

    partials = (tagged.map_batches(add_ticks, batch_format="pyarrow",
                                   zero_copy_batch=True)
                .groupby([key, "_range"])
                .aggregate(Max("_ticks", alias_name="_last"))
                .to_pandas().sort_values([key, "_range"], kind="mergesort"))
    grp = partials.groupby(key, sort=False)
    # ranges are time-ordered, so the running max over earlier chunks IS
    # the key's lag(1) predecessor ts at each chunk boundary. Nullable
    # Int64 through the shift: plain shift promotes to float64, which
    # rounds ns-scale epochs (> 2^53) by a tick
    partials["_prev"] = grp["_last"].cummax().astype("Int64").shift(1)
    partials.loc[grp.cumcount() == 0, "_prev"] = pd.NA
    carry = partials[[key, "_range", "_prev"]]

    out_cols = attrs + [out_col]

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, tiebreak],
                          kind="mergesort").reset_index(drop=True)
        r = int(g["_range"].iloc[0])
        k = g[key].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
        n = len(g)
        newkey = np.empty(n, dtype=bool)
        newkey[0] = True
        newkey[1:] = k[1:] != k[:-1]
        d = np.empty(n, dtype=np.int64)
        d[0] = 0
        d[1:] = ts[1:] - ts[:-1]
        c_r = carry[carry["_range"] == r]
        j = pd.DataFrame({key: k[newkey]}).merge(c_r, on=key, how="left")
        has_prev = j["_prev"].notna().to_numpy()
        prev = j["_prev"].fillna(0).to_numpy(dtype=np.int64)
        run_first = np.flatnonzero(newkey)
        d[run_first[has_prev]] = (ts[run_first[has_prev]]
                                  - prev[has_prev])
        keep = ~newkey
        keep[run_first[has_prev]] = True
        out = g.loc[keep, attrs].reset_index(drop=True)
        out[out_col] = d[keep]
        return out[out_cols]

    res = tagged.groupby("_range").map_groups(gaps, batch_format="pandas")
    if ns_factor != 1:
        def rescale(b: pa.Table) -> pa.Table:
            i = b.schema.get_field_index(out_col)
            return b.set_column(i, out_col,
                                pc.divide(b[out_col],
                                          pa.scalar(ns_factor, pa.int64())))

        res = res.map_batches(rescale, batch_format="pyarrow",
                              zero_copy_batch=True)
    return res


# ---------------------------------------------------- cumulative aggregates
def cumulative_agg(ds, key: str, ts_col: str, value_col: str,
                   tiebreak: list[str] | None = None, buckets: int = 32,
                   chunk_ranges: int | None = None,
                   sample_limit: int = 10_000):
    """Running (cumulative) aggregate per key: for every row, the sum of
    ``value_col`` and the 1-based row index over all rows of the same key
    up to and including it, ordered by (ts, tiebreak...) — SQL
    ``sum(v) OVER (PARTITION BY key ORDER BY ts, tie... ROWS UNBOUNDED
    PRECEDING)`` and ``row_number() OVER (...)``. Pass an integer value
    column (e.g. exact micros) for a bit-stable, order-independent result;
    tiebreak columns must make the ordering unique per key.

    Distributed shape (default): same as rolling_agg — ONE hash-bucket
    shuffle on the key, then vectorized sort + groupby(key).cumsum() /
    cumcount() over the whole bucket. Partitioning assumption: one key's
    rows fit a task. Appends ``cum_sum`` and ``row_idx``.

    HOT-KEY OVERFLOW PATH (``chunk_ranges=N``): when a single key's rows
    exceed one task's memory, partition by TIME RANGE instead of key —
    sampled ts boundaries → per-(key, range) Count/Sum partials (map-side
    combined, one tiny table) → exclusive prefix offsets per key → one
    groupby(range) pass adds each chunk's local cumsum to its key's
    carried offset. Every task now holds rows/N of the stream regardless
    of key skew; equal-ts rows always share a range, so the (ts, tie...)
    order is exact across chunk boundaries. The offsets table is
    keys × N rows (ships to each chunk task) — use this path when a few
    huge keys dominate, the default path when the key domain is huge but
    individually small. Integer value columns stay exact; float sums can
    differ from the single-pass result in last-ulp rounding."""
    tiebreak = tiebreak or []
    if chunk_ranges:
        return _cumulative_agg_chunked(ds, key, ts_col, value_col, tiebreak,
                                       chunk_ranges, sample_limit)

    def tag(batch: pa.Table) -> pa.Table:
        b = (hash64(batch[key], seed=61) % np.uint64(buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    order = [key, ts_col] + tiebreak

    def accumulate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        g = g.drop(columns=["_bucket"])
        if len(g):
            grp = g.groupby(key, sort=False)
            g["cum_sum"] = grp[value_col].cumsum()
            g["row_idx"] = grp.cumcount().to_numpy() + 1
        else:
            g["cum_sum"] = np.array([], dtype=np.float64)
            g["row_idx"] = np.array([], dtype=np.int64)
        return g

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(accumulate,
                                                batch_format="pandas")


def _cumulative_agg_chunked(ds, key: str, ts_col: str, value_col: str,
                            tiebreak: list[str], chunk_ranges: int,
                            sample_limit: int):
    """Two-pass range-chunked cumulative aggregate — see cumulative_agg's
    hot-key-overflow docs."""
    from ray.data.aggregate import Count, Sum

    from .ops import _assign_range_fn, _sample_range_bounds

    bounds = _sample_range_bounds(ds, ts_col, chunk_ranges, sample_limit)
    tagged = ds.map_batches(_assign_range_fn(bounds, ts_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    # consumed twice (partials + final pass): object-store resident, never
    # the driver
    tagged = tagged.materialize()
    partials = (tagged.select_columns([key, "_range", value_col])
                .groupby([key, "_range"])
                .aggregate(Count(alias_name="_n"),
                           Sum(value_col, alias_name="_s"))
                .to_pandas().sort_values([key, "_range"]))
    grp = partials.groupby(key, sort=False)
    partials["_coff"] = grp["_n"].cumsum() - partials["_n"]
    partials["_soff"] = grp["_s"].cumsum() - partials["_s"]
    offsets = partials[[key, "_range", "_coff", "_soff"]]

    order = [key, ts_col] + tiebreak

    def accumulate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort").reset_index(drop=True)
        r = int(g["_range"].iloc[0])
        ggrp = g.groupby(key, sort=False)
        local_cs = ggrp[value_col].cumsum().to_numpy()
        local_ix = ggrp.cumcount().to_numpy() + 1
        off_r = offsets[offsets["_range"] == r]
        j = g[[key]].merge(off_r, on=key, how="left")
        g = g.drop(columns=["_range"])
        g["cum_sum"] = local_cs + j["_soff"].fillna(0).to_numpy()
        g["row_idx"] = local_ix + j["_coff"].fillna(0).to_numpy().astype(
            np.int64)
        return g

    return tagged.groupby("_range").map_groups(accumulate,
                                               batch_format="pandas")


# ----------------------------------------------------------- funnel analysis
def funnel_counts(ds, user_col: str, ts_col: str, type_col: str,
                  stages: list[str]):
    """Ordered-funnel analysis: for each prefix of ``stages``, how many
    users performed every stage in strict temporal order (first occurrence
    of stage i strictly after the first occurrence of stage i−1) — the SQL
    min(CASE WHEN type=s THEN ts END)-per-user + chained-comparison shape.

    Distributed: first-occurrence timestamps per (user, stage) via one
    map-side-combined groupby of conditional-null Min aggregates (ts as
    int64 ticks; nulls skipped by Min); prefix flags derive vectorized per
    batch; one global Sum per stage collapses to |stages| numbers. The
    per-user table never leaves the cluster and the final row is O(1)."""
    from ray.data.aggregate import Min, Sum

    import pandas as pd
    import ray.data as rd

    def derive(b: pa.Table) -> pa.Table:
        ticks = pc.cast(b[ts_col], pa.int64())
        cols = {user_col: b[user_col]}
        for i, s in enumerate(stages):
            cols[f"_ts{i}"] = pc.if_else(
                pc.equal(b[type_col], pa.scalar(s)), ticks,
                pa.scalar(None, pa.int64()))
        return pa.table(cols)

    per_user = (
        ds.select_columns([user_col, ts_col, type_col])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(user_col)
        .aggregate(*[Min(f"_ts{i}", alias_name=f"_m{i}")
                     for i in range(len(stages))])
    )

    def flags(b: pa.Table) -> pa.Table:
        reached = pc.is_valid(b["_m0"])
        out = {"_f0": pc.cast(reached, pa.int64())}
        for i in range(1, len(stages)):
            step = pc.greater(b[f"_m{i}"], b[f"_m{i-1}"])
            step = pc.fill_null(step, False)
            reached = pc.and_(reached, step)
            out[f"_f{i}"] = pc.cast(reached, pa.int64())
        return pa.table(out)

    row = per_user.map_batches(flags, batch_format="pyarrow").aggregate(
        *[Sum(f"_f{i}", alias_name=f"n{i}") for i in range(len(stages))])
    return rd.from_pandas(pd.DataFrame({
        "stage_idx": pd.array(range(len(stages)), dtype="int64"),
        "stage": stages,
        "n_users": pd.array([int(row[f"n{i}"] or 0)
                             for i in range(len(stages))], dtype="int64"),
    }))


# ------------------------------------------------------------------ NTILE
def ntile_agg(ds, keys: list[str], value_col: str, tiebreak: list[str],
              n_tiles: int, aggs: dict[str, str] | None = None):
    """Exact SQL NTILE bucketing with per-tile aggregates: rows of each
    group are ranked by (value_col, *tiebreak) ascending — a TOTAL order,
    so tile membership is deterministic and engine-portable — and split
    into ``n_tiles`` buckets where the first count % n buckets hold one
    extra row (SQL NTILE semantics). Output: one row per (keys, tile) with
    n rows and the requested aggregates of value_col (default n + sum).

    Distributed shape: one shuffle (groupby keys), one vectorized pandas
    pass per group. NTILE is inherently a per-group total sort; at scale
    the group must fit one task (same constraint as SQL engines'
    partition-local window sort) — range-partition the value inside hot
    groups first if a single group outgrows a task."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be ≥ 1")
    aggs = aggs or {"n": "count", "sum_value": "sum"}

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col] + tiebreak, kind="mergesort")
        c = len(g)
        n = min(n_tiles, max(c, 1))
        size_small, n_big = divmod(c, n)
        r = np.arange(c, dtype=np.int64)
        cut = n_big * (size_small + 1)
        tile = np.where(
            r < cut,
            r // max(size_small + 1, 1),
            n_big + (r - cut) // max(size_small, 1),
        ) + 1
        g = g.assign(tile=tile)
        out = {k: [] for k in keys}
        res = {"tile": []}
        for name in aggs:
            res[name] = []
        for t, sub in g.groupby("tile", sort=True):
            for k in keys:
                out[k].append(sub[k].iloc[0])
            res["tile"].append(int(t))
            for name, how in aggs.items():
                v = sub[value_col]
                res[name].append(len(sub) if how == "count"
                                 else getattr(v, how)())
        return pd.DataFrame({**out, **res})

    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


# ------------------------------------------------- generic SQL window funcs
_WINDOW_RANKERS = ("row_number", "rank", "dense_rank",
                   "percent_rank", "cume_dist")
_WINDOW_CUMAGGS = ("sum", "count", "min", "max", "avg")
# navigation funcs: LAG/LEAD take (col, offset); FIRST/LAST_VALUE take col.
# LAG/LEAD ignore framing entirely; FIRST_VALUE over the default frame is
# the partition's first value, LAST_VALUE the current peer group's last.
_WINDOW_NAV = ("lag", "lead", "first_value", "last_value", "nth_value")


def partitioned_window(ds, key: str | list[str],
                       order_by: list[tuple[str, bool]],
                       specs: list[dict], buckets: int = 32,
                       frame: tuple | None = None):
    """Generic SQL window functions over one PARTITION BY key (a single
    column or a composite list) and one shared ORDER BY spec — the
    execution target of the SQL router's
    ``FUNC(...) OVER (PARTITION BY k[, k2…] ORDER BY c [DESC], ...)`` items.

    ``order_by``: ``[(col, desc), ...]``; ``specs``: ``[{"func": f,
    "col": c_or_None, "alias": a, "offset": n_opt}, ...]`` with f in
    ROW_NUMBER / RANK / DENSE_RANK / SUM / COUNT / MIN / MAX / AVG /
    LAG / LEAD / FIRST_VALUE / LAST_VALUE (offset applies to LAG/LEAD,
    default 1).

    Semantics match ANSI/DuckDB defaults exactly:
    - ranking funcs rank over the full partition; RANK/DENSE_RANK are
      peer-invariant (deterministic under ties); ROW_NUMBER is
      deterministic only when the ORDER BY is total per partition —
      the caller's contract, same as in any SQL engine.
    - cumulative aggregates use the default frame ``RANGE BETWEEN
      UNBOUNDED PRECEDING AND CURRENT ROW``: peer rows (equal on ALL
      order columns) share one frame result, implemented as a rows-frame
      running agg smeared to the LAST row of each peer group.

    ``frame``: None for the ANSI default (RANGE UNBOUNDED PRECEDING …
    CURRENT ROW — peers share frame results), or ``("rows", n_or_None,
    0)`` for ``ROWS BETWEEN {n|UNBOUNDED} PRECEDING AND CURRENT ROW`` —
    per-ROW frames (ties do NOT share), cumulative aggregates only;
    bounded frames run as vectorized per-key rolling scans.

    Distributed shape (the family idiom): ONE hash-bucket shuffle on the
    key, then a single vectorized pandas/numpy sort + prefix-scan pass per
    bucket — every window column for every key in the bucket computed in
    one pass, no per-key tasks. Partitioning assumption: one key's rows
    fit a task (see cumulative_agg's ``chunk_ranges`` for the hot-key
    overflow idiom when they don't). Appends one column per spec alias;
    input columns pass through unchanged."""
    if frame is not None:
        if frame[0] != "rows" or not (
                frame[2] is None
                or (isinstance(frame[2], int) and frame[2] >= 0)):
            raise ValueError(
                "frame supports ('rows', n_or_None, m_or_None) — ROWS "
                "BETWEEN {n|UNBOUNDED} PRECEDING AND {CURRENT ROW|m|"
                "UNBOUNDED FOLLOWING}")
        bad = [s["func"] for s in specs if s["func"] not in _WINDOW_CUMAGGS]
        if bad:
            raise ValueError(f"a ROWS frame applies to cumulative "
                             f"aggregates only, got {bad}")
        if not order_by:
            raise ValueError("a ROWS frame requires ORDER BY")
    for s in specs:
        f = s["func"]
        if (f not in _WINDOW_RANKERS and f not in _WINDOW_CUMAGGS
                and f not in _WINDOW_NAV and f != "ntile"):
            raise ValueError(f"unsupported window function {f!r}")
        if ((f in _WINDOW_CUMAGGS and f != "count") or f in _WINDOW_NAV) \
                and not s.get("col"):
            raise ValueError(f"window {f} requires a value column")
        if f == "ntile" and not (s.get("offset") or 0) >= 1:
            raise ValueError("ntile requires a positive tile count")
    if not order_by:
        # ORDER-BY-less OVER (PARTITION BY k): the frame is the FULL
        # partition (all rows are peers), well-defined only for the
        # cumulative aggregates — order-dependent functions would be
        # nondeterministic, as in any engine that refuses them
        bad = [s["func"] for s in specs if s["func"] not in _WINDOW_CUMAGGS]
        if bad:
            raise ValueError(f"window funcs {bad} require ORDER BY; only "
                             "SUM/COUNT/AVG/MIN/MAX may omit it "
                             "(full-partition frame)")
    key_cols = [key] if isinstance(key, str) else list(key)
    # empty key = GLOBAL window (OVER (ORDER BY …) / OVER ()): a constant
    # synthetic key makes the whole table ONE partition. Inherently a
    # global operation (every row's frame may span the full input), so it
    # lands in one task — fine for the post-filter/post-join row counts
    # windows run over; for global RANKING at raw-input scale use the
    # range-partitioned two-pass (rank_table / with_row_number) instead.
    global_window = not key_cols
    if global_window:
        key_cols = ["_gwkey"]
    ord_cols = [c for c, _ in order_by]
    ascending = [True] * len(key_cols) + [not d for _, d in order_by]
    peer_cols = key_cols + ord_cols

    def tag(batch: pa.Table) -> pa.Table:
        if global_window:
            batch = batch.append_column(
                "_gwkey", pa.chunked_array([pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64))]))
        h = hash64(batch[key_cols[0]], seed=67)
        for j, kc in enumerate(key_cols[1:], start=1):
            # mix per-column hashes so composite keys spread evenly
            h = (h * np.uint64(0x9E3779B97F4A7C15)) ^                 hash64(batch[kc], seed=67 + j)
        b = (h % np.uint64(buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(peer_cols, ascending=ascending,
                          kind="mergesort").reset_index(drop=True)
        g = g.drop(columns=["_bucket"])
        n = len(g)
        if n == 0:
            for s in specs:
                if s["func"] in _WINDOW_NAV:
                    g[s["alias"]] = g[s["col"]]     # empty, input dtype
                else:
                    dt = (np.int64 if s["func"] in
                          ("row_number", "rank", "dense_rank", "count",
                           "ntile") else np.float64)
                    g[s["alias"]] = np.array([], dtype=dt)
            return (g.drop(columns=["_gwkey"]) if global_window else g)
        # boundary masks over the SORTED frame (all numpy from here).
        # SQL treats NULL partition/order keys as one group of peers, but
        # pandas .ne() says NaN != NaN — mask out the both-null case so a
        # run of null-keyed rows forms ONE partition, not one per row
        def _changed(cols: list) -> np.ndarray:
            kf = g[cols]
            diff = kf.ne(kf.shift()) & ~(kf.isna() & kf.shift().isna())
            return diff.any(axis=1).to_numpy()

        new_key = _changed(key_cols)
        new_key[0] = True      # row 0 always opens a partition (the
        #                        both-null mask would clear it otherwise)
        new_peer = new_key | _changed(ord_cols)
        rn = np.arange(n, dtype=np.int64) \
            - np.maximum.accumulate(
                np.where(new_key, np.arange(n, dtype=np.int64), 0)) + 1
        peer_ord = new_peer.cumsum() - 1               # 0-based peer group id
        peer_first = np.flatnonzero(new_peer)          # first row per peer
        peer_last = np.flatnonzero(np.append(new_peer[1:], True))

        def smear_last(arr: np.ndarray) -> np.ndarray:
            # default RANGE frame: every peer row takes the running value
            # at the LAST row of its peer group
            return arr[peer_last[peer_ord]]

        grp = None
        for s in specs:
            f, c, a = s["func"], s.get("col"), s["alias"]
            if f == "row_number":
                g[a] = rn
            elif f == "rank":
                g[a] = rn[peer_first[peer_ord]]
            elif f == "dense_rank":
                key_ord = new_key.cumsum() - 1
                key_first = np.flatnonzero(new_key)
                g[a] = peer_ord - peer_ord[key_first[key_ord]] + 1
            elif f == "percent_rank":
                key_ord = new_key.cumsum() - 1
                key_last = np.flatnonzero(np.append(new_key[1:], True))
                cnt = rn[key_last[key_ord]].astype(np.float64)
                rank_v = rn[peer_first[peer_ord]].astype(np.float64)
                # SQL: (rank - 1)/(count - 1); 0 for one-row partitions
                g[a] = np.where(cnt > 1, (rank_v - 1.0)
                                / np.maximum(cnt - 1.0, 1.0), 0.0)
            elif f == "cume_dist":
                key_ord = new_key.cumsum() - 1
                key_last = np.flatnonzero(np.append(new_key[1:], True))
                cnt = rn[key_last[key_ord]].astype(np.float64)
                # rows ≤ current peer group = rn at the peer group's last
                g[a] = rn[peer_last[peer_ord]].astype(np.float64) / cnt
            elif f == "ntile":
                nt = int(s["offset"])
                key_ord = new_key.cumsum() - 1
                key_last = np.flatnonzero(np.append(new_key[1:], True))
                cnt = rn[key_last[key_ord]]       # partition row count
                # SQL NTILE: the first cnt % n tiles get one extra row
                size_small = cnt // nt
                n_big = cnt % nt
                cut = n_big * (size_small + 1)
                r0 = rn - 1
                g[a] = np.where(
                    r0 < cut,
                    r0 // np.maximum(size_small + 1, 1),
                    n_big + (r0 - cut) // np.maximum(size_small, 1),
                ) + 1
            elif f in ("lag", "lead"):
                off = int(s.get("offset") or 1)
                if grp is None:
                    grp = g.groupby(key_cols, sort=False, dropna=False)
                shifted = grp[c].shift(off if f == "lag" else -off)
                dflt = s.get("default")
                if dflt is not None:
                    # SQL default fills only where the offset row does
                    # not EXIST in the partition — an existing NULL
                    # offset row stays NULL (so no blanket fillna)
                    pos = grp.cumcount().to_numpy()
                    if f == "lag":
                        missing = pos < off
                    else:
                        size = grp[c].transform("size").to_numpy()
                        missing = pos >= size - off
                    vals = shifted.to_numpy(copy=True)
                    vals[missing] = dflt
                    if (pd.api.types.is_integer_dtype(g[c].dtype)
                            and isinstance(dflt, int)
                            and not pd.isna(vals).any()):
                        vals = vals.astype("int64")
                    shifted = vals
                g[a] = shifted
            elif f == "first_value":
                key_ord = new_key.cumsum() - 1
                key_first = np.flatnonzero(new_key)
                g[a] = g[c].to_numpy()[key_first[key_ord]]
            elif f == "last_value":
                g[a] = smear_last(g[c].to_numpy())
            elif f == "nth_value":
                # NTH_VALUE(col, k) under the ANSI default frame: the
                # value at the k-th row of the partition, but only once
                # the frame (… CURRENT ROW, peers included) has reached
                # that row — earlier rows get NULL, as in DuckDB
                k = int(s.get("offset") or 1)
                key_ord = new_key.cumsum() - 1
                kfirst = np.flatnonzero(new_key)[key_ord]
                pos = kfirst + (k - 1)
                frame_end = peer_last[peer_ord]
                vis = pos <= frame_end
                vals = pd.Series(
                    g[c].to_numpy()[np.where(vis, pos, 0)], index=g.index)
                g[a] = vals.where(vis)
            else:
                if grp is None:
                    grp = g.groupby(key_cols, sort=False, dropna=False)
                kseries = [g[kc] for kc in key_cols]

                def nullsafe(scan: pd.Series) -> np.ndarray:
                    # SQL aggs ignore NULLs: a null row carries the
                    # preceding running value (per key); a frame of only
                    # nulls stays NULL (ffill from nothing is NaN)
                    return (scan.groupby(kseries, sort=False, dropna=False).ffill()
                            .to_numpy())

                def roll_vals(series: pd.Series, w: int,
                              how: str) -> np.ndarray:
                    # bounded ROWS frame: one vectorized per-key rolling
                    # scan (pandas skips NaN inside the window, so SQL's
                    # null semantics — incl. all-null frame → NULL — hold)
                    r = (series.groupby(kseries, sort=False, dropna=False)
                         .rolling(w, min_periods=1))
                    out = getattr(r, how)()
                    # result index = (key…, original position); restore
                    return (out.droplevel(list(range(len(key_cols))))
                            .sort_index().to_numpy())

                # frame semantics: None → ANSI default RANGE (peer rows
                # share the frame result → smear); ROWS → per-row frames
                fin = smear_last if frame is None else (lambda x: x)
                if frame is not None and frame[2] != 0:
                    # two-sided ROWS frame [i-lo, i+hi] (hi None =
                    # UNBOUNDED FOLLOWING), clamped to the partition.
                    # SUM/AVG/COUNT: exact frame endpoints from ONE
                    # cumulative pass (prefix sums indexed at the clamped
                    # absolute positions — int-valued columns stay exact
                    # in float64 below 2^53); MIN/MAX: the frame splits
                    # at i into a backward window and a forward window
                    # (reversed per-key rolling), overlapping at i —
                    # harmless for min/max — combined with np.fmin/fmax
                    # (NaN-ignoring, so all-null frames stay NULL)
                    lo, hi = frame[1], frame[2]
                    idx = np.arange(n, dtype=np.int64)
                    key_ord2 = new_key.cumsum() - 1
                    kfirst = np.flatnonzero(new_key)[key_ord2]
                    klast = np.flatnonzero(
                        np.append(new_key[1:], True))[key_ord2]
                    i0 = (kfirst if lo is None
                          else np.maximum(idx - int(lo), kfirst))
                    j1 = (klast if hi is None
                          else np.minimum(idx + int(hi), klast))
                    if f == "count" and c is None:
                        g[a] = (j1 - i0 + 1).astype(np.int64)
                    elif f in ("sum", "avg", "count"):
                        vals = g[c].to_numpy(dtype=np.float64,
                                             na_value=np.nan)
                        valid = ~np.isnan(vals)
                        cs0 = np.concatenate(
                            ([0.0], np.cumsum(np.where(valid, vals, 0.0))))
                        cn0 = np.concatenate(
                            ([0], np.cumsum(valid.astype(np.int64))))
                        fsum = cs0[j1 + 1] - cs0[i0]
                        fcnt = cn0[j1 + 1] - cn0[i0]
                        if f == "count":
                            g[a] = fcnt
                        elif f == "sum":
                            g[a] = np.where(fcnt > 0, fsum, np.nan)
                        else:
                            g[a] = np.where(
                                fcnt > 0, fsum / np.maximum(fcnt, 1),
                                np.nan)
                    else:                       # min / max
                        if lo is None:
                            back = nullsafe(getattr(grp[c],
                                                    f"cum{f}")())
                        else:
                            back = roll_vals(g[c], int(lo) + 1, f)
                        sr = g[c].iloc[::-1].reset_index(drop=True)
                        kr = [ks.iloc[::-1].reset_index(drop=True)
                              for ks in kseries]
                        gb = sr.groupby(kr, sort=False, dropna=False)
                        if hi is None:
                            # suffix scan; ffill carries the running
                            # value over null rows (pandas cum* leaves
                            # NaN at null positions), mirroring nullsafe
                            fscan = getattr(gb, f"cum{f}")()
                            fwd = (fscan.groupby(kr, sort=False,
                                                 dropna=False)
                                   .ffill().to_numpy()[::-1])
                        else:
                            r = gb.rolling(int(hi) + 1, min_periods=1)
                            fwd = (getattr(r, f)()
                                   .droplevel(list(range(len(key_cols))))
                                   .sort_index().to_numpy())[::-1]
                        comb = (np.fmin if f == "min" else np.fmax)(
                            np.asarray(back, dtype=np.float64),
                            np.asarray(fwd, dtype=np.float64))
                        g[a] = comb
                    continue
                bounded_w = (int(frame[1]) + 1
                             if frame is not None and frame[1] is not None
                             else None)
                if bounded_w is not None:
                    if f == "count":
                        if c is None:
                            g[a] = np.minimum(rn, bounded_w)
                        else:
                            g[a] = roll_vals(
                                g[c].notna().astype(np.float64),
                                bounded_w, "sum").astype(np.int64)
                    else:
                        g[a] = roll_vals(
                            g[c], bounded_w,
                            {"sum": "sum", "min": "min", "max": "max",
                             "avg": "mean"}[f])
                elif f == "count":
                    run = rn if c is None else (
                        g[c].notna().groupby(kseries, sort=False, dropna=False)
                        .cumsum().to_numpy())
                    g[a] = fin(np.asarray(run, dtype=np.int64))
                elif f == "sum":
                    g[a] = fin(nullsafe(grp[c].cumsum()))
                elif f == "min":
                    g[a] = fin(nullsafe(grp[c].cummin()))
                elif f == "max":
                    g[a] = fin(nullsafe(grp[c].cummax()))
                else:  # avg over the frame
                    cs = fin(nullsafe(grp[c].cumsum()).astype(np.float64))
                    ct = fin(
                        g[c].notna().groupby(kseries, sort=False, dropna=False)
                        .cumsum().to_numpy().astype(np.float64))
                    g[a] = cs / ct
        return (g.drop(columns=["_gwkey"]) if global_window else g)

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(per_bucket,
                                                batch_format="pandas")
