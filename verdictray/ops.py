"""Stateless vectorized batch transforms (SURVEY.md §2.2, §2.6, §2.7).

All functions here are either ``pa.Table → pa.Table`` batch fns for
``ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)`` or
helpers returning such fns. Zero-copy batches are read-only — columns are
always appended/replaced, never mutated in place (SURVEY.md §4.5).

sha256 runs on the Arrow string buffers directly (offset slicing into the
data buffer — no per-row str/bytes round-trip); everything else uses
pyarrow.compute kernels. No Python-per-row loops except the unavoidable
hashlib calls (sha256 has no vectorized kernel anywhere in the stack).

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketches.hashing import hash64


# --------------------------------------------------------------- sha256
def sha256_hex_column(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Per-row sha256 hex of a string column, reading the Arrow buffers
    directly (no intermediate Python strings for the content).

    Output construction is also buffer-level: raw digests accumulate into
    ONE contiguous scratch buffer per chunk, hex-encode in a single
    binascii.hexlify call, and the Arrow string array is assembled from
    that buffer plus an arange offsets vector — 3 allocations per chunk
    instead of one 64-char Python str + list slot + Arrow copy PER ROW
    (~2 GB of transient Python objects per 16M-row run in the hottest
    stage of the flagship job)."""
    import binascii

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts: list[pa.Array] = []
    for chunk in chunks:
        t = chunk.type
        n = len(chunk)
        large = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
        plain = pa.types.is_string(t) or pa.types.is_binary(t)
        # int32 utf8 offsets cap one output chunk at 2^31 bytes (33M rows
        # of 64-hex) — Ray blocks are orders of magnitude smaller
        if chunk.null_count or not (large or plain) or 64 * (n + 1) >= 2**31:
            # null-aware / unknown-layout fallback: per-row bytes round-trip
            bin_t = pa.large_binary() if large else pa.binary()
            out = [hashlib.sha256(b).hexdigest() if b is not None else None
                   for b in chunk.cast(bin_t).to_pylist()]
            parts.append(pa.array(out, type=pa.string()))
            continue
        bufs = chunk.buffers()
        # large_string/large_binary carry int64 offsets; reading them as
        # int32 would silently hash empty slices for every row.
        off_dtype = np.int64 if large else np.int32
        offs = np.frombuffer(bufs[1], dtype=off_dtype, count=chunk.offset + n + 1)
        data = memoryview(bufs[2])
        o = chunk.offset
        digests = bytearray(32 * n)
        dv = memoryview(digests)
        _sha = hashlib.sha256
        for i in range(n):
            dv[32 * i : 32 * i + 32] = _sha(data[offs[o + i] : offs[o + i + 1]]).digest()
        hexbytes = binascii.hexlify(digests)
        out_offs = np.arange(0, 64 * (n + 1), 64, dtype=np.int32)
        parts.append(pa.Array.from_buffers(
            pa.utf8(), n,
            [None, pa.py_buffer(out_offs), pa.py_buffer(hexbytes)]))
    if len(parts) == 1:
        return parts[0]
    return pa.chunked_array(parts, type=pa.string())


def with_sha256(batch: pa.Table, content_col: str = "content",
                out_col: str = "content_sha256") -> pa.Table:
    """Append the per-row sha256 hex — the invariant carried end-to-end
    (BASELINE.json input_hint: "content sha256 equality"). Idempotent:
    a batch that already carries the column passes through unchanged."""
    if out_col in batch.schema.names:
        return batch
    return batch.append_column(out_col, sha256_hex_column(batch[content_col]))


def verify_sha256(batch: pa.Table, content_col: str = "content",
                  sha_col: str = "content_sha256") -> pa.Table:
    """Recompute sha256 and assert equality with the carried column —
    the pipeline-exit invariant check (SURVEY.md §2.2)."""
    recomputed = sha256_hex_column(batch[content_col])
    ok = pc.equal(recomputed, batch[sha_col])
    if not pc.all(ok).as_py():
        bad = batch.filter(pc.invert(ok))
        raise AssertionError(
            f"sha256 invariant violated for {len(bad)} rows, e.g. "
            f"{bad.slice(0, 1).to_pylist()}"
        )
    return batch


def count_sha256_mismatches(batch: pa.Table, content_col: str = "content",
                            sha_col: str = "content_sha256") -> pa.Table:
    """Counting (non-raising) variant for reporting."""
    recomputed = sha256_hex_column(batch[content_col])
    bad = int(pc.sum(pc.cast(pc.not_equal(recomputed, batch[sha_col]), pa.int64())).as_py() or 0)
    return pa.table({"rows": [len(batch)], "mismatches": [bad]})


# --------------------------------------------------------------- features
def derive_features(batch: pa.Table, content_col: str = "content") -> pa.Table:
    """Append n_bytes / n_lines — numeric inputs for the quantile sketches.
    Idempotent, like with_sha256."""
    if "n_bytes" in batch.schema.names:
        return batch
    content = batch[content_col]
    n_bytes = pc.binary_length(pc.cast(content, pa.binary()))
    n_lines = pc.add(pc.count_substring(content, "\n"), 1)
    batch = batch.append_column("n_bytes", pc.cast(n_bytes, pa.int64()))
    return batch.append_column("n_lines", pc.cast(n_lines, pa.int64()))


def normalize_lang(batch: pa.Table, lang_col: str = "lang",
                   aliases: dict[str, str] | None = None) -> pa.Table:
    """Canonicalize the grouping key before the shuffle: strip + lower +
    alias map (hot-key grouping on lang, BASELINE.json north_star)."""
    lang = pc.utf8_lower(pc.utf8_trim_whitespace(batch[lang_col]))
    if aliases:
        # vectorized alias replacement via dictionary round-trip
        darr = pc.dictionary_encode(lang)
        chunks = []
        for chunk in (darr.chunks if isinstance(darr, pa.ChunkedArray) else [darr]):
            dic = [aliases.get(v, v) for v in chunk.dictionary.to_pylist()]
            chunks.append(
                pa.DictionaryArray.from_arrays(chunk.indices, pa.array(dic, pa.string()))
                .cast(pa.string())
            )
        lang = pa.chunked_array(chunks)
    return batch.set_column(batch.schema.get_field_index(lang_col), lang_col, lang)


def _normalize_props_type(vals, out_type):
    """Pin parse_props' output type so the NDJSON fast path, the per-row
    fallback, and every batch of one dataset agree (pyarrow.json infers
    per batch: '2021-01-01' → timestamp in one batch, all-int vs mixed
    numerics → int64 vs double across batches — both break downstream
    block unification and diverge from json.loads semantics).

    Rules with out_type=None: temporal inference is REJECTED (raises →
    the caller's per-row json.loads fallback keeps such values as the
    original strings, matching JSON semantics); any numeric → float64
    (JSON numbers are doubles; stops int64/double flapping across
    batches); untyped nulls → float64 nulls. Pass out_type explicitly
    for string-valued or heterogeneous props."""
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if out_type is not None:
        return pc.cast(vals, out_type)
    t = vals.type
    if pa.types.is_temporal(t):
        raise TypeError("temporal inference — use per-row string parse")
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_null(t):
        return pc.cast(vals, pa.float64())
    return vals


def parse_props(batch: pa.Table, props_col: str = "props", key: str = "k",
                out_col: str = "props_k", out_type=None) -> pa.Table:
    """JSON-string column → typed value (driver events.props is JSON).

    Vectorized: nulls fill to '{}', a per-row '\\n' is appended with one
    Arrow kernel, and the combined chunk's contiguous DATA BUFFER is then
    by construction an NDJSON document — parsed in one pyarrow.json call
    (valid JSON cannot contain a raw newline, so the framing is safe).
    Falls back to the per-row loop on malformed input or when pyarrow's
    type inference disagrees with json.loads semantics (date-shaped
    strings). Output type is pinned by _normalize_props_type so every
    batch and both parse paths yield one consistent dtype."""
    col = batch[props_col]
    try:
        import io as _io

        import pyarrow.json as pj

        filled = pc.fill_null(pc.cast(col, pa.string()), "{}")
        framed = pc.binary_join_element_wise(filled, "", "\n")
        arr = (framed.combine_chunks()
               if isinstance(framed, pa.ChunkedArray) else framed)
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int32,
                             count=arr.offset + len(arr) + 1)
        ndjson = bufs[2].to_pybytes()[offs[arr.offset]:offs[-1]]
        parsed = pj.read_json(_io.BytesIO(ndjson))
        vals = (parsed[key] if key in parsed.schema.names
                else pa.nulls(len(batch)))
        if len(vals) != len(batch):
            raise ValueError("row-count mismatch after NDJSON parse")
        vals = _normalize_props_type(vals, out_type)
    except Exception:  # malformed rows / rejected inference: per-row exact
        vals = pa.array([
            (json.loads(s).get(key) if s is not None else None)
            for s in col.to_pylist()
        ])
        vals = _normalize_props_type(vals, out_type)
    return batch.append_column(out_col, vals)


# --------------------------------------------------------------- salting / sampling
def add_salt(batch: pa.Table, on: str = "content_sha256", salts: int = 16,
             out_col: str = "_salt") -> pa.Table:
    """Deterministic salt = hash64(on) % salts. Combined with the group key
    this splits hot keys across `salts` reduce partitions (stage A of the
    two-stage salted aggregation, SURVEY.md §3.1); deterministic so runs
    are reproducible and resumable."""
    h = hash64(batch[on], seed=7)
    salt = (h % np.uint64(salts)).astype(np.int32)
    return batch.append_column(out_col, pa.array(salt))


def sample_sha(batch: pa.Table, on: str, hex_lt: str) -> pa.Table:
    """Portable deterministic sample: keep rows where the hex sha256 of
    ``on`` (cast to its decimal string form) sorts below ``hex_lt``.
    Hex-lexicographic compare == numeric compare, so ``hex_lt="2"`` keeps
    ~2/16 of rows. Unlike ``deterministic_sample`` (xxhash-based, faster),
    membership here is reproducible by ANY engine with sha256 — the DuckDB
    oracle uses ``WHERE sha256(CAST(k AS VARCHAR)) < '2'`` verbatim, and a
    resharded/resumed run keeps the identical row set."""
    keys = batch[on]
    if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
        keys = pc.cast(keys, pa.string())
    hexes = sha256_hex_column(keys)
    return batch.filter(pc.less(hexes, pa.scalar(hex_lt)))


def deterministic_sample(batch: pa.Table, on: str = "content_sha256",
                         rate: float = 0.1, seed: int = 1234) -> pa.Table:
    """Seeded hash-based row sample — the reproducible "sampled reference
    slice" for exact-answer calibration (BASELINE.json north_star). Unlike
    ds.random_sample, membership is a pure function of the row."""
    h = hash64(batch[on], seed=seed)
    keep = (h % np.uint64(1_000_000)) < np.uint64(int(rate * 1_000_000))
    return batch.filter(pa.array(keep))


# --------------------------------------------------------------- dedup
def dedup_exact(ds, key_col: str):
    """Exact dedup: first row per key — hash-partition + per-group first.
    One shuffle on key_col; at corpus scale run AFTER projecting content
    away (the sha256 carries identity), or use dedup_exact_narrow to keep
    full rows without shuffling them."""
    return ds.groupby(key_col).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def dedup_exact_narrow(ds, content_col: str, id_col: str, join_buckets: int = 32):
    """Scale-safe exact dedup that RETURNS full rows while only (id,
    fingerprint) pairs — 16 B/row — travel through the dedup shuffle:

      1. fingerprint each row (8-byte Rabin hash of content);
      2. groupby(fingerprint) → min(id) elects one deterministic winner
         per distinct content (narrow columns only);
      3. bucketed join of the winner-id set back against the corpus — the
         full rows move exactly once, in the join, and only the keepers.

    Winner choice (min id) is deterministic, so reruns/resumes keep the
    same representatives. Requires a unique id column."""
    from ray.data.aggregate import Min

    from .join import hash_join
    from .text import with_fingerprint

    fp = ds.map_batches(
        lambda b: with_fingerprint(b, col=content_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns([id_col, "fingerprint"])
    winners = fp.groupby("fingerprint").aggregate(Min(id_col, alias_name="_win_id"))
    win_ids = winners.select_columns(["_win_id"])
    joined = hash_join(ds, win_ids, id_col, "_win_id", buckets=join_buckets)
    return joined.drop_columns(["_win_id"])


def project(ds, columns: list[str]):
    """Column pruning — keep the streamed rows narrow after feature
    derivation (wide `content` strings dominate memory, SURVEY.md §7)."""
    return ds.select_columns(columns)


# ----------------------------------------------------------------- pivot
def pivot_counts(ds, keys: list[str], pivot_col: str, categories: list[str],
                 prefix: str = "n_"):
    """Pivot a categorical column into per-category count columns (SQL
    ``sum(CASE WHEN pivot = c THEN 1 END)``): one indicator column per
    category derived vectorized inside map_batches, then ONE groupby
    shuffle summing all indicators at once. Categories must be enumerated
    up front (the schema of a distributed pipeline is static); values
    outside ``categories`` count into none of the columns."""
    from ray.data.aggregate import Sum

    def indicators(batch: pa.Table) -> pa.Table:
        batch = batch.select(keys + [pivot_col])
        for c in categories:
            ind = pc.cast(pc.equal(batch[pivot_col], pa.scalar(c)), pa.int64())
            batch = batch.append_column(f"{prefix}{c}", pc.fill_null(ind, 0))
        return batch.drop_columns([pivot_col])

    wide = ds.map_batches(indicators, batch_format="pyarrow", zero_copy_batch=True)
    return wide.groupby(keys).aggregate(
        *[Sum(f"{prefix}{c}", alias_name=f"{prefix}{c}") for c in categories])


# ---------------------------------------------------- exact grouped quantiles
def grouped_quantiles_exact(ds, keys: list[str], value_col: str,
                            phis: list[float], out_col: str = "est"):
    """EXACT per-group discrete quantiles: for each phi, the smallest group
    value whose cumulative share >= phi (SQL ``quantile_disc``; numpy's
    ``inverted_cdf`` method — an actual data value, so results are
    bit-stable with no float arithmetic). This is the exact counterpart of
    the KLL sketch path for the same grouping: use it when one group's
    values fit a task (the groupby-shuffle co-locates each group); switch
    to KllAgg when they don't. One shuffle, one vectorized np.quantile per
    group for ALL phis at once."""
    phis_arr = np.asarray(sorted(phis), dtype=np.float64)

    def qtiles(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.quantile(g[value_col].to_numpy(), phis_arr,
                           method="inverted_cdf")
        out = {k: np.repeat(g[k].iloc[:1].to_numpy(), len(phis_arr))
               for k in keys}
        out["phi"] = phis_arr
        out[out_col] = vals
        return pd.DataFrame(out)

    narrow = ds.select_columns(keys + [value_col])
    return narrow.groupby(keys).map_groups(qtiles, batch_format="pandas")


# --------------------------------------------------------- grouped corr
def grouped_corr(ds, keys: list[str], x: str, y: str,
                 out_col: str = "corr", ndigits: int = 4):
    """Exact grouped Pearson correlation of two numeric columns via the
    five-sums identity: per-batch derived products feed built-in Sum/Count
    aggregates (map-side partial combine — only (keys, 6 doubles) cross the
    shuffle), then one vectorized pass over the small grouped result
    computes r = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ₛ)(n·Σy² − Σy²ₛ)).

    Numerics: raw-moment sums cancel catastrophically only when |r|'s
    variance term is ~1e-8 of the squared-sum magnitude; at double
    precision that needs n·mean² / variance ≳ 1e12 — far beyond the
    rounded output's sensitivity here. For ill-conditioned columns at
    extreme scale, shift x/y by an approximate mean first (the identity is
    shift-invariant). Output is rounded to ``ndigits`` (match the oracle's
    ``round(corr(x,y), n)``)."""
    from ray.data.aggregate import Count, Sum

    def derive(b: pa.Table) -> pa.Table:
        fx = pc.cast(b[x], pa.float64())
        fy = pc.cast(b[y], pa.float64())
        cols = {k: b[k] for k in keys}
        cols.update({"_x": fx, "_y": fy,
                     "_xy": pc.multiply(fx, fy),
                     "_x2": pc.multiply(fx, fx),
                     "_y2": pc.multiply(fy, fy)})
        return pa.table(cols)

    agg = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(
            Count(alias_name="n"),
            Sum("_x", alias_name="_sx"), Sum("_y", alias_name="_sy"),
            Sum("_xy", alias_name="_sxy"),
            Sum("_x2", alias_name="_sx2"), Sum("_y2", alias_name="_sy2"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.float64)
        sx = np.asarray(b["_sx"]); sy = np.asarray(b["_sy"])
        cov = n * np.asarray(b["_sxy"]) - sx * sy
        vx = n * np.asarray(b["_sx2"]) - sx * sx
        vy = n * np.asarray(b["_sy2"]) - sy * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            r = cov / np.sqrt(vx * vy)
        out = {k: b[k] for k in keys}
        out["n"] = b["n"]
        out[out_col] = pc.round(pa.array(r, pa.float64()), ndigits=ndigits,
                                round_mode="half_towards_infinity")
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------- stratified sampling
def sample_per_group(ds, key: str, id_col: str, k: int):
    """Deterministic stratified sample: the k rows per group whose
    sha256(id-as-string) hex sorts smallest (ties broken by id) — the SQL
    ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY sha256(id), id)
    <= k`` row set, reproducible by any engine.

    Distributed shape: a map-side combiner keeps at most k rows per
    (batch, group) BEFORE the shuffle, so only ~k · groups · blocks narrow
    (key, id, hash) rows move; the per-group reduce re-applies the same
    top-k. Output columns: (key, id_col)."""

    def local_topk(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if not pa.types.is_string(ids.type):
            ids = pc.cast(ids, pa.string())
        t = pa.table({key: b[key], id_col: b[id_col],
                      "_sha": sha256_hex_column(ids)})
        df = t.to_pandas()
        df = df.sort_values([key, "_sha", id_col], kind="mergesort")
        return pa.Table.from_pandas(df.groupby(key, sort=False).head(k),
                                    preserve_index=False)

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_sha", id_col], kind="mergesort").head(k)
        return g[[key, id_col]]

    return (ds.select_columns([key, id_col])
            .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(key)
            .map_groups(group_topk, batch_format="pandas"))


# ------------------------------------------------- grouped moment statistics
def grouped_moments(ds, keys: list[str], value_col: str, ndigits: int = 4):
    """Exact grouped dispersion/shape statistics — sample variance, stddev,
    skewness and excess kurtosis with the standard bias corrections (SQL
    ``var_samp`` / ``stddev_samp`` / ``skewness`` / ``kurtosis``) — via raw
    power sums: one per-batch derive appends v², v³, v⁴, built-in Sum/Count
    aggregates combine map-side, so only (keys, count + 4 doubles) cross
    the shuffle, then one vectorized finish pass reconstructs the central
    moments (M₂..M₄) from the raw sums and applies the corrections:

        skew = √(n(n−1))/(n−2) · (M₃/n)/(M₂/n)^{3/2}
        kurt = (n−1)/((n−2)(n−3)) · ((n+1)·((M₄/n)/(M₂/n)² − 3) + 6)

    Numerics: raw-moment cancellation error is ~1e−11 relative at these
    magnitudes (verified vs centered sums); the rounded output (ndigits)
    absorbs it — the same policy grouped_corr uses. Groups need n ≥ 4 for
    kurtosis (NaN below; emitted as null)."""
    from ray.data.aggregate import Count, Sum

    def derive(b: pa.Table) -> pa.Table:
        v = pc.cast(b[value_col], pa.float64())
        v2 = pc.multiply(v, v)
        cols = {k: b[k] for k in keys}
        cols.update({"_v": v, "_v2": v2,
                     "_v3": pc.multiply(v2, v),
                     "_v4": pc.multiply(v2, v2)})
        return pa.table(cols)

    agg = (
        ds.select_columns(keys + [value_col])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(
            Count(alias_name="n"),
            Sum("_v", alias_name="_s1"), Sum("_v2", alias_name="_s2"),
            Sum("_v3", alias_name="_s3"), Sum("_v4", alias_name="_s4"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.float64)
        s1 = np.asarray(b["_s1"]); s2 = np.asarray(b["_s2"])
        s3 = np.asarray(b["_s3"]); s4 = np.asarray(b["_s4"])
        mu = s1 / n
        m2 = s2 - s1 * mu
        m3 = s3 - 3.0 * mu * s2 + 2.0 * n * mu**3
        m4 = s4 - 4.0 * mu * s3 + 6.0 * mu * mu * s2 - 3.0 * n * mu**4
        with np.errstate(invalid="ignore", divide="ignore"):
            var = m2 / (n - 1.0)
            std = np.sqrt(var)
            g1 = (m3 / n) / (m2 / n) ** 1.5
            skew = np.sqrt(n * (n - 1.0)) / (n - 2.0) * g1
            g2 = (m4 / n) / (m2 / n) ** 2 - 3.0
            kurt = (n - 1.0) / ((n - 2.0) * (n - 3.0)) * ((n + 1.0) * g2 + 6.0)
        out = {k: b[k] for k in keys}
        out["n"] = b["n"]
        rnd = dict(ndigits=ndigits, round_mode="half_towards_infinity")
        for name, arr in (("mean_v", mu), ("var_v", var), ("std_v", std),
                          ("skew_v", skew), ("kurt_v", kurt)):
            out[name] = pc.round(
                pa.array(np.where(np.isfinite(arr), arr, np.nan), pa.float64(),
                         from_pandas=True), **rnd)
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ argmax / argmin row
def extrema_per_group(ds, keys: list[str], value_col: str,
                      tiebreak: list[str], mode: str = "max"):
    """Exact argmax/argmin ROW per group — the SQL
    ``row_number() OVER (PARTITION BY keys ORDER BY value [DESC],
    tiebreak...) = 1`` row set, with ascending tiebreak columns making the
    winner unique and engine-portable.

    Distributed shape: a per-batch vectorized top-1 combiner first shrinks
    every block to ≤ |distinct keys in block| candidate rows (lexsort +
    drop_duplicates — no Python row loop), so the groupby shuffle carries
    one candidate row per (key, block) instead of the full dataset; the
    final per-group pick then sees ≤ n_blocks rows. Hot groups therefore
    cost O(n_blocks), not O(group size)."""
    if mode not in ("max", "min"):
        raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
    order = [mode == "min"] + [True] * len(tiebreak)
    by = [value_col] + tiebreak

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(by, ascending=order, kind="mergesort")
                 .drop_duplicates(keys, keep="first"))

    cols = list(dict.fromkeys(keys + by))  # preserve order, dedupe
    return (ds.select_columns(cols)
            .map_batches(top1, batch_format="pandas")
            .groupby(keys)
            .map_groups(top1, batch_format="pandas"))


# --------------------------------------------------------- fixed histogram
def histogram_fixed(ds, value_col: str, width: float,
                    keys: list[str] | None = None):
    """Fixed-width histogram: bucket = floor(value/width) (SQL
    ``CAST(floor(v/w) AS BIGINT)``), count + exact integer-cents sum per
    bucket (and optional extra grouping keys). The bucket id is a derived
    column, so the whole thing is one map-side-combined groupby — the
    standard distributed histogram shape; bucket count is data-bounded,
    output is tiny."""
    from ray.data.aggregate import Count, Sum

    keys = keys or []

    def derive(b: pa.Table) -> pa.Table:
        v = pc.cast(b[value_col], pa.float64())
        bucket = pc.cast(pc.floor(pc.divide(v, pa.scalar(float(width)))),
                         pa.int64())
        cents = pc.cast(pc.round(pc.multiply(v, pa.scalar(100.0)),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        cols = {k: b[k] for k in keys}
        cols.update({"bucket": bucket, "_cents": cents})
        return pa.table(cols)

    agg = (
        ds.select_columns(keys + [value_col])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys + ["bucket"])
        .aggregate(Count(alias_name="n"), Sum("_cents", alias_name="_sc"))
    )

    def finish(b: pa.Table) -> pa.Table:
        out = {k: b[k] for k in keys}
        out["bucket"] = b["bucket"]
        out["bucket_lo"] = pc.multiply(pc.cast(b["bucket"], pa.float64()),
                                       pa.scalar(float(width)))
        out["n"] = b["n"]
        out["sum_value"] = pc.divide(pc.cast(b["_sc"], pa.float64()),
                                     pa.scalar(100.0))
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- continuous (interpolated) quantiles
def grouped_quantiles_cont(ds, keys: list[str], value_col: str,
                           phis: list[float], out_col: str = "est",
                           ndigits: int = 4):
    """EXACT per-group CONTINUOUS quantiles with linear interpolation
    between adjacent order statistics (SQL ``quantile_cont`` / numpy's
    default ``linear`` method) — the interpolated twin of
    grouped_quantiles_exact (inverted_cdf). Same distributed shape: one
    groupby shuffle co-locates each group, one vectorized np.quantile for
    ALL phis. Interpolation arithmetic is float → output rounded on both
    sides (grouped_corr float policy)."""
    phis_arr = np.asarray(sorted(phis), dtype=np.float64)

    def qtiles(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.quantile(g[value_col].to_numpy(dtype=np.float64), phis_arr,
                           method="linear")
        out = {k: np.repeat(g[k].iloc[:1].to_numpy(), len(phis_arr))
               for k in keys}
        out["phi"] = phis_arr
        out[out_col] = np.round(vals, ndigits)
        return pd.DataFrame(out)

    narrow = ds.select_columns(keys + [value_col])
    return narrow.groupby(keys).map_groups(qtiles, batch_format="pandas")


# --------------------------------------------------------------- set ops
def set_op(left, right, columns: list[str], how: str):
    """Distributed SQL set operations on row sets: ``intersect`` /
    ``except_`` / ``union`` with DISTINCT semantics over ``columns``.

    Shape: project both sides to the op columns, tag the source side with
    a 0/1 presence flag, and run ONE map-side-combined groupby over the
    full key (Max of each side's flag) — rows travel once, pre-aggregated
    per batch, and the finish filter is a vectorized mask:
      intersect: in_left AND in_right;  except_: in_left AND NOT in_right;
      union: everything. No join, no pandas, no per-group tasks."""
    from ray.data.aggregate import Max

    if how not in ("intersect", "except_", "union"):
        raise ValueError(f"how must be intersect/except_/union, got {how!r}")

    def tag(side_left: bool):
        lv, rv = (1, 0) if side_left else (0, 1)

        def fn(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in columns}
            n = len(b)
            cols["_l"] = pa.array(np.full(n, lv, dtype=np.int8))
            cols["_r"] = pa.array(np.full(n, rv, dtype=np.int8))
            return pa.table(cols)

        return fn

    lt = left.select_columns(columns).map_batches(
        tag(True), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns(columns).map_batches(
        tag(False), batch_format="pyarrow", zero_copy_batch=True)
    agg = (lt.union(rt).groupby(columns)
           .aggregate(Max("_l", alias_name="_inl"),
                      Max("_r", alias_name="_inr")))

    def finish(b: pa.Table) -> pa.Table:
        if how == "intersect":
            mask = pc.and_(pc.equal(b["_inl"], 1), pc.equal(b["_inr"], 1))
            b = b.filter(mask)
        elif how == "except_":
            mask = pc.and_(pc.equal(b["_inl"], 1), pc.equal(b["_inr"], 0))
            b = b.filter(mask)
        return b.select(columns)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- grouping sets / CUBE
# NB: not NUL-framed — Ray's sort shuffle round-trips string keys through
# numpy unicode arrays, which silently truncate TRAILING NULs
_GS_SENTINEL = "\x01__ALL__\x01"


def grouping_sets_counts(ds, keys: list[str], sets: list[list[str]] | None = None,
                         value_col: str | None = None):
    """GROUPING SETS / CUBE / ROLLUP in one distributed shape: every row is
    replicated once per grouping set inside map_batches with the rolled-up
    (absent) key columns masked to a sentinel, plus a ``grouping_id``
    bitmask with the SQL ``GROUPING_ID`` convention — the FIRST listed key
    is the most significant bit (bit |keys|−1−i set ⇔ keys[i] rolled up);
    then ONE map-side-combined groupby over (keys..., grouping_id) computes
    count (+ exact integer-cents sum of ``value_col`` if given), and the
    finish pass converts sentinels back to nulls — the SQL CUBE output.

    ``sets=None`` means the full CUBE (all 2^|keys| subsets). Replication
    factor = |sets| on the map side, but Ray's built-in aggregates combine
    per block before the shuffle, so the wire carries distinct key combos
    per block, not rows. Keys must be string-typed (the sentinel lives in
    the value domain; the control-char framing collides with no real category)."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    if sets is None:
        sets = [list(c) for r in range(len(keys), -1, -1)
                for c in combinations(keys, r)]
    gids = [sum((1 << (len(keys) - 1 - i))
                for i, k in enumerate(keys) if k not in s)
            for s in sets]

    def replicate(b: pa.Table) -> pa.Table:
        pieces = []
        for s, gid in zip(sets, gids):
            cols = {}
            for k in keys:
                if k in s:
                    cols[k] = b[k]
                else:
                    cols[k] = pa.array(
                        np.full(len(b), _GS_SENTINEL, dtype=object),
                        pa.string())
            cols["grouping_id"] = pa.array(
                np.full(len(b), gid, dtype=np.int64))
            if value_col is not None:
                cols["_cents"] = pc.cast(
                    pc.round(pc.multiply(pc.cast(b[value_col], pa.float64()),
                                         pa.scalar(100.0)),
                             round_mode="half_towards_infinity"), pa.int64())
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    aggs = [Count(alias_name="n")]
    if value_col is not None:
        aggs.append(Sum("_cents", alias_name="_sc"))
    agg = (ds.select_columns(keys + ([value_col] if value_col else []))
           .map_batches(replicate, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(keys + ["grouping_id"])
           .aggregate(*aggs))

    def finish(b: pa.Table) -> pa.Table:
        out = {}
        for k in keys:
            mask = pc.equal(b[k], pa.scalar(_GS_SENTINEL))
            out[k] = pc.if_else(mask, pa.scalar(None, pa.string()), b[k])
        out["grouping_id"] = b["grouping_id"]
        out["n"] = b["n"]
        if value_col is not None:
            out["sum_value"] = pc.divide(pc.cast(b["_sc"], pa.float64()),
                                         pa.scalar(100.0))
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ table profiling
def profile_numeric(ds, cols: list[str], ndigits: int = 4):
    """Data-profiling summary of numeric columns in long format: one row
    per column with (n, n_null, n_distinct, min_v, max_v, mean_v) — the
    ``describe()`` surface a pipeline author runs before trusting a new
    table.

    ONE streaming pass: per-batch derived is-null ints + built-in
    Count/Sum/Min/Max + the 8-byte-hash ExactDistinct UDAF for every
    column, all combined map-side in a single global aggregate; the
    reshape to long format touches only the O(|cols|) result row."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from .udaf import ExactDistinct

    def derive(b: pa.Table) -> pa.Table:
        out = {c: pc.cast(b[c], pa.float64()) for c in cols}
        for c in cols:
            out[f"_null_{c}"] = pc.cast(pc.is_null(b[c]), pa.int64())
        return pa.table(out)

    aggs = [Count(alias_name="_n")]
    for c in cols:
        aggs += [
            Sum(f"_null_{c}", alias_name=f"_nn_{c}"),
            Min(c, alias_name=f"_min_{c}"),
            Max(c, alias_name=f"_max_{c}"),
            Sum(c, alias_name=f"_sum_{c}"),
            ExactDistinct(c, alias_name=f"_nd_{c}"),
        ]
    row = (ds.select_columns(cols)
           .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
           .aggregate(*aggs))

    import math

    import pandas as pd
    import ray.data as rd

    def _round_half_away(x: float) -> float:
        # SQL round() is half-away-from-zero on the scaled double; Python's
        # round() is banker's (25.40225 → .4022 vs DuckDB .4023).
        scale = 10.0 ** ndigits
        return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale

    n = int(row["_n"])
    recs = []
    for c in cols:
        nn = int(row[f"_nn_{c}"] or 0)
        valid = n - nn
        # an all-null column aggregates Min/Max/Sum to None — emit null
        # stats rather than crashing the whole profile on float(None)
        mn, mx = row[f"_min_{c}"], row[f"_max_{c}"]
        recs.append({
            "column": c, "n": n, "n_null": nn,
            "n_distinct": int(row[f"_nd_{c}"]),
            "min_v": _round_half_away(float(mn)) if mn is not None else None,
            "max_v": _round_half_away(float(mx)) if mx is not None else None,
            "mean_v": _round_half_away(float(row[f"_sum_{c}"]) / valid)
            if (valid and row[f"_sum_{c}"] is not None) else None,
        })
    df = pd.DataFrame(recs)
    for ic in ("n", "n_null", "n_distinct"):
        df[ic] = df[ic].astype("int64")
    return rd.from_pandas(df)


# --------------------------------------------------------- feature scaling
def fit_scaler(ds, cols: list[str]) -> dict:
    """Fit global scaling statistics (mean, population std, min, max,
    valid-count) for each column in ONE map-side-combined aggregate pass —
    the fit half of the classic ML fit/transform preprocessing pair. The
    result is an O(|cols|) dict meant to be captured by the transform
    closure (a broadcast constant, never re-shipped per batch)."""
    import math

    from ray.data.aggregate import Count, Max, Min, Sum

    def derive(b: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            x = pc.cast(b[c], pa.float64())
            out[c] = x
            out[f"_sq_{c}"] = pc.multiply(x, x)
            out[f"_v_{c}"] = pc.cast(pc.is_valid(x), pa.int64())
        return pa.table(out)

    aggs = []
    for c in cols:
        aggs += [Sum(c, alias_name=f"_s_{c}"),
                 Sum(f"_sq_{c}", alias_name=f"_ss_{c}"),
                 Sum(f"_v_{c}", alias_name=f"_n_{c}"),
                 Min(c, alias_name=f"_min_{c}"),
                 Max(c, alias_name=f"_max_{c}")]
    row = (ds.select_columns(cols)
           .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
           .aggregate(*aggs))
    stats = {}
    for c in cols:
        n = int(row[f"_n_{c}"] or 0)
        if n == 0:
            stats[c] = {"n": 0, "mean": None, "std": None,
                        "min": None, "max": None}
            continue
        mean = float(row[f"_s_{c}"]) / n
        var = max(float(row[f"_ss_{c}"]) / n - mean * mean, 0.0)
        stats[c] = {"n": n, "mean": mean, "std": math.sqrt(var),
                    "min": float(row[f"_min_{c}"]),
                    "max": float(row[f"_max_{c}"])}
    return stats


def transform_scaled(ds, stats: dict, cols: list[str],
                     method: str = "zscore", suffix: str = "_scaled"):
    """Apply fitted scaling statistics: ``zscore`` → (x − μ)/σ, ``minmax``
    → (x − min)/(max − min). Appends ``<col><suffix>`` float64 columns;
    vectorized Arrow kernels per batch, stats ride in the task closure
    (O(|cols|) floats — cheaper than any broadcast machinery). Degenerate
    columns (σ=0 or max=min) scale to null, matching SQL x/0 → null."""
    if method not in ("zscore", "minmax"):
        raise ValueError(f"unknown scaling method {method!r}")
    plan = {}
    for c in cols:
        s = stats[c]
        if method == "zscore":
            center, spread = s["mean"], s["std"]
        else:
            center = s["min"]
            spread = (s["max"] - s["min"]) if s["min"] is not None else None
        plan[c] = (center, spread if spread else None)

    def scale(b: pa.Table) -> pa.Table:
        for c in cols:
            center, spread = plan[c]
            if center is None or spread is None:
                col = pa.nulls(len(b), pa.float64())
            else:
                x = pc.cast(b[c], pa.float64())
                col = pc.divide(pc.subtract(x, pa.scalar(center)),
                                pa.scalar(spread))
            b = b.append_column(f"{c}{suffix}", col)
        return b

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- weighted sampling (E-S A-Res)
def _sha_uniform(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Engine-portable uniform in [0, 1): the first 13 hex digits (52 bits
    — exactly a float64 mantissa) of sha256(id-as-string), over 16^13.
    Any engine reproduces it: DuckDB spells the identical value as
    ``CAST('0x' || substr(sha256(CAST(id AS VARCHAR)), 1, 13) AS BIGINT)
    / 4503599627370496.0``. The hex→int parse is vectorized over the
    fixed-width (n, 64) byte view of the hex column."""
    from .sketches.hashing import _arrow_fixed_width_bytes

    if not (pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type)):
        ids = pc.cast(ids, pa.string())
    hexes = sha256_hex_column(ids)
    if isinstance(hexes, pa.ChunkedArray):
        hexes = hexes.combine_chunks()
    mat = _arrow_fixed_width_bytes(hexes)[:, :13].astype(np.uint64)
    # ASCII hex digit -> value: '0'-'9' minus 48, 'a'-'f' minus 87
    vals = mat - np.uint64(48) - np.uint64(39) * (mat >= np.uint64(97))
    out = np.zeros(len(vals), dtype=np.uint64)
    for i in range(13):
        out = (out << np.uint64(4)) | vals[:, i]
    return out.astype(np.float64) / float(1 << 52)


def sample_weighted_per_group(ds, key: str, id_col: str, weight_col: str,
                              k: int):
    """Weighted sample WITHOUT replacement, k rows per group, inclusion
    probability proportional to weight (Efraimidis–Spirakis A-Res, IPL
    2006): each row draws key u^(1/w) from a uniform u and the k LARGEST
    keys win. u comes from sha256(id) (_sha_uniform), so membership is a
    pure row function — engine-portable (the oracle re-derives the exact
    row set in SQL), reshard/resume-stable, and mergeable: top-k by key is
    an associative combiner, applied map-side per batch BEFORE the
    shuffle, so only ~k · groups · blocks narrow rows travel. Rows with
    null or non-positive weight are excluded (they have probability 0)."""

    def local_topk(b: pa.Table) -> pa.Table:
        w = pc.cast(b[weight_col], pa.float64())
        mask = pc.fill_null(pc.greater(w, pa.scalar(0.0)), False)
        b = pa.table({key: b[key], id_col: b[id_col],
                      "_w": w}).filter(mask)
        if len(b) == 0:
            return pa.table({key: b[key], id_col: b[id_col],
                             "_key": pa.array([], pa.float64())})
        u = _sha_uniform(b[id_col])
        es = np.power(u, 1.0 / b["_w"].to_numpy(zero_copy_only=False))
        t = pa.table({key: b[key], id_col: b[id_col], "_key": pa.array(es)})
        df = t.to_pandas()
        df = df.sort_values([key, "_key", id_col], kind="mergesort",
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby(key, sort=False).head(k),
                                    preserve_index=False)

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_key", id_col], kind="mergesort",
                          ascending=[False, True]).head(k)
        return g[[key, id_col]]

    return (ds.select_columns([key, id_col, weight_col])
            .map_batches(local_topk, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(key)
            .map_groups(group_topk, batch_format="pandas"))


# --------------------------------------------------- train/val/test split
def split_by_hash(ds, id_col: str, fractions: dict[str, float],
                  out_col: str = "split"):
    """Deterministic dataset split (train/val/test): each row lands in the
    named fraction whose cumulative-probability interval contains its
    sha-derived uniform (_sha_uniform — a pure function of the id, so the
    split is engine-portable, reshard-stable, and disjoint-exhaustive by
    construction; the SQL oracle re-derives the assignment verbatim).
    Fractions must sum to ~1. Stateless map — no shuffle."""
    names = list(fractions)
    cuts = np.cumsum([fractions[n] for n in names])
    if abs(cuts[-1] - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {cuts[-1]}")
    cuts[-1] = np.inf  # float-sum slack can strand u ≈ 1.0

    def assign(b: pa.Table) -> pa.Table:
        u = _sha_uniform(b[id_col])
        idx = np.searchsorted(cuts, u, side="right")
        return b.append_column(
            out_col, pa.DictionaryArray.from_arrays(
                pa.array(idx, pa.int32()), pa.array(names, pa.string())
            ).cast(pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------- unpivot / melt
def unpivot(ds, id_cols: list[str], value_cols: list[str],
            name_col: str = "name", value_col: str = "value"):
    """Wide → long reshape (SQL UNPIVOT / pandas melt): one output row per
    (input row, value column). Pure vectorized batch transform — ids
    repeat via Arrow take on a tiled index, values concat + cast to a
    common float64; nulls dropped like SQL UNPIVOT (use INCLUDE NULLS
    semantics by passing drop_null=False)."""
    return _unpivot_impl(ds, id_cols, value_cols, name_col, value_col, True)


def unpivot_keep_nulls(ds, id_cols: list[str], value_cols: list[str],
                       name_col: str = "name", value_col: str = "value"):
    """UNPIVOT INCLUDE NULLS variant."""
    return _unpivot_impl(ds, id_cols, value_cols, name_col, value_col, False)


def _unpivot_impl(ds, id_cols, value_cols, name_col, value_col, drop_null):
    def melt(b: pa.Table) -> pa.Table:
        n = len(b)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), len(value_cols)))
        out = {c: pc.take(b[c], idx) for c in id_cols}
        out[name_col] = pa.array(np.repeat(value_cols, n), pa.string())
        vals = pa.chunked_array([
            pc.cast(b[c], pa.float64()) for c in value_cols])
        out[value_col] = vals
        t = pa.table(out)
        if drop_null:
            t = t.filter(pc.is_valid(t[value_col]))
        return t

    return (ds.select_columns(id_cols + value_cols)
            .map_batches(melt, batch_format="pyarrow", zero_copy_batch=True))


# ------------------------------------------------------- top-k rows per group
def topk_per_group(ds, keys: list[str], value_col: str,
                   tiebreak: list[str], k: int, mode: str = "max"):
    """Exact top-k ROWS per group — the SQL ``row_number() OVER (PARTITION
    BY keys ORDER BY value [DESC], tiebreak...) <= k`` row set (ascending
    tiebreaks make the set unique and engine-portable). Generalizes
    extrema_per_group (k=1) with the same scale shape: a per-batch
    vectorized top-k combiner shrinks every block to ≤ k rows per key
    BEFORE the shuffle, so hot groups cost O(k · n_blocks), never
    O(group size)."""
    if mode not in ("max", "min"):
        raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
    order = [mode == "min"] + [True] * len(tiebreak)
    by = [value_col] + tiebreak

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(by, ascending=order, kind="mergesort")
                 .groupby(keys, sort=False).head(k))

    cols = list(dict.fromkeys(keys + by))
    return (ds.select_columns(cols)
            .map_batches(topk, batch_format="pandas")
            .groupby(keys)
            .map_groups(topk, batch_format="pandas"))


# ------------------------------------------------- grouped linear regression
def grouped_linreg(ds, keys: list[str], x: str, y: str, ndigits: int = 6):
    """Exact grouped simple linear regression (y = slope·x + intercept) via
    the same five-sums partials as grouped_corr: per-batch derived products
    feed built-in Sum/Count aggregates (map-side combine — only
    (keys, 6 doubles) cross the shuffle), then one vectorized pass computes
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), intercept = ȳ − slope·x̄ and
    r² = slope²·var_x/var_y — matching SQL regr_slope / regr_intercept /
    regr_r2 (NULL when var_x = 0; r² NULL when var_y = 0). Output rounded
    to ``ndigits`` to mirror the oracle's round(...)."""
    from ray.data.aggregate import Count, Sum

    def derive(b: pa.Table) -> pa.Table:
        fx = pc.cast(b[x], pa.float64())
        fy = pc.cast(b[y], pa.float64())
        cols = {k: b[k] for k in keys}
        cols.update({"_x": fx, "_y": fy,
                     "_xy": pc.multiply(fx, fy),
                     "_x2": pc.multiply(fx, fx),
                     "_y2": pc.multiply(fy, fy)})
        return pa.table(cols)

    agg = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys)
        .aggregate(
            Count(alias_name="n"),
            Sum("_x", alias_name="_sx"), Sum("_y", alias_name="_sy"),
            Sum("_xy", alias_name="_sxy"),
            Sum("_x2", alias_name="_sx2"), Sum("_y2", alias_name="_sy2"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n"], dtype=np.float64)
        sx = np.asarray(b["_sx"]); sy = np.asarray(b["_sy"])
        cov = n * np.asarray(b["_sxy"]) - sx * sy
        vx = n * np.asarray(b["_sx2"]) - sx * sx
        vy = n * np.asarray(b["_sy2"]) - sy * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(vx > 0, cov / vx, np.nan)
            intercept = (sy - slope * sx) / n
            r2 = np.where(vy > 0, np.where(vx > 0, cov * cov / (vx * vy),
                                           np.nan), np.nan)
        out = {k: b[k] for k in keys}
        rnd = lambda a: pc.round(pa.array(a, pa.float64()), ndigits=ndigits,
                                 round_mode="half_towards_infinity")
        out["n"] = b["n"]
        out["slope"] = rnd(slope)
        out["intercept"] = rnd(intercept)
        out["r2"] = rnd(r2)
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------- dataset mixing
def frac_to_hex_threshold(frac: float, digits: int = 8) -> str:
    """Map a keep-fraction to a sha256-hex prefix threshold: rows with
    hex(sha256(key)) < threshold are kept. 'g' (> every hex char) keeps
    all rows; '0'*digits keeps none. Any engine with sha256 reproduces the
    identical membership (the sample_sha contract)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    if frac >= 1.0:
        return "g"
    return format(int(frac * 16 ** digits), f"0{digits}x")


def mix_by_weights(ds, group_col: str, id_col: str, weights: dict,
                   default: float = 0.0, epoch_col: str | None = None):
    """Deterministic weighted dataset mixture (LLM-pipeline domain
    up/down-sampling): keep each row with rate ``weights[group]``
    (``default`` for unlisted groups), membership decided by
    sha256(id) — engine-portable, reshard/resume-stable, NO shuffle and no
    RNG state; the mixture is a pure row function evaluated in one
    streaming map. Weights ABOVE 1 upsample by repetition (multi-epoch
    mixing): a weight of 2.3 emits 2 full copies of every row plus a
    deterministic 30% slice as a third — pass ``epoch_col`` to emit the
    copy index (0-based) so downstream shuffles can decorrelate epochs.
    Rates are exact in expectation and the driver oracle re-derives the
    exact row set in SQL (CASE thresholds + UNION ALL per extra epoch)."""
    full = {g: int(w) for g, w in weights.items()}
    thr = {g: frac_to_hex_threshold(w - int(w)) for g, w in weights.items()}
    dflt_full, dflt_thr = int(default), frac_to_hex_threshold(
        default - int(default))

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[id_col]
        if not (pa.types.is_string(keys.type)
                or pa.types.is_large_string(keys.type)):
            keys = pc.cast(keys, pa.string())
        hexes = sha256_hex_column(keys)
        col = batch[group_col]
        enc = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)
        gvals = [v.as_py() for v in enc.dictionary]
        dict_thr = pa.array([thr.get(v, dflt_thr) for v in gvals],
                            pa.string())
        idx = enc.indices
        row_thr = dict_thr.take(idx)
        # copies = full epochs + 1 more where hex(sha(id)) < frac threshold
        n_full = np.asarray(
            pa.array([full.get(v, dflt_full) for v in gvals],
                     pa.int64()).take(idx))
        reps = n_full + np.asarray(pc.less(hexes, row_thr)).astype(np.int64)
        take_ix = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        out = batch.take(pa.array(take_ix))
        if epoch_col is not None:
            starts = np.cumsum(reps) - reps
            epoch = np.arange(len(take_ix), dtype=np.int64) - np.repeat(
                starts, reps)
            out = out.append_column(epoch_col, pa.array(epoch))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ grouped mode
def mode_per_group(ds, keys: list[str], value_col: str,
                   count_col: str = "n"):
    """Exact statistical MODE per group (most frequent value, smallest
    value winning ties — deterministic and engine-portable): one
    groupby((keys, value)) count — per-block partial counts combine
    map-side, so a hot (key, value) pair shuffles one row per block — then
    the existing extrema combiner picks the argmax row per key. Output:
    keys, value_col (the mode), count_col."""
    from ray.data.aggregate import Count

    counts = (ds.select_columns(keys + [value_col])
              .groupby(keys + [value_col])
              .aggregate(Count(alias_name=count_col)))
    out = extrema_per_group(counts, keys, count_col, [value_col],
                            mode="max")
    return out.map_batches(
        lambda b: b.select(keys + [value_col, count_col]),
        batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------- ordered string_agg
def string_agg_per_group(ds, keys: list[str], value_col: str,
                         order_by: list[str], descending: list[bool],
                         sep: str = ",", out_col: str = "agg"):
    """SQL ``string_agg(value, sep ORDER BY ...)`` per group: one shuffle,
    one vectorized pandas pass per group. The concatenation is inherently
    O(group size) in one task — for unbounded groups compose with
    topk_per_group first (cap the rows, THEN concatenate), which is the
    scale-safe form the registered query uses."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, ascending=[not d for d in descending],
                          kind="mergesort")
        out = {k: [g[k].iloc[0]] for k in keys}
        out[out_col] = [sep.join(g[value_col].astype(str))]
        return pd.DataFrame(out)

    return (ds.select_columns(list(dict.fromkeys(keys + [value_col]
                                                 + order_by)))
            .groupby(keys).map_groups(per_group, batch_format="pandas"))


# ------------------------------------------------------ global row numbers
def _sample_range_bounds(ds, order_col: str, ranges: int,
                         sample_limit: int) -> list:
    """Deterministic hash-sampled range boundaries over ``order_col`` —
    the shared step of every range-partition enumeration (with_row_number,
    rank_table). Boundary QUALITY only affects balance, never correctness;
    the driver holds ≤ sample_limit sampled values, nothing more."""

    def sample_vals(batch: pa.Table) -> pa.Table:
        col = batch[order_col]
        h = hash64(col, seed=101)
        keep = (h % np.uint64(997)) < np.uint64(97)   # ~10% sample
        return pa.table({order_col: col}).filter(pa.array(keep))

    samp = (ds.select_columns([order_col])
            .map_batches(sample_vals, batch_format="pyarrow",
                         zero_copy_batch=True)
            .limit(sample_limit).to_pandas())
    if order_col not in samp.columns or not len(samp):
        # tiny input where the ~10% hash filter kept nothing: one range
        # (correct, just unbalanced — balance never affects correctness)
        return []
    vals = np.sort(samp[order_col].to_numpy())
    if len(vals) >= ranges:
        qs = np.linspace(0, len(vals) - 1, ranges + 1)[1:-1]
        bounds = np.unique(vals[qs.astype(int)])
    else:
        bounds = np.unique(vals)
    return bounds.tolist()


def _assign_range_fn(bounds_list: list, order_col: str):
    """Batch fn appending ``_range`` = searchsorted(bounds, order_col).
    Equal values always land in the same range, so per-range local order +
    range offset reconstructs the exact global order."""

    def assign(batch: pa.Table) -> pa.Table:
        v = batch[order_col].combine_chunks() if isinstance(
            batch[order_col], pa.ChunkedArray) else batch[order_col]
        arr = v.to_numpy(zero_copy_only=False)
        rid = np.searchsorted(np.asarray(bounds_list, dtype=arr.dtype),
                              arr, side="right").astype(np.int64)
        return batch.append_column("_range", pa.array(rid))

    return assign


def with_row_number(ds, order_col: str, tiebreak: list[str],
                    descending: bool = False, out_col: str = "row_number",
                    ranges: int = 64, sample_limit: int = 10_000):
    """Exact global ``row_number() OVER (ORDER BY order_col [DESC],
    tiebreak...)`` (1-based) WITHOUT a global sort of the full rows — the
    classic range-partition enumeration:

    1. deterministic hash-sample of order_col → ``ranges-1`` boundary
       values (driver-side, ≤ sample_limit values; boundary QUALITY only
       affects balance, never correctness);
    2. one counted groupby over range ids → exact per-range row counts →
       prefix offsets (``ranges`` rows on the driver);
    3. one groupby(range).map_groups: local sort by (order, tiebreak...)
       + arange + the range's offset.

    Equal order_col values always share a range (searchsorted on the
    boundary array), so local rank + offset is the exact global rank; the
    tiebreak columns must make the order total for a deterministic,
    engine-portable output. Scale: full rows move through ONE shuffle
    (the enumeration pass); the count pass moves only (range_id) ints."""
    from ray.data.aggregate import Count

    if descending is True:
        pass  # handled in the local sort + reversed boundary mapping below

    # 1. deterministic boundaries from a hash-based sample (order-free)
    bounds_list = _sample_range_bounds(ds, order_col, ranges, sample_limit)

    tagged = ds.map_batches(_assign_range_fn(bounds_list, order_col),
                            batch_format="pyarrow", zero_copy_batch=True)

    # 2. exact counts per range → prefix offsets (tiny driver-side table).
    # Counted from a SEPARATE order_col-only pipeline: column pruning
    # cannot push through the opaque assign UDF, so counting off `tagged`
    # would re-read every column of the input just to discard it
    counts = (ds.select_columns([order_col])
              .map_batches(_assign_range_fn(bounds_list, order_col),
                           batch_format="pyarrow", zero_copy_batch=True)
              .select_columns(["_range"]).groupby("_range")
              .aggregate(Count(alias_name="n")).to_pandas()
              .sort_values("_range"))
    # ranges are ordered by order_col ascending; descending output walks
    # them in reverse
    order = counts["_range"].to_numpy()
    ns = counts["n"].to_numpy()
    if descending:
        order, ns = order[::-1], ns[::-1]
    offsets = dict(zip(order.tolist(),
                       (np.cumsum(ns) - ns).tolist()))

    by = [order_col] + tiebreak
    asc = [not descending] + [True] * len(tiebreak)

    def enumerate_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc, kind="mergesort")
        off = offsets[int(g["_range"].iloc[0])]
        g = g.drop(columns=["_range"])
        return g.assign(**{out_col: np.arange(1, len(g) + 1,
                                              dtype=np.int64) + off})

    # 3. one shuffle of the full rows, local sort + offset per range
    return tagged.groupby("_range").map_groups(enumerate_group,
                                               batch_format="pandas")


# ------------------------------------------------------------- rank table
def rank_table(ds, order_col: str, ndigits: int | None = None,
               finalize: str = "distributed", ranges: int = 64,
               sample_limit: int = 10_000):
    """Exact SQL ranking functions over ONE order column, emitted as a
    table keyed by distinct value: dense_rank, rank (with gaps),
    percent_rank = (rank−1)/(N−1), and the value's row count n. Join the
    result back on ``order_col`` (join.hash_join) to decorate rows.

    Distributed shape (finalize="distributed", the default): one counted
    groupby collapses the dataset to one row per DISTINCT value (map-side
    combine; materialized to the OBJECT STORE — spillable, never the
    driver — so the three consumers below don't recompute the big input
    shuffle). Then ranks are a range-partition prefix-sum over that
    collapsed table: sampled boundaries on the value → per-range
    (row-count, Σn) aggregate → the driver holds only ``ranges`` offset
    pairs → one groupby(range) pass emits dense_rank (local row index +
    row offset), rank (local exclusive Σn + weight offset + 1) and
    percent_rank. A near-unique order column — the case that OOMs a
    driver-side finalize — never leaves the cluster.

    finalize="driver" keeps the small-domain fast path (whole counts
    table sorted/cumsum'd on the driver — fine when the distinct-value
    count is known tiny, e.g. enum-like columns)."""
    from ray.data.aggregate import Count, Sum

    import ray.data as rd

    counts_ds = (ds.select_columns([order_col]).groupby(order_col)
                 .aggregate(Count(alias_name="n")))

    if finalize == "driver":
        counts = counts_ds.to_pandas()
        counts = counts.sort_values(order_col, kind="mergesort") \
            .reset_index(drop=True)
        n = counts["n"].to_numpy(dtype=np.int64)
        total = int(n.sum())
        rank = np.cumsum(n) - n + 1
        dense = np.arange(1, len(counts) + 1, dtype=np.int64)
        pct = (rank - 1) / max(total - 1, 1)
        out = pd.DataFrame({
            order_col: counts[order_col],
            "n": n,
            "dense_rank": dense,
            "rank": rank,
            "percent_rank": np.round(pct, ndigits) if ndigits is not None
            else pct,
        })
        return rd.from_pandas(out)
    if finalize != "distributed":
        raise ValueError(f"finalize must be 'distributed' or 'driver', "
                         f"got {finalize!r}")

    # distinct-value table lives in the object store; consumed 3× below
    counts_ds = counts_ds.materialize()
    bounds = _sample_range_bounds(counts_ds, order_col, ranges,
                                  sample_limit)
    tagged = counts_ds.map_batches(_assign_range_fn(bounds, order_col),
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
    per_range = (tagged.select_columns(["_range", "n"]).groupby("_range")
                 .aggregate(Count(alias_name="_rows"),
                            Sum("n", alias_name="_w"))
                 .to_pandas().sort_values("_range"))
    rows = per_range["_rows"].to_numpy(dtype=np.int64)
    w = per_range["_w"].to_numpy(dtype=np.int64)
    total = int(w.sum())
    rids = per_range["_range"].tolist()
    row_off = dict(zip(rids, (np.cumsum(rows) - rows).tolist()))
    w_off = dict(zip(rids, (np.cumsum(w) - w).tolist()))
    denom = max(total - 1, 1)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort").reset_index(
            drop=True)
        rid = int(g["_range"].iloc[0])
        n = g["n"].to_numpy(dtype=np.int64)
        rank = np.cumsum(n) - n + 1 + w_off[rid]
        dense = np.arange(1, len(g) + 1, dtype=np.int64) + row_off[rid]
        pct = (rank - 1) / denom
        return pd.DataFrame({
            order_col: g[order_col],
            "n": n,
            "dense_rank": dense,
            "rank": rank,
            "percent_rank": np.round(pct, ndigits) if ndigits is not None
            else pct,
        })

    return tagged.groupby("_range").map_groups(finish,
                                               batch_format="pandas")


def global_quantile_cont(ds, col: str, phi: float, *, ranges: int = 64,
                         sample_limit: int = 10_000,
                         local_limit: int = 4_000_000,
                         max_depth: int = 4) -> float | None:
    """EXACT interpolated global quantile (SQL ``QUANTILE_CONT``) with NO
    single-task funnel: a distributed order-statistic selection.

    Shape: (1) hash-sampled range boundaries over ``col``
    (_sample_range_bounds — driver holds ≤ sample_limit values); (2) one
    vectorized counting pass — per-batch ``searchsorted`` + ``bincount``,
    per-range partials summed through a tiny groupby (≤ ranges+1 rows
    cross the driver); (3) only the range(s) holding the two target order
    statistics are filtered out (a streaming vectorized filter) and
    sorted locally — ~n/ranges values, never the dataset. If a skewed
    range still exceeds ``local_limit`` it recurses WITHIN the range
    (boundaries resampled from the filtered stream), so driver memory
    stays bounded at any input size. The final interpolation reproduces
    ``np.quantile(..., method="linear")`` bit-for-bit (the two order
    statistics are lerped by np.quantile itself), matching the grouped
    per-task route and DuckDB's QUANTILE_CONT.

    Each pass re-executes the upstream (lazy) pipeline — 3 streaming
    scans instead of one whole-dataset materialization; at scale the
    scan is the cheap part and nothing ever funnels into one task.
    Returns None when every value is null (SQL's NULL)."""

    def _vals(b: pa.Table) -> pa.Table:
        v = b[col]
        return pa.table({col: pc.drop_null(pc.cast(v, pa.float64()))})

    vd = ds.select_columns([col]).map_batches(
        _vals, batch_format="pyarrow", zero_copy_batch=True)

    def counts_for(vd_scoped, bounds):
        nb = len(bounds)

        def count_batch(b: pa.Table) -> pa.Table:
            arr = b[col].to_numpy(zero_copy_only=False)
            rid = np.searchsorted(np.asarray(bounds, dtype=np.float64),
                                  arr, side="right")
            cnt = np.bincount(rid, minlength=nb + 1)
            return pa.table({"_range": np.arange(nb + 1, dtype=np.int64),
                             "_cnt": cnt.astype(np.int64)})

        parts = (vd_scoped.map_batches(count_batch, batch_format="pyarrow",
                                       zero_copy_batch=True)
                 .groupby("_range").sum("_cnt").to_pandas())
        out = np.zeros(nb + 1, dtype=np.int64)
        if len(parts):           # empty scoped stream -> all-zero counts
            out[parts["_range"].to_numpy()] = parts["sum(_cnt)"].to_numpy()
        return out

    def order_stats(vd_scoped, ks, depth):
        """Values at global sorted indices ``ks`` (ascending ints) within
        the scoped stream."""
        bounds = _sample_range_bounds(vd_scoped, col, ranges, sample_limit)
        if not bounds:
            # sampler kept nothing (tiny scope): collect directly — the
            # ~10% hash sample misses only when the scope is small
            arr = np.sort(vd_scoped.to_pandas()[col].to_numpy())
            return [float(arr[k]) for k in ks]
        cnts = counts_for(vd_scoped, bounds)
        starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
        out = []
        bnd = np.asarray(bounds, dtype=np.float64)
        for k in ks:
            r = int(np.searchsorted(np.cumsum(cnts), k, side="right"))
            lo = bnd[r - 1] if r > 0 else None
            hi = bnd[r] if r < len(bnd) else None

            def in_range(b: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
                # searchsorted(side="right") ranges: bounds[r-1] <= v <
                # bounds[r] — inclusive low, exclusive high
                v = b[col]
                m = None
                if _lo is not None:
                    m = pc.greater_equal(v, _lo)
                if _hi is not None:
                    m2 = pc.less(v, _hi)
                    m = m2 if m is None else pc.and_(m, m2)
                return b.filter(m) if m is not None else b

            scoped = vd_scoped.map_batches(in_range, batch_format="pyarrow",
                                           zero_copy_batch=True)
            if cnts[r] > local_limit and depth < max_depth:
                out.extend(order_stats(scoped, [int(k - starts[r])],
                                       depth + 1))
                continue
            arr = np.sort(scoped.to_pandas()[col].to_numpy())
            out.append(float(arr[int(k - starts[r])]))
        return out

    cnts0 = counts_for(vd, [])
    n = int(cnts0.sum())
    if n == 0:
        return None
    k = phi * (n - 1)
    k0, k1 = int(np.floor(k)), int(np.ceil(k))
    v = order_stats(vd, sorted({k0, k1}), 0)
    if k0 == k1:
        return v[0]
    return float(np.quantile(np.array(v, dtype=np.float64), k - k0,
                             method="linear"))
