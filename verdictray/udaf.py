"""Sketches as Ray Data mergeable UDAFs (AggregateFnV2).

The canonical zero/accumulate/merge/finalize lifecycle of every sketch maps
1:1 onto Ray Data's ``AggregateFnV2`` contract (BASELINE.json north_rule:
"mergeable UDAFs"): Ray computes a partial per block via
``aggregate_block``, shuffles by the group key, merges partials with
``combine`` (associative + commutative — property-tested), and turns the
final accumulator into an output value with ``finalize``.

Every sketch therefore runs both globally (``ds.aggregate(HllAgg(...))``)
and grouped (``ds.groupby(key).aggregate(HllAgg(...))``) with no extra
plumbing. Accumulators are the sketch objects themselves (picklable:
numpy arrays + scalars; dense HLL ≈ 16 KiB, CMS ≈ 108 KiB — small enough
for the object store per SURVEY.md §4.5).

``output="blob"`` finalizes to the serialized sketch (Arrow binary) — the
form used by the two-stage salted pipeline, checkpoints, and cross-job
union. ``SketchMergeAgg`` re-merges blob columns, which is what the final
(unsalted) stage of the salted aggregation runs on.

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

from typing import Callable, Optional

from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from .sketches import (
    BloomFilter,
    CountMin,
    HyperLogLog,
    KLL,
    Sketch,
    TDigest,
)


def _column(block: Block, name: str):
    """Extract one column of a (possibly pandas) block as Arrow."""
    t = BlockAccessor.for_block(block).to_arrow()
    return t.column(name)


class SketchAgg(AggregateFnV2):
    """Generic sketch UDAF: wraps any ``Sketch`` factory.

    Args:
        factory: zero-arg callable producing an empty sketch (the ``zero``).
        on: input column.
        alias_name: output column name (must match oracle SQL naming).
        finalizer: sketch → output value; defaults to ``Sketch.finalize``.

    Wire modes (``wire``):
      - "bytes" (default): accumulators cross stage boundaries as serialized
        blobs (bytes → Arrow binary). REQUIRED for global (ungrouped)
        ``ds.aggregate``, which materializes partial accumulators into
        Arrow blocks where a raw Python object cannot go.
      - "object": accumulators stay live sketch objects and merge in place
        with zero (de)serialization. Valid for grouped aggregation (all of
        a group's aggregation happens inside one reduce task) — measured
        ~2-3x faster on blob-heavy merges; used by the pipelines.
    """

    def __init__(
        self,
        factory: Callable[[], Sketch],
        on: str,
        alias_name: str,
        finalizer: Optional[Callable[[Sketch], object]] = None,
        wire: str = "bytes",
    ):
        if wire not in ("bytes", "object"):
            raise ValueError(f"wire must be 'bytes' or 'object', got {wire!r}")
        self._factory = factory
        self._finalizer = finalizer or (lambda sk: sk.finalize())
        self._wire_bytes = wire == "bytes"
        super().__init__(alias_name, on=on, ignore_nulls=True, zero_factory=lambda: None)

    def aggregate_block(self, block: Block):
        sk = self._factory()
        sk.update(_column(block, self._target_col_name))
        return sk.to_bytes() if self._wire_bytes else sk

    def combine(self, current, new):
        if current is None:
            return new
        if new is None:
            return current
        if self._wire_bytes:
            return Sketch.from_bytes(current).merge(Sketch.from_bytes(new)).to_bytes()
        return current.merge(new)

    def finalize(self, accumulator):
        if accumulator is None:
            sk = self._factory()
        elif self._wire_bytes:
            sk = Sketch.from_bytes(accumulator)
        else:
            sk = accumulator
        return self._finalizer(sk)


def _make_finalizer(output: str, phis=None):
    if output == "estimate":
        return lambda sk: sk.finalize()
    if output == "blob":
        return lambda sk: sk.to_bytes()
    if output == "quantiles":
        return lambda sk: [float(q) for q in sk.quantiles(phis)]
    raise ValueError(f"unknown output mode {output!r}")


class HllAgg(SketchAgg):
    """COUNT DISTINCT(on) ≈ estimate, std-error 1.04/√(2^p)."""

    def __init__(self, on: str, alias_name: str = None, p: int = 14, seed: int = 0,
                 output: str = "estimate", wire: str = "bytes"):
        super().__init__(
            lambda: HyperLogLog(p=p, seed=seed),
            on,
            alias_name or f"hll({on})",
            _make_finalizer(output),
            wire=wire,
        )


class CmsAgg(SketchAgg):
    """Frequency sketch; finalize → blob (point queries / top-k run on the
    blob via CountMin.query / top_k) or → total count N."""

    def __init__(self, on: str, alias_name: str = None, eps: float = 1e-3,
                 delta: float = 1e-2, seed: int = 0, hh_capacity: int = 0,
                 output: str = "blob", wire: str = "bytes"):
        out = "estimate" if output == "n" else output
        super().__init__(
            lambda: CountMin(eps=eps, delta=delta, seed=seed, hh_capacity=hh_capacity),
            on,
            alias_name or f"cms({on})",
            _make_finalizer(out),
            wire=wire,
        )


class BloomAgg(SketchAgg):
    """Membership filter; finalize → blob (probe via BloomFilter.contains)."""

    def __init__(self, on: str, alias_name: str = None, capacity: int = 1_000_000,
                 fpp: float = 0.01, seed: int = 0, output: str = "blob",
                 wire: str = "bytes"):
        super().__init__(
            lambda: BloomFilter(capacity=capacity, fpp=fpp, seed=seed),
            on,
            alias_name or f"bloom({on})",
            _make_finalizer(output),
            wire=wire,
        )


class KllAgg(SketchAgg):
    """Quantiles with worst-case rank-error guarantee (~1.65% @ k=200)."""

    def __init__(self, on: str, alias_name: str = None, k: int = 200, seed: int = 0,
                 phis=(0.01, 0.25, 0.5, 0.75, 0.99), output: str = "quantiles",
                 wire: str = "bytes"):
        super().__init__(
            lambda: KLL(k=k, seed=seed),
            on,
            alias_name or f"kll({on})",
            _make_finalizer(output, phis),
            wire=wire,
        )


class TDigestAgg(SketchAgg):
    """Tail-accurate quantiles (merging t-digest, compression δ)."""

    def __init__(self, on: str, alias_name: str = None, compression: float = 100.0,
                 phis=(0.01, 0.25, 0.5, 0.75, 0.99), output: str = "quantiles",
                 wire: str = "bytes"):
        super().__init__(
            lambda: TDigest(compression=compression),
            on,
            alias_name or f"tdigest({on})",
            _make_finalizer(output, phis),
            wire=wire,
        )


class SketchMergeAgg(AggregateFnV2):
    """Merge a column of serialized sketch blobs (the final stage of the
    two-stage salted aggregation, SURVEY.md §3.1 Stage B). Same wire modes
    as SketchAgg — the pipelines use "object" (grouped-only, zero
    re-serialization per combine)."""

    def __init__(self, on: str, alias_name: str = None,
                 finalizer: Optional[Callable[[Sketch], object]] = None,
                 wire: str = "bytes"):
        self._finalizer = finalizer or (lambda sk: sk.to_bytes())
        self._wire_bytes = wire == "bytes"
        super().__init__(alias_name or f"merged({on})", on=on, ignore_nulls=True,
                         zero_factory=lambda: None)

    def aggregate_block(self, block: Block):
        blobs = _column(block, self._target_col_name).to_pylist()
        if not blobs:
            return None
        sketches = [Sketch.from_bytes(b) for b in blobs]
        acc = sketches[0]
        if len(sketches) > 1:
            if hasattr(acc, "merge_many"):
                # k-way merge (one union) instead of a pairwise ladder —
                # the hot-key reduce merges `salts` partials and pairwise
                # cost there is ~salts/2 x the data volume
                acc.merge_many(sketches[1:])
            else:
                for sk in sketches[1:]:
                    acc.merge(sk)
        return acc.to_bytes() if self._wire_bytes else acc

    def combine(self, current, new):
        if current is None:
            return new
        if new is None:
            return current
        if self._wire_bytes:
            return Sketch.from_bytes(current).merge(Sketch.from_bytes(new)).to_bytes()
        return current.merge(new)

    def finalize(self, accumulator):
        if accumulator is None:
            return None
        if self._wire_bytes:
            accumulator = Sketch.from_bytes(accumulator)
        return self._finalizer(accumulator)


class ExactDistinct(AggregateFnV2):
    """Exact COUNT DISTINCT via sorted 64-bit hash sets — the calibration
    oracle for HLL on sampled slices (SURVEY.md §2.5 "supporting exact
    aggregations").

    This is the sparse-HLL representation kept exact: accumulators are
    sorted unique ``uint64`` base-hash arrays as raw bytes (8 B per
    distinct value — vs ~60+ B for the r1 pickled-set accumulator, and no
    pickle on the wire), merged with ``np.union1d``. Exact at ANY
    cardinality modulo 64-bit hash collisions (P ≈ nd²/2⁶⁵ — the same
    guarantee the fingerprint operators document); there is no sparse→
    dense promotion cliff that would silently turn the answer approximate.
    At corpus-scale cardinalities where even 8 B × nd of accumulator state
    is too much, use HllAgg."""

    def __init__(self, on: str, alias_name: str = None):
        super().__init__(alias_name or f"nd({on})", on=on, ignore_nulls=True,
                         zero_factory=lambda: None)

    def aggregate_block(self, block: Block) -> bytes:
        import numpy as np

        from .sketches.hashing import _to_numpy_dropnull, hash_base

        arr = _to_numpy_dropnull(_column(block, self._target_col_name))
        if len(arr) == 0:
            return b""
        return np.unique(hash_base(arr)).tobytes()

    def combine(self, current, new):
        import numpy as np

        if not current:
            return new
        if not new:
            return current
        return np.union1d(
            np.frombuffer(current, dtype=np.uint64),
            np.frombuffer(new, dtype=np.uint64),
        ).tobytes()

    def finalize(self, accumulator) -> int:
        return 0 if not accumulator else len(accumulator) // 8


class DistinctValuesAgg(AggregateFnV2):
    """Exact SUM(DISTINCT col) / AVG(DISTINCT col) for numeric columns —
    the same sorted-unique-array accumulator discipline as
    ``ExactDistinct``, but over the VALUES themselves (the reduction
    needs them; a hash set could only count). Accumulators are sorted
    unique int64/float64 arrays as raw bytes behind a 1-byte dtype tag
    (8 B per distinct value, no pickle on the wire), merged with
    ``np.union1d``. The finalize sums the SORTED unique array, so a
    float result is the same left-to-right reduction on every run /
    merge order — deterministic, unlike a float SUM over shuffled rows.
    NULLs drop per SQL; a group with no non-null value yields NULL."""

    _TAGS = {b"i": "int64", b"f": "float64"}

    def __init__(self, on: str, alias_name: str = None,
                 finalize: str = "sum"):
        if finalize not in ("sum", "avg"):
            raise ValueError(f"finalize must be sum|avg, got {finalize!r}")
        self._mode = finalize
        super().__init__(alias_name or f"distinct_{finalize}({on})",
                         on=on, ignore_nulls=True,
                         zero_factory=lambda: None)

    def aggregate_block(self, block: Block) -> bytes:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        col = _column(block, self._target_col_name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col) == 0:
            return b""
        if pa.types.is_integer(col.type):
            tag, arr = b"i", pc.cast(col, pa.int64()).to_numpy()
        elif pa.types.is_floating(col.type):
            tag, arr = b"f", pc.cast(col, pa.float64()).to_numpy()
        else:
            raise ValueError("SUM/AVG(DISTINCT) supports numeric columns, "
                             f"got {col.type}")
        return tag + np.unique(arr).tobytes()

    def combine(self, current, new):
        import numpy as np

        if not current:
            return new
        if not new:
            return current
        if current[:1] != new[:1]:      # can't happen for one column
            raise ValueError("mixed dtype tags in DISTINCT accumulator")
        dt = self._TAGS[current[:1]]
        return current[:1] + np.union1d(
            np.frombuffer(current[1:], dtype=dt),
            np.frombuffer(new[1:], dtype=dt),
        ).tobytes()

    def finalize(self, accumulator):
        import numpy as np

        if not accumulator:
            return None                 # SQL: no non-null input -> NULL
        vals = np.frombuffer(accumulator[1:],
                             dtype=self._TAGS[accumulator[:1]])
        if self._mode == "avg":
            return float(vals.sum() / len(vals))
        total = vals.sum()
        return int(total) if vals.dtype.kind == "i" else float(total)


class ArgMinMaxAgg(AggregateFnV2):
    """Exact ARG_MAX(arg, val) / ARG_MIN(arg, val) (a.k.a. MAX_BY /
    MIN_BY): the value of ``arg`` at the row where ``val`` is extreme —
    the "latest record per key" primitive. Decomposable with an O(1)
    accumulator: each block reduces to one ``(best_val, best_arg)``
    pair, merges compare pairs — nothing wider than two scalars ever
    crosses the shuffle. Rows where EITHER column is NULL are ignored
    (DuckDB 1.0 semantics, verified empirically); a group with no
    complete row yields NULL. Ties on ``val`` break toward the SMALLEST
    ``arg``, which is deterministic under any partitioning / merge order
    (DuckDB's tie choice is scan-order-dependent — oracle queries use a
    unique ``val``)."""

    def __init__(self, arg_col: str, val_col: str, alias_name: str = None,
                 mode: str = "max"):
        if mode not in ("max", "min"):
            raise ValueError(f"mode must be max|min, got {mode!r}")
        self._arg_col, self._val_col, self._mode = arg_col, val_col, mode
        # on=None: Ray prunes aggregate input blocks to [on, *keys], and
        # this aggregate needs TWO columns — None passes the whole
        # (already read-pruned) block through; only the O(1) pair
        # accumulator crosses the shuffle either way
        super().__init__(alias_name or f"arg_{mode}({arg_col},{val_col})",
                         on=None, ignore_nulls=True,
                         zero_factory=lambda: None)

    def aggregate_block(self, block: Block):
        import pyarrow as pa
        import pyarrow.compute as pc

        a, v = (_column(block, self._arg_col),
                _column(block, self._val_col))
        mask = pc.and_(pc.is_valid(a), pc.is_valid(v))
        a, v = pc.filter(a, mask), pc.filter(v, mask)
        if len(v) == 0:
            return None
        best_v = (pc.max(v) if self._mode == "max" else pc.min(v))
        cand = pc.filter(a, pc.equal(v, best_v))
        return (best_v.as_py(), pc.min(cand).as_py())

    def combine(self, current, new):
        if current is None:
            return new
        if new is None:
            return current
        if current[0] == new[0]:        # val tie -> smallest arg
            return current if current[1] <= new[1] else new
        better = (current[0] > new[0] if self._mode == "max"
                  else current[0] < new[0])
        return current if better else new

    def finalize(self, accumulator):
        return None if accumulator is None else accumulator[1]


class StringAggAgg(AggregateFnV2):
    """STRING_AGG(col, sep ORDER BY k [DESC]) — ordered string
    concatenation per group. The ORDER BY is REQUIRED: without it the
    result depends on scan/partition order, which a distributed engine
    cannot (and should not pretend to) reproduce. Accumulator = a list
    of (order_key, value) pairs for the group's non-NULL values (NULL
    values skip, per SQL; NULL order keys sort last like ORDER BY);
    merges concatenate lists, the finalize does ONE sort + join —
    O(group) state, same class as DistinctValuesAgg. on=None because
    the aggregate reads two columns (Ray prunes input blocks to
    [on, *keys])."""

    def __init__(self, col: str, sep: str, order_col: str,
                 desc: bool = False, alias_name: str = None):
        self._col, self._sep = col, sep
        self._order_col, self._desc = order_col, desc
        super().__init__(alias_name or f"string_agg({col})",
                         on=None, ignore_nulls=True,
                         zero_factory=lambda: None)

    def aggregate_block(self, block: Block):
        import pyarrow.compute as pc

        v = _column(block, self._col)
        k = _column(block, self._order_col)
        mask = pc.is_valid(v)
        v, k = pc.filter(v, mask), pc.filter(k, mask)
        if len(v) == 0:
            return None
        return list(zip(k.to_pylist(), v.to_pylist()))

    def combine(self, current, new):
        if current is None:
            return new
        if new is None:
            return current
        return current + new

    def finalize(self, accumulator):
        if accumulator is None:
            return None
        nones = [val for key, val in accumulator if key is None]
        keyed = sorted(((key, val) for key, val in accumulator
                        if key is not None), reverse=self._desc)
        vals = [val for _, val in keyed] + nones    # NULL keys last
        return self._sep.join(str(x) for x in vals)


def as_aggregate(sketch_cls, on: str, alias_name: str = None, output: str = "estimate",
                 phis=None, **params) -> SketchAgg:
    """Wrap ANY Sketch subclass (including user extensions) into a Ray Data
    aggregate — the user-extension surface from SURVEY.md §2.10."""
    return SketchAgg(
        lambda: sketch_cls(**params),
        on,
        alias_name or f"{sketch_cls.__name__.lower()}({on})",
        _make_finalizer(output, phis),
    )
