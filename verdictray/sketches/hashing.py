"""Vectorized 64-bit hashing used by every sketch.

All sketches consume ``hash64(values, seed)`` — a single, shared definition
so that (a) partial sketches built on different workers hash identically and
(b) tests can reproduce item placement exactly.

Strategy:

- object/string arrays → ``pandas.util.hash_array`` (SipHash-1-3 in C,
  vectorized) with the default key, then a splitmix64 finalizer mixed with
  the seed;
- integer arrays → reinterpret the bits as uint64, then splitmix64+seed;
- float arrays → normalize -0.0 to 0.0, reinterpret bits, splitmix64+seed.

``splitmix64`` (Steele et al., public domain constants) is a full-avalanche
finalizer, so seed-derived hash families are pairwise independent enough for
double hashing (Kirsch–Mitzenmacher) in Bloom/CMS.

Reference provenance: no reference file exists (/root/reference is empty —
SURVEY.md §0); the hashing scheme follows the public Count-Min / Bloom
double-hashing literature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

try:  # pyarrow is always present in this environment, but keep importable without it
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray, copy: bool = True) -> np.ndarray:
    """``copy=False`` finalizes in place — callers that own ``x`` (it is a
    fresh temporary) skip one array allocation. First-touch page faults
    cost ~70 µs/page on this environment's VM (BASELINE.md §controls), so
    avoidable large allocations dominate cold hash kernels."""
    x = x.astype(np.uint64, copy=copy)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def _to_numpy(values) -> np.ndarray:
    """Accept pyarrow Array/ChunkedArray, pandas Series, list, or ndarray."""
    if pa is not None and isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_string(values.type) or pa.types.is_large_string(values.type):
            return np.asarray(values.to_pandas(), dtype=object)
        return values.to_numpy(zero_copy_only=False)
    if isinstance(values, pd.Series):
        return values.to_numpy()
    return np.asarray(values)


def _to_numpy_dropnull(values) -> np.ndarray:
    """Like _to_numpy but with nulls removed — sketch updates follow SQL
    aggregate semantics (COUNT(DISTINCT x) ignores NULL)."""
    if pa is not None and isinstance(values, (pa.Array, pa.ChunkedArray)):
        return _to_numpy(values.drop_null())
    arr = _to_numpy(values)
    if arr.dtype == object:
        mask = pd.notna(arr)
        if not mask.all():
            arr = arr[mask]
    elif arr.dtype.kind == "f":
        arr = arr[~np.isnan(arr)]
    return arr


def hash_base(values) -> np.ndarray:
    """The seed-0 base hash of a column → uint64 ndarray. Sketches that
    need several hash functions over the SAME column (CMS rows, Bloom
    probes, the updater's three hash-sketches) compute this once and
    derive seeded variants with ``derive64`` — one expensive pass over the
    data instead of one per hash function."""
    arr = _to_numpy(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        if arr.dtype != object:
            arr = arr.astype(object)
        raw = pd.util.hash_array(arr, categorize=False)
    elif arr.dtype.kind in ("i", "u"):
        raw = arr.astype(np.uint64, copy=False)
    elif arr.dtype.kind == "f":
        a = arr.astype(np.float64, copy=True)
        a[a == 0.0] = 0.0  # fold -0.0 into +0.0
        raw = a.view(np.uint64)
    elif arr.dtype.kind == "b":
        raw = arr.astype(np.uint64)
    elif arr.dtype.kind == "M":  # datetime64
        raw = arr.view(np.int64).astype(np.uint64)
    else:
        raise TypeError(f"hash64: unsupported dtype {arr.dtype}")
    return _splitmix64(raw)


def derive64(base: np.ndarray, seed: int) -> np.ndarray:
    """Seeded hash derived from the base hash (seed 0 = the base itself).
    A full splitmix64 finalizer over base+seed·golden gives approximately
    independent families (Kirsch–Mitzenmacher quality)."""
    if seed == 0:
        return base
    # base + seed·golden materializes a fresh temporary; finalize it in
    # place rather than allocating a second same-sized array
    return _splitmix64(
        base + np.uint64((int(seed) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)),
        copy=False)


def hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of a column of values → uint64 ndarray.

    Deterministic across processes/workers (PYTHONHASHSEED-independent).
    ``seed`` selects an (approximately) independent hash function.
    Identity: hash64(v, s) == derive64(hash_base(v), s).
    """
    return derive64(hash_base(values), seed)


def hash64_scalar(value, seed: int = 0) -> int:
    """Hash a single item identically to hash64 over a column."""
    return int(hash64(np.array([value], dtype=object if isinstance(value, (str, bytes)) else None), seed)[0])
