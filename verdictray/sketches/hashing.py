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


# pandas' default hash key, split into the two SipHash key words (LE)
_SIP_K = np.frombuffer(b"0123456789123456", dtype="<u8").astype(np.uint64)
_ROT64 = np.uint64(64)


def _siphash24_fixed(data: np.ndarray, _chunk: int = 8192) -> np.ndarray:
    """Vectorized SipHash-2-4 over an (n, L) uint8 matrix of fixed-width
    rows, bit-identical (after the shared splitmix64 finalizer) to
    ``pd.util.hash_array`` on the corresponding strings — verified by
    tests/test_sketches.py. The word loop runs L//8 (+tail) times over
    uint64 VECTORS, so per-row work is pure numpy; no Python objects.

    Rows process in ~8k chunks: SipHash's rounds become ~40 numpy passes
    per word, so the state vectors must stay cache-resident — chunked is
    3.4× faster than whole-array at 1M×64 B (391 vs 1334 ms) and 2.1×
    faster than the pandas object path including its Arrow→object
    conversion (834 ms), with zero per-row Python allocations."""
    n = len(data)
    if n > _chunk:
        out = np.empty(n, dtype=np.uint64)
        for s in range(0, n, _chunk):
            out[s : s + _chunk] = _siphash24_fixed(data[s : s + _chunk])
        return out
    n, width = data.shape
    k0, k1 = np.uint64(_SIP_K[0]), np.uint64(_SIP_K[1])
    v0 = np.full(n, 0x736F6D6570736575, dtype=np.uint64) ^ k0
    v1 = np.full(n, 0x646F72616E646F6D, dtype=np.uint64) ^ k1
    v2 = np.full(n, 0x6C7967656E657261, dtype=np.uint64) ^ k0
    v3 = np.full(n, 0x7465646279746573, dtype=np.uint64) ^ k1

    def rotl(x, b):
        b = np.uint64(b)
        return (x << b) | (x >> (_ROT64 - b))

    def siprounds(r):
        nonlocal v0, v1, v2, v3
        for _ in range(r):
            v0 += v1
            v1 = rotl(v1, 13)
            v1 ^= v0
            v0 = rotl(v0, 32)
            v2 += v3
            v3 = rotl(v3, 16)
            v3 ^= v2
            v0 += v3
            v3 = rotl(v3, 21)
            v3 ^= v0
            v2 += v1
            v1 = rotl(v1, 17)
            v1 ^= v2
            v2 = rotl(v2, 32)

    nwords = width // 8
    if nwords:
        # rows may not be 8-aligned in the parent buffer → copy once into
        # an aligned scratch for the u8→u64 view
        head = np.ascontiguousarray(data[:, : nwords * 8])
        words = head.view("<u8")
        for w in range(nwords):
            m = words[:, w].astype(np.uint64, copy=False)
            v3 ^= m
            siprounds(2)
            v0 ^= m
    tail = np.zeros(n, dtype=np.uint64)
    for i in range(width % 8):
        tail |= data[:, nwords * 8 + i].astype(np.uint64) << np.uint64(8 * i)
    b = (np.uint64(width & 0xFF) << np.uint64(56)) | tail
    v3 ^= b
    siprounds(2)
    v0 ^= b
    v2 ^= np.uint64(0xFF)
    siprounds(4)
    v0 ^= v1
    v0 ^= v2
    v0 ^= v3
    return v0


def _arrow_fixed_width_bytes(values) -> np.ndarray | None:
    """(n, L) uint8 view of an Arrow (large_)string/binary column whose
    rows ALL have byte length L > 0 and no nulls — else None. The check is
    one vectorized diff over the offsets; the payoff is hashing without
    materializing one Python object per row (sha256-hex columns — the
    flagship's hashed item column — are always fixed 64-byte rows)."""
    if pa is None or not isinstance(values, (pa.Array, pa.ChunkedArray)):
        return None
    t = values.type
    large = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    if not (large or pa.types.is_string(t) or pa.types.is_binary(t)):
        return None
    if values.null_count or len(values) == 0:
        return None
    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    bufs = arr.buffers()
    off_dtype = np.int64 if large else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype,
                         count=arr.offset + len(arr) + 1)[arr.offset:]
    width = int(offs[1] - offs[0])
    if width == 0 or not (np.diff(offs) == width).all():
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    start = int(offs[0])
    return data[start : start + width * len(arr)].reshape(len(arr), width)


def hash_base(values) -> np.ndarray:
    """The seed-0 base hash of a column → uint64 ndarray. Sketches that
    need several hash functions over the SAME column (CMS rows, Bloom
    probes, the updater's three hash-sketches) compute this once and
    derive seeded variants with ``derive64`` — one expensive pass over the
    data instead of one per hash function."""
    mat = _arrow_fixed_width_bytes(values)
    if mat is not None:
        # two finalizer passes: pandas' hash_array applies one splitmix64
        # internally after its SipHash, and hash_base applies its own on
        # top — the fast path must replicate BOTH to stay bit-identical
        return _splitmix64(_splitmix64(_siphash24_fixed(mat), copy=False),
                           copy=False)
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
