"""Bloom filter for approximate membership.

Guarantees: zero false negatives; false-positive rate
fpp ≈ (1 - e^{-kn/m})^k <= target p when sized for n expected items with
m/n = -ln(p)/(ln 2)^2 bits/item and k = (m/n) * ln 2 hash functions
(Bloom, CACM 1970). Defaults: p=0.01 → ~9.59 bits/item, k=7.

Bit positions come from Kirsch–Mitzenmacher double hashing over the shared
``hash64`` family (hashing.py), so two filters with identical
(capacity, fpp, seed) place items identically and merge by bitwise OR —
associative, commutative, byte-deterministic.

No reference file exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .hashing import _to_numpy

# Per-process scratch buffers for the promotion scatter (one per kind,
# grown to the largest size seen). Warm Ray workers promote many shards;
# reusing the m_bits-sized boolean and the position temp keeps repeat
# promotions free of fresh-page faults. Plain module state is safe: Ray
# tasks in one worker process run serially.
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(kind: str, n: int, dtype) -> np.ndarray:
    buf = _SCRATCH.get(kind)
    if buf is None or len(buf) < n or buf.dtype != np.dtype(dtype):
        buf = np.empty(n, dtype=dtype)
        _SCRATCH[kind] = buf
    return buf[:n]


@register
class BloomFilter(Sketch):
    TYPE_CODE = 3

    def __init__(self, capacity: int = 1_000_000, fpp: float = 0.01, seed: int = 0):
        if not 0.0 < fpp < 1.0:
            raise ValueError("fpp must be in (0, 1)")
        self.capacity = int(capacity)
        self.fpp = float(fpp)
        self.seed = seed
        bits_per_item = -math.log(fpp) / (math.log(2) ** 2)
        self.m_bits = max(64, int(math.ceil(self.capacity * bits_per_item)))
        self.k = max(1, int(round(bits_per_item * math.log(2))))
        # Sparse-until-promoted (mirrors HLL): small/partial filters hold
        # the sorted unique BASE HASHES of inserted items (8 bytes/item —
        # 7x smaller than the k bit positions, which are re-derived
        # vectorized at promotion). Distributed per-group partials stay
        # KiB-sized for tail groups, and sparse membership probes are
        # EXACT (zero false positives until promotion). Essential when
        # grouping by a high-cardinality key (repo), where a dense
        # m/8-byte bitmap per partial would dominate the shuffle.
        self._sparse_limit = max(64, self.m_bits // 64)  # 8B/hash vs m/8 dense
        self._sparse: np.ndarray | None = np.empty(0, dtype=np.uint64)  # sorted base hashes
        self.bits: np.ndarray | None = None  # dense uint8[(m+7)//8] once promoted
        self.n_added = 0  # counts update() items incl. re-inserts (upper bound on n)

    # ---------------------------------------------------------------- update
    def _bit_positions(self, values) -> np.ndarray:
        from .hashing import hash_base

        return self._bit_positions_from_base(hash_base(_to_numpy(values)))

    def _bit_positions_from_base(self, base: np.ndarray) -> np.ndarray:
        """(k, len) bit positions via double hashing off the base hash."""
        h1m, h2m = self._reduced_h12(base)
        pos = np.empty((self.k, len(h1m)), dtype=np.int64)
        for j in range(self.k):
            pos[j] = (h1m + j * h2m) % self.m_bits
        return pos

    def _reduced_h12(self, base: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # reduce mod m once in uint64; per-row double hashing then runs on
        # small int64s — identical positions ((a+j*b) mod m distributes),
        # ~5x cheaper than k uint64 modulos
        from .hashing import derive64

        m = np.uint64(self.m_bits)
        # the mod result is a fresh array and every value is < m < 2^63,
        # so reinterpreting as int64 (view) replaces two more same-sized
        # allocations (astype copies)
        h1m = (derive64(base, self.seed) % m).view(np.int64)
        h2m = ((derive64(base, self.seed + 1) | np.uint64(1)) % m).view(np.int64)
        return h1m, h2m

    @property
    def is_sparse(self) -> bool:
        return self.bits is None

    def _promote(self) -> None:
        bases = self._sparse
        self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)
        self._sparse = None
        if len(bases):
            self._set_dense_from_base(bases)

    def _set_dense_from_base(self, base: np.ndarray) -> None:
        h1m, h2m = self._reduced_h12(base)
        if len(base) * self.k * 32 < self.m_bits:
            # Tiny input into a big dense filter (e.g. a sparse partial
            # merging into a promoted one): a full-bitmap pass is O(m_bits)
            # regardless of input size — scatter the O(k·n) positions
            # directly instead (ADVICE r2). Crossover ~m/32 positions:
            # ufunc.at runs ~10M ops/s vs the ~300M bytes/s bitmap pass.
            pos = np.concatenate([(h1m + j * h2m) % self.m_bits
                                  for j in range(self.k)])
            np.bitwise_or.at(self.bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
            return
        # constant-value boolean scatter + packbits instead of
        # np.bitwise_or.at: writing `True` through fancy indexing is
        # duplicate-safe and fully vectorized, while ufunc.at crawls at
        # ~10M ops/s — 6.9s -> ~0.6s for a 4.6M-item promotion (k=7).
        # packbits(bitorder="little") matches the bits[pos>>3] |= 1<<(pos&7)
        # layout exactly. The m_bits-sized boolean buffer and the position
        # temporary are cached per process: a big promotion inside a warm
        # Ray worker then touches no fresh pages (first-touch faults cost
        # ~70 µs/page on this VM — BASELINE.md §controls), and every j
        # iteration reuses ONE temp via out= instead of allocating two
        # arrays per hash function.
        seen = _scratch("seen", self.m_bits, bool)
        seen[:] = False
        tmp = _scratch("pos", len(h1m), np.int64)
        for j in range(self.k):
            np.multiply(h2m, j, out=tmp)
            np.add(tmp, h1m, out=tmp)
            np.mod(tmp, self.m_bits, out=tmp)
            seen[tmp] = True
        np.bitwise_or(self.bits, np.packbits(seen, bitorder="little"),
                      out=self.bits)

    def _add_bases(self, base: np.ndarray, assume_unique: bool = False) -> None:
        if self.bits is not None:
            self._set_dense_from_base(base)
            return
        # promotion is keyed on the TRUE deduped size only — a pre-dedup
        # shortcut would make sparse-vs-dense depend on update/merge order
        # and break byte-determinism (caught by the boundary soak)
        bu = base if assume_unique else np.unique(base)
        if len(bu) > self._sparse_limit:
            # fast path: incoming alone overflows → promote, scatter dense
            self._promote()
            self._set_dense_from_base(bu)
            return
        self._sparse = np.union1d(self._sparse, bu)
        if len(self._sparse) > self._sparse_limit:
            self._promote()

    def update(self, values) -> None:
        from .hashing import _to_numpy_dropnull, hash_base

        arr = _to_numpy_dropnull(values)
        if len(arr) == 0:
            return
        self.update_hashed(hash_base(arr))

    def update_hashed(self, base: np.ndarray, assume_unique: bool = False,
                      n_raw: int | None = None) -> None:
        """Absorb pre-hashed values (base = hash_base(values)).
        assume_unique skips the dedup sort; n_raw keeps the raw insert
        counter honest when the caller pre-deduped."""
        if len(base) == 0:
            return
        self._add_bases(base, assume_unique=assume_unique)
        self.n_added += n_raw if n_raw is not None else len(base)

    # ---------------------------------------------------------------- query
    def contains(self, values) -> np.ndarray:
        """Vectorized membership probe → bool ndarray (True = maybe present)."""
        arr = _to_numpy(values)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        from .hashing import hash_base

        base = hash_base(arr)
        if self.bits is None:
            # sparse mode: exact membership of the base hash (no FP)
            if len(self._sparse) == 0:
                return np.zeros(len(arr), dtype=bool)
            i = np.minimum(np.searchsorted(self._sparse, base), len(self._sparse) - 1)
            return self._sparse[i] == base
        pos = self._bit_positions_from_base(base)
        out = np.ones(len(arr), dtype=bool)
        for j in range(self.k):
            p = pos[j]
            out &= (self.bits[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
        return out

    def contains_one(self, value) -> bool:
        return bool(
            self.contains(np.array([value], dtype=object if isinstance(value, (str, bytes)) else None))[0]
        )

    # ---------------------------------------------------------------- merge
    def _check_compat(self, other: "BloomFilter") -> None:
        if (
            not isinstance(other, BloomFilter)
            or other.m_bits != self.m_bits
            or other.k != self.k
            or other.seed != self.seed
        ):
            raise ValueError("can only merge Blooms with identical (capacity, fpp, seed)")

    def merge_many(self, others: list["BloomFilter"]) -> "BloomFilter":
        """K-way merge. Sparse inputs fold in ONE union instead of a
        pairwise union1d ladder (the ladder re-sorts the accumulated array
        per input: ~k/2 x the data volume for k inputs). When the sparse
        hash arrays are pairwise-DISJOINT SORTED RANGES — exactly what the
        salted merge's hash-range shards produce — the union is a plain
        concatenation and the true unique count is the sum of lengths, so
        the promotion decision stays exact (order-invariance requires
        promotion keyed on the true deduped size) with no sort at all.
        Dense inputs then OR in vectorized."""
        sparse_arrays: list[np.ndarray] = []
        dense: list[BloomFilter] = []
        for o in others:
            self._check_compat(o)
            self.n_added += o.n_added
            if o.bits is not None:
                dense.append(o)
            elif len(o._sparse):
                sparse_arrays.append(o._sparse)
        if self.bits is None:
            arrays = ([self._sparse] if len(self._sparse) else []) + sparse_arrays
            if arrays:
                arrays.sort(key=lambda a: int(a[0]))
                if all(arrays[i][-1] < arrays[i + 1][0]
                       for i in range(len(arrays) - 1)):
                    u = np.concatenate(arrays)  # disjoint sorted ranges
                else:
                    u = np.unique(np.concatenate(arrays))
                self._sparse = u
                if len(u) > self._sparse_limit:
                    self._promote()
            sparse_arrays = []
        if dense and self.bits is None:
            self._promote()
        for o in dense:
            np.bitwise_or(self.bits, o.bits, out=self.bits)
        for a in sparse_arrays:  # self already dense
            self._set_dense_from_base(a)
        return self

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        if other.bits is not None and self.bits is None:
            self._promote()
        if self.bits is not None:
            if other.bits is not None:
                np.bitwise_or(self.bits, other.bits, out=self.bits)
            else:
                if len(other._sparse):
                    self._set_dense_from_base(other._sparse)
        else:
            self._add_bases(other._sparse, assume_unique=True)
        self.n_added += other.n_added
        return self

    def finalize(self) -> bytes:
        """The filter itself is the answer; expose the serialized blob."""
        return self.to_bytes()

    def dense_bits(self) -> np.ndarray:
        """Materialized bit array (promotes a copy if sparse) — identical
        for any representation holding the same item set; used by the
        cross-pipeline equivalence tests."""
        if self.bits is not None:
            return self.bits
        clone = BloomFilter.from_bytes(self.to_bytes())
        clone._promote()
        return clone.bits

    def fill_ratio(self) -> float:
        if self.bits is None:
            return len(self._sparse) / self.m_bits
        return float(np.unpackbits(self.bits).sum()) / self.m_bits

    def expected_fpp(self) -> float:
        """Current expected false-positive rate from the fill ratio."""
        return self.fill_ratio() ** self.k

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        w = (
            _Writer()
            .u64(self.capacity)
            .f64(self.fpp)
            .u64(self.seed)
            .u64(self.n_added)
        )
        if self.bits is not None:
            w.u8(1).raw(self.bits.tobytes())
        else:
            w.u8(0).u32(len(self._sparse)).raw(
                np.ascontiguousarray(self._sparse, dtype=np.uint64).tobytes()
            )
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "BloomFilter":
        r = _Reader(payload)
        cap, fpp, seed, n_added = r.u64(), r.f64(), r.u64(), r.u64()
        out = cls(capacity=cap, fpp=fpp, seed=seed)
        if r.u8():
            out.bits = np.frombuffer(
                r.raw((out.m_bits + 7) // 8), dtype=np.uint8
            ).copy()
            out._sparse = None
        else:
            n = r.u32()
            out._sparse = np.frombuffer(r.raw(8 * n), dtype=np.uint64).copy()
        out.n_added = n_added
        return out
