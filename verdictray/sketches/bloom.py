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
from .hashing import _to_numpy, hash64


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
        self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)
        self.n_added = 0  # counts update() items incl. re-inserts (upper bound on n)

    # ---------------------------------------------------------------- update
    def _bit_positions(self, values) -> np.ndarray:
        """(k, len) bit positions via double hashing."""
        h1 = hash64(values, seed=self.seed)
        h2 = hash64(values, seed=self.seed + 1) | np.uint64(1)
        m = np.uint64(self.m_bits)
        pos = np.empty((self.k, len(h1)), dtype=np.int64)
        for j in range(self.k):
            pos[j] = ((h1 + np.uint64(j) * h2) % m).astype(np.int64)
        return pos

    def update(self, values) -> None:
        arr = _to_numpy(values)
        if len(arr) == 0:
            return
        pos = self._bit_positions(arr).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        self.n_added += len(arr)

    # ---------------------------------------------------------------- query
    def contains(self, values) -> np.ndarray:
        """Vectorized membership probe → bool ndarray (True = maybe present)."""
        arr = _to_numpy(values)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._bit_positions(arr)
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
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (
            not isinstance(other, BloomFilter)
            or other.m_bits != self.m_bits
            or other.k != self.k
            or other.seed != self.seed
        ):
            raise ValueError("can only merge Blooms with identical (capacity, fpp, seed)")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def finalize(self) -> bytes:
        """The filter itself is the answer; expose the serialized blob."""
        return self.to_bytes()

    def fill_ratio(self) -> float:
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
            .raw(self.bits.tobytes())
        )
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "BloomFilter":
        r = _Reader(payload)
        cap, fpp, seed, n_added = r.u64(), r.f64(), r.u64(), r.u64()
        out = cls(capacity=cap, fpp=fpp, seed=seed)
        out.bits = np.frombuffer(r.raw(len(out.bits)), dtype=np.uint8).copy()
        out.n_added = n_added
        return out
