"""HyperLogLog with sparse + dense register representations.

Answers COUNT DISTINCT with relative standard error ~1.04/sqrt(m)
(~0.81% at the default precision p=14, m=16384 registers).

- Dense mode: m uint8 registers, update via vectorized ``np.maximum.at``.
- Sparse mode (low cardinality): sorted unique 64-bit item hashes —
  full-precision, so sparse estimates are EXACT (up to ~2^-64 hash
  collisions), strictly better than HLL++'s p'=25 sparse encoding; the
  registers are derived vectorized at promotion (once the hash count
  exceeds ``m // 4``, where the dense array becomes the smaller form).
  Required by the contract: "HyperLogLog (dense+sparse registers)"
  (BASELINE.json "north_star"; no reference file exists — SURVEY.md §0).
- Estimator: Ertl's improved raw estimator (tau/sigma form), which removes
  the linear-counting/raw transition bias without empirical bias tables.

Papers: Flajolet, Fusy, Gandouet, Meunier (AofA 2007); Heule, Nunkesser,
Hall "HyperLogLog in Practice" (EDBT 2013) for sparse mode; Ertl "New
cardinality estimation algorithms for HyperLogLog sketches" (2017) for the
estimator.

Merge is associative, commutative, and byte-deterministic (register-wise
max / pair-wise max), so re-associated distributed merges produce identical
state (tested in tests/test_properties.py).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .hashing import hash64

_MODE_SPARSE = 0
_MODE_DENSE = 1


@register
class HyperLogLog(Sketch):
    TYPE_CODE = 1

    def __init__(self, p: int = 14, seed: int = 0):
        if not 4 <= p <= 18:
            raise ValueError("HLL precision p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.q = 64 - p  # bits available for rho
        self.seed = seed
        self._sparse_limit = self.m // 4
        self._sparse: np.ndarray | None = np.empty(0, dtype=np.uint64)  # sorted item hashes
        self._regs: np.ndarray | None = None  # dense uint8[m]

    # ---------------------------------------------------------------- update
    def _idx_rho_from_h(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = (h >> np.uint64(self.q)).astype(np.uint32)
        w = h & np.uint64((1 << self.q) - 1)
        # bit_length via frexp exponent: exact for w < 2^53 (p >= 11); for
        # smaller p the off-by-one probability is ~2^-40 per item (negligible).
        _, exp = np.frexp(w.astype(np.float64))
        rho = (self.q - exp + 1).astype(np.uint8)  # w == 0 → rho = q + 1
        return idx, rho

    def update(self, values) -> None:
        from .hashing import _to_numpy_dropnull

        arr = _to_numpy_dropnull(values)
        if len(arr) == 0:
            return
        self.update_hashed(hash64(arr, seed=self.seed))

    def update_hashed(self, h: np.ndarray, assume_unique: bool = False) -> None:
        """Absorb pre-hashed values (h = hash64(values, seed=self.seed)) —
        lets callers hash a shared column once for several sketches.
        assume_unique=True skips the internal dedup sort (caller already
        deduped; duplicates would not change the result, only cost)."""
        if len(h) == 0:
            return
        if self._regs is not None:
            idx, rho = self._idx_rho_from_h(h)
            np.maximum.at(self._regs, idx, rho)
        else:
            self._merge_sparse(h, assume_unique=assume_unique)

    def _merge_sparse(self, h: np.ndarray, assume_unique: bool = False) -> None:
        # promotion is keyed on the TRUE deduped size only, so the
        # sparse/dense representation is independent of update/merge order
        # (byte-determinism; see the boundary soak in round-1 history)
        hu = h if assume_unique else np.unique(h)
        if len(hu) > self._sparse_limit:
            self._promote()
            idx, rho = self._idx_rho_from_h(hu)
            np.maximum.at(self._regs, idx, rho)
            return
        self._sparse = np.union1d(self._sparse, hu)
        if len(self._sparse) > self._sparse_limit:
            self._promote()

    def _promote(self) -> None:
        regs = np.zeros(self.m, dtype=np.uint8)
        if len(self._sparse):
            idx, rho = self._idx_rho_from_h(self._sparse)
            np.maximum.at(regs, idx.astype(np.int64), rho)
        self._regs = regs
        self._sparse = None

    @property
    def is_sparse(self) -> bool:
        return self._regs is None

    # ---------------------------------------------------------------- merge
    def merge_many(self, others: list["HyperLogLog"]) -> "HyperLogLog":
        """K-way merge: dense inputs fold in one vectorized reduce-max;
        sparse inputs union ONCE instead of a pairwise union1d ladder.
        Promotion stays keyed on the true deduped size (order-invariant
        representation, same rule as merge)."""
        dense, sparse_arrays = [], []
        for o in others:
            if not isinstance(o, HyperLogLog) or o.p != self.p or o.seed != self.seed:
                raise ValueError("can only merge HLLs with identical (p, seed)")
            if o._regs is not None:
                dense.append(o)
            elif len(o._sparse):
                sparse_arrays.append(o._sparse)
        if sparse_arrays and self._regs is None:
            self._merge_sparse(np.concatenate(sparse_arrays))
            sparse_arrays = []
        if dense and self._regs is None:
            self._promote()
        if dense:
            np.maximum.reduce([self._regs] + [o._regs for o in dense],
                              out=self._regs)
        for a in sparse_arrays:  # self already dense
            idx, rho = self._idx_rho_from_h(a)
            np.maximum.at(self._regs, idx.astype(np.int64), rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if not isinstance(other, HyperLogLog) or other.p != self.p or other.seed != self.seed:
            raise ValueError("can only merge HLLs with identical (p, seed)")
        if other._regs is not None and self._regs is None:
            self._promote()
        if self._regs is not None:
            if other._regs is not None:
                np.maximum(self._regs, other._regs, out=self._regs)
            elif len(other._sparse):
                idx, rho = self._idx_rho_from_h(other._sparse)
                np.maximum.at(self._regs, idx.astype(np.int64), rho)
        else:
            self._merge_sparse(other._sparse, assume_unique=True)
        return self

    # ---------------------------------------------------------------- estimate
    def _register_histogram(self) -> np.ndarray:
        c = np.zeros(self.q + 2, dtype=np.int64)
        vals, counts = np.unique(self._regs, return_counts=True)
        c[vals.astype(np.int64)] = counts
        return c

    @staticmethod
    def _sigma(x: float) -> float:
        if x == 1.0:
            return math.inf
        y, z = 1.0, x
        while True:
            x = x * x
            z_prev = z
            z += x * y
            y += y
            if z == z_prev:
                return z

    @staticmethod
    def _tau(x: float) -> float:
        if x == 0.0 or x == 1.0:
            return 0.0
        y, z = 1.0, 1.0 - x
        while True:
            x = math.sqrt(x)
            z_prev = z
            y *= 0.5
            z -= (1.0 - x) ** 2 * y
            if z == z_prev:
                return z / 3.0

    def estimate(self) -> float:
        if self._regs is None:
            # sparse mode stores full unique hashes → exact count
            return float(len(self._sparse))
        c = self._register_histogram()
        m = float(self.m)
        z = m * self._tau(1.0 - c[self.q + 1] / m)
        for k in range(self.q, 0, -1):
            z = 0.5 * (z + c[k])
        z += m * self._sigma(c[0] / m)
        alpha_inf = 1.0 / (2.0 * math.log(2.0))
        return alpha_inf * m * m / z

    def finalize(self) -> float:
        return self.estimate()

    def error_bound(self) -> float:
        """Published relative standard error (1 sigma)."""
        return 1.04 / math.sqrt(self.m)

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        w = _Writer().u8(self.p).u64(self.seed)
        if self._regs is not None:
            w.u8(_MODE_DENSE).raw(self._regs.tobytes())
        else:
            w.u8(_MODE_SPARSE).u32(len(self._sparse)).raw(
                np.ascontiguousarray(self._sparse, dtype=np.uint64).tobytes()
            )
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "HyperLogLog":
        r = _Reader(payload)
        p, seed, mode = r.u8(), r.u64(), r.u8()
        out = cls(p=p, seed=seed)
        if mode == _MODE_DENSE:
            out._regs = np.frombuffer(r.raw(out.m), dtype=np.uint8).copy()
            out._sparse = None
        else:
            n = r.u32()
            out._sparse = np.frombuffer(r.raw(8 * n), dtype=np.uint64).copy()
        return out
