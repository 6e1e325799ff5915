"""KMV (bottom-k / theta) distinct-count sketch with SET OPERATIONS.

Keeps the ``k`` smallest distinct 64-bit hashes of the values seen. With
U(k) = the k-th smallest hash normalized to (0, 1], the classic unbiased
KMV estimator is

    D̂ = (k − 1) / U(k)          (RSE ≈ 1/√(k−2))

and below saturation (fewer than k distinct hashes stored) the sketch IS
the exact distinct set — the exact-at-small-scale property the sf0.01
oracle query exploits, same trick as the sparse-HLL / CMS / MG oracles.

Why a sixth hash sketch when HLL already counts distinct: the theta
framework gives PROPER set-operation estimates. Each sketch is a uniform
hash sample of its distinct items below a threshold θ (= U(k) when
saturated, else 1). For two sketches, cut both to θ = min(θ_a, θ_b);
the retained hashes are then uniform samples of each set at the SAME
rate θ, so

    |A ∩ B|  ≈  |Â<θ ∩ B̂<θ| / θ
    |A \\ B|  ≈  |Â<θ \\ B̂<θ| / θ
    |A ∪ B|  ≈  ordinary KMV merge (union keeps bottom-k semantics)

— direct estimates with sampling-error bounds, unlike HLL's
inclusion–exclusion intersection whose variance scales with the UNION
size (query.py::hll_intersection documents that caveat; this sketch is
the fix). Published basis: Bar-Yossef et al. 2002 (counting distinct
elements), Beyer et al. SIGMOD 2007 (KMV synopses for distinct-value
estimation), Dasgupta et al. 2016 ("A Framework for Estimating Stream
Expression Cardinalities" — the theta-sketch framework, public
DataSketches literature).

Distributed use: per-batch/per-group partials merge associatively through
the standard UDAF partial+final pattern (udaf.as_aggregate); the wire form
is the uniform Sketch blob (sorted uint64 array, 8 B per retained hash,
O(k) bounded). Merge is np.union1d + truncate — byte-deterministic under
any re-association, so the fused-pipeline split-invariance property tests
apply verbatim.

No reference implementation exists (/root/reference is empty, SURVEY.md
§0); semantics follow the public papers above.
"""

from __future__ import annotations

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .hashing import _to_numpy_dropnull, hash64

_TWO64 = float(1 << 64)


@register
class KMV(Sketch):
    TYPE_CODE = 8

    def __init__(self, k: int = 2048, seed: int = 0):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        self.seed = int(seed)
        # sorted ascending, distinct; len <= k
        self.hashes = np.empty(0, dtype=np.uint64)

    # ------------------------------------------------------------ update
    def update(self, values) -> None:
        arr = _to_numpy_dropnull(values)
        if len(arr) == 0:
            return
        h = np.unique(hash64(arr, self.seed))
        if len(self.hashes):
            h = np.union1d(self.hashes, h)
        self.hashes = h[: self.k]

    # ------------------------------------------------------------- merge
    def merge(self, other: "KMV") -> "KMV":
        if not isinstance(other, KMV):
            raise TypeError("can only merge KMV with KMV")
        if other.k != self.k or other.seed != self.seed:
            raise ValueError(
                f"cannot merge KMV(k={self.k}, seed={self.seed}) with "
                f"KMV(k={other.k}, seed={other.seed})")
        if len(other.hashes):
            self.hashes = np.union1d(self.hashes, other.hashes)[: self.k]
        return self

    # ---------------------------------------------------------- estimates
    @property
    def saturated(self) -> bool:
        return len(self.hashes) >= self.k

    @property
    def theta(self) -> float:
        """Inclusion threshold: retained hashes are a uniform sample (at
        rate θ) of the distinct items. (h+1)/2^64 so θ=1 needs the max
        hash and the k-th smallest hash itself is always < θ·2^64."""
        if not self.saturated:
            return 1.0
        return (int(self.hashes[self.k - 1]) + 1) / _TWO64

    def estimate(self) -> float:
        if not self.saturated:
            return float(len(self.hashes))
        # (k-1)/U(k): unbiased for the number of distinct hashes
        return (self.k - 1) * _TWO64 / (int(self.hashes[self.k - 1]) + 1)

    def rse(self) -> float:
        """Relative standard error of estimate() (0 below saturation)."""
        return 0.0 if not self.saturated else 1.0 / np.sqrt(self.k - 2)

    def finalize(self) -> float:
        return self.estimate()

    # ----------------------------------------------------------- set ops
    def _cut(self, theta: float) -> np.ndarray:
        """Retained hashes below a (possibly smaller) threshold θ."""
        bound = np.uint64(min(int(theta * _TWO64), (1 << 64) - 1))
        return self.hashes[self.hashes < bound]

    def intersection(self, other: "KMV") -> float:
        """|self ∩ other| — theta-framework estimate (exact when neither
        sketch is saturated)."""
        self._check_compat(other)
        theta = min(self.theta, other.theta)
        n = len(np.intersect1d(self._cut(theta), other._cut(theta),
                               assume_unique=True))
        return n / theta

    def difference(self, other: "KMV") -> float:
        """|self \\ other| — items in self but not other."""
        self._check_compat(other)
        theta = min(self.theta, other.theta)
        n = len(np.setdiff1d(self._cut(theta), other._cut(theta),
                             assume_unique=True))
        return n / theta

    def union_estimate(self, other: "KMV") -> float:
        """|self ∪ other| without mutating either side."""
        self._check_compat(other)
        merged = KMV(k=self.k, seed=self.seed)
        merged.hashes = self.hashes.copy()
        return merged.merge(other).estimate()

    def _check_compat(self, other: "KMV") -> None:
        if not isinstance(other, KMV):
            raise TypeError("set ops need two KMV sketches")
        if other.k != self.k or other.seed != self.seed:
            raise ValueError("set ops need identical (k, seed)")

    # ------------------------------------------------------------- wire
    def _payload_bytes(self) -> bytes:
        w = _Writer()
        w.u32(self.k).u64(self.seed).u32(len(self.hashes))
        w.raw(self.hashes.tobytes())
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KMV":
        r = _Reader(payload)
        k = r.u32()
        seed = r.u64()
        m = r.u32()
        sk = cls(k=k, seed=seed)
        sk.hashes = np.frombuffer(r.raw(8 * m), dtype=np.uint64).copy()
        return sk
