"""t-digest (merging variant, Dunning & Ertl 2019).

Quantile sketch that is most accurate at the tails: centroid sizes are
bounded by the k1 scale function k(q) = (δ / 2π) · asin(2q − 1), which
allocates tiny clusters near q→0 and q→1. Default compression δ=100.

This implementation uses the vectorized k-bin discretization of the merging
algorithm: buffered values + existing centroids are sorted, each item's
right-edge quantile q is mapped to bin ⌈k(q)⌉, and consecutive items in the
same bin fuse into one centroid (weighted mean) via ``np.add.reduceat``.
Each resulting cluster spans ≤ 1 unit in k-space, which is exactly the
merging-digest size invariant, so the published empirical error envelope
applies; the pass is fully vectorized (no per-item Python loop).

Merge: concatenate centroid lists and re-cluster — associative and
commutative in *estimate* (state depends on merge order; tests compare
quantile estimates, not bytes — SURVEY.md §5.2). Min/max are tracked
exactly for tail interpolation.

No reference file exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, _Reader, _Writer, register


@register
class TDigest(Sketch):
    TYPE_CODE = 5

    def __init__(self, compression: float = 100.0, buffer_factor: int = 10):
        if compression < 20:
            raise ValueError("t-digest compression must be >= 20")
        self.compression = float(compression)
        self._buffer_cap = int(compression) * buffer_factor
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_len = 0
        self.n = 0
        self._min = math.inf
        self._max = -math.inf

    # ---------------------------------------------------------------- update
    def update(self, values) -> None:
        arr = np.asarray(
            values.to_numpy(zero_copy_only=False) if hasattr(values, "to_numpy") else values,
            dtype=np.float64,
        )
        arr = arr[~np.isnan(arr)]
        if len(arr) == 0:
            return
        self._min = min(self._min, float(arr.min()))
        self._max = max(self._max, float(arr.max()))
        self.n += len(arr)
        self._buf.append(arr)
        self._buf_len += len(arr)
        if self._buf_len >= self._buffer_cap:
            self._flush()

    def _k_scale(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))

    def _flush(self) -> None:
        if not self._buf and len(self.means) == 0:
            return
        if self._buf:
            new = np.concatenate(self._buf)
            means = np.concatenate([self.means, new])
            weights = np.concatenate([self.weights, np.ones(len(new))])
            self._buf, self._buf_len = [], 0
        else:
            means, weights = self.means, self.weights
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        q_right = np.cumsum(weights) / total
        bins = np.ceil(self._k_scale(q_right))
        # boundaries where the k-bin changes → one centroid per run
        starts = np.flatnonzero(np.concatenate([[True], bins[1:] != bins[:-1]]))
        w_sum = np.add.reduceat(weights, starts)
        mw_sum = np.add.reduceat(means * weights, starts)
        self.means = mw_sum / w_sum
        self.weights = w_sum

    # ---------------------------------------------------------------- merge
    def merge(self, other: "TDigest") -> "TDigest":
        if not isinstance(other, TDigest) or other.compression != self.compression:
            raise ValueError("can only merge t-digests with identical compression")
        self._flush()
        other_flushed = other
        if other._buf_len:
            other._flush()
        self.means = np.concatenate([self.means, other_flushed.means])
        self.weights = np.concatenate([self.weights, other_flushed.weights])
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._flush()
        return self

    # ---------------------------------------------------------------- query
    def quantile(self, phi: float) -> float:
        self._flush()
        if len(self.means) == 0:
            return math.nan
        if phi <= 0:
            return self._min
        if phi >= 1:
            return self._max
        means, weights = self.means, self.weights
        total = weights.sum()
        target = phi * total
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(weights)
        mids = cum - weights / 2.0
        if target <= mids[0]:
            # interpolate between exact min and first centroid
            frac = target / max(mids[0], 1e-300)
            return float(self._min + frac * (means[0] - self._min))
        if target >= mids[-1]:
            denom = max(total - mids[-1], 1e-300)
            frac = (target - mids[-1]) / denom
            return float(means[-1] + frac * (self._max - means[-1]))
        i = int(np.searchsorted(mids, target, side="right"))
        lo, hi = mids[i - 1], mids[i]
        frac = (target - lo) / max(hi - lo, 1e-300)
        return float(means[i - 1] + frac * (means[i] - means[i - 1]))

    def quantiles(self, phis) -> np.ndarray:
        return np.array([self.quantile(p) for p in phis])

    def rank(self, value: float) -> float:
        """Normalized rank (CDF) of value — inverse of quantile, piecewise linear."""
        self._flush()
        if len(self.means) == 0:
            return math.nan
        if value <= self._min:
            return 0.0
        if value >= self._max:
            return 1.0
        means, weights = self.means, self.weights
        total = weights.sum()
        cum = np.cumsum(weights)
        mids = cum - weights / 2.0
        xs = np.concatenate([[self._min], means, [self._max]])
        ys = np.concatenate([[0.0], mids, [total]])
        return float(np.interp(value, xs, ys) / total)

    def finalize(self) -> bytes:
        return self.to_bytes()

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        self._flush()
        w = (
            _Writer()
            .f64(self.compression)
            .u64(self.n)
            .f64(self._min)
            .f64(self._max)
            .u32(len(self.means))
            .raw(np.ascontiguousarray(self.means).tobytes())
            .raw(np.ascontiguousarray(self.weights).tobytes())
        )
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "TDigest":
        r = _Reader(payload)
        compression, n, mn, mx, ncent = r.f64(), r.u64(), r.f64(), r.f64(), r.u32()
        out = cls(compression=compression)
        out.n, out._min, out._max = n, mn, mx
        out.means = np.frombuffer(r.raw(8 * ncent), dtype=np.float64).copy()
        out.weights = np.frombuffer(r.raw(8 * ncent), dtype=np.float64).copy()
        return out
