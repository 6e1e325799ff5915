"""KLL quantile sketch (Karnin, Lang, Liberty — FOCS 2016).

Worst-case normalized rank error ε with space O((1/ε)·sqrt(log(1/δ)));
at the default k=200 the published constant (Apache DataSketches tables)
is ≈1.65% normalized rank error at 99% confidence.

Structure: a ladder of compactors; level l holds items of weight 2^l.
Level capacities shrink geometrically (c = 2/3) from the top. When full,
the lowest over-capacity level is sorted and every other item is promoted
one level up (the compaction coin is a deterministic counter-seeded
splitmix bit — reproducible across runs/workers; noted deviation from the
paper's random coin, sound for non-adversarial inputs and required for the
byte-stable resume tests, SURVEY.md §5.3).

Merge: concatenate compactors level-wise, then re-compact — associative and
commutative in *estimate* (state depends on merge order; tests compare
quantile estimates within bound, not bytes — SURVEY.md §5.2).

No reference file exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, _Reader, _Writer, register

_C = 2.0 / 3.0
_M64 = (1 << 64) - 1


def _coin(counter: int, seed: int) -> int:
    x = (counter * 0x9E3779B97F4A7C15 + seed) & _M64
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _M64
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _M64
    return (x ^ (x >> 31)) & 1


@register
class KLL(Sketch):
    TYPE_CODE = 4

    def __init__(self, k: int = 200, seed: int = 0):
        if k < 8:
            raise ValueError("KLL k must be >= 8")
        self.k = k
        self.seed = seed
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._flips = 0
        self._min = math.inf
        self._max = -math.inf

    # ---------------------------------------------------------------- sizes
    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        return max(2, int(math.ceil(self.k * (_C ** (height - 1 - level)))))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _max_size(self) -> int:
        return sum(self._capacity(l) for l in range(len(self.compactors)))

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
        self.compactors[0] = np.concatenate([self.compactors[0], arr])
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._max_size():
            for l in range(len(self.compactors)):
                if len(self.compactors[l]) >= self._capacity(l):
                    self._compact_level(l)
                    break
            else:  # total over budget but no single level over: compact level 0
                self._compact_level(int(np.argmax([len(c) for c in self.compactors])))

    def _compact_level(self, l: int) -> None:
        arr = np.sort(self.compactors[l])
        offset = _coin(self._flips, self.seed)
        self._flips += 1
        promoted = arr[offset::2]
        if l + 1 == len(self.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        self.compactors[l + 1] = np.concatenate([self.compactors[l + 1], promoted])
        self.compactors[l] = np.empty(0, dtype=np.float64)

    # ---------------------------------------------------------------- merge
    def merge(self, other: "KLL") -> "KLL":
        if not isinstance(other, KLL) or other.k != self.k:
            raise ValueError("can only merge KLL with identical k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for l, comp in enumerate(other.compactors):
            if len(comp):
                self.compactors[l] = np.concatenate([self.compactors[l], comp])
        self.n += other.n
        self._flips += other._flips
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    # ---------------------------------------------------------------- query
    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for l, comp in enumerate(self.compactors):
            if len(comp):
                items.append(comp)
                weights.append(np.full(len(comp), 1 << l, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, phi: float) -> float:
        """Value at normalized rank phi in [0, 1]."""
        it, wt = self._items_weights()
        if len(it) == 0:
            return math.nan
        if phi <= 0:
            return self._min
        if phi >= 1:
            return self._max
        cum = np.cumsum(wt)
        target = phi * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(i, len(it) - 1)])

    def quantiles(self, phis) -> np.ndarray:
        return np.array([self.quantile(p) for p in phis])

    def rank(self, value: float) -> float:
        """Normalized rank of value (fraction of items <= value)."""
        it, wt = self._items_weights()
        if len(it) == 0:
            return math.nan
        cum = np.concatenate([[0], np.cumsum(wt)])
        i = int(np.searchsorted(it, value, side="right"))
        return float(cum[i]) / float(cum[-1])

    def finalize(self) -> bytes:
        return self.to_bytes()

    def error_bound(self) -> float:
        """Normalized rank error at ~99% confidence (DataSketches constant
        scaled from k=200 ≈ 1.65%; error ∝ 1/k)."""
        return 0.0165 * (200.0 / self.k)

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        w = (
            _Writer()
            .u32(self.k)
            .u64(self.seed)
            .u64(self.n)
            .u64(self._flips)
            .f64(self._min)
            .f64(self._max)
            .u32(len(self.compactors))
        )
        for comp in self.compactors:
            w.u32(len(comp)).raw(np.ascontiguousarray(comp).tobytes())
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KLL":
        r = _Reader(payload)
        k, seed, n, flips = r.u32(), r.u64(), r.u64(), r.u64()
        mn, mx, levels = r.f64(), r.f64(), r.u32()
        out = cls(k=k, seed=seed)
        out.n, out._flips, out._min, out._max = n, flips, mn, mx
        out.compactors = []
        for _ in range(levels):
            ln = r.u32()
            out.compactors.append(np.frombuffer(r.raw(8 * ln), dtype=np.float64).copy())
        return out
