"""Count-Min Sketch with optional heavy-hitter candidate tracking.

Answers point frequency queries with one-sided error: with probability
>= 1 - delta,  f_hat(x) - f(x) in [0, eps * N]  where N is the total count
(Cormode & Muthukrishnan, J. Algorithms 2005). Defaults eps=1e-3, delta=1e-2
→ width w = ceil(e/eps) = 2719, depth d = ceil(ln(1/delta)) = 5.

Rows use the Kirsch–Mitzenmacher double-hashing family
h_j(x) = h1(x) + j*h2(x) mod w over the shared ``hash64`` (hashing.py).

Heavy hitters: each partial sketch tracks up to ``hh_capacity`` candidate
items (exact per-partition top items by local count). Merging unions the
candidate sets and re-truncates by CMS-estimated count; ``top_k(k)``
returns the k candidates with the largest estimates. This is the standard
mergeable CMS+candidate-set heavy-hitter construction; the candidate cap
makes the memory bound explicit.

Merge (counter addition + candidate union) is associative/commutative and
byte-deterministic for the counter table (tested in tests/test_properties.py).
No reference file exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import math
import pickle

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .hashing import _to_numpy, hash64


@register
class CountMin(Sketch):
    TYPE_CODE = 2

    def __init__(
        self,
        eps: float = 1e-3,
        delta: float = 1e-2,
        seed: int = 0,
        hh_capacity: int = 0,
    ):
        self.eps = eps
        self.delta = delta
        self.seed = seed
        self.width = int(math.ceil(math.e / eps))
        self.depth = int(math.ceil(math.log(1.0 / delta)))
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0  # total count — the N in the eps*N bound
        self.hh_capacity = hh_capacity
        self._candidates: dict = {}  # item -> exact-ish local count (pre-merge)

    # ---------------------------------------------------------------- update
    def _positions(self, values) -> np.ndarray:
        """(depth, len) int64 column positions via double hashing."""
        h1 = hash64(values, seed=self.seed)
        h2 = hash64(values, seed=self.seed + 1) | np.uint64(1)
        pos = np.empty((self.depth, len(h1)), dtype=np.int64)
        w = np.uint64(self.width)
        for j in range(self.depth):
            pos[j] = ((h1 + np.uint64(j) * h2) % w).astype(np.int64)
        return pos

    def update(self, values, counts=None) -> None:
        arr = _to_numpy(values)
        if len(arr) == 0:
            return
        # pre-reduce the batch: unique values with counts → far fewer scatter ops
        if counts is None:
            if arr.dtype == object:
                import pandas as pd

                vc = pd.Series(arr).value_counts(sort=False)  # C-speed, preserves item type
                uniq = vc.index.to_numpy(dtype=object)
                cnt = vc.to_numpy(dtype=np.int64)
            else:
                uniq, cnt = np.unique(arr, return_counts=True)
        else:
            uniq, cnt = arr, np.asarray(counts, dtype=np.int64)
        pos = self._positions(uniq)
        for j in range(self.depth):
            np.add.at(self.table[j], pos[j], cnt)
        self.n += int(cnt.sum())
        if self.hh_capacity:
            for v, c in zip(uniq.tolist(), cnt.tolist()):
                self._candidates[v] = self._candidates.get(v, 0) + int(c)
            self._truncate_candidates()

    def _truncate_candidates(self) -> None:
        if len(self._candidates) > 2 * self.hh_capacity:
            top = sorted(self._candidates.items(), key=lambda kv: (-kv[1], str(kv[0])))
            self._candidates = dict(top[: self.hh_capacity])

    # ---------------------------------------------------------------- query
    def query(self, values) -> np.ndarray:
        """Estimated frequency per item (vectorized, upper-biased)."""
        arr = _to_numpy(values)
        pos = self._positions(arr)
        ests = np.empty((self.depth, len(arr)), dtype=np.int64)
        for j in range(self.depth):
            ests[j] = self.table[j][pos[j]]
        return ests.min(axis=0)

    def query_one(self, value) -> int:
        arr = np.array([value], dtype=object) if isinstance(value, (str, bytes)) else np.asarray([value])
        return int(self.query(arr)[0])

    def top_k(self, k: int) -> list[tuple[object, int]]:
        """Heavy hitters: top-k candidates by CMS-estimated count."""
        if not self._candidates:
            return []
        items = list(self._candidates.keys())
        # keep the dtype consistent with the update() path: numeric items
        # hash via the int64-bits path, strings via the object path
        arr = np.asarray(items)
        if arr.dtype.kind in ("U", "S"):
            arr = arr.astype(object)
        ests = self.query(arr)
        order = sorted(zip(items, ests.tolist()), key=lambda kv: (-kv[1], str(kv[0])))
        return order[:k]

    # ---------------------------------------------------------------- merge
    def merge(self, other: "CountMin") -> "CountMin":
        if (
            not isinstance(other, CountMin)
            or other.width != self.width
            or other.depth != self.depth
            or other.seed != self.seed
        ):
            raise ValueError("can only merge CMS with identical (eps, delta, seed)")
        self.table += other.table
        self.n += other.n
        if self.hh_capacity or other.hh_capacity:
            self.hh_capacity = max(self.hh_capacity, other.hh_capacity)
            for v, c in other._candidates.items():
                self._candidates[v] = self._candidates.get(v, 0) + c
            self._truncate_candidates()
        return self

    def finalize(self) -> int:
        """Total stream count N (point queries via .query on the blob)."""
        return self.n

    def error_bound(self) -> float:
        """Additive overestimate bound eps*N (holds w.p. >= 1 - delta)."""
        return self.eps * self.n

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        cand = pickle.dumps(self._candidates, protocol=4)
        w = (
            _Writer()
            .f64(self.eps)
            .f64(self.delta)
            .u64(self.seed)
            .u64(self.n)
            .u32(self.hh_capacity)
            .u32(len(cand))
            .raw(cand)
            .raw(self.table.tobytes())
        )
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "CountMin":
        r = _Reader(payload)
        eps, delta, seed, n, hh_cap, cand_len = r.f64(), r.f64(), r.u64(), r.u64(), r.u32(), r.u32()
        out = cls(eps=eps, delta=delta, seed=seed, hh_capacity=hh_cap)
        out._candidates = pickle.loads(r.raw(cand_len))
        out.n = n
        out.table = (
            np.frombuffer(r.raw(out.depth * out.width * 8), dtype=np.int64)
            .reshape(out.depth, out.width)
            .copy()
        )
        return out
