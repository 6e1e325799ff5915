"""Misra–Gries heavy-hitter summary (deterministic frequent-items sketch).

Maintains at most ``k`` (item, count) counters over a stream; when the
(k+1)-th distinct item arrives, all counters drop by the (k+1)-th largest
count and non-positive ones are evicted. Guarantees, for every item x with
true frequency f(x) over n absorbed values:

    f(x) − n/(k+1)  ≤  estimate(x)  ≤  f(x)

i.e. counts only UNDER-estimate, by at most n/(k+1) — the complementary
deterministic bound to Count-Min's overestimate-only εN (cms.py). Any item
with f(x) > n/(k+1) is guaranteed present. Merging sums counters then
re-compresses; the combined summary keeps the (n₁+n₂)/(k+1) bound
(Agarwal et al., "Mergeable Summaries", PODS 2012 — this is the classic
mergeability result, public). When k ≥ the true distinct count no
decrement ever fires and the counters are EXACT — the property the
sf0.01 oracle query exploits (the same exact-at-small-scale trick as the
sparse HLL and CMS oracles).

Distributed use: per-batch/per-group partials merge associatively through
the standard UDAF partial+final pattern (udaf.as_aggregate); the wire form
is the uniform Sketch blob. The summary itself is O(k) — a bounded
driver-side finalize over the merged blob is scale-safe by construction.

No reference implementation exists (/root/reference is empty, SURVEY.md §0);
semantics follow Misra & Gries 1982 and the PODS 2012 mergeability paper.
"""

from __future__ import annotations

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .hashing import _to_numpy_dropnull


@register
class MisraGries(Sketch):
    TYPE_CODE = 6

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.n = 0            # total values absorbed (for the bound)
        self.decremented = 0  # total per-item decrement applied so far

    # ------------------------------------------------------------ update
    def update(self, values) -> None:
        arr = _to_numpy_dropnull(values)
        if len(arr) == 0:
            return
        uniq, cnt = np.unique(arr, return_counts=True)
        self.n += int(cnt.sum())
        get = self.counters.get
        counters = self.counters
        for v, c in zip(uniq.tolist(), cnt.tolist()):
            counters[v] = get(v, 0) + c
        self._compress()

    def _compress(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.fromiter(self.counters.values(), dtype=np.int64,
                             count=len(self.counters))
        # subtract the (k+1)-th largest count: every counter <= d dies, so
        # at most k (strictly greater) survive — one vectorized pass
        d = int(np.partition(counts, -(self.k + 1))[-(self.k + 1)])
        self.counters = {v: c - d for v, c in self.counters.items() if c > d}
        self.decremented += d

    # ------------------------------------------------------------- merge
    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError(f"cannot merge MisraGries(k={self.k}) with k={other.k}")
        get = self.counters.get
        counters = self.counters
        for v, c in other.counters.items():
            counters[v] = get(v, 0) + c
        self.n += other.n
        self.decremented += other.decremented
        self._compress()
        return self

    # ---------------------------------------------------------- estimates
    def estimate(self, item) -> int:
        """Lower-bound frequency (0 if evicted); true f(x) is within
        [estimate, estimate + error_bound()]."""
        return self.counters.get(item, 0)

    def error_bound(self) -> int:
        """Max undercount applied to any surviving counter (= total
        decrements; ≤ n/(k+1) by the MG invariant)."""
        return self.decremented

    def top_k(self, j: int) -> list[tuple]:
        """The j largest (item, lower_count) pairs, (count desc, item asc)."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:j]

    def finalize(self):
        return self.top_k(len(self.counters))

    # ------------------------------------------------------------- wire
    def _payload_bytes(self) -> bytes:
        w = _Writer()
        w.u32(self.k).u64(self.n).u64(self.decremented)
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        if not items:
            w.u8(0).u32(0)
            return w.getvalue()
        keys = [kv[0] for kv in items]
        counts = np.array([kv[1] for kv in items], dtype=np.int64)
        if isinstance(keys[0], (int, np.integer)):
            w.u8(1).u32(len(keys))
            w.raw(np.array(keys, dtype=np.int64).tobytes())
        else:
            enc = [str(s).encode("utf-8") for s in keys]
            offs = np.zeros(len(enc) + 1, dtype=np.uint32)
            offs[1:] = np.cumsum([len(b) for b in enc], dtype=np.uint32)
            w.u8(2).u32(len(keys))
            w.raw(offs.tobytes()).raw(b"".join(enc))
        w.raw(counts.tobytes())
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "MisraGries":
        r = _Reader(payload)
        sk = cls(k=r.u32())
        sk.n = r.u64()
        sk.decremented = r.u64()
        keytype = r.u8()
        m = r.u32()
        if m == 0:
            return sk
        if keytype == 1:
            keys = np.frombuffer(r.raw(8 * m), dtype=np.int64).tolist()
        else:
            offs = np.frombuffer(r.raw(4 * (m + 1)), dtype=np.uint32)
            blob = r.raw(int(offs[-1]))
            keys = [blob[offs[i]:offs[i + 1]].decode("utf-8") for i in range(m)]
        counts = np.frombuffer(r.raw(8 * m), dtype=np.int64)
        sk.counters = dict(zip(keys, counts.tolist()))
        return sk
