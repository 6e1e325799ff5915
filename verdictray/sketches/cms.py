"""Count-Min Sketch with optional heavy-hitter candidate tracking.

Answers point frequency queries with one-sided error: with probability
>= 1 - delta,  f_hat(x) - f(x) in [0, eps * N]  where N is the total count
(Cormode & Muthukrishnan, J. Algorithms 2005). Defaults eps=1e-3, delta=1e-2
→ width w = ceil(e/eps) = 2719, depth d = ceil(ln(1/delta)) = 5.

Rows use the Kirsch–Mitzenmacher double-hashing family
h_j(x) = h1(x) + j*h2(x) mod w over the shared ``hash64`` (hashing.py).

Sparse-until-promoted: a fresh/partial sketch buffers exact
base-hash → count entries (8 bytes/item on the wire; row hashes are
re-derived vectorized at promotion) instead of allocating the d×w counter
table; it promotes to the dense table once the buffer passes ~w/4 items.
Per-group partials for tail groups (the common case when grouping by a
high-cardinality key like `repo`) stay KiB-sized on the wire, and sparse
point-queries are exact. Promotion changes representation only — the
materialized dense table (``dense_table()``) is identical under any
merge order, which is the byte-determinism property tests assert.

Heavy hitters: each partial sketch tracks up to ``hh_capacity`` candidate
items (exact per-partition counts). Merging unions candidate sets and
re-truncates; ``top_k(k)`` returns the k candidates with the largest
CMS-estimated counts. The candidate SET is merge-order-dependent
(documented); counts are not.

No reference file exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .hashing import _to_numpy


def _encode_candidates(cand: dict) -> bytes:
    """Typed wire encoding for the heavy-hitter candidate dict. Blobs are
    persisted (checkpoints, estimate parquet) and merge_sketches is a
    documented cross-job API — deserializing untrusted bytes must never go
    through pickle (arbitrary code execution)."""
    w = _Writer().u32(len(cand))
    for k, c in cand.items():
        if isinstance(k, str):
            kb = k.encode("utf-8")
            w.u8(0).u32(len(kb)).raw(kb)
        elif isinstance(k, (bytes, bytearray)):
            w.u8(1).u32(len(k)).raw(bytes(k))
        elif isinstance(k, (bool, np.bool_)):
            w.u8(2).u64(int(np.uint64(np.int64(int(k)))))
        elif isinstance(k, (int, np.integer)):
            w.u8(2).u64(int(np.uint64(np.int64(k))))  # two's complement
        elif isinstance(k, (float, np.floating)):
            w.u8(3).f64(float(k))
        else:
            raise TypeError(f"unsupported heavy-hitter item type {type(k)!r}")
        w.u64(int(c))
    return w.getvalue()


def _decode_candidates(r: _Reader) -> dict:
    out: dict = {}
    n = r.u32()
    for _ in range(n):
        tag = r.u8()
        if tag == 0:
            k = r.raw(r.u32()).decode("utf-8")
        elif tag == 1:
            k = r.raw(r.u32())
        elif tag == 2:
            k = int(np.int64(np.uint64(r.u64())))
        elif tag == 3:
            k = r.f64()
        else:
            raise ValueError(f"corrupt candidate blob: unknown type tag {tag}")
        out[k] = int(r.u64())
    return out


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
        self.table: np.ndarray | None = None  # dense int64[depth, width] once promoted
        self._buffer: dict[int, int] | None = {}  # sparse base-hash→count
        self._promote_limit = max(64, self.width // 4)
        self.n = 0  # total count — the N in the eps*N bound
        self.hh_capacity = hh_capacity
        self._candidates: dict = {}  # item -> exact-ish local count (pre-merge)

    # ---------------------------------------------------------------- hashing
    def _h12(self, values) -> tuple[np.ndarray, np.ndarray]:
        from .hashing import derive64, hash_base

        base = hash_base(values)
        return self._h12_from_base(base)

    def _h12_from_base(self, base: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        from .hashing import derive64

        h1 = derive64(base, self.seed)
        h2 = derive64(base, self.seed + 1) | np.uint64(1)
        return h1, h2

    def _positions_from_h(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (h1 + j*h2) mod w == ((h1 mod w) + j*(h2 mod w)) mod w — reduce
        # once in uint64, then per-row arithmetic runs on small int64s
        # (uint64 modulo is the slow path in numpy; ~20x on wide scatters)
        w = self.width
        h1m = (h1 % np.uint64(w)).astype(np.int64)
        h2m = (h2 % np.uint64(w)).astype(np.int64)
        pos = np.empty((self.depth, len(h1)), dtype=np.int64)
        for j in range(self.depth):
            pos[j] = (h1m + j * h2m) % w
        return pos

    @property
    def is_sparse(self) -> bool:
        return self.table is None

    def _promote(self) -> None:
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        if self._buffer:
            base = np.fromiter(self._buffer.keys(), dtype=np.uint64)
            cnt = np.fromiter(self._buffer.values(), dtype=np.int64)
            self._scatter(base, cnt)
        self._buffer = None

    def _scatter(self, base: np.ndarray, cnt: np.ndarray) -> None:
        h1, h2 = self._h12_from_base(base)
        pos = self._positions_from_h(h1, h2)
        for j in range(self.depth):
            # bincount into the (tiny) row instead of np.add.at: ~50x on
            # multi-million-item promotions. float64 accumulation is exact
            # for integer totals below 2^53.
            self.table[j] += np.bincount(
                pos[j], weights=cnt, minlength=self.width
            ).astype(np.int64)

    def _add_base(self, base: np.ndarray, cnt: np.ndarray,
                  assume_unique: bool = False) -> None:
        if self.table is not None:
            self._scatter(base, cnt)
            return
        # consolidate duplicates so the promotion check sees the TRUE
        # distinct count — representation must not depend on update order
        if not assume_unique and len(base) > 1:
            uniq, inv = np.unique(base, return_inverse=True)
            if len(uniq) != len(base):
                cnt = np.bincount(inv, weights=cnt).astype(np.int64)
                base = uniq
        if not self._buffer and len(base) > self._promote_limit:
            # fast path: incoming alone overflows → dense scatter, no loop
            self._promote()
            self._scatter(base, cnt)
            return
        buf = self._buffer
        for b, c in zip(base.tolist(), cnt.tolist()):
            buf[b] = buf.get(b, 0) + c
        if len(buf) > self._promote_limit:
            self._promote()

    # ---------------------------------------------------------------- update
    def update(self, values, counts=None) -> None:
        from .hashing import _to_numpy_dropnull, hash_base

        # null semantics: counts-path trusts the caller's pre-aggregated
        # rows; the raw path drops nulls like SQL aggregates do
        arr = _to_numpy(values) if counts is not None else _to_numpy_dropnull(values)
        if len(arr) == 0:
            return

        if counts is not None:
            cnt = np.asarray(counts, dtype=np.int64)
            self._add_base(hash_base(arr), cnt)
            self.n += int(cnt.sum())
            if self.hh_capacity:
                self._track_candidates(arr, cnt)
            return
        self.update_hashed(hash_base(arr), values=arr)

    def update_hashed(self, base: np.ndarray, values=None) -> None:
        """Absorb pre-hashed values (base = hash_base(values)). The batch
        pre-reduction runs np.unique on the uint64 base — much cheaper than
        value_counts on strings; candidate tracking (if enabled) picks item
        representatives from `values` via the unique indices."""
        if len(base) == 0:
            return
        uniq_base, first_ix, cnt = np.unique(base, return_index=True, return_counts=True)
        reps = None
        if self.hh_capacity and values is not None:
            reps = _to_numpy(values)[first_ix]
        self.update_unique(uniq_base, cnt, reps=reps, n_raw=len(base))

    def update_unique(self, uniq_base: np.ndarray, cnt: np.ndarray,
                      reps=None, n_raw: int | None = None) -> None:
        """Absorb pre-deduped (base hash, count) pairs; `reps` are item
        representatives for candidate tracking."""
        self._add_base(uniq_base, cnt, assume_unique=True)
        self.n += int(n_raw if n_raw is not None else cnt.sum())
        if self.hh_capacity and reps is not None:
            self._track_candidates(np.asarray(reps), np.asarray(cnt))

    def _track_candidates(self, uniq: np.ndarray, cnt: np.ndarray) -> None:
        # track only the batch's top items: anything heavy overall is
        # heavy within batches too (a per-batch count of 1 among
        # > 4*hh_capacity distinct items cannot be a global top-k hitter
        # at meaningful frequency); bounds the per-batch Python work
        cap = 4 * self.hh_capacity
        if len(uniq) > cap:
            top_ix = np.argpartition(-cnt, cap - 1)[:cap]
            cand_items, cand_cnt = uniq[top_ix], cnt[top_ix]
        else:
            cand_items, cand_cnt = uniq, cnt
        for v, c in zip(cand_items.tolist(), cand_cnt.tolist()):
            self._candidates[v] = self._candidates.get(v, 0) + int(c)
        self._truncate_candidates()

    def _truncate_candidates(self) -> None:
        if len(self._candidates) > 2 * self.hh_capacity:
            top = sorted(self._candidates.items(), key=lambda kv: (-kv[1], str(kv[0])))
            self._candidates = dict(top[: self.hh_capacity])

    # ---------------------------------------------------------------- query
    def query(self, values) -> np.ndarray:
        """Estimated frequency per item (vectorized; upper-biased once dense,
        exact while sparse)."""
        from .hashing import hash_base

        arr = _to_numpy(values)
        base = hash_base(arr)
        if self.table is None:
            buf = self._buffer
            return np.fromiter(
                (buf.get(b, 0) for b in base.tolist()),
                dtype=np.int64,
                count=len(arr),
            )
        h1, h2 = self._h12_from_base(base)
        pos = self._positions_from_h(h1, h2)
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

    def dense_table(self) -> np.ndarray:
        """Materialize the dense counter table (promotes a copy if sparse) —
        identical under any merge order; used by the determinism tests."""
        if self.table is not None:
            return self.table
        clone = CountMin.from_bytes(self.to_bytes())
        clone._promote()
        return clone.table

    # ---------------------------------------------------------------- merge
    def merge(self, other: "CountMin") -> "CountMin":
        if (
            not isinstance(other, CountMin)
            or other.width != self.width
            or other.depth != self.depth
            or other.seed != self.seed
        ):
            raise ValueError("can only merge CMS with identical (eps, delta, seed)")
        if other.table is not None and self.table is None:
            self._promote()
        if self.table is not None:
            if other.table is not None:
                self.table += other.table
            else:
                if other._buffer:
                    base = np.fromiter(other._buffer.keys(), dtype=np.uint64)
                    cnt = np.fromiter(other._buffer.values(), dtype=np.int64)
                    self._scatter(base, cnt)
        else:
            buf = self._buffer
            for key, c in other._buffer.items():
                buf[key] = buf.get(key, 0) + c
            if len(buf) > self._promote_limit:
                self._promote()
        self.n += other.n
        if self.hh_capacity or other.hh_capacity:
            self.hh_capacity = max(self.hh_capacity, other.hh_capacity)
            for v, c in other._candidates.items():
                self._candidates[v] = self._candidates.get(v, 0) + c
            self._truncate_candidates()
        return self

    def inner_product(self, other: "CountMin") -> int:
        """CM inner-product estimate (Cormode & Muthukrishnan 2005 §4.3):
        min over depth rows of the rowwise dot product of the two counter
        tables. For CMS built on the join keys of two relations this
        estimates the EQUI-JOIN SIZE |A ⋈ B| = Σ_key f_A(key)·f_B(key):
        never an underestimate, and ≤ true + eps·N_A·N_B with probability
        ≥ 1 − delta. Both sketches must share (eps, delta, seed)."""
        if (
            not isinstance(other, CountMin)
            or other.width != self.width
            or other.depth != self.depth
            or other.seed != self.seed
        ):
            raise ValueError(
                "inner_product needs identical (eps, delta, seed)")
        a = self.dense_table()
        b = other.dense_table()
        return int(np.einsum("ij,ij->i", a, b).min())

    def finalize(self) -> int:
        """Total stream count N (point queries via .query on the blob)."""
        return self.n

    def error_bound(self) -> float:
        """Additive overestimate bound eps*N (holds w.p. >= 1 - delta)."""
        return self.eps * self.n

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        cand = _encode_candidates(self._candidates)
        w = (
            _Writer()
            .f64(self.eps)
            .f64(self.delta)
            .u64(self.seed)
            .u64(self.n)
            .u32(self.hh_capacity)
            .u32(len(cand))
            .raw(cand)
        )
        if self.table is not None:
            w.u8(1).raw(self.table.tobytes())
        else:
            w.u8(0).u32(len(self._buffer))
            if self._buffer:
                # canonical (sorted) order → sparse serialization is
                # byte-deterministic under any merge order
                items = sorted(self._buffer.items())
                base = np.fromiter((k for k, _ in items), dtype=np.uint64)
                cnt = np.fromiter((c for _, c in items), dtype=np.int64)
                w.raw(base.tobytes()).raw(cnt.tobytes())
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "CountMin":
        r = _Reader(payload)
        eps, delta, seed, n, hh_cap, cand_len = r.f64(), r.f64(), r.u64(), r.u64(), r.u32(), r.u32()
        out = cls(eps=eps, delta=delta, seed=seed, hh_capacity=hh_cap)
        out._candidates = _decode_candidates(_Reader(r.raw(cand_len)))
        out.n = n
        if r.u8():
            out.table = (
                np.frombuffer(r.raw(out.depth * out.width * 8), dtype=np.int64)
                .reshape(out.depth, out.width)
                .copy()
            )
            out._buffer = None
        else:
            cnt_n = r.u32()
            if cnt_n:
                base = np.frombuffer(r.raw(8 * cnt_n), dtype=np.uint64)
                cnt = np.frombuffer(r.raw(8 * cnt_n), dtype=np.int64)
                out._buffer = dict(zip(base.tolist(), cnt.tolist()))
        return out
