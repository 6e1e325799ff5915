"""Fused partial for the three hash sketches (HLL + CMS + Bloom).

All three hash sketches consume the SAME per-item base hash (hashing.py),
yet as separate partials each ships its own copy of those hashes across
the Stage-A shuffle — ~3x redundant wire volume and three redundant
union-merges per group. The fused partial stores ONE sorted unique
(base hash, count) array that is sufficient to reconstruct all three
sketches exactly:

  - HLL registers derive from derive64(hash, seed)       (set semantics)
  - CMS counters derive from (hash, count)               (additive)
  - Bloom bits derive from the hash set                  (set semantics)

``split()`` materializes the three real sketches; because each component's
state is an order-invariant function of the total (hash, count) multiset,
the split output is byte-identical to updating the components directly
(the property the pipeline equivalence tests assert for HLL/Bloom and the
CMS count table).

Representation: sparse (sorted hash + count arrays, 16 B/item) until the
unique count crosses the size of the dense composite
(hll + cms + bloom dense bytes) / 16 — promotion is keyed on the TRUE
unique count (subset-monotone), so the final representation is
deterministic under any merge order, mirroring the r1 promotion-
determinism fix in the individual sketches. After promotion the fused
sketch holds the three live component sketches and merges them directly.

CMS heavy-hitter candidates (actual item values, not hashes) ride in a
capped side dict with the same merge-order caveat the CMS documents.

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np

from .base import Sketch, _Reader, _Writer, register
from .bloom import BloomFilter
from .cms import CountMin, _decode_candidates, _encode_candidates
from .hll import HyperLogLog

_MODE_SPARSE, _MODE_DENSE = 0, 1


@register
class FusedHashSketch(Sketch):
    TYPE_CODE = 7

    def __init__(self, hll_p: int = 14, cms_eps: float = 1e-3,
                 cms_delta: float = 1e-2, hh_capacity: int = 0,
                 bloom_capacity: int = 1_000_000, bloom_fpp: float = 0.01,
                 seed: int = 0):
        self.hll_p = hll_p
        self.cms_eps = cms_eps
        self.cms_delta = cms_delta
        self.hh_capacity = hh_capacity
        self.bloom_capacity = bloom_capacity
        self.bloom_fpp = bloom_fpp
        self.seed = seed
        self.n = 0  # total raw rows (CMS N, Bloom n_added)
        self._hashes: np.ndarray | None = np.empty(0, dtype=np.uint64)
        self._counts: np.ndarray | None = np.empty(0, dtype=np.int64)
        self._dense: tuple | None = None  # (hll, cms, bloom) once promoted
        self._candidates: dict = {}
        dense_bytes = (
            (1 << hll_p)  # ~6-bit registers, round up to 1 B each
            + int(np.ceil(np.e / cms_eps)) * int(np.ceil(np.log(1 / cms_delta))) * 8
            + self._bloom_bits() // 8
        )
        self._promote_limit = max(64, dense_bytes // 16)

    def _bloom_bits(self) -> int:
        bits_per = -np.log(self.bloom_fpp) / (np.log(2) ** 2)
        return int(np.ceil(self.bloom_capacity * bits_per))

    @property
    def is_sparse(self) -> bool:
        return self._dense is None

    # ---------------------------------------------------------------- update
    def update(self, values) -> None:
        from .hashing import _to_numpy_dropnull, hash_base

        arr = _to_numpy_dropnull(values)
        if len(arr) == 0:
            return
        base = hash_base(arr)
        uniq, first_ix, cnt = np.unique(base, return_index=True, return_counts=True)
        reps = arr[first_ix] if self.hh_capacity else None
        self.update_unique(uniq, cnt, reps=reps, n_raw=len(arr))

    def update_unique(self, uniq: np.ndarray, cnt: np.ndarray, reps=None,
                      n_raw: int | None = None) -> None:
        """Absorb pre-deduped (base hash, count) pairs (the updater's fast
        path; one np.unique serves all three component sketches)."""
        self.n += int(n_raw if n_raw is not None else cnt.sum())
        if self.hh_capacity and reps is not None:
            self._track_candidates(np.asarray(reps), np.asarray(cnt))
        if self._dense is not None:
            self._dense_add(uniq, cnt)
            return
        self._sparse_add(uniq, cnt)

    def _sparse_add(self, uniq: np.ndarray, cnt: np.ndarray) -> None:
        merged = np.concatenate([self._hashes, uniq])
        mcnt = np.concatenate([self._counts, np.asarray(cnt, dtype=np.int64)])
        su, inv = np.unique(merged, return_inverse=True)
        scnt = np.bincount(inv, weights=mcnt).astype(np.int64)
        self._hashes, self._counts = su, scnt
        if len(su) > self._promote_limit:
            self._promote()

    def _promote(self) -> None:
        hll = HyperLogLog(p=self.hll_p, seed=self.seed)
        cms = CountMin(eps=self.cms_eps, delta=self.cms_delta, seed=self.seed,
                       hh_capacity=self.hh_capacity)
        bloom = BloomFilter(capacity=self.bloom_capacity, fpp=self.bloom_fpp,
                            seed=self.seed)
        if len(self._hashes):
            self._components_add(hll, cms, bloom, self._hashes, self._counts)
        self._dense = (hll, cms, bloom)
        self._hashes = self._counts = None

    def _components_add(self, hll, cms, bloom, uniq, cnt) -> None:
        from .hashing import derive64

        hll.update_hashed(derive64(uniq, hll.seed), assume_unique=True)
        cms.update_unique(uniq, cnt, reps=None, n_raw=0)
        bloom.update_hashed(uniq, assume_unique=True, n_raw=0)

    def _dense_add(self, uniq, cnt) -> None:
        hll, cms, bloom = self._dense
        self._components_add(hll, cms, bloom, uniq, cnt)

    def promote_if_projected_dense(self, n_shards: int) -> bool:
        """Hash-shard-aware early promotion (the salted merge's Stage A):
        this sketch holds one of ``n_shards`` disjoint hash-range shards of
        a key, so the KEY's projected unique count is ~n_shards x ours — if
        that projection crosses the promote limit, the key's final state is
        dense anyway and materializing the components NOW moves the scatter
        cost into the per-shard (parallel) task instead of the single
        per-key reduce. Promoting early cannot change the final split()
        output: component state is an order-invariant function of the
        (hash, count) multiset. Returns True if promotion happened."""
        if self._dense is None and len(self._hashes) > self._promote_limit // max(
                1, n_shards):
            self._promote()
            return True
        return False

    def _track_candidates(self, reps: np.ndarray, cnt: np.ndarray) -> None:
        cap = 4 * self.hh_capacity
        if len(reps) > cap:
            top_ix = np.argpartition(-cnt, cap - 1)[:cap]
            reps, cnt = reps[top_ix], cnt[top_ix]
        for v, c in zip(reps.tolist(), cnt.tolist()):
            self._candidates[v] = self._candidates.get(v, 0) + int(c)
        if len(self._candidates) > 2 * self.hh_capacity:
            top = sorted(self._candidates.items(), key=lambda kv: (-kv[1], str(kv[0])))
            self._candidates = dict(top[: self.hh_capacity])

    # ---------------------------------------------------------------- merge
    def _check_compat(self, other: "FusedHashSketch") -> None:
        # every parameter that shapes the materialized components must
        # match — a sparse merge across differing CMS/Bloom geometry would
        # silently produce wrong-width tables at split() (ADVICE r2)
        if (not isinstance(other, FusedHashSketch)
                or other.seed != self.seed
                or other.hll_p != self.hll_p
                or other.cms_eps != self.cms_eps
                or other.cms_delta != self.cms_delta
                or other.bloom_capacity != self.bloom_capacity
                or other.bloom_fpp != self.bloom_fpp):
            raise ValueError("can only merge FusedHashSketch with identical params")

    def merge(self, other: "FusedHashSketch") -> "FusedHashSketch":
        self._check_compat(other)
        self.n += other.n
        if self.hh_capacity or other.hh_capacity:
            self.hh_capacity = max(self.hh_capacity, other.hh_capacity)
            for v, c in other._candidates.items():
                self._candidates[v] = self._candidates.get(v, 0) + c
            if len(self._candidates) > 2 * self.hh_capacity:
                top = sorted(self._candidates.items(),
                             key=lambda kv: (-kv[1], str(kv[0])))
                self._candidates = dict(top[: self.hh_capacity])
        if other._dense is not None and self._dense is None:
            self._promote()
        if self._dense is not None:
            if other._dense is not None:
                hll, cms, bloom = self._dense
                ohll, ocms, obloom = other._dense
                # component n/candidates are tracked at the fused level;
                # the merges carry the count table / registers / bits
                hll.merge(ohll)
                cms.merge(ocms)
                bloom.merge(obloom)
            elif len(other._hashes):
                self._dense_add(other._hashes, other._counts)
        else:
            self._sparse_add(other._hashes, other._counts)
        return self

    def merge_many(self, others: list["FusedHashSketch"]) -> "FusedHashSketch":
        """k-way merge: ONE concatenate + unique over every sparse input
        instead of a pairwise ladder of growing re-sorts — the per-hot-key
        reduce merges `salts` partials, and pairwise union cost there is
        ~salts/2 x the data volume. Dense inputs fold in afterwards.
        Byte-identical result to sequential merge() for the hash state
        (set/count algebra); the capped heavy-hitter candidate dict may
        truncate differently (merge-order-dependent by design)."""
        sparse, dense = [], []
        for o in others:
            self._check_compat(o)
            self.n += o.n
            if self.hh_capacity or o.hh_capacity:
                self.hh_capacity = max(self.hh_capacity, o.hh_capacity)
                for v, c in o._candidates.items():
                    self._candidates[v] = self._candidates.get(v, 0) + c
            (dense if o._dense is not None else sparse).append(o)
        if len(self._candidates) > 2 * self.hh_capacity > 0:
            top = sorted(self._candidates.items(), key=lambda kv: (-kv[1], str(kv[0])))
            self._candidates = dict(top[: self.hh_capacity])
        if sparse and self._dense is None:
            merged = np.concatenate([self._hashes] + [o._hashes for o in sparse])
            mcnt = np.concatenate([self._counts] + [o._counts for o in sparse])
            su, inv = np.unique(merged, return_inverse=True)
            self._hashes = su
            self._counts = np.bincount(inv, weights=mcnt).astype(np.int64)
            if len(su) > self._promote_limit:
                self._promote()
            sparse = []
        for o in sparse:  # self already dense
            if len(o._hashes):
                self._dense_add(o._hashes, o._counts)
        if dense and self._dense is None:
            self._promote()
        if dense:
            # component-level K-WAY folds: dense HLLs reduce-max in one op,
            # dense/disjoint-sparse Blooms merge via BloomFilter.merge_many
            # (the hash-range-sharded Stage-B hot path — a pairwise ladder
            # here re-sorted the hot key's accumulated hash array per
            # shard); CMS tables are KiB-sized adds, pairwise is fine
            hll, cms, bloom = self._dense
            hll.merge_many([o._dense[0] for o in dense])
            for o in dense:
                cms.merge(o._dense[1])
            bloom.merge_many([o._dense[2] for o in dense])
        return self

    # ---------------------------------------------------------------- output
    def split(self) -> tuple[HyperLogLog, CountMin, BloomFilter]:
        """Materialize the three real sketches — byte-identical to having
        updated them directly with the same rows (order-invariant state)."""
        if self._dense is not None:
            hll, cms, bloom = self._dense
        else:
            hll = HyperLogLog(p=self.hll_p, seed=self.seed)
            cms = CountMin(eps=self.cms_eps, delta=self.cms_delta, seed=self.seed,
                           hh_capacity=self.hh_capacity)
            bloom = BloomFilter(capacity=self.bloom_capacity, fpp=self.bloom_fpp,
                                seed=self.seed)
            if len(self._hashes):
                self._components_add(hll, cms, bloom, self._hashes, self._counts)
        cms.n = self.n
        cms.hh_capacity = self.hh_capacity
        cms._candidates = dict(self._candidates)
        bloom.n_added = self.n
        return hll, cms, bloom

    def finalize(self):
        hll, cms, bloom = self.split()
        return {"nd_est": hll.estimate(), "n": self.n,
                "bloom_fill": bloom.fill_ratio()}

    def error_bound(self) -> float:
        return 1.04 / np.sqrt(1 << self.hll_p)

    # ---------------------------------------------------------------- serde
    def _payload_bytes(self) -> bytes:
        cand = _encode_candidates(self._candidates)
        w = (_Writer()
             .u32(self.hll_p)
             .f64(self.cms_eps)
             .f64(self.cms_delta)
             .u32(self.hh_capacity)
             .u64(self.bloom_capacity)
             .f64(self.bloom_fpp)
             .u64(self.seed)
             .u64(self.n)
             .u32(len(cand)).raw(cand))
        if self._dense is None:
            w.u8(_MODE_SPARSE).u64(len(self._hashes))
            w.raw(np.ascontiguousarray(self._hashes).tobytes())
            w.raw(np.ascontiguousarray(self._counts).tobytes())
        else:
            w.u8(_MODE_DENSE)
            for sk in self._dense:
                blob = sk.to_bytes()
                w.u64(len(blob)).raw(blob)
        return w.getvalue()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "FusedHashSketch":
        r = _Reader(payload)
        out = cls(hll_p=r.u32(), cms_eps=r.f64(), cms_delta=r.f64(),
                  hh_capacity=r.u32(), bloom_capacity=r.u64(),
                  bloom_fpp=r.f64(), seed=r.u64())
        out.n = r.u64()
        out._candidates = _decode_candidates(_Reader(r.raw(r.u32())))
        if r.u8() == _MODE_SPARSE:
            k = r.u64()
            out._hashes = np.frombuffer(r.raw(8 * k), dtype=np.uint64).copy()
            out._counts = np.frombuffer(r.raw(8 * k), dtype=np.int64).copy()
        else:
            comps = []
            for _ in range(3):
                comps.append(Sketch.from_bytes(r.raw(r.u64())))
            out._dense = tuple(comps)
            out._hashes = out._counts = None
        return out
