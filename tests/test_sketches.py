"""Unit tests per sketch kernel — pure numpy, no Ray (SURVEY.md §5.1).

Known-answer tests on tiny inputs, serialization round-trips, and
parameter-edge tests (sparse→dense HLL promotion boundary, CMS sizing from
(eps, delta), t-digest weight invariant, KLL level growth).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from verdictray.sketches import (
    BloomFilter,
    CountMin,
    HyperLogLog,
    KLL,
    Sketch,
    TDigest,
    merge_sketches,
)


def strs(prefix, n):
    return np.array([f"{prefix}{i}" for i in range(n)], dtype=object)


# ------------------------------------------------------------------ HLL
class TestHLL:
    def test_exact_small(self):
        h = HyperLogLog()
        h.update(strs("x", 10))
        # sparse + improved estimator is near-exact at tiny cardinality
        assert abs(h.estimate() - 10) < 1.0
        assert h.is_sparse

    def test_duplicates_ignored(self):
        h = HyperLogLog()
        for _ in range(5):
            h.update(strs("d", 100))
        assert abs(h.estimate() - 100) / 100 < 0.05

    def test_within_bound_medium(self):
        h = HyperLogLog()
        n = 200_000
        h.update(strs("m", n))
        rel = abs(h.estimate() - n) / n
        assert rel <= 3 * h.error_bound(), rel
        assert not h.is_sparse

    def test_sparse_dense_promotion_boundary(self):
        h = HyperLogLog(p=10)  # m=1024, promote at >256 entries
        h.update(strs("a", 200))
        assert h.is_sparse
        est_sparse = h.estimate()
        h.update(strs("b", 2000))
        assert not h.is_sparse
        # estimate remains sane across promotion
        assert abs(h.estimate() - 2200) / 2200 < 0.15
        assert est_sparse < h.estimate()

    def test_serde_roundtrip_both_modes(self):
        hs = HyperLogLog()
        hs.update(strs("s", 50))
        rt = Sketch.from_bytes(hs.to_bytes())
        assert rt.to_bytes() == hs.to_bytes()
        assert rt.estimate() == hs.estimate()

        hd = HyperLogLog(p=8)
        hd.update(strs("d", 5000))
        assert not hd.is_sparse
        rt = Sketch.from_bytes(hd.to_bytes())
        assert rt.to_bytes() == hd.to_bytes()

    def test_merge_equals_union(self):
        a, b = HyperLogLog(), HyperLogLog()
        a.update(strs("u", 5000))
        b.update(strs("u", 8000))  # overlap: u0..u4999 shared
        a.merge(b)
        assert abs(a.estimate() - 8000) / 8000 < 3 * a.error_bound() + 0.01

    def test_int_and_float_columns(self):
        h = HyperLogLog()
        h.update(np.arange(1000, dtype=np.int64))
        assert abs(h.estimate() - 1000) / 1000 < 0.05
        h2 = HyperLogLog()
        h2.update(np.linspace(0, 1, 777))
        assert abs(h2.estimate() - 777) / 777 < 0.05

    def test_param_mismatch_rejected(self):
        with pytest.raises(ValueError):
            HyperLogLog(p=10).merge(HyperLogLog(p=12))


# ------------------------------------------------------------------ CMS
class TestCMS:
    def test_sizing_from_eps_delta(self):
        c = CountMin(eps=1e-3, delta=1e-2)
        assert c.width == math.ceil(math.e / 1e-3) == 2719
        assert c.depth == math.ceil(math.log(100)) == 5

    def test_overestimate_only(self):
        c = CountMin()
        rng = np.random.default_rng(7)
        items = rng.choice(strs("w", 50), size=20_000)
        c.update(items)
        from collections import Counter

        true = Counter(items.tolist())
        for w, f in true.items():
            est = c.query_one(w)
            assert est >= f
            assert est - f <= c.error_bound()

    def test_absent_item_small(self):
        c = CountMin()
        c.update(strs("x", 1000))
        assert c.query_one("never-seen") <= c.error_bound()

    def test_heavy_hitters(self):
        c = CountMin(hh_capacity=10)
        items = np.concatenate(
            [np.repeat(np.array([f"hot{i}"], dtype=object), 1000 * (5 - i)) for i in range(5)]
            + [strs("cold", 500)]
        )
        rng = np.random.default_rng(3)
        rng.shuffle(items)
        for i in range(0, len(items), 2048):
            c.update(items[i : i + 2048])
        top = c.top_k(3)
        assert [t[0] for t in top] == ["hot0", "hot1", "hot2"]
        assert top[0][1] >= 5000

    def test_serde_and_merge(self):
        a, b = CountMin(hh_capacity=5), CountMin(hh_capacity=5)
        a.update(strs("p", 100))
        b.update(strs("p", 100))
        a.merge(b)
        assert a.query_one("p0") >= 2
        assert a.n == 200
        rt = Sketch.from_bytes(a.to_bytes())
        assert rt.query_one("p0") == a.query_one("p0")
        assert rt.top_k(2) == a.top_k(2)


# ------------------------------------------------------------------ Bloom
class TestBloom:
    def test_zero_false_negatives(self):
        b = BloomFilter(capacity=5000, fpp=0.01)
        items = strs("in", 5000)
        b.update(items)
        assert b.contains(items).all()

    def test_fpp_within_2x_target(self):
        b = BloomFilter(capacity=5000, fpp=0.01)
        b.update(strs("in", 5000))
        fpp = b.contains(strs("out", 50_000)).mean()
        assert fpp <= 0.02, fpp

    def test_empty_filter_rejects_all(self):
        b = BloomFilter(capacity=100, fpp=0.01)
        assert not b.contains(strs("z", 100)).any()

    def test_merge_is_union(self):
        a = BloomFilter(capacity=1000, fpp=0.01)
        b = BloomFilter(capacity=1000, fpp=0.01)
        a.update(strs("a", 500))
        b.update(strs("b", 500))
        a.merge(b)
        assert a.contains(strs("a", 500)).all()
        assert a.contains(strs("b", 500)).all()

    def test_serde(self):
        b = BloomFilter(capacity=1000, fpp=0.01)
        b.update(strs("s", 800))
        rt = Sketch.from_bytes(b.to_bytes())
        assert rt.to_bytes() == b.to_bytes()
        assert rt.contains_one("s0") and not rt.contains_one("nope-xyz")

    def test_merge_sketches_blob_api(self):
        a = BloomFilter(capacity=100, fpp=0.01)
        b = BloomFilter(capacity=100, fpp=0.01)
        a.update(strs("m", 50))
        b.update(strs("n", 50))
        merged = Sketch.from_bytes(merge_sketches(a.to_bytes(), b.to_bytes()))
        assert merged.contains_one("m1") and merged.contains_one("n1")


# ------------------------------------------------------------------ KLL
class TestKLL:
    def test_exact_tiny(self):
        k = KLL()
        k.update(np.arange(100, dtype=np.float64))
        # fewer items than k → no compaction → exact
        assert k.quantile(0.0) == 0.0
        assert k.quantile(1.0) == 99.0
        assert abs(k.quantile(0.5) - 50) <= 1

    def test_rank_error_within_bound(self):
        rng = np.random.default_rng(11)
        data = rng.exponential(size=100_000)
        k = KLL()
        for i in range(0, len(data), 10_000):
            k.update(data[i : i + 10_000])
        for phi in [0.01, 0.25, 0.5, 0.75, 0.99]:
            est = k.quantile(phi)
            true_rank = (data <= est).mean()
            assert abs(true_rank - phi) <= 2 * k.error_bound(), (phi, true_rank)

    def test_level_growth(self):
        k = KLL(k=64)
        k.update(np.arange(50_000, dtype=np.float64))
        assert len(k.compactors) > 3
        assert k._size() <= k._max_size()
        assert k.n == 50_000

    def test_nan_skipped(self):
        k = KLL()
        k.update(np.array([1.0, np.nan, 3.0]))
        assert k.n == 2

    def test_serde(self):
        k = KLL()
        k.update(np.random.default_rng(5).normal(size=10_000))
        rt = Sketch.from_bytes(k.to_bytes())
        assert rt.to_bytes() == k.to_bytes()
        for phi in [0.1, 0.5, 0.9]:
            assert rt.quantile(phi) == k.quantile(phi)


# ------------------------------------------------------------------ t-digest
class TestTDigest:
    def test_exact_extremes(self):
        t = TDigest()
        data = np.random.default_rng(9).normal(size=50_000)
        t.update(data)
        assert t.quantile(0.0) == data.min()
        assert t.quantile(1.0) == data.max()

    def test_weight_invariant(self):
        t = TDigest()
        t.update(np.arange(25_000, dtype=np.float64))
        t._flush()
        assert t.weights.sum() == 25_000 == t.n

    def test_tail_accuracy(self):
        rng = np.random.default_rng(13)
        data = rng.lognormal(size=200_000)
        t = TDigest()
        for i in range(0, len(data), 20_000):
            t.update(data[i : i + 20_000])
        for phi in [0.001, 0.01, 0.99, 0.999]:
            est = t.quantile(phi)
            true_rank = (data <= est).mean()
            assert abs(true_rank - phi) <= 0.005, (phi, true_rank)
        # mid-range looser envelope
        for phi in [0.25, 0.5, 0.75]:
            est = t.quantile(phi)
            assert abs((data <= est).mean() - phi) <= 0.02

    def test_centroid_count_bounded(self):
        t = TDigest(compression=100)
        t.update(np.random.default_rng(1).normal(size=100_000))
        t._flush()
        assert len(t.means) <= 110  # ~delta/2 + slack for the k1 ceil-binning

    def test_rank_inverse_of_quantile(self):
        t = TDigest()
        data = np.random.default_rng(2).uniform(size=50_000)
        t.update(data)
        for phi in [0.1, 0.5, 0.9]:
            assert abs(t.rank(t.quantile(phi)) - phi) < 0.01

    def test_serde(self):
        t = TDigest()
        t.update(np.random.default_rng(4).normal(size=30_000))
        rt = Sketch.from_bytes(t.to_bytes())
        assert rt.to_bytes() == t.to_bytes()
        assert rt.quantile(0.5) == t.quantile(0.5)


# --------------------------------------------------------------- hashing
class TestFixedWidthHashFastPath:
    """hash_base's buffer-level SipHash path must be bit-identical to the
    pandas object path for every layout — sketch placement, salting, join
    bucketing and sampling all depend on one universal hash."""

    def test_equal_across_widths_and_layouts(self):
        import string

        import pyarrow as pa

        from verdictray.sketches.hashing import (_arrow_fixed_width_bytes,
                                                 hash_base)

        rng = np.random.default_rng(7)
        for width in [1, 3, 7, 8, 9, 16, 17, 64]:
            strs = ["".join(rng.choice(list(string.printable[:94]), width))
                    for _ in range(257)]
            arr = pa.array(strs, pa.string())
            want = hash_base(np.array(strs, dtype=object))
            assert np.array_equal(hash_base(arr), want), width
            assert np.array_equal(hash_base(arr.slice(5, 101)), want[5:106])
            chunked = pa.chunked_array([arr.slice(0, 50), arr.slice(50, 207)])
            assert np.array_equal(hash_base(chunked), want), width
            assert np.array_equal(hash_base(arr.cast(pa.large_string())), want)
        # chunking inside the kernel is seam-free
        big = pa.array([f"{i:064d}" for i in range(20_000)])
        assert np.array_equal(
            hash_base(big), hash_base(np.array(big.to_pylist(), dtype=object)))

    def test_variable_width_and_nulls_fall_back(self):
        import pyarrow as pa

        from verdictray.sketches.hashing import (_arrow_fixed_width_bytes,
                                                 hash_base)

        var = pa.array(["ab", "abc", "a"])
        assert _arrow_fixed_width_bytes(var) is None
        assert np.array_equal(
            hash_base(var), hash_base(np.array(["ab", "abc", "a"], dtype=object)))
        withnull = pa.array(["aaaa", None, "bbbb"])
        assert _arrow_fixed_width_bytes(withnull) is None

    def test_binary_fixed_width(self):
        import pyarrow as pa

        from verdictray.sketches.hashing import hash_base

        vals = [b"12345678", b"abcdefgh", b"\x00" * 8]
        assert np.array_equal(
            hash_base(pa.array(vals, pa.binary())),
            hash_base(np.array(vals, dtype=object)))


# ------------------------------------------------------------------ nulls
class TestNullSemantics:
    """Sketch updates follow SQL aggregate semantics: NULLs are ignored."""

    def test_hash_sketches_skip_nulls(self):
        import pyarrow as pa

        col = pa.array(["a", None, "b", "a", None], pa.string())
        h = HyperLogLog()
        h.update(col)
        assert abs(h.estimate() - 2) < 0.5
        c = CountMin()
        c.update(col)
        assert c.n == 3
        b = BloomFilter(capacity=100)
        b.update(col)
        assert b.n_added == 3 and b.contains_one("a") and not b.contains_one("z")

    def test_quantile_sketches_skip_nan(self):
        import pyarrow as pa

        for cls in (KLL, TDigest):
            s = cls()
            s.update(pa.array([1.0, None, 3.0]))
            assert s.n == 2


class TestMetricsSummary:
    def test_summarize(self, tmp_path):
        import json

        from verdictray.metrics import summarize

        d = tmp_path / "m"
        d.mkdir()
        for pid, rows in [(1, 100), (2, 200)]:
            with open(d / f"updater-{pid}.jsonl", "w") as f:
                f.write(json.dumps({"ts": 0, "rows": rows, "bytes": rows * 10,
                                    "keys": 5, "secs": 0.5, "blocks_seen": 1}) + "\n")
        s = summarize(str(d))
        assert s["rows"] == 300 and s["partitions"] == 2 and s["rows_per_cpu_sec"] == 300.0


class TestFusedHashSketch:
    """Fused (hash,count) partial == direct per-sketch updates, byte-level
    (sketches/fused.py) — the r2 shuffle-volume optimization's safety net."""

    def test_split_equals_direct_components_any_merge_order(self):
        import numpy as np

        from verdictray.sketches import (BloomFilter, CountMin, FusedHashSketch,
                                         HyperLogLog, Sketch)
        from verdictray.sketches.hashing import derive64, hash_base

        rng = np.random.default_rng(7)
        vals = rng.choice([f"item{i}" for i in range(5000)], size=20000).astype(object)
        base = hash_base(vals)
        uniq, first_ix, cnt = np.unique(base, return_index=True, return_counts=True)
        hll_d = HyperLogLog(p=14)
        hll_d.update_hashed(derive64(uniq, hll_d.seed), assume_unique=True)
        cms_d = CountMin(hh_capacity=16)
        cms_d.update_unique(uniq, cnt, reps=vals[first_ix], n_raw=len(vals))
        bl_d = BloomFilter(capacity=100_000)
        bl_d.update_hashed(uniq, assume_unique=True, n_raw=len(vals))

        parts = []
        for ch in np.array_split(np.arange(len(vals)), 4):
            f = FusedHashSketch(hh_capacity=16, bloom_capacity=100_000)
            f.update(vals[ch])
            parts.append(Sketch.from_bytes(f.to_bytes()))  # wire roundtrip
        m = parts[2].merge(parts[0]).merge(parts[3]).merge(parts[1])
        hll_f, cms_f, bl_f = m.split()
        assert hll_f.to_bytes() == hll_d.to_bytes()
        assert bl_f.to_bytes() == bl_d.to_bytes()
        assert (cms_f.dense_table() == cms_d.dense_table()).all()
        assert cms_f.n == cms_d.n == len(vals)
        # fused wire is materially smaller than the three separate blobs
        sep = len(hll_d.to_bytes()) + len(cms_d.to_bytes()) + len(bl_d.to_bytes())
        assert len(m.to_bytes()) < 0.7 * sep

    def test_promotion_deterministic_across_merge_orders(self):
        import numpy as np

        from verdictray.sketches import FusedHashSketch, Sketch

        # small promote limit via tiny bloom capacity
        def mk(lo, hi):
            f = FusedHashSketch(bloom_capacity=256, hh_capacity=0)
            f.update(np.arange(lo, hi, dtype=np.int64))
            return f

        a = mk(0, 4000).merge(mk(3000, 8000)).merge(mk(7000, 9000))
        b = mk(7000, 9000).merge(mk(0, 4000)).merge(mk(3000, 8000))
        assert a.is_sparse == b.is_sparse
        ha, ca, ba = a.split()
        hb, cb, bb = b.split()
        assert ha.to_bytes() == hb.to_bytes()
        assert ba.to_bytes() == bb.to_bytes()
        assert (ca.dense_table() == cb.dense_table()).all()

    def test_empty_and_singleton(self):
        import numpy as np

        from verdictray.sketches import FusedHashSketch, Sketch

        e = FusedHashSketch()
        rt = Sketch.from_bytes(e.to_bytes())
        assert rt.n == 0
        hll, cms, bloom = rt.split()
        assert hll.estimate() == 0.0
        s = FusedHashSketch()
        s.update(np.array(["one"], dtype=object))
        hll, cms, bloom = Sketch.from_bytes(s.to_bytes()).split()
        assert hll.estimate() == 1.0
        assert cms.query_one("one") == 1

    def test_merge_many_equals_sequential(self):
        import numpy as np

        from verdictray.sketches import FusedHashSketch, Sketch

        def mk(lo, hi, cap=256):
            f = FusedHashSketch(bloom_capacity=cap, hh_capacity=8)
            f.update(np.array([f"v{i}" for i in range(lo, hi)], dtype=object))
            return f

        parts = [mk(0, 3000), mk(2000, 5000), mk(100, 200), mk(4000, 9000)]
        seq = Sketch.from_bytes(parts[0].to_bytes())
        for p in parts[1:]:
            seq.merge(Sketch.from_bytes(p.to_bytes()))
        kway = Sketch.from_bytes(parts[0].to_bytes()).merge_many(
            [Sketch.from_bytes(p.to_bytes()) for p in parts[1:]])
        hs, cs, bs = seq.split()
        hk, ck, bk = kway.split()
        assert hs.to_bytes() == hk.to_bytes()
        assert bs.dense_bits().tobytes() == bk.dense_bits().tobytes()
        assert (cs.dense_table() == ck.dense_table()).all()
        assert seq.n == kway.n


class TestAdviceR2Fixes:
    def test_bloom_dense_scatter_and_bitmap_paths_identical(self):
        import numpy as np

        from verdictray.sketches import BloomFilter
        from verdictray.sketches.hashing import hash_base

        # capacity=1000 -> m_bits ~9590; crossover n*k*32 < m_bits at n~42,
        # so 10-item inputs take the O(k*n) scatter, 100-item the bitmap pass
        items = hash_base(np.arange(100, dtype=np.int64))
        a = BloomFilter(capacity=1000)
        a._promote()
        a._set_dense_from_base(items[:10])   # scatter path
        a._set_dense_from_base(items[10:])   # bitmap path
        b = BloomFilter(capacity=1000)
        b._promote()
        b._set_dense_from_base(items)        # bitmap path, one shot
        assert np.array_equal(a.bits, b.bits)
        assert a.contains(np.arange(100, dtype=np.int64)).all()

    def test_fused_rejects_mismatched_cms_and_bloom_params(self):
        import pytest

        from verdictray.sketches import FusedHashSketch

        base = FusedHashSketch(cms_eps=1e-3, bloom_fpp=0.01)
        base.update(["a", "b"])
        for kw in ({"cms_eps": 1e-2}, {"cms_delta": 0.1}, {"bloom_fpp": 0.05}):
            other = FusedHashSketch(**kw)
            other.update(["c"])
            with pytest.raises(ValueError, match="identical params"):
                base.merge(other)
            with pytest.raises(ValueError, match="identical params"):
                base.merge_many([other])

    def test_updater_empty_block_follows_key_type(self):
        import pyarrow as pa

        from verdictray.pipeline import SketchJobSpec
        from verdictray.updater import SketchUpdater

        spec = SketchJobSpec(input_path="/nonexistent", group_key="g")
        cols = {c: spec.sketch_cols[c] for c in spec.sketch_cols}
        up = SketchUpdater(spec, salts=4)
        empty = pa.table({"g": pa.array([], pa.int64()),
                          **{c: pa.array([], pa.string())
                             for c in set(cols.values())}})
        out = up(empty)
        assert len(out) == 0
        assert out.schema.field("g").type == pa.int64()


class TestMisraGries:
    def _zipf(self, n=20000, mod=500, seed=7):
        rng = np.random.default_rng(seed)
        return rng.zipf(1.5, n) % mod

    def test_exact_when_capacity_covers_domain(self):
        from collections import Counter

        from verdictray.sketches import MisraGries

        data = self._zipf()
        mg = MisraGries(k=1000)
        for chunk in np.array_split(data, 7):
            mg.update(chunk)
        assert mg.decremented == 0
        assert dict(mg.counters) == dict(Counter(data.tolist()))

    def test_undercount_bound_and_heavy_hitter_guarantee(self):
        from collections import Counter

        from verdictray.sketches import MisraGries

        data = self._zipf()
        true = Counter(data.tolist())
        mg = MisraGries(k=20)
        mg.update(data)
        # deterministic MG invariant: est in [f - n/(k+1), f]
        assert mg.error_bound() <= mg.n // (mg.k + 1) + 1
        for item, est in mg.counters.items():
            assert est <= true[item]
            assert true[item] - est <= mg.error_bound()
        # any item with f > n/(k+1) must survive
        thresh = mg.n / (mg.k + 1)
        for item, f in true.items():
            if f > thresh:
                assert item in mg.counters, (item, f, thresh)

    def test_merge_matches_single_pass_and_respects_bound(self):
        from collections import Counter

        from verdictray.sketches import MisraGries

        data = self._zipf()
        true = Counter(data.tolist())
        parts = np.array_split(data, 5)
        # two merge orders: left fold and pairwise tree
        fold = MisraGries(k=24)
        for p in parts:
            s = MisraGries(k=24); s.update(p); fold.merge(s)
        sks = []
        for p in parts:
            s = MisraGries(k=24); s.update(p); sks.append(s)
        while len(sks) > 1:
            a = sks.pop(0); b = sks.pop(0)
            sks.append(a.merge(b))
        tree = sks[0]
        for sk in (fold, tree):
            assert sk.n == len(data)
            assert sk.error_bound() <= sk.n // (sk.k + 1) + 1
            for item, est in sk.counters.items():
                assert est <= true[item] <= est + sk.error_bound()

    def test_serialization_roundtrip_int_and_str(self):
        from verdictray.sketches import MisraGries, Sketch

        mg = MisraGries(k=20)
        mg.update(self._zipf())
        rt = Sketch.from_bytes(mg.to_bytes())
        assert (rt.counters, rt.n, rt.decremented, rt.k) == \
            (mg.counters, mg.n, mg.decremented, mg.k)
        ms = MisraGries(k=3)
        ms.update(np.array(["a", "b", "a", "c", "d", "a", "b"]))
        rts = Sketch.from_bytes(ms.to_bytes())
        assert rts.counters == ms.counters and rts.n == ms.n

    def test_as_aggregate_distributed_exact(self, ray_session):
        import ray.data as rd

        from verdictray.sketches import MisraGries, Sketch
        from verdictray.udaf import as_aggregate

        vals = np.repeat(np.arange(30, dtype=np.int64), np.arange(1, 31))
        ds = rd.from_arrow(pa.table({"v": vals})).repartition(4)
        row = ds.aggregate(as_aggregate(MisraGries, on="v",
                                        alias_name="blob", output="blob",
                                        k=64))
        sk = Sketch.from_bytes(row["blob"])
        assert sk.decremented == 0
        assert sk.top_k(2) == [(29, 30), (28, 29)]


class TestKMV:
    def test_exact_below_saturation(self):
        from verdictray.sketches import KMV

        sk = KMV(k=1024)
        sk.update(np.arange(500))
        sk.update(np.arange(250, 600))  # overlapping second batch
        assert not sk.saturated and sk.theta == 1.0
        assert sk.estimate() == 600.0

    def test_estimator_within_3sigma_when_saturated(self):
        from verdictray.sketches import KMV

        rng = np.random.default_rng(7)
        bound = 3 / np.sqrt(2046)
        for trial in range(6):
            vals = np.unique(rng.integers(0, 1 << 60, 200_000))
            sk = KMV(k=2048, seed=trial)
            for chunk in np.array_split(vals, 7):
                sk.update(chunk)
            assert abs(sk.estimate() / len(vals) - 1) < bound, trial

    def test_set_ops_match_exact_within_sampling_error(self):
        from verdictray.sketches import KMV

        rng = np.random.default_rng(3)
        a = np.unique(rng.integers(0, 1 << 50, 300_000))
        b = np.unique(np.concatenate(
            [a[:120_000], rng.integers(1 << 50, 1 << 51, 200_000)]))
        ka, kb = KMV(k=4096), KMV(k=4096)
        ka.update(a)
        kb.update(b)
        inter = len(np.intersect1d(a, b))
        diff = len(np.setdiff1d(a, b))
        uni = len(np.union1d(a, b))
        # theta-framework sampling error: generous 5/sqrt(k) envelope
        tol = 5 / np.sqrt(4096)
        assert abs(ka.intersection(kb) / inter - 1) < tol
        assert abs(ka.difference(kb) / diff - 1) < tol
        assert abs(ka.union_estimate(kb) / uni - 1) < tol

    def test_set_ops_exact_when_unsaturated(self):
        from verdictray.sketches import KMV

        a = KMV(k=8192)
        b = KMV(k=8192)
        a.update(np.arange(0, 3000))
        b.update(np.arange(2000, 5000))
        assert a.intersection(b) == 1000.0
        assert a.difference(b) == 2000.0
        assert b.difference(a) == 2000.0
        assert a.union_estimate(b) == 5000.0

    def test_merge_split_invariant_byte_identical(self):
        from verdictray.sketches import KMV, Sketch

        data = np.random.default_rng(9).integers(0, 1 << 40, 50_000)
        one = KMV(k=256)
        one.update(data)
        parts = []
        for chunk in np.array_split(data, 11):
            s = KMV(k=256)
            s.update(chunk)
            parts.append(s)
        # tree merge order
        while len(parts) > 1:
            parts.append(parts.pop(0).merge(parts.pop(0)))
        assert parts[0].to_bytes() == one.to_bytes()
        rt = Sketch.from_bytes(one.to_bytes())
        assert isinstance(rt, KMV)
        assert rt.estimate() == one.estimate()
        assert rt.to_bytes() == one.to_bytes()

    def test_incompatible_merge_raises(self):
        import pytest as _pytest

        from verdictray.sketches import KMV

        a, b, c = KMV(k=64), KMV(k=128), KMV(k=64, seed=5)
        with _pytest.raises(ValueError):
            a.merge(b)
        with _pytest.raises(ValueError):
            a.intersection(c)

    def test_null_and_string_updates(self):
        import pyarrow as _pa

        from verdictray.sketches import KMV

        sk = KMV(k=512)
        sk.update(_pa.array(["a", "b", None, "a", "c"]))
        assert sk.estimate() == 3.0


def test_cms_inner_product_join_size_bound():
    import numpy as np

    from verdictray.sketches.cms import CountMin

    rng = np.random.default_rng(7)
    # zipf-ish key frequencies on both sides
    ka = rng.zipf(1.5, 20000) % 500
    kb = rng.zipf(1.3, 8000) % 500
    fa = np.bincount(ka, minlength=500)
    fb = np.bincount(kb, minlength=500)
    true = int((fa * fb).sum())
    a = CountMin(eps=1e-3, seed=3); a.update(ka.astype(np.int64))
    b = CountMin(eps=1e-3, seed=3); b.update(kb.astype(np.int64))
    est = a.inner_product(b)
    assert est >= true                       # never an underestimate
    assert est <= true + 1e-3 * len(ka) * len(kb)
    # param mismatch must raise, not silently mis-estimate
    c = CountMin(eps=1e-2, seed=3); c.update(kb.astype(np.int64))
    with pytest.raises(ValueError):
        a.inner_product(c)


def test_cms_join_size_matches_exact_on_driver_tables(ray_session, sf_dir):
    import duckdb

    import ray.data as rd
    from verdictray.query import cms_join_size

    exact = duckdb.sql(
        f"select count(*) from '{sf_dir}/orders.parquet' o "
        f"join '{sf_dir}/customer.parquet' c on o.o_custkey = c.c_custkey"
    ).fetchone()[0]
    left = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    right = rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"])
    r = cms_join_size(left, right, "o_custkey", "c_custkey", eps=1e-4)
    assert r["est_join_size"] >= exact
    assert r["est_join_size"] <= exact + r["eps_bound"]
