"""Property-based tests — merge algebra under random splits (SURVEY.md §5.2).

The distributed partial+final pattern is correct iff
    sketch(stream) == merge(sketch(part_i))  over arbitrary partitionings,
and merge is associative + commutative. HLL/CMS/Bloom must be
byte-deterministic under re-association; t-digest/KLL are estimate-stable
only (their state depends on merge order — documented in SURVEY.md §5.2).
"""

import copy

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from verdictray.sketches import BloomFilter, CountMin, HyperLogLog, KLL, TDigest

N_ITEMS = 5000


def _stream(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # skewed duplicates: zipf-ish item ids
    ids = rng.zipf(1.5, size=N_ITEMS) % 2000
    return np.array([f"item-{i}" for i in ids], dtype=object)


def _random_split(arr, rng, k=3):
    marks = rng.integers(0, k, size=len(arr))
    return [arr[marks == i] for i in range(k)]


BYTE_DETERMINISTIC = {
    "hll": lambda: HyperLogLog(p=10),
    "cms": lambda: CountMin(eps=1e-2, delta=1e-2),
    "bloom": lambda: BloomFilter(capacity=N_ITEMS, fpp=0.01),
}


@pytest.mark.parametrize("name", list(BYTE_DETERMINISTIC))
@given(seed=st.integers(0, 10_000))
@settings(max_examples=15, deadline=None)
def test_merge_associative_commutative_bytes(name, seed):
    factory = BYTE_DETERMINISTIC[name]
    rng = np.random.default_rng(seed)
    parts = _random_split(_stream(seed), rng, k=3)
    sk = []
    for p in parts:
        s = factory()
        if len(p):
            s.update(p)
        sk.append(s)
    left = copy.deepcopy(sk[0]).merge(copy.deepcopy(sk[1])).merge(copy.deepcopy(sk[2]))
    right = copy.deepcopy(sk[0]).merge(copy.deepcopy(sk[1]).merge(copy.deepcopy(sk[2])))
    swapped = copy.deepcopy(sk[2]).merge(copy.deepcopy(sk[0])).merge(copy.deepcopy(sk[1]))
    assert left.to_bytes() == right.to_bytes() == swapped.to_bytes()


@pytest.mark.parametrize("name", list(BYTE_DETERMINISTIC))
@given(seed=st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_split_invariance_bytes(name, seed):
    """sketch(whole stream) ≡ merge(sketch(part_i)) — byte-identical."""
    factory = BYTE_DETERMINISTIC[name]
    stream = _stream(seed)
    rng = np.random.default_rng(seed + 1)
    whole = factory()
    whole.update(stream)
    merged = factory()
    for p in _random_split(stream, rng, k=4):
        part = factory()
        if len(p):
            part.update(p)
        merged.merge(part)
    if name == "cms":
        # candidate sets aside, the counter table must match exactly
        assert (whole.dense_table() == merged.dense_table()).all() and whole.n == merged.n
    else:
        assert whole.to_bytes() == merged.to_bytes()


@given(seed=st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_quantile_sketches_estimate_stable(seed):
    """KLL/t-digest: merged estimates stay within bound regardless of
    split/merge order (state bytes may differ)."""
    rng = np.random.default_rng(seed)
    data = rng.normal(size=20_000)
    parts = _random_split(data, rng, k=4)

    for factory, tol in [(lambda: KLL(k=200), 0.033), (lambda: TDigest(100), 0.02)]:
        sketches = []
        for p in parts:
            s = factory()
            if len(p):
                s.update(p)
            sketches.append(s)
        m1 = copy.deepcopy(sketches[0])
        for s in sketches[1:]:
            m1.merge(copy.deepcopy(s))
        m2 = copy.deepcopy(sketches[3])
        for s in sketches[2::-1]:
            m2.merge(copy.deepcopy(s))
        for m in (m1, m2):
            assert m.n == len(data)
            for phi in [0.1, 0.5, 0.9]:
                est = m.quantile(phi)
                true_rank = (data <= est).mean()
                assert abs(true_rank - phi) <= tol, (phi, true_rank)


@given(seed=st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_hll_error_envelope(seed):
    """Statistical bound: estimates within 3σ (σ=1.04/√m) per trial at a
    known cardinality — asserted per seeded trial with the 3σ envelope,
    never at the 1σ bound (SURVEY.md §5.2)."""
    n = 3000 + (seed % 5000)
    h = HyperLogLog(p=12)
    h.update(np.array([f"s{seed}-{i}" for i in range(n)], dtype=object))
    rel = abs(h.estimate() - n) / n
    assert rel <= 3 * h.error_bound(), rel


@given(seed=st.integers(0, 1000))
@settings(max_examples=10, deadline=None)
def test_cms_bound_envelope(seed):
    rng = np.random.default_rng(seed)
    items = np.array([f"i{v}" for v in rng.integers(0, 200, size=10_000)], dtype=object)
    c = CountMin(eps=1e-3, delta=1e-2)
    c.update(items)
    from collections import Counter

    true = Counter(items.tolist())
    probe = list(true)[:50]
    ests = c.query(np.array(probe, dtype=object))
    for w, est in zip(probe, ests):
        assert true[w] <= est <= true[w] + c.error_bound()


@given(seed=st.integers(0, 100_000))
@settings(max_examples=25, deadline=None)
def test_representation_order_independent_at_boundaries(seed):
    """Sparse→dense promotion must depend only on the TRUE distinct count,
    never on update/merge order or duplicate ratios — otherwise two paths
    that see the same multiset produce different bytes. Exercises stream
    sizes around the small-parameter sparse limits (found by a 300-seed
    soak in round 1)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 600))
    s = np.array([f"e{seed}-{i % max(1, n // 2)}" for i in range(n)], dtype=object)
    marks = rng.integers(0, 3, size=n)
    parts = [s[marks == i] for i in range(3)]
    for name, factory in [
        ("hll", lambda: HyperLogLog(p=8)),      # sparse limit 64
        ("cms", lambda: CountMin(eps=2e-2)),    # tiny width
        ("bloom", lambda: BloomFilter(capacity=300)),
    ]:
        whole = factory()
        whole.update(s)
        merged = factory()
        for p in parts:
            x = factory()
            if len(p):
                x.update(p)
            merged.merge(x)
        assert whole.is_sparse == merged.is_sparse, (name, seed, n)
        if name == "cms":
            assert (whole.dense_table() == merged.dense_table()).all()
            assert whole.n == merged.n
        else:
            assert whole.to_bytes() == merged.to_bytes(), (name, seed, n)


@given(seed=st.integers(0, 10_000))
@settings(max_examples=25, deadline=None)
def test_fused_split_invariant_across_merge_orders_and_boundaries(seed):
    """FusedHashSketch: any chunking + any merge order (pairwise or k-way,
    with wire roundtrips) yields byte-identical component HLL/Bloom and an
    identical CMS count table — including at the sparse→dense promotion
    boundary (tiny bloom capacity forces promotion mid-merge for about
    half the generated sizes; r1's promotion-determinism lesson)."""
    import numpy as np

    from verdictray.sketches import FusedHashSketch, Sketch

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 4000))
    vals = rng.integers(0, max(2, n), size=n).astype(np.int64)

    def mk(chunk):
        f = FusedHashSketch(bloom_capacity=64, hh_capacity=4)
        if len(chunk):
            f.update(chunk)
        return Sketch.from_bytes(f.to_bytes())

    n_chunks = int(rng.integers(1, 7))
    bounds = np.sort(rng.integers(0, n + 1, size=n_chunks - 1)) if n_chunks > 1 else []
    chunks = np.split(vals, bounds)

    # order 1: sequential pairwise in shuffled order
    order = rng.permutation(len(chunks))
    a = mk(chunks[order[0]])
    for i in order[1:]:
        a.merge(mk(chunks[i]))
    # order 2: k-way merge in a different shuffled order
    order2 = rng.permutation(len(chunks))
    b = mk(chunks[order2[0]]).merge_many([mk(chunks[i]) for i in order2[1:]])

    ha, ca, ba = a.split()
    hb, cb, bb = b.split()
    assert ha.to_bytes() == hb.to_bytes()
    assert ba.to_bytes() == bb.to_bytes()
    assert (ca.dense_table() == cb.dense_table()).all()
    assert a.n == b.n == n
