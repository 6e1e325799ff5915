"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray-Data-first shapes (ray_guide.md "Near-dup" pattern):

  exact     groupby(hash).map_groups(head(1))              [ops.dedup_exact]
  minhash   shingle→minhash per batch → explode to (band_id, band_hash, id)
            rows → groupby(band) → candidate pairs → verify exact n-gram
            Jaccard → pairs above threshold
  simhash   64-bit token-vote signature per doc; near-dup = Hamming ≤ r
            via b-bit band bucketing (same groupby shape)
  cosine    normalized embeddings; block × broadcast-matrix matmul per
            batch; pairs above cosine threshold

Scale notes: candidate generation shuffles only (band_id, band_hash, id)
rows — never documents. Verification rejoins texts with TWO bucketed hash
joins (pairs ⋈ corpus on id_a, then on id_b — join.hash_join, one shuffle
each, nothing driver-side); a broadcast id→text fast path exists behind an
explicit size check (``verify_mode="auto"``). Buckets above ``max_bucket``
are dropped with a logged count (JSONL record via ``metrics_dir`` plus a
logging.warning — no silent truncation; see metrics.summarize_dropped).

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches.hashing import _to_numpy, hash64
from .text import _powers

logger = logging.getLogger(__name__)


def _log_dropped_bucket(metrics_dir: str | None, algo: str, bucket_key: tuple,
                        size: int, max_bucket: int) -> None:
    """Record an over-cap LSH bucket that was dropped from candidate
    generation: a JSONL record (worker-pid-keyed file, same pattern as the
    updater metrics) plus a logging.warning. Candidate-recall loss must be
    visible, not silent."""
    dropped_pairs = size * (size - 1) // 2
    logger.warning(
        "dedup[%s]: dropping LSH bucket %s with %d members (> max_bucket=%d, "
        "%d candidate pairs lost)", algo, bucket_key, size, max_bucket, dropped_pairs,
    )
    if metrics_dir:
        os.makedirs(metrics_dir, exist_ok=True)
        rec = {"ts": time.time(), "algo": algo, "bucket": list(bucket_key),
               "size": size, "max_bucket": max_bucket,
               "dropped_pairs": dropped_pairs}
        with open(f"{metrics_dir}/dropped-{os.getpid()}.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


def _dataset_small_enough(ds, limit_bytes: int) -> bool:
    """True only when the dataset's known size fits under ``limit_bytes``;
    unknown size → False (scale-safe default)."""
    try:
        sz = ds.size_bytes()
    except Exception:  # noqa: BLE001
        sz = None
    return sz is not None and sz <= limit_bytes


def _rename_cols(ds, mapping: dict[str, str]):
    def fn(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(n, n) for n in b.schema.names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _empty_pairs_if_schemaless(pairs):
    """A zero-candidate pair Dataset (every bucket dropped/size-1) loses
    its schema in the groupby→aggregate path, and hash_join needs one.
    Materialize the pair set (it is ≪ corpus by LSH construction — and the
    downstream joins would pull it fully anyway) and return a typed empty
    (id_a, id_b) Dataset in the degenerate case, else the materialized set."""
    import ray.data as rd

    mat = pairs.materialize()
    if mat.schema(fetch_if_missing=False) is None or mat.count() == 0:
        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64())})), True
    return mat, False


def _distinct_pairs(pairs, extra: str | None = None):
    """Distinct candidate pairs via ONE vectorized sort-based aggregate.

    The same (id_a, id_b) pair surfaces from every band it collides in, so
    candidate streams carry near-duplicate rows in 1–2-row groups. A
    ``map_groups(head(1))`` there spawns one pandas task per pair — at
    billions of candidates the per-group overhead dominates. Ray's built-in
    grouped aggregates instead combine per block (vectorized) and k-way
    merge in the reduce tasks, so this is a single shuffle of (id_a, id_b
    [, extra]) with no per-pair task. ``extra`` (e.g. hamming/cosine) is
    identical across a pair's band copies, so min() reproduces it exactly.
    """
    g = pairs.groupby(["id_a", "id_b"])
    if extra is None:
        return g.count().drop_columns(["count()"])
    return _rename_cols(g.min(extra), {f"min({extra})": extra})

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _shingle_hashes(b: bytes, k: int) -> np.ndarray:
    """All k-byte-shingle polynomial hashes of one document (vectorized:
    k dot-products with shifted views)."""
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    n = len(arr)
    if n < k:
        return np.zeros(1, dtype=np.uint64) if n == 0 else np.array(
            [(arr * _powers(n)[:n][::-1]).sum()], dtype=np.uint64)
    pw = _powers(k)[:k][::-1]
    out = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        out += arr[j : n - k + 1 + j] * pw[j]
    return out


def minhash_signature(b: bytes, num_perm: int, k: int, seeds: np.ndarray) -> np.ndarray:
    """num_perm MinHash values from k-byte shingles (one doc)."""
    sh = np.unique(_shingle_hashes(b, k))
    # (n_shingles, num_perm) seeded remix, column-wise minima
    mixed = sh[:, None] ^ seeds[None, :]
    mixed = (mixed ^ (mixed >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    mixed = (mixed ^ (mixed >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    mixed ^= mixed >> np.uint64(31)
    return mixed.min(axis=0)


class MinHasher:
    """Actor-pool/batch stage: text column → (id, band_id, band_hash) rows.

    bands × rows_per_band = num_perm; the usual S-curve: collision prob
    per band = jaccard^rows_per_band."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64,
                 shingle_k: int = 5, bands: int = 16):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.seeds = (np.arange(1, num_perm + 1, dtype=np.uint64) * _MIX) & _M64

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].cast(pa.binary()).to_pylist()
        n = len(texts)
        r = self.rows_per_band
        # per-doc signature loop is inherent (variable-length shingle sets);
        # band hashing/packing below is batch-level numpy
        sigs = np.stack([
            minhash_signature(b or b"", self.num_perm, self.k, self.seeds)
            for b in texts
        ]) if n else np.zeros((0, self.num_perm), np.uint64)
        chunks = sigs.reshape(n, self.bands, r)
        if r == 1:
            hashes = np.stack([
                hash64(chunks[:, band, 0].astype(np.int64), seed=band + 1000)
                for band in range(self.bands)
            ], axis=1) if n else np.zeros((0, self.bands), np.uint64)
        else:
            pw = _powers(r)[:r][::-1]
            hashes = (chunks * pw).sum(axis=2)  # uint64 wraparound == & _M64
        signed = (hashes.reshape(-1) - np.uint64(1 << 63)).view(np.int64)
        ids_rep = batch[self.id_col].take(
            pa.array(np.repeat(np.arange(n), self.bands)))
        return pa.table({
            self.id_col: ids_rep,
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(signed, pa.int64()),
        })


def ngram_jaccard(a: bytes, b: bytes, k: int = 5) -> float:
    """Exact k-byte-shingle Jaccard similarity (the verify step)."""
    sa = np.unique(_shingle_hashes(a, k))
    sb = np.unique(_shingle_hashes(b, k))
    if not len(sa) and not len(sb):
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def _side_shingles(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte-shingle hashes for a LIST of documents in one vectorized
    pass → (doc_idx, hash) arrays. Bit-identical per doc to
    _shingle_hashes (same polynomial, same n<k / n==0 edge semantics)."""
    enc = [(t or "").encode() if isinstance(t, str) else (t or b"")
           for t in texts]
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    n_docs = len(enc)
    starts = np.concatenate(([0], np.cumsum(lens)))
    doc_parts, hash_parts = [], []
    # long docs (n >= k): one shifted-multiply-add pass over the flat
    # buffer, windows crossing doc boundaries masked out
    total = int(lens.sum())
    if total >= k:
        pw = _powers(k)[:k][::-1]
        m = total - k + 1
        acc = np.zeros(m, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc += flat[j: j + m] * pw[j]
        doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        valid = doc_ix[:m] == doc_ix[k - 1:]
        doc_parts.append(doc_ix[:m][valid])
        hash_parts.append(acc[valid])
    # short docs (0 < n < k): one whole-string hash with length-n powers;
    # empty docs hash to 0 — exactly _shingle_hashes' edge cases
    short = np.flatnonzero(lens < k)
    if len(short):
        sh = np.zeros(len(short), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for s_i, di in enumerate(short):
                n = int(lens[di])
                if n:
                    seg = flat[starts[di]:starts[di] + n]
                    sh[s_i] = (seg * _powers(n)[:n][::-1]).sum()
        doc_parts.append(short)
        hash_parts.append(sh)
    if not doc_parts:
        return (np.empty(0, np.int64), np.empty(0, np.uint64))
    return np.concatenate(doc_parts), np.concatenate(hash_parts)


def batch_ngram_jaccard(texts_a: list, texts_b: list, k: int = 5) -> np.ndarray:
    """Vectorized ngram_jaccard over aligned text pairs: shingle both
    sides in one flat-buffer pass each, then pack every row into ONE
    sortable uint64 — pair id in the high 23 bits, a pair-salted 40-bit
    remix of the shingle hash in the middle, the side flag in bit 0 — so
    a single value np.sort groups rows by (pair, shingle) with side-a
    rows leading each run. union(pair) = runs per pair, inter(pair) =
    runs whose first row is side a AND last row is side b. No per-pair
    Python, no argsort indirection.

    Equality vs the scalar kernel: exact up to in-pair 40-bit remix
    collisions (~n_shingles²/2⁴¹ ≈ 1e-9 per pair — the same accepted
    fingerprint-collision regime as the scalar kernel's own 64-bit
    shingle hashing; cross-pair collisions are impossible, the pair id
    occupies disjoint bits). Property-tested against the scalar kernel.
    Batches beyond 2²³ pairs recurse in slices."""
    P = len(texts_a)
    if P == 0:
        return np.empty(0, dtype=np.float64)
    if P > (1 << 23):
        half = P // 2
        return np.concatenate([
            batch_ngram_jaccard(texts_a[:half], texts_b[:half], k),
            batch_ngram_jaccard(texts_a[half:], texts_b[half:], k)])
    da, ha = _side_shingles(texts_a, k)
    db, hb = _side_shingles(texts_b, k)
    doc = np.concatenate([da, db]).astype(np.uint64)
    h = np.concatenate([ha, hb])
    with np.errstate(over="ignore"):
        # splitmix64 finalizer over (hash + pair-salt): decorrelates the
        # polynomial hashes before truncating to 40 bits
        m = h + doc * np.uint64(0x9E3779B97F4A7C15)
        m = (m ^ (m >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        m = (m ^ (m >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        m ^= m >> np.uint64(31)
    key = (doc << np.uint64(41)) | ((m >> np.uint64(24)) << np.uint64(1))
    key[len(da):] |= np.uint64(1)   # side bit
    key.sort()
    grp = key >> np.uint64(1)
    n = len(grp)
    start = np.empty(n, dtype=bool)
    start[0] = True
    start[1:] = grp[1:] != grp[:-1]
    end = np.empty(n, dtype=bool)
    end[-1] = True
    end[:-1] = start[1:]
    run_doc = (key[start] >> np.uint64(41)).astype(np.int64)
    # side bit is the low key bit: runs sort side-a (0) before side-b (1)
    both = ((key[start] & np.uint64(1)) == 0) & ((key[end] & np.uint64(1)) == 1)
    union = np.bincount(run_doc, minlength=P)
    inter = np.bincount(run_doc[both], minlength=P)
    # both sides empty shingle SETS cannot happen (empty text hashes to
    # {0}), mirroring the scalar kernel's dead branch; guard anyway
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)




def minhash_dedup_pairs(ds, text_col: str, id_col: str, threshold: float = 0.8,
                        num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                        max_bucket: int = 64, concurrency=None,
                        verify_mode: str = "auto",
                        broadcast_limit_bytes: int = 64 << 20,
                        join_buckets: int = 16,
                        metrics_dir: str | None = None):
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Candidate generation is fully distributed (only (band_id, band_hash,
    id) rows shuffle). Verification re-attaches the two texts per candidate
    pair with two bucketed hash joins (join.hash_join) and computes exact
    n-gram Jaccard inside the join tasks — nothing materializes on the
    driver, so the verified path survives corpora that dwarf any single
    machine.

    ``verify_mode``: "join" (scale path, default choice for unknown/large
    inputs), "broadcast" (one ray.put id→text dict — faster for inputs
    known to fit comfortably in the object store), or "auto" (broadcast
    only when ``ds.size_bytes()`` is known and ≤ ``broadcast_limit_bytes``).
    """
    # stateless task form (constructing MinHasher per batch is just seed
    # setup): avoids actor-pool CPU reservation, which can starve the
    # downstream shuffle tasks on small CPU budgets
    def _hash_batch(batch: pa.Table) -> pa.Table:
        return MinHasher(text_col, id_col, num_perm=num_perm,
                         shingle_k=shingle_k, bands=bands)(batch)

    band_rows = ds.map_batches(_hash_batch, batch_format="pyarrow",
                               zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        if len(ids) > max_bucket:
            _log_dropped_bucket(
                metrics_dir, "minhash",
                (int(group["band_id"][0].as_py()), int(group["band_hash"][0].as_py())),
                len(ids), max_bucket)
        if len(ids) < 2 or len(ids) > max_bucket:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64())})

    candidates = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    # dedupe candidate pairs (same pair collides in several bands)
    uniq_pairs = _distinct_pairs(candidates)

    if verify_mode == "auto":
        verify_mode = ("broadcast"
                       if _dataset_small_enough(ds, broadcast_limit_bytes)
                       else "join")
    if verify_mode == "broadcast":
        return _verify_pairs_broadcast(ds, uniq_pairs, text_col, id_col,
                                       threshold, shingle_k)
    return _verify_pairs_join(ds, uniq_pairs, text_col, id_col, threshold,
                              shingle_k, join_buckets)


def _jaccard_pairs(ta: list, tb: list, k: int) -> np.ndarray:
    """Adaptive dispatch between the vectorized batch kernel and the
    scalar per-pair kernel. The batch kernel wins big (≈10×) on short
    texts, where per-pair numpy call overhead dominates the scalar path;
    on long documents the scalar path's per-doc numpy work is already
    vectorized and the batch kernel's global sort only adds cost — so
    dispatch on mean text length."""
    P = len(ta)
    if P >= 32:
        mean_len = sum(len(t or "") for t in ta[:256]) / min(P, 256)
        if mean_len <= 160:
            return batch_ngram_jaccard(ta, tb, k)
    return np.array([ngram_jaccard((a or "").encode(), (b or "").encode(), k)
                     for a, b in zip(ta, tb)], dtype=np.float64)


def _verify_pairs_broadcast(ds, uniq_pairs, text_col, id_col, threshold,
                            shingle_k):
    """Small-input fast path: one ray.put of the id→text dict, read by every
    verify task. Only reachable through an explicit size check."""
    import ray

    texts_tbl = ds.select_columns([id_col, text_col]).to_pandas()
    lookup_ref = ray.put(dict(zip(texts_tbl[id_col], texts_tbl[text_col])))

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        ids_a = batch["id_a"].to_pylist()
        ids_b = batch["id_b"].to_pylist()
        sims = _jaccard_pairs([lookup[a] for a in ids_a],
                              [lookup[b] for b in ids_b], shingle_k)
        keep = sims >= threshold
        ix = pa.array(np.flatnonzero(keep))
        return pa.table({"id_a": pc.take(batch["id_a"], ix),
                         "id_b": pc.take(batch["id_b"], ix),
                         "jaccard": pa.array(sims[keep], pa.float64())})

    return uniq_pairs.map_batches(verify, batch_format="pyarrow")


def _verify_pairs_join(ds, uniq_pairs, text_col, id_col, threshold, shingle_k,
                       join_buckets):
    """Scale path: candidate pairs ⋈ corpus on id_a, then ⋈ corpus on id_b
    (two single-shuffle bucketed joins); exact Jaccard per joined row. The
    corpus streams through each join narrow (id + text only) and the pair
    set — already ≪ corpus by LSH construction — is the only thing carried
    across both."""
    import ray.data as rd

    from .join import hash_join

    uniq_pairs, no_candidates = _empty_pairs_if_schemaless(uniq_pairs)
    if no_candidates:
        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64()),
                                       "jaccard": pa.array([], pa.float64())}))

    corpus = ds.select_columns([id_col, text_col])
    corp_a = _rename_cols(corpus, {id_col: "_ja", text_col: "_text_a"})
    corp_b = _rename_cols(corpus, {id_col: "_jb", text_col: "_text_b"})
    j = hash_join(uniq_pairs, corp_a, "id_a", "_ja", buckets=join_buckets)
    j = j.drop_columns(["_ja"])
    j = hash_join(j, corp_b, "id_b", "_jb", buckets=join_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        sims = _jaccard_pairs(batch["_text_a"].to_pylist(),
                              batch["_text_b"].to_pylist(), shingle_k)
        keep = sims >= threshold
        ix = pa.array(np.flatnonzero(keep))
        return pa.table({"id_a": pc.take(batch["id_a"], ix),
                         "id_b": pc.take(batch["id_b"], ix),
                         "jaccard": pa.array(sims[keep], pa.float64())})

    return j.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------------------ clusters
def neardup_clusters(pairs, id_col_a: str = "id_a", id_col_b: str = "id_b") -> dict:
    """Connected components over verified near-dup pairs → {id: cluster_root}.

    Union-find on the driver: the verified pair set is orders of magnitude
    smaller than the corpus (ray_guide near-dup pattern allows driver-side
    union-find "only if the candidate set is provably small" — verified
    pairs are ≤ actual near-dups, which dedup presumes are a small
    fraction). When the pair set itself outgrows the driver, use
    ``neardup_clusters_distributed`` (min-label propagation; same roots);
    ``drop_neardups(mode="auto")`` picks between them by a size check.
    """
    df = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(df[id_col_a], df[id_col_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # canonical root = smaller id → deterministic clusters
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def neardup_clusters_distributed(pairs, id_col_a: str = "id_a",
                                 id_col_b: str = "id_b", max_iters: int = 50,
                                 join_buckets: int = 16):
    """Connected components over a pair *Dataset* via iterated min-label
    propagation — the scale fallback for pair sets too large for driver
    union-find. Returns a Dataset of (nd, lbl) with lbl = the component's
    minimum id: identical semantics to ``neardup_clusters`` (whose
    union-by-smaller-root also converges to the min id).

    Per round (BSP superstep): attach both endpoints' labels (two bucketed
    joins), scatter min(label) to both endpoints, grouped min, then one
    pointer-jumping hop (each node adopts its label's label — halves the
    remaining path). The grouped-min table and the hopped table are each
    MATERIALIZED (≤ #nodes rows, 16 B each): the hop self-joins the min
    table, and an unmaterialized diamond (two consumers of the same
    lineage fused with three more all-to-all stages) re-executes the
    duplicated sub-DAG and stalls Ray's streaming executor at small CPU
    counts — the barrier is inherent to BSP label propagation anyway.
    Convergence needs no extra join: labels decrease monotonically, so
    the label-sum is strictly decreasing until the fixed point —
    sum-unchanged ⇔ converged. With the hop, a diameter-d chain converges
    in O(log d) rounds (near-dup clusters are shallow cliques/stars →
    1–3 rounds in practice).
    """
    from .join import hash_join

    edges = pairs.select_columns([id_col_a, id_col_b]).materialize()

    def init_nodes(b: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            _to_numpy(b[id_col_a]).astype(np.int64),
            _to_numpy(b[id_col_b]).astype(np.int64)]))
        return pa.table({"nd": pa.array(ids, pa.int64())})

    # every per-round materialization is bounded to join_buckets blocks
    # (no-shuffle coalesce): groupby/union/map_groups each multiply tiny
    # blocks, and without the bound the block count — and with it pure
    # task-scheduling overhead — compounds ~5-10x per round
    labels = (edges.map_batches(init_nodes, batch_format="pyarrow",
                                zero_copy_batch=True)
              .groupby("nd").count().drop_columns(["count()"])
              .map_batches(lambda b: b.append_column("lbl", b["nd"]),
                           batch_format="pyarrow")
              .repartition(join_buckets)
              .materialize())

    def scatter_min(b: pa.Table) -> pa.Table:
        m = np.minimum(_to_numpy(b["_la"]).astype(np.int64),
                       _to_numpy(b["_lb"]).astype(np.int64))
        nd = np.concatenate([_to_numpy(b[id_col_a]).astype(np.int64),
                             _to_numpy(b[id_col_b]).astype(np.int64)])
        return pa.table({"nd": pa.array(nd, pa.int64()),
                         "lbl": pa.array(np.concatenate([m, m]), pa.int64())})

    prev_sum = labels.sum("lbl")
    for it in range(max_iters):
        la = _rename_cols(labels, {"nd": "_na", "lbl": "_la"})
        lb = _rename_cols(labels, {"nd": "_nb", "lbl": "_lb"})
        j = hash_join(edges, la, id_col_a, "_na", buckets=join_buckets)
        j = hash_join(j.drop_columns(["_na"]), lb, id_col_b, "_nb",
                      buckets=join_buckets)
        prop = j.map_batches(scatter_min, batch_format="pyarrow")
        merged = _rename_cols(
            labels.union(prop).groupby("nd").min("lbl"),
            {"min(lbl)": "lbl"}).repartition(join_buckets).materialize()
        # pointer jump: adopt the label's own label (lbl is always a node
        # id, so the self-join is total); halves the remaining path depth
        parent = _rename_cols(merged, {"nd": "_pn", "lbl": "_pl"})
        hopped = hash_join(merged, parent, "lbl", "_pn", buckets=join_buckets)
        labels = hopped.map_batches(
            lambda b: pa.table({"nd": b["nd"], "lbl": b["_pl"]}),
            batch_format="pyarrow",
            zero_copy_batch=True).repartition(join_buckets).materialize()
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    logger.warning("neardup_clusters_distributed: no convergence after %d "
                   "iterations (component diameter exceeds max_iters)", max_iters)
    return labels


def drop_neardups(ds, pairs, id_col: str, mode: str = "auto",
                  broadcast_limit_bytes: int = 64 << 20,
                  join_buckets: int = 16):
    """Keep one representative (the cluster root) per near-dup cluster —
    the actual dedup step.

    ``mode``: "driver" broadcasts the union-find root map (fast path for
    pair sets known to fit the driver); "distributed" runs min-label
    propagation and anti-joins the drop set (nothing driver-side); "auto"
    materializes the pair Dataset and picks by the same explicit size
    check the verify paths use. Non-clustered rows pass through untouched
    either way."""
    import ray

    if mode == "auto":
        if hasattr(pairs, "size_bytes"):  # a Dataset — materialize to know
            pairs = pairs.materialize()
            mode = ("driver" if _dataset_small_enough(pairs, broadcast_limit_bytes)
                    else "distributed")
        else:  # an in-memory DataFrame is driver-sized by construction
            mode = "driver"

    if mode == "driver":
        roots = neardup_clusters(pairs)
        drop = {doc_id for doc_id, root in roots.items() if root != doc_id}
        drop_ref = ray.put(drop)

        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            dropped = ray.get(drop_ref)
            if not dropped:  # empty list would build a null-typed array
                return batch
            drop_set = pa.array(list(dropped))
            mask = pc.invert(pc.is_in(batch[id_col], value_set=drop_set))
            return batch.filter(pc.fill_null(mask, True))

        return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    # distributed: drop set = propagated labels where lbl != nd; one
    # bucketed LEFT join, keep the unmatched (survivor) rows
    import pyarrow.compute as pc

    from .join import hash_join

    roots_ds = neardup_clusters_distributed(pairs, join_buckets=join_buckets)
    drops = roots_ds.map_batches(
        lambda b: pa.table({"_dropid": b.filter(
            pc.not_equal(b["nd"], b["lbl"]))["nd"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    out_cols = ds.schema().names
    j = hash_join(ds, drops, id_col, "_dropid", buckets=join_buckets,
                  how="left")
    return j.map_batches(
        lambda b: b.filter(pc.is_null(b["_dropid"])).select(out_cols),
        batch_format="pyarrow")


# ------------------------------------------------------------------ simhash
def simhash64(b: bytes, k: int = 5) -> int:
    """64-bit SimHash over k-byte shingles (bit-vote of shingle hashes)."""
    sh = np.unique(_shingle_hashes(b, k))
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int(powers[votes > 0].sum())  # distinct powers — no wraparound


class SimHasher:
    """Batch stage: text → (id, simhash, band columns for Hamming-radius
    bucketing). Splitting 64 bits into ``bands`` blocks guarantees two
    signatures within Hamming distance < bands share ≥ 1 identical block."""

    def __init__(self, text_col: str, id_col: str, bands: int = 4, shingle_k: int = 5):
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].cast(pa.binary()).to_pylist()
        n = len(texts)
        width = 64 // self.bands
        mask = np.uint64((1 << width) - 1)
        # per-doc signature loop is inherent; packing is batch-level numpy
        hs = np.array([simhash64(b or b"", self.k) for b in texts], np.uint64)
        shifts = (np.arange(self.bands, dtype=np.uint64) * np.uint64(width))
        band_vals = ((hs[:, None] >> shifts[None, :]) & mask).reshape(-1)
        signed = np.repeat((hs - np.uint64(1 << 63)).view(np.int64), self.bands)
        ids_rep = batch[self.id_col].take(
            pa.array(np.repeat(np.arange(n), self.bands)))
        return pa.table({
            self.id_col: ids_rep,
            "simhash": pa.array(signed, pa.int64()),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_val": pa.array(band_vals.astype(np.int64), pa.int64()),
        })


def simhash_dedup_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3,
                        bands: int = 4, shingle_k: int = 5, max_bucket: int = 64,
                        metrics_dir: str | None = None):
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming (requires
    max_hamming < bands for the band-bucket guarantee)."""
    assert max_hamming < bands
    def _hash_batch(batch: pa.Table) -> pa.Table:
        return SimHasher(text_col, id_col, bands=bands, shingle_k=shingle_k)(batch)

    rows = ds.map_batches(_hash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        recs = sorted(zip(group[id_col].to_pylist(), group["simhash"].to_pylist()))
        out_a, out_b, out_d = [], [], []
        if len(recs) > max_bucket:
            _log_dropped_bucket(
                metrics_dir, "simhash",
                (int(group["band_id"][0].as_py()), int(group["band_val"][0].as_py())),
                len(recs), max_bucket)
        if 2 <= len(recs) <= max_bucket:
            seen = set()
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    (ia, ha), (ib, hb) = recs[i], recs[j]
                    if ia == ib or (ia, ib) in seen:
                        continue
                    seen.add((ia, ib))
                    d = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
                    if d <= max_hamming:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_d.append(d)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    pairs = rows.groupby(["band_id", "band_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    return _distinct_pairs(pairs, extra="hamming")


# ------------------------------------------------------------------ embeddings
def embedding_neardup_pairs(ds, vec_col: str, id_col: str, threshold: float = 0.95,
                            mode: str = "auto",
                            exact_limit_bytes: int = 64 << 20,
                            bands: int = 24, planes_per_band: int = 3,
                            seed: int = 7, max_bucket: int = 4096,
                            join_buckets: int = 16,
                            metrics_dir: str | None = None):
    """Cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    ``mode``:
      - "lsh" (scale path; chosen by "auto" for unknown/large inputs):
        banded random-hyperplane LSH. Each row emits one NARROW
        (band_id, bucket, id) row per band — the embedding column never
        enters the LSH shuffle (≈ bands×16 B per row, not bands×vec bytes);
        groupby((band_id, bucket)) co-locates likely neighbors and emits
        candidate id pairs; band-level duplicates collapse with one
        vectorized distinct; vectors re-attach per candidate via two
        bucketed hash joins (join.hash_join) and exact cosine runs rowwise
        inside the join output. No stage ever sees more than one bucket —
        the corpus never materializes anywhere.
        Recall = 1-(1-s^p)^L for per-plane collision prob
        s = 1-acos(cos)/π (p=planes_per_band, L=bands); validated ≥0.95 vs
        the exact path in tests/test_extras.py.
      - "exact": per-batch matmul against the full broadcast normalized
        matrix (one ray.put) — exact answer, O(n²), input must fit the
        object store; only reachable via an explicit size check or opt-in.
    """
    if mode == "auto":
        mode = "exact" if _dataset_small_enough(ds, exact_limit_bytes) else "lsh"
    if mode == "exact":
        return _embedding_pairs_exact(ds, vec_col, id_col, threshold)
    return _embedding_pairs_lsh(ds, vec_col, id_col, threshold, bands,
                                planes_per_band, seed, max_bucket,
                                join_buckets, metrics_dir)


def _embedding_pairs_exact(ds, vec_col: str, id_col: str, threshold: float):
    import ray

    tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = tbl[id_col].to_numpy()
    mat = np.stack(tbl[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self, ref, tau):
            self.ids, self.mat = ray.get(ref)
            self.tau = tau

        def __call__(self, batch: pa.Table) -> pa.Table:
            b_ids = _to_numpy(batch[id_col])
            b_mat = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
            b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-12)
            sims = b_mat @ self.mat.T
            rows, cols = np.nonzero(sims >= self.tau)
            keep = b_ids[rows] < self.ids[cols]  # dedupe + drop self-pairs
            return pa.table({
                "id_a": pa.array(b_ids[rows][keep], pa.int64()),
                "id_b": pa.array(self.ids[cols][keep], pa.int64()),
                "cosine": pa.array(sims[rows, cols][keep], pa.float64()),
            })

    def find_pairs(batch: pa.Table) -> pa.Table:
        return PairFinder(ref, threshold)(batch)

    return ds.map_batches(find_pairs, batch_format="pyarrow", zero_copy_batch=True)


def _embedding_pairs_lsh(ds, vec_col: str, id_col: str, threshold: float,
                         bands: int, planes_per_band: int, seed: int,
                         max_bucket: int, join_buckets: int,
                         metrics_dir: str | None):
    """Banded hyperplane-LSH near-dup: the MinHash-LSH shape applied to
    embeddings. LSH shuffle volume = bands × ~16 B per row (band_id,
    bucket, id — the vector column stays out of the wide exchange); the
    vectors travel exactly twice, through the two candidate-verify joins.
    Tune `bands` down / `planes_per_band` up as the threshold rises (higher
    cosine → higher per-plane collision prob → fewer bands needed)."""
    from .join import hash_join

    class BandSigner:
        """Batch stage: emit one (band_id, bucket, id) row per band per
        input row. Hyperplanes are seeded → identical on every worker."""

        def __init__(self, dim: int):
            rng = np.random.default_rng(seed)
            # (bands, planes_per_band, dim) — one independent signature set
            # per band
            self.h = rng.standard_normal((bands, planes_per_band, dim))
            self.weights = (1 << np.arange(planes_per_band)).astype(np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = _to_numpy(batch[id_col])
            mat = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            n = len(ids)
            # bits: (bands, n, planes) → bucket ids (bands, n)
            bits = (np.einsum("bpd,nd->bnp", self.h, mat) > 0).astype(np.int64)
            buckets = bits @ self.weights
            band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
            return pa.table({
                "band_id": pa.array(band_ids),
                "bucket": pa.array(buckets.reshape(-1), pa.int64()),
                id_col: pa.array(np.tile(ids, bands), pa.int64()),
            })

    def sign(batch: pa.Table) -> pa.Table:
        return BandSigner(len(batch[vec_col][0]))(batch)

    signed = ds.map_batches(sign, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        n = len(group)
        if n < 2:
            return empty
        if n > max_bucket:
            _log_dropped_bucket(
                metrics_dir, "embedding",
                (int(group["band_id"][0].as_py()), int(group["bucket"][0].as_py())),
                n, max_bucket)
            return empty
        ids = np.sort(_to_numpy(group[id_col]))
        iu, ju = np.triu_indices(n, k=1)
        return pa.table({
            "id_a": pa.array(ids[iu], pa.int64()),
            "id_b": pa.array(ids[ju], pa.int64()),
        })

    candidates = signed.groupby(["band_id", "bucket"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    # a candidate surfaces in every colliding band — keep one copy
    uniq = _distinct_pairs(candidates)

    # verify: re-attach the two vectors via two bucketed joins, rowwise
    # exact cosine inside the join output (the minhash verify shape).
    # Vectors travel the joins as fixed-size binary (normalized float64
    # bytes): list/tensor columns don't survive the joins' pandas
    # round-trip (Ray re-infers them as its tensor extension type, which
    # fails on sliced group blocks), and the binary form packs/unpacks
    # with zero per-row Python work.
    def pack(suffix: str):
        def fn(b: pa.Table) -> pa.Table:
            mat = np.ascontiguousarray(
                np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float64))
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            width = mat.shape[1] * 8
            vecs = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(width), len(mat), [None, pa.py_buffer(mat.tobytes())])
            return pa.table({f"_j{suffix}": b[id_col],
                             f"_vec_{suffix}": vecs})

        return fn

    corpus = ds.select_columns([id_col, vec_col])
    corp_a = corpus.map_batches(pack("a"), batch_format="pyarrow",
                                zero_copy_batch=True)
    corp_b = corpus.map_batches(pack("b"), batch_format="pyarrow",
                                zero_copy_batch=True)
    j = hash_join(uniq, corp_a, "id_a", "_ja", buckets=join_buckets)
    j = j.drop_columns(["_ja"])
    j = hash_join(j, corp_b, "id_b", "_jb", buckets=join_buckets)

    def _unpack(col: pa.ChunkedArray, n: int) -> np.ndarray:
        return np.frombuffer(b"".join(col.to_pylist()),
                             dtype=np.float64).reshape(n, -1)

    def cosine_verify(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = np.einsum("nd,nd->n", _unpack(batch["_vec_a"], n),
                         _unpack(batch["_vec_b"], n))
        keep = sims >= threshold
        return pa.table({
            "id_a": batch["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": batch["id_b"].combine_chunks().filter(pa.array(keep)),
            "cosine": pa.array(sims[keep], pa.float64()),
        })

    return j.map_batches(cosine_verify, batch_format="pyarrow")


# ------------------------------------------------------------ edit distance
def levenshtein_leq(a: str, b: str, d: int):
    """Exact Levenshtein distance if ≤ d, else None — banded DP, O(len·d)
    cells with an early exit when a whole band row exceeds d. The scalar
    form of batch_levenshtein_leq (which runs the same band across all
    pairs at once); the verify stage dispatches to the batch kernel for
    large candidate batches and keeps this for small ones."""
    la, lb = len(a), len(b)
    if abs(la - lb) > d:
        return None
    if a == b:
        return 0
    big = d + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        cur[0] = i
        lo = max(1, i - d)
        hi = min(lb, i + d)
        best = i if i <= d else big  # column 0 is in the band when i <= d
        ai = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ai == b[j - 1] else 1
            v = prev[j - 1] + cost
            if prev[j] + 1 < v:
                v = prev[j] + 1
            if cur[j - 1] + 1 < v:
                v = cur[j - 1] + 1
            cur[j] = v
            if v < best:
                best = v
        if best > d:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= d else None


def batch_levenshtein_leq(texts_a: list, texts_b: list, d: int) -> np.ndarray:
    """Vectorized levenshtein_leq over aligned string pairs: one banded DP
    (width 2d+1) advanced row-by-row across ALL pairs simultaneously —
    numpy column ops instead of per-pair Python. Returns int64 distances
    with -1 where the scalar kernel returns None (> d). Values saturate at
    d+1 inside the DP, which preserves every ≤ d answer exactly
    (property-tested against levenshtein_leq)."""
    P = len(texts_a)
    out = np.full(P, -1, dtype=np.int64)
    if P == 0:
        return out
    a_s = [(t or "") for t in texts_a]
    b_s = [(t or "") for t in texts_b]
    la = np.array([len(s) for s in a_s], dtype=np.int64)
    lb = np.array([len(s) for s in b_s], dtype=np.int64)
    feasible = np.abs(la - lb) <= d
    # equal strings short-circuit (scalar kernel's a == b branch)
    eq = np.array([x == y for x, y in zip(a_s, b_s)])
    out[eq & feasible] = 0
    todo = np.flatnonzero(feasible & ~eq)
    if not len(todo):
        return out
    a_s = [a_s[i] for i in todo]
    b_s = [b_s[i] for i in todo]
    la_t, lb_t = la[todo], lb[todo]
    n = len(todo)
    lmax_a, lmax_b = int(la_t.max()), int(lb_t.max())
    # codepoint matrices; -1 padding never equals a real codepoint. Built
    # with ONE utf-32 decode of the joined strings + one scatter (utf-32-le
    # is exactly 4 bytes per codepoint, so the join concatenates cleanly)
    def _code_matrix(strs, lens, width):
        m = np.full((n, width), -1, dtype=np.int64)
        total = int(lens.sum())
        if total:
            flat = np.frombuffer("".join(strs).encode("utf-32-le"),
                                 dtype=np.uint32).astype(np.int64)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
            cols = np.arange(total, dtype=np.int64) - starts[rows]
            m[rows, cols] = flat
        return m

    a_m = _code_matrix(a_s, la_t, lmax_a + 1)
    b_m = _code_matrix(b_s, lb_t, lmax_b + d + 2)

    big = d + 1
    W = 2 * d + 1
    ans = np.full(n, big, dtype=np.int64)
    o_arr = np.arange(-d, d + 1, dtype=np.int64)         # band offsets
    t_arr = np.arange(W, dtype=np.int64)
    # b padded with d leading sentinel columns so the per-row band slice
    # b_pad[:, i-1 : i-1+W] is a contiguous view covering j-1 = i+o-1
    b_pad = np.full((n, lmax_b + 2 * d + 2), -1, dtype=np.int64)
    b_pad[:, d:d + b_m.shape[1]] = b_m
    # band[:, t] = dp value at (i, j=i+o), o = t-d
    band = np.full((n, W), big, dtype=np.int64)
    for t in range(d, W):          # row 0: dp[0, j] = j for j in [0, d]
        j = t - d
        band[:, t] = np.where(j <= lb_t, min(j, big), big)
    done0 = la_t == 0
    if done0.any():                # answer read at (la, lb)
        ans[done0] = band[done0, d + lb_t[done0]]
    active_rows = int(la_t.max())
    live = np.arange(n, dtype=np.int64)   # row → index into ans
    for i in range(1, active_rows + 1):
        ai = a_m[:, i - 1]
        j_row = i + o_arr                                 # (W,)
        b_slice = b_pad[:, i - 1:i - 1 + W]               # (n, W) view
        # substitution + deletion, whole band at once
        v = band + (ai[:, None] != b_slice)
        v[:, :-1] = np.minimum(v[:, :-1], band[:, 1:] + 1)
        # cell validity: 1 ≤ j ≤ lb and i ≤ la; invalid cells pin to big
        valid = ((j_row[None, :] >= 1) & (j_row[None, :] <= lb_t[:, None])
                 & (i <= la_t)[:, None])
        v = np.where(valid, np.minimum(v, big), big)
        if i <= d:                                        # j == 0 column
            v[:, d - i] = np.where(i <= la_t, min(i, big), big)
        # insertion chain new[t] = min(v[t], new[t-1]+1) as a prefix scan:
        # new[t] = t + accmin(v - t) — one accumulate instead of W passes
        chain = np.minimum.accumulate(v - t_arr[None, :], axis=1)
        band = np.minimum(np.minimum(v, chain + t_arr[None, :]), big)
        done = la_t == i
        if done.any():
            ans[live[done]] = band[done, d + (lb_t - la_t)[done]]
        # drop finished rows and rows whose band minimum already exceeds d
        # (band minima are non-decreasing in i — they can never come back
        # under the threshold); this is the scalar kernel's early exit,
        # vectorized: the working set shrinks as answers resolve
        keep = (la_t > i) & (band.min(axis=1) <= d)
        if not keep.any():
            break
        if keep.sum() * 2 <= len(live):
            live, la_t, lb_t, band = (live[keep], la_t[keep], lb_t[keep],
                                      band[keep])
            a_m, b_pad = a_m[keep], b_pad[keep]
    out[todo[ans <= d]] = ans[ans <= d]
    return out


def _deletion_variants(s: str, d: int) -> set:
    """s plus every string reachable by ≤ d character deletions (the
    SymSpell neighborhood): lev(a, b) ≤ d  ⇒  the two neighborhoods
    intersect (delete the ≤ d differing alignment positions from each)."""
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        frontier = nxt - out
        out |= nxt
    return out


def editdist_neardup_pairs(ds, text_col: str, id_col: str, max_dist: int = 1,
                           max_bucket: int = 200, join_buckets: int = 16,
                           metrics_dir: str | None = None):
    """Edit-distance similarity join: pairs (id_a < id_b, dist ≤ max_dist)
    by exact Levenshtein — SQL ``JOIN ON levenshtein(a, b) <= d`` without
    the quadratic cross product.

    Blocking is the SymSpell deletion neighborhood: each string emits its
    ≤ max_dist-deletion variants as (variant_hash, id) rows — hashes only,
    never the variant text, so the shuffle carries 16 B × (len·d choose d)
    per row; any pair within distance d shares ≥ 1 variant bucket
    (guaranteed candidate recall). Buckets over ``max_bucket`` are dropped
    AND logged (the minhash/simhash observability contract). Candidates
    dedupe via one vectorized aggregate, texts re-attach via two bucketed
    hash joins, and the banded DP verifies inside the join tasks — nothing
    driver-side. Intended for short key-like strings (names, titles,
    paths); neighborhood size grows ~len^d, so document-length inputs
    should block on a fingerprint instead (minhash path)."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")

    def variant_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        vs: list[str] = []
        vids: list[int] = []
        for t, i in zip(texts, ids):
            for v in _deletion_variants(t or "", max_dist):
                vs.append(v)
                vids.append(i)
        vh = hash64(pa.array(vs, pa.string()), seed=97).astype(np.int64)
        return pa.table({"vh": pa.array(vh),
                         id_col: pa.array(vids, pa.int64())})

    variant_ds = ds.select_columns([id_col, text_col]).map_batches(
        variant_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group[id_col].to_pylist()))
        if len(ids) > max_bucket:
            _log_dropped_bucket(metrics_dir, "editdist",
                                (int(group["vh"][0].as_py()),),
                                len(ids), max_bucket)
        if len(ids) < 2 or len(ids) > max_bucket:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64())})

    candidates = variant_ds.groupby("vh").map_groups(
        bucket_pairs, batch_format="pyarrow")
    uniq_pairs, no_candidates = _empty_pairs_if_schemaless(
        _distinct_pairs(candidates))
    if no_candidates:
        import ray.data as rd

        return rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                       "id_b": pa.array([], pa.int64()),
                                       "dist": pa.array([], pa.int64())}))

    from .join import hash_join

    corpus = ds.select_columns([id_col, text_col])
    corp_a = _rename_cols(corpus, {id_col: "_ja", text_col: "_text_a"})
    corp_b = _rename_cols(corpus, {id_col: "_jb", text_col: "_text_b"})
    j = hash_join(uniq_pairs, corp_a, "id_a", "_ja", buckets=join_buckets)
    j = j.drop_columns(["_ja"])
    j = hash_join(j, corp_b, "id_b", "_jb", buckets=join_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["_text_a"].to_pylist()
        tb = batch["_text_b"].to_pylist()
        if len(ta) >= 64:
            # vectorized band DP (≈5× on the blocked near-match workload)
            dists = batch_levenshtein_leq(ta, tb, max_dist)
        else:
            dists = np.array([
                (-1 if (v := levenshtein_leq(a or "", b or "", max_dist))
                 is None else v) for a, b in zip(ta, tb)], dtype=np.int64)
        keep = dists >= 0
        ix = pa.array(np.flatnonzero(keep))
        return pa.table({"id_a": pc.take(batch["id_a"], ix),
                         "id_b": pc.take(batch["id_b"], ix),
                         "dist": pa.array(dists[keep], pa.int64())})

    return j.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------- exact substring-span dedup
class WindowHasher:
    """Per-batch stage: explode each document into 64-bit rolling hashes of
    every ``window`` consecutive whitespace tokens, distinct per doc —
    the candidate unit of exact substring-level dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": duplicated
    ≥W-token spans across documents).

    Fully vectorized: one regex split per batch (Arrow kernel), per-token
    polynomial fingerprints via the flat-buffer prefix-sum path
    (text._fingerprint_flat), then the window hash as W shifted
    multiply-adds over the flat token-hash array with doc-boundary
    masking. Output rows are (win_hash:int64, doc:id, group cols) — 8 B of
    hash per token through the shuffle, never text."""

    def __init__(self, text_col: str, id_col: str,
                 group_cols: tuple[str, ...] = (), window: int = 8):
        if window < 2:
            raise ValueError("window must be ≥ 2 tokens")
        self.text_col, self.id_col = text_col, id_col
        self.group_cols = tuple(group_cols)
        self.window = window
        # descending powers for the window polynomial (any odd base works;
        # reuse the fingerprint base)
        self.wpow = _powers(window)[:window][::-1].copy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .text import _fingerprint_flat

        W = self.window
        col = batch[self.text_col].combine_chunks()
        # null text must coalesce to "" BEFORE splitting: a null list slot
        # yields a null length, which numpy would carry as NaN → INT64_MIN
        # and silently zero out the whole batch's windows
        col = pc.fill_null(col, "")
        lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(col),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        n_tok = int(lens.sum())
        empty = pa.table(
            {"win_hash": pa.array([], pa.int64()),
             self.id_col: batch[self.id_col].slice(0, 0),
             **{g: batch[g].slice(0, 0) for g in self.group_cols}})
        if n_tok < W:
            return empty
        # per-token fingerprints from the flat token buffer
        # (large_string input ⇒ large flat array with int64 offsets;
        # reading those as int32 would silently hash garbage slices)
        bufs = flat.buffers()
        off_dtype = (np.int64 if pa.types.is_large_string(flat.type)
                     else np.int32)
        offs = np.frombuffer(bufs[1], dtype=off_dtype,
                             count=flat.offset + n_tok + 1)
        rel = offs[flat.offset:].astype(np.int64)
        data = (np.frombuffer(bufs[2], dtype=np.uint8, count=int(offs[-1]))
                if bufs[2] is not None else np.empty(0, np.uint8))
        h = np.empty(n_tok, dtype=np.uint64)
        with np.errstate(over="ignore"):
            _fingerprint_flat(data, rel, h, 0)
            # rolling window hash over the flat array: W shifted mul-adds
            m = n_tok - W + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(W):
                acc += h[j : j + m] * self.wpow[j]
        # a window is valid iff it does not cross a doc boundary
        doc_ix = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        valid = doc_ix[:m] == doc_ix[W - 1 :]
        acc, starts = acc[valid], doc_ix[:m][valid]
        if not len(acc):
            return empty
        # distinct (doc, window) per batch — a doc never spans batches,
        # so downstream Count() == distinct-doc count per window
        order = np.lexsort((acc, starts))
        acc, starts = acc[order], starts[order]
        keep = np.empty(len(acc), dtype=bool)
        keep[0] = True
        keep[1:] = (acc[1:] != acc[:-1]) | (starts[1:] != starts[:-1])
        acc, starts = acc[keep], starts[keep]
        ix = pa.array(starts)
        return pa.table(
            {"win_hash": pa.array(acc.view(np.int64)),
             self.id_col: pc.take(batch[self.id_col], ix),
             **{g: pc.take(batch[g], ix) for g in self.group_cols}})


def substring_dup_stats(ds, text_col: str, id_col: str,
                        group_cols: list[str] | None = None,
                        window: int = 8, min_docs: int = 2,
                        join_buckets: int = 16):
    """Per-group stats of exactly-duplicated ``window``-token spans shared
    by ≥ ``min_docs`` distinct documents: ``n_shared_windows`` (distinct
    duplicated spans) and ``n_docs_affected`` (docs containing at least
    one). The drop/masking action is a trivial follow-up (semi-join docs
    against the affected set); the stats form is what the oracle verifies.

    Scale shape: map-side the text explodes to one (hash, id) row per
    token (distinct per doc) — linear, no text through the shuffle; one
    groupby counts docs per span; affected docs come from an exact
    semi-join of the span rows against the duplicated spans (bucketed,
    join.semi_anti_join) followed by a distinct-doc count. Skew: a span
    shared by millions of docs is one hot groupby key — counts are
    map-side pre-reduced by the per-doc distinct, and the downstream
    state is a counter, not a doc list."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .join import hash_join, semi_anti_join
    from .text import fingerprint64
    from .udaf import ExactDistinct

    group_cols = list(group_cols or [])
    if len(group_cols) != 1:
        raise NotImplementedError("substring_dup_stats takes exactly one "
                                  "group column (fold keys upstream)")
    gcol = group_cols[0]
    # plain-task map (NOT an actor pool): the hasher holds no real state
    # (wpow is 8 multiplies), and this sub-DAG is consumed by two branches
    # below — duplicated actor-pool operators reserve CPUs per pool and
    # can starve the shuffle stages on small hosts
    hasher = WindowHasher(text_col=text_col, id_col=id_col,
                          group_cols=(gcol,), window=window)
    rows = ds.select_columns([id_col, text_col, gcol]).map_batches(
        hasher.__call__, batch_format="pyarrow", zero_copy_batch=True)

    # mix the group into the span key so one int64 column is both the
    # groupby key suffix and the semi-join key
    def with_span_key(b: pa.Table) -> pa.Table:
        k = _to_numpy(b["win_hash"]).view(np.uint64) * np.uint64(
            1099511628211) + fingerprint64(b[gcol])
        return b.append_column("_span_key", pa.array(k.view(np.int64)))

    rows = rows.map_batches(with_span_key, batch_format="pyarrow",
                            zero_copy_batch=True)
    # rows are distinct (doc, window) ⇒ Count == distinct docs per span
    per_span = (rows.select_columns([gcol, "_span_key"])
                .groupby([gcol, "_span_key"])
                .aggregate(Count(alias_name="n_docs")))
    # materialize the duplicated-span set: it is consumed by BOTH branches
    # below, and it is the compressed result (one row per span duplicated
    # ≥ min_docs times — orders of magnitude smaller than the corpus), so
    # pinning it avoids re-running the scan+groupby; the raw span rows are
    # deliberately NOT materialized (they are O(corpus tokens)) — the scan
    # re-executes once per consuming branch instead
    dup = per_span.filter(expr=f"n_docs >= {int(min_docs)}").materialize()

    shared = (dup.groupby(gcol)
              .aggregate(Count(alias_name="n_shared_windows")))

    affected = semi_anti_join(
        rows.select_columns([gcol, id_col, "_span_key"]),
        dup.select_columns(["_span_key"]), "_span_key", "_span_key",
        how="semi", buckets=join_buckets)
    n_aff = (affected.groupby(gcol)
             .aggregate(ExactDistinct(on=id_col,
                                      alias_name="n_docs_affected")))

    def rename_g(b: pa.Table) -> pa.Table:
        return pa.table({"_g2": b[gcol],
                         "n_docs_affected": b["n_docs_affected"]})

    out = hash_join(shared, n_aff.map_batches(rename_g,
                                              batch_format="pyarrow"),
                    gcol, "_g2", buckets=4)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            gcol: b[gcol],
            "n_shared_windows": pc.cast(b["n_shared_windows"], pa.int64()),
            "n_docs_affected": pc.cast(b["n_docs_affected"], pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def ngram_decontaminate(train, evalset, text_col: str, id_col: str,
                        eval_text_col: str, eval_id_col: str,
                        window: int = 8, join_buckets: int = 16):
    """Eval-set decontamination at the N-GRAM level (the form real LLM
    pipelines use — e.g. GPT-3/Gopher style n-gram overlap): a train doc
    is contaminated if it shares ANY verbatim ``window``-token span with
    any eval doc; returns (kept_train_ds, contaminated_ids_ds).

    Distributed shape: both sides explode to (id, win_hash) rows via
    WindowHasher (8 B of hash per token through the shuffle, text never
    leaves the map stage), one exact bucketed semi-join marks contaminated
    train ids, one distinct, one anti-join filters the train set. Compare
    join.semi_anti_join on whole-text keys (q_decontaminated_docs) for the
    verbatim-duplicate-only form."""
    from ray.data.aggregate import Count

    from .join import semi_anti_join

    th = WindowHasher(text_col=text_col, id_col=id_col, group_cols=(),
                      window=window)
    eh = WindowHasher(text_col=eval_text_col, id_col=eval_id_col,
                      group_cols=(), window=window)
    trows = train.select_columns([id_col, text_col]).map_batches(
        th.__call__, batch_format="pyarrow", zero_copy_batch=True)
    erows = evalset.select_columns([eval_id_col, eval_text_col]).map_batches(
        eh.__call__, batch_format="pyarrow", zero_copy_batch=True)

    hits = semi_anti_join(trows, erows.select_columns(["win_hash"]),
                          "win_hash", "win_hash", how="semi",
                          buckets=join_buckets)
    contaminated = (hits.groupby(id_col)
                    .aggregate(Count(alias_name="n_shared_windows")))
    kept = semi_anti_join(
        train, contaminated.select_columns([id_col]), id_col, id_col,
        how="anti", buckets=join_buckets)
    return kept, contaminated
