"""Similarity search over an embedding column (list<float>).

- ``ann_brute_force``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix (ray.put once, read zero-copy in every task),
  per-batch top-k candidates, final exact merge of the tiny candidate set.
  The correctness baseline.
- ``ann_lsh``: random-hyperplane LSH buckets — signatures computed per
  batch, probe restricted to the query's bucket (multi-probe over nearby
  buckets for recall). The scale path: at 10^12 rows the bucket groupby
  shuffles only (bucket, id, vec) for bucketed rows and each query touches
  a tiny fraction of the corpus.

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches.hashing import _to_numpy


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def ann_brute_force(ds, queries: np.ndarray, query_ids: np.ndarray,
                    vec_col: str, id_col: str, k: int = 10,
                    exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k per query → (query_id, neighbor_id, rank, cosine).

    Distributed end-to-end: each batch emits its local top-k per query
    (k × n_queries candidate rows per batch), then a groupby(query_id)
    map_groups reduce keeps each query's exact global top-k — candidate
    volume PER TASK is bounded by k (never by block count; the r3 version
    pulled batches × queries × k rows to the driver). Only the final
    n_queries × k result rows reach the driver."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((np.asarray(query_ids), q))

    class LocalTopK:
        def __init__(self, ref, k):
            self.q_ids, self.q = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = _to_numpy(batch[id_col])
            mat = _normalize(np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64))
            sims = self.q @ mat.T  # (n_q, n_batch)
            kk = min(self.k + (1 if exclude_self else 0), sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q, out_n, out_s = [], [], []
            for qi in range(sims.shape[0]):
                out_q.extend([int(self.q_ids[qi])] * kk)
                out_n.extend(ids[top[qi]].tolist())
                out_s.extend(sims[qi, top[qi]].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "cosine": pa.array(out_s, pa.float64())})

    cand = ds.map_batches(
        lambda b: LocalTopK(q_ref, k)(b),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    import pandas as pd

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        if exclude_self:
            g = g[g.neighbor_id != qid]
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": np.full(len(g), qid, dtype=np.int64),
            "neighbor_id": g.neighbor_id.to_numpy(dtype=np.int64),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "cosine": g.cosine.to_numpy(dtype=np.float64),
        })

    # exact distributed reduce: one shuffle of (batches × n_q × k)
    # candidate rows, each reduce task holding ONE query's candidates
    reduced = cand.groupby("query_id").map_groups(topk_group,
                                                  batch_format="pandas")
    out = reduced.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(out, preserve_index=False)


class HyperplaneSigner:
    """Batch stage: embedding → LSH bucket id from `planes` random
    hyperplanes (seeded, identical on every worker)."""

    def __init__(self, vec_col: str, dim: int, planes: int = 12, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((planes, dim))
        self.vec_col = vec_col

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.h.T) > 0
        return (bits.astype(np.int64) << np.arange(self.h.shape[0])).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(np.stack(batch[self.vec_col].to_pandas().to_numpy()).astype(np.float64))
        return batch.append_column("_bucket", pa.array(self.bucket_of(mat), pa.int64()))


def _kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 10,
                seed: int = 11) -> np.ndarray:
    """Seeded Lloyd k-means on a (normalized) sample — the IVF coarse
    quantizer. Deterministic: k-means++-lite init off a seeded rng,
    fixed iteration count, empty clusters re-seeded from the farthest
    points. Pure numpy; the sample is small (driver-side by design)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cents = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        sims = sample @ cents.T                       # cosine on normalized rows
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 1e-12:
                    cents[c] = v / norm
            else:  # re-seed an empty cluster from the worst-served point
                far = sims.max(axis=1).argmin()
                cents[c] = sample[far]
    return cents


def build_ivf_centroids(ds, vec_col: str, n_centroids: int = 64,
                        sample_rate: float = 0.1, max_sample: int = 50_000,
                        seed: int = 11) -> np.ndarray:
    """Train the IVF coarse quantizer from a deterministic hash-sample of
    the corpus (one pruned streaming pass; only the sampled vectors reach
    the driver — bounded by max_sample)."""
    # deterministic stride sample per block — id-free and reproducible
    # given the same fragments
    step = max(1, int(round(1.0 / max(sample_rate, 1e-6))))

    def pick(b: pa.Table) -> pa.Table:
        return b.take(np.arange(0, len(b), step, dtype=np.int64))

    sampled = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True) \
        .limit(max_sample).to_pandas()
    mat = _normalize(np.stack(sampled[vec_col].to_numpy()).astype(np.float64))
    return _kmeans_fit(mat, n_centroids, seed=seed)


def ann_ivf(ds, queries: np.ndarray, query_ids: np.ndarray, vec_col: str,
            id_col: str, k: int = 10, n_centroids: int = 64, nprobe: int = 8,
            centroids: np.ndarray | None = None, seed: int = 11) -> pa.Table:
    """IVF approximate top-k: train/take a coarse quantizer, keep only rows
    whose nearest centroid is among each query's ``nprobe`` closest
    centroids, brute-force the survivors. The at-scale layout partitions
    the corpus by centroid id once (groupby) and probes only those
    partitions' files; here the filter composes with the same streaming
    read. Recall vs ann_brute_force is asserted in tests."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    if centroids is None:
        centroids = build_ivf_centroids(ds, vec_col, n_centroids=n_centroids,
                                        seed=seed)
    probe_arr = pa.array(_probe_cells(centroids, q, nprobe), pa.int64())
    cent_ref = centroids  # small (n_centroids × dim) — ships in the closure

    def assign_and_filter(b: pa.Table) -> pa.Table:
        mat = _normalize(np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float64))
        nearest = (mat @ cent_ref.T).argmax(axis=1).astype(np.int64)
        b = b.append_column("_centroid", pa.array(nearest, pa.int64()))
        return b.filter(pa.compute.is_in(b["_centroid"], value_set=probe_arr))

    filtered = ds.map_batches(assign_and_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
    return ann_brute_force(filtered, q, np.asarray(query_ids), vec_col, id_col, k=k)


def _probe_cells(centroids: np.ndarray, q: np.ndarray, nprobe: int) -> list[int]:
    """Union of each (normalized) query's nprobe closest centroid ids."""
    sims = q @ centroids.T
    npb = min(nprobe, len(centroids))
    cells: set[int] = set()
    for row in np.argpartition(-sims, npb - 1, axis=1)[:, :npb]:
        cells.update(int(c) for c in row)
    return sorted(cells)


def build_ivf_index(ds, out_dir: str, vec_col: str, n_centroids: int = 64,
                    centroids: np.ndarray | None = None,
                    seed: int = 11) -> np.ndarray:
    """Write the corpus hive-partitioned by nearest-centroid id
    (``ivf_cell=<c>/``) + the centroid matrix — the at-scale IVF layout
    where ``nprobe`` prunes I/O, not just compute: a probe run opens only
    the matching partition directories, reading nprobe/n_centroids of the
    files instead of scanning every row to filter compute-side (the
    ann_ivf path). One streaming write; partitioned output doubles as the
    resumable layout (one directory per cell)."""
    import os

    if centroids is None:
        centroids = build_ivf_centroids(ds, vec_col, n_centroids=n_centroids,
                                        seed=seed)
    cent = centroids

    def assign(b: pa.Table) -> pa.Table:
        mat = _normalize(np.stack(b[vec_col].to_pandas().to_numpy()).astype(np.float64))
        nearest = (mat @ cent.T).argmax(axis=1).astype(np.int64)
        return b.append_column("ivf_cell", pa.array(nearest, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(out_dir, partition_cols=["ivf_cell"])
    np.save(os.path.join(out_dir, "_centroids.npy"), centroids)
    return centroids


def ann_ivf_indexed(index_dir: str, queries: np.ndarray, query_ids: np.ndarray,
                    vec_col: str, id_col: str, k: int = 10,
                    nprobe: int = 8) -> pa.Table:
    """IVF top-k over a ``build_ivf_index`` layout: read ONLY the probed
    cells' partition directories (I/O pruning), brute-force the survivors.
    Row-identical to ``ann_ivf`` with the same centroids/nprobe — the same
    probe-union of cells reaches the same exact merge."""
    import os

    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    cells = _probe_cells(centroids, q, nprobe)
    paths = []  # expand probed cell dirs to files (read_parquet takes files in list form)
    for c in cells:
        d = os.path.join(index_dir, f"ivf_cell={c}")
        if os.path.isdir(d):
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])
    return ann_brute_force(ds, q, np.asarray(query_ids), vec_col, id_col, k=k)


def ann_lsh(ds, queries: np.ndarray, query_ids: np.ndarray, vec_col: str,
            id_col: str, k: int = 10, planes: int = 8, dim: int | None = None,
            multiprobe: int = 1) -> pa.Table:
    """Approximate cosine top-k: search only rows whose hyperplane bucket
    is within `multiprobe` bit-flips of the query's bucket. Recall is
    validated against ann_brute_force in tests."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    if dim is None:
        dim = q.shape[1]
    signer = HyperplaneSigner(vec_col, dim=dim, planes=planes)
    q_buckets = signer.bucket_of(q)
    from itertools import combinations

    probe: set[int] = set()
    for b in q_buckets.tolist():
        probe.add(b)
        for r in range(1, multiprobe + 1):
            for bits in combinations(range(planes), r):
                flipped = b
                for i in bits:
                    flipped ^= 1 << i
                probe.add(flipped)

    signed = ds.map_batches(
        lambda b: HyperplaneSigner(vec_col, dim=dim, planes=planes)(b),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    probe_arr = pa.array(sorted(probe), pa.int64())
    filtered = signed.map_batches(
        lambda b: b.filter(pa.compute.is_in(b["_bucket"], value_set=probe_arr)),
        batch_format="pyarrow",
    )
    return ann_brute_force(filtered, q, np.asarray(query_ids), vec_col, id_col, k=k)
