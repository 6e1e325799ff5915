"""Composed corpus-curation pipeline — the end-to-end shape a training-data
user runs over 100 TB: quality filter → exact dedup → near-dup drop.

Each stage is an already-tested operator (text.py / ops.py / dedup.py);
this module only composes them, in the order that minimizes bytes through
each shuffle:

  1. quality filter FIRST (stateless map, no shuffle) — rows that fail the
     cheap heuristics never pay for any downstream shuffle;
  2. exact dedup on content (ops.dedup_exact_narrow) — only (id, 8-byte
     fingerprint) pairs travel; exact dups are usually the bulk of the
     duplicate mass, so removing them first shrinks the MinHash stage;
  3. MinHash+LSH near-dup pairs over the exact-dedup survivors
     (dedup.minhash_dedup_pairs, join-verified — nothing driver-side) and
     dedup.drop_neardups to keep one representative per cluster.

Scale notes: the composition is lazy — one streaming execution end to end
when consumed once. Consumers that need per-stage row counts (the stats
query below) re-execute stage prefixes; at real scale, checkpoint each
stage boundary instead (checkpoint.CheckpointedJob) — counting is then a
metadata read. No stage materializes the corpus on the driver.

No reference implementation exists (/root/reference is empty — SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def quality_filter(ds, text_col: str = "text", min_quality: float = 0.25,
                   max_dup_line_frac: float = 0.9):
    """Drop rows failing the quality heuristics (text.with_quality_features)
    or the Gopher-style line-repetition cap (text.with_line_stats). Pure
    stateless map — the feature columns are computed per batch and NOT kept
    (downstream stages see the input schema unchanged)."""
    from .text import with_line_stats, with_quality_features

    def keep(batch: pa.Table) -> pa.Table:
        feats = with_line_stats(with_quality_features(batch, col=text_col),
                                col=text_col)
        mask = pc.and_(
            pc.greater_equal(feats["quality_score"], pa.scalar(min_quality)),
            pc.less_equal(feats["dup_line_frac"], pa.scalar(max_dup_line_frac)),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def curate_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     min_quality: float = 0.25, max_dup_line_frac: float = 0.9,
                     minhash_threshold: float = 0.5, num_perm: int = 64,
                     bands: int = 8, shingle_k: int = 14,
                     join_buckets: int = 16):
    """Full curation: quality filter → exact dedup → near-dup drop.
    Returns the curated Dataset (input schema, surviving rows)."""
    from .dedup import drop_neardups, minhash_dedup_pairs
    from .ops import dedup_exact_narrow

    filtered = quality_filter(ds, text_col=text_col, min_quality=min_quality,
                              max_dup_line_frac=max_dup_line_frac)
    exact = dedup_exact_narrow(filtered, content_col=text_col, id_col=id_col,
                               join_buckets=join_buckets)
    pairs = minhash_dedup_pairs(exact, text_col, id_col,
                                threshold=minhash_threshold, num_perm=num_perm,
                                bands=bands, shingle_k=shingle_k,
                                verify_mode="join", join_buckets=join_buckets)
    return drop_neardups(exact, pairs, id_col=id_col,
                         join_buckets=join_buckets)


# ----------------------------------------------------------- sequence packing
def pack_sequences(ds, budget: int, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens", buckets: int = 64):
    """Pack documents into training sequences of at most ``budget`` tokens
    (LLM sample packing): first-fit-decreasing within deterministic hash
    buckets, so packing parallelizes bucket-per-task and the assignment is
    invariant to block layout. Returns (id, n_tokens, pack_id, oversize)
    rows — every input doc exactly once; every pack's total ≤ budget
    except single-doc ``oversize`` packs for docs longer than the budget
    (flagged, never silently truncated).

    Scale shape: ONE hash shuffle of (id, n_tokens) — 16 B/doc, text never
    travels; the packer is a per-bucket greedy (bin packing is inherently
    sequential, but each doc's step is one vectorized capacity scan, and
    bucket count × bucket size is tunable). FFD guarantees ≤ 11/9·OPT + 1
    bins per bucket (Johnson 1973); cross-bucket waste is bounded by one
    partial bin per bucket — at 100 TB, buckets ≫ cores keeps every core
    busy and the waste fraction ~buckets·budget/total_tokens ≈ 0.

    pack_id = bucket·2^32 + local index: globally unique without any
    cross-bucket coordination."""
    from .sketches.hashing import hash64

    def tag(b: pa.Table) -> pa.Table:
        bucket = (hash64(b[id_col], seed=31) % np.uint64(buckets)).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            tokens_col: pc.cast(b[tokens_col], pa.int64()),
            "_bucket": pa.array(bucket),
        })

    def pack(group: pa.Table) -> pa.Table:
        bucket = int(group["_bucket"][0].as_py())
        ids = group[id_col].to_numpy(zero_copy_only=False)
        toks = group[tokens_col].to_numpy(zero_copy_only=False)
        # decreasing tokens, id tiebreak → deterministic under any layout
        order = np.lexsort((ids, -toks))
        ids, toks = ids[order], toks[order]
        pack_local = np.empty(len(ids), dtype=np.int64)
        remaining = np.empty(0, dtype=np.int64)  # open bins, index = local id
        for i, t in enumerate(toks):
            fit = np.nonzero(remaining >= t)[0]
            if len(fit):
                j = int(fit[0])  # first fit
                remaining[j] -= t
            else:
                j = len(remaining)
                remaining = np.append(remaining, max(budget - t, 0))
            pack_local[i] = j
        base = bucket << 32
        return pa.table({
            id_col: pa.array(ids),
            tokens_col: pa.array(toks),
            "pack_id": pa.array(pack_local + base),
            "oversize": pa.array(toks > budget),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(pack, batch_format="pyarrow")
