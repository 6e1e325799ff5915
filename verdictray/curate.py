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
