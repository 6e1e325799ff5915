"""verdictray — a Ray-Data-native approximate-aggregation (sketch) engine.

Built from scratch against the contract in BASELINE.json (the reference
tree at /root/reference is empty — SURVEY.md §0 records the evidence):
five mergeable sketch UDAFs (HyperLogLog, Count-Min, t-digest, KLL, Bloom)
over Parquet corpora, expressed Ray-Data-first (Dataset → map_batches over
zero-copy Arrow → groupby().aggregate with salted two-stage merges),
with per-partition checkpointing, lineage metrics, and error-bound
verification against exact oracles.

Library code NEVER calls ray.init()/ray.shutdown() — sessions are owned by
the driver, bench.py, or the test fixture (driver contract,
__ray_entry__.py).
"""

from .sketches import (
    SKETCH_TYPES,
    BloomFilter,
    CountMin,
    HyperLogLog,
    KLL,
    Sketch,
    TDigest,
    hash64,
    merge_sketches,
)

__version__ = "0.1.0"

__all__ = [
    "Sketch",
    "HyperLogLog",
    "CountMin",
    "BloomFilter",
    "KLL",
    "TDigest",
    "hash64",
    "merge_sketches",
    "SKETCH_TYPES",
    "__version__",
]
