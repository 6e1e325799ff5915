"""The mergeable sketch kernels (pure numpy, no Ray).

BASELINE.json north_rule: "HLL, count-min, t-digest, KLL, Bloom … as
mergeable UDAFs from scratch" — those five, plus two extension sketches
through the same ABC: Misra–Gries (deterministic heavy hitters) and KMV
(theta-framework distinct counting with set operations). Distributed use
goes through ``verdictray.udaf`` — these kernels have no Ray dependency so
every distributed bug is a plumbing bug, not a math bug (SURVEY.md §7).
"""

from .base import Sketch, merge_sketches
from .bloom import BloomFilter
from .cms import CountMin
from .fused import FusedHashSketch
from .hashing import hash64
from .hll import HyperLogLog
from .kll import KLL
from .kmv import KMV
from .mg import MisraGries
from .tdigest import TDigest

SKETCH_TYPES = {
    "hll": HyperLogLog,
    "cms": CountMin,
    "bloom": BloomFilter,
    "kll": KLL,
    "kmv": KMV,
    "mg": MisraGries,
    "tdigest": TDigest,
}

__all__ = [
    "Sketch",
    "HyperLogLog",
    "CountMin",
    "BloomFilter",
    "KLL",
    "KMV",
    "TDigest",
    "MisraGries",
    "hash64",
    "merge_sketches",
    "SKETCH_TYPES",
]
