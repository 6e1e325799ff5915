"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() BEFORE importing this module; nothing below
(nor anything in the verdictray library) calls ray.init()/ray.shutdown().

- entry(): flagship build_sketches pipeline over the deterministic
  synthetic code corpus (BASELINE.json input_hint shape) at sf0.001 scale.
- queries(): one callable per implemented operator/pipeline (SURVEY.md §2).
- oracle_sql(): DuckDB-equivalent SQL for every exact query; approximate
  sketch queries are intentionally omitted (rows-only driver check) and
  bound-asserted against DuckDB in tests/test_e2e.py instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: corpus → sha256 →
    salted two-stage sketch aggregation → estimates table."""
    from verdictray.entry_queries import q_corpus_sketches

    return q_corpus_sketches("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # driver-priority order: the correctness driver caps at the first 50
    # entries per round, so never-yet-driver-checked and newest queries
    # lead (entry_queries.DRIVER_PRIORITY); no entry is dropped
    from verdictray.entry_queries import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from verdictray.entry_queries import ORACLES

    return dict(ORACLES)
