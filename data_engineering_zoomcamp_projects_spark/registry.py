"""Central registry: collects QUERIES/ORACLES dicts from every operator
module into the flat dicts the driver contract (__spark_entry__.py)
exposes. Each module keeps its own pair so coverage stays reviewable
per domain (SURVEY.md §2 parts A/B/C)."""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

#: module path (relative to this package) -> description
#:
#: Ordering note: the correctness driver verifies registry entries in
#: insertion order with a bounded window (50 per round). Round 1
#: certified the classic-operator modules, round 2 the streaming/llm
#: half, round 3 the round-2 additions (tpch_full/scrub/analytics).
#: The round-4 window front-loads (a) the two queries the first three
#: rotations orphaned (operators.subqueries: filter_predicate_suite,
#: projection_expressions — the only oracle-backed names with no
#: official driver row), and (b) every module whose plans changed in
#: round 4 (distrank re-plans in windows/analytics/preparation/scrub/
#: textstats; rows-only→oracle upgrades in similarity/dedup/
#: multimodal) so the re-planned queries get fresh driver rows. Query
#: NAMES are stable; only the iteration order changes between rounds.
#: tests/test_certification.py asserts no name is ever orphaned again.
_MODULES = [
    # round-4 window (first ~50 entries)
    "operators.subqueries",
    "operators.windows",
    "operators.analytics",
    "llm.preparation",
    "llm.scrub",
    "llm.textstats",
    "llm.similarity",
    "llm.multimodal",
    "llm.dedup",
    # driver-certified in earlier rounds (r01/r02/r03), unchanged
    "operators.tpch_full",
    "streaming.batch_parity",
    "operators.extras",
    "operators.tpch_plus",
    "llm.curation",
    "transform",
    "ml",
    "operators.relational",
    "operators.joins",
    "operators.aggregates",
    "operators.setops",
    "operators.scalars",
]


def _collect(attr: str) -> dict:
    out: dict = {}
    for mod_name in _MODULES:
        mod = import_module(f"{__package__}.{mod_name}")
        part = getattr(mod, attr, {})
        dup = set(out) & set(part)
        if dup:
            raise ValueError(f"duplicate query names {dup} in {mod_name}")
        out.update(part)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect("QUERIES")


def all_oracles() -> dict[str, str]:
    return _collect("ORACLES")
