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
#: certified the classic-operator modules (relational .. subqueries),
#: round 2 the streaming/llm/extras/tpch_plus/multimodal/curation/
#: preparation/transform/ml half. The round-2 ADDITIONS (tpch_full,
#: scrub, analytics — 29 entries) had no driver row yet, so for round 3
#: they move to the FRONT so the window certifies them. Query NAMES are
#: stable; only the iteration order changes between rounds.
_MODULES = [
    # round-3 window: the previously driver-uncertified round-2 additions
    "operators.tpch_full",
    "llm.scrub",
    "operators.analytics",
    # round-2 window (driver-certified in CORRECTNESS_r02.json)
    "streaming.batch_parity",
    "llm.dedup",
    "llm.similarity",
    "llm.textstats",
    "operators.extras",
    "operators.tpch_plus",
    "llm.multimodal",
    "llm.curation",
    "llm.preparation",
    "transform",
    "ml",
    # round-1 window (driver-certified in CORRECTNESS_r01.json)
    "operators.relational",
    "operators.joins",
    "operators.aggregates",
    "operators.windows",
    "operators.setops",
    "operators.scalars",
    "operators.subqueries",
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
