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
#: Query NAMES are stable; only the iteration order changes between
#: rounds. tests/test_certification.py asserts no oracle-backed name
#: can fall outside every round's window.
_MODULES = [
    # round-4 window bulk (after _FRONT): modules whose plans changed
    # this round, so their untouched siblings get fresh rows too
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
    "operators.extras",
    "operators.tpch_full",
    "streaming.batch_parity",
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

#: Names hoisted to the very head of the iteration order — the queries
#: that NEED a driver row this round (never certified, plan re-designed,
#: or oracle newly added), regardless of which module they live in. The
#: remaining window slots fill from _MODULES order above. Update this
#: list each round alongside the module rotation.
_FRONT = [
    # orphaned by the r1-r3 rotations (never driver-certified)
    "filter_predicate_suite",
    "projection_expressions",
    # plans re-designed in round 4
    "q1_pricing_summary",
    "window_rank_functions",
    "events_user_rfm",
    "prep_sequence_packing",
    "prep_source_mixing",
    "text_langid_profile",
    # rows-only -> full oracle upgrades in round 4
    "dedup_simhash",
    "multimodal_binary_features",
    "multimodal_frame_sample",
    # new in round 4
    "sample_hash_reproducible",
    "events_sessionize",
    "sample_stratified_by_lang",
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
    out = _collect("QUERIES")
    missing = [n for n in _FRONT if n not in out]
    if missing:
        raise ValueError(f"_FRONT names not in any module: {missing}")
    front = {n: out[n] for n in _FRONT}
    return front | {n: f for n, f in out.items() if n not in front}


def all_oracles() -> dict[str, str]:
    return _collect("ORACLES")
