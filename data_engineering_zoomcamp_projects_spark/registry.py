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
    # round-6 window bulk (after _FRONT): the dedup/LSH family whose
    # plans changed in r4–r6 comes first so its *siblings* also get a
    # fresh pass, then the TPC-H family whose official rows are the
    # oldest (r1–r3)
    "llm.dedup",
    "llm.similarity",
    "llm.curation",
    "llm.graph",
    "transform",
    "operators.tpch_full",
    "operators.tpch_plus",
    "operators.relational",
    "operators.joins",
    "operators.warehouse",
    "operators.quality",
    # driver-certified in earlier rounds, unchanged
    "operators.subqueries",
    "operators.windows",
    "operators.analytics",
    "llm.preparation",
    "llm.scrub",
    "llm.textstats",
    "llm.multimodal",
    "operators.extras",
    "streaming.batch_parity",
    "ml",
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
    # WINDOW TRIAGE round 6 (50 slots): first the six plans whose shape
    # changed in r4–r6 while their green driver rows predate the change
    # (the round-5 verdict's #1 item — every other oracle-backed entry
    # has a driver row over its CURRENT plan); dedup_embedding_cosine
    # is additionally re-planned THIS round (corpus-adaptive banding).
    "dedup_minhash_lsh",
    "dedup_shingle_jaccard",
    "dedup_cluster_components",
    "pipeline_corpus_curation",
    "dedup_embedding_cosine",
    "events_funnel_stages",
    # then the five round-5 held-outs, promoted into all_oracles() this
    # round (oracles were already written + pytest-pinned at both SFs)
    "multimodal_audio_windows",
    "quality_distribution_drift",
    "text_pretokenize_bpe_style",
    "sample_importance_weighted",
    "events_rolling_distinct_hll",
    # remaining 39 slots: re-certification rotation, oldest official
    # rows first (r1/r2 families untouched since — names stable)
    "dedup_exact",
    "dedup_simhash",
    "dedup_fuzzy_names_symspell",
    "sim_topk_bruteforce",
    "text_tfidf_top_terms",
    "text_token_counting",
    "text_langid_profile",
    "text_quality_scores",
    "text_fingerprints",
    "text_corpus_rollup",
    "text_lexicon_score",
    "text_redact_sensitive",
    "text_repetition_scores",
    "dedup_fuzzy_names",
    "prep_decontaminate",
    "prep_sequence_packing",
    "prep_chunk_documents",
    "prep_source_mixing",
    "prep_train_test_split",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "events_cohort_retention",
    "events_user_rfm",
    "events_daily_actives",
    "events_sessionize",
    "timeseries_daily_gapfill",
    "window_rank_functions",
    "window_lag_lead",
    "window_running_sum",
    "window_moving_average",
    "join_asof_purchase_prior_view",
    "join_range_trailing_shipments",
    "agg_rollup_flag_status",
    "agg_grouping_sets",
    "setop_intersect",
    "subq_exists_multi_order_days",
    "fn_date_suite",
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
