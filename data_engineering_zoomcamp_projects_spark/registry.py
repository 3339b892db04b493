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
    # WINDOW TRIAGE round 9 (50 slots). Round 8 closed with zero stale
    # certifications, so this window is almost entirely group (c)
    # re-certification, oldest official row first (computed
    # mechanically: latest green row per name over CORRECTNESS_r01–r08).
    #
    # (a) 2 new-op slots: SemDeDup semantic dedup (r8 verdict item 4 —
    #     k-means cells + within-cell cosine pruning, llm/dedup.py),
    #     oracle-backed via the shared fixed-point Lloyd chain; and the
    #     CCNet quality-bucketing composite (langid + corpus-LM
    #     perplexity + distributed per-language terciles,
    #     llm/curation.py):
    "dedup_semantic_semdedup",
    "pipeline_ccnet_buckets",
    # (b) 5 changed-plan slots: plans this round rewrites per the r8
    #     verdict (symspell variant-generator A/B, item 5; distributed
    #     Bloom bitset build, item 6) need fresh rows over the NEW
    #     plan; ml_kmeans_embeddings joins them because the shared
    #     Lloyd assignment moved from a one-row-frame crossJoin to
    #     literal centroids (kmeans_cells_expr — the stats-preserving
    #     form the SemDeDup self-join needs):
    "dedup_fuzzy_names_symspell",
    "prep_decontaminate_bloom",
    "ml_kmeans_embeddings",
    #     + text_langid_profile (scoring re-grained from token
    #     instances to (doc, token) types — exact decimal-multiple
    #     equality, 4x on the scoring stage at sf1):
    "text_langid_profile",
    #     + text_repetition_scores (doc-local pass moved from the
    #     interpreted sorted-run HOF fold to one Arrow batch — 10x at
    #     sf1, still zero-exchange; integers-only cross Python):
    "text_repetition_scores",
    # (c) 43 re-certification slots, oldest round first (2 + 5 + 43 =
    #     the 50-slot window; (c) started at 48 and yielded five slots
    #     to the round's plan rewrites as they landed).
    #     The 8 r1-era joins (operators/joins.py — last official rows
    #     are round 1):
    "join_anti_inactive_customers",
    "join_cross_region_nation",
    "join_full_outer_nation_activity",
    "join_inner_customer_orders",
    "join_left_outer_orders",
    "join_right_outer_lineitem",
    "join_semi_active_customers",
    "join_theta_supplier_pairs",
    #     The 13 r2-era rows (agg/mart/tpch/unpivot; ml_segment_zscores
    #     is rows-only by design — it re-certifies as a rows-only row):
    "agg_boolean",
    "agg_collect_sets",
    "agg_percentiles",
    "mart_customer_activity",
    "mart_daily_revenue",
    "ml_segment_zscores",
    "posexplode_tokens",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_idle_rich_customers",
    "q7_volume_shipping",
    "unpivot_quantities",
    #     The 15 r3-era rows (the tpch_full batch + the tumbling-window
    #     batch-parity entry; q1_native_double is rows-only by design):
    "q10_returned_items",
    "q11_part_value_share",
    "q12_ship_delay_buckets",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q19_bracketed_revenue",
    "q1_native_double",
    "q20_heavy_shippers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "stream_tumbling_hourly",
    #     4 of the 17 r4-era rows (alphabetical; the remaining thirteen
    #     — events_value_histogram, filter_predicate_suite,
    #     projection_expressions, sample_hash_reproducible,
    #     sample_stratified_by_lang, sim_label_centroids,
    #     subq_in_european_suppliers, subq_orders_above_customer_avg,
    #     subq_scalar_above_avg_price, topk_global, topk_per_group,
    #     window_first_last, window_range_frame — are the oldest
    #     candidates for round 10):
    "multimodal_binary_features",
    "multimodal_frame_sample",
    "multimodal_join_docs_embeddings",
    "prep_vocab_topk",
    #     + the round-9 late additions (new ops, need their first rows;
    #     displaced projection_expressions, events_value_histogram and
    #     filter_predicate_suite to round 10):
    "multimodal_image_resize",
    "stream_live_ingest_neardup",
    "prep_shard_balanced",
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
