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
    # WINDOW TRIAGE round 16 (50 slots). Composition per the r15
    # verdict item 5 + rule (ii), computed mechanically (latest green
    # DRIVER row per name over CORRECTNESS_r01-r15):
    #
    #   (i) 33 of the 37 displaced r10-cohort rows recorded by the
    #       r15 triage as THE r16 queue (agg_approx_count_distinct —
    #       displaced from slot 41 twice — onward, alphabetical);
    #  (ii) the 17 entries whose code/plans/oracles changed in r16:
    #       the 15 IVF-family entries (ANN_CELL_STRIDE_CAP, shipped on
    #       the measured sf10 gate A/B — ANN_INDEX_VERSION 7->8; their
    #       sf0.01 strides sit far under the cap so oracle VALUES and
    #       hashes are byte-identical, which is exactly what the
    #       window certifies), plus dedup_semantic_semdedup
    #       (corpus-derived k-means k, floor-k path) and
    #       ml_kmeans_embeddings (shares the derivation). The other
    #       r16 lifecycle changes (CAS generation commits, tombstone
    #       clear retention, _fp stamps, pins) touch only write paths
    #       and driver-side pointer resolution.
    #
    #   Heavies (the 15 index oracles + the 2 k-means-chain oracles)
    #   are interleaved one per 2 cheap rows, never two adjacent — if
    #   the harness dies mid-window, the starved queue certifies
    #   before the death point.
    #
    #   Displaced to r17 (rule-ii overflow — 4 r10-cohort rows):
    #   topk_global, topk_per_group, window_first_last,
    #   window_range_frame; then the r11 cohort
    #   (agg_grouping_sets, agg_rollup_flag_status, dedup_exact,
    #   dedup_fuzzy_names, dedup_fuzzy_names_symspell,
    #   dedup_incremental_batch, dedup_minhash_lsh,
    #   dedup_ngram_span_duplication, dedup_shingle_jaccard,
    #   dedup_simhash, dedup_span_removal, events_cohort_retention,
    #   events_daily_actives, events_funnel_stages,
    #   events_rolling_distinct_hll, events_sessionize,
    #   events_user_rfm, fn_date_suite, join_asof_purchase_prior_view,
    #   join_range_trailing_shipments, ml_logreg_gd,
    #   multimodal_audio_windows, multimodal_image_decode_resize,
    #   pipeline_ccnet_buckets, prep_chunk_documents,
    #   prep_sequence_packing, prep_source_mixing,
    #   prep_token_budget_head, sim_topk_lsh,
    #   stream_live_join_purchase_views, ...), then the r12 cohort —
    #   plus whatever r17 changes.
    "agg_approx_count_distinct",
    "events_funnel_windowed",
    "sim_index_build",
    "events_pivot_daily_types",
    "events_user_timeline",
    "sim_index_query",
    "events_value_histogram",
    "filter_predicate_suite",
    "sim_index_query_compacted",
    "fn_sql_udf_suite",
    "fn_try_suite",
    "sim_index_query_compacted_incremental",
    "fn_variant_suite",
    "join_asof_tolerance",
    "sim_index_query_deleted",
    "join_salted_skew",
    "layout_zorder_buckets",
    "sim_index_query_filtered",
    "ml_linreg_normal_eq",
    "orders_scd2_priority",
    "sim_index_time_travel",
    "part_unpivot_metrics",
    "prep_curriculum_order",
    "sim_index_generation_diff",
    "prep_temperature_resample",
    "profile_orders_columns",
    "sim_index_append",
    "projection_expressions",
    "q2_min_cost_supplier",
    "sim_index_stats",
    "quality_constraint_checks",
    "quality_daily_volume_anomaly",
    "sim_index_recall_estimate",
    "quality_referential_orphans",
    "quality_snapshot_diff",
    "sim_index_drift_monitor",
    "sample_fraction",
    "sample_hash_reproducible",
    "dedup_online_index_gate",
    "sample_stratified_by_lang",
    "sim_bm25_topk",
    "sim_topk_ivf",
    "sim_label_centroids",
    "stream_live_dedup_summary",
    "sim_topk_ivfpq",
    "subq_in_european_suppliers",
    "subq_orders_above_customer_avg",
    "dedup_semantic_semdedup",
    "subq_scalar_above_avg_price",
    "ml_kmeans_embeddings",
]

_FRONT_R15 = [
    # WINDOW TRIAGE round 15 (50 slots, historical record — went
    # 50/50 green in CORRECTNESS_r15 with the generation-pointer
    # layout). Original triage comment preserved in git history
    # (registry.py @ r15 HEAD).
    "q12_ship_delay_buckets",
    "q13_customer_distribution",
    "sim_index_build",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "sim_index_query",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_bracketed_revenue",
    "sim_index_time_travel",
    "q20_heavy_shippers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "sim_index_append",
    "stream_live_ingest_neardup",
    "stream_tumbling_hourly",
    "text_langid_profile",
    "stream_live_index_append",
    "text_repetition_scores",
    "unpivot_quantities",
    "agg_boolean",
    "sim_index_query_compacted",
    "agg_collect_sets",
    "agg_percentiles",
    "join_anti_inactive_customers",
    "sim_index_query_compacted_incremental",
    "join_cross_region_nation",
    "join_full_outer_nation_activity",
    "join_inner_customer_orders",
    "sim_index_query_deleted",
    "join_left_outer_orders",
    "join_right_outer_lineitem",
    "join_semi_active_customers",
    "sim_index_query_filtered",
    "join_theta_supplier_pairs",
    "multimodal_binary_features",
    "multimodal_frame_sample",
    "sim_index_stats",
    "multimodal_join_docs_embeddings",
    "sim_index_generation_diff",
    "agg_corr_covar",
    "sim_index_drift_monitor",
    "agg_exact_percentiles",
    "agg_median_mode_by_segment",
    "sim_index_recall_estimate",
    "agg_percentile_approx",
    "curation_domain_cap",
    "dedup_online_index_gate",
    "events_attribution_first_last",
]

_FRONT_R13 = [
    # WINDOW TRIAGE round 13 (50 slots, historical record — the r13
    # harness certified only the first 6). Round 12 closed 50/50 green.
    # This window = 1 new entry + every plan round 13 touched + the
    # mart chain (re-certified after the two-phase-distinct A/B kept
    # the plan, BASELINE ledger) + ALL 20 displaced r8-era rows the
    # r12 triage queued (registry history comment below) + the oldest
    # r9-era rows as filler (computed mechanically: latest green
    # driver row per name over CORRECTNESS_r01-r12).
    #
    # (a) 5 new-op slots: OPTIMIZE-then-serve — compact_ann_index
    #     content preservation hash-checked by the driver through the
    #     shared ivfpq oracle (r12 verdict item 3) — serve-after-
    #     takedown-deletes (tombstone merge-on-read; candidate-pred
    #     variant of the same oracle), filtered vector search (v4
    #     attribute column, candidate-pred variant), the recall@k
    #     estimator (ivfpq ∘ bruteforce composition oracle), and the
    #     cell-balance stats rollup (index-table oracle aggregated):
    "sim_index_query_compacted",
    "sim_index_query_deleted",
    "sim_index_query_filtered",
    "sim_index_recall_estimate",
    "sim_index_stats",
    # (a2) index day-2 operations (r13 second pass): the online
    #     near-dup ingestion gate (serve oracle re-targeted onto the
    #     hist/arriving slices) and the cell-distribution drift
    #     monitor (index-table oracle histogrammed + TV-folded):
    "dedup_online_index_gate",
    "sim_index_drift_monitor",
    # (b) 5 plans round 13 changed: the self-contained index family
    #     (sidecar-persisted codebooks; serve re-fetches survivors
    #     from the index table; append/stream load the frozen model
    #     from the hist variant's sidecar) + the shared serve-chain
    #     refactor rippling through sim_topk_ivfpq:
    "sim_index_build",
    "sim_index_query",
    "sim_index_append",
    "stream_live_index_append",
    "sim_topk_ivfpq",
    # (c) the mart chain (r12 verdict item 4: A/B showed Spark already
    #     plans the exact two-phase distinct — no Expand; plan kept,
    #     re-certify the family anyway):
    "mart_daily_revenue",
    "mart_customer_activity",
    "mart_incremental_refresh",
    # (d) the displaced r8-era refresh queue (r12 triage, verdict
    #     item 1 — latest driver row r8):
    "fn_json_suite",
    "fn_math_suite",
    "fn_string_suite",
    "graph_triangle_count",
    "ml_customer_scores",
    "pipeline_corpus_curation",
    "prep_decontaminate",
    "prep_quantize_int8",
    "quality_join_skew_audit",
    "setop_except",
    "setop_intersect_all",
    "setop_union_all",
    "setop_union_distinct",
    "stream_dedup_summary",
    "stream_event_type_rates",
    "stream_funnel_view_purchase",
    "stream_session_30m",
    "stream_sliding_15m",
    "text_bpe_apply",
    "text_bpe_learn_merges",
    # (e) filler: the oldest r9-era rows (alphabetical within the
    #     r9 cohort). Displaced to r14: the r9 rows from
    #     prep_shard_balanced / prep_vocab_topk / q10_returned_items
    #     and q11_part_value_share onward, then the r10 cohort.
    #
    #     R14 TRIAGE (computed at r13 close from CORRECTNESS_r01-r12
    #     latest-green + the r13 window; cohort sizes then r9:26
    #     r10:43 r11:46 r12:45): the 50 oldest =
    #     posexplode_tokens, prep_decontaminate_bloom,
    #     prep_shard_balanced, prep_vocab_topk, the remaining r9 q*
    #     rows (q4, q6-q8, q10-q22), stream_live_ingest_neardup,
    #     stream_tumbling_hourly, text_langid_profile,
    #     text_repetition_scores, unpivot_quantities, then the r10
    #     cohort head (agg_approx_count_distinct .. profile_orders_
    #     columns alphabetically) — plus whatever r14 changes.
    "agg_boolean",
    "agg_collect_sets",
    "agg_percentiles",
    "join_anti_inactive_customers",
    "join_cross_region_nation",
    "join_full_outer_nation_activity",
    "join_inner_customer_orders",
    "join_left_outer_orders",
    "join_right_outer_lineitem",
    "join_semi_active_customers",
    "join_theta_supplier_pairs",
    "ml_segment_zscores",
    "multimodal_binary_features",
    "multimodal_frame_sample",
    "multimodal_join_docs_embeddings",
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
