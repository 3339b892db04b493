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
    # WINDOW TRIAGE round 10 (50 slots). Round 9 closed 48/50 full
    # green + 2 rows-only-by-design; the window is one changed plan +
    # oldest-official-row re-certification (computed mechanically:
    # latest green row per name over CORRECTNESS_r01–r09).
    #
    # (a) 1 changed-plan slot: q2 rewritten per the r9 verdict item 1 —
    #     the (l_partkey, l_suppkey) unit-price aggregate now semi-joins
    #     lineitem against the broadcast filtered part keys BEFORE the
    #     groupBy (the q20 pattern; measured 3.0x at sf0.1, output
    #     byte-identical, oracle unchanged):
    "q2_min_cost_supplier",
    # (a') 3 new-op slots: the PNG encode->decode->resize pipeline that
    #     certifies the decode_image codec (r9 verdict item 4; the
    #     lossless roundtrip shares the resize oracle verbatim), BM25
    #     lexical retrieval (the keyword twin of the embedding top-k
    #     family), and the RefinedWeb per-domain document cap:
    "multimodal_image_decode_resize",
    "sim_bm25_topk",
    "curation_domain_cap",
    #     + the character-entropy quality signal (Gopher-family cheap
    #     filter; per-type micro-nat quantization) and hybrid retrieval
    #     by reciprocal-rank fusion of the BM25 and cosine lists:
    "text_entropy_scores",
    "sim_hybrid_rrf",
    #     + token-budget head selection over the distributed prefix sum
    #     (distrank.cum_weighted — the ranked() pattern generalized to
    #     weighted running sums):
    "prep_token_budget_head",
    # (b) the 13 r4-era rows the r9 window explicitly deferred (oldest
    #     official rows in the registry):
    "events_value_histogram",
    "filter_predicate_suite",
    "projection_expressions",
    "sample_hash_reproducible",
    "sample_stratified_by_lang",
    "sim_label_centroids",
    "subq_in_european_suppliers",
    "subq_orders_above_customer_avg",
    "subq_scalar_above_avg_price",
    "topk_global",
    "topk_per_group",
    "window_first_last",
    "window_range_frame",
    # (c) 30 of the 41 r5-era rows, alphabetical (1 + 6 + 13 + 30 = 50;
    #     the last eleven alphabetically — stream_live_join_purchase_
    #     views, stream_live_session_30m, stream_live_sliding_15m,
    #     stream_live_tumbling_hourly, subq_lateral_topn,
    #     text_collocations, text_heavy_hitters_cms,
    #     text_normalize_unicode, timeseries_interpolate,
    #     timeseries_wow_change, window_nth_value — are the oldest
    #     candidates for round 11):
    "agg_approx_count_distinct",
    "agg_corr_covar",
    "agg_exact_percentiles",
    "agg_median_mode_by_segment",
    "agg_percentile_approx",
    "events_attribution_first_last",
    "events_funnel_windowed",
    "events_pivot_daily_types",
    "events_user_timeline",
    "fn_sql_udf_suite",
    "fn_try_suite",
    "fn_variant_suite",
    "join_asof_tolerance",
    "join_salted_skew",
    "layout_zorder_buckets",
    "mart_incremental_refresh",
    "ml_linreg_normal_eq",
    "ml_logreg_gd",
    "orders_scd2_priority",
    "part_unpivot_metrics",
    "prep_curriculum_order",
    "prep_temperature_resample",
    "profile_orders_columns",
    "quality_constraint_checks",
    "quality_daily_volume_anomaly",
    "quality_referential_orphans",
    "quality_snapshot_diff",
    "sample_fraction",
    "sim_topk_lsh",
    "stream_live_dedup_summary",
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
