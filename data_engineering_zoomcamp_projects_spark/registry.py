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
    # round-5 window bulk (after _FRONT): the r4-changed dedup/LSH
    # modules' siblings, then the TPC-H family whose official rows are
    # the oldest (r1–r3) for a fresh re-certification pass
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
    # WINDOW TRIAGE (50 slots, ~55 claimants): never-certified entries
    # outrank re-certification of changed-but-once-green plans, because
    # an entry with no driver row EVER is invisible to the gate while a
    # changed plan still has (i) a name-stable green row, (ii) pytest
    # oracle parity at sf0.001 every run, and (iii) this session's
    # repeated full driver-twin runs at sf0.01 (scripts in VERDICT
    # workflow). Consequently the r4-changed dedup plans
    # (dedup_minhash_lsh, dedup_cluster_components,
    # pipeline_corpus_curation, dedup_shingle_jaccard) and the
    # r5-changed events_funnel_stages yield their slots this round —
    # FRONT-LOAD THEM IN ROUND 6 (all six changed-plan names,
    # dedup_embedding_cosine included — every slot this round went to a
    # never-certified entry, the strictly worse orphan class).
    "events_user_timeline",
    "events_funnel_windowed",
    "mart_incremental_refresh",
    "text_heavy_hitters_cms",
    "prep_curriculum_order",
    "quality_snapshot_diff",
    # rows-only -> full oracle upgrades in round 5 (deterministic model
    # state / engine-shared derivations let the oracle replicate them)
    "sim_topk_lsh",
    "sim_topk_ivf",
    "agg_percentile_approx",
    "sample_fraction",
    # new in round 5: the true readStream paths under the driver gate
    "stream_live_tumbling_hourly",
    "stream_live_session_30m",
    "stream_live_join_purchase_views",
    # new in round 5: distributed model training, fully oracle-checked
    # (ml.py): closed-form OLS + fixed-point iterative k-means
    "ml_linreg_normal_eq",
    "ml_kmeans_embeddings",
    "graph_pagerank_near_dups",
    "dedup_incremental_batch",
    # new in round 5: warehouse-shaping family (operators/warehouse.py)
    "events_pivot_daily_types",
    "part_unpivot_metrics",
    "orders_scd2_priority",
    "agg_median_mode_by_segment",
    "events_attribution_first_last",
    "profile_orders_columns",
    "agg_exact_percentiles",
    # new in round 5 (second half): data-quality suite, graph analytics
    # widening, skew-salted join, time-series interpolation family
    "quality_constraint_checks",
    "quality_referential_orphans",
    "quality_daily_volume_anomaly",
    "graph_degree_distribution",
    "graph_triangle_count",
    "join_salted_skew",
    "timeseries_interpolate",
    "timeseries_wow_change",
    "prep_decontaminate_bloom",
    "stream_live_sliding_15m",
    "dedup_cluster_census",
    "text_normalize_unicode",
    "layout_zorder_buckets",
    "ml_logreg_gd",
    "stream_live_dedup_summary",
    # new in round 5 (final stretch): exact-moment correlation, the
    # HLL bounded-error invariant (rows-only -> full oracle), and
    # temperature-based language rebalancing
    "agg_corr_covar",
    "agg_approx_count_distinct",
    "prep_temperature_resample",
    "join_asof_tolerance",
    "window_nth_value",
    "text_collocations",
    "graph_reachability_recursive",
    "fn_variant_suite",
    "fn_sql_udf_suite",
    "fn_try_suite",
    "subq_lateral_topn",
    # NOTE round-6 rotation debt (see WINDOW TRIAGE above):
    # dedup_minhash_lsh, dedup_cluster_components,
    # pipeline_corpus_curation, dedup_shingle_jaccard,
    # events_funnel_stages, dedup_embedding_cosine — changed plans
    # riding older green rows.
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
