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
    # WINDOW TRIAGE round 12 (50 slots). Round 11 closed 50/50 green;
    # this window is: the 2 new persisted-index entries + every plan
    # round 12 changed + ALL 21 r7-era refresh rows (the queue the r11
    # verdict mandated leading with — including the 13 displaced last
    # round) + the oldest r8-era rows as filler (computed mechanically:
    # latest driver row per name over CORRECTNESS_r01–r11).
    #
    # (a) 3 new-op slots: the persisted ANN index build/query split —
    #     build materializes (vec_id, cell, pq_code) partitioned by
    #     cell (inverted-lists layout), query serves sim_topk_ivfpq's
    #     exact chain from the table with no corpus-side assignment —
    #     plus the frozen-model incremental append (the ~10% arriving
    #     batch assigned against historical-corpus codebooks) and its
    #     TRUE-readStream twin (foreachBatch appends per micro-batch;
    #     shares the append oracle — order-independent assignment):
    "sim_index_build",
    "sim_index_query",
    "sim_index_append",
    "stream_live_index_append",
    # (b) 7 plans round 12 changed: the ivfpq serve-chain refactor +
    #     PQ_K-derived packing (values identical, re-certify anyway),
    #     the hybrid-RRF widened corpus scan + runtime near-tie guard,
    #     the widened image-resize synthesis chain, the null-text guard
    #     in the quality-model Arrow feature pass, and the k-means
    #     disk-cached centroid state (bit-identical model, new source):
    "sim_topk_ivfpq",
    "sim_hybrid_rrf",
    "multimodal_image_resize",
    "text_quality_classifier",
    "text_quality_filter",
    "dedup_semantic_semdedup",
    "ml_kmeans_embeddings",
    # (c) the full r7-era refresh queue (latest driver row = r7):
    "prep_train_test_split",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "quality_distribution_drift",
    "sample_importance_weighted",
    "setop_intersect",
    "subq_exists_multi_order_days",
    "text_corpus_rollup",
    "text_fingerprints",
    "text_lexicon_score",
    "text_pretokenize_bpe_style",
    "text_redact_sensitive",
    "text_tfidf_top_terms",
    "text_token_counting",
    "timeseries_daily_gapfill",
    "window_lag_lead",
    "window_moving_average",
    "window_rank_functions",
    "window_running_sum",
    # (d) filler: the alphabetically-first r8-era rows (18 slots after
    #     the four index-family entries took theirs). Displaced to r13:
    #     the remaining r8 rows from fn_json_suite alphabetically
    #     onward (fn_json/fn_math/fn_string suites, graph_triangle
    #     _count, ml_customer_scores, pipeline_corpus_curation,
    #     prep_decontaminate, prep_quantize_int8, quality_join_skew
    #     _audit, setop_except/intersect_all/union_*, stream_* batch
    #     rows, text_bpe_*) — all keep cumulative green rows and the
    #     full pytest differential covers them every run:
    "agg_count_distinct",
    "agg_cube_status_priority",
    "agg_distinct_rows",
    "agg_global_stats",
    "agg_having_big_suppliers",
    "agg_min_max_by",
    "agg_monthly_orders",
    "agg_pivot_status",
    "agg_stats_dispersion",
    "dedup_cluster_census",
    "dedup_cluster_components",
    "fn_array_suite",
    "fn_bitwise_suite",
    "fn_conditional_suite",
    "fn_explode_tokens",
    "graph_degree_distribution",
    "graph_pagerank_near_dups",
    "graph_reachability_recursive",
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
