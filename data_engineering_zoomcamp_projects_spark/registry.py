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
    # WINDOW TRIAGE round 11 (50 slots). Round 10 closed 50/50 green;
    # this window is: new ops + every plan round 11 changed + the four
    # plans round 10 changed AFTER their last driver row (r10 verdict
    # item 1) + the eleven deferred r5-era rows + the oldest r7-era
    # rows (computed mechanically: latest green row per name over
    # CORRECTNESS_r01–r10).
    #
    # (a) 3 new-op slots: the trained hashed-bigram quality classifier
    #     + its map-side scoring/filter twin (fastText/DCLM
    #     distillation shape on the shared lattice-GD
    #     loop) and IVF-PQ (product-quantized candidate scoring — the
    #     storage two-phase; 20.9x less exchange data than sim_topk_ivf
    #     at sf1):
    "text_quality_classifier",
    "text_quality_filter",
    "sim_topk_ivfpq",
    # (b) 6 plans round 11 changed: token budget now true integer
    #     division (ADVICE r10), entropy counts via one Arrow Counter
    #     pass (A/B winner over the explode twin), decode-resize's
    #     codec vectorized + per-row PIL probe hoisted, logreg-GD loop
    #     refactored into the shared _lg_train_score/_lg_chain_sql,
    #     and the widen_if_narrow scan compensation (sim_topk_lsh via
    #     _queries_and_corpus; symspell's variant generation):
    "prep_token_budget_head",
    "text_entropy_scores",
    "multimodal_image_decode_resize",
    "ml_logreg_gd",
    "sim_topk_lsh",
    "dedup_fuzzy_names_symspell",
    #     + the widened shingle/token-grain family (same
    #     widen_if_narrow compensation; pipeline_ccnet_buckets changes
    #     transitively through text_lm_perplexity's chain):
    "dedup_shingle_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_span_duplication",
    "dedup_span_removal",
    "dedup_incremental_batch",
    "text_lm_perplexity",
    "pipeline_ccnet_buckets",
    # (c) the 4 plans round 10 changed after their last driver row
    #     (staged-projection fixes + PCA mean-centering; sim_topk_ivf
    #     also re-enters via the r11 _nearest_cells refactor):
    "events_user_rfm",
    "text_quality_scores",
    "ml_pca_embeddings",
    "sim_topk_ivf",
    # (d) the 11 r5-era rows round 10 deferred:
    "stream_live_join_purchase_views",
    "stream_live_session_30m",
    "stream_live_sliding_15m",
    "stream_live_tumbling_hourly",
    "subq_lateral_topn",
    "text_collocations",
    "text_heavy_hitters_cms",
    "text_normalize_unicode",
    "timeseries_interpolate",
    "timeseries_wow_change",
    "window_nth_value",
    # (e) the 18 alphabetically-first r7-era refresh rows that fit
    #     after the changed-plan slots. Displaced to r12 (all keep
    #     their cumulative green rows; the full pytest differential
    #     covers them every run): prep_train_test_split, q1/q3/q5/q9,
    #     quality_distribution_drift, sample_importance_weighted,
    #     setop_intersect (by the widened shingle-family slots),
    #     subq_exists_multi_order_days + text_corpus_rollup (by the
    #     lsh/symspell slots), text_fingerprints (by
    #     text_quality_filter), then text_lexicon_score,
    #     text_pretokenize_bpe_style, text_redact_sensitive,
    #     text_tfidf_top_terms and the rest of r7:
    "agg_grouping_sets",
    "agg_rollup_flag_status",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_fuzzy_names",
    "events_cohort_retention",
    "events_daily_actives",
    "events_funnel_stages",
    "events_rolling_distinct_hll",
    "events_sessionize",
    "fn_date_suite",
    "join_asof_purchase_prior_view",
    "join_range_trailing_shipments",
    "multimodal_audio_windows",
    "prep_chunk_documents",
    "prep_sequence_packing",
    "prep_source_mixing",
    "sim_topk_bruteforce",
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
