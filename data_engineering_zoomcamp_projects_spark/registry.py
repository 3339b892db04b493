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
    # WINDOW TRIAGE round 17 (50 slots). Composition exactly per the
    # r16 verdict item 1 and the queue the r16 triage recorded here
    # (computed mechanically: latest green DRIVER row per name over
    # CORRECTNESS_r01-r16):
    #
    #   (i) the 4 rule-ii-displaced r10-cohort window rows
    #       (topk_global, topk_per_group, window_first_last,
    #       window_range_frame — latest driver row r10, three rounds
    #       starved) — first, so the oldest debt certifies before any
    #       mid-window death;
    #  (ii) ml_segment_zscores, HOISTED per the r16 verdict ("What's
    #       missing" #2): rows-only by design, its latest driver word
    #       is a r13 harness-side CSV-dump OOM — a clean rows-only row
    #       heals the official ledger;
    # (iii) the full r11 cohort (43 names, alphabetical — latest
    #       driver row r11);
    #  (iv) filler from the r12 cohort head (alphabetical):
    #       agg_count_distinct, agg_cube_status_priority.
    #
    #   Round 17 is an OPTIMIZATION round: no oracle changed (the
    #   driver re-verifies every entry's hash against the unchanged
    #   oracles), so there is no rule-(ii)-of-r16 "changed plans"
    #   block — the window is pure rotation debt. No heavies
    #   interleaving needed: none of these entries rebuilds an index
    #   oracle.
    #
    #   Displaced to r18: the r12 cohort from agg_distinct_rows
    #   onward (41 names), then the r14 cohort (35), then the r15
    #   cohort (37) — plus whatever r18 changes.
    "topk_global",
    "topk_per_group",
    "window_first_last",
    "window_range_frame",
    "ml_segment_zscores",
    "agg_grouping_sets",
    "agg_rollup_flag_status",
    "dedup_exact",
    "dedup_fuzzy_names",
    "dedup_fuzzy_names_symspell",
    "dedup_incremental_batch",
    "dedup_minhash_lsh",
    "dedup_ngram_span_duplication",
    "dedup_shingle_jaccard",
    "dedup_simhash",
    "dedup_span_removal",
    "events_cohort_retention",
    "events_daily_actives",
    "events_funnel_stages",
    "events_rolling_distinct_hll",
    "events_sessionize",
    "events_user_rfm",
    "fn_date_suite",
    "join_asof_purchase_prior_view",
    "join_range_trailing_shipments",
    "ml_logreg_gd",
    "multimodal_audio_windows",
    "multimodal_image_decode_resize",
    "pipeline_ccnet_buckets",
    "prep_chunk_documents",
    "prep_sequence_packing",
    "prep_source_mixing",
    "prep_token_budget_head",
    "sim_topk_lsh",
    "stream_live_join_purchase_views",
    "stream_live_session_30m",
    "stream_live_sliding_15m",
    "stream_live_tumbling_hourly",
    "subq_lateral_topn",
    "text_collocations",
    "text_entropy_scores",
    "text_heavy_hitters_cms",
    "text_lm_perplexity",
    "text_normalize_unicode",
    "text_quality_scores",
    "timeseries_interpolate",
    "timeseries_wow_change",
    "window_nth_value",
    "agg_count_distinct",
    "agg_cube_status_priority",
]

# Historical windows (r16 verdict item 5 — the ~150-line _FRONT_R13 /
# _FRONT_R15 literals were dead weight this file itself said git
# preserves): round 16's window closed 50/50 green at commit 501d8d9
# (registry.py @ c4c4e2f), round 15's at 0c8a8a1, round 13's at the
# r13 HEAD. See CORRECTNESS_r{13,15,16}.json for the certified rows.


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
