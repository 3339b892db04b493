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
    # WINDOW TRIAGE round 8 (50 slots). The round-7 window replayed the
    # round-6 set verbatim (the rotation was never executed — r7 verdict
    # item 2), so this rotation does two jobs at once:
    #
    # (a) 7 slots for entries with NO driver row of any kind:
    #     the long-held-out span-duplication oracle (promoted into
    #     ORACLES this round, llm/dedup.py), its new span-REMOVAL
    #     sibling (r8 verdict item 6), ml_pca_embeddings for its
    #     first rows-only `no_oracle` row (r8 verdict item 7), and the
    #     three new llm/textstats ops: distributed BPE merge learning,
    #     corpus-LM perplexity scoring, and BPE encoding/fertility;
    "dedup_ngram_span_duplication",
    "dedup_span_removal",
    "ml_pca_embeddings",
    "text_bpe_learn_merges",
    "text_lm_perplexity",
    "text_bpe_apply",
    #     and the join-key skew-audit detector pairing with the
    #     join_salted_skew mitigation (operators/quality.py):
    "quality_join_skew_audit",
    # (b) 13 changed-plan slots: round 8 rewrote functions/text.py
    #     shingles() (token array bound once through a HOF wrapper —
    #     2.3–3.5x at sf1), which changes the physical plan of every
    #     transitive consumer; per the zero-stale-certification
    #     discipline they all need fresh driver rows over the NEW plan
    #     (span_duplication is already in group (a)):
    "dedup_shingle_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_components",
    "dedup_incremental_batch",
    "dedup_cluster_census",
    "graph_pagerank_near_dups",
    "graph_degree_distribution",
    "graph_triangle_count",
    "graph_reachability_recursive",
    "pipeline_corpus_curation",
    "prep_decontaminate",
    "prep_decontaminate_bloom",
    #     + the round-8 symspell narrow-shuffle rewrite (names join
    #     back onto deduped id pairs; 235 s -> 85 s at sf1):
    "dedup_fuzzy_names_symspell",
    #     + the round-8 IVF cell-assignment rewrite (slim argmax
    #     structs + element_at cell retrieval; ~12.3 s -> ~10 s warm
    #     at sf1):
    "sim_topk_ivf",
    #     + the round-8 repetition-scores rewrite (doc-local sorted-run
    #     fold, zero exchanges — shuffle-free at any scale):
    "text_repetition_scores",
    #     + the round-8 int8-quantizer staging fix (scale/codes were
    #     re-inlined per element/consumer; 11.1 s -> 0.9 s at sf1):
    "prep_quantize_int8",
    # (c) 25 re-certification slots: the oldest official rows across
    #     CORRECTNESS_r01–r07, oldest round first (computed
    #     mechanically: latest green row per name over all committed
    #     artifacts). r1-era aggregates/scalars/setops, then the r2/r3
    #     streaming batch-parity set and most of the r4-era re-runs;
    #     the 13 newest rotation candidates (r4 window_first_last/
    #     window_range_frame and the r5 family) yielded their slots to
    #     group (b) — all still green on their existing official rows.
    "agg_count_distinct",
    "agg_cube_status_priority",
    "agg_distinct_rows",
    "agg_global_stats",
    "agg_having_big_suppliers",
    "agg_min_max_by",
    "agg_monthly_orders",
    "agg_pivot_status",
    "agg_stats_dispersion",
    "fn_array_suite",
    "fn_bitwise_suite",
    "fn_conditional_suite",
    "fn_explode_tokens",
    "fn_json_suite",
    "fn_math_suite",
    "fn_string_suite",
    "setop_except",
    "setop_intersect_all",
    "setop_union_all",
    "setop_union_distinct",
    "ml_customer_scores",
    "stream_dedup_summary",
    "stream_event_type_rates",
    "stream_funnel_view_purchase",
    "stream_session_30m",
    "stream_sliding_15m",
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
