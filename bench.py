"""Benchmark runner — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full plan execution,
no driver collect). A warmup query first absorbs JVM/codegen startup
so per-query numbers measure the plan, not the JIT. Every query runs
$SPARK_GRAFT_BENCH_ITERS times (default 3, warm) and reports the
per-query MEDIAN — single-iteration numbers proved noise-fragile
(round-2's phantom 1.80x "regression" self-resolved in round 3 with
zero plan changes); the max/median spread per query is emitted under
"spread" so drift is visible in the bench file itself.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from data_engineering_zoomcamp_projects_spark.registry import all_queries
from data_engineering_zoomcamp_projects_spark.session import get_spark

#: queries benched every round; keep roughly stable so BENCH_r{N}.json
#: files are comparable across rounds.
HEADLINE = [
    # relational core (q1_native_double = the same plan minus the
    # decimal oracle-parity canonicalization; the pair quantifies the
    # documented parity tax every round, see BASELINE.md §3)
    "q1_pricing_summary",
    "q1_native_double",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "agg_rollup_flag_status",
    "join_range_trailing_shipments",
    "join_asof_purchase_prior_view",
    "window_running_sum",
    "topk_per_group",
    "fn_math_suite",
    # streaming semantics (batch mode)
    "stream_tumbling_hourly",
    "stream_session_30m",
    # behavioral analytics (the heaviest non-LLM plans)
    "events_user_rfm",
    "events_funnel_stages",
    # LLM-data ops
    "dedup_shingle_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "text_tfidf_top_terms",
    "pipeline_corpus_curation",
    "prep_decontaminate",
    # transform layer
    "mart_daily_revenue",
    # round-5 additions: warehouse shaping + the true readStream path
    "agg_median_mode_by_segment",
    "orders_scd2_priority",
    "stream_live_tumbling_hourly",
    # round-5 second half: quality gate, graph analytics, bloom path
    "quality_constraint_checks",
    "graph_triangle_count",
    "prep_decontaminate_bloom",
    # round-6 promotions: the two heaviest of the five newly-certified
    # entries (sf1 factors 4.1 s / 5.4x in the round-5 sweep) — benched
    # so their plans are tracked round-over-round
    "events_rolling_distinct_hll",
    "multimodal_audio_windows",
    # round-8 promotions: the substring-dedup pair (span counting, long
    # held out, + the new span-removal transform) — both linear
    # no-pair-space plans whose cost is dominated by the positional
    # shingle explode; tracked here from first certification
    "dedup_ngram_span_duplication",
    "dedup_span_removal",
    # distributed BPE merge learning: corpus -> word-frequency table,
    # then K vocab-sized argmax/fold rounds — tracked for the round
    # loop's collect+checkpoint overhead
    "text_bpe_learn_merges",
    # corpus-LM perplexity scoring: corpus -> vocab-sized bigram model,
    # micro-nat quantized log-probs, integer per-doc reduction
    "text_lm_perplexity",
    # BPE encoding: vocab-sized segmentation map joined back onto the
    # corpus word stream, per-doc fertility reduction
    "text_bpe_apply",
    # round-8 plan rewrites, tracked from first certification:
    # doc-local sorted-run fold (zero exchanges)
    "text_repetition_scores",
    # staged-projection quantizer (single-eval scale/codes)
    "prep_quantize_int8",
    # round-9: SemDeDup semantic dedup (k-means cells + within-cell
    # cosine pruning; tracks the shared Lloyd training + the
    # cluster-bounded pair join from first certification)
    "dedup_semantic_semdedup",
    # round-9: CCNet quality bucketing (langid + corpus-LM perplexity
    # + distributed per-language terciles — the composite over two
    # existing headliners, tracked for the distrank tercile overhead)
    "pipeline_ccnet_buckets",
    # round-9 late: image resize (Arrow block-mean batch — tracks the
    # multimodal Arrow path's per-row cost from first certification).
    # stream_live_ingest_neardup is deliberately NOT a headline: its
    # wall time is dominated by fixed streaming-machinery cost (three
    # sequential micro-batches + checkpoint/sink roundtrips), which
    # would read as operator noise here; its cost is tracked in the
    # sf1 sweeps instead.
    "multimodal_image_resize",
    # round-10: q2's rewritten plan (semi-join prefilter below the
    # unit-price aggregate, the q20 pattern — 3.0x measured; benched so
    # the win is tracked round-over-round and a revert is visible)
    "q2_min_cost_supplier",
    # round-10: the PNG encode->decode->resize pipeline certifying the
    # decode_image codec — tracked from first certification (per-row
    # Python codec cost rides the same Arrow batch as the resize)
    "multimodal_image_decode_resize",
    # round-10: BM25 lexical retrieval (one filtered token pass +
    # micro-quantized idf, TakeOrdered top-20) and the RefinedWeb
    # per-domain cap (partial WindowGroupLimit) — tracked from first
    # certification
    "sim_bm25_topk",
    "curation_domain_cap",
    # round-10: character-entropy quality signal (per-type micro-nat
    # quantization, one shuffle) — tracked from first certification
    "text_entropy_scores",
    # round-10: hybrid RRF retrieval (BM25 + single-query cosine lists
    # fused; bounded 60x60 full outer join) — tracked from first
    # certification
    "sim_hybrid_rrf",
    # round-10: token-budget head over the distributed prefix sum —
    # tracked from first certification
    "prep_token_budget_head",
    # round-11: trained hashed-bigram quality classifier (shared
    # lattice-GD loop) and IVF-PQ (product-quantized candidate
    # scoring, 20.9x less exchange than sim_topk_ivf at sf1) —
    # tracked from first certification
    "text_quality_classifier",
    "text_quality_filter",
    "sim_topk_ivfpq",
    # round-12: the persisted ANN index build/query split — query is
    # the production serve shape (no corpus-side assignment; tracked
    # against sim_topk_ivfpq to keep the build-amortization win
    # visible); build includes the partitioned-parquet write (and is
    # cache-reusing on unchanged data, so the benched cost is the
    # read-back + fingerprint probe after the first round)
    "sim_index_build",
    "sim_index_query",
    # round-12: frozen-model incremental append (batch-only assignment
    # against historical codebooks — tracked so the O(|batch|) claim
    # stays measured)
    "sim_index_append",
    # round-13: OPTIMIZE-then-serve — a real compact_ann_index rewrite
    # over the fragmented index variant plus the serve chain (tracked
    # so the compaction cost stays measured next to the serve win) —
    # and serve-after-takedown-deletes (tombstone anti-join cost)
    "sim_index_query_compacted",
    # round-14: cell-selective compaction-then-serve (rewrite cost
    # proportional to the fragmented cells, not the table — tracked
    # next to the full-OPTIMIZE entry so the selection win stays
    # measured)
    "sim_index_query_compacted_incremental",
    "sim_index_query_deleted",
    # round-13 second pass: filtered vector search (attribute predicate
    # inside the pruned index scan), the recall@k estimator (serve +
    # exact brute force composed), cell-balance stats (metadata-priced
    # rollup), the online near-dup ingestion gate (batch-as-queries
    # serve), and the frozen-model drift monitor (two histograms + TV)
    "sim_index_query_filtered",
    "sim_index_recall_estimate",
    "sim_index_stats",
    "dedup_online_index_gate",
    "sim_index_drift_monitor",
    # round-15: snapshot generations — time-travel serve (VERSION AS
    # OF the pre-takedown generation) and the generation audit diff
    # (changed-cell-pruned removed/added attestation), tracked so the
    # pointer-resolve + history costs stay measured next to the
    # current-generation serves
    "sim_index_time_travel",
    "sim_index_generation_diff",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="bench")

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    # targeted runs (e.g. the sf1 scale-stress subset): comma-separated
    # allowlist; names outside HEADLINE are appended in given order
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        picked = [n.strip() for n in only.split(",") if n.strip() in queries]
        names = [n for n in names if n in picked] + [
            n for n in picked if n not in HEADLINE
        ]

    # warmup: run the first headline once to pay JVM/codegen startup
    if names:
        materialize(queries[names[0]](spark, sf_dir))

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        # max/median ratio: 1.0 = perfectly stable; >1.3 = noisy query
        spreads[name] = round(max(samples) / max(timings[name], 1e-9), 2)

    payload = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "spread": spreads,
            "iters": iters,
            "sf": sf,
        }
    )
    # the driver stores only a bounded stdout tail in BENCH_r{N}.json,
    # which has truncated the per-query medians two rounds running
    # (r6/r7 verdicts) — persist the FULL line to a file as well so the
    # complete artifact always survives. Overwritten per run; committed
    # per round as the local record. SPARK_GRAFT_BENCH_TAG=r9 also
    # writes a per-round archive copy (BENCH_local_r9.json) so each
    # round's medians survive the next round's runs (r8 verdict item 3).
    here = os.path.dirname(os.path.abspath(__file__))
    # a SPARK_GRAFT_BENCH_ONLY probe run is a PARTIAL record: never let
    # it overwrite the full headline archive (the recurring clobber the
    # e8954fa repair and two round-10 git-restores cleaned up by hand)
    outputs = [] if only else [os.path.join(here, "BENCH_local_latest.json")]
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
    if tag:
        # the tag is interpolated into a filename: reject separators /
        # traversal so a malformed tag can't write outside the repo dir
        # (ADVICE r9)
        if re.fullmatch(r"[A-Za-z0-9._-]+", tag) and tag not in (".", ".."):
            # same partial-record rule as the latest file: an ONLY probe
            # must never replace a tag's full archive either (ADVICE
            # r10) — divert it to a _partial name instead
            suffix = "_partial" if only else ""
            outputs.append(os.path.join(here, f"BENCH_local_{tag}{suffix}.json"))
        else:
            print(
                f"WARNING: ignoring invalid SPARK_GRAFT_BENCH_TAG={tag!r} "
                "(must match [A-Za-z0-9._-]+)",
                file=sys.stderr,
            )
    for path in outputs:
        try:
            with open(path, "w") as f:
                f.write(payload + "\n")
        except OSError as exc:
            # losing the archive silently defeats its purpose (r8
            # verdict fix) — warn on stderr; stdout stays the contract
            print(f"WARNING: could not write {path}: {exc}", file=sys.stderr)
    print(payload)


if __name__ == "__main__":
    main()
