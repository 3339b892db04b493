"""Physical-plan assertions (SURVEY.md §4): pushdown, pruning,
broadcast, codegen — the 100TB-survivability checks in executable form."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_zoomcamp_projects_spark.catalog import load_table
from data_engineering_zoomcamp_projects_spark.operators.relational import (
    q1_pricing_summary,
    q5_local_supplier_volume,
)
from data_engineering_zoomcamp_projects_spark.plans import explain


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 30.0
    ).select("l_orderkey")
    assert explain.has_pushed_filter(df, "l_quantity")


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = explain.read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_q1_scan_is_pruned_and_pushed(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    # only the 7 columns q1 needs are read
    cols = set(explain.read_schema_columns(df))
    assert cols == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert explain.has_pushed_filter(df, "l_shipdate")
    # codegen spans only materialize on the non-adaptive compile; build
    # the same plan with AQE off to count them
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df_noaqe = q1_pricing_summary(spark, sf_dir)
        assert explain.whole_stage_codegen_spans(df_noaqe) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q5_broadcasts_fixed_dims(spark, sf_dir):
    df = q5_local_supplier_volume(spark, sf_dir)
    assert explain.uses_broadcast_join(df)


def test_semi_join_is_not_full_join(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    plan = explain.formatted_plan(semi)
    assert "LeftSemi" in plan


def test_groupby_has_partial_aggregation(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
    )
    plan = explain.formatted_plan(df)
    # two HashAggregate operators = map-side partial + final
    assert plan.count("HashAggregate") >= 2


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    """Bucketing both sides on the join key co-locates them: the join
    plan has no Exchange on the bucketed sides (the 100 TB answer to
    repeated fact-fact joins on the same key)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("b_lineitem")
    orders.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("b_orders")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert explain.shuffle_count(joined) == 0
        # and the same join over raw (unbucketed) parquet shuffles both sides
        raw = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert explain.shuffle_count(raw) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partition_pruning_on_monthly_layout(spark, sf_dir, tmp_path):
    """The table-per-month replacement must prune: a month-filtered read
    of the partitioned layout scans only that partition."""
    from data_engineering_zoomcamp_projects_spark.ingest.sinks import (
        write_partitioned_parquet,
    )

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_month")
    write_partitioned_parquet(orders, out, ts_col="o_orderdate")
    df = spark.read.parquet(out).filter(F.col("month") == "1996-03")
    plan = explain.formatted_plan(df)
    assert "PartitionFilters" in plan and "month" in plan
    # pruned read returns exactly that month's rows
    want = orders.filter(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM") == "1996-03"
    ).count()
    assert df.count() == want


def test_q6_predicates_reach_scan_no_join(spark, sf_dir):
    """Q6 is the pushdown benchmark: every predicate column is pushed
    to the parquet scan, only needed columns are read, and the plan has
    no join or shuffle beyond the scalar-agg exchange."""
    from data_engineering_zoomcamp_projects_spark.operators.tpch_full import (
        q6_forecast_revenue,
    )

    df = q6_forecast_revenue(spark, sf_dir)
    assert explain.has_pushed_filter(df, "l_discount")
    assert explain.has_pushed_filter(df, "l_quantity")
    cols = set(explain.read_schema_columns(df))
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    plan = explain.formatted_plan(df)
    assert "Join" not in plan


def test_q8_broadcasts_all_dims(spark, sf_dir):
    """Q8's 5-way star join must broadcast every dim side — the fact
    table is the only shuffle participant."""
    from data_engineering_zoomcamp_projects_spark.operators.tpch_full import (
        q8_market_share,
    )

    df = q8_market_share(spark, sf_dir)
    assert explain.uses_broadcast_join(df)


def test_aqe_splits_skewed_join(spark, sf_dir):
    """The session's AQE skew-join config must actually fire: a join
    with one dominant key, thresholds lowered to test scale, shows
    skew-split partitions in the final adaptive plan."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(150_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k2"), F.lit("d").alias("dval")
        )
        joined = fact.join(dim, F.col("k") == F.col("k2"))
        # the action must run on THIS DataFrame's QueryExecution —
        # a writer action builds its own, leaving this plan unfinalized
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_low_card_window_audit_detects_lang_partition(spark, sf_dir):
    """The audit must go red on the round-3 packing pathology: a window
    partitioned ONLY by `lang` (a handful of values). Rebuild that
    exact plan shape and assert the detector reports a partition clause
    with no id-bearing key — the registry-wide audit below would fail
    it."""
    import re

    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    df = d.select("doc_id", F.row_number().over(w).alias("rn"))
    keys = explain.window_partition_keys(df)
    assert keys == [["lang"]]
    id_bearing = re.compile(r"(_pid|key|_?id($|_))")
    assert not any(id_bearing.search(k) for k in keys[0])
    # and the same frame through the toolkit passes the audit
    from data_engineering_zoomcamp_projects_spark.operators.distrank import ranked

    good = ranked(d.select("doc_id", "lang"), ["lang"], [F.col("doc_id").asc()])
    for ks in explain.window_partition_keys(good):
        assert any(id_bearing.search(k) for k in ks), ks


def test_registry_wide_plan_hygiene(spark, sf_dir):
    """Audit EVERY registry query's physical plan: no cartesian
    products outside the known bounded ones, no sort-merge joins (all
    dims broadcast at test scale), and a shuffle-count ceiling. This is
    the regression guard for plan quality — a future edit that sneaks
    in an extra exchange or degrades a broadcast fails here, not in the
    next round's bench."""
    from data_engineering_zoomcamp_projects_spark.registry import all_queries

    # queries whose plans legitimately contain a BroadcastNestedLoop /
    # cartesian: each is a 1-row scalar broadcast (threshold / total /
    # ref-day cross join) or the 5x25 dim cross join — verified bounded;
    # this is an EXACT set, so a new unbounded product anywhere fails
    bounded_cartesian_ok = {
        # median/percentiles/balanced-shards: distrank.ranked's 1-row
        # broadcast shard-count frame (rank offsets + partition totals)
        "agg_median_mode_by_segment",
        "agg_exact_percentiles",
        "prep_shard_balanced",
        "events_user_rfm", "join_cross_region_nation", "prep_vocab_topk",
        "prep_source_mixing", "prep_sequence_packing", "q11_part_value_share",
        "q22_idle_rich_customers", "sim_topk_bruteforce",
        # sim_topk_ivf: the 1-row broadcast codebook frame (model state)
        # cross-joined onto the corpus/query scans for map-side cell
        # assignment
        "sim_topk_ivf",
        # ml_logreg_gd: the 1-row broadcast WEIGHT frame per GD
        # iteration + scoring pass (optimizer state, the same model-
        # state-as-one-row-broadcast pattern; 8 BNL joins = 4 passes x
        # render duplication, each side a single row)
        "ml_logreg_gd",
        "subq_scalar_above_avg_price", "text_tfidf_top_terms",
        "window_rank_functions",
        # prep_temperature_resample: the 1-row broadcast min-count frame
        # crossed onto the |langs|-row counts frame (rate derivation —
        # bounded by language count at any scale); the corpus-side
        # membership join is a BroadcastHashJoin, verified in-plan
        "prep_temperature_resample",
        # text_collocations: the one-row broadcast (N, B) totals frame
        # crossed onto the vocab-sized candidate-pair frame
        "text_collocations",
        # sample_importance_weighted: the one-row broadcast corpus-max
        # frame crossed onto the scan (membership itself is map-side)
        "sample_importance_weighted",
        # text_lm_perplexity: the one-row broadcast vocab-size frame
        # (|V| scalar) crossed onto the vocab-sized bigram-model frame;
        # the doc-side joins are hash joins on (a_key, b_key)
        "text_lm_perplexity",
        # quality_join_skew_audit: the one-row broadcast totals frame
        # crossed onto the TakeOrdered 5-row head
        "quality_join_skew_audit",
        # sim_bm25_topk: the one-row broadcast corpus-stats frame
        # (N, total token count) crossed onto the |Q|-row term-weight
        # frame (BM25_QUERY has 5 terms); the corpus-side joins are
        # hash joins on token / doc_id
        "sim_bm25_topk",
        # sim_hybrid_rrf: inherits the BM25 stats cross (above) plus
        # the one-row broadcast query-vector frame crossed onto the
        # embeddings scan (single-query cosine — model state)
        "sim_hybrid_rrf",
        # prep_token_budget_head: the one-row broadcast budget scalar
        # crossed onto the prefix-summed corpus (plus distrank's
        # metadata-sized shard-totals broadcast)
        "prep_token_budget_head",
        # pipeline_ccnet_buckets: two bounded broadcasts — the one-row
        # vocab-size frame (from the perplexity stage) and
        # distrank.ranked's metadata-sized shard-count frame
        "pipeline_ccnet_buckets",
        # sim_topk_ivfpq: the 1-row broadcast IVF codebook (corpus +
        # query cell assignment) and 1-row PQ codebook/LUT frames
        # (model state) crossed onto the scans; candidate, survivor
        # re-fetch, and query-attach joins are broadcast HASH joins
        # on cell / vec_id / query_id
        "sim_topk_ivfpq",
        # sim_index_query: the serve half of the same chain — the
        # query-side codebook/LUT crosses remain (model state over the
        # 1%-of-corpus query frame); the corpus side is the persisted
        # index scan with NO assignment crosses (pinned by
        # test_sim_index_query_reuses_persisted_index)
        "sim_index_query",
        # sim_index_query_compacted / _deleted: identical serve-chain
        # shape over the compacted "frag" / tombstoned "del" variants
        "sim_index_query_compacted",
        # sim_index_query_compacted_incremental (r14): identical
        # serve-chain shape over the cell-selectively compacted
        # "fragcell" variant
        "sim_index_query_compacted_incremental",
        "sim_index_query_deleted",
        # sim_index_time_travel (r15): identical serve-chain shape
        # over the retained pre-takedown generation of the "tt"
        # variant (the pointer-resolve happens driver-side; the plan
        # is sim_index_query's)
        "sim_index_time_travel",
        # sim_index_query_filtered: identical serve-chain shape with a
        # map-side label predicate inside the index scan (r13)
        "sim_index_query_filtered",
        # sim_index_recall_estimate: the serve chain's model-state
        # crosses PLUS sim_topk_bruteforce's non-equi pair join (the
        # exact side of recall@k — quadratic in sample x corpus by
        # design, sample-bounded); the final overlap join is a
        # broadcast hash join on (query_id, neighbor_id)
        "sim_index_recall_estimate",
        # dedup_online_index_gate: the serve chain's model-state
        # crosses with the arriving batch as the query frame
        "dedup_online_index_gate",
        # sim_index_drift_monitor: the frozen-codebook one-row
        # broadcast crossed onto the arriving batch (cell assignment)
        # + the one-row totals frame crossed onto the k-cell histogram
        "sim_index_drift_monitor",
        # sim_index_append: the frozen IVF codebook (1-row broadcast)
        # crossed onto the arriving-batch scan for map-side cell
        # assignment — zero exchanges in the whole plan (the delta is
        # scan -> assign -> Arrow code, no shuffle at all)
        "sim_index_append",
        # text_quality_classifier/filter: the ml_logreg_gd pattern —
        # 1-row broadcast weight frame per GD iteration + scoring pass
        "text_quality_classifier",
        "text_quality_filter",
    }
    # iterative queries execute during construction (convergence loop /
    # Lloyd rounds) and their rendered plan embeds cached/checkpointed
    # subplan descriptions, inflating operator counts beyond what
    # actually runs per round — audited separately by their own tests
    iterative = {
        "dedup_cluster_components",
        # census = two metadata-grain groupBys on top of the components
        # fixpoint — same rendered-plan inflation, same audit carve-out
        "dedup_cluster_census",
        "ml_kmeans_embeddings",
        # semdedup runs the same Lloyd loop during construction (shared
        # trained model, ml.kmeans_final_assignments) and its rendered
        # plan embeds the per-round one-row-broadcast assignment
        # subtree; the pair-join stage is audited by its own test
        "dedup_semantic_semdedup",
        "graph_pagerank_near_dups",
    }
    # multi-stage composites get their own ceiling: curation fuses
    # quality gate + exact dedup + LSH near-dup + census in one
    # plan (11 exchanges measured, each stage's shuffles semantic).
    # (round-3 note: events_user_rfm's 48-exchange waiver is GONE — the
    # chained ntiles are barriered with lazy localCheckpoints, so the
    # rendered plan is linear and fits the default ceiling.)
    # window_rank_functions: the full 6-function rank family derives
    # three consumers (rows, tie-groups, totals) from ONE checkpointed
    # range-shard; the pre-execution render duplicates that subtree per
    # consumer (10 exchanges, measured), runtime materializes it once.
    ceilings = {
        "pipeline_corpus_curation": 12,
        "window_rank_functions": 10,
        # r11 widen_if_narrow: the narrow-scan repartition re-renders
        # once per consumer of the widened documents frame
        # (collocations reads it for unigrams/pairs/totals;
        # lm_perplexity for the model and the doc scoring pass) —
        # deliberate, each instance is the ~6 MB (doc_id, text) spread
        # that took the map stages above it 2-wide -> 32-wide
        "text_collocations": 11,
        "text_lm_perplexity": 11,
    }
    # queries allowed a partition-less window sort: each is proven
    # metadata-grain (days-spine gap-fill and daily moving-average:
    # |calendar days| rows after the pre-aggregation; vocab-topk:
    # rank/coverage windows run on the post-LIMIT 100-row head — the
    # head itself is selected by TakeOrdered, not a global window)
    # round-5 additions to the same proof: interpolate/wow/volume-anomaly
    # all pre-aggregate to calendar grain (|days| or |weeks| rows) before
    # their stats/neighbor windows — the global window input is bounded
    # by the calendar, not the corpus, at any scale factor
    global_window_ok = {
        "timeseries_daily_gapfill",
        "timeseries_interpolate",
        "timeseries_wow_change",
        "quality_daily_volume_anomaly",
        "window_moving_average",
        "prep_vocab_topk",
        # rank window runs on the post-LIMIT 5-row head (TakeOrdered
        # selects it, same proof as prep_vocab_topk)
        "quality_join_skew_audit",
        # all three rank windows run on post-LIMIT heads (two 60-row
        # candidate lists + the 10-row fused head; TakeOrdered selects
        # each, same proof as prep_vocab_topk)
        "sim_hybrid_rrf",
    }
    # low-cardinality-window whitelist: a window whose partition clause
    # has ONLY low-card keys (no id/key/shard-bearing column) funnels
    # |rows|/|keys| through one task — same pathology as a global sort,
    # sharded. Entries here must justify their grain. (The former
    # offenders — prep_sequence_packing, prep_source_mixing,
    # text_langid_profile — were re-planned onto range-sharded
    # distributed ranks.)
    # window_rank_functions: its row_number runs distributed via
    # distrank.ranked; the one remaining plain window is dense_rank over
    # the TIE-GROUP frame — |distinct (status, priority)| = 15 rows,
    # metadata grain (see distrank.rank_family docstring).
    # agg_median_mode_by_segment: the median rank is distributed via
    # distrank.ranked; the one remaining segment-partitioned window is
    # the mode's tie-rank over the (segment x nation) COUNT frame —
    # |segments| x |nations| <= 125 rows, metadata grain.
    # curation_domain_cap: rank<=N per source compiles to a PARTIAL
    # WindowGroupLimit below the exchange, so each map task forwards at
    # most N=8 rows per source — the window input is bounded by the cap
    # times |sources|, not by corpus size (domain skew absorbed
    # map-side; see the operator docstring).
    low_card_window_ok: set[str] = {
        "window_rank_functions",
        "agg_median_mode_by_segment",
        "curation_domain_cap",
    }
    # queries whose plans legitimately contain a SortMergeJoin at test
    # scale — an EXACT set (the round-9 SemDeDup pathology: a frame
    # that loses size stats silently degrades its equi-join to an SMJ,
    # and on a LOW-cardinality key that is the sharded-global-sort
    # pathology with every non-equi term evaluated interpreted; a new
    # SMJ anywhere else must be justified here). Each entry is either
    # a high-cardinality key (doc/cust/row ids — a legitimate
    # shuffle-join above broadcast size) or forced by join type
    # (full outer has no broadcast form):
    smj_ok = {
        "join_full_outer_nation_activity",  # full outer: SMJ is the only plan
        "pipeline_corpus_curation",  # doc_id
        "graph_degree_distribution",  # doc_id
        "graph_triangle_count",  # (doc_a, doc_b) closure probe
        "quality_snapshot_diff",  # row-key full diff
        "subq_exists_multi_order_days",  # c_custkey
        # (r18: sim_hybrid_rrf's fusion full outer join left this set —
        # the two post-LIMIT candidate lists now fuse by union +
        # max-aggregation, bit-equal and sort-free)
        # the two cell histograms' full outer join (no broadcast form;
        # both sides are k-cell metadata frames at any corpus size)
        "sim_index_drift_monitor",
        # the SymSpell variant self-join is pinned to sort-merge (r17,
        # guide §3.1): both sides are the corpus-sized exploded-variant
        # frame, whose ExistingRDD size estimate (carried over from the
        # pre-explode checkpoint) tricked the planner into broadcasting
        # ~20M rows at sf1 — a hash relation that grows with the corpus
        # and crosses the 8 GB broadcast cap long before 100 TB
        "dedup_fuzzy_names_symspell",
        # the exact-shingle self-join is pinned to sort-merge for the
        # same reason (r18): both sides are the corpus-shingle-grain
        # explode (2.5M rows at sf1) whose pre-explode size estimate
        # tricked the planner into broadcasting a whole side — caught
        # by the runtime broadcast audit; sf1 A/B ~5.3 -> ~3.7 s
        "dedup_shingle_jaccard",
    }
    id_bearing = __import__("re").compile(r"(_pid|key|_?id($|_))")
    worst = []
    for name, fn in sorted(all_queries().items()):
        if name in iterative:
            continue
        df = fn(spark, sf_dir)
        prof = explain.plan_profile(df)
        if prof["cartesians"] or prof["bnl_joins"]:
            assert name in bounded_cartesian_ok, (name, prof)
        if prof["sort_merge_joins"]:
            assert name in smj_ok, (name, prof)
        assert prof["exchanges"] <= ceilings.get(name, 8), (name, prof)
        # single-partition scale-killer guard: a Window whose spec has
        # no partition keys funnels the whole frame through one task
        if name not in global_window_ok:
            assert not explain.has_global_window(df), name
        # sharded variant of the same guard: every window's partition
        # clause must carry at least one id-bearing (high-cardinality)
        # key, or the query is whitelisted with a grain justification
        if name not in low_card_window_ok:
            for keys in explain.window_partition_keys(df):
                if not keys:
                    continue  # empty clause handled by the guard above
                assert any(id_bearing.search(k.lower()) for k in keys), (
                    name,
                    keys,
                )
        worst.append((prof["exchanges"], name))
    # every plan over the tight default ceiling must be one of the
    # explicitly-justified composites above — and that set stays small
    worst.sort(reverse=True)
    over = {name for n, name in worst if n > 8}
    assert over <= set(ceilings), sorted(over - set(ceilings))
    assert len(ceilings) <= 4, "justified-ceiling set is growing — audit it"


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime filtering: a selective dimension filter injects a bloom
    filter on the fact side's join key, so fact rows that cannot match
    die at the scan instead of riding the shuffle. Thresholds are
    lowered to fire on test-sized data — at 100 TB the defaults (10 GB
    application-side scan) trigger naturally; the point pinned here is
    that the engine's plans are ELIGIBLE for the rewrite (equi-join,
    key pushable to the scan) and results are unchanged."""
    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter("o_totalprice > 400000")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    baseline = sorted(map(tuple, j.collect()))

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j2 = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j2._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:800]
        assert sorted(map(tuple, j2.collect())) == baseline
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tpch_no_unfiltered_fact_agg_under_selective_broadcast(spark, sf_dir):
    """The q2-pathology guard (r9 verdict item 1, promoted r10 item 5):
    no registered TPC-H plan may aggregate an unfiltered fact scan while
    a selective broadcast dim is joined above it — the dim predicate
    must reach below the aggregate as a semi-join prefilter (q20/q2
    structure). Runs the structural detector over every q* query; a
    reverted q2 would fail here, not in the next round's bench."""
    import re

    from data_engineering_zoomcamp_projects_spark.registry import all_queries

    for name, fn in sorted(all_queries().items()):
        if not re.match(r"q\d+_", name):
            continue
        v = explain.unfiltered_fact_agg_under_selective_bhj(fn(spark, sf_dir))
        assert not v, (name, v)


def test_fact_agg_guard_catches_reverted_q2(spark, sf_dir):
    """The guard must FIRE on the exact r9 q2 shape (aggregate first,
    part filter after) — proves the detector detects, so the clean run
    above is evidence and not a no-op."""
    from pyspark.sql import Window

    from data_engineering_zoomcamp_projects_spark.operators.parity import davg

    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
        )
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        davg(F.col("l_extendedprice") / F.col("l_quantity"), "avg_unit", 6)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("avg_unit").asc(), F.col("l_suppkey").asc()
    )
    reverted = (
        part.join(unit, part.p_partkey == unit.l_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    v = explain.unfiltered_fact_agg_under_selective_bhj(reverted)
    assert len(v) == 1 and "semi-join-prefilter" in v[0], v


def test_registry_wide_no_reinlined_expensive_exprs(spark, sf_dir):
    """The CollapseProject-re-inlining guard (the engine's most
    recurrent perf bug — shingles round 8, quantize_int8 round 8,
    repetition_scores round 9 all shipped fixes for it): no registered
    plan may evaluate an identical expensive subtree (HOF/md5, > 60
    rendered chars) twice on one plan line, except the two analyzed
    rows below. A regressed staged projection fails here, not in the
    next round's sweep."""
    from data_engineering_zoomcamp_projects_spark.registry import all_queries

    # EXACT allow-set, each entry analyzed and bounded:
    allow = {
        # predicate pushdown substitutes the rank/total aliases into
        # the median-position filter (rank == lo OR rank == hi), so the
        # two metadata-array folds appear twice each in the pushed
        # predicate — bounded by the <= shards x |segments| array, and
        # a checkpoint barrier would cost more than the re-evaluation
        "agg_median_mode_by_segment",
        # optimizer-inferred generate filters (size(...) > 0 AND
        # isnotnull(...)) duplicate the vocab branch's filter(split())
        # on ONE corpus scan — 2 extra evaluations per row on a single
        # branch, inferred below any projection so staging cannot
        # remove it; not the multi-consumer pathology
        "text_lm_perplexity",
    }
    iterative = {
        "dedup_cluster_components",
        "dedup_cluster_census",
        "ml_kmeans_embeddings",
        "dedup_semantic_semdedup",
        "graph_pagerank_near_dups",
    }
    for name, fn in sorted(all_queries().items()):
        if name in iterative or name in allow:
            continue
        dups = explain.duplicated_expensive_exprs(fn(spark, sf_dir))
        assert not dups, (name, dups)


def test_reinline_detector_catches_unstaged_double_use(spark, sf_dir):
    """The guard must FIRE on an unstaged double use of an expensive
    HOF expression — proves the detector detects, so the clean registry
    run above is evidence and not a no-op."""
    d = load_table(spark, sf_dir, "documents")
    expensive = F.transform(F.split("text", " "), lambda t: F.length(t) * 2)
    df = d.select(
        F.size(F.filter(expensive, lambda x: x > 4)).alias("a"),
        F.element_at(expensive, 1).alias("b"),
    )
    dups = explain.duplicated_expensive_exprs(df)
    assert dups and max(c for c, _ in dups) >= 2, dups


def test_widen_if_narrow_degrades_when_stats_probe_breaks(spark, sf_dir):
    """`widen_if_narrow`'s size probe rides a private JVM accessor
    (`_jdf.queryExecution()...stats()`); a Spark upgrade that moves it
    must degrade to NOT widening (the pre-r11 plan shape, correct
    everywhere) instead of raising inside 20+ certified entries (r11
    verdict nit 1). Duck-typed frame whose `_jdf` raises: the helper
    must return it untouched and never call repartition."""
    from data_engineering_zoomcamp_projects_spark.catalog import widen_if_narrow

    if spark.sparkContext.defaultParallelism < 4:
        pytest.skip("needs >=4 cores for a 1-partition frame to read narrow")
    narrow = spark.range(10).coalesce(1)
    assert narrow.rdd.getNumPartitions() * 4 <= spark.sparkContext.defaultParallelism

    class _ProbeBroken:
        @property
        def rdd(self):
            return narrow.rdd

        @property
        def _jdf(self):
            raise AttributeError("queryExecution moved in this Spark version")

        def repartition(self, n):
            raise AssertionError("must not widen when the size probe fails")

    broken = _ProbeBroken()
    assert widen_if_narrow(spark, broken) is broken


def test_widen_if_narrow_widens_narrow_heavy_scan(spark, sf_dir):
    """Positive pin for the same helper: a single-row-group documents
    scan (1-2 partitions on this testdata) with min_bytes=0 must come
    back at the session default parallelism — and an already-wide frame
    must pass through without an exchange."""
    from data_engineering_zoomcamp_projects_spark.catalog import widen_if_narrow

    target = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if d.rdd.getNumPartitions() * 4 <= target:
        assert widen_if_narrow(spark, d, min_bytes=0).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target)
    assert widen_if_narrow(spark, wide, min_bytes=0) is wide


def test_widen_if_narrow_split_bytes_scales_width(spark, sf_dir):
    """r18 (guide §2.6): with split_bytes set, the widened width is
    ceil(size/split_bytes) clamped to [planned splits, default
    parallelism] — a KB-scale frame widens to a handful of tasks (or
    skips the exchange entirely when the target is no wider than the
    scan), while a huge split target must not narrow below the planned
    count, and a tiny one still caps at the session default."""
    from data_engineering_zoomcamp_projects_spark.catalog import widen_if_narrow

    target = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    parts = d.rdd.getNumPartitions()
    if parts * 4 > target:  # testdata changed shape; nothing to pin
        return
    # tiny split -> saturates at default parallelism (sf1 behavior)
    assert (
        widen_if_narrow(spark, d, min_bytes=0, split_bytes=1).rdd.getNumPartitions()
        == target
    )
    # huge split -> target collapses to the planned count: NO exchange
    assert widen_if_narrow(spark, d, min_bytes=0, split_bytes=1 << 40) is d
    # in-between: strictly between the scan width and the default
    import math

    size = int(d._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    split = max(1, size // (parts * 2 + 1))  # -> ~2*parts+1 tasks
    want = min(target, max(parts, math.ceil(size / split)))
    got = widen_if_narrow(
        spark, d, min_bytes=0, split_bytes=split
    ).rdd.getNumPartitions()
    assert got == want
    assert parts < got < target


def test_sim_index_query_reuses_persisted_index(spark, sf_dir):
    """r12 (verdict item 3): the persisted-ANN-index serve half must
    pay NO corpus-side index construction — no Arrow PQ-code assignment
    stage (MapInPandas) anywhere in the plan, and the corpus side must
    be a parquet scan of the persisted ann_ivfpq table (partitioned by
    cell). The build half, by contrast, must contain that stage —
    proving the absence check checks something."""
    from data_engineering_zoomcamp_projects_spark.llm import similarity

    import os

    qdf = similarity.sim_index_query(spark, sf_dir)
    qplan = qdf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in qplan, "serve plan recomputes PQ codes"
    assert "ann_ivfpq_" in qplan, "serve plan does not scan the persisted index"
    # dynamic partition pruning fires on the cell join: the index scan
    # carries a dynamicpruning PartitionFilter fed by the broadcast
    # query side, so only the nprobe x |queries| probed cells are READ
    # (verified at sf0.001/0.01/0.1) — the inverted-lists read pattern
    # that makes the persisted layout pay at deploy scale
    assert "dynamicpruning" in qplan.lower(), (
        "index scan lost dynamic partition pruning on cell"
    )
    # r13 (self-contained serve): the survivor re-fetch reads the raw
    # vectors from the INDEX table, not the corpus — the plan scans the
    # persisted table at least twice (candidates + re-fetch; DPP
    # subquery renderings can add more)
    assert qplan.count("ann_ivfpq_") >= 2, (
        "survivor re-fetch no longer reads the self-contained index"
    )
    # the on-disk layout really is hive-partitioned by cell (the plan
    # string renders 'cell' regardless, so check the directories —
    # r12 review)
    data_dir = similarity._ann_data_dir(
        similarity.build_ann_index(spark, sf_dir)
    )
    assert any(d.startswith("cell=") for d in os.listdir(data_dir)), (
        "index table lost its cell partitioning"
    )

    bdf = similarity.sim_topk_ivfpq(spark, sf_dir)
    bplan = bdf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in bplan, "live path lost its Arrow code assignment"


def test_generation_diff_scans_prune_to_changed_cells(spark, sf_dir):
    """r15 generation audit diff: the scale claim is that unchanged
    cells never reach Spark — changed cells are discovered driver-side
    by hard-link file identity, and EVERY FileScan in the diff plan
    must then carry a `cell INSET <changed cells>` partition filter
    (static pruning at planning time, no full-table listing). On the
    tt lifecycle the changed set is the takedown slice's cells — a
    strict subset of the table's cells."""
    import os
    import re

    from data_engineering_zoomcamp_projects_spark.llm import similarity

    path, gens = similarity._tt_lifecycle(spark, sf_dir)
    df = similarity.diff_ann_index_generations(spark, path, min(gens), max(gens))
    # default maxMetadataStringLength truncates long INSET lists with
    # an ellipsis, which is exactly how the old subset assertion could
    # go vacuous (r15 ADVICE) — render the plan untruncated
    old_len = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old_len)
    # (a still-truncated INSET can't pass: the per-scan equality below
    # fails loudly on any missing member)
    scans = plan.count("FileScan parquet")
    assert scans >= 4, plan[:500]  # two generations x (ids + rows) sides
    pfilters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert len(pfilters) == scans
    insets = [p for p in pfilters if "INSET" in p or "isin" in p or " IN " in p]
    assert len(insets) == scans, f"unpruned diff scan: {pfilters}"
    # exact equality with the driver-side changed-cell set (r15
    # ADVICE): parse EVERY scan's INSET value list and require it to
    # be precisely the takedown slice's cells — the old single-scan
    # "non-empty strict subset" check could pass vacuously under
    # zero-padded or divergent INSET renderings
    expected = {
        int(r["cell"])
        for r in similarity._read_ann_index(
            spark,
            path,
            data_dir=similarity._ann_data_dir(path, min(gens)),
        )
        .filter(F.col("vec_id") % 10 == similarity.DELETED_SLICE_MOD)
        .select("cell")
        .distinct()
        .collect()
    }
    all_cells = {
        int(d.split("=", 1)[1])
        for d in os.listdir(similarity._ann_data_dir(path, max(gens)))
        if d.startswith("cell=")
    }
    assert expected and expected < all_cells, (expected, all_cells)
    for p in insets:
        m = re.search(r"INSET ([0-9,\s]+)", p)
        assert m, f"unparseable partition filter rendering: {p}"
        got = {int(x) for x in m.group(1).replace(",", " ").split()}
        assert got == expected, (
            f"scan pruned to {sorted(got)}, takedown touched "
            f"{sorted(expected)}: {p}"
        )


def test_filtered_serve_pushes_predicate_into_pruned_index_scan(spark, sf_dir):
    """r13 filtered vector search: the label predicate must evaluate
    INSIDE the index scan (PushedFilters on the parquet source — the
    attribute lives in the v4 table, so filtering costs zero extra
    passes), while the serve chain keeps its two scale properties: no
    corpus-side code recomputation (no MapInPandas) and dynamic
    partition pruning on the probed cells. The unfiltered serve must
    NOT read the label column at all (column pruning keeps its scan as
    narrow as v3's)."""
    import re

    from data_engineering_zoomcamp_projects_spark.llm import similarity

    fdf = similarity.sim_index_query_filtered(spark, sf_dir)
    fplan = fdf._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in fplan, "filtered serve recomputes PQ codes"
    assert "dynamicpruning" in fplan.lower(), (
        "filtered serve lost dynamic partition pruning on cell"
    )
    assert re.search(r"PushedFilters: \[[^\]]*label", fplan), (
        "label predicate is not pushed into the index scan"
    )

    qdf = similarity.sim_index_query(spark, sf_dir)
    qplan = qdf._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"ReadSchema: [^\n]*label", qplan), (
        "unfiltered serve reads the label column it never uses"
    )


def test_ann_index_rebuilds_on_fingerprint_change(spark, sf_dir):
    """The index meta sidecar carries the (data, geometry) fingerprint:
    a matching fingerprint returns the existing directory without a
    Spark job; a clobbered fingerprint triggers a full rebuild that
    restores byte-identical content (assignment and codes are
    deterministic)."""
    import json
    import os

    from data_engineering_zoomcamp_projects_spark.llm import similarity

    path = similarity.build_ann_index(spark, sf_dir)
    meta = os.path.join(path, "_ann_meta.json")
    rows1 = sorted(
        tuple(r) for r in similarity.sim_index_build(spark, sf_dir).collect()
    )
    with open(meta) as fh:
        saved = json.load(fh)
    with open(meta, "w") as fh:
        json.dump({"fp": "stale"}, fh)
    assert similarity.build_ann_index(spark, sf_dir) == path
    with open(meta) as fh:
        assert json.load(fh) == saved  # rebuilt, fingerprint restored
    rows2 = sorted(
        tuple(r) for r in similarity.sim_index_build(spark, sf_dir).collect()
    )
    assert rows1 == rows2
