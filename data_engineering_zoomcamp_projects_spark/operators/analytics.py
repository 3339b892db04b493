"""Product-analytics workloads over the events stream table (round-2
additions; registered past the certified driver windows): cohort
retention, sequential funnels, RFM user scoring, daily-active rollups —
the interactive-analytics query family a warehouse user runs daily.

Scale notes: every query aggregates to (user) or (day) grain first —
the events fact is touched once; the user-grain intermediates are
orders of magnitude smaller than the fact table, so the follow-on
joins/windows are cheap. The one global sort (RFM ntile) runs on the
USER-grain frame (|users| rows, not |events|); at extreme user counts
swap ntile for approx-quantile bucket boundaries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import DEC, dsum, sql_dsum, ts_str


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-seen
    day, activity counted per week offset since the cohort day."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("act_day")).distinct()
    return (
        activity.join(first_day, "user_id")
        .withColumn(
            "week_offset",
            F.floor(F.datediff("act_day", "cohort_day") / 7).cast("int"),
        )
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_offset",
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "week_offset")
    )


COHORT_SQL = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(FLOOR(datediff('day', cohort_day, act_day) / 7) AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM activity JOIN first_day USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_day, week_offset
"""


def _funnel_stage_times(ev: DataFrame) -> DataFrame:
    """Per-user funnel stage times (t_s, t_v, t_c, t_p) via a chain of
    unbounded-frame window mins partitioned by user_id: stage k's time
    is the min ts of its event type strictly after stage k-1's time.

    ONE exchange: all four windows share the same partitioning and an
    unbounded frame needs no sort, so Catalyst plans a single shuffle
    on user_id feeding four streaming Window operators, and the
    user-grain reduction afterwards reuses the partitioning. Per-row
    state is O(1) — a running conditional min — so a pathological user
    with millions of events costs nothing but their row count (the
    round-4 plan collected each user's full sorted event array into a
    single aggregate() fold; its per-user state was 'bounded' only by
    assumption, and a 1M-event user materialized a ~40 MB array in one
    task). The fold twin is kept below and pinned equal by
    tests/test_analytics_ops.py."""
    w = Window.partitionBy("user_id")
    t_s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = ev.select("user_id", "ts", "event_type").withColumn("t_s", t_s)
    for col, typ, prev in (
        ("t_v", "view", "t_s"),
        ("t_c", "click", "t_v"),
        ("t_p", "purchase", "t_c"),
    ):
        staged = staged.withColumn(
            col,
            F.min(
                F.when(
                    (F.col("event_type") == typ) & (F.col("ts") > F.col(prev)),
                    F.col("ts"),
                )
            ).over(w),
        )
    return staged.groupBy("user_id").agg(
        F.first("t_s").alias("t_s"),
        F.first("t_v").alias("t_v"),
        F.first("t_c").alias("t_c"),
        F.first("t_p").alias("t_p"),
    )


def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 4-stage funnel (signup -> view -> click -> purchase):
    each stage's timestamp must be strictly after the previous stage's
    first occurrence (see `_funnel_stage_times` for the bounded-state
    single-shuffle plan; the DuckDB oracle keeps the decomposed
    per-stage min-join form)."""
    ev = load_table(spark, sf_dir, "events")
    stages = _funnel_stage_times(
        ev.filter(F.col("event_type").isin("signup", "view", "click", "purchase"))
    ).filter(F.col("t_s").isNotNull())
    return stages.agg(
        F.count("t_s").alias("n_signup"),
        F.count("t_v").alias("n_view_after_signup"),
        F.count("t_c").alias("n_click_after_view"),
        F.count("t_p").alias("n_purchase_after_click"),
    )


def _funnel_fold_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 sorted-array aggregate() fold formulation — NOT
    registered. Kept as the semantic twin the window-chain plan is
    pinned equal to (same first-occurrence-strictly-after semantics,
    different state bound: this one materializes each user's full
    event array)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin("signup", "view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
        )
    )
    ts_null = F.lit(None).cast("timestamp")
    zero = F.struct(
        ts_null.alias("s"), ts_null.alias("v"), ts_null.alias("c"), ts_null.alias("p")
    )

    def step(st, e):
        return F.struct(
            F.when(
                st["s"].isNull() & (e["event_type"] == "signup"), e["ts"]
            ).otherwise(st["s"]).alias("s"),
            F.when(
                st["v"].isNull()
                & (e["event_type"] == "view")
                & st["s"].isNotNull()
                & (e["ts"] > st["s"]),
                e["ts"],
            ).otherwise(st["v"]).alias("v"),
            F.when(
                st["c"].isNull()
                & (e["event_type"] == "click")
                & st["v"].isNotNull()
                & (e["ts"] > st["v"]),
                e["ts"],
            ).otherwise(st["c"]).alias("c"),
            F.when(
                st["p"].isNull()
                & (e["event_type"] == "purchase")
                & st["c"].isNotNull()
                & (e["ts"] > st["c"]),
                e["ts"],
            ).otherwise(st["p"]).alias("p"),
        )

    folded = per_user.select(F.aggregate("seq", zero, step).alias("st")).filter(
        F.col("st.s").isNotNull()
    )
    return folded.agg(
        F.count("st.s").alias("n_signup"),
        F.count("st.v").alias("n_view_after_signup"),
        F.count("st.c").alias("n_click_after_view"),
        F.count("st.p").alias("n_purchase_after_click"),
    )


#: rolling-distinct window length (days, inclusive of current)
ROLLING_DAYS = 7
#: HLL tolerance for the certified invariant (lgConfigK default 12 ->
#: ~2.5% rsd; 5% is a comfortable certified bound)
ROLLING_HLL_TOL = 0.05


def events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users via MERGEABLE Apache DataSketches
    HLL: one sketch per day (map-side partials), then a bounded 7-day
    spine self-join unions the daily sketches per window — the property
    that makes sliding distinct counts tractable at 100 TB, where the
    exact form re-scans a week of raw events per day. Certification
    follows the agg_approx_count_distinct playbook: emit the EXACT
    rolling distinct plus a within-tolerance boolean; sketch bytes are
    engine-specific and never cross the comparator.

    Scale: the expensive pass is one day-grain sketch aggregation over
    the events scan; the union stage joins |days| x 7 sketch rows —
    metadata grain. The exact twin (needed only for certification)
    pays the week-re-scan; production runs the sketch branch alone."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    # expand-by-offsets (the join_range_trailing_shipments pattern):
    # each day contributes to the <= 7 window days [day, day+6], so one
    # explode turns the range condition into EQUI joins/groupBys — a
    # range-predicate formulation planned as BroadcastNestedLoop
    # against the day spine (|events| x |days| predicate tests)
    offsets = F.explode(F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1))).alias("i")
    spine = ev.select("day").distinct().select(F.col("day").alias("w_day"))
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    approx = (
        daily.select("day", "sk", offsets)
        .select(F.date_add("day", F.col("i")).alias("w_day"), "sk")
        .join(spine, "w_day")  # windows ending past the data edge drop
        .groupBy("w_day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
    )
    exact = (
        ev.select("day", "user_id", offsets)
        .select(F.date_add("day", F.col("i")).alias("w_day"), "user_id")
        .join(spine, "w_day")
        .groupBy("w_day")
        .agg(F.countDistinct("user_id").alias("exact_rolling_users"))
    )
    return (
        exact.join(approx, "w_day")
        .select(
            F.date_format("w_day", "yyyy-MM-dd").alias("day"),
            "exact_rolling_users",
            (
                F.abs(F.col("_est") - F.col("exact_rolling_users"))
                <= ROLLING_HLL_TOL * F.col("exact_rolling_users")
            ).alias("hll_within_tol"),
        )
        .orderBy("day")
    )


ROLLING_DISTINCT_SQL = f"""
WITH ex AS (
  SELECT CAST(ts AS DATE) + INTERVAL (i) DAY AS w_day, user_id
  FROM events, (SELECT unnest(generate_series(0, {ROLLING_DAYS - 1})) AS i) g
), days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS w_day FROM events
)
SELECT strftime(ex.w_day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS exact_rolling_users,
       TRUE AS hll_within_tol
FROM ex JOIN days ON ex.w_day = days.w_day
GROUP BY ex.w_day ORDER BY day
"""


#: timeline export cap: first N events per user (bounded output rows)
TIMELINE_MAX_EVENTS = 20


def events_user_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event timelines — the behavioral-sequence
    export a sequence model trains on: each user's first N events
    rendered as one 'ts:type' string in strict (ts, event_id) order.
    This is the ordered list-aggregation surface (SQL LISTAGG WITHIN
    GROUP): Spark has no ordered listagg, so the deterministic form is
    a row_number PREFILTER (rk <= N) feeding sort_array(collect_list)
    — the struct sort key makes the order total, and because the
    filter runs BEFORE the aggregate, per-user collected state is
    bounded at N rows no matter how many events a pathological user
    has (collect-then-slice would materialize the full per-user array
    in one task — the exact unbounded-state trap the funnel rework
    removed). One shuffle: the window and the aggregate share the
    user_id partitioning. DuckDB's oracle is the native
    string_agg(ORDER BY) over the same prefilter."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    staged = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(wall))
        .filter(F.col("rk") <= TIMELINE_MAX_EVENTS)
    )
    item = F.struct(F.col("rk"), F.col("ts"), F.col("event_type"))
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(item)),
            lambda x: F.concat_ws(
                ":",
                F.date_format(x["ts"], "yyyy-MM-dd HH:mm:ss"),
                x["event_type"],
            ),
        ),
        "|",
    )
    return (
        staged.groupBy("user_id")
        .agg(
            F.first("n_events").alias("n_events"),
            rendered.alias("timeline"),
        )
        .orderBy("user_id")
    )


TIMELINE_SQL = f"""
WITH ranked AS (
  SELECT user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id, n_events,
       string_agg(strftime(ts, '%Y-%m-%d %H:%M:%S') || ':' || event_type,
                  '|' ORDER BY rk) AS timeline
FROM ranked WHERE rk <= {TIMELINE_MAX_EVENTS}
GROUP BY user_id, n_events ORDER BY user_id
"""


#: conversion window for events_funnel_windowed (stage k must land
#: within this many hours of stage k-1)
CONV_HOURS = 72


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: like events_funnel_stages, but each
    stage must occur WITHIN 72 hours of the previous stage's first
    occurrence — the product-analytics distinction between "eventually
    converted" and "converted while the intent was live". Same
    bounded-state single-shuffle window-chain plan; the deadline is one
    extra predicate inside each conditional min, so per-row state stays
    O(1)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "view", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    t_s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = ev.select("user_id", "ts", "event_type").withColumn("t_s", t_s)
    deadline = F.expr(f"INTERVAL {CONV_HOURS} HOURS")
    for col, typ, prev in (
        ("t_v", "view", "t_s"),
        ("t_c", "click", "t_v"),
        ("t_p", "purchase", "t_c"),
    ):
        staged = staged.withColumn(
            col,
            F.min(
                F.when(
                    (F.col("event_type") == typ)
                    & (F.col("ts") > F.col(prev))
                    & (F.col("ts") <= F.col(prev) + deadline),
                    F.col("ts"),
                )
            ).over(w),
        )
    per_user = staged.groupBy("user_id").agg(
        F.first("t_s").alias("t_s"),
        F.first("t_v").alias("t_v"),
        F.first("t_c").alias("t_c"),
        F.first("t_p").alias("t_p"),
    )
    return per_user.filter(F.col("t_s").isNotNull()).agg(
        F.count("t_s").alias("n_signup"),
        F.count("t_v").alias("n_view_72h"),
        F.count("t_c").alias("n_click_72h"),
        F.count("t_p").alias("n_purchase_72h"),
    )


FUNNEL_WINDOWED_SQL = f"""
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s1 AS (
  SELECT s0.user_id, t_signup, MIN(e.ts) AS t_view
  FROM s0 LEFT JOIN events e
    ON e.user_id = s0.user_id AND e.event_type = 'view'
   AND e.ts > s0.t_signup AND e.ts <= s0.t_signup + INTERVAL {CONV_HOURS} HOUR
  GROUP BY s0.user_id, t_signup
), s2 AS (
  SELECT s1.user_id, t_signup, t_view, MIN(e.ts) AS t_click
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
   AND e.ts > s1.t_view AND e.ts <= s1.t_view + INTERVAL {CONV_HOURS} HOUR
  GROUP BY s1.user_id, t_signup, t_view
), s3 AS (
  SELECT s2.user_id, t_signup, t_view, t_click, MIN(e.ts) AS t_purchase
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
   AND e.ts > s2.t_click AND e.ts <= s2.t_click + INTERVAL {CONV_HOURS} HOUR
  GROUP BY s2.user_id, t_signup, t_view, t_click
)
SELECT COUNT(t_signup) AS n_signup,
       COUNT(t_view) AS n_view_72h,
       COUNT(t_click) AS n_click_72h,
       COUNT(t_purchase) AS n_purchase_72h
FROM s3
"""


FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s1 AS (
  SELECT s0.user_id, t_signup, MIN(e.ts) AS t_view
  FROM s0 LEFT JOIN events e
    ON e.user_id = s0.user_id AND e.event_type = 'view' AND e.ts > s0.t_signup
  GROUP BY s0.user_id, t_signup
), s2 AS (
  SELECT s1.user_id, t_signup, t_view, MIN(e.ts) AS t_click
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click' AND e.ts > s1.t_view
  GROUP BY s1.user_id, t_signup, t_view
), s3 AS (
  SELECT s2.user_id, t_signup, t_view, t_click, MIN(e.ts) AS t_purchase
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY s2.user_id, t_signup, t_view, t_click
)
SELECT COUNT(t_signup) AS n_signup,
       COUNT(t_view) AS n_view_after_signup,
       COUNT(t_click) AS n_click_after_view,
       COUNT(t_purchase) AS n_purchase_after_click
FROM s3
"""


def _exact_ntile(df: DataFrame, n: int, sort_cols: list, out_name: str) -> DataFrame:
    """Exact NTILE(n) OVER (ORDER BY sort_cols) with NO single-partition
    sort (the round-2 scale-killer: a global ntile window funnels the
    whole frame through one task).

    Distributed plan: range-partition the frame on its (unique) total
    ordering, row_number WITHIN each range shard, add broadcast
    per-shard prefix offsets to recover the global rank, then map rank
    -> bucket with NTILE's size rule (the first N mod n buckets take
    ceil(N/n) rows, the rest floor(N/n)). Bit-identical to the window
    ntile because the ordering is unique (user_id tie-break), while
    every exchange stays parallel: the only non-sharded frames are the
    per-shard counts (<= shuffle-partitions rows, broadcast) and the
    scalar total. Requires df to carry the total row count in column
    `_n_total`.

    The range-sharded frame is barriered with a LAZY localCheckpoint:
    the per-shard counts and the ranked rows then read the SAME RDD, so
    identical range bounds are guaranteed by construction (not by
    sampler-seed luck), and chained ntile calls stop doubling the
    rendered plan — each stage starts from the checkpointed scan
    instead of re-inlining the whole upstream tree.

    Callers pass desc orderings as `col.desc_nulls_last()` (NOT a
    negation trick): Spark's and DuckDB's DESC both place NULLs last,
    while negating a NULL yields NULL which would sort FIRST under asc
    — an all-NULL metric would silently land in bucket 1 instead of 5.
    """
    shards = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(shards, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # ONE scalar row holding every shard's count as a sorted array
    # (<= shards entries — metadata-sized). Prefix offsets are then a
    # per-row HOF fold over the broadcast array: no global window, no
    # triangular join, and `ranged` is referenced only twice (keeps the
    # rendered plan tree from exploding when ntiles are chained).
    cnts = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .agg(
            F.sort_array(F.collect_list(F.struct("_pid", "_cnt"))).alias(
                "_shard_cnts"
            )
        )
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    off = F.aggregate(
        F.filter(
            F.col("_shard_cnts"), lambda s: s["_pid"] < F.col("_pid")
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["_cnt"],
    )
    # STAGE the global rank as a named column before the bucket math:
    # `bucket` references the rank THREE times, and an inline
    # (off + row_number) expression gets re-inlined per reference —
    # three per-row folds over the broadcast shard array instead of one
    # (the repo's CollapseProject pathology, caught by the round-10
    # re-inlining guard in tests/test_plans.py)
    staged = (
        ranged.crossJoin(F.broadcast(cnts))
        .withColumn("_g_rank", (off + F.row_number().over(w)).cast("long"))
    )
    rank = F.col("_g_rank")
    ntot = F.col("_n_total")
    q = F.floor(ntot / n).cast("long")  # small-bucket size
    rem = (ntot % n).cast("long")  # number of big (q+1) buckets
    big = q + F.lit(1)
    in_big = rank <= rem * big
    bucket = F.when(in_big, F.floor((rank - 1) / big) + 1).otherwise(
        rem + F.floor((rank - rem * big - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return staged.withColumn(out_name, bucket.cast("int")).drop(
        "_pid", "_shard_cnts", "_g_rank"
    )


def events_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM scoring: recency (days since last activity vs corpus max
    day), frequency (event count), monetary (decimal-exact value sum),
    each bucketed into quintiles over a unique ordering. Quintiles come
    from _exact_ntile (range-sharded distributed rank), matching the
    oracle's NTILE(5) windows without any single-partition sort."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("value"), "monetary"),
    )
    # ref day AND the ntile row count both derive from the user-grain
    # frame itself (one events scan total): max(last_day) == corpus max
    # day, and counting base ROWS (not count_distinct over raw events)
    # keeps a NULL-user group in the N the bucket formula divides by.
    ref = base.agg(
        F.max("last_day").alias("ref_day"),
        F.count(F.lit(1)).alias("_n_total"),
    )
    scored = base.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff("ref_day", "last_day").cast("int")
    )
    uid = F.col("user_id").asc_nulls_last()
    scored = _exact_ntile(
        scored, 5, [F.col("recency_days").asc_nulls_last(), uid], "r_score"
    )
    scored = _exact_ntile(
        scored, 5, [F.col("frequency").desc_nulls_last(), uid], "f_score"
    )
    scored = _exact_ntile(
        scored, 5, [F.col("monetary").desc_nulls_last(), uid], "m_score"
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )


RFM_SQL = f"""
WITH base AS (
  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         {sql_dsum('value', 'monetary')}
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(datediff('day', last_day, (SELECT MAX(CAST(ts AS DATE)) FROM events)) AS INT) AS recency_days,
       frequency, monetary,
       NTILE(5) OVER (ORDER BY datediff('day', last_day,
           (SELECT MAX(CAST(ts AS DATE)) FROM events)) ASC NULLS LAST,
           user_id ASC NULLS LAST) AS r_score,
       NTILE(5) OVER (ORDER BY frequency DESC NULLS LAST,
           user_id ASC NULLS LAST) AS f_score,
       NTILE(5) OVER (ORDER BY monetary DESC NULLS LAST,
           user_id ASC NULLS LAST) AS m_score
FROM base
"""


def events_daily_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into new vs returning (first-seen day
    join) — the dashboard rollup every events pipeline serves."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    return (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .join(first_day, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.countDistinct(
                F.when(F.col("first_day") == F.col("day"), F.col("user_id"))
            ).alias("new_users"),
        )
        .withColumn("returning_users", (F.col("dau") - F.col("new_users")).cast("long"))
        .orderBy("day")
    )


DAILY_ACTIVES_SQL = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(DISTINCT CASE WHEN first_day = day THEN user_id END) AS new_users,
       CAST(COUNT(DISTINCT user_id)
            - COUNT(DISTINCT CASE WHEN first_day = day THEN user_id END) AS BIGINT)
         AS returning_users
FROM act JOIN first_day USING (user_id)
GROUP BY day ORDER BY day
"""


#: inactivity gap that closes a session (the same 30 minutes the
#: streaming session_window twin uses — streaming/batch_parity.py)
_SESSION_GAP_US = 30 * 60 * 1_000_000


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: assign every event a per-user session
    sequence number (a >30-minute silence starts a new session), then
    roll up to session grain — start/end, event count, decimal-exact
    value sum. This is the session-ID ASSIGNMENT op (the table a
    product-analytics warehouse joins everything else against);
    `stream_session_30m` is its windowed-aggregate streaming twin.

    One shuffle does all the window work: the gap flag (lag) and the
    running flag-sum share the same (user_id, ts, event_id) partition
    and ordering, so Catalyst plans a single Window operator chain over
    one exchange; the session-grain groupBy is the only other shuffle.
    user_id is a high-cardinality key — no task ever sees more than one
    user's events, so the plan survives any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts"))
    order = [micros.asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap = micros - F.lag(micros).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0).alias(
            "is_start"
        ),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = flagged.withColumn(
        "session_seq", F.sum("is_start").over(wrun).cast("int")
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("_t0"),
            F.max("ts").alias("_t1"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "session_value"),
        )
        .select(
            "user_id",
            "session_seq",
            ts_str(F.col("_t0"), "session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ts_str(F.col("_t1"), "session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            "n_events",
            "session_value",
        )
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value', 'session_value')}
FROM sess GROUP BY 1, 2
"""


def timeseries_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: project sparse observations (big
    purchases) onto the full daily calendar — zero-fill the per-day
    aggregates and FORWARD-FILL the last observed daily total
    (last+ignorenulls over an ordered frame). The calendar spine comes
    from sequence() over the observed min/max day: no driver loop, and
    the spine's size is days, not rows."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 340))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = sparse.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("day_sum"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.coalesce("day_sum", F.lit(0.0)).alias("day_sum"),
            F.coalesce(
                F.last("day_sum", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("ffill_day_sum"),
        )
        .orderBy("day")
    )


GAPFILL_SQL = """
WITH sparse AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_obs,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS day_sum
  FROM events WHERE event_type = 'purchase' AND value > 340
  GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(CAST(ts AS DATE)) FROM events),
           (SELECT MAX(CAST(ts AS DATE)) FROM events),
           INTERVAL 1 DAY)) AS DATE) AS day
)
SELECT strftime(spine.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs,
       COALESCE(day_sum, 0.0) AS day_sum,
       COALESCE(last_value(day_sum IGNORE NULLS) OVER (
           ORDER BY spine.day ROWS UNBOUNDED PRECEDING), 0.0) AS ffill_day_sum
FROM spine LEFT JOIN sparse ON spine.day = sparse.day
ORDER BY day
"""


def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across calendar gaps: observed days carry
    their value; missing days get prev + (next-prev) * elapsed/gap
    between the bracketing observations (edges stay null-safe via
    coalesce to the one-sided neighbor). The standard sensor/market
    regularization step one past forward-fill.

    Scale: same spine-join shape as gapfill; the interpolation itself
    is two ignorenulls window passes (backward + forward) over #days
    rows — the pre-aggregate to day grain keeps the global window
    admissible."""
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 250))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = sparse.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("day_sum"),
    )
    joined = spine.join(daily, "day", "left").withColumn(
        "obs_day", F.when(F.col("day_sum").isNotNull(), F.col("day"))
    )
    wb = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last("day_sum", ignorenulls=True).over(wb)
    next_v = F.first("day_sum", ignorenulls=True).over(wf)
    prev_d = F.last("obs_day", ignorenulls=True).over(wb)
    next_d = F.first("obs_day", ignorenulls=True).over(wf)
    gap = F.datediff(next_d, prev_d)
    interp = F.when(F.col("day_sum").isNotNull(), F.col("day_sum")).otherwise(
        F.coalesce(
            prev_v + (next_v - prev_v) * F.datediff(F.col("day"), prev_d) / gap,
            prev_v,
            next_v,
        )
    )
    return (
        joined.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("day_sum").isNotNull().alias("observed"),
            # zero-observation corpus -> whole series 0.0 (null doubles
            # render None-vs-NaN across engines; same dsum0 discipline)
            F.coalesce(F.round(interp, 6), F.lit(0.0)).alias("value_interp"),
        )
        .orderBy("day")
    )


INTERPOLATE_SQL = """
WITH sparse AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS day_sum
  FROM events WHERE event_type = 'purchase' AND value > 250
  GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT MIN(CAST(ts AS DATE)) FROM events),
           (SELECT MAX(CAST(ts AS DATE)) FROM events),
           INTERVAL 1 DAY)) AS DATE) AS day
), j AS (
  SELECT spine.day, day_sum,
         CASE WHEN day_sum IS NOT NULL THEN spine.day END AS obs_day
  FROM spine LEFT JOIN sparse ON spine.day = sparse.day
), w AS (
  SELECT day, day_sum,
    last_value(day_sum IGNORE NULLS) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_v,
    first_value(day_sum IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    last_value(obs_day IGNORE NULLS) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_d,
    first_value(obs_day IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM j
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       day_sum IS NOT NULL AS observed,
       COALESCE(ROUND(CASE WHEN day_sum IS NOT NULL THEN day_sum
             ELSE COALESCE(
               prev_v + (next_v - prev_v)
                 * CAST(date_diff('day', prev_d, day) AS DOUBLE)
                 / CAST(date_diff('day', prev_d, next_d) AS DOUBLE),
               prev_v, next_v) END, 6), 0.0) AS value_interp
FROM w ORDER BY day
"""


def timeseries_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly purchase revenue with
    absolute and percent change vs the prior week (lag over the weekly
    grain). Weeks keyed by their Monday (date_trunc 'week' agrees
    across engines). Pre-aggregation to week grain bounds the window
    input at any scale."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"))
        .agg(
            F.round(F.sum(F.col("value").cast(DEC)), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
        )
    )
    w = Window.orderBy("week")
    prev = F.lag("revenue").over(w)
    return (
        weekly.select(
            "week",
            "revenue",
            "n_purchases",
            # first week has no prior: render 0.0, not NULL (engine
            # null-double rendering diverges None-vs-NaN)
            F.coalesce(F.round(F.col("revenue") - prev, 2), F.lit(0.0)).alias(
                "wow_abs"
            ),
            F.coalesce(
                F.round((F.col("revenue") - prev) / prev * 100.0, 4), F.lit(0.0)
            ).alias("wow_pct"),
        )
        .orderBy("week")
    )


WOW_SQL = """
WITH weekly AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT week, revenue, n_purchases,
       COALESCE(ROUND(revenue - lag(revenue) OVER (ORDER BY week), 2), 0.0) AS wow_abs,
       COALESCE(ROUND((revenue - lag(revenue) OVER (ORDER BY week))
             / lag(revenue) OVER (ORDER BY week) * 100.0, 4), 0.0) AS wow_pct
FROM weekly ORDER BY week
"""


QUERIES = {
    "timeseries_daily_gapfill": timeseries_daily_gapfill,
    "timeseries_interpolate": timeseries_interpolate,
    "timeseries_wow_change": timeseries_wow_change,
    "events_cohort_retention": events_cohort_retention,
    "events_funnel_stages": events_funnel_stages,
    "events_funnel_windowed": events_funnel_windowed,
    "events_user_timeline": events_user_timeline,
    "events_rolling_distinct_hll": events_rolling_distinct_hll,
    "events_user_rfm": events_user_rfm,
    "events_daily_actives": events_daily_actives,
    "events_sessionize": events_sessionize,
}

ORACLES = {
    "timeseries_daily_gapfill": GAPFILL_SQL,
    "timeseries_interpolate": INTERPOLATE_SQL,
    "timeseries_wow_change": WOW_SQL,
    "events_cohort_retention": COHORT_SQL,
    "events_funnel_stages": FUNNEL_SQL,
    "events_funnel_windowed": FUNNEL_WINDOWED_SQL,
    "events_user_timeline": TIMELINE_SQL,
    # promoted round 6 (held out of the full round-5 window; pinned by
    # tests/test_analytics_ops.py::test_rolling_distinct_hll)
    "events_rolling_distinct_hll": ROLLING_DISTINCT_SQL,
    "events_user_rfm": RFM_SQL,
    "events_daily_actives": DAILY_ACTIVES_SQL,
    "events_sessionize": SESSIONIZE_SQL,
}
