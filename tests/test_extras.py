"""Determinism checks for rows-only extras (sampling, approx sketches)."""

from __future__ import annotations

from data_engineering_zoomcamp_projects_spark.operators import extras


def test_seeded_sample_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, extras.sample_fraction(spark, sf_dir).collect()))
    b = sorted(map(tuple, extras.sample_fraction(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0


def test_approx_percentile_close_to_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["median"]
        for r in extras.agg_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_median"]
        for r in extras.agg_percentile_approx(spark, sf_dir).collect()
    }
    for flag, med in exact.items():
        assert abs(approx[flag] - med) / med < 0.05


def test_salted_join_equals_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        skew.salted_join(li, orders, "l_orderkey", "o_orderkey", salt_buckets=4)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_sum_equals_plain(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("s")
    )
    salted = skew.salted_sum(li, "l_returnflag", F.col("l_quantity"), "s", 4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_upsert_last_writer_wins(spark):
    from data_engineering_zoomcamp_projects_spark.ingest.upsert import upsert

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, x int"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k int, v string, x int"
    )
    out = {r["k"]: (r["v"], r["x"]) for r in upsert(target, updates, "k").collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_scd2_versioning(spark):
    from data_engineering_zoomcamp_projects_spark.ingest.upsert import scd2_apply

    dim = spark.createDataFrame(
        [(1, "old", "2020-01-01", 1)],
        "k int, attr string, effective_from string, is_current int",
    )
    changes = spark.createDataFrame(
        [(1, "new", "2021-01-01")], "k int, attr string, effective_from string"
    )
    out = scd2_apply(dim, changes, "k")
    rows = {(r["attr"]): r["is_current"] for r in out.collect()}
    assert rows == {"old": 0, "new": 1}
    assert out.count() == 2


def test_applyinpandas_zscore_matches_window(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.ml import ml_segment_zscores

    got = {
        r["o_orderkey"]: r["z"] for r in ml_segment_zscores(spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment")
    want = j.select(
        "o_orderkey",
        (
            (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
            / F.stddev_samp("o_totalprice").over(w)
        ).alias("z"),
    ).collect()
    for r in want:
        assert abs(got[r["o_orderkey"]] - r["z"]) < 1e-9


def test_salted_join_rejects_dim_duplicating_types(spark, sf_dir):
    """right/full outer joins would emit one copy of each unmatched dim
    row PER SALT BUCKET — the helper must refuse them."""
    import pytest

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.operators import skew

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            skew.salted_join(li, orders, "l_orderkey", "o_orderkey", how=how)
