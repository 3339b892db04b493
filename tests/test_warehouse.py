"""Semantic unit tests for the warehouse-shaping family
(operators/warehouse.py). Oracle parity for every query is covered by
test_oracle_parity.py; these pin the semantics the oracle can't state
as crisply — SCD2 collapse rules, pivot zero-fill, unpivot row
algebra, exact-median positions — on tiny inline frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_zoomcamp_projects_spark.operators import warehouse


def test_scd2_collapses_consecutive_and_flags_current(spark, tmp_path, sf_dir):
    """One customer: priorities H,H,L,H across four dated orders must
    produce THREE versions (the consecutive H,H collapses), contiguous
    validity intervals, and exactly one open current row."""
    import datetime as dt

    rows = [
        (1, 10, dt.datetime(2024, 1, 1), "HIGH"),
        (1, 11, dt.datetime(2024, 2, 1), "HIGH"),
        (1, 12, dt.datetime(2024, 3, 1), "LOW"),
        (1, 13, dt.datetime(2024, 4, 1), "HIGH"),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderdate timestamp, o_orderpriority string"
    ).withColumn("o_orderstatus", F.lit("O")).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    path = str(tmp_path / "orders.parquet")
    df.write.parquet(path)
    # point load_table at the temp dir by writing the one table we read
    out = warehouse.orders_scd2_priority(spark, str(tmp_path)).collect()
    got = [(r["priority"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out]
    assert got == [
        ("HIGH", "2024-01-01", "2024-03-01", 0),
        ("LOW", "2024-03-01", "2024-04-01", 0),
        ("HIGH", "2024-04-01", None, 1),
    ]


def test_pivot_fills_missing_types_with_zero(spark, sf_dir):
    out = warehouse.events_pivot_daily_types(spark, sf_dir)
    assert out.columns == ["day"] + warehouse.EVENT_TYPES
    # no nulls anywhere: absent (day, type) combinations must read 0
    nulls = out.select(
        [F.count(F.when(F.col(t).isNull(), 1)).alias(t) for t in warehouse.EVENT_TYPES]
    ).collect()[0]
    assert all(v == 0 for v in nulls.asDict().values())


def test_unpivot_doubles_rows(spark, sf_dir):
    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    n_parts = load_table(spark, sf_dir, "part").count()
    out = warehouse.part_unpivot_metrics(spark, sf_dir)
    assert out.count() == 2 * n_parts
    metrics = {r["metric"] for r in out.select("metric").distinct().collect()}
    assert metrics == {"p_size", "p_retailprice"}


def test_exact_median_even_and_odd(spark, tmp_path):
    """Median positions floor((n+1)/2), floor((n+2)/2): odd group ->
    the single middle value, even group -> mean of the two middles."""
    rows = [("A", float(v), i) for i, v in enumerate([10, 20, 30])] + [
        ("B", float(v), i + 10) for i, v in enumerate([1, 2, 3, 100])
    ]
    df = spark.createDataFrame(
        rows, "c_mktsegment string, c_acctbal double, c_custkey long"
    ).withColumn("c_name", F.lit("x")).withColumn("c_nationkey", F.lit(7))
    df.write.parquet(str(tmp_path / "customer.parquet"))
    out = {
        r["c_mktsegment"]: (r["median_acctbal"], r["n_customers"])
        for r in warehouse.agg_median_mode_by_segment(spark, str(tmp_path)).collect()
    }
    assert out == {"A": (20.0, 3), "B": (2.5, 4)}


def test_attribution_orders_by_ts_then_event_id(spark, tmp_path):
    """Same-timestamp ties break by event_id on both ends."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (2, t, 7, "view", 0.0, "{}"),
        (1, t, 7, "signup", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 2), 7, "purchase", 25.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = warehouse.events_attribution_first_last(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["first_touch"], r["last_touch"]) == ("signup", "purchase")
    assert (r["n_purchases"], r["purchase_value"]) == (1, 25.0)


def test_profile_counts_orders(spark, sf_dir):
    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    out = {r["column"]: r for r in warehouse.profile_orders_columns(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "orders").count()
    assert set(out) == {c for c, _ in warehouse._PROFILE_COLS}
    ok = out["o_orderkey"]
    assert ok["n_nulls"] == 0 and ok["n_distinct"] == n
    assert int(ok["min_val"]) <= int(ok["max_val"])


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer/normal-equation fit must agree with numpy's QR-based
    least squares on the same design matrix (math check, independent of
    the DuckDB-parity formula-text argument)."""
    import numpy as np

    from data_engineering_zoomcamp_projects_spark import ml
    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    row = ml.ml_linreg_normal_eq(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"], pdf["l_discount"]]
    )
    beta, *_ = np.linalg.lstsq(X, pdf["l_extendedprice"].to_numpy(), rcond=None)
    got = np.array([row["b_intercept"], row["b_quantity"], row["b_discount"]])
    assert np.allclose(got, beta, rtol=1e-6, atol=1e-4), (got, beta)


def test_kmeans_matches_numpy_fixed_point(spark, sf_dir):
    """The fixed-point Lloyd loop is EXACTLY replicable in numpy int64:
    floor-quantize, integer distances, floor(sum/count) updates. Exact
    equality (not tolerance) — this is the reproducibility claim the
    lattice buys."""
    import numpy as np

    from data_engineering_zoomcamp_projects_spark import ml
    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64)
        * ml.KMEANS_SCALE
    ).astype(np.int64)
    cent_ids = ids[: ml.KMEANS_K].copy()
    C = X[: ml.KMEANS_K].copy()

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # int64 exact
        cell_idx = d.argmin(axis=1)  # ties -> lowest index == lowest cent_id
        return cell_idx, d[np.arange(len(X)), cell_idx]

    for _ in range(ml.KMEANS_ITERS - 1):
        cell_idx, _d = assign(C)
        for j in range(ml.KMEANS_K):
            members = X[cell_idx == j]
            if len(members):
                C[j] = np.floor(
                    members.sum(axis=0).astype(np.float64) / len(members)
                ).astype(np.int64)
    cell_idx, dist = assign(C)
    expected = {
        int(cent_ids[j]): (
            int((cell_idx == j).sum()),
            int(dist[cell_idx == j].sum()),
        )
        for j in range(ml.KMEANS_K)
        if (cell_idx == j).any()
    }
    got = {
        int(r["cluster_id"]): (int(r["n_members"]), int(r["inertia_q"]))
        for r in ml.ml_kmeans_embeddings(spark, sf_dir).collect()
    }
    assert got == expected


def test_analyze_table_feeds_cbo_stats(spark, sf_dir, tmp_path):
    """ANALYZE TABLE puts row/size (and column NDV) stats in the
    catalog, and the logical plan exposes them to the optimizer."""
    from data_engineering_zoomcamp_projects_spark.catalog import (
        analyze_table,
        load_table,
    )

    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats_t"
    )
    try:
        stats = analyze_table(spark, "nation_stats_t", ("n_nationkey", "n_name"))
        assert stats is not None and "rows" in stats
        # column-level stats visible
        desc = spark.sql(
            "DESCRIBE EXTENDED nation_stats_t n_nationkey"
        ).collect()
        kv = {r["info_name"]: r["info_value"] for r in desc}
        assert kv.get("distinct_count") == "25"
        # with CBO on, the optimizer's plan stats expose the row count
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            sized = (
                spark.table("nation_stats_t")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .rowCount()
            )
            assert sized.isDefined() and int(str(sized.get())) == 25
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats_t")
