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


def test_hll_estimate_within_3pct(spark, sf_dir):
    """Tighter empirical pin behind agg_approx_count_distinct's 5%
    driver invariant: the rsd=0.01 HLL++ estimates land within 3% of
    exact on this data."""
    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("eo"),
            F.approx_count_distinct("l_orderkey", 0.01).alias("ao"),
            F.countDistinct("l_partkey").alias("ep"),
            F.approx_count_distinct("l_partkey", 0.01).alias("ap"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["ao"] - r["eo"]) <= 0.03 * r["eo"]
        assert abs(r["ap"] - r["ep"]) <= 0.03 * r["ep"]


def test_corr_covar_matches_numpy(spark, sf_dir):
    """agg_corr_covar's exact-moment finish equals numpy's reference
    corrcoef/cov on the raw columns (to rounding scale)."""
    import numpy as np

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.operators.aggregates import (
        agg_corr_covar,
    )

    got = {
        r["l_returnflag"]: r for r in agg_corr_covar(spark, sf_dir).collect()
    }
    raw = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in raw:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pairs in by_flag.items():
        x = np.array([p[0] for p in pairs])
        y = np.array([p[1] for p in pairs])
        assert got[flag]["n"] == len(pairs)
        assert abs(got[flag]["corr_qty_price"] - np.corrcoef(x, y)[0, 1]) < 1e-5
        assert abs(got[flag]["covar_pop_qty_price"] - np.cov(x, y, bias=True)[0, 1]) < 1e-3


def test_temperature_resample_rates(spark, sf_dir):
    """Dominant language is downweighted toward the sqrt-share mix;
    the rarest language keeps everything; realized keep fractions track
    the declared per-mille rates."""
    import math

    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.llm.preparation import (
        prep_temperature_resample,
    )

    d = load_table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_min = min(counts.values())
    out = prep_temperature_resample(spark, sf_dir).collect()
    assert out
    rates = {}
    kept: dict[str, int] = {}
    for r in out:
        rates[r["lang"]] = r["rate_permille"]
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    for lang, rate in rates.items():
        expect = min(1000, math.floor(1000.0 * math.sqrt(n_min / counts[lang])))
        assert rate == expect, (lang, rate, expect)
    # rarest language(s) keep everything
    for lang, n in counts.items():
        if n == n_min and lang in rates:
            assert rates[lang] == 1000
    # dominant language genuinely downweighted on skewed data
    n_max = max(counts.values())
    if n_max > 2 * n_min:
        dominant = max(counts, key=counts.get)
        assert rates[dominant] < 800
        # realized keep fraction within 12 points of the declared rate
        frac = 1000.0 * kept[dominant] / counts[dominant]
        assert abs(frac - rates[dominant]) < 120


def test_udtf_matches_native_posexplode(spark, sf_dir):
    """The Python UDTF table function returns exactly what the native
    posexplode path returns (the engine's preferred formulation)."""
    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table
    from data_engineering_zoomcamp_projects_spark.functions.text import (
        register_split_tokens_udtf,
    )

    register_split_tokens_udtf(spark)
    d = load_table(spark, sf_dir, "documents").limit(50)
    d.createOrReplaceTempView("docs_udtf_t")
    via_udtf = spark.sql(
        "SELECT doc_id, pos, token FROM docs_udtf_t, LATERAL split_tokens(text)"
    )
    via_native = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_native.collect())
    )


def test_importance_weighted_matches_oracle(spark, sf_dir):
    """Driver-twin differential for sample_importance_weighted (oracle
    held out of the round-5 driver dict — window full), plus the
    monotonicity property: kept fraction rises with document length."""
    from data_engineering_zoomcamp_projects_spark.operators.extras import (
        SAMPLE_WEIGHTED_SQL,
        sample_importance_weighted,
    )

    from .oracle import compare, run_oracle

    df = sample_importance_weighted(spark, sf_dir)
    pdf = run_oracle(SAMPLE_WEIGHTED_SQL, sf_dir)
    problems = compare(df, pdf, "sample_importance_weighted")
    assert not problems, "\n".join(problems)

    from pyspark.sql import functions as F

    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    med = d.approxQuantile("n_chars", [0.5], 0.01)[0]
    kept = df
    short_total = d.filter(F.col("n_chars") < med).count()
    long_total = d.filter(F.col("n_chars") >= med).count()
    short_kept = kept.filter(F.col("n_chars") < med).count()
    long_kept = kept.filter(F.col("n_chars") >= med).count()
    assert long_kept / long_total > short_kept / max(short_total, 1)
