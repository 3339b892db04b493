"""Aggregation operators — groupBy/rollup/cube/grouping-sets/having/
pivot/stats/distinct (SURVEY.md §2 C-relational).

All float aggregates go through the decimal canonicalization in
parity.py so the DuckDB oracle hash-matches exactly. Every aggregate
here is expressible as partial (map-side) + final — at scale the
shuffle carries group partials, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import (
    DEC,
    davg,
    drnd,
    dsum,
    date_str,
    sql_davg,
    sql_drnd,
    sql_dsum,
    sql_dsum0,
    sql_date_str,
)


def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single global aggregate row over the fact table (min/max/count are
    exact; sums/avgs decimal-canonicalized)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum(F.col("l_extendedprice"), "sum_price"),
        davg(F.col("l_discount"), "avg_discount"),
        F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("first_ship"),
        F.max(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("last_ship"),
    )


AGG_GLOBAL_SQL = f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       {sql_dsum('l_extendedprice', 'sum_price')},
       {sql_davg('l_discount', 'avg_discount')},
       MIN(strftime(l_shipdate, '%Y-%m-%d')) AS first_ship,
       MAX(strftime(l_shipdate, '%Y-%m-%d')) AS last_ship
FROM lineitem
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (Catalyst expands to a two-phase
    partial-distinct aggregation; at scale consider approx variant)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("distinct_orders"),
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
        .orderBy("l_returnflag")
    )


AGG_COUNT_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS distinct_orders,
       COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
       COUNT(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct's shuffle is prohibitive — certified through a bounded-
    error invariant the oracle CAN hash-check.

    Sketch values themselves differ between engines (HLL++ register
    layouts are implementation-specific), so the raw estimate can never
    hash-match DuckDB. Instead the query emits, per group, the EXACT
    distinct counts plus a boolean per sketch asserting the HLL++
    estimate (rsd=0.01) landed within 5% of exact. The oracle computes
    the exact counts and literal TRUE — if Spark's sketch ever drifts
    outside the documented bound, the value hash breaks and the driver
    sees it. (tests/test_extras.py additionally pins the tighter 3%
    empirical bound.) At 100 TB only the approx branch runs; the exact
    branch here is the certification harness, not the scale plan.

    Plan shape: exact and approx run as SEPARATE aggregations joined on
    the group key. Mixing countDistinct with a small-rsd sketch in ONE
    agg makes Catalyst's multi-distinct Expand plan carry the HLL
    buffer (16 KB at rsd=0.01, per sketch) in the FIRST aggregate's
    per-distinct-value buffers — ~32 KB x |distinct keys| of transient
    aggregation state, a measured GC death spiral at sf1 (245 s / GC
    lockup vs ~4 s split). Two scans of a columnar source are far
    cheaper than one degenerate plan."""
    li = load_table(spark, sf_dir, "lineitem")
    tol = 0.05
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("_ao"),
        F.approx_count_distinct("l_partkey", 0.01).alias("_ap"),
    )
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            (
                F.abs(F.col("_ao") - F.col("exact_orders"))
                <= tol * F.col("exact_orders")
            ).alias("approx_orders_ok"),
            (
                F.abs(F.col("_ap") - F.col("exact_parts"))
                <= tol * F.col("exact_parts")
            ).alias("approx_parts_ok"),
        )
        .orderBy("l_returnflag")
    )


AGG_APPROX_CD_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_orders_ok,
       TRUE AS approx_parts_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag, status) -> (flag) -> () subtotals."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity"), "sum_qty"))
    )


AGG_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations of (status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice"), "total"))
    )


AGG_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {sql_dsum('o_totalprice', 'total')}
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (views registered on
    the fly; Catalyst expands to a single Expand + aggregate)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def agg_having_big_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: suppliers whose shipped quantity exceeds a threshold.
    The filter applies to the canonicalized (rounded) aggregate on both
    sides, so the boundary is bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"), F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("total_qty") > 100.0)
    )


AGG_HAVING_SQL = f"""
SELECT * FROM (
  SELECT l_suppkey, {sql_dsum('l_quantity', 'total_qty')},
         COUNT(*) AS n_items
  FROM lineitem GROUP BY l_suppkey
) WHERE total_qty > 100.0
"""


def agg_stats_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance per group, rounded to absorb the (tiny)
    numerical differences between engines' streaming variance algorithms."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 3).alias("var_qty"),
            F.round(F.stddev_samp("l_discount"), 6).alias("std_disc"),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 4) AS std_qty,
       ROUND(var_samp(l_quantity), 3) AS var_qty,
       ROUND(stddev_samp(l_discount), 6) AS std_disc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per group, computed
    from EXACT decimal moment sums so the oracle hash-matches.

    Native `corr`/`covar_pop` stream Welford-style partials whose
    float error depends on row order — never hash-stable across
    engines. Here the five moments (Sx, Sy, Sxy, Sxx, Syy) accumulate
    in decimal(38,10): exact, order-independent, and still partial+
    final aggregable (the shuffle carries one 5-moment row per group
    per map task — the same scale shape as any sum). The finish is a
    fixed double expression tree evaluated identically by both engines
    (casts, +,-,*,/ and sqrt are all IEEE-correctly-rounded), then
    tie-safe rounded. This is the moments-not-streams pattern every
    distributed exact-stats engine uses (same machinery as
    ml_linreg_normal_eq's normal equations)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Per-row products run in DOUBLE (one IEEE multiply — identical in
    # both engines; decimal-in-decimal products would overflow the
    # 38-digit product-precision rules differently per engine), then
    # each product is cast to decimal(38,10) and summed exactly: the
    # order-independence that matters lives in the SUM, not the row op.
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).alias("_sx"),
        F.sum(y.cast(DEC)).alias("_sy"),
        F.sum((x * y).cast(DEC)).alias("_sxy"),
        F.sum((x * x).cast(DEC)).alias("_sxx"),
        F.sum((y * y).cast(DEC)).alias("_syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    mx = sx / nd
    my = sy / nd
    cov = sxy / nd - mx * my
    vx = sxx / nd - mx * mx
    vy = syy / nd - my * my
    return m.select(
        "l_returnflag",
        "n",
        drnd(cov, "covar_pop_qty_price", 4),
        drnd(cov / F.sqrt(vx * vy), "corr_qty_price", 6),
    ).orderBy("l_returnflag")


AGG_CORR_SQL = f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(38,10))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS sy,
         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS sxy,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS sxx,
         SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS syy
  FROM lineitem GROUP BY l_returnflag
), f AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxy AS DOUBLE) AS sxyd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
  FROM m
)
SELECT l_returnflag, n,
       {sql_drnd('sxyd / nd - (sxd / nd) * (syd / nd)',
                 'covar_pop_qty_price', 4)},
       {sql_drnd(
           '(sxyd / nd - (sxd / nd) * (syd / nd))'
           ' / sqrt((sxxd / nd - (sxd / nd) * (sxd / nd))'
           '        * (syyd / nd - (syd / nd) * (syd / nd)))',
           'corr_qty_price', 6)}
FROM f ORDER BY l_returnflag
"""


def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (compiles to conditional aggregation
    — one pass, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity"), "q"))
    )
    return pv.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_open"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_finished"),
    ).orderBy("l_returnflag")


AGG_PIVOT_SQL = f"""
SELECT l_returnflag,
       {sql_dsum0("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_open')},
       {sql_dsum0("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_finished')}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by: the order carrying the extreme totalprice per status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


AGG_MINMAX_BY_SQL = """
SELECT o_orderstatus,
       max_by(o_orderkey, o_totalprice) AS biggest_order,
       min_by(o_orderkey, o_totalprice) AS smallest_order,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (dedup of the (flag,status) domain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


AGG_DISTINCT_ROWS_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


def agg_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup (the hypertable-style monthly aggregate that
    replaces the reference's table-per-month layout,
    reference citibike_project/etl/ingest_data.py:159)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            date_str(F.date_trunc("month", "o_orderdate"), "month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
            davg(F.col("o_totalprice"), "avg_order_value"),
        )
        .orderBy("month")
    )


AGG_MONTHLY_SQL = f"""
SELECT {sql_date_str("date_trunc('month', o_orderdate)", 'month')},
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'revenue')},
       {sql_davg('o_totalprice', 'avg_order_value')}
FROM orders GROUP BY date_trunc('month', o_orderdate) ORDER BY month
"""


QUERIES = {
    "agg_global_stats": agg_global_stats,
    "agg_count_distinct": agg_count_distinct,
    "agg_approx_count_distinct": agg_approx_count_distinct,
    "agg_corr_covar": agg_corr_covar,
    "agg_rollup_flag_status": agg_rollup_flag_status,
    "agg_cube_status_priority": agg_cube_status_priority,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_having_big_suppliers": agg_having_big_suppliers,
    "agg_stats_dispersion": agg_stats_dispersion,
    "agg_pivot_status": agg_pivot_status,
    "agg_min_max_by": agg_min_max_by,
    "agg_distinct_rows": agg_distinct_rows,
    "agg_monthly_orders": agg_monthly_orders,
}

ORACLES = {
    "agg_global_stats": AGG_GLOBAL_SQL,
    "agg_count_distinct": AGG_COUNT_DISTINCT_SQL,
    # raw sketch values can't cross engines; the bounded-error invariant can
    "agg_approx_count_distinct": AGG_APPROX_CD_SQL,
    "agg_corr_covar": AGG_CORR_SQL,
    "agg_rollup_flag_status": AGG_ROLLUP_SQL,
    "agg_cube_status_priority": AGG_CUBE_SQL,
    "agg_grouping_sets": AGG_GROUPING_SETS_SQL,
    "agg_having_big_suppliers": AGG_HAVING_SQL,
    "agg_stats_dispersion": AGG_STATS_SQL,
    "agg_pivot_status": AGG_PIVOT_SQL,
    "agg_min_max_by": AGG_MINMAX_BY_SQL,
    "agg_distinct_rows": AGG_DISTINCT_ROWS_SQL,
    "agg_monthly_orders": AGG_MONTHLY_SQL,
}
