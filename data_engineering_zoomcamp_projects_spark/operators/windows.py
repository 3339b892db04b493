"""Window-function operators (SURVEY.md §2 C-window).

Ranking, analytic (lag/lead/first/last), and framed aggregates.
Window sorts are the one place Spark genuinely sorts data — each query
partitions by a key so the sort is per-partition after one hash
shuffle, never a global sort. Running sums use the decimal
canonicalization so every prefix is bit-identical to the oracle.

All orderings include a unique tie-break column so results are
deterministic across engines (floating orderBy keys alone would make
row_number nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import DEC, date_str


def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / percent_rank / ntile / cume_dist.

    rank-family functions are evaluated over the (tie-producing)
    priority ordering; row_number/ntile over a fully deterministic
    ordering with o_orderkey as tie-break.

    PARTITION BY o_orderstatus has 3 values — a plain window would
    funnel |orders|/3 through one task each. The whole family is
    instead derived from the distributed rank toolkit
    (operators/distrank.py): range-sharded row_number, tie-group
    rank/dense_rank, and the arithmetic identities for
    percent_rank/cume_dist/ntile — bit-identical to the window forms
    the DuckDB oracle keeps."""
    from .distrank import ntile_from_rank, rank_family

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    fam = rank_family(
        orders,
        ["o_orderstatus"],
        ["o_orderpriority"],
        [F.col("o_orderkey").asc()],
    )
    return fam.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("_rn").cast("int").alias("rn"),
        F.col("_rank").cast("int").alias("rnk"),
        F.col("_drank").cast("int").alias("drnk"),
        F.round(F.col("_prank").cast(DEC), 6).cast("double").alias("prnk"),
        ntile_from_rank(F.col("_rn"), F.col("_n_part"), 4)
        .cast("int")
        .alias("quartile"),
        F.round(F.col("_cdist").cast(DEC), 6).cast("double").alias("cdist"),
    )


WINDOW_RANK_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority,
  ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority, o_orderkey) AS rn,
  RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS rnk,
  DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drnk,
  CAST(ROUND(CAST(PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS DECIMAL(38,10)), 6) AS DOUBLE) AS prnk,
  NTILE(4) OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority, o_orderkey) AS quartile,
  CAST(ROUND(CAST(CUME_DIST() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS DECIMAL(38,10)), 6) AS DOUBLE) AS cdist
FROM orders
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: previous/next order values and the
    delta to the previous order (lag/lead with default null)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        date_str(F.col("o_orderdate"), "order_date"),
        F.col("o_totalprice").alias("price"),
        F.lag("o_totalprice", 1, -1.0).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
        F.coalesce(
            F.round(
                (F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w)).cast(
                    "decimal(38,10)"
                ),
                2,
            ).cast("double"),
            F.lit(0.0),
        ).alias("delta_prev"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  o_totalprice AS price,
  LAG(o_totalprice, 1, -1.0) OVER w AS prev_price,
  LEAD(o_totalprice, 1, -1.0) OVER w AS next_price,
  COALESCE(CAST(ROUND(CAST(o_totalprice - LAG(o_totalprice, 1) OVER w AS DECIMAL(38,10)), 2) AS DOUBLE), 0.0) AS delta_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (unbounded-preceding frame), exact
    via decimal accumulation on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
FROM orders
"""


def window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average of daily revenue (frame -6..0),
    computed as exact decimal frame-sum / frame-count."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        date_str(F.col("day"), "day"),
        F.round(
            F.sum("rev").over(w).cast("double") / F.count("rev").over(w), 4
        ).alias("ma7"),
    )


WINDOW_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
  ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(rev) OVER w, 4) AS ma7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full partition frame: each
    customer's first and latest order date."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        date_str(F.first("o_orderdate").over(w), "first_order"),
        date_str(F.last("o_orderdate").over(w), "latest_order"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
  strftime(FIRST_VALUE(o_orderdate) OVER w, '%Y-%m-%d') AS first_order,
  strftime(LAST_VALUE(o_orderdate) OVER w, '%Y-%m-%d') AS latest_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full partition frame: each customer's 2nd
    order date and 3rd order value (NULL while the customer has fewer
    orders) — the "second purchase" cohort primitive. Deterministic
    order via the (o_orderdate, o_orderkey) tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        date_str(F.nth_value("o_orderdate", 2).over(w), "second_order_date"),
        # null-free: a NULL double reaches the comparator as NaN via
        # pandas on the oracle side (the dsum0 rationale) — 0.0 marks
        # "fewer than 3 orders" on both engines
        F.coalesce(F.nth_value("o_totalprice", 3).over(w), F.lit(0.0)).alias(
            "third_order_value"
        ),
    )


WINDOW_NTH_SQL = """
SELECT o_custkey, o_orderkey,
  strftime(NTH_VALUE(o_orderdate, 2) OVER w, '%Y-%m-%d') AS second_order_date,
  COALESCE(NTH_VALUE(o_totalprice, 3) OVER w, 0.0) AS third_order_value
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value — the scalable top-k idiom
    (window row_number <= k after one shuffle; never a global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
    )


TOPK_PER_GROUP_SQL = """
SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-15 orders by value (orderBy+limit = distributed
    partial top-k per partition, then a single small merge)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(15)
    )


TOPK_GLOBAL_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
"""


QUERIES = {
    "window_rank_functions": window_rank_functions,
    "window_lag_lead": window_lag_lead,
    "window_running_sum": window_running_sum,
    "window_moving_average": window_moving_average,
    "window_first_last": window_first_last,
    "window_nth_value": window_nth_value,
    "topk_per_group": topk_per_group,
    "topk_global": topk_global,
}

ORACLES = {
    "window_rank_functions": WINDOW_RANK_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "window_moving_average": WINDOW_MOVING_AVG_SQL,
    "window_first_last": WINDOW_FIRST_LAST_SQL,
    "window_nth_value": WINDOW_NTH_SQL,
    "topk_per_group": TOPK_PER_GROUP_SQL,
    "topk_global": TOPK_GLOBAL_SQL,
}


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-based frame (value range, not row count): per customer, how
    many of their orders fall within ±10k of each order's price."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


WINDOW_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
    AS n_similar_price
FROM orders
"""

QUERIES["window_range_frame"] = window_range_frame
ORACLES["window_range_frame"] = WINDOW_RANGE_FRAME_SQL
