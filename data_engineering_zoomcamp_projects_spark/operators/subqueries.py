"""Subquery operators (SURVEY.md §2 C-relational): scalar subqueries,
IN/EXISTS, and correlated aggregates.

Spark supports these directly in SQL (Catalyst de-correlates them into
joins); the DataFrame-API twins show the decorrelated formulation
explicitly — both produce the same physical plans. Thresholds derived
from data are canonicalized (decimal avg, rounded) so the comparison
boundary is bit-identical across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, register_tables
from .parity import DEC, drnd


def subq_scalar_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: parts priced above the global average retail
    price. Decorrelated form: broadcast the 1-row aggregate and use it
    as a filter (exactly what Catalyst does with the SQL form)."""
    part = load_table(spark, sf_dir, "part")
    quotient = F.sum(F.col("p_retailprice").cast(DEC)).cast("double") / F.count(
        "p_retailprice"
    )
    avg_price = part.agg(
        F.round(quotient.cast(DEC), 6).cast("double").alias("threshold")
    )
    return (
        part.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("threshold"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


SUBQ_SCALAR_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > (
  SELECT CAST(ROUND(CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,10))) AS DOUBLE)
               / COUNT(p_retailprice) AS DECIMAL(38,10)), 6) AS DOUBLE)
  FROM part)
"""


def subq_in_european_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via the SQL surface (compiles to a left-semi join)."""
    register_tables(spark, sf_dir, ("supplier", "nation", "region"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_nationkey
        FROM supplier
        WHERE s_nationkey IN (
          SELECT n_nationkey FROM nation
          WHERE n_regionkey IN (
            SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
        """
    )


SUBQ_IN_SQL = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (
    SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
"""


def subq_exists_multi_order_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via SQL: customers who placed two orders on
    the same day (self-join correlation)."""
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders o1 JOIN orders o2
            ON o1.o_custkey = o2.o_custkey
           AND o1.o_orderdate = o2.o_orderdate
           AND o1.o_orderkey < o2.o_orderkey
          WHERE o1.o_custkey = c_custkey)
        """
    )


SUBQ_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders o1 JOIN orders o2
    ON o1.o_custkey = o2.o_custkey
   AND o1.o_orderdate = o2.o_orderdate
   AND o1.o_orderkey < o2.o_orderkey
  WHERE o1.o_custkey = c_custkey)
"""


def subq_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate, decorrelated: orders worth more than
    their customer's average order value. One groupBy + one re-join on
    the grouping key (co-partitioned shuffle, AQE may broadcast the
    aggregate side)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(
            (
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                / F.count("o_totalprice")
            ).cast(DEC),
            6,
        )
        .cast("double")
        .alias("cust_avg")
    )
    return (
        orders.join(per_cust.withColumnRenamed("o_custkey", "ck"), F.col("o_custkey") == F.col("ck"))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


SUBQ_CORRELATED_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM orders
JOIN (SELECT o_custkey AS ck,
             CAST(ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
                   / COUNT(o_totalprice) AS DECIMAL(38,10)), 6) AS DOUBLE) AS cust_avg
      FROM orders GROUP BY o_custkey) a
  ON o_custkey = ck
WHERE o_totalprice > cust_avg
"""


def filter_predicate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate breadth on one scan: IN, BETWEEN, LIKE, IS NULL,
    boolean algebra — all pushed into/near the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("F", "P"))
        & (F.col("o_totalprice").between(50000.0, 250000.0))
        & (F.col("o_orderpriority").like("%URGENT%") | F.col("o_orderpriority").like("2%"))
        & (F.col("o_orderdate").isNotNull())
        & (~(F.col("o_orderkey") % 10 == 0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


FILTER_PREDICATE_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice BETWEEN 50000.0 AND 250000.0
  AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority LIKE '2%')
  AND o_orderdate IS NOT NULL
  AND NOT (o_orderkey % 10 = 0)
"""


def projection_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection/derived-column surface (select + withColumn chain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "net_price",
            drnd(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net_price"),
        )
        .withColumn("is_returned", (F.col("l_returnflag") == "R").cast("int"))
        .withColumn("line_id", F.concat_ws("-", "l_orderkey", "l_linenumber"))
        .select("line_id", "net_price", "is_returned", "l_quantity")
    )


PROJECTION_SQL = """
SELECT concat_ws('-', l_orderkey, l_linenumber) AS line_id,
       CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)), 2) AS DOUBLE) AS net_price,
       CAST(l_returnflag = 'R' AS INT) AS is_returned,
       l_quantity
FROM lineitem
"""


LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 3
) t
"""


def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per nation, its top-3 customers by
    account balance — the dependent-join SQL surface. Catalyst plans
    the lateral as a decorrelated join (not one probe per outer row);
    the per-group LIMIT gets the same window/top-k treatment as
    topk_per_group at scale. Deterministic via the (acctbal, name)
    tie-break; DuckDB executes the identical LATERAL."""
    register_tables(spark, sf_dir, ["nation", "customer"])
    return spark.sql(LATERAL_SQL)


QUERIES = {
    "subq_scalar_above_avg_price": subq_scalar_above_avg_price,
    "subq_lateral_topn": subq_lateral_topn,
    "subq_in_european_suppliers": subq_in_european_suppliers,
    "subq_exists_multi_order_days": subq_exists_multi_order_days,
    "subq_orders_above_customer_avg": subq_orders_above_customer_avg,
    "filter_predicate_suite": filter_predicate_suite,
    "projection_expressions": projection_expressions,
}

ORACLES = {
    "subq_scalar_above_avg_price": SUBQ_SCALAR_SQL,
    "subq_lateral_topn": LATERAL_SQL,
    "subq_in_european_suppliers": SUBQ_IN_SQL,
    "subq_exists_multi_order_days": SUBQ_EXISTS_SQL,
    "subq_orders_above_customer_avg": SUBQ_CORRELATED_SQL,
    "filter_predicate_suite": FILTER_PREDICATE_SQL,
    "projection_expressions": PROJECTION_SQL,
}
