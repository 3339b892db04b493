"""Relational core — scans, filters, joins, aggregation (SURVEY.md §2 C).

Generalizes the reference's outsourced SQL surface (the BigQuery extract
with a year predicate, reference citibike_project/etl/ingest_data.py:265-270,
was its only real query) into a full declarative query layer on the
testdata star schema. Every query here is a lazily-built DataFrame plan:
Catalyst pushes the filters into the parquet scan, prunes columns, and
picks join strategies; AQE re-plans at runtime.

Scale notes per query are in each docstring; the global posture:
- fixed-size dims (region, nation) are broadcast explicitly;
- fact-fact joins shuffle on the join key and rely on AQE skew handling;
- aggregates are expressed so map-side partial aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import (
    davg,
    dsum,
    lavg_final,
    lsum1,
    lsum_final,
    lsum_partial,
    sql_davg,
    sql_dsum,
    sql_date_str,
    date_str,
)

# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape (flagship).
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filter -> two-stage groupBy -> 8 aggregates -> sort.

    Scale: the filter and the 7-column projection reach the parquet scan
    (PushedFilters/ReadSchema); partial aggregation happens map-side so
    the shuffle carries only O(partitions x groups) partial rows.

    Accumulation runs on the scaled-long fast path (parity.lsum_*): the
    inputs are fixed-point money values (qty integer, price/discount/tax
    2-dp, so disc_price is exactly 4-dp and charge exactly 6-dp), which
    long arithmetic sums exactly at ~2x the throughput of the
    decimal(38,10) accumulator (the measured q1 parity tax vs
    q1_native_double, BASELINE.md §3). Stage 1 groups by
    (flag, status, partition_id) — map-side combine in pure long adds,
    overflow-checked; stage 2 merges <= shards x 4 partial rows in exact
    decimal and applies the identical canonical rounding, so the result
    is bit-equal to the dsum/davg form the DuckDB oracle computes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    partial = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            F.spark_partition_id().alias("_pid"),
        )
        .agg(
            lsum_partial(F.col("l_quantity"), 2, "p_qty"),
            lsum_partial(F.col("l_extendedprice"), 2, "p_base"),
            lsum_partial(disc_price, 4, "p_disc_price"),
            lsum_partial(charge, 6, "p_charge"),
            lsum_partial(F.col("l_discount"), 2, "p_disc"),
            F.count(F.lit(1)).alias("p_n"),
        )
    )
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum_final("p_qty", 2, "sum_qty"),
            lsum_final("p_base", 2, "sum_base_price"),
            lsum_final("p_disc_price", 4, "sum_disc_price"),
            lsum_final("p_charge", 6, "sum_charge"),
            lavg_final("p_qty", 2, "p_n", "avg_qty"),
            lavg_final("p_base", 2, "p_n", "avg_price"),
            lavg_final("p_disc", 2, "p_n", "avg_disc"),
            F.sum("p_n").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3_shipping_priority — customer x orders x lineitem join + top-N revenue.
# --------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join with selective filters on both fact sides, then top-10.

    Scale: customer filter prunes before the join; orders⋈lineitem is a
    key-partitioned shuffle join on o_orderkey (AQE may convert to
    broadcast at small SF); top-10 via orderBy+limit is a per-partition
    partial top-k then a single reduce — no global sort of the data.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        # scaled-long fast path: revenue is an exact non-negative 4-dp
        # value; per-order group size is bounded (<= 7 lineitems), so
        # the single-stage long sum cannot overflow
        .agg(lsum1(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .select(
            F.col("o_orderkey"),
            date_str(F.col("o_orderdate"), "o_orderdate"),
            F.col("o_orderpriority"),
            F.col("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT
  o_orderkey,
  {sql_date_str('o_orderdate', 'o_orderdate')},
  o_orderpriority,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5_local_supplier_volume — 5-way star join through region.
# --------------------------------------------------------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join lineitem⋈orders⋈customer⋈supplier⋈nation⋈region.

    Scale: region/nation are broadcast (fixed 5/25 rows at ANY scale
    factor); the customer⋈supplier nation-equality constraint is applied
    as a post-join filter on broadcast columns, so the only big shuffles
    are the fact-side joins on orderkey/custkey/suppkey.
    """
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        # low-cardinality grouping (25 nations): two-stage scaled-long —
        # long partials per (nation, partition_id), exact decimal merge
        .groupBy("n_name", F.spark_partition_id().alias("_pid"))
        .agg(
            lsum_partial(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "p_rev"
            )
        )
        .groupBy("n_name")
        .agg(lsum_final("p_rev", 4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = f"""
SELECT
  n_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
}
