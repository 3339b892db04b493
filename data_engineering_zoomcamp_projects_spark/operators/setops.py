"""Set operators: UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]
(SURVEY.md §2 C-relational).

Spark's distinct-flavored set ops compile to aggregate/join plans; at
scale they shuffle on the full row hash, so the projections here keep
rows narrow before the set op — project-then-setop, never setop-then-
project."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _urgent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


def _high_value(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000.0)
        .select("o_custkey")
    )


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle) + count by key."""
    return (
        _urgent(spark, sf_dir)
        .unionByName(_high_value(spark, sf_dir))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SETOP_UNION_ALL_SQL = """
SELECT o_custkey, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
) GROUP BY o_custkey
"""


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers with urgent OR high-value orders."""
    return _urgent(spark, sf_dir).union(_high_value(spark, sf_dir)).distinct()


SETOP_UNION_DISTINCT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with urgent AND high-value orders."""
    return _urgent(spark, sf_dir).intersect(_high_value(spark, sf_dir))


SETOP_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): urgent-order customers with no
    high-value order. `subtract` is Spark's EXCEPT DISTINCT."""
    return _urgent(spark, sf_dir).subtract(_high_value(spark, sf_dir))


SETOP_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
"""


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, multiplicity = min of the two)."""
    a = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    b = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 25.0)
        .select("l_returnflag", "l_linestatus")
    )
    return (
        a.intersectAll(b)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SETOP_INTERSECT_ALL_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM (
  SELECT l_returnflag, l_linestatus FROM lineitem
  INTERSECT ALL
  SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 25.0
) GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "setop_union_all": setop_union_all,
    "setop_union_distinct": setop_union_distinct,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "setop_intersect_all": setop_intersect_all,
}

ORACLES = {
    "setop_union_all": SETOP_UNION_ALL_SQL,
    "setop_union_distinct": SETOP_UNION_DISTINCT_SQL,
    "setop_intersect": SETOP_INTERSECT_SQL,
    "setop_except": SETOP_EXCEPT_SQL,
    "setop_intersect_all": SETOP_INTERSECT_ALL_SQL,
}
