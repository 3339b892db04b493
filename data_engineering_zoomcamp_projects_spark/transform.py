"""SQL transformation layer — the dbt slot (SURVEY.md §2 B3).

The reference shipped a dbt-postgres container with no models
(reference citibike_project/docker-compose.yaml:115-126,
dbt/requirements.txt:1-2); Spark SQL IS the transform layer here: a
staging -> mart chain of temp views built with `spark.sql` CTAS-style
statements over the registered catalog.

Marts double as oracle-checked queries (registry entries below), so the
transformation layer is covered by the same correctness gate as the
operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_tables
from .operators.parity import sql_dsum

#: staging views: typed/renamed projections of the raw tables
_STAGING = {
    "stg_orders": """
        SELECT o_orderkey AS order_key, o_custkey AS customer_key,
               o_orderstatus AS status, o_totalprice AS total_price,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderpriority AS priority
        FROM orders
    """,
    "stg_lineitem": """
        SELECT l_orderkey AS order_key, l_partkey AS part_key,
               l_suppkey AS supplier_key, l_quantity AS quantity,
               l_extendedprice AS extended_price, l_discount AS discount,
               l_extendedprice * (1 - l_discount) AS net_price,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
    """,
    "stg_customers": """
        SELECT c_custkey AS customer_key, c_name AS name,
               c_mktsegment AS segment, c_nationkey AS nation_key
        FROM customer
    """,
}

#: marts built on staging views
_MARTS = {
    "fct_daily_revenue": """
        SELECT ship_date,
               CAST(ROUND(SUM(CAST(net_price AS DECIMAL(38,10))), 2) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_lines,
               COUNT(DISTINCT order_key) AS n_orders
        FROM stg_lineitem
        GROUP BY ship_date
    """,
    "dim_customer_activity": """
        SELECT c.customer_key, c.segment,
               COUNT(o.order_key) AS n_orders,
               CAST(ROUND(COALESCE(SUM(CAST(o.total_price AS DECIMAL(38,10))), 0), 2)
                    AS DOUBLE) AS lifetime_value
        FROM stg_customers c
        LEFT JOIN stg_orders o ON o.customer_key = c.customer_key
        GROUP BY c.customer_key, c.segment
    """,
}


#: spark application id -> sf_dir the view chain was LAST built from.
#: Temp views live for the session, so rebuilding the chain on every
#: mart call is pure catalog churn (~0.2 s/call). The memo tracks only
#: the last dir: views are session-global names, so switching sf_dir
#: overwrites them and a (session, dir) keyed cache would serve stale
#: views when switching back.
_LAST_BUILT: dict[str, str] = {}


def build_transform_layer(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> list[str]:
    """Materialize the staging -> mart chain as temp views (CTAS to
    managed tables at deploy time). Returns the view names in build
    order — the lineage a dbt DAG would show. Idempotent per session
    while sf_dir is unchanged; pass ``force=True`` to rebuild (e.g.
    after underlying files changed)."""
    names = list(_STAGING) + list(_MARTS)
    app_id = spark.sparkContext.applicationId
    if not force and _LAST_BUILT.get(app_id) == sf_dir:
        return names
    register_tables(spark, sf_dir, ("orders", "lineitem", "customer"))
    for name, sql in {**_STAGING, **_MARTS}.items():
        spark.sql(sql).createOrReplaceTempView(name)
    _LAST_BUILT[app_id] = sf_dir
    return names


def mart_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    build_transform_layer(spark, sf_dir)
    return spark.sql(
        "SELECT date_format(ship_date, 'yyyy-MM-dd') AS ship_date, revenue,"
        " n_lines, n_orders FROM fct_daily_revenue"
    )


MART_DAILY_REVENUE_SQL = f"""
SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_lines,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY 1
"""


def mart_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    build_transform_layer(spark, sf_dir)
    return spark.sql("SELECT * FROM dim_customer_activity")


MART_CUSTOMER_ACTIVITY_SQL = """
SELECT c_custkey AS customer_key, c_mktsegment AS segment,
       COUNT(o_orderkey) AS n_orders,
       CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 0), 2) AS DOUBLE)
         AS lifetime_value
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
"""


#: incremental-refresh watermark: rows shipped before this date are the
#: "already materialized" batch; the rest arrive as the increment
REFRESH_CUTOFF = "1997-01-01"


def mart_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily revenue
    rollup refreshed by MERGING per-batch partial aggregates instead of
    recomputing from scratch — the continuous-aggregate pattern every
    warehouse mart eventually needs when the fact table stops fitting a
    nightly full rebuild.

    The existing batch (shipped before REFRESH_CUTOFF) and the
    late-arriving increment are aggregated independently to day-grain
    PARTIALS — unrounded decimal sums and longs, the mergeable state —
    then merged with one more groupBy-sum and finalized (round/cast)
    once. The oracle computes the same mart in a single full pass, so
    the hash match IS the associativity proof: merge(partial(A),
    partial(B)) == full(A ∪ B). Only decomposable aggregates ride this
    path (sum/count/min/max); COUNT(DISTINCT) deliberately does NOT
    appear — distinct state doesn't merge (use HLL sketch-merge or
    re-aggregate from base, see agg_approx_count_distinct).

    Scale: each batch aggregates map-side to |days| rows; the merge is
    a shuffle of day-grain partials (metadata-sized), never of facts —
    refresh cost is proportional to the INCREMENT, not the table."""
    from pyspark.sql import functions as F

    li = register_tables(spark, sf_dir, ("lineitem",))["lineitem"]

    def day_partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date")
        ).agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("_rev_partial"),
            F.count(F.lit(1)).alias("_n_partial"),
            F.max("l_extendedprice").alias("_max_partial"),
        )

    old = day_partials(li.filter(F.col("l_shipdate") < REFRESH_CUTOFF))
    inc = day_partials(li.filter(F.col("l_shipdate") >= REFRESH_CUTOFF))
    merged = (
        old.unionByName(inc)
        .groupBy("ship_date")
        .agg(
            F.sum("_rev_partial").alias("_rev"),
            F.sum("_n_partial").alias("_n"),
            F.max("_max_partial").alias("_mx"),
        )
    )
    return merged.select(
        "ship_date",
        F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        F.col("_n").cast("long").alias("n_lines"),
        F.col("_mx").alias("max_line_price"),
    )


MART_INCREMENTAL_SQL = f"""
SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_lines,
       MAX(l_extendedprice) AS max_line_price
FROM lineitem GROUP BY 1
"""


QUERIES = {
    "mart_daily_revenue": mart_daily_revenue,
    "mart_incremental_refresh": mart_incremental_refresh,
    "mart_customer_activity": mart_customer_activity,
}

ORACLES = {
    "mart_daily_revenue": MART_DAILY_REVENUE_SQL,
    "mart_incremental_refresh": MART_INCREMENTAL_SQL,
    "mart_customer_activity": MART_CUSTOMER_ACTIVITY_SQL,
}
