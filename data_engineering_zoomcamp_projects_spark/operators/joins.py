"""Join operators — every flavor in SURVEY.md §2 C-relational.

The reference's only join-like constructs were an existence probe
(reference citibike_project/etl/ingest_data.py:251-253, generalized
here to semi/anti joins) and federated year-filtered extracts
(ingest_data.py:265-270). This module provides the full join surface
on the star schema.

Scale posture:
- fixed dims (region/nation) broadcast explicitly; everything else
  leaves strategy choice to Catalyst/AQE (sort-merge vs broadcast vs
  shuffled-hash from observed sizes).
- the range join pre-aggregates the probe side to day granularity and
  broadcasts it — the broadcast side is bounded by distinct days
  (~2.5k for 7 years) at ANY scale factor, so no O(n^2) blowup.
- the as-of join is a window formulation (sort within user partition),
  shuffling each side once on the partition key — no nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import dsum, dsum0, sql_dsum, sql_dsum0, ts_str


def join_inner_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join + aggregate: order volume per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_value"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_INNER_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       {sql_dsum0('o_totalprice', 'total_value')}
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_left_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum0(F.col("o_totalprice"), "total_value"),
        )
    )


JOIN_LEFT_SQL = f"""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       {sql_dsum0('o_totalprice', 'total_value')}
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_right_outer_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: per-order lineitem counts, keeping all orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_linenumber").alias("n_items"),
            dsum0(F.col("l_quantity"), "total_qty"),
        )
    )


JOIN_RIGHT_SQL = f"""
SELECT o_orderkey, COUNT(l_linenumber) AS n_items,
       {sql_dsum0('l_quantity', 'total_qty')}
FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey
"""


def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(sup, cust.c_nationkey == sup.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


JOIN_FULL_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
"""


def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that have at least one 'F' order.

    The reference's existence probe (ingest_data.py:251-253) generalized
    to a distributed semi join — only the key column of the right side
    is shuffled, never its payload.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers who never placed an URGENT order
    (filtered right side keeps the result non-degenerate at every SF)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of the two fixed dims (5 x 25 rows at every SF)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_regionkey", "r_name", "n_nationkey", "n_name"
    )


JOIN_CROSS_SQL = """
SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation
"""


def join_theta_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: same-nation supplier pairs with an inequality predicate.

    Catalyst plans the equality part as the join key and evaluates the
    inequality as a post-join filter — blocked by nation, so the
    quadratic term is bounded per nation group.
    """
    a = load_table(spark, sf_dir, "supplier").alias("a")
    b = load_table(spark, sf_dir, "supplier").alias("b")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_acctbal") > F.col("b.s_acctbal") + 1000.0),
        )
        .select(
            F.col("a.s_suppkey").alias("rich_suppkey"),
            F.col("b.s_suppkey").alias("poor_suppkey"),
            F.col("a.s_nationkey").alias("nationkey"),
        )
    )


JOIN_THETA_SQL = """
SELECT a.s_suppkey AS rich_suppkey, b.s_suppkey AS poor_suppkey,
       a.s_nationkey AS nationkey
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_acctbal > b.s_acctbal + 1000.0
"""


def join_range_trailing_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join at day granularity: for each order, how many lineitems
    (system-wide) shipped in the 7 days ending on its order date.

    Scale design: a row-level range join would be a nested loop
    (O(orders x days) condition evals — measured 17s at sf0.1). Instead:
    (1) pre-aggregate shipments per day (bounded: ~2.5k rows for 7 years
    at ANY scale factor), (2) expand each day by the 7 window offsets —
    still bounded — and (3) broadcast EQUI-join on the day. The range
    predicate is compiled away; the probe side streams once.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_trunc("day", "o_orderdate").alias("o_day")
    )
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("day", "l_shipdate").alias("ship_day"))
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    # expand: ship_day contributes to window-end days ship_day..ship_day+6
    expanded = daily.select(
        F.explode(
            F.expr("sequence(ship_day, ship_day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")
        ).alias("o_day"),
        "n_shipped",
    )
    joined = orders.join(F.broadcast(expanded), "o_day", "left")
    return (
        joined.groupBy("o_orderkey")
        .agg(F.coalesce(F.sum("n_shipped"), F.lit(0)).alias("shipped_7d"))
    )


JOIN_RANGE_SQL = """
SELECT o_orderkey, CAST(COALESCE(SUM(n_shipped), 0) AS BIGINT) AS shipped_7d
FROM (SELECT o_orderkey, date_trunc('day', o_orderdate) AS o_day FROM orders) o
LEFT JOIN (SELECT date_trunc('day', l_shipdate) AS ship_day, COUNT(*) AS n_shipped
           FROM lineitem GROUP BY 1) d
  ON d.ship_day <= o.o_day AND d.ship_day >= o.o_day - INTERVAL 6 DAY
GROUP BY o_orderkey
"""


def join_asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent strictly
    earlier 'view' event timestamp of the same user.

    Spark has no native ASOF JOIN; the idiomatic formulation is a
    union + window: one shuffle on user_id, a sort within partition,
    and last(ignorenulls) over a range frame that excludes ties —
    O(n log n) per user, no nested loop. (DuckDB oracle uses its
    native ASOF LEFT JOIN.)
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("prior_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts"), "purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ts_str(F.col("prior_view_ts"), "prior_view_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        )
    )


JOIN_ASOF_SQL = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS prior_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts > v.ts
"""


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-gap tolerance (pandas merge_asof
    `tolerance=` semantics): each purchase matches its most recent
    strictly-earlier 'view' by the same user ONLY if it happened within
    the last 30 minutes; staler matches are nulled out.

    Same single-shuffle window plan as join_asof_purchase_prior_view —
    the tolerance is a post-match conditional, not a second join, so
    the scale shape is unchanged. (DuckDB oracle: native ASOF LEFT JOIN
    + the same gap CASE.)"""
    tol_us = 30 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    prior = F.last(view_ts, ignorenulls=True).over(w)
    within = F.unix_micros("ts") - F.unix_micros(prior) <= tol_us
    return (
        ev.withColumn("prior_view_ts", F.when(within, prior))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts"), "purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ts_str(
                F.col("prior_view_ts"),
                "recent_view_ts",
                "yyyy-MM-dd HH:mm:ss.SSSSSS",
            ),
        )
    )


JOIN_ASOF_TOL_SQL = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 30 * 60 * 1000000
            THEN strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') END AS recent_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts > v.ts
"""


#: salt fan-out for join_salted_skew; 16 splits a hot key across 16
#: reducers — at deploy, size to (hot-key rows / target partition rows)
SALT_BUCKETS = 16
#: 1-in-N deterministic sample used to estimate per-key probe counts
_SKEW_SAMPLE_MOD = 100
#: estimated probe rows above which a key is treated as hot (sampled
#: count x _SKEW_SAMPLE_MOD > this)
_SKEW_HOT_ROWS = 1_000_000


def _salted_skew_join(li: DataFrame, o: DataFrame) -> DataFrame:
    """SELECTIVELY salted lineitem⋈orders: joined rows, exactly the
    plain inner join's. A first cut salted EVERY key — replicating the
    whole build side 16x — and scale-stressed 23x at 10x data (sf1
    measurement, BASELINE.md §6): uniform replication is itself the
    skew anti-pattern. Production salting is selective:

    1. estimate per-key probe counts from a 1-in-100 DETERMINISTIC
       sample (pmod(xxhash64(pk), 100) = 0 — replayable, no rand());
       map-side partial agg over ~1% of rows, tiny output;
    2. keys whose estimate exceeds the hot threshold join through the
       salted branch: probe rows get pmod(xxhash64(attrs), 16) salts,
       build rows replicate ONLY for hot keys (semi-join then
       explode(sequence)) — 16 reducers per hot key, nothing else
       replicated;
    3. every other key joins plain; the two row sets union before the
       downstream aggregate.

    The hot set is broadcast both ways (it is bounded by |keys with
    >threshold rows| <= corpus/threshold — self-limiting at any
    scale). Result is identical to the plain join whatever the
    threshold — the oracle is the unsalted SQL, and the synthetic-skew
    pytest pins the salted branch itself. This is the manual form of
    AQE's sort-merge skew split; it also covers shuffled-hash and
    bucketed joins where AQE cannot split."""
    sampled = li.filter(F.pmod(F.xxhash64("l_orderkey"), _SKEW_SAMPLE_MOD) == 0)
    hot = (
        sampled.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("est"))
        .filter(F.col("est") * _SKEW_SAMPLE_MOD > _SKEW_HOT_ROWS)
        .select(F.col("l_orderkey").alias("hot_key"))
    )
    o_slim = o.select("o_orderkey", "o_orderpriority")
    li_cold = li.join(
        F.broadcast(hot), li["l_orderkey"] == hot["hot_key"], "left_anti"
    )
    cold = li_cold.join(o_slim, li_cold["l_orderkey"] == o_slim["o_orderkey"])
    li_hot = li.join(
        F.broadcast(hot), li["l_orderkey"] == hot["hot_key"], "left_semi"
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64("l_partkey", "l_suppkey", "l_linenumber"), SALT_BUCKETS),
    )
    o_hot = o_slim.join(
        F.broadcast(hot), o_slim["o_orderkey"] == hot["hot_key"], "left_semi"
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("salt"),
    )
    hot_joined = li_hot.join(
        o_hot,
        (li_hot["l_orderkey"] == o_hot["o_orderkey"])
        & (li_hot["salt"] == o_hot["salt"]),
    ).drop("salt")
    cols = ["o_orderpriority", "l_extendedprice", "l_discount"]
    return cold.select(*cols).unionByName(hot_joined.select(*cols))


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join (see `_salted_skew_join`): revenue per
    order priority over the selectively-salted lineitem⋈orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        _salted_skew_join(li, o)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_SALTED_SQL = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "join_inner_customer_orders": join_inner_customer_orders,
    "join_salted_skew": join_salted_skew,
    "join_left_outer_orders": join_left_outer_orders,
    "join_right_outer_lineitem": join_right_outer_lineitem,
    "join_full_outer_nation_activity": join_full_outer_nation_activity,
    "join_semi_active_customers": join_semi_active_customers,
    "join_anti_inactive_customers": join_anti_inactive_customers,
    "join_cross_region_nation": join_cross_region_nation,
    "join_theta_supplier_pairs": join_theta_supplier_pairs,
    "join_range_trailing_shipments": join_range_trailing_shipments,
    "join_asof_purchase_prior_view": join_asof_purchase_prior_view,
    "join_asof_tolerance": join_asof_tolerance,
}

ORACLES = {
    "join_inner_customer_orders": JOIN_INNER_SQL,
    "join_salted_skew": JOIN_SALTED_SQL,
    "join_left_outer_orders": JOIN_LEFT_SQL,
    "join_right_outer_lineitem": JOIN_RIGHT_SQL,
    "join_full_outer_nation_activity": JOIN_FULL_SQL,
    "join_semi_active_customers": JOIN_SEMI_SQL,
    "join_anti_inactive_customers": JOIN_ANTI_SQL,
    "join_cross_region_nation": JOIN_CROSS_SQL,
    "join_theta_supplier_pairs": JOIN_THETA_SQL,
    "join_range_trailing_shipments": JOIN_RANGE_SQL,
    "join_asof_purchase_prior_view": JOIN_ASOF_SQL,
    "join_asof_tolerance": JOIN_ASOF_TOL_SQL,
}
