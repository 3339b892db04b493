"""Data-quality validation suite (round-5 widening): declarative
constraint checks in the Deequ/Great-Expectations mold, re-expressed
Spark-first. A 100 TB ingest pipeline gates every load on exactly
these three shapes: column constraints (nulls / uniqueness / ranges /
set & pattern membership), referential integrity across tables, and
volume-anomaly detection on arrival counts.

Scale design: `quality_constraint_checks` is ONE full scan — every
constraint is a conditional sum inside a single aggregate (map-side
partial agg, one-row result), then unpivoted driver-free with
``stack``. Referential orphans are LEFT ANTI joins — Spark's native
existence probe (no count-distinct materialization); the PK sides are
joined shuffle-side because at 100 TB both sides are big, while AQE is
free to broadcast when a dimension fits. Volume anomaly pre-aggregates
to one row per day FIRST, so the unpartitioned stats window runs over
#days rows, not #events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import DEC

#: orders business rules checked by quality_constraint_checks; kept as
#: data so the Spark plan and the DuckDB oracle enumerate the same set.
_ALLOWED_STATUS = ("O", "F", "P")


def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-constraint audit over ``orders`` in one scan: null counts
    per column, PK uniqueness, a numeric range rule, a categorical
    set-membership rule, and a regex pattern rule. Each constraint is a
    conditional count folded into a single groupBy-less aggregate;
    ``stack`` unpivots the one-row result into (constraint, violations,
    n_rows, passed) rows — no driver round-trip, no second scan."""
    o = load_table(spark, sf_dir, "orders")

    def viol(cond):  # count of rows VIOLATING the constraint
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    one = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        viol(F.col("o_orderkey").isNull()).alias("v_orderkey_null"),
        viol(F.col("o_custkey").isNull()).alias("v_custkey_null"),
        viol(F.col("o_orderstatus").isNull()).alias("v_status_null"),
        viol(F.col("o_totalprice").isNull()).alias("v_price_null"),
        viol(F.col("o_orderdate").isNull()).alias("v_date_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v_orderkey_dup"),
        viol(F.col("o_totalprice") <= 0).alias("v_price_range"),
        viol(~F.col("o_orderstatus").isin(*_ALLOWED_STATUS)).alias("v_status_set"),
        viol(~F.col("o_orderpriority").rlike("^[1-5]-")).alias("v_priority_pattern"),
    )
    checks = [
        ("not_null:o_orderkey", "v_orderkey_null"),
        ("not_null:o_custkey", "v_custkey_null"),
        ("not_null:o_orderstatus", "v_status_null"),
        ("not_null:o_totalprice", "v_price_null"),
        ("not_null:o_orderdate", "v_date_null"),
        ("unique:o_orderkey", "v_orderkey_dup"),
        ("range:o_totalprice>0", "v_price_range"),
        ("in_set:o_orderstatus", "v_status_set"),
        ("pattern:o_orderpriority", "v_priority_pattern"),
    ]
    stack_args = ", ".join(f"'{name}', {col}" for name, col in checks)
    return (
        one.select(
            F.expr(
                f"stack({len(checks)}, {stack_args}) AS (constraint, violations)"
            ),
            "n_rows",
        )
        .select(
            "constraint",
            "violations",
            "n_rows",
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy("constraint")
    )


_STATUS_SQL = ", ".join(f"'{s}'" for s in _ALLOWED_STATUS)

QUALITY_CONSTRAINTS_SQL = f"""
WITH one AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_orderkey_null,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_custkey_null,
         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_status_null,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_price_null,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_date_null,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_orderkey_dup,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ({_STATUS_SQL}) THEN 1 ELSE 0 END) AS BIGINT) AS v_status_set,
         CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS v_priority_pattern
  FROM orders
),
rows_out AS (
  SELECT 'not_null:o_orderkey' AS constraint, v_orderkey_null AS violations, n_rows FROM one
  UNION ALL SELECT 'not_null:o_custkey', v_custkey_null, n_rows FROM one
  UNION ALL SELECT 'not_null:o_orderstatus', v_status_null, n_rows FROM one
  UNION ALL SELECT 'not_null:o_totalprice', v_price_null, n_rows FROM one
  UNION ALL SELECT 'not_null:o_orderdate', v_date_null, n_rows FROM one
  UNION ALL SELECT 'unique:o_orderkey', v_orderkey_dup, n_rows FROM one
  UNION ALL SELECT 'range:o_totalprice>0', v_price_range, n_rows FROM one
  UNION ALL SELECT 'in_set:o_orderstatus', v_status_set, n_rows FROM one
  UNION ALL SELECT 'pattern:o_orderpriority', v_priority_pattern, n_rows FROM one
)
SELECT "constraint", violations, n_rows, violations = 0 AS passed
FROM rows_out ORDER BY "constraint"
"""


def quality_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every FK edge of
    the schema (lineitem→orders, orders→customer, customer→nation,
    supplier→nation). Each edge is a LEFT ANTI join — Spark's native
    NOT EXISTS — counted to one row, unioned. The PK side is projected
    to the key column only before the join (column pruning keeps the
    shuffle narrow at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    def orphans(name, child, fk, parent, pk):
        cnt = (
            child.select(F.col(fk).alias("k"))
            .join(parent.select(F.col(pk).alias("k")), "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("orphans"))
        )
        return cnt.select(F.lit(name).alias("fk_edge"), "orphans")

    return (
        orphans("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(
            orphans("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
        )
        .unionByName(
            orphans("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey")
        )
        .unionByName(
            orphans("supplier.s_nationkey->nation", s, "s_nationkey", n, "n_nationkey")
        )
        .orderBy("fk_edge")
    )


QUALITY_ORPHANS_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS orphans
FROM lineitem l
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
FROM orders o
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS
         (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
FROM customer c
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS
         (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)) AS BIGINT)
FROM supplier s
ORDER BY fk_edge
"""


def quality_daily_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-volume anomaly detection: daily event counts scored
    against the corpus mean/stddev (z-score, |z| > 2 flags the day).
    The scan reduces to one row per day BEFORE the stats pass, so the
    unpartitioned window runs over #days rows — the pre-aggregate is
    what makes a global window admissible at any scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.stddev_samp(
        "n_events"
    ).over(w)
    return (
        daily.select(
            "day",
            "n_events",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


QUALITY_VOLUME_SQL = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT day, n_events,
       ROUND((n_events - AVG(n_events) OVER ()) / STDDEV_SAMP(n_events) OVER (), 6) AS zscore,
       ABS((n_events - AVG(n_events) OVER ()) / STDDEV_SAMP(n_events) OVER ()) > 2.0 AS is_anomaly
FROM daily ORDER BY day
"""


def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of a table by primary
    key + row hash — the audit verb behind every migration sign-off,
    CDC replay check, and backfill validation ("what changed between
    yesterday's snapshot and today's?").

    Versions are derived deterministically here (v1 = orders with
    pre-correction prices capped at 200k and the two highest-key rows
    per priority dropped; v2 = the table as shipped) so the diff has
    all three change classes. Mechanics are the real thing: md5 over a
    canonical column rendering per row, ONE full outer join on the key,
    change class from null-ness + hash inequality, counted per class.
    At 100 TB both sides shuffle on the key once; no column-wise
    compare explosion — the hash collapses row equality to 16 bytes."""
    orders = load_table(spark, sf_dir, "orders")
    row_hash = lambda price: F.md5(  # noqa: E731
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.format_string("%.2f", price),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.col("o_orderpriority"),
        )
    )
    v2 = orders.select(
        F.col("o_orderkey").alias("k2"), row_hash(F.col("o_totalprice")).alias("h2")
    )
    capped = F.least(F.col("o_totalprice"), F.lit(200000.0))
    w_drop = F.col("o_orderkey") % 1000 < 2
    v1 = (
        orders.filter(~w_drop)
        .select(F.col("o_orderkey").alias("k1"), row_hash(capped).alias("h1"))
    )
    diff = v1.join(v2, F.col("k1") == F.col("k2"), "full_outer").select(
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
        .alias("change")
    )
    return (
        diff.groupBy("change")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change")
    )


SNAPSHOT_DIFF_SQL = """
WITH v2 AS (
  SELECT o_orderkey AS k2,
         md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
             printf('%.2f', o_totalprice),
             strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)) AS h2
  FROM orders
), v1 AS (
  SELECT o_orderkey AS k1,
         md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
             printf('%.2f', LEAST(o_totalprice, 200000.0)),
             strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)) AS h1
  FROM orders WHERE NOT (o_orderkey % 1000 < 2)
)
SELECT CASE WHEN k1 IS NULL THEN 'added'
            WHEN k2 IS NULL THEN 'removed'
            WHEN h1 <> h2 THEN 'changed'
            ELSE 'unchanged' END AS change,
       COUNT(*) AS n_rows
FROM v1 FULL OUTER JOIN v2 ON k1 = k2
GROUP BY 1 ORDER BY 1
"""


#: drift-report split date: events strictly before are the reference
#: window, the rest the comparison window
DRIFT_SPLIT = "2024-02-15"
#: value-histogram buckets for the drift comparison
DRIFT_BUCKETS = 10
DRIFT_BUCKET_WIDTH = 10.0


def quality_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring between two time windows: per
    event type, the total-variation distance (TVD = max|P-Q| over all
    event sets = 0.5 * sum |p_i - q_i|) between the value histograms of
    the reference period and the comparison period — the feature-drift
    gate of a production scoring pipeline.

    TVD instead of PSI/KL: the information-theoretic divergences need a
    log (transcendental — never oracle-exact and undefined on empty
    buckets), while TVD is pure rational arithmetic on bucket counts,
    equally monotone in drift, and robust to zero buckets. Bucket
    proportions divide through exact decimal casts; the final distance
    is tie-safe rounded.

    Scale: two map-side histogram aggregations at (type, bucket) grain,
    joined at metadata size (|types| x |buckets| rows). One fact scan."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.lit(DRIFT_BUCKETS - 1),
        F.floor(F.col("value") / DRIFT_BUCKET_WIDTH).cast("int"),
    ).alias("bucket")
    is_ref = F.col("ts") < DRIFT_SPLIT
    # ONE conditional aggregation per (type, bucket) carries both
    # periods' counts side by side — no period split, no self-join (a
    # split-then-full-outer formulation measured 10 exchanges from the
    # duplicated shared subtree; this shape is 4)
    g = (
        ev.select("event_type", bucket, is_ref.alias("is_ref"))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    totals = g.groupBy("event_type").agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    # bigint->double casts are exact (< 2^53) and one IEEE divide is
    # engine-identical; decimal/decimal division would hit per-engine
    # result-scale rules instead
    # a type present in only one period has tot=0 on the other side:
    # define its missing distribution as all-zero (TVD then reads 0.5 —
    # maximal drift for disjoint presence) instead of dividing by zero
    prop = lambda n, tot: F.when(  # noqa: E731
        F.col(tot) > 0, F.col(n).cast("double") / F.col(tot).cast("double")
    ).otherwise(F.lit(0.0))
    d = F.abs(prop("n_ref", "tot_ref") - prop("n_cur", "tot_cur"))
    return (
        g.join(F.broadcast(totals), "event_type")
        .select("event_type", d.alias("d"))
        .groupBy("event_type")
        .agg(
            F.round((F.sum(F.col("d").cast(DEC)) / 2).cast(DEC), 6)
            .cast("double")
            .alias("tvd")
        )
        .withColumn("drifted", (F.col("tvd") > 0.1).cast("int"))
        .orderBy("event_type")
    )


DRIFT_SQL = f"""
WITH g AS (
  SELECT event_type,
         LEAST({DRIFT_BUCKETS - 1},
               CAST(FLOOR(value / {DRIFT_BUCKET_WIDTH}) AS INT)) AS bucket,
         SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 0 ELSE 1 END) AS n_cur
  FROM events GROUP BY 1, 2
), totals AS (
  SELECT event_type, SUM(n_ref) AS tot_ref, SUM(n_cur) AS tot_cur
  FROM g GROUP BY 1
)
SELECT g.event_type,
       CAST(ROUND(CAST(SUM(CAST(ABS(
            CASE WHEN tot_ref > 0 THEN CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE) ELSE 0.0 END
            - CASE WHEN tot_cur > 0 THEN CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE) ELSE 0.0 END)
            AS DECIMAL(38,10))) / 2 AS DECIMAL(38,10)), 6) AS DOUBLE) AS tvd,
       CAST(CAST(ROUND(CAST(SUM(CAST(ABS(
            CASE WHEN tot_ref > 0 THEN CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE) ELSE 0.0 END
            - CASE WHEN tot_cur > 0 THEN CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE) ELSE 0.0 END)
            AS DECIMAL(38,10))) / 2 AS DECIMAL(38,10)), 6) AS DOUBLE) > 0.1 AS INT) AS drifted
FROM g JOIN totals USING (event_type)
GROUP BY g.event_type ORDER BY g.event_type
"""


def quality_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: the DETECTOR that pairs with the
    `join_salted_skew` mitigation (operators/joins.py). For the
    engine's heaviest fact join key (lineitem.l_orderkey) it reports
    the top-5 hottest keys with their row share and skew-vs-average
    factor — the exact numbers an operator reads before deciding to
    salt, raise AQE skew thresholds, or re-bucket a 100 TB table.

    Scale shape: one groupBy(key) count (map-side partial agg), a
    TakeOrderedAndProject top-5 head (never a global window over the
    key space), and a one-row broadcast totals frame for the shares —
    the |keys|-sized frame is reduced before anything global runs.
    All outputs are int/int arithmetic (exact cross-engine) rounded
    at 6."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    head = counts.orderBy(F.col("key_rows").desc(), F.col("l_orderkey").asc()).limit(5)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("key_rows").desc(), F.col("l_orderkey").asc())
    return (
        head.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "l_orderkey",
            F.col("key_rows").cast("long").alias("key_rows"),
            F.round(
                F.col("key_rows").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("key_share"),
            F.round(
                (F.col("key_rows") * F.col("n_keys")).cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("skew_vs_avg"),
        )
    )


QUALITY_SKEW_SQL = """
WITH counts AS (
  SELECT l_orderkey, COUNT(*) AS key_rows FROM lineitem GROUP BY l_orderkey
), totals AS (
  SELECT SUM(key_rows) AS total_rows, COUNT(*) AS n_keys FROM counts
), head AS (
  SELECT l_orderkey, key_rows FROM counts
  ORDER BY key_rows DESC, l_orderkey ASC LIMIT 5
)
SELECT ROW_NUMBER() OVER (ORDER BY key_rows DESC, l_orderkey ASC) AS rank,
       l_orderkey,
       CAST(key_rows AS BIGINT) AS key_rows,
       ROUND(CAST(key_rows AS DOUBLE) / CAST(total_rows AS DOUBLE), 6)
         AS key_share,
       ROUND(CAST(key_rows * n_keys AS DOUBLE) / CAST(total_rows AS DOUBLE), 6)
         AS skew_vs_avg
FROM head, totals
"""


QUERIES = {
    "quality_constraint_checks": quality_constraint_checks,
    "quality_join_skew_audit": quality_join_skew_audit,
    "quality_distribution_drift": quality_distribution_drift,
    "quality_snapshot_diff": quality_snapshot_diff,
    "quality_referential_orphans": quality_referential_orphans,
    "quality_daily_volume_anomaly": quality_daily_volume_anomaly,
}

ORACLES = {
    "quality_constraint_checks": QUALITY_CONSTRAINTS_SQL,
    "quality_join_skew_audit": QUALITY_SKEW_SQL,
    # promoted round 6 (held out of the full round-5 window; pinned by
    # tests/test_quality.py::test_distribution_drift_matches_oracle)
    "quality_distribution_drift": DRIFT_SQL,
    "quality_snapshot_diff": SNAPSHOT_DIFF_SQL,
    "quality_referential_orphans": QUALITY_ORPHANS_SQL,
    "quality_daily_volume_anomaly": QUALITY_VOLUME_SQL,
}
