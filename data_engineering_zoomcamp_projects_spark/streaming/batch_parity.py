"""Streaming-operator semantics in batch mode (SURVEY.md §2 C-streaming).

These queries define the EXACT semantics of the engine's streaming jobs
(streaming/jobs.py runs the same aggregations via readStream): tumbling,
sliding and session windows, and event dedup over the `events` table.
Running them as batch queries makes them oracle-checkable; the streaming
tests then assert stream-batch parity against these same frames.

The reference has no streaming at all (its closest analog is the chunked
incremental load loop, reference citibike_project/etl/ingest_data.py:171-181);
this surface is the driver-contract extension.

Scale: windowed aggregation shuffles on (window, key) — bounded groups;
session windows shuffle on user_id then sort per user (Spark's
session_window does exactly this under the hood)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.parity import dsum, sql_dsum, ts_str


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "total_value"))
        .select(
            ts_str(F.col("w.start"), "window_start"),
            ts_str(F.col("w.end"), "window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


STREAM_TUMBLING_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, COUNT(*) AS n,
       {sql_dsum('value', 'total_value')}
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


def stream_sliding_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour duration, 15-minute slide (each event lands
    in exactly 4 windows). The oracle reproduces Spark's epoch-aligned
    window assignment with a generate_series lateral join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "total_value"))
        .select(
            ts_str(F.col("w.start"), "window_start"),
            "n",
            "total_value",
        )
    )


STREAM_SLIDING_SQL = f"""
SELECT strftime(TIMESTAMP '1970-01-01'
         + to_seconds(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) - k.k * 900),
         '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       {sql_dsum('value', 'total_value')}
FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
GROUP BY 1
"""


def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user
    (session end = last event + gap, Spark's convention). The oracle is
    the classic gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), "total_value"))
        .select(
            "user_id",
            ts_str(F.col("w.start"), "session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            ts_str(F.col("w.end"), "session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            "n_events",
            "total_value",
        )
    )


STREAM_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessioned AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
  COUNT(*) AS n_events,
  {sql_dsum('value', 'total_value')}
FROM sessioned GROUP BY user_id, session_id
"""


def stream_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-dedup semantics in batch: dropDuplicates on the event id
    (the batch twin of dropDuplicatesWithinWatermark), summarized."""
    ev = load_table(spark, sf_dir, "events")
    deduped = ev.select("event_id", "user_id").dropDuplicates(["event_id"])
    return deduped.agg(
        F.count(F.lit(1)).alias("n_unique_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.sum("event_id").alias("id_checksum"),
    )


STREAM_DEDUP_SQL = """
SELECT COUNT(*) AS n_unique_events,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM (SELECT DISTINCT event_id, user_id FROM events)
"""


def stream_event_type_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily event rates — the foreachBatch-style rollup the
    engine's streaming sink materializes incrementally."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), "total_value"),
        )
    )


STREAM_RATES_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n, {sql_dsum('value', 'total_value')}
FROM events GROUP BY 1, 2
"""


def _stream_live_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry shim for the TRUE readStream path (see
    streaming/jobs.py:stream_live_tumbling_hourly) — imported lazily so
    this module stays import-light."""
    from .jobs import stream_live_tumbling_hourly

    return stream_live_tumbling_hourly(spark, sf_dir)


def _stream_live_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .jobs import stream_live_session_30m

    return stream_live_session_30m(spark, sf_dir)


def _stream_live_join_purchase_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .jobs import stream_live_join_purchase_views

    return stream_live_join_purchase_views(spark, sf_dir)


def _stream_live_sliding_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .jobs import stream_live_sliding_15m

    return stream_live_sliding_15m(spark, sf_dir)


def _stream_live_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .jobs import stream_live_dedup_summary

    return stream_live_dedup_summary(spark, sf_dir)


def _stream_live_ingest_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .jobs import stream_live_ingest_neardup

    return stream_live_ingest_neardup(spark, sf_dir)


def _stream_live_ingest_neardup_sql() -> str:
    from .jobs import _ingest_neardup_oracle_sql

    return _ingest_neardup_oracle_sql()


def _stream_live_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .jobs import stream_live_index_append

    return stream_live_index_append(spark, sf_dir)


def _stream_live_index_append_sql() -> str:
    # the union over micro-batches equals the one-shot batch append
    # (per-row map-side assignment, order-independent) — shared oracle
    from ..llm.similarity import _sim_index_append_sql

    return _sim_index_append_sql()


def _stream_live_join_sql() -> str:
    from .jobs import STREAM_LIVE_JOIN_SQL

    return STREAM_LIVE_JOIN_SQL


def _stream_live_dedup_sql() -> str:
    from .jobs import STREAM_LIVE_DEDUP_SQL

    return STREAM_LIVE_DEDUP_SQL


QUERIES = {
    "stream_tumbling_hourly": stream_tumbling_hourly,
    # the REAL readStream engine outputs, sharing the batch oracles
    "stream_live_tumbling_hourly": _stream_live_tumbling_hourly,
    "stream_live_session_30m": _stream_live_session_30m,
    "stream_live_sliding_15m": _stream_live_sliding_15m,
    "stream_live_dedup_summary": _stream_live_dedup_summary,
    "stream_live_join_purchase_views": _stream_live_join_purchase_views,
    "stream_live_ingest_neardup": _stream_live_ingest_neardup,
    "stream_live_index_append": _stream_live_index_append,
    "stream_sliding_15m": stream_sliding_15m,
    "stream_session_30m": stream_session_30m,
    "stream_dedup_summary": stream_dedup_summary,
    "stream_event_type_rates": stream_event_type_rates,
}

ORACLES = {
    "stream_tumbling_hourly": STREAM_TUMBLING_SQL,
    "stream_live_tumbling_hourly": STREAM_TUMBLING_SQL,
    "stream_live_session_30m": STREAM_SESSION_SQL,
    "stream_live_sliding_15m": STREAM_SLIDING_SQL,
    "stream_live_dedup_summary": _stream_live_dedup_sql(),
    "stream_live_join_purchase_views": _stream_live_join_sql(),
    "stream_live_ingest_neardup": _stream_live_ingest_neardup_sql(),
    "stream_live_index_append": _stream_live_index_append_sql(),
    "stream_sliding_15m": STREAM_SLIDING_SQL,
    "stream_session_30m": STREAM_SESSION_SQL,
    "stream_dedup_summary": STREAM_DEDUP_SQL,
    "stream_event_type_rates": STREAM_RATES_SQL,
}


def stream_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized funnel: per user, sessions (30-min gap) that contain
    a view followed (strictly later) by a purchase — the conversion
    metric a streaming analytics pipeline maintains incrementally."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sessioned = (
        ev.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap >= 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per_session = sessioned.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias(
            "last_purchase"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                (
                    F.col("first_view").isNotNull()
                    & F.col("last_purchase").isNotNull()
                    & (F.col("last_purchase") > F.col("first_view"))
                ).cast("long")
            ).alias("n_converting_sessions"),
        )
        .orderBy("user_id")
    )


STREAM_FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessioned AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id,
    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
    MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase
  FROM sessioned GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
  CAST(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
                 AND last_purchase > first_view THEN 1 ELSE 0 END) AS BIGINT)
    AS n_converting_sessions
FROM per_session GROUP BY user_id ORDER BY user_id
"""

QUERIES["stream_funnel_view_purchase"] = stream_funnel_view_purchase
ORACLES["stream_funnel_view_purchase"] = STREAM_FUNNEL_SQL
