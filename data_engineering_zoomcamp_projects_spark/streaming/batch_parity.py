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

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_sliding_15m": stream_sliding_15m,
    "stream_session_30m": stream_session_30m,
    "stream_dedup_summary": stream_dedup_summary,
    "stream_event_type_rates": stream_event_type_rates,
}

ORACLES = {
    "stream_tumbling_hourly": STREAM_TUMBLING_SQL,
    "stream_sliding_15m": STREAM_SLIDING_SQL,
    "stream_session_30m": STREAM_SESSION_SQL,
    "stream_dedup_summary": STREAM_DEDUP_SQL,
    "stream_event_type_rates": STREAM_RATES_SQL,
}
