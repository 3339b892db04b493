"""End-to-end ingestion pipeline — the reference's EP1 lifecycle
(reference citibike_project/etl/ingest_data.py:37-341: scrape ->
download -> decompress -> CSV parse -> chunked relational load)
collapsed into declarative Spark stages.

Orchestration is plain ordered Python on the driver (the reference's
Airflow slot, SURVEY.md §2 B4, shipped no DAGs — a stage list with
guarded_stage logging is the engine-scope equivalent)."""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .observability import guarded_stage, make_logger, stopwatch
from .sinks import write_partitioned_parquet
from .sources import extract_archive, read_trips_csv

log = make_logger(__name__)


@dataclass
class PipelineResult:
    n_rows: int
    n_months: int
    out_path: str
    timings: dict[str, float] = field(default_factory=dict)


@guarded_stage(log)
def clean_trips(trips: DataFrame) -> DataFrame:
    """Typed cleanup: dedup ride ids, non-null timestamps, derived trip
    duration — the transform the reference left to downstream dbt
    (which shipped no models)."""
    return (
        trips.dropDuplicates(["ride_id"])
        .filter(F.col("started_at").isNotNull() & F.col("ended_at").isNotNull())
        .withColumn(
            "duration_min",
            (F.unix_timestamp("ended_at") - F.unix_timestamp("started_at")) / 60.0,
        )
        .filter(F.col("duration_min") >= 0)
    )


def run_trips_pipeline(
    spark: SparkSession,
    source: str | list[str],
    out_path: str,
    archives: list[str] | None = None,
    scratch_dir: str | None = None,
) -> PipelineResult:
    """scrape/list -> (optional) unzip -> scan -> clean -> partitioned
    lakehouse write -> verify counts.

    The reference ingested one month per Postgres table
    (ingest_data.py:159); this writes ONE table partitioned by month —
    at 100 TB the partition column is the pruning key and no
    table-explosion happens."""
    timings: dict[str, float] = {}
    paths: list[str] = [source] if isinstance(source, str) else list(source)

    if archives:
        assert scratch_dir, "scratch_dir required when extracting archives"
        with stopwatch("extract", timings):
            for a in archives:
                extracted = extract_archive(a, Path(scratch_dir) / Path(a).stem)
                paths.extend(str(p) for p in extracted if p.suffix == ".csv")

    with stopwatch("scan_clean", timings):
        trips = clean_trips(read_trips_csv(spark, paths))

    with stopwatch("write", timings):
        write_partitioned_parquet(trips, out_path, ts_col="started_at")

    with stopwatch("verify", timings):
        written = spark.read.parquet(out_path)
        n_rows = written.count()
        n_months = written.select("month").distinct().count()

    return PipelineResult(n_rows=n_rows, n_months=n_months, out_path=out_path, timings=timings)
