"""SparkSession factory.

Replaces the reference's configured-but-empty Spark cluster slot
(reference: citibike_project/spark/Dockerfile:2-43,
citibike_project/docker-compose.yaml:78-113 — empty job file
spark-submit/app/my_spark_job.py). One session factory, tuned for
local[N] testing but with every scale-relevant knob set the way a
1000-executor cluster run would want it (AQE, skew-join handling,
partition coalescing, UTC session time).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Half of physical RAM in whole GiB, clamped to [4g, 24g] —
    see the spark.driver.memory comment below for the sf10 rationale.
    Falls back to 8g where /proc/meminfo is unavailable."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(4, min(24, int(total_gib // 2)))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "data_engineering_zoomcamp_projects_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Scale posture: AQE enabled so shuffle partition counts and join
    strategies re-plan at runtime from observed sizes (the local
    ``shuffle_partitions`` default is a ceiling, not a schedule);
    skew-join splitting on so a hot key cannot stall a stage; UTC
    session timezone so timestamp semantics are cluster-invariant.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # 2x cores as the pre-AQE ceiling; A/B at sf0.1 showed 32 vs 64
        # within run-to-run noise (AQE coalesces either way), so the
        # default favors headroom at larger scale factors
        shuffle_partitions = int(cpus) * 2

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # RAM-derived default (capped 24g, floored 4g): the round-9
        # sf10 (100x) probe showed 8g starves AQE broadcast builds
        # once a long session accumulates persisted pair memos +
        # per-round flood state ("Not enough memory to build and
        # broadcast" in dedup_cluster_components after 11 prior sf10
        # queries; clean at 24g on the 128 GiB bench box). Deriving
        # from MemTotal instead of hard-coding 24g keeps small hosts
        # from launching a JVM the OS would OOM-kill; deploy clusters
        # size the driver independently.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # plan-audit helpers parse rendered windowspecdefinition args;
        # the default field limit (25) truncates wide expression lists,
        # which would blind the single-partition-window guard
        .config("spark.sql.debug.maxToStringFields", "1000")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as raw long nanos, the catalog
        # converts to a microsecond timestamp (matching DuckDB's own
        # ns->us truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
