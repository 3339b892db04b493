"""Sink operators (SURVEY.md §2 Part A: A8-A11, A17-A18).

Replaces the reference's table-per-month Postgres layout
(reference citibike_project/etl/ingest_data.py:159, :166) with
partitioned columnar tables, and fixes its overwrite-per-chunk bug
(ingest_data.py:277-280: every BigQuery chunk wrote with
if_exists='replace', so only the final chunk survived — documented
divergence: we overwrite once, then append)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_col: str = "month",
    ts_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Monthly-partitioned parquet sink — the lakehouse replacement for
    table-per-month (partition pruning gives the same per-month access
    path without N tables). If `ts_col` is given, derives the partition
    column from it."""
    out = df
    if ts_col is not None:
        out = df.withColumn(
            partition_col, F.date_format(F.date_trunc("month", ts_col), "yyyy-MM")
        )
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib default codec) — partition layout identical to the
    parquet sink so Hive-era consumers get the same pruning."""
    w = df.write.mode(mode)
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.orc(path)


def write_csv_gzip(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Compressed CSV sink (reference A17 gzipped files post-hoc with
    shutil; the writer compresses inline)."""
    df.write.mode(mode).option("header", True).option("compression", "gzip").csv(path)


def overwrite_then_append(
    batches: list[DataFrame], path: str, fmt: str = "parquet"
) -> None:
    """Correct incremental materialization: first batch overwrites, the
    rest append. This is the fixed semantics of the reference's buggy
    per-chunk replace (ingest_data.py:277-280)."""
    for i, b in enumerate(batches):
        b.write.mode("overwrite" if i == 0 else "append").format(fmt).save(path)


def schema_only_write(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Zero-row schema materialization (reference A8:
    df.head(0).to_sql(if_exists='replace') locked DDL before append)."""
    df.limit(0).write.mode("overwrite").format(fmt).save(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    **options: str,
) -> None:
    """JDBC sink (reference A10/A11; postgres JDBC jar was already baked
    into the reference's Spark image, spark/Dockerfile:42-43). Requires
    the driver jar at deploy time — not available in this environment."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def write_sorted_layout(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Data-skipping layout: range-partition by `cols` then sort within
    partitions before writing parquet. Files (and row groups) get
    DISJOINT min/max ranges on the layout columns, so any engine that
    reads parquet footers (Spark, DuckDB, Trino) skips whole files for
    selective predicates — at 100 TB this is the difference between a
    full scan and touching a handful of files. The claim is verified in
    tests by reading the written footers: per-file [min, max] intervals
    on the lead column must not overlap."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed-table sink: hash-bucket rows by `key` into
    `n_buckets` files (sorted within buckets when `sort_cols` is
    given) via ``bucketBy().saveAsTable()``. Two tables bucketed on
    the SAME key with the SAME bucket count join with ZERO shuffle on
    either side — Catalyst proves the co-location from catalog
    metadata (HashPartitioning(key, n) on both children satisfies the
    join's distribution requirement), so a 100 TB fact-fact join that
    would otherwise move both tables becomes a per-bucket local merge.
    This is the pre-shuffle-once, join-many-times layout lever the
    brief calls out; verified in tests by asserting the joined plan
    contains no Exchange. Bucketing requires the session catalog
    (path-only parquet has nowhere to record bucket metadata)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_col: str
) -> None:
    """Dynamic partition overwrite: rewrite ONLY the partitions present
    in `df`, leaving every other partition untouched — the idempotent
    daily-backfill write ("re-run yesterday" must not truncate the
    table, which is exactly what static overwrite mode does). Session
    conf is scoped to this write and restored."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set(key, prev)


def compact_parquet(
    spark,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction — the table-maintenance op every
    streaming/incremental parquet sink eventually needs (thousands of
    KB-sized files turn listing + task scheduling into the bottleneck
    long before scan cost matters). Rewrites `path` with
    ceil(rows / target_rows_per_file) files via repartition, preserving
    values exactly; returns the new file count.

    The rewrite stages through a sibling temp dir (read and overwrite
    of the SAME path in one plan is undefined — Spark deletes the input
    mid-scan), then swaps via rename-aside: the live dir moves to
    `path__old`, the rewrite moves into place, and only then is the old
    copy deleted — so a crash at any point leaves a readable dataset at
    either the published path or the `__old` sibling, never neither
    (the old delete-then-move window left NO readable data and fed
    concurrent readers FileNotFound). Local filesystem paths only: the
    stdlib fs swap silently no-ops on object-store URIs, so those are
    rejected up front — at deploy this op runs per partition directory
    under a metastore/Iceberg lock, and Iceberg's rewrite_data_files is
    the managed equivalent (jar-gated here, see lakehouse.py)."""
    import math
    import os
    import shutil

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"compact_parquet swaps directories with local fs calls; "
            f"got non-local URI {path!r} — use Iceberg rewrite_data_files "
            f"(lakehouse.py) for object-store tables"
        )
    local = path[len("file://"):] if path.startswith("file://") else path
    src = spark.read.parquet(path)
    n_rows = src.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp = local.rstrip("/") + "__compact_tmp"
    old = local.rstrip("/") + "__old"
    src.repartition(n_files).write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a prior crashed swap
    os.rename(local.rstrip("/"), old)
    os.rename(tmp, local.rstrip("/"))
    shutil.rmtree(old)
    return n_files


def write_object_store(df: DataFrame, uri: str, fmt: str = "parquet") -> None:
    """Object-store sink (reference A18 uploaded files via
    google-cloud-storage; Spark writes s3a://, gs:// URIs directly given
    the hadoop connector jars — the reference's own spark-defaults.conf
    already wired s3a to MinIO, spark/spark-defaults.conf:5-8)."""
    df.write.mode("overwrite").format(fmt).save(uri)
