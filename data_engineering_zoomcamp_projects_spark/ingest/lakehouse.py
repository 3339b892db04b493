"""Jar-guarded lakehouse + Postgres wire paths (SURVEY.md §2 B2, A10-A12).

The reference declared an Iceberg-on-MinIO lakehouse (reference
citibike_project/spark/spark-defaults.conf:1-8) and shipped the
Postgres JDBC driver in its Spark image (citibike_project/spark/
Dockerfile:42-43). Neither jar exists in this sandbox and none can be
fetched (COVERAGE.md "Unobtainable dependencies": no DNS, empty ivy
cache) — so every function here FEATURE-DETECTS its jar on the live
JVM classpath and either runs the real path (deploy) or degrades to
the parquet/Derby emulation with identical query-level semantics
(here). Tests assert the detector's verdict matches the documented
environment and skip-with-reason on the real-path halves, so
`pytest -rs` shows exactly which wire protocols ran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Iceberg catalog config, verbatim shape of the reference's
#: spark-defaults.conf (hadoop-type catalog on a warehouse path; the
#: reference pointed the warehouse at MinIO via s3a — any URI works).
ICEBERG_CONF = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.lake.type": "hadoop",
}


def _jvm_class_present(spark: SparkSession, cls: str) -> bool:
    """True iff `cls` is loadable on the driver JVM classpath."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the classpath."""
    return _jvm_class_present(spark, "org.apache.iceberg.spark.SparkCatalog")


def postgres_jdbc_available(spark: SparkSession) -> bool:
    """True when the Postgres JDBC driver jar is on the classpath."""
    return _jvm_class_present(spark, "org.postgresql.Driver")


def iceberg_conf(warehouse: str) -> dict[str, str]:
    """extra_conf for session.get_spark enabling the `lake` catalog —
    pass-through of the reference's catalog wiring with the warehouse
    URI parameterized (s3a://… at deploy, file:/… in tests)."""
    return {**ICEBERG_CONF, "spark.sql.catalog.lake.warehouse": warehouse}


def write_iceberg(df: DataFrame, table: str, mode: str = "create") -> None:
    """DataFrameWriterV2 path to an Iceberg table (`lake.db.t`).

    mode: 'create' (createOrReplace), 'append', or 'overwrite'
    (dynamic partition overwrite). Requires iceberg_available() — the
    V2 writer raises CatalogNotFound otherwise; callers in a jar-less
    environment use ingest.sinks.write_partitioned_parquet, whose
    partition layout Iceberg's hidden partitioning replaces."""
    w = df.writeTo(table)
    if mode == "create":
        w.using("iceberg").createOrReplace()
    elif mode == "append":
        w.append()
    elif mode == "overwrite":
        w.overwritePartitions()
    else:
        raise ValueError(f"unknown mode {mode!r}")


def merge_upsert(
    spark: SparkSession,
    target_table: str,
    updates: DataFrame,
    key: str,
) -> None:
    """Last-writer-wins MERGE INTO an Iceberg table — the transactional
    form of ingest.upsert.upsert (same semantics: matched rows update,
    new keys insert). Iceberg rewrites only the data files containing
    matched keys (merge-on-read deletes at deploy scale), so the cost
    is proportional to touched files, not table size."""
    updates.createOrReplaceTempView("_merge_updates")
    cols = updates.columns
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c != key)
    names = ", ".join(cols)
    vals = ", ".join(f"s.{c}" for c in cols)
    spark.sql(
        f"""
        MERGE INTO {target_table} t
        USING _merge_updates s
        ON t.{key} = s.{key}
        WHEN MATCHED THEN UPDATE SET {sets}
        WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})
        """
    )


def postgres_roundtrip(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
) -> DataFrame:
    """Write `df` to Postgres over JDBC and read it back — the A10-A12
    wire check the sandbox cannot run (driver jar unobtainable; the
    PostgresDialect DDL itself is live-validated against a real PG 15
    in ingest/ddl.py tests). Partitioned write, predicate-pushdown-able
    read."""
    opts = {"user": user, "password": password, "driver": "org.postgresql.Driver"}
    from .sinks import write_jdbc

    write_jdbc(df, url, table, mode="overwrite", **opts)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()
