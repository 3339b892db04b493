"""Jar-guarded lakehouse/Postgres wire paths (SURVEY.md §2 B2, A10-A12).

Each real-path test feature-detects its jar on the live JVM and skips
with the documented reason where absent (this sandbox: no DNS, no ivy
cache — COVERAGE.md "Unobtainable dependencies"). At deploy, where
iceberg-spark-runtime / postgresql jars exist, the same tests run the
real writeTo/MERGE INTO/JDBC wire protocols unchanged. `pytest -rs`
shows which half executed.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_zoomcamp_projects_spark.ingest import lakehouse
from data_engineering_zoomcamp_projects_spark.ingest.upsert import upsert


def _bundled_jars(pattern: str) -> list[str]:
    import pyspark

    return glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", pattern))


def test_iceberg_detection_consistent_with_classpath(spark):
    """The guard must be truthful in BOTH environments: if the runtime
    jar is bundled the detector must say so; it must never claim a jar
    this classpath cannot load."""
    avail = lakehouse.iceberg_available(spark)
    if _bundled_jars("iceberg-spark-runtime*"):
        assert avail
    else:
        assert not avail


def test_postgres_detection_consistent_with_classpath(spark):
    avail = lakehouse.postgres_jdbc_available(spark)
    if _bundled_jars("postgresql-*"):
        assert avail
    else:
        assert not avail


def test_iceberg_conf_is_reference_catalog_shape():
    """The deploy conf must carry the reference's catalog wiring
    (spark-defaults.conf:1-8 shape) with the warehouse parameterized —
    this is what session.get_spark(extra_conf=...) receives at deploy."""
    conf = lakehouse.iceberg_conf("file:/tmp/wh")
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert conf["spark.sql.catalog.lake.warehouse"] == "file:/tmp/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_write_and_merge(spark, tmp_path):
    """Real V2 writer + MERGE INTO path — runs wherever the runtime jar
    exists; here it documents its own absence."""
    if not lakehouse.iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar absent (unobtainable in-sandbox, "
            "COVERAGE.md) — writeTo/MERGE runs at deploy"
        )
    for k, v in lakehouse.iceberg_conf(f"file:{tmp_path}/wh").items():
        if k != "spark.sql.extensions":  # build-time only
            spark.conf.set(k, v)
    base = spark.range(5).withColumn("v", F.col("id") * 10)
    lakehouse.write_iceberg(base, "lake.db.t", mode="create")
    updates = spark.range(3, 8).withColumn("v", F.lit(-1).cast("long"))
    lakehouse.merge_upsert(spark, "lake.db.t", updates, key="id")
    got = {r["id"]: r["v"] for r in spark.table("lake.db.t").collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: -1, 4: -1, 5: -1, 6: -1, 7: -1}


def test_merge_semantics_equal_parquet_emulation(spark):
    """The jar-less degrade (ingest.upsert.upsert) and MERGE INTO make
    the same table: last-writer-wins on the key, new keys inserted.
    This half runs HERE, pinning the semantics the guarded path must
    reproduce at deploy (the MERGE test above asserts the identical
    expected dict)."""
    base = spark.range(5).withColumn("v", F.col("id") * 10)
    updates = spark.range(3, 8).withColumn("v", F.lit(-1).cast("long"))
    got = {r["id"]: r["v"] for r in upsert(base, updates, "id").collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: -1, 4: -1, 5: -1, 6: -1, 7: -1}


def test_postgres_jdbc_roundtrip(spark):
    """Wire-level A10-A12: Spark JDBC write then read-back against a
    real Postgres. Two-layer guard: the driver jar (classpath), then a
    deploy-provided TCP URL (the sandbox PG is unix-socket-only)."""
    if not lakehouse.postgres_jdbc_available(spark):
        pytest.skip(
            "postgresql JDBC jar absent (unobtainable in-sandbox, "
            "COVERAGE.md) — dialect itself is live-validated via psql in "
            "test_ingest.py::test_postgres_ddl_valid_on_live_server"
        )
    url = os.environ.get("SPARK_GRAFT_PG_URL")
    if not url:
        pytest.skip("set SPARK_GRAFT_PG_URL=jdbc:postgresql://host/db to run")
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    back = lakehouse.postgres_roundtrip(
        spark,
        df,
        url,
        "roundtrip_check",
        os.environ.get("SPARK_GRAFT_PG_USER", "postgres"),
        os.environ.get("SPARK_GRAFT_PG_PASSWORD", ""),
    )
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (i, i * 2) for i in range(10)
    ]
