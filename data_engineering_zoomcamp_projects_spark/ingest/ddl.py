"""Catalog DDL + existence probes (SURVEY.md §2 A8/A9/A14/A15).

The reference probed Postgres catalogs with text SQL
(reference citibike_project/etl/ingest_data.py:213-217 `SELECT 1 FROM
pg_database`, :251-253 `to_regclass`) and generated DDL from inferred
pandas dtypes (ingest-citibike.ipynb cell 10 pd.io.sql.get_schema).
Spark's catalog API does all of it natively."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def database_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.databaseExists(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def create_database_if_absent(spark: SparkSession, name: str) -> bool:
    """Conditional CREATE DATABASE (reference A15). Returns True if it
    was created now."""
    if database_exists(spark, name):
        return False
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    return True


def schema_ddl(df: DataFrame) -> str:
    """DDL column list from a DataFrame schema (reference A9 used
    pd.io.sql.get_schema on inferred dtypes)."""
    return df.schema.toDDL()


def create_table_from_frame(
    spark: SparkSession, df: DataFrame, table: str, path: str | None = None
) -> None:
    """CREATE TABLE with the frame's schema, zero rows (reference A8's
    schema-only pre-write). With `path`, creates an external table."""
    writer = df.limit(0).write.mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
