"""Catalog DDL + existence probes (SURVEY.md §2 A8/A9/A14/A15).

The reference probed Postgres catalogs with text SQL
(reference citibike_project/etl/ingest_data.py:213-217 `SELECT 1 FROM
pg_database`, :251-253 `to_regclass`) and generated DDL from inferred
pandas dtypes (ingest-citibike.ipynb cell 10 pd.io.sql.get_schema).
Spark's catalog API does all of it natively."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


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


#: Catalyst type -> Postgres column type, the same mapping Spark's JDBC
#: PostgresDialect applies when writing a DataFrame to Postgres (the
#: reference's target DB, citibike_project/spark/Dockerfile:42-43).
_PG_TYPES: dict[type, str] = {
    T.StringType: "TEXT",
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "SMALLINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.BinaryType: "BYTEA",
}


def postgres_ddl(df: DataFrame, table: str) -> str:
    """CREATE TABLE statement in POSTGRES dialect for the frame's schema
    (reference A9 generated Postgres DDL via pd.io.sql.get_schema;
    Spark's ``schema.toDDL`` emits Catalyst types like STRING that
    Postgres rejects). Validated against a live Postgres server in
    tests/test_ingest.py."""
    cols = []
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.DecimalType):
            pg = f"NUMERIC({dt.precision},{dt.scale})"
        else:
            try:
                pg = _PG_TYPES[type(dt)]
            except KeyError:
                raise ValueError(
                    f"no Postgres mapping for column {f.name!r} of type {dt}"
                ) from None
        null = "" if f.nullable else " NOT NULL"
        cols.append(f'"{f.name}" {pg}{null}')
    return f'CREATE TABLE "{table}" ({", ".join(cols)})'


def create_table_from_frame(
    spark: SparkSession, df: DataFrame, table: str, path: str | None = None
) -> None:
    """CREATE TABLE with the frame's schema, zero rows (reference A8's
    schema-only pre-write). With `path`, creates an external table."""
    writer = df.limit(0).write.mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
