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


def boto3_available() -> bool:
    """Import-guard for the object-store bucket DDL (same discipline as
    the Iceberg jar probe in lakehouse.py: only the specific
    module-absent failure maps to False; anything else propagates)."""
    try:
        import boto3  # noqa: F401
    except ImportError:
        return False
    return True


def ensure_bucket(
    endpoint_url: str,
    name: str,
    access_key: str | None = None,
    secret_key: str | None = None,
    client=None,
) -> bool:
    """Conditional object-store bucket DDL (reference A19:
    citibike_project/ingest-citibike.ipynb raw lines 54-63 — a boto3
    client against MinIO + unconditional ``create_bucket``, which throws
    on re-run). Driver-side infra bootstrap, not a data path: runs once
    before any s3a:// sink (ingest/sinks.py A18) writes.

    Returns True if the bucket was created now, False if it already
    existed. Probe-then-create (the A14/A15 existence-probe discipline
    the reference applied to databases but not buckets): only a
    404/NoSuchBucket head response routes to create; any other failure
    (auth, endpoint down, 403 owned-by-someone-else) propagates rather
    than masquerading as "absent".

    ``client`` is injectable so tests exercise the probe/create logic
    without boto3 or a network endpoint.
    """
    if client is None:
        import boto3

        client = boto3.client(
            "s3",
            endpoint_url=endpoint_url,
            aws_access_key_id=access_key,
            aws_secret_access_key=secret_key,
        )
    try:
        client.head_bucket(Bucket=name)
        return False
    except Exception as exc:
        code = str(
            getattr(exc, "response", None)
            and exc.response.get("Error", {}).get("Code", "")
            or ""
        )
        if code not in ("404", "NoSuchBucket"):
            raise
    client.create_bucket(Bucket=name)
    return True


def create_table_from_frame(
    spark: SparkSession, df: DataFrame, table: str, path: str | None = None
) -> None:
    """CREATE TABLE with the frame's schema, zero rows (reference A8's
    schema-only pre-write). With `path`, creates an external table."""
    writer = df.limit(0).write.mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
