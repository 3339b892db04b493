"""Source operators — the reference's ingestion surface re-expressed
Spark-first (SURVEY.md §2 Part A).

Reference parity map (paths relative to /root/reference/):
- A1 HTTP source listing  citibike_project/etl/ingest_data.py:59-69
  -> parse_s3_listing / list_source_urls (driver-side discovery feeding
     spark.read; no BeautifulSoup — stdlib XML over the bucket index)
- A2 file fetch           ingest_data.py:72-92 (wget subprocess)
  -> fetch_url (stdlib urllib, driver-side, gated; production reads
     s3a:// directly so fetch is usually unnecessary)
- A3/A4 decompress        ingest_data.py:95-113
  -> extract_zip_distributed (binaryFile + mapInPandas, executor-side —
     the scale path) with extract_archive (zip/tar driver-side) as the
     small-file fallback; gz/bz2 need nothing — Spark's text/csv codecs
     decompress transparently
- A5 file-glob scan       ingest_data.py:122-143 (parquet TODO :137)
  -> read_csv_tree glob paths; read_parquet covers the TODO
- A6 CSV + timestamp cast ingest_data.py:161-162
  -> read_trips_csv with explicit StructType (inference is the
     schema-drift fallback, mirroring the reference's inferred model)
- A7 chunked iteration    ingest_data.py:168-181
  -> nothing to do: file-split partitioning replaces manual chunking
     (tune spark.sql.files.maxPartitionBytes)
- A12 federated extract   ingest_data.py:264-284
  -> read_jdbc_partitioned: predicate pushdown + partitionColumn
     parallel read replaces LIMIT/OFFSET pagination
"""

from __future__ import annotations

import tarfile
import urllib.request
import zipfile
from pathlib import Path
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Citibike monthly-file schema (FIXTURES.md §2 trips_modern; timestamp
#: columns evidenced at reference ingest_data.py:162 parse_dates)
TRIPS_SCHEMA = T.StructType(
    [
        T.StructField("ride_id", T.StringType()),
        T.StructField("rideable_type", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("ended_at", T.TimestampType()),
        T.StructField("start_station_name", T.StringType()),
        T.StructField("start_station_id", T.StringType()),
        T.StructField("end_station_name", T.StringType()),
        T.StructField("end_station_id", T.StringType()),
        T.StructField("start_lat", T.DoubleType()),
        T.StructField("start_lng", T.DoubleType()),
        T.StructField("end_lat", T.DoubleType()),
        T.StructField("end_lng", T.DoubleType()),
        T.StructField("member_casual", T.StringType()),
    ]
)


def parse_s3_listing(xml_text: str, suffix: str = ".zip") -> list[str]:
    """Parse an S3 bucket-index XML document into matching keys
    (reference A1 scraped https://s3.amazonaws.com/tripdata/ the same
    way with BeautifulSoup)."""
    root = ElementTree.fromstring(xml_text)
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    keys = [el.text for el in root.iter(f"{ns}Key") if el.text]
    return [k for k in keys if k.endswith(suffix)]


def list_source_urls(xml_text: str, base_url: str, suffix: str = ".zip") -> list[str]:
    return [f"{base_url.rstrip('/')}/{k}" for k in parse_s3_listing(xml_text, suffix)]


def fetch_url(url: str, dest_dir: str, timeout: int = 60) -> Path:
    """Driver-side idempotent fetch (reference A2 used `wget -N`).
    Network-gated: only used in deployments that cannot read object
    storage directly."""
    dest = Path(dest_dir) / url.rsplit("/", 1)[-1]
    dest.parent.mkdir(parents=True, exist_ok=True)
    if not dest.exists():
        with urllib.request.urlopen(url, timeout=timeout) as r, open(dest, "wb") as f:
            f.write(r.read())
    return dest


def extract_archive(path: str | Path, out_dir: str | Path) -> list[Path]:
    """Driver-side decompression for container formats (reference A3/A4).
    gz/bz2 single-file compression never needs this — Spark reads
    `.csv.gz` transparently."""
    path, out_dir = Path(path), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(out_dir)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            t.extractall(out_dir)
    else:
        raise ValueError(f"not a zip/tar archive: {path}")
    return sorted(p for p in out_dir.rglob("*") if p.is_file())


def extract_zip_distributed(spark: SparkSession, path_glob: str) -> DataFrame:
    """EXECUTOR-side zip extraction (the 100 TB path for reference A3;
    SURVEY.md:110): a ``binaryFile`` scan partitions the archives across
    the cluster and an Arrow ``mapInPandas`` unzips each archive where
    its bytes landed — the driver never touches archive content (the
    driver-side ``extract_archive`` remains the small-file fallback).

    Returns (archive, member, n_bytes, content) one row per zip member.
    Scale notes: binaryFile assigns whole files to tasks, so parallelism
    = number of archives (monthly zips -> hundreds of tasks); memory per
    task is bounded by one archive's decompressed size."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path_glob)
        .select("path", "content")
    )

    def unzip(batches):
        import io
        import zipfile as zf

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with zf.ZipFile(io.BytesIO(content)) as z:
                    for info in z.infolist():
                        if info.is_dir():
                            continue
                        rows.append(
                            (path, info.filename, info.file_size, z.read(info))
                        )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "n_bytes", "content"]
            )

    return bin_df.mapInPandas(
        unzip, "archive string, member string, n_bytes long, content binary"
    )


def read_zipped_trips_csv(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed unzip + CSV parse in one pass: zip members are parsed
    with pandas inside the same Arrow batch that extracted them, so
    archive bytes never move to the driver and never hit local disk.
    Output schema/typing matches ``read_trips_csv`` (TRIPS_SCHEMA)."""
    members = extract_zip_distributed(spark, path_glob).filter(
        F.col("member").endswith(".csv")
    )
    ts_cols = [
        f.name for f in TRIPS_SCHEMA.fields if isinstance(f.dataType, T.TimestampType)
    ]
    names = [f.name for f in TRIPS_SCHEMA.fields]

    def parse(batches):
        import io

        import pandas as pd

        for pdf in batches:
            frames = []
            for content in pdf["content"]:
                df = pd.read_csv(io.BytesIO(content))
                df = df[[c for c in names if c in df.columns]]
                for c in names:
                    if c not in df.columns:
                        df[c] = None
                for c in ts_cols:
                    df[c] = pd.to_datetime(df[c])
                frames.append(df[names])
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame({c: [] for c in names})
            )

    return members.select("content").mapInPandas(parse, TRIPS_SCHEMA)


def read_trips_csv(
    spark: SparkSession, paths: str | list[str], infer: bool = False
) -> DataFrame:
    """CSV scan with timestamp parsing (reference A6). Explicit schema
    by default — schema inference (`infer=True`) mirrors the
    reference's pandas behavior and is the schema-drift fallback."""
    reader = spark.read.option("header", True)
    if infer:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(TRIPS_SCHEMA)
    return reader.csv(paths)


def read_csv_tree(spark: SparkSession, root_glob: str) -> DataFrame:
    """Glob scan over a month-per-directory tree (reference A5 walked
    unzipped_files/*/ in Python; one glob path does it distributed).
    Drifted schemas across months are unioned by name."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("recursiveFileLookup", True)
        .csv(root_glob)
    )


def read_json_records(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """ORC scan — the other columnar interchange format a warehouse
    migration brings in (Hive-era tables are predominantly ORC). Same
    pushdown/pruning behavior as parquet: predicate + column pruning
    reach the ORC reader via the native Spark source."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob_filter: str | None = None
) -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content) — the
    ingestion edge for multimodal corpora (images/audio land as opaque
    `binary` + typed metadata, per SURVEY §2 C-LLM multimodal columns;
    llm/multimodal.py's mapInPandas decoders consume the `content`
    column downstream). `glob_filter` prunes by extension at the
    LISTING level (pathGlobFilter) so non-matching files are never
    opened; at 100 TB the file listing itself is distributed by the
    source."""
    reader = spark.read.format("binaryFile")
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    return reader.load(path)


def read_parquet_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of every parquet file
    under `path` (mergeSchema) so batches written before a column was
    added read back with NULLs in the missing slots — the append-only
    lakehouse contract. Off by default in Spark because footer-merging
    costs a pass over file metadata; turn it on per-read where drift is
    expected, or pin the canonical schema with `.schema(...)` once the
    table is contracted."""
    return spark.read.option("mergeSchema", True).parquet(path)


def read_json_permissive(
    spark: SparkSession, path: str, schema, corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """Corrupt-tolerant JSON scan: malformed rows land whole in
    `corrupt_col` instead of failing the job (PERMISSIVE mode) — route
    them to a quarantine sink and keep the pipeline up. FAILFAST is the
    right mode only once a feed is contracted. The schema must carry
    the corrupt column as a string field."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 8,
    predicate: str | None = None,
    **options: str,
):
    """Parallel JDBC read with pushdown (reference A12's federated
    `EXTRACT(YEAR ...)` filter + LIMIT/OFFSET pagination collapses into
    partitionColumn ranges; Catalyst pushes `predicate` into the remote
    WHERE clause).

    Returns the configured reader's DataFrame; requires a JDBC driver
    jar on the classpath (none in this environment — exercised via unit
    tests only up to .load())."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if predicate:
        df = df.filter(predicate)
    return df


def read_xml(
    spark: SparkSession, path: str, row_tag: str, schema=None
) -> DataFrame:
    """XML scan via the Spark 4 NATIVE xml source (the spark-xml
    package folded into core): one row per `row_tag` element, nested
    elements become struct/array columns, attributes read as
    `_attrname` fields. Distributed like any file source — the rowTag
    splitter runs per file partition, so a directory of XML feeds
    scales with the cluster, not the driver.

    Reference parity: the reference's ingestion entry point parses an
    S3 bucket-listing XML document driver-side with BeautifulSoup
    (reference citibike_project/etl/ingest_data.py:59-76,
    `xml.find_all("key")`); `list_bucket_keys` (above) covers that
    exact listing contract with stdlib ElementTree, while this reader
    is the DISTRIBUTED path for XML *data* feeds — the piece the
    reference would have needed the moment the listed files were
    themselves XML. Pass an explicit `schema` in production; inference
    costs a pass."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module is on the classpath.
    Avro is an EXTERNAL data source module (unlike ORC/parquet/xml):
    the sandbox bundles only the core avro-* serialization jars, not
    org.apache.spark:spark-avro — provably unobtainable offline
    (COVERAGE.md 'Unobtainable dependencies'), so the Avro read/write
    paths are jar-guarded exactly like ingest/lakehouse.py's Iceberg
    surface: detection here, a skipping test in
    tests/test_ingest.py, and the same code runs unchanged on a
    deploy image that ships the module. The probe asks Spark's own
    DataSource registry (a bare Class.forName false-positives here:
    the bundled avro-* SERIALIZATION jars resolve some avro classes
    while the data source itself is absent)."""
    ds = spark._jvm.org.apache.spark.sql.execution.datasources.DataSource
    conf = spark._jvm.org.apache.spark.sql.internal.SQLConf.get()
    # Self-validate the probe mechanism first (ADVICE r9): if the py4j
    # static-forwarder path itself is broken on some future Spark,
    # looking up a source that ALWAYS exists must not fail — otherwise
    # a probe bug would silently disable the whole Avro surface on a
    # deploy image that ships spark-avro. Any exception here propagates.
    ds.lookupDataSource("parquet", conf)
    try:
        ds.lookupDataSource("avro", conf)
        return True
    except Exception as exc:
        # only the registry's module-absent failure maps to False; the
        # message is stable across Spark 3/4 ("Failed to find [the]
        # data source: avro" / AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE)
        msg = str(exc)
        if "avro" in msg.lower() and (
            "Failed to find" in msg or "AVRO" in msg
        ):
            return False
        raise


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (jar-guarded; see avro_available). Row-oriented
    interchange format of Kafka/schema-registry pipelines — the
    classic landing format an LLM-data ingest edge consumes before
    columnarizing to parquet."""
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink (jar-guarded; see avro_available)."""
    df.write.format("avro").mode(mode).save(path)
