"""Additional operator coverage: collection aggregates, percentiles,
unpivot, positional explode, sampling (SURVEY.md §2 C-relational tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import dsum, sql_dsum


def agg_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates with deterministic rendering: sorted
    collect_set / sorted collect_list as joined strings (array order is
    nondeterministic in a distributed agg, so canonicalize by sorting)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "|").alias(
                "priorities"
            ),
            F.size(F.collect_list("o_orderkey")).alias("n_collected"),
        )
        .orderBy("o_orderstatus")
    )


AGG_COLLECT_SQL = """
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
       CAST(COUNT(o_orderkey) AS INT) AS n_collected
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median & quartiles) per group.
    Spark `percentile` and DuckDB `quantile_cont` share the linear
    interpolation definition; results rounded to absorb last-ulp
    differences. The approx variant (percentile_approx) is the 100 TB
    path — single-pass sketch, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25"),
            F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median"),
            F.round(F.percentile("l_extendedprice", 0.75), 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


AGG_PERCENTILES_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentile (the scalable path). Rows-only: sketch
    internals are engine-specific."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median")
        )
        .orderBy("l_returnflag")
    )


def unpivot_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack): wide per-status quantity columns back to long
    form — the inverse of agg_pivot_status."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity"), "q"))
        .select(
            "l_returnflag",
            F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_open"),
            F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_finished"),
        )
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'open', qty_open, 'finished', qty_finished) AS (status_kind, qty)",
    )


UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT l_returnflag,
         {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_open')},
         {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_finished')}
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'open' AS status_kind, COALESCE(qty_open, 0) AS qty FROM wide
UNION ALL
SELECT l_returnflag, 'finished' AS status_kind, COALESCE(qty_finished, 0) AS qty FROM wide
"""


def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (doc, position, token) for the first 5 tokens
    — order-preserving lateral view."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "token"),
    )


POSEXPLODE_SQL = """
SELECT doc_id, i - 1 AS pos, ts[i] AS token
FROM (SELECT doc_id, split(text, ' ')[1:5] AS ts FROM documents),
     (SELECT unnest(generate_series(1, 5)) AS i) g
WHERE i <= len(ts)
"""


def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling — the standard corpus-subsetting op.
    Rows-only: the RNG stream is engine-specific (pytest pins that the
    seed makes it deterministic within Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def sample_hash_reproducible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-deterministic Bernoulli sampling: keep a row iff the
    md5-derived uniform of its KEY falls under the fraction. This is
    the sampler a 100 TB pipeline actually wants — `sample(seed)`'s RNG
    stream depends on partition layout, so a repartition or a different
    cluster silently changes the sample, while a key hash is stable
    under any partitioning, engine, and scale (and cheap: one md5 per
    row, no shuffle, fully pushdown-compatible). 10%% of lineitem keyed
    on (orderkey, linenumber); oracle computes the identical hash in
    DuckDB, so the driver certifies the sample MEMBERSHIP, not just its
    size."""
    li = load_table(spark, sf_dir, "lineitem")
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber")), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return li.filter(u % 1000 < 100).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SAMPLE_HASH_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE CAST(('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 15))
           AS BIGINT) % 1000 < 100
"""


#: per-language keep rates in permille — the language-rebalancing mix a
#: pretraining pipeline applies (downsample the dominant language,
#: keep the rest whole). Languages absent from the map keep 100%.
_STRATA_PERMILLE = {"en": 250}


def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified content-deterministic sampling: per-language keep
    rates applied via the same md5-keyed uniform as
    ``sample_hash_reproducible`` — the corpus-rebalancing op (downweight
    the dominant language) every multilingual pretraining mix needs.

    Scale: pure map-side filter — no shuffle, no per-stratum global
    sort or count (a rank-based "top N per language" would funnel each
    language through one task or need the distributed-rank machinery;
    rate-based hashing needs neither), membership stable under any
    partitioning and cluster size. The oracle computes the identical
    hash, so the driver certifies per-row MEMBERSHIP."""
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    rate_map = F.create_map(
        *[c for k, v in _STRATA_PERMILLE.items() for c in (F.lit(k), F.lit(v))]
    )
    rate = F.coalesce(F.element_at(rate_map, F.col("lang")), F.lit(1000))
    return d.filter(u % 1000 < rate).select("doc_id", "lang", "source", "n_chars")


_STRATA_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _STRATA_PERMILLE.items()
)

SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1000 < CASE lang {_STRATA_CASE} ELSE 1000 END
"""


QUERIES = {
    "agg_collect_sets": agg_collect_sets,
    "agg_percentiles": agg_percentiles,
    "agg_percentile_approx": agg_percentile_approx,
    "unpivot_quantities": unpivot_quantities,
    "posexplode_tokens": posexplode_tokens,
    "sample_fraction": sample_fraction,
    "sample_hash_reproducible": sample_hash_reproducible,
    "sample_stratified_by_lang": sample_stratified_by_lang,
}

ORACLES = {
    "agg_collect_sets": AGG_COLLECT_SQL,
    "agg_percentiles": AGG_PERCENTILES_SQL,
    # agg_percentile_approx: rows-only (sketch)
    "unpivot_quantities": UNPIVOT_SQL,
    "posexplode_tokens": POSEXPLODE_SQL,
    # sample_fraction: rows-only (engine-specific RNG); its reproducible
    # twin below is fully oracle-checked
    "sample_hash_reproducible": SAMPLE_HASH_SQL,
    "sample_stratified_by_lang": SAMPLE_STRATIFIED_SQL,
}


def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) per group, rendered as ints."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.every(F.col("o_totalprice") > 1000.0).cast("int").alias("all_over_1k"),
            F.some(F.col("o_orderpriority") == "1-URGENT").cast("int").alias("any_urgent"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


AGG_BOOLEAN_SQL = """
SELECT o_orderstatus,
       CAST(bool_and(o_totalprice > 1000.0) AS INT) AS all_over_1k,
       CAST(bool_or(o_orderpriority = '1-URGENT') AS INT) AS any_urgent,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

QUERIES["agg_boolean"] = agg_boolean
ORACLES["agg_boolean"] = AGG_BOOLEAN_SQL
