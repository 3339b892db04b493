"""Scalar-function breadth (SURVEY.md §2 C-scalar): string, date/time,
math, conditional, array/higher-order, and JSON functions.

Everything is built-in `pyspark.sql.functions` — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on these paths. The only
engine-visible subtleties are cross-engine canonicalization choices
(documented inline): booleans cast to int (pandas bool vs numpy bool
hashing), day-of-week aligned to ISO, timestamps rendered as strings.

The reference's only scalar usage was EXTRACT(YEAR ...) in its
federated SQL (reference citibike_project/etl/ingest_data.py:268) and
pandas timestamp parsing (ingest_data.py:162); this module provides the
full surface the oracle-parity gate needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .parity import date_str, sql_dsum


def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/substring/concat/split/regexp/replace/trim/
    lpad/reverse/contains over customer names."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lower_name"),
        F.upper("c_mktsegment").alias("upper_seg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.element_at(F.split("c_name", "#"), -1).alias("name_num"),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"\d", "x").alias("masked"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        # boolean -> int: pandas hashes numpy.bool_ differently from bool
        F.col("c_name").contains("1").cast("int").alias("has_one"),
        F.startswith(F.col("c_mktsegment"), F.lit("A")).cast("int").alias("seg_a"),
    )


FN_STRING_SQL = """
SELECT c_custkey,
  lower(c_name) AS lower_name,
  upper(c_mktsegment) AS upper_seg,
  length(c_name) AS name_len,
  substring(c_name, 1, 8) AS name_prefix,
  concat_ws('|', c_name, c_mktsegment) AS joined,
  split_part(c_name, '#', -1) AS name_num,
  regexp_extract(c_name, '(\\d+)', 1) AS digits,
  regexp_replace(c_name, '\\d', 'x', 'g') AS masked,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
  reverse(c_mktsegment) AS rev_seg,
  CAST(contains(c_name, '1') AS INT) AS has_one,
  CAST(starts_with(c_mktsegment, 'A') AS INT) AS seg_a
FROM customer
"""


def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/quarter/month/day/iso-weekday/date_trunc/date_add/datediff/
    last_day/unix epoch over order dates.

    Cross-engine alignment: Spark `weekday` is 0=Monday, DuckDB isodow
    is 1=Monday — the oracle subtracts 1; everything else matches
    directly."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekday("o_orderdate").alias("iso_wd"),
        date_str(F.date_trunc("month", "o_orderdate"), "month_start"),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_epoch_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_sec"),
    )


FN_DATE_SQL = """
SELECT o_orderkey,
  year(o_orderdate) AS yr,
  quarter(o_orderdate) AS qtr,
  month(o_orderdate) AS mon,
  day(o_orderdate) AS dom,
  dayofyear(o_orderdate) AS doy,
  isodow(o_orderdate) - 1 AS iso_wd,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
  strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
FROM orders
"""


def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/pow/sqrt/ln/log10/exp/mod/sign/greatest/least.

    Transcendentals are rounded to 6 dp: libm implementations agree to
    well below that. Polynomial ops (abs/floor/pow2) are IEEE-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round((F.col("l_extendedprice") * F.col("l_tax")).cast("decimal(38,10)"), 3)
        .cast("double")
        .alias("tax_amount"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("disc_pct_floor"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
        F.greatest("l_quantity", "l_extendedprice").alias("biggest"),
        F.least("l_discount", "l_tax").alias("smallest"),
    )


FN_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
  CAST(ROUND(CAST(l_extendedprice * l_tax AS DECIMAL(38,10)), 3) AS DOUBLE) AS tax_amount,
  ABS(l_quantity - 25.0) AS qty_dev,
  CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct_floor,
  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
  POW(l_quantity, 2) AS qty_sq,
  ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
  ROUND(LN(l_extendedprice), 6) AS price_ln,
  ROUND(LOG10(l_extendedprice), 6) AS price_log10,
  ROUND(EXP(l_discount), 6) AS disc_exp,
  l_orderkey % 7 AS key_mod7,
  CAST(SIGN(l_quantity - 25.0) AS INT) AS qty_sign,
  GREATEST(l_quantity, l_extendedprice) AS biggest,
  LEAST(l_discount, l_tax) AS smallest
FROM lineitem
"""


def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiers, coalesce, nullif, conditional flags."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("is_priority"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
    )


FN_CONDITIONAL_SQL = """
SELECT o_orderkey,
  CASE WHEN o_totalprice > 200000 THEN 'large'
       WHEN o_totalprice > 100000 THEN 'medium'
       ELSE 'small' END AS size_tier,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_priority,
  NULLIF(o_orderstatus, 'P') AS status_or_null
FROM orders
"""


def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions over tokenized document text:
    size/element_at/slice/sort/distinct/contains/transform/filter/
    aggregate — all native (no UDFs)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_join(F.slice(toks, 1, 3), "_").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(toks)), " ").alias("vocab"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "spark").cast("int").alias("mentions_spark"),
        F.array_join(
            F.transform(F.slice(toks, 1, 2), lambda x: F.upper(x)), " "
        ).alias("first2_upper"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


FN_ARRAY_SQL = """
SELECT doc_id,
  len(split(text, ' ')) AS n_tokens,
  split(text, ' ')[1] AS first_token,
  split(text, ' ')[-1] AS last_token,
  array_to_string(split(text, ' ')[1:3], '_') AS first3,
  array_to_string(list_sort(list_distinct(split(text, ' '))), ' ') AS vocab,
  len(list_distinct(split(text, ' '))) AS n_distinct,
  CAST(list_contains(split(text, ' '), 'spark') AS INT) AS mentions_spark,
  array_to_string(list_transform(split(text, ' ')[1:2], x -> upper(x)), ' ') AS first2_upper,
  len(list_filter(split(text, ' '), x -> length(x) > 4)) AS n_long_tokens,
  CAST(list_sum(list_transform(split(text, ' '), x -> length(x))) AS INT) AS total_chars
FROM documents
"""


def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral unnest) + re-aggregate: corpus token frequencies."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


FN_EXPLODE_SQL = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + typed parse over events.props
    (`{"k": <int>}`): get_json_object, from_json to a typed map,
    map_keys. The oracle uses DuckDB's JSON functions."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.array_join(F.sort_array(F.map_keys(parsed)), ",").alias("prop_keys"),
        F.coalesce(F.element_at(parsed, "k"), F.lit(-1)).alias("k_typed"),
    )


FN_JSON_SQL = """
SELECT event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
  array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
  COALESCE(CAST(json_extract_string(props, '$.k') AS INT), -1) AS k_typed
FROM events
"""


def fn_variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT over events.props: parse_json to the binary
    semi-structured type, typed path extraction with variant_get, and
    missing-path NULL semantics — the open-schema ingestion pattern
    (land raw JSON as VARIANT, extract lazily, no upfront schema). The
    variant value itself never crosses the comparator (its binary
    encoding is engine-specific); the EXTRACTED values do, and DuckDB's
    JSON functions produce the identical ones."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_type",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
            F.expr("variant_get(parse_json(props), '$.missing', 'int')").alias(
                "miss"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("miss").alias("n_missing_path"),
        )
        .orderBy("event_type")
    )


FN_VARIANT_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       COUNT(CAST(json_extract_string(props, '$.missing') AS INT)) AS n_missing_path
FROM events GROUP BY event_type ORDER BY event_type
"""


def fn_sql_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined scalar functions (CREATE TEMPORARY FUNCTION
    ... RETURN <expr>): the engine-extension surface that needs NO
    Python runtime — the body inlines into Catalyst, stays inside
    whole-stage codegen, and composes (taxed_price calls disc_price).
    The oracle inlines the same expressions (the UDF is Spark-side
    registration surface; values are what cross the comparator)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed_price(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN disc_price(p, d) * (1.0 + t)"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag,
               {sql_dsum('disc_price(l_extendedprice, l_discount)', 'revenue')},
               {sql_dsum('taxed_price(l_extendedprice, l_discount, l_tax)',
                         'taxed_revenue')}
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


FN_SQL_UDF_SQL = f"""
SELECT l_returnflag,
       {sql_dsum('l_extendedprice * (1.0 - l_discount)', 'revenue')},
       {sql_dsum('(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)',
                 'taxed_revenue')}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation under ANSI SQL mode (Spark 4 default):
    try_divide / try_cast / try_add return NULL where strict ANSI would
    raise (divide-by-zero, malformed cast, overflow) — the semantics a
    robust pipeline needs on dirty data. Exercised against real zero
    divisors (q14-style promo ratio per part brand-line) and a
    deliberately unparseable cast. Oracle: DuckDB's TRY_CAST + NULLIF
    guards produce the identical NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    g = j.groupBy("p_brand").agg(
        F.coalesce(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), F.col("l_quantity"))),
            F.lit(0.0),
        )
        .cast("long")
        .alias("promo_qty"),
        F.coalesce(
            F.sum(F.when(~F.col("p_type").startswith("PROMO"), F.col("l_quantity"))),
            F.lit(0.0),
        )
        .cast("long")
        .alias("base_qty"),
    )
    # NULL results surface as IS-NULL booleans: a NULL double column
    # reaches the comparator as NaN via pandas on the oracle side, and
    # a NULL bigint flips the whole pandas column to float64 — booleans
    # certify the try_* semantics without either trap
    return g.select(
        "p_brand",
        "promo_qty",
        "base_qty",
        F.try_divide(F.col("promo_qty"), F.col("base_qty") - F.col("base_qty"))
        .isNull()
        .alias("div_by_zero_is_null"),
        F.coalesce(
            F.round(F.try_divide(F.col("promo_qty"), F.col("base_qty")), 6),
            F.lit(-1.0),
        ).alias("promo_ratio"),
        F.col("p_brand").try_cast("int").isNull().alias("bad_cast_is_null"),
        F.try_add(F.col("promo_qty"), F.lit(9223372036854775807))
        .isNull()
        .alias("overflow_is_null"),
    ).orderBy("p_brand")


FN_TRY_SQL = """
WITH g AS (
  SELECT p_brand,
         CAST(COALESCE(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN l_quantity END), 0) AS BIGINT) AS promo_qty,
         CAST(COALESCE(SUM(CASE WHEN p_type NOT LIKE 'PROMO%' THEN l_quantity END), 0) AS BIGINT) AS base_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, promo_qty, base_qty,
       (CAST(promo_qty AS DOUBLE) / NULLIF(base_qty - base_qty, 0)) IS NULL AS div_by_zero_is_null,
       COALESCE(ROUND(CAST(promo_qty AS DOUBLE) / NULLIF(base_qty, 0), 6), -1.0) AS promo_ratio,
       TRY_CAST(p_brand AS INT) IS NULL AS bad_cast_is_null,
       promo_qty > 0 AS overflow_is_null
FROM g ORDER BY p_brand
"""


QUERIES = {
    "fn_string_suite": fn_string_suite,
    "fn_try_suite": fn_try_suite,
    "fn_variant_suite": fn_variant_suite,
    "fn_sql_udf_suite": fn_sql_udf_suite,
    "fn_date_suite": fn_date_suite,
    "fn_math_suite": fn_math_suite,
    "fn_conditional_suite": fn_conditional_suite,
    "fn_array_suite": fn_array_suite,
    "fn_explode_tokens": fn_explode_tokens,
    "fn_json_suite": fn_json_suite,
}

ORACLES = {
    "fn_try_suite": FN_TRY_SQL,
    "fn_variant_suite": FN_VARIANT_SQL,
    "fn_sql_udf_suite": FN_SQL_UDF_SQL,
    "fn_string_suite": FN_STRING_SQL,
    "fn_date_suite": FN_DATE_SQL,
    "fn_math_suite": FN_MATH_SQL,
    "fn_conditional_suite": FN_CONDITIONAL_SQL,
    "fn_array_suite": FN_ARRAY_SQL,
    "fn_explode_tokens": FN_EXPLODE_SQL,
    "fn_json_suite": FN_JSON_SQL,
}


def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator breadth over integer keys: AND/OR/XOR, bit
    count, shifts (literal shift amounts — a Spark requirement)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    p = F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(p).alias("k_and_p"),
        k.bitwiseOR(p).alias("k_or_p"),
        k.bitwiseXOR(p).alias("k_xor_p"),
        F.bit_count(k).alias("k_bits"),
        F.shiftleft(k, 2).alias("k_shl2"),
        F.shiftright(k, 1).alias("k_shr1"),
    )


FN_BITWISE_SQL = """
SELECT l_orderkey, l_linenumber,
  l_orderkey & l_partkey AS k_and_p,
  l_orderkey | l_partkey AS k_or_p,
  xor(l_orderkey, l_partkey) AS k_xor_p,
  CAST(bit_count(l_orderkey) AS INT) AS k_bits,
  l_orderkey << 2 AS k_shl2,
  l_orderkey >> 1 AS k_shr1
FROM lineitem
"""

QUERIES["fn_bitwise_suite"] = fn_bitwise_suite
ORACLES["fn_bitwise_suite"] = FN_BITWISE_SQL
