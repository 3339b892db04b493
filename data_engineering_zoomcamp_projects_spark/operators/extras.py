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


#: histogram-sketch bin width: a power of two so the double division
#: and floor are bit-identical across engines
_PCTL_BIN = 128.0


def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based approximate median per group — the scalable
    single-pass path (exact percentile needs a per-group sort; see
    agg_percentiles for that form).

    The sketch is a fixed-width HISTOGRAM: bin counts are a one-pass,
    map-side-combinable aggregate whose state is bounded by the VALUE
    DOMAIN (~820 bins over lineitem prices), not the row count, and
    the approx median is the first bin whose cumulative count crosses
    ceil(n/2), reported at the bin midpoint (error <= bin width). Every
    step — double divide by a power of two, floor, integer cumsum — is
    bit-identical across engines, so unlike `percentile_approx`'s
    KLL/GK sketch (whose compaction choices are engine-private) this
    sketch is FULLY oracle-checked: the former rows-only entry now gets
    the rows+schema+hash gate. The per-flag fold walks the <=
    domain/width histogram array, never the rows."""
    li = load_table(spark, sf_dir, "lineitem")
    bins = (
        li.groupBy(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") / _PCTL_BIN).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_flag = bins.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list(F.struct("bin", "cnt"))).alias("h"),
        F.sum("cnt").alias("n"),
    )
    k = F.floor((F.col("n") + 1) / 2)
    zero = F.struct(
        F.lit(0).cast("bigint").alias("run"),
        F.lit(None).cast("bigint").alias("found"),
    )

    def step(st, e):
        run2 = st["run"] + e["cnt"]
        return F.struct(
            run2.alias("run"),
            F.when(st["found"].isNull() & (run2 >= k), e["bin"])
            .otherwise(st["found"])
            .alias("found"),
        )

    found = F.aggregate(F.col("h"), zero, step)["found"]
    return (
        per_flag.select(
            "l_returnflag",
            (found * F.lit(_PCTL_BIN) + F.lit(_PCTL_BIN / 2)).alias("approx_median"),
        )
        .orderBy("l_returnflag")
    )


AGG_PCTL_APPROX_SQL = f"""
WITH b AS (
  SELECT l_returnflag, FLOOR(l_extendedprice / {_PCTL_BIN}) AS bin, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), t AS (
  SELECT l_returnflag, SUM(cnt) AS n FROM b GROUP BY 1
), c AS (
  SELECT l_returnflag, bin,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum
  FROM b
)
SELECT c.l_returnflag,
       CAST(MIN(bin) * {_PCTL_BIN} + {_PCTL_BIN / 2} AS DOUBLE) AS approx_median
FROM c JOIN t USING (l_returnflag)
WHERE cum >= (t.n + 1) // 2
GROUP BY 1 ORDER BY 1
"""


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


#: the seed mixed into the keyed uniform — changing it draws an
#: independent 10% sample while keeping layout invariance
_SAMPLE_SEED = 42


def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling — the standard corpus-subsetting op.

    `df.sample(fraction, seed)` is the built-in, but its RNG stream is
    keyed on the PARTITION INDEX: a repartition, a different file
    split, or another cluster silently draws a different sample. The
    engine's contract-grade form derives the uniform from (seed, row
    key) instead — the `sample_hash_reproducible` derivation with the
    seed prepended — so the same seed reproduces the same membership
    under any layout and a new seed draws an independent sample. The
    shared derivation also upgrades this former rows-only entry to the
    full oracle: DuckDB computes the identical (seed, key) hash, and
    the driver certifies per-row membership."""
    li = load_table(spark, sf_dir, "lineitem")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(_SAMPLE_SEED), F.col("l_orderkey"), F.col("l_linenumber")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return li.filter(u % 1000 < 100).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SAMPLE_FRACTION_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE CAST(('0x' || substr(md5({_SAMPLE_SEED} || '|' || l_orderkey || '|' || l_linenumber), 1, 15))
           AS BIGINT) % 1000 < 100
"""


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


def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted sampling: each document's keep probability is
    proportional to its length (w = n_chars / max_chars) — the
    length-weighted document sampling a token-budgeted corpus draw
    uses (long docs carry more tokens, so uniform-by-doc sampling
    underweights them).

    Membership is EXACT integer arithmetic end to end: the md5 uniform
    reduced mod 1e6 is compared by cross-multiplication
    (u6 * max_chars < n_chars * 1e6), so no float rate ever exists and
    the oracle replicates membership bit-for-bit. Map-side except the
    one-row broadcast corpus max; layout-invariant like every sampler
    in this family."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("max_chars"))
    u6 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1000000
    )
    return (
        d.crossJoin(F.broadcast(mx))
        .filter(u6 * F.col("max_chars") < F.col("n_chars") * 1000000)
        .select("doc_id", "lang", "n_chars", "max_chars")
    )


SAMPLE_WEIGHTED_SQL = """
WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents)
SELECT doc_id, lang, n_chars, max_chars
FROM documents, mx
WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       % 1000000) * max_chars < n_chars * 1000000
"""


QUERIES = {
    "sample_importance_weighted": sample_importance_weighted,
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
    # promoted round 6 (held out of the full round-5 window; pinned by
    # tests/test_extras.py::test_importance_weighted_matches_oracle)
    "sample_importance_weighted": SAMPLE_WEIGHTED_SQL,
    "agg_collect_sets": AGG_COLLECT_SQL,
    "agg_percentiles": AGG_PERCENTILES_SQL,
    # round-5 upgrade: deterministic histogram sketch, fully checked
    "agg_percentile_approx": AGG_PCTL_APPROX_SQL,
    "unpivot_quantities": UNPIVOT_SQL,
    "posexplode_tokens": POSEXPLODE_SQL,
    # round-5 upgrade: (seed, key)-derived uniform, fully checked
    "sample_fraction": SAMPLE_FRACTION_SQL,
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
