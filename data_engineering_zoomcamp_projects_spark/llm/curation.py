"""End-to-end corpus curation — the composite LLM data-prep pipeline
(quality filter -> exact dedup -> near-dup removal -> token budget),
expressed as ONE declarative plan so Catalyst fuses the stages.

This is the flow a 100 TB pretraining-data pipeline actually runs; each
stage reuses the operators proven individually (text_quality_scores,
dedup_exact, and the minhash-LSH near-dup path — pair-identical to the
exact shingle join the oracle keeps, see minhash_lsh_pairs). Near-dup
removal keeps the lower doc_id of each >=0.8-Jaccard pair
(deterministic survivor rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import sql_shingle_cte
from .dedup import JACCARD_THRESHOLD, minhash_lsh_pairs


def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the per-language census of the curated corpus:
    documents surviving (1) quality gate (>= 20 tokens), (2) exact
    dedup (min doc_id per identical text), (3) near-dup removal
    (drop the higher id of each Jaccard>=0.8 pair)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    quality = d.filter(F.size(toks) >= 20)

    exact_keep = quality.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    survivors = quality.join(exact_keep, ["text", "doc_id"], "left_semi")

    # near-dup pairs among survivors via the banded-LSH scale path —
    # linear in candidates, not quadratic in shingle-bucket sizes. The
    # oracle keeps the exact shingle self-join; the two pair sets are
    # identical at these parameters (minhash_lsh_pairs docstring, and
    # the subset argument there: survivor signatures don't depend on
    # the dropped docs)
    pairs = minhash_lsh_pairs(survivors.select("doc_id", "text"))
    drop_ids = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    curated = survivors.join(drop_ids, "doc_id", "left_anti")

    return (
        curated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
            F.sum(F.ceil(F.length("text") / 4.0).cast("long")).alias("est_bpe_tokens"),
        )
        .orderBy("lang")
    )


PIPELINE_CURATION_SQL = f"""
WITH quality AS (
  SELECT * FROM documents WHERE len(split(text, ' ')) >= 20
), exact_keep AS (
  SELECT text, MIN(doc_id) AS doc_id FROM quality GROUP BY text
), survivors AS (
  SELECT q.* FROM quality q
  WHERE EXISTS (SELECT 1 FROM exact_keep k
                WHERE k.text = q.text AND k.doc_id = q.doc_id)
), {sql_shingle_cte(5, "survivors").lstrip()},
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  -- joins on the shingle STRING; Spark joins on its 64-bit hash —
  -- counts agree because the hash is injective on this corpus
  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), drops AS (
  SELECT DISTINCT db AS doc_id FROM pairs
  JOIN cnt ca ON ca.doc_id = pairs.da
  JOIN cnt cb ON cb.doc_id = pairs.db
  WHERE CAST(common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - common AS DOUBLE)
        >= {JACCARD_THRESHOLD}
), curated AS (
  SELECT * FROM survivors WHERE doc_id NOT IN (SELECT doc_id FROM drops)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(CEIL(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS est_bpe_tokens
FROM curated GROUP BY lang ORDER BY lang
"""


QUERIES = {"pipeline_corpus_curation": pipeline_corpus_curation}
ORACLES = {"pipeline_corpus_curation": PIPELINE_CURATION_SQL}


def pipeline_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al., "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data"): language-
    identify each document, score it with the corpus bigram LM, and
    split every language's documents into perplexity terciles —
    'head' (lowest perplexity = cleanest), 'middle', 'tail'. CCNet
    trains on head+middle and drops or down-weights tail; the bucket
    column here is that decision surface.

    Composition of two proven operators plus a scale-safe tercile:
      1. `text_langid_profile` assigns predicted_lang (broadcast
         profile join + per-doc argmax window);
      2. `text_lm_perplexity` yields the exact micro-nat-quantized
         cross-entropy (cross-engine identical, which is what makes a
         RANK over it oracle-checkable at all);
      3. the per-language tercile uses operators/distrank.ranked +
         ntile_from_rank — NOT a window partitioned by language: a
         handful of languages would funnel the corpus through |langs|
         tasks; the range-shard + broadcast-prefix form keeps every
         task at ~|rows|/shards at any scale (the oracle states the
         equivalent plain NTILE(3), bit-identical by the ntile size
         rule since (cross_entropy, doc_id) is a total order).

    100 TB design: stages 1-2 are the certified plans (vocab-sized
    model state, corpus shuffled on narrow keys); stage 3 adds one
    range-shard exchange + a metadata-sized broadcast. Reference
    parity: none (the reference has no text-quality surface) —
    driver-contract Part C, the composite tying the quality family
    together."""
    from ..operators.distrank import ntile_from_rank, ranked
    from .textstats import text_langid_profile, text_lm_perplexity

    lang = text_langid_profile(spark, sf_dir).select("doc_id", "predicted_lang")
    # project before the tercile: ranked() range-shards and
    # localCheckpoints its input, so unused columns (n_bigrams) would
    # ride the exchange and the checkpoint storage for nothing
    ppl = text_lm_perplexity(spark, sf_dir).select(
        "doc_id", "cross_entropy", "perplexity"
    )
    j = lang.join(ppl, "doc_id")
    r = ranked(
        j,
        ["predicted_lang"],
        [F.col("cross_entropy").asc(), F.col("doc_id").asc()],
        out="_rn",
        out_total="_n",
    )
    bucket_no = ntile_from_rank(F.col("_rn"), F.col("_n"), 3)
    return r.select(
        "doc_id",
        "predicted_lang",
        "perplexity",
        F.when(bucket_no == 1, F.lit("head"))
        .when(bucket_no == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _ccnet_sql() -> str:
    from .textstats import _langid_chain_sql, _lm_ppl_chain_sql

    return f"""
WITH {_langid_chain_sql()},
{_lm_ppl_chain_sql()},
j AS (
  SELECT l.doc_id, l.predicted_lang, p.cross_entropy, p.perplexity
  FROM langid l JOIN ppl p ON l.doc_id = p.doc_id
)
SELECT doc_id, predicted_lang, perplexity,
  CASE NTILE(3) OVER (PARTITION BY predicted_lang
                      ORDER BY cross_entropy ASC, doc_id ASC)
    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
  END AS bucket
FROM j
"""


QUERIES["pipeline_ccnet_buckets"] = pipeline_ccnet_buckets
ORACLES["pipeline_ccnet_buckets"] = _ccnet_sql()


#: per-source cap: keep at most this many documents per source/domain
DOMAIN_CAP = 8


def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the RefinedWeb / C4 recipe: bound any
    single domain's share of the corpus so boilerplate-heavy hosts
    can't dominate pretraining data): within each source keep the top
    DOMAIN_CAP documents by size (n_chars DESC, doc_id ASC tie-break)
    and return them with their in-source rank.

    Scale design: rank<=N over Window.partitionBy(source) compiles to
    a PARTIAL WindowGroupLimit below the exchange (Spark 3.5+), so
    each map task forwards at most N rows per source it sees — the
    shuffle carries O(N x |sources| x tasks) rows, never a full
    domain's documents, and domain skew (one host = 10% of the crawl)
    is absorbed map-side. The whitelisted low-card window is therefore
    bounded by the cap, not by corpus size (see
    tests/test_plans.py::test_registry_wide_plan_hygiene justification).
    Reference parity: none — driver-contract Part C curation family."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("source", "rk", "doc_id", "lang", "n_chars")
    )


DOMAIN_CAP_SQL = f"""
SELECT source, rk, doc_id, lang, n_chars FROM (
  SELECT source, doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
) WHERE rk <= {DOMAIN_CAP}
"""


QUERIES["curation_domain_cap"] = curation_domain_cap
ORACLES["curation_domain_cap"] = DOMAIN_CAP_SQL
