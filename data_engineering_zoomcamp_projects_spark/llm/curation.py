"""End-to-end corpus curation — the composite LLM data-prep pipeline
(quality filter -> exact dedup -> near-dup removal -> token budget),
expressed as ONE declarative plan so Catalyst fuses the stages.

This is the flow a 100 TB pretraining-data pipeline actually runs; each
stage reuses the operators proven individually (text_quality_scores,
dedup_exact, dedup_shingle_jaccard). Near-dup removal keeps the lower
doc_id of each >=0.8-Jaccard pair (deterministic survivor rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import shingles, sql_shingle_cte
from .dedup import JACCARD_THRESHOLD


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

    # near-dup pairs among survivors (hashed 5-gram shingles)
    sh = survivors.select(
        "doc_id",
        F.explode(F.transform(shingles(F.col("text")), lambda s: F.xxhash64(s))).alias("s"),
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("common"))
        .join(cnt.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
        .join(cnt.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
        .filter(
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double")
            >= JACCARD_THRESHOLD
        )
    )
    drop_ids = pairs.select(F.col("db").alias("doc_id")).distinct()
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
