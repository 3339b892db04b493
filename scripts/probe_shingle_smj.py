"""Interleaved A/B: dedup_shingle_jaccard stock (planner auto-broadcasts
one side of the shingle self-join — 2.5M rows at sf1, an
explode-broken estimate that never self-corrects at any scale) vs the
self-join pinned to sort-merge (the r17 symspell treatment).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_shingle_smj.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_zoomcamp_projects_spark.llm.dedup import (  # noqa: E402
    JACCARD_THRESHOLD,
    _docs_wide,
    dedup_shingle_jaccard,
)
from data_engineering_zoomcamp_projects_spark.functions.text import shingles  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def shingle_jaccard_smj(spark, sf_dir):
    d = _docs_wide(spark, sf_dir)
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(shingles(F.col("text")), lambda s: F.xxhash64(s))
        ).alias("s"),
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b").hint("merge")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    pairs = (
        common.join(
            cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"),
            "doc_a",
        )
        .join(
            cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
    )
    return pairs.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a",
        "doc_b",
        F.round(F.col("jaccard").cast("decimal(38,10)"), 6)
        .cast("double")
        .alias("jaccard"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    spark = get_spark(app_name="probe_shingle_smj")
    sc = spark.sparkContext
    variants = {
        "stock": lambda: dedup_shingle_jaccard(spark, sf_dir),
        "smj": lambda: shingle_jaccard_smj(spark, sf_dir),
    }
    a = sorted(map(tuple, variants["stock"]().collect()))
    b = sorted(map(tuple, variants["smj"]().collect()))
    print("rows equal:", a == b, len(a))
    variants["stock"]().write.format("noop").mode("overwrite").save()
    res = {k: [] for k in variants}
    for i in range(rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            res[k].append(time.perf_counter() - t0)
    for k, ts in res.items():
        print(f"{k:6}: " + " ".join(f"{t:6.2f}" for t in ts))


if __name__ == "__main__":
    main()
