"""Interleaved A/B: sim_hybrid_rrf stock (60x60 FULL OUTER join of the
two candidate lists -> SortMergeJoin, 2 exchanges + sorts) vs variant B
(union + groupBy(doc_id) with max-aggregation — algebraically identical
for lists whose doc_ids are unique within each list, which row_number
heads guarantee; absent-side ranks stay NULL through max exactly as
through the outer join).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_rrf_fuse.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_engineering_zoomcamp_projects_spark.catalog import (  # noqa: E402
    load_table,
    widen_if_narrow,
)
from data_engineering_zoomcamp_projects_spark.llm.similarity import (  # noqa: E402
    RRF_K,
    RRF_LIST_N,
    RRF_TOP_N,
    _bm25_per_doc,
    _semantic_top_list,
    as_double_array,
    sim_hybrid_rrf,
)
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def rrf_fused_union(spark, sf_dir):
    lex = (
        _bm25_per_doc(spark, sf_dir)
        .orderBy(F.col("score_u").desc(), F.col("doc_id").asc())
        .limit(RRF_LIST_N)
    )
    w_lex = Window.orderBy(F.col("score_u").desc(), F.col("doc_id").asc())
    lex_ranked = lex.select("doc_id", F.row_number().over(w_lex).alias("r_lex"))

    e = widen_if_narrow(spark, load_table(spark, sf_dir, "embeddings"))
    corpus = e.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    sem_ranked = _semantic_top_list(corpus).select(
        F.col("vec_id").alias("doc_id"), "r_sem"
    )

    def rrf_u(rank_col):
        return F.when(rank_col.isNull(), F.lit(0).cast("long")).otherwise(
            F.floor(
                F.round(
                    F.lit(1.0) / (F.lit(float(RRF_K)) + rank_col.cast("double")), 6
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )

    unioned = lex_ranked.select(
        "doc_id", F.col("r_lex"), F.lit(None).cast("int").alias("r_sem")
    ).unionByName(
        sem_ranked.select(
            "doc_id", F.lit(None).cast("int").alias("r_lex"), F.col("r_sem")
        )
    )
    fused = (
        unioned.groupBy("doc_id")
        .agg(F.max("r_lex").alias("r_lex"), F.max("r_sem").alias("r_sem"))
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            (rrf_u(F.col("r_lex")) + rrf_u(F.col("r_sem"))).alias("rrf_u"),
        )
        .orderBy(F.col("rrf_u").desc(), F.col("doc_id").asc())
        .limit(RRF_TOP_N)
    )
    w_f = Window.orderBy(F.col("rrf_u").desc(), F.col("doc_id").asc())
    return fused.select(
        F.row_number().over(w_f).alias("fused_rank"),
        "doc_id",
        F.coalesce(F.col("r_lex"), F.lit(0)).cast("long").alias("r_lex"),
        F.coalesce(F.col("r_sem"), F.lit(0)).cast("long").alias("r_sem"),
        F.round(
            (F.col("rrf_u").cast("double") / F.lit(1e6)).cast("decimal(38,10)"), 6
        )
        .cast("double")
        .alias("rrf_score"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    spark = get_spark(app_name="probe_rrf_fuse")
    sc = spark.sparkContext
    variants = {
        "stock": lambda: sim_hybrid_rrf(spark, sf_dir),
        "union": lambda: rrf_fused_union(spark, sf_dir),
    }
    a = sorted(map(tuple, variants["stock"]().collect()))
    b = sorted(map(tuple, variants["union"]().collect()))
    print("rows equal:", a == b, len(a))
    variants["stock"]().write.format("noop").mode("overwrite").save()
    res = {k: [] for k in variants}
    jobs = {k: -1 for k in variants}
    for i in range(rounds):
        for k, fn in variants.items():
            g = f"rrf_{k}_{i}"
            sc.setJobGroup(g, k)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            res[k].append(time.perf_counter() - t0)
            jobs[k] = len(sc.statusTracker().getJobIdsForGroup(g))
            sc.setJobGroup("", "")
    for k, ts in res.items():
        print(f"{k:6} jobs={jobs[k]:3}: " + " ".join(f"{t:6.2f}" for t in ts))


if __name__ == "__main__":
    main()
