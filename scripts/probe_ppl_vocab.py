"""Interleaved A/B at sf1/sf0.1: text_lm_perplexity stock (vocab via a
third corpus explode + count_distinct) vs variant B (vocab derived from
the bigram-type table: distinct(a) u distinct(b) u {only token of
1-token docs} — set-identical for every input, since a doc [t1..tn]
with n>=2 has every token in a-slots u b-slots and n==1 is the singles
scan; n==0 contributes nothing either way).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_ppl_vocab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_engineering_zoomcamp_projects_spark.llm.textstats import (  # noqa: E402
    _docs_wide,
    text_lm_perplexity,
)
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def ppl_vocab_from_model(spark, sf_dir):
    d = _docs_wide(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    t = d.select("doc_id", toks.alias("ts"))
    n_pairs = F.greatest(F.size("ts") - 1, F.lit(0))
    doc_bg = (
        t.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("ts", 1, n_pairs),
                    F.slice("ts", 2, n_pairs),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        .groupBy("doc_id", F.col("p.a").alias("a_key"), F.col("p.b").alias("b_key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    model = doc_bg.groupBy("a_key", "b_key").agg(F.sum("cnt").alias("c_ab"))
    singles = t.filter(F.size("ts") == 1).select(
        F.element_at("ts", 1).alias("tok")
    )
    vocab = (
        model.select(F.col("a_key").alias("tok"))
        .union(model.select(F.col("b_key").alias("tok")))
        .union(singles)
        .agg(F.count_distinct("tok").alias("v"))
    )
    c_a = F.sum("c_ab").over(Window.partitionBy("a_key"))
    p = (F.col("c_ab").cast("double") + F.lit(0.5)) / (
        c_a.cast("double") + F.lit(0.5) * F.col("v").cast("double")
    )
    scored = model.crossJoin(F.broadcast(vocab)).select(
        "a_key",
        "b_key",
        F.floor(F.round(-F.log(p), 6) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("lp_u"),
    )
    per_doc = (
        doc_bg.join(scored, ["a_key", "b_key"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("lp_u")).alias("total_u"),
        )
    )
    ce = (
        F.round(
            (
                F.col("total_u").cast("double")
                / (F.lit(1e6) * F.col("n_bigrams").cast("double"))
            ).cast("decimal(38,10)"),
            6,
        )
        .cast("double")
        .alias("cross_entropy")
    )
    out = per_doc.select("doc_id", "n_bigrams", ce)
    return out.select(
        "doc_id",
        "n_bigrams",
        "cross_entropy",
        F.round(F.exp("cross_entropy"), 4).alias("perplexity"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    spark = get_spark(app_name="probe_ppl_vocab")
    sc = spark.sparkContext
    variants = {
        "stock": lambda: text_lm_perplexity(spark, sf_dir),
        "model_vocab": lambda: ppl_vocab_from_model(spark, sf_dir),
    }
    # result-equality check first (collect both, compare)
    a = sorted(map(tuple, variants["stock"]().collect()))
    b = sorted(map(tuple, variants["model_vocab"]().collect()))
    print("rows equal:", a == b, len(a))
    variants["stock"]().write.format("noop").mode("overwrite").save()
    res = {k: [] for k in variants}
    jobs = {k: -1 for k in variants}
    for i in range(rounds):
        for k, fn in variants.items():
            group = f"ppl_{k}_{i}"
            sc.setJobGroup(group, k)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            res[k].append(time.perf_counter() - t0)
            jobs[k] = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
    for k, ts in res.items():
        print(f"{k:12} jobs={jobs[k]:3}: " + " ".join(f"{t:6.2f}" for t in ts))


if __name__ == "__main__":
    main()
