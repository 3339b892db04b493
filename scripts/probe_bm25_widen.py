"""Interleaved A/B at sf1/sf0.1: sim_bm25_topk / sim_hybrid_rrf with
the BM25 documents scan widened (widen_if_narrow default 2 MB gate —
no-op at sf0.1 and on real split-able corpora) vs stock (2-wide
tokenize on the single-row-group parquet).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_bm25_widen.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_projects_spark.catalog import widen_if_narrow  # noqa: E402
from data_engineering_zoomcamp_projects_spark.llm import similarity  # noqa: E402
from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402

_ORIG = similarity.load_table


def _widened(spark, sf_dir, table):
    df = _ORIG(spark, sf_dir, table)
    if table == "documents":
        df = widen_if_narrow(spark, df)
    return df


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    names = sys.argv[1:] or ["sim_bm25_topk", "sim_hybrid_rrf"]
    spark = get_spark(app_name="probe_bm25_widen")
    qs = all_queries()
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        res: dict[str, list[float]] = {"stock": [], "widened": []}
        for _ in range(rounds):
            for variant in ("stock", "widened"):
                similarity.load_table = _widened if variant == "widened" else _ORIG
                try:
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res[variant].append(time.perf_counter() - t0)
                finally:
                    similarity.load_table = _ORIG
        for variant, ts in res.items():
            print(f"{name:16} {variant:8}: " + " ".join(f"{t:6.2f}" for t in ts))


if __name__ == "__main__":
    main()
