"""Interleaved A/B at sf1: text_langid_profile / pipeline_ccnet_buckets
with the langid documents scan widened (the _docs_wide gate) vs stock
(unwidened — 1-wide corpus explode on a single-row-group parquet).

Patches textstats.load_table to apply widen_if_narrow to the documents
table; alternates variants within one warm session.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_langid_widen.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_projects_spark.catalog import widen_if_narrow  # noqa: E402
from data_engineering_zoomcamp_projects_spark.llm import textstats  # noqa: E402
from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402

_ORIG = textstats.load_table


def _widened(spark, sf_dir, table):
    df = _ORIG(spark, sf_dir, table)
    if table == "documents":
        df = widen_if_narrow(spark, df)
    return df


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    names = sys.argv[1:] or ["text_langid_profile", "pipeline_ccnet_buckets"]
    spark = get_spark(app_name="probe_langid_widen")
    qs = all_queries()
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        res: dict[str, list[float]] = {"stock": [], "widened": []}
        for _ in range(rounds):
            for variant in ("stock", "widened"):
                textstats.load_table = _widened if variant == "widened" else _ORIG
                try:
                    t0 = time.perf_counter()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res[variant].append(time.perf_counter() - t0)
                finally:
                    textstats.load_table = _ORIG
        for variant, ts in res.items():
            print(
                f"{name:30} {variant:8}: "
                + " ".join(f"{t:6.2f}" for t in ts)
            )


if __name__ == "__main__":
    main()
