"""Interleaved A/B (verdict r17 item 2): pipeline_ccnet_buckets stock
(langid and perplexity branches each scan the documents parquet) vs a
shared-scan variant where ONE lazily localCheckpointed (doc_id, lang,
text) frame feeds both branches.

The patch swaps textstats.load_table for a memoized checkpointed
frame per (app, sf_dir) so both branches read the same RDD.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_ccnet_shared_scan.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_projects_spark.llm import textstats  # noqa: E402
from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402

_ORIG = textstats.load_table
_SHARED: dict = {}


def _shared_docs(spark, sf_dir, table):
    df = _ORIG(spark, sf_dir, table)
    if table != "documents":
        return df
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SHARED:
        _SHARED[key] = df.localCheckpoint(eager=False)
    return _SHARED[key]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    spark = get_spark(app_name="probe_ccnet_shared")
    sc = spark.sparkContext
    q = all_queries()["pipeline_ccnet_buckets"]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    res: dict[str, list[float]] = {"stock": [], "shared": []}
    jobs: dict[str, int] = {}
    for i in range(rounds):
        for variant in ("stock", "shared"):
            _SHARED.clear()  # each run re-shares fresh (no cross-run reuse)
            textstats.load_table = _shared_docs if variant == "shared" else _ORIG
            try:
                g = f"ccnet_{variant}_{i}"
                sc.setJobGroup(g, variant)
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                res[variant].append(time.perf_counter() - t0)
                jobs[variant] = len(sc.statusTracker().getJobIdsForGroup(g))
                sc.setJobGroup("", "")
            finally:
                textstats.load_table = _ORIG
    for variant, ts in res.items():
        print(
            f"{variant:7} jobs={jobs[variant]:3}: "
            + " ".join(f"{t:6.2f}" for t in ts)
        )


if __name__ == "__main__":
    main()
