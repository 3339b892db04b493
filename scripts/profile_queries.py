"""Per-query profiler for optimization work (guide §1).

Runs named queries (or the full bench HEADLINE) N times each in ONE
warm session with the noop sink, and reports per-run wall seconds plus
the number of Spark jobs each run launched (actions/collect/checkpoint
passes show up here — at sf0.1 the job count, not bytes, dominates).

Usage:
  python scripts/profile_queries.py q1_pricing_summary mart_daily_revenue
  SPARK_GRAFT_PROFILE_ITERS=5 python scripts/profile_queries.py ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_PROFILE_ITERS", "5"))
    names = sys.argv[1:]
    queries = all_queries()
    if not names:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in queries]
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    # warmup
    queries[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"{'query':42} {'jobs':>5} " + " ".join(f"{('t%d' % i):>7}" for i in range(iters)))
    for name in names:
        times = []
        jobs = -1
        for i in range(iters):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup("", "")
        print(f"{name:42} {jobs:>5} " + " ".join(f"{t:7.2f}" for t in times))


if __name__ == "__main__":
    main()
