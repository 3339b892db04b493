"""Dump per-job stage structure for named queries (guide §1/§7).

For each named registry query: run it once warm, then re-run inside a
job group and print every Spark job that ran — its stage names and task
counts — so fixed per-call machinery (broadcast builds, AQE stage jobs,
checkpoint passes) is attributable line by line.

Usage:
  python scripts/dump_jobs.py sim_index_query [more names...]
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python scripts/dump_jobs.py ...
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
    names = sys.argv[1:]
    queries = all_queries()
    spark = get_spark(app_name="dump_jobs")
    sc = spark.sparkContext
    for name in names:
        fn = queries[name]
        # warm pass: codegen/broadcast caches, model memos
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        group = f"dump_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        jids = sorted(tracker.getJobIdsForGroup(group))
        print(f"\n=== {name}: {len(jids)} jobs, {wall:.2f}s warm ===")
        for jid in jids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                print(f"  job {jid}: <expired>")
                continue
            parts = []
            for sid in sorted(ji.stageIds):
                si = tracker.getStageInfo(sid)
                if si is None:
                    parts.append(f"s{sid}:?")
                else:
                    parts.append(f"{si.name.split(' at ')[0]}[{si.numTasks}]")
            print(f"  job {jid}: " + " | ".join(parts))


if __name__ == "__main__":
    main()
