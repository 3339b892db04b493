"""Per-stage wall/time breakdown for named registry queries via the
Spark UI REST API (guide §7.1 — where does the time actually go).

Runs each named query once warm then once measured, and prints every
stage of the measured run with submit->complete wall, executor run
time, task count and shuffle bytes. Needs the UI enabled, so it builds
its own session instead of session.get_spark.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/stage_times.py name...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4090")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.split(':')[-1]}/api/v1/applications/{app_id}"
    qs = all_queries()
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        sc = spark.sparkContext
        group = f"st_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jids = set(sc.statusTracker().getJobIdsForGroup(group))
        with urllib.request.urlopen(base + "/jobs") as r:
            jobs = json.load(r)
        want_stages = set()
        for j in jobs:
            if j["jobId"] in jids:
                want_stages.update(j["stageIds"])
        with urllib.request.urlopen(base + "/stages?status=complete") as r:
            stages = json.load(r)
        rows = []
        for st in stages:
            if st["stageId"] not in want_stages:
                continue
            sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
            com = st.get("completionTime")
            from datetime import datetime

            def ts(s):
                return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

            dur = ts(com) - ts(sub) if sub and com else -1
            rows.append(
                (
                    dur,
                    st["stageId"],
                    st["numCompleteTasks"],
                    st["executorRunTime"] / 1000.0,
                    st["shuffleWriteBytes"],
                    st["shuffleReadBytes"],
                    st["name"].split(" at ")[0][:40],
                )
            )
        rows.sort(reverse=True)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(rows)} stages ===")
        print(f"{'wall_s':>7} {'sid':>4} {'tasks':>5} {'exec_s':>7} {'shW_MB':>7} {'shR_MB':>7} name")
        for dur, sid, nt, ex, sw, sr, nm in rows:
            print(
                f"{dur:7.2f} {sid:>4} {nt:>5} {ex:7.2f} {sw/1e6:7.1f} {sr/1e6:7.1f} {nm}"
            )


if __name__ == "__main__":
    main()
