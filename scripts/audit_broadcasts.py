"""Registry-wide runtime broadcast audit (guide §3.1/§5): run each
named query (default: the bench HEADLINE) once warm at
$SPARK_GRAFT_SF_DIR and flag every BroadcastExchange whose built
relation is large — row count above the threshold or slow to
collect/broadcast. An aggregate-above-explode side whose size estimate
predates the explode can slip a corpus-grain relation under
autoBroadcastJoinThreshold (the r17 symspell / r18 lm_perplexity bug
class); plan dumps cannot catch it because the strategy looks
legitimate, so this audit reads the RUNTIME row counts off the UI REST
API.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/audit_broadcasts.py [names...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402

ROW_LIMIT = 100_000
MS_LIMIT = 300


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    names = sys.argv[1:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4092")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.retainedExecutions", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = (
        f"http://localhost:{spark.sparkContext.uiWebUrl.split(':')[-1]}"
        f"/api/v1/applications/{app_id}"
    )
    qs = all_queries()
    flagged = 0
    for name in names:
        if name not in qs:
            continue
        with urllib.request.urlopen(
            base + "/sql?length=100000&planDescription=false"
        ) as r:
            before = json.load(r)
        start_id = max((s["id"] for s in before), default=-1)
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # keep auditing the rest
            print(f"{name}: ERROR {exc}")
            continue
        with urllib.request.urlopen(
            base + "/sql?details=true&planDescription=false&length=100000"
        ) as r:
            sqls = json.load(r)
        hits = []
        for s in sqls:
            if s["id"] <= start_id:
                continue
            for node in s.get("nodes", []):
                if "BroadcastExchange" not in node["nodeName"]:
                    continue
                mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
                rows = int(
                    (mets.get("number of output rows") or "0").replace(",", "")
                )
                coll = mets.get("time to collect", "0 ms")
                ms = float(coll.replace(" ms", "").replace(",", "")) if "ms" in coll else 0.0
                if rows > ROW_LIMIT or ms > MS_LIMIT:
                    hits.append((rows, ms, node["nodeId"], s["id"]))
        if hits:
            flagged += 1
            for rows, ms, nid, sid in hits:
                print(
                    f"{name}: FLAG sql={sid} node={nid} rows={rows:,} collect={ms:.0f}ms"
                )
        else:
            print(f"{name}: ok")
    print(f"\n{flagged} queries flagged")


if __name__ == "__main__":
    main()
