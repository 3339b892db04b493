"""Emit the optimization-report operator checklist for the bench
HEADLINE queries: per-query physical-plan operator counts (Exchange /
join strategies / Python-boundary nodes / Windows / pushed filters)
from the live plans — the noise-immune audit columns of
OPTIMIZATION_r{17,18}.md.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/checklist_profile.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_engineering_zoomcamp_projects_spark.plans.explain import (  # noqa: E402
    formatted_plan,
)
from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="checklist_profile")
    qs = all_queries()
    print("| query | Ex | ReuseEx | SMJ | BHJ | BNLJ | AEP | MIA | Win | pushed |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name in HEADLINE:
        if name not in qs:
            continue
        plan = formatted_plan(qs[name](spark, sf_dir))
        n = lambda pat: len(re.findall(pat, plan))  # noqa: E731
        pushed = "y" if re.search(r"PushedFilters: \[[^\]]", plan) else ""
        counts = [
            n(r"[(]\d+[)] Exchange"),
            n(r"[(]\d+[)] ReusedExchange"),
            n(r"[(]\d+[)] SortMergeJoin"),
            n(r"[(]\d+[)] BroadcastHashJoin"),
            n(r"[(]\d+[)] BroadcastNestedLoopJoin"),
            n(r"[(]\d+[)] ArrowEvalPython"),
            n(r"[(]\d+[)] (MapInPandas|MapInArrow|PythonMapInArrow)"),
            n(r"[(]\d+[)] Window"),
        ]
        cells = " | ".join(str(c) for c in counts)
        print(f"| {name} | {cells} | {pushed} |")


if __name__ == "__main__":
    main()
