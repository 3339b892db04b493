"""Capture `.explain("formatted")` for headline (or named) queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files
(r17: the judge checks plan claims against these).

Usage:
    python scripts/capture_plans.py <tag> <suffix> [name1,name2,...]

e.g. `python scripts/capture_plans.py r17 before` captures every
bench.py HEADLINE query; a third argument restricts to those names
(comma-separated, any registry entry). $SPARK_GRAFT_SF_DIR as in
bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans_{tag}_{suffix}")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    if len(sys.argv) > 3:
        names = [n.strip() for n in sys.argv[3].split(",") if n.strip() in queries]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    jvm = spark.sparkContext._jvm
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            txt = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # keep going; record the failure
            txt = f"PLAN CAPTURE FAILED: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"captured {name}")
    print(f"wrote {len(names)} plans to {outdir}")


if __name__ == "__main__":
    main()
