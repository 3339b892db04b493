"""Full-registry scale sweep (BASELINE.md §10 protocol, made
mechanical): execute EVERY `queries()` entry once at a given sf_dir
with the noop sink (full plan execution, no driver collect) and print
one `name,seconds` line each, worst-first summary at the end.

Deliberate small-SF quadratics that guard themselves above the oracle
scale (`dedup_fuzzy_names`) surface as `guarded` rows instead of
hanging the sweep — the round-5 hand-exclusion is now mechanical.

Usage: python scripts/sweep_registry.py [SF_DIR] [ONLY,NAMES]
Defaults: SF_DIR=/root/repo/.localdata/sf1

SPARK_GRAFT_SWEEP_OUT=/root/repo/SWEEP_r9_sf1_open.csv tees every
per-query line (and the summary comments) into that file as well, so
each round's open/close sweeps leave committed artifacts — the r8
verdict's nit 1: the close-sweep numbers behind BASELINE.md §16 had
no CSV on disk. Convention: SWEEP_r{N}_sf1_{open|close}.csv.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    out_path = os.environ.get("SPARK_GRAFT_SWEEP_OUT")
    out = open(out_path, "w") if out_path else None

    def emit(line: str) -> None:
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    spark = get_spark(app_name="sweep")
    rows: list[tuple[float, str, str]] = []
    queries = all_queries()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            status = "ok"
        except ValueError as e:
            # only the deliberate quadratic-twin self-guard counts as
            # `guarded`; any other ValueError is a real error (round-6
            # verdict: the bare substring "guard" also matched unrelated
            # messages)
            quad_guard = "deliberately-quadratic" in str(e) and "-row guard" in str(e)
            status = "guarded" if quad_guard else f"err:{e}"
        except Exception as e:  # record and continue — the sweep must finish
            status = f"err:{type(e).__name__}"
        dt = time.perf_counter() - t0
        rows.append((dt, name, status))
        emit(f"{name},{dt:.2f},{status}")
    rows.sort(reverse=True)
    emit("# worst 15:")
    for dt, name, status in rows[:15]:
        emit(f"#   {name}  {dt:.1f}s  {status}")
    bad = [(n, s) for _, n, s in rows if s.startswith("err")]
    emit(f"# total {sum(r[0] for r in rows):.1f}s over {len(rows)} entries; errors: {bad or 'none'}")
    if out:
        out.close()


if __name__ == "__main__":
    main()
