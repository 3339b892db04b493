"""CLI entry — the reference's EP1 interface re-expressed
(reference citibike_project/etl/ingest_data.py:327-341 argparse ->
main(params); etl/Dockerfile:19 ENTRYPOINT). Three subcommands:

  python -m data_engineering_zoomcamp_projects_spark ingest --source <csv...> --out <dir>
  python -m data_engineering_zoomcamp_projects_spark query --name <queries() key> [--sf-dir D]
  python -m data_engineering_zoomcamp_projects_spark bench

The JDBC coordinates the reference took via --user/--password/--db are
deploy-time writer options here (ingest/sinks.py::write_jdbc);
the lakehouse sink needs none."""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_engineering_zoomcamp_projects_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="run the trips ingestion pipeline")
    ing.add_argument("--source", nargs="+", required=True, help="CSV path(s)/glob(s)")
    ing.add_argument("--out", required=True, help="output lakehouse path")
    ing.add_argument("--archive", nargs="*", default=None, help="zip/tar archives")
    ing.add_argument("--scratch", default=None, help="scratch dir for extraction")

    q = sub.add_parser("query", help="run a registered query and show it")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--limit", type=int, default=20)

    sub.add_parser("bench", help="run the headline benchmark")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "bench":
        # bench.py lives at the repo root (driver contract), not inside
        # the package — resolve it relative to this file so the CLI
        # works from any cwd, not just the repo root
        import importlib.util
        import os

        bench_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
        )
        spec = importlib.util.spec_from_file_location("bench", bench_path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        bench.main()
        return 0

    from .session import get_spark

    spark = get_spark()
    if args.cmd == "ingest":
        from .ingest.pipeline import run_trips_pipeline

        res = run_trips_pipeline(
            spark, args.source, args.out, archives=args.archive, scratch_dir=args.scratch
        )
        print(
            f"ingested rows={res.n_rows} months={res.n_months} -> {res.out_path}"
        )
        return 0
    if args.cmd == "query":
        from .registry import all_queries

        queries = all_queries()
        if args.name not in queries:
            print(
                f"unknown query {args.name!r}; available: {', '.join(sorted(queries))}",
                file=sys.stderr,
            )
            return 2
        queries[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
