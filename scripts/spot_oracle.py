"""Spot oracle check for named registry entries (r18 working tool).

Runs each named queries() entry on Spark (local[8], the verify-skill
session shape) and its oracle_sql() twin on DuckDB at
$SPARK_GRAFT_SF_DIR (default sf0.01, the driver's certification SF),
comparing order-insensitive stringified rows exactly as the verify
recipe does.

Usage: python scripts/spot_oracle.py name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads=8")
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    bad = 0
    for name in names:
        sdf = qs[name](spark, sf)
        srows = sorted(
            tuple(str(x) for x in r)
            for r in sdf.select(*sorted(sdf.columns)).collect()
        )
        if name not in os_:
            print(name, "rows-only:", len(srows))
            continue
        opdf = con.execute(os_[name]).fetchdf()
        orows = sorted(
            tuple(str(x) for x in r)
            for r in opdf[sorted(opdf.columns)].itertuples(index=False, name=None)
        )
        ok = srows == orows
        bad += not ok
        print(name, "match:", ok, len(srows))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
