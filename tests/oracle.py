"""Local twin of the driver's oracle-differential harness.

Runs a queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same parquet tables, then compares row count, column names,
and order-insensitive values (exact; floats must match bit-for-bit —
the parity helpers in operators/parity.py are designed to make that
hold)."""

from __future__ import annotations

import math

import duckdb

from data_engineering_zoomcamp_projects_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    # bound the buffer pool: DuckDB's default limit (80% of RAM) over
    # 32 threads on a no-swap host hits allocator bad_alloc when a
    # Spark JVM holds most of memory alongside (the ivfpq-shaped
    # decimal-join oracles are the trigger; same hardening as the
    # verify recipe's long-lived connection). Sized from the machine —
    # ~20% of physical RAM divided by the expected process concurrency
    # (pytest-xdist workers / parallel sweeps each open their own
    # connection, so N unscaled limits would aggregate to N*20% beside
    # the JVM — r13 ADVICE), floor 1 GB.
    import os

    # (parallel sweeps don't reach this path — sweep_registry.py runs
    # queries with the noop sink and never opens DuckDB — so xdist
    # workers are the only real concurrent run_oracle users; an
    # explicit SPARK_GRAFT_ORACLE_PROCS override covers anything else)
    workers = int(
        os.environ.get("SPARK_GRAFT_ORACLE_PROCS")
        or os.environ.get("PYTEST_XDIST_WORKER_COUNT", "1")
        or 1
    )
    ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    limit_gb = max(1, int(ram / (1 << 30) * 0.2 / max(1, workers)))
    con.execute(f"SET memory_limit='{limit_gb}GB'")
    con.execute("SET threads=8")
    # per-call private spill dir: independent DuckDB processes sharing
    # one temp_directory risk cleanup races (r13 ADVICE), and a bare
    # per-pid dir would litter /tmp across hundreds of process
    # launches — mkdtemp + rmtree leaves nothing behind
    import shutil
    import tempfile

    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    # view creation sits INSIDE the try: a failure there (e.g. missing
    # parquet) must still close the connection and reap the spill dir
    # (r14 ADVICE — the leak the private spill dir was meant to avoid)
    try:
        con.execute(f"SET temp_directory='{spill}'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()
        shutil.rmtree(spill, ignore_errors=True)


def _canon_cell(v):
    """Type-strict canonicalization: int vs float must NOT compare equal
    (the driver hashes values; 175 != 175.0 there). NaN made hashable."""
    if v is None:
        return None
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        # numpy scalar -> native python so the type tag is meaningful
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return f"float:{v!r}"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(canon, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, oracle_pdf, name: str = "query") -> list[str]:
    """Return list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    o_cols = list(oracle_pdf.columns)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_rows = [tuple(r) for r in oracle_pdf.itertuples(index=False, name=None)]
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    sc = _canon_rows(s_cols, s_rows)
    oc = _canon_rows(o_cols, o_rows)
    n_bad = 0
    for i, (a, b) in enumerate(zip(sc, oc)):
        if a != b:
            n_bad += 1
            if n_bad <= 5:
                problems.append(f"{name}: row {i} differs\n  spark : {a}\n  oracle: {b}")
    if n_bad > 5:
        problems.append(f"{name}: ... {n_bad} differing rows total")
    return problems
