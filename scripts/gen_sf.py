"""Amplify driver testdata to a larger scale factor for LOCAL
scale-stress benching (VERDICT r4 item 4).

The driver's generator is not available, so sfN is produced by
deterministic K-fold amplification of /root/testdata/sf0.1 (replica 0
is the untouched original):

- key columns shift by ``replica * 10_000_000`` consistently across
  tables, so referential integrity (orders->customer,
  lineitem->orders/part/supplier, embeddings.vec_id<->documents.doc_id,
  events.user_id grain) holds within every replica and replicas never
  collide. ``nation``/``region`` stay fixed (TPC-H dims don't scale).
- ``documents.text`` gets a per-replica suffix appended to EVERY word
  (``regexp_replace('(\\S+)', '\\1x<r>')``), so replicas share no
  shingles/tokens: pair density per document stays constant — the
  realistic "corpus grew 10x, dup rate unchanged" regime. A naive
  verbatim copy would make every doc a 10-way exact duplicate and
  quadratically explode every near-dup workload, measuring the data
  artifact instead of the plan. ``n_chars`` is recomputed.
- ``embeddings.embedding`` is rotated by ``replica`` positions
  (norm-preserving; cross-replica cosines are decorrelated, so no
  artificial near-dup pairs), keeping within-replica geometry identical
  to sf0.1.
- ``events`` keeps its time range (density grows 10x) with disjoint
  user/event ids per replica — the "bigger deployment, same window"
  regime; per-user session/gap structure is unchanged.

Usage: python scripts/gen_sf.py [K] [OUT_DIR]
Defaults: K=10, OUT_DIR=/root/repo/.localdata/sf1
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

#: table -> list of key columns shifted by replica*OFF
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["nation", "region"]


def replica_select(table: str, cols: list[tuple[str, str]], r: int) -> str:
    exprs = []
    for name, _typ in cols:
        if name in SHIFT.get(table, []):
            exprs.append(f"({name} + {r * OFF}) AS {name}")
        elif table == "customer" and name == "c_name" and r > 0:
            # Key-shifted names ("Customer#010000001" vs
            # "Customer#000000001") sit at edit distance 1-2 of their
            # replica twins, so a verbatim shift makes every name a
            # near-dup of its 9 copies and the fuzzy-match workloads
            # measure that data artifact (candidate explosion at sf1)
            # instead of the plan — the same trap the documents
            # word-suffix already avoids. A 3-char replica suffix pushes
            # every cross-replica pair to edit distance >= 3: density
            # per name stays constant as the corpus grows.
            exprs.append(
                f"(c_name || '~' || repeat(chr(97 + {r}), 3)) AS c_name"
            )
        elif table == "documents" and name == "text" and r > 0:
            exprs.append(rf"regexp_replace(text, '(\S+)', '\1x{r}', 'g') AS text")
        elif table == "documents" and name == "n_chars" and r > 0:
            exprs.append(
                rf"length(regexp_replace(text, '(\S+)', '\1x{r}', 'g')) AS n_chars"
            )
        elif table == "embeddings" and name == "embedding" and r > 0:
            exprs.append(
                f"(embedding[{r + 1}:64] || embedding[1:{r}])::FLOAT[] AS embedding"
            )
        else:
            exprs.append(name)
    return f"SELECT {', '.join(exprs)} FROM src"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in COPY_AS_IS + list(SHIFT):
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        )
        cols = [
            (row[0], row[1])
            for row in con.execute("DESCRIBE SELECT * FROM src").fetchall()
        ]
        if table in COPY_AS_IS:
            body = "SELECT * FROM src"
        else:
            body = " UNION ALL ".join(replica_select(table, cols, r) for r in range(k))
        dest = out / f"{table}.parquet"
        con.execute(f"COPY ({body}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
        print(f"{table}: {n} rows -> {dest}")


if __name__ == "__main__":
    main()
