"""MERGE/upsert emulation over plain parquet (SURVEY.md guide: CDC/SCD2
without Delta/Iceberg jars = anti-join + union (+ window for history)).

When an Iceberg/Delta runtime jar is present these collapse to
`MERGE INTO`; the emulation has identical semantics and is what the
reference's incremental-ingest loop (reference
citibike_project/etl/ingest_data.py:171-181, skip-if-exists probes
:251-253) actually needed."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins upsert: rows from `updates` replace same-key
    rows in `target`; new keys append. One anti-join + union — both
    sides shuffle once on the key."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str = "effective_from",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: incoming change rows close the
    previous current version (is_current=0) and become the new current
    one. History rows are never mutated — append + window re-flag.

    `changes` must carry `effective_col`; version order within a key is
    (effective_from, and arrival is assumed unique per key per batch).
    """
    all_rows = dim.unionByName(changes.withColumn(current_col, F.lit(1)))
    w = Window.partitionBy(key).orderBy(F.col(effective_col).desc())
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .withColumn(current_col, F.when(F.col("_rn") == 1, 1).otherwise(0))
        .drop("_rn")
    )
