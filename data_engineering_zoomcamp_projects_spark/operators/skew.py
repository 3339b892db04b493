"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit fallback for pathological keys (one
key holding >10% of a 100 TB fact table) or for aggregations, which AQE
does not skew-split. The helpers keep results EXACTLY equal to the
unsalted plan — proven by test against the plain implementation."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over
    `salt_buckets` shuffle partitions: the fact rows get a random salt,
    the (smaller) right side is replicated once per salt value, and the
    join key becomes (key, salt).

    Only fact-preserving join types are allowed: because the dim side is
    replicated per salt bucket, a right/full outer join would emit
    `salt_buckets` copies of every UNMATCHED dim row (matched rows are
    fine — each fact row carries exactly one salt). inner/left/
    left_semi/left_anti preserve row multiplicity exactly.

    Use when one join key dominates; replication factor = salt_buckets
    on the right side only."""
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join supports fact-preserving join types {sorted(safe)}; "
            f"got {how!r} — an outer join on the replicated dim side would "
            f"duplicate unmatched dim rows once per salt bucket"
        )
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
        how,
    )
    return out.drop("_salt")


def salted_sum(
    df: DataFrame,
    group_col: str,
    value: Column,
    out_name: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: partial sums over
    (key, salt) first — spreading a hot key across `salt_buckets`
    reducers — then the final combine per key. Equivalent to a plain
    groupBy-sum (decimal accumulation keeps it bit-identical)."""
    dec = "decimal(38,10)"
    partial = (
        df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
        .groupBy(group_col, "_salt")
        .agg(F.sum(value.cast(dec)).alias("_partial"))
    )
    return (
        partial.groupBy(group_col)
        .agg(F.sum("_partial").cast(dec).alias(out_name))
    )
