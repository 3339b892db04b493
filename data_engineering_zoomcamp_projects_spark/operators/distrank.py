"""Distributed rank toolkit — the whole window-rank family without
low-cardinality-partition windows.

A window like ``ROW_NUMBER() OVER (PARTITION BY status ORDER BY ...)``
with a handful of partition values funnels ~|rows|/|values| through ONE
task — the same single-task pathology as a global sort, sharded. This
module generalizes the range-shard + broadcast-prefix pattern born in
``operators/analytics._exact_ntile`` into reusable pieces:

- :func:`ranked` — exact per-partition ROW_NUMBER where the shard count
  scales with the cluster, not the partition-key cardinality;
- :func:`rank_family` — rank / dense_rank / percent_rank / cume_dist /
  ntile derived from two `ranked` passes (rows, then tie-groups) plus
  broadcast per-partition totals — pure arithmetic identities of the
  row number, so results are bit-identical to the window forms.

Every internal window partitions on ``(_pid, *part_cols)`` — the shard
id keeps the grain high-cardinality — and the range-sharded frame is
barriered with a lazy ``localCheckpoint`` so all consumers read the
same RDD (identical range bounds by construction).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _same_part(s: Column, part_cols: list[str]) -> Column:
    """Null-safe equality of a broadcast struct's partition fields with
    the current row's (TRUE when part_cols is empty: global rank)."""
    terms = [s[c].eqNullSafe(F.col(c)) for c in part_cols]
    return reduce(lambda a, b: a & b, terms, F.lit(True))


def ranked(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    out: str = "_rn",
    out_total: str | None = None,
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (PARTITION BY part_cols ORDER BY
    order_cols)`` as a long column `out`, with no task ever holding more
    than ~|rows|/shards rows.

    Plan: range-shard on (part_cols ASC, *order_cols) — contiguous
    (partition, order) runs per shard — then row_number within the
    high-cardinality (_pid, part) grain, plus the broadcast cumulative
    counts of earlier shards of the same partition value. The count
    frame is metadata-sized: at most shards x |part values| entries
    (callers use this for bounded-cardinality partition keys; an
    unbounded part key belongs in a plain window, which is already
    scale-safe there). `order_cols` must make the ordering within a
    partition unique for a deterministic result (same contract as the
    oracle's ROW_NUMBER tie-break).

    `out_total` additionally attaches COUNT(*) OVER (PARTITION BY
    part_cols) as a long column, summed from the SAME broadcast
    shard-count array the rank offsets use — callers that need both
    rank and partition size (median position selection, ntile) get the
    total with zero extra exchanges instead of a separate
    `part_totals` aggregation + join."""
    shards = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    sort_exprs = [F.col(c).asc_nulls_last() for c in part_cols] + list(order_cols)
    ranged = (
        df.repartitionByRange(shards, *sort_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    cnts = (
        ranged.groupBy("_pid", *part_cols)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_pid", "_cnt", *part_cols))
            ).alias("_shard_cnts")
        )
    )
    w = Window.partitionBy("_pid", *part_cols).orderBy(*order_cols)
    off = F.aggregate(
        F.filter(
            F.col("_shard_cnts"),
            lambda s: _same_part(s, part_cols) & (s["_pid"] < F.col("_pid")),
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["_cnt"],
    )
    res = ranged.crossJoin(F.broadcast(cnts)).withColumn(
        out, (off + F.row_number().over(w)).cast("long")
    )
    if out_total is not None:
        total = F.aggregate(
            F.filter(F.col("_shard_cnts"), lambda s: _same_part(s, part_cols)),
            F.lit(0).cast("long"),
            lambda acc, s: acc + s["_cnt"],
        )
        res = res.withColumn(out_total, total)
    return res.drop("_pid", "_shard_cnts")


def part_totals(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """Per-partition row counts (|part values| rows — broadcast it)."""
    return df.groupBy(*part_cols).agg(F.count(F.lit(1)).alias("_n_part"))


def ntile_from_rank(rn: Column, n_total: Column, n: int) -> Column:
    """NTILE(n) as arithmetic over a (1-based) unique rank and the
    partition size: the first N mod n buckets take ceil(N/n) rows, the
    rest floor(N/n) — the exact window-NTILE size rule."""
    q = F.floor(n_total / n).cast("long")
    rem = (n_total % n).cast("long")
    big = q + F.lit(1)
    in_big = rn <= rem * big
    return F.when(in_big, F.floor((rn - 1) / big) + 1).otherwise(
        rem + F.floor((rn - rem * big - 1) / F.greatest(q, F.lit(1))) + 1
    )


def rank_family(
    df: DataFrame,
    part_cols: list[str],
    tie_cols: list[str],
    tiebreak_cols: list[Column],
) -> DataFrame:
    """Attach the full rank family over ``PARTITION BY part_cols ORDER
    BY tie_cols [, tiebreak_cols for the deterministic functions]``:

    - ``_rn``    row_number (ties broken by tiebreak_cols),
    - ``_rank``  rank        = min row number of the tie group,
    - ``_drank`` dense_rank  = tie-group index (second `ranked` pass
                 over the distinct tie-group frame),
    - ``_prank`` percent_rank = (rank-1)/(N-1)  (0.0 when N == 1),
    - ``_cdist`` cume_dist    = (rank + ties - 1)/N,
    - ``_n_part`` partition size (for ntile etc.).

    All identities of the row number — bit-equal to the window forms.
    The tie-group frame has one row per distinct (part, tie) value and
    joins back on that same high-cardinality composite key (equi-join:
    tie_cols must be non-null, the usual rank-query contract). The
    group/total frames re-read `ranked`'s checkpointed RDD, not the
    source scan, so the base frame is computed once.

    dense_rank runs as a PLAIN window over the tie-group frame: that
    frame is metadata-grain (|distinct (part, tie) values| rows — for
    rank queries over categorical orderings, orders of magnitude below
    the input), so the full range-shard machinery would be pure fixed
    overhead there. Callers whose tie values are NOT bounded (ranking
    by a continuous measure) get their scale safety from `ranked`
    itself — dense_rank over near-unique ties degenerates to row_number
    and should be computed as such."""
    asc_ties = [F.col(c).asc_nulls_last() for c in tie_cols]
    r = ranked(df, part_cols, asc_ties + list(tiebreak_cols), out="_rn")
    groups = r.groupBy(*part_cols, *tie_cols).agg(
        F.min("_rn").alias("_rank"), F.count(F.lit(1)).alias("_ties")
    )
    w = Window.partitionBy(*part_cols).orderBy(*asc_ties)
    groups = groups.withColumn("_drank", F.dense_rank().over(w).cast("long"))
    totals = part_totals(r, part_cols)
    # the tie-group and totals frames are metadata-sized — broadcast
    # both so the ranked frame never re-shuffles for the join-back
    out = r.join(F.broadcast(groups), [*part_cols, *tie_cols]).join(
        F.broadcast(totals), part_cols
    )
    n = F.col("_n_part")
    prank = F.when(n == 1, F.lit(0.0)).otherwise(
        (F.col("_rank") - 1).cast("double") / (n - 1).cast("double")
    )
    cdist = (F.col("_rank") + F.col("_ties") - 1).cast("double") / n.cast("double")
    return out.withColumn("_prank", prank).withColumn("_cdist", cdist)


def cum_weighted(
    df: DataFrame,
    order_cols: list[Column],
    weight_col: str,
    out: str = "_cum",
) -> DataFrame:
    """Distributed INCLUSIVE running SUM of ``weight_col`` over a
    global total order — the prefix-sum generalization of
    :func:`ranked` (the count case is weight = 1). A plain
    ``SUM() OVER (ORDER BY ...)`` with no partition clause funnels the
    whole frame through one task; here the frame is range-sharded on
    the total order, each shard's weight total is collected into ONE
    broadcast metadata array (<= shards entries), and a row's prefix is
    its shard's within-shard running sum plus the fold of all earlier
    shards' totals. ``order_cols`` must be a unique total order (the
    usual deterministic-result contract).

    Long-sum discipline: weights are summed as longs on both paths
    (callers pass integer weights — token counts, byte sizes); the
    result is exact and order-independent."""
    shards = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(shards, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    cnts = (
        ranged.groupBy("_pid")
        .agg(F.sum(weight_col).cast("long").alias("_w"))
        .agg(
            F.sort_array(F.collect_list(F.struct("_pid", "_w"))).alias("_shard_ws")
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = F.aggregate(
        F.filter(F.col("_shard_ws"), lambda s: s["_pid"] < F.col("_pid")),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["_w"],
    )
    # STAGE the prefix as a named column: downstream predicates read it
    # multiple times, and an inline (off + running) would re-inline the
    # broadcast-array fold per consumer (the re-inlining guard's bug
    # class)
    return (
        ranged.crossJoin(F.broadcast(cnts))
        .withColumn(
            out, (off + F.sum(weight_col).over(w).cast("long")).cast("long")
        )
        .drop("_pid", "_shard_ws")
    )
