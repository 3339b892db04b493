"""Numeric/temporal parity helpers for oracle-differential checking.

The correctness gate compares Spark results against DuckDB running
equivalent ANSI SQL (row-count + schema + order-insensitive value
hash). Floating-point aggregation is order-dependent, and Spark/DuckDB
sum in different orders — so every float aggregate in a checked query
goes through these helpers on BOTH sides:

- sums: cast each input to DECIMAL(38,10) (exact, order-independent),
  sum exactly, round, cast back to double;
- averages: exact decimal sum -> double, divide by count (single IEEE
  op, deterministic), round;
- timestamps: always rendered to strings (`yyyy-MM-dd[ HH:mm:ss]`) so
  timezone/precision representations (testdata mixes ms and ns) never
  reach the comparator.

These are harness-parity conventions, not engine semantics: the engine
itself computes in native double; only oracle-checked query surfaces
apply the decimal canonicalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, rounded to `scale`."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double").alias(alias)


def davg(col: Column, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum -> double / count.

    The final rounding goes through a decimal cast: 2-dp money sums
    divided by power-of-two-ish counts produce terminating expansions
    whose digit exactly at the rounding boundary makes plain
    ROUND(double) implementation-divergent; rounding the same decimal
    value is consistent on both engines even on true ties."""
    quotient = F.sum(col.cast(DEC)).cast("double") / F.count(col)
    return F.round(quotient.cast(DEC), scale).cast("double").alias(alias)


def dsum0(col: Column, alias: str, scale: int = 2) -> Column:
    """Like dsum but null-free (empty/all-null group -> 0.0). Use in any
    query whose groups can be empty: a NULL double surfaces as NaN via
    pandas on the DuckDB side but None on the Spark side, which breaks
    value-hash comparison."""
    return (
        F.round(F.coalesce(F.sum(col.cast(DEC)), F.lit(0).cast(DEC)), scale)
        .cast("double")
        .alias(alias)
    )


def rnd(col: Column, alias: str, scale: int = 6) -> Column:
    """Round a scalar double for stable comparison. Use ONLY for
    unstructured values (transcendentals, quotients): money-style
    products of 2-dp inputs land exactly on .xx5 ties where Spark and
    DuckDB double-rounding disagree — use drnd for those."""
    return F.round(col, scale).alias(alias)


def drnd(col: Column, alias: str, scale: int = 2) -> Column:
    """Tie-safe per-row rounding: cast to exact decimal first, then
    round (both engines round decimals half-away-from-zero), then back
    to double. Required whenever the value is a product/sum of 2-dp
    inputs whose exact decimal representation hits the rounding
    boundary."""
    return F.round(col.cast(DEC), scale).cast("double").alias(alias)


# --- scaled-long fast path (same canonical result, ~2x cheaper) -----------
#
# dsum/davg accumulate in decimal(38,10): exact and order-independent,
# but the 128-bit decimal accumulator is the single biggest CPU cost of
# the flagship q1 (measured 1.68s vs 0.71s for the identical plan in
# native double — BASELINE.md §3). When every input is a fixed-point
# money value with <= `s` decimal places, the SAME canonical result is
# reachable in 64-bit integer arithmetic:
#
#   per row:  floor(x * 10^s + 0.5)     — exact (double repr error of an
#             s-dp value is orders below the .5 rounding boundary);
#             measured 2.3x cheaper than the Round expression, which is
#             why the cast does the rounding;
#   partial:  sum(long) per (keys, partition_id) — map-side combine does
#             the heavy lifting in long adds. Overflow is structurally
#             impossible, not just unlikely: a partial covers one scan
#             split (<= spark.sql.files.maxPartitionBytes = 128MB), and
#             even at one long column per row that is ~1.6e7 rows; at
#             s=6 and |x| <= 1e6 the partial tops out ~1.6e19/1e3 —
#             three orders under int64 max (try_sum was measured at
#             +50% aggregate cost for a bound physics already grants);
#   final:    sum(partials as decimal)/10^s — <= shards x groups rows,
#             exact, then the usual round/cast-to-double canonical form.
#
# CONTRACT: inputs must be NON-NEGATIVE exact s-dp values (the +0.5
# floor-cast rounds half-up only for x >= 0; a negative input would
# truncate toward zero). Money/quantity columns satisfy both. Under the
# contract the result is bit-identical to dsum/davg's decimal path
# (tests/test_golden.py pins q1 against the unchanged decimal oracle).


def scaled_long(col: Column, s: int) -> Column:
    """Exact fixed-point representation of a non-negative s-dp double:
    scale, then round half-up via the truncating long cast — double
    representation error (well under .5 post-scale) never reaches the
    accumulator."""
    return (col * F.lit(10**s) + F.lit(0.5)).cast("long")


def lsum_partial(col: Column, s: int, alias: str) -> Column:
    """Stage-1 partial: long sum of the scaled input. Group by
    (*keys, spark_partition_id()) so each partial covers one scan split
    (see overflow note above) and map-side combine stays in longs."""
    return F.sum(scaled_long(col, s)).alias(alias)


def lsum_final(pcol: str, s: int, alias: str, scale: int = 2) -> Column:
    """Stage-2 merge: exact decimal sum of the long partials, unscale,
    then dsum's canonical round->double form."""
    exact = F.sum(F.col(pcol).cast("decimal(38,0)")).cast(DEC) / F.lit(10**s)
    return F.round(exact, scale).cast("double").alias(alias)


def lavg_final(
    pcol: str, s: int, ncol: str, alias: str, scale: int = 6
) -> Column:
    """Stage-2 average, mirroring davg exactly: exact sum -> double,
    one IEEE divide by the count, tie-safe decimal rounding."""
    exact = F.sum(F.col(pcol).cast("decimal(38,0)")).cast(DEC) / F.lit(10**s)
    quotient = exact.cast("double") / F.sum(F.col(ncol))
    return F.round(quotient.cast(DEC), scale).cast("double").alias(alias)


def lsum1(col: Column, s: int, alias: str, scale: int = 2) -> Column:
    """Single-stage dsum on the scaled-long fast path, for
    HIGH-CARDINALITY groupings where the (keys, partition_id) two-stage
    form would double the agg state for nothing. Overflow bound is per
    GROUP here (group_rows x max|x| x 10^s < 2^63), so use only where
    the grain bounds rows-per-group (per-order lineitems, per-customer
    orders, per-day events at documented SF) — for global or
    low-cardinality groupings use lsum_partial/lsum_final. Same
    non-negative exact-s-dp input contract, same canonical result as
    dsum."""
    exact = F.sum(scaled_long(col, s)).cast(DEC) / F.lit(10**s)
    return F.round(exact, scale).cast("double").alias(alias)


def lsum1_0(col: Column, s: int, alias: str, scale: int = 2) -> Column:
    """lsum1 with dsum0's null-free contract (empty/all-null group ->
    0.0)."""
    exact = F.coalesce(F.sum(scaled_long(col, s)), F.lit(0)).cast(DEC) / F.lit(
        10**s
    )
    return F.round(exact, scale).cast("double").alias(alias)


def ts_str(col: Column, alias: str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Render a timestamp to a canonical string (session tz is UTC)."""
    return F.date_format(col, fmt).alias(alias)


def date_str(col: Column, alias: str) -> Column:
    return F.date_format(col, "yyyy-MM-dd").alias(alias)


# --- DuckDB-side SQL fragments (same canonicalization) ---------------------


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(ROUND(CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE)"
        f" / COUNT({expr}) AS DECIMAL(38,10)), {scale}) AS DOUBLE) AS {alias}"
    )


def sql_dsum0(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(COALESCE(SUM(CAST(({expr}) AS DECIMAL(38,10))), 0), {scale})"
        f" AS DOUBLE) AS {alias}"
    )


def sql_rnd(expr: str, alias: str, scale: int = 6) -> str:
    return f"ROUND({expr}, {scale}) AS {alias}"


def sql_drnd(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(ROUND(CAST(({expr}) AS DECIMAL(38,10)), {scale}) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_ts_str(expr: str, alias: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S') AS {alias}"


def sql_date_str(expr: str, alias: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d') AS {alias}"
