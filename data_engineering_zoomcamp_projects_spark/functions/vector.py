"""Vector math over `array<float>` embedding columns — native
higher-order functions only (zip_with + aggregate), no UDFs: the whole
expression stays inside whole-stage codegen.

Exactness contract: dot products and squared norms accumulate in
scale-10 decimal so they are order-independent and bit-identical to the
DuckDB oracle (each elementwise double product is IEEE-deterministic
and its double->decimal(*,10) cast rounds identically on both engines;
the decimal sum is exact). Cosine is then a fixed sequence of IEEE
double ops on identical inputs.

Accumulator precision (r13): the fold accumulates in DECIMAL(28,10),
NOT (38,10). Spark types (38,10)+(38,10) as (38,9) — precision
overflows 38, so the bounded-precision rule SHEDS THE 10TH DECIMAL of
every intermediate sum (HALF_UP per step; a fold of ten 1e-10 terms
returns literal zero). That made dot_dec quietly non-exact: measured
against the true decimal sum at sf0.01, 2462/2495 query-corpus pairs
were off (mean 2.7e-9, max 1e-8) — invisible under the 6-dp output
rounding until a cosine lands within noise of a rounding boundary
(sim_index_query_filtered row, r13). At (28,10), addition types as
(29,10) — no precision overflow, no scale loss — and the cast back to
(28,10) is value-lossless for |sum| < 10^18, so the fold now equals
the oracle's list_sum exactly on every pair (pytest-pinned against a
Python-decimal reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"
#: fold accumulator type — see the module docstring; 18 integral
#: digits of headroom, scale 10 preserved through every (acc + x)
ACC = "decimal(28,10)"


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot_dec(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two double arrays (see the module
    docstring for why the accumulator is DECIMAL(28,10)).

    Domain contract: every intermediate |sum| (and every elementwise
    product) must stay < 10^18 — the (28,10) accumulator's integral
    headroom. Beyond it, non-ANSI Spark yields a silent NULL (not an
    error). Fine for unit-scale embeddings (64-dim sums are O(10));
    callers feeding unnormalized data at 10^16+ magnitudes must
    pre-scale or use dot_double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast(ACC)),
        F.lit(0).cast(ACC),
        lambda acc, x: (acc + x).cast(ACC),
    )


def norm_sq_dec(a: Column) -> Column:
    return dot_dec(a, a)


def dot_double(a: Column, b: Column) -> Column:
    """Plain IEEE-double dot product — ~4x cheaper than the decimal
    form. NOT order-independent, so never feed it to an oracle-compared
    output column; use it as a PREFILTER that gates the exact decimal
    computation to near-threshold candidates (with a safety margin far
    above double summation error, e.g. 1e-6 for 64-dim unit-scale
    vectors whose true error is ~1e-13)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_double_fixed(a: Column, b: Column, dim: int) -> Column:
    """dot_double unrolled for a KNOWN dimension: a flat sum of
    element_at products. Higher-order-function lambdas are evaluated by
    the interpreted expression walker per element, while this unrolled
    tree stays inside whole-stage codegen — measured ~4x cheaper on the
    pair-scoring hot paths. Same left-to-right IEEE summation order as
    the HOF form. Callers must know the embedding dimension (the usual
    contract for an embedding column); for ragged arrays use
    dot_double."""
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, decimal-exact accumulation."""
    return dot_dec(a, b).cast("double") / (
        F.sqrt(norm_sq_dec(a).cast("double")) * F.sqrt(norm_sq_dec(b).cast("double"))
    )


def norm(a: Column) -> Column:
    return F.sqrt(norm_sq_dec(a).cast("double"))


# --- DuckDB twins ----------------------------------------------------------


def sql_dot_dec(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip(({a})::DOUBLE[], ({b})::DOUBLE[]),"
        f" s -> CAST(s[1]*s[2] AS DECIMAL(38,10))))"
    )


def sql_cosine(a: str, b: str) -> str:
    return (
        f"(CAST({sql_dot_dec(a, b)} AS DOUBLE) / "
        f"(sqrt(CAST({sql_dot_dec(a, a)} AS DOUBLE))"
        f" * sqrt(CAST({sql_dot_dec(b, b)} AS DOUBLE))))"
    )


def sql_norm(a: str) -> str:
    return f"sqrt(CAST({sql_dot_dec(a, a)} AS DOUBLE))"


def sql_dot_double(a: str, b: str, dim: int = 64) -> str:
    """DuckDB twin of `dot_double` / `_dot_double`: an explicit
    left-associated sum of elementwise double products, so the IEEE
    summation ORDER matches Spark's HOF fold term for term (list_sum
    makes no order guarantee). Used where the double dot's exact bit
    pattern decides a comparison (LSH bucket signs, IVF argmax cells),
    not just a rounded output value."""
    terms = " + ".join(
        f"(({a})[{i}]::DOUBLE * ({b})[{i}]::DOUBLE)" for i in range(1, dim + 1)
    )
    return f"({terms})"


def dist_double(a: Column, b: Column) -> Column:
    """IEEE-double squared L2 — the `dot_double` discipline applied to
    distance: use only where an ARGMIN decides a comparison (e.g. PQ
    code assignment), with the DuckDB twin reproducing the exact
    left-fold order (`sql_dist_double`), so every comparison
    bit-matches. ~4x cheaper than dist_dec (measured on the IVF-PQ
    code-assignment path, r11)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_dist_double(a: str, b: str, dim: int) -> str:
    """DuckDB twin of `dist_double` over already-sliced double lists:
    explicit left-associated sum, term-for-term the HOF fold's IEEE
    sequence (0.0 + t1) + t2 ... like sql_dot_double."""
    out = "0.0"
    for i in range(1, dim + 1):
        out = f"({out} + (({a})[{i}] - ({b})[{i}]) * (({a})[{i}] - ({b})[{i}]))"
    return out


def dist_dec(a: Column, b: Column) -> Column:
    """Exact decimal SQUARED EUCLIDEAN distance of two double arrays —
    same order-independence contract as dot_dec: each (x-y)^2 is an
    IEEE-deterministic double, the decimal sum of the per-dim casts is
    exact, so the value is bit-identical across engines and partition
    layouts. Used where a distance decides a comparison that must
    hash-match (k-means argmin cells). Accumulates at ACC like
    dot_dec — see the module docstring (a (38,10) accumulator sheds
    the 10th decimal per fold step). Same domain contract as dot_dec:
    |sum| and per-dim squares must stay < 10^18 or the fold goes
    silently NULL under non-ANSI mode."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast(ACC)),
        F.lit(0).cast(ACC),
        lambda acc, x: (acc + x).cast(ACC),
    )


def sql_dist_dec(a: str, b: str) -> str:
    """DuckDB twin of dist_dec."""
    return (
        f"list_sum(list_transform(list_zip(({a})::DOUBLE[], ({b})::DOUBLE[]),"
        f" s -> CAST((s[1]-s[2])*(s[1]-s[2]) AS DECIMAL(38,10))))"
    )
