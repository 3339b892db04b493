"""Text expression builders: tokenization, n-gram shingling,
fingerprinting — shared by the dedup/text-analysis operators.

Native column expressions only; the shingle builder is the core of the
MinHash pipeline (shingle -> hash -> min per permutation)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(col, " ")


def shingles(col: Column, n: int = 5) -> Column:
    """Distinct n-gram shingles (token n-grams joined by space).

    transform(sequence(1, len-n+1), i -> array_join(slice(toks,i,n))) —
    all native; documents shorter than n yield one truncated shingle,
    matching the oracle's slice semantics.

    MEASURED DEAD END (round 4, keep the strings): keying shingles by
    xxhash64 over a slice of per-token hashes (skipping the string
    join) benched 4x FASTER standalone feeding a map-side partial agg
    (0.35s vs 1.49s full explode at sf0.1) but consistently SLOWER
    feeding a shuffle — the only downstream the real dedup/curation
    pipelines have (exploded pair-join: 1.9s vs 1.37s shuffle-write,
    4.0s vs 2.9s end-to-end; identical row counts, plans, and exchange
    structure — the flip reproduces across sessions and orderings).
    Don't re-attempt without profiling the shuffle-write path first.

    The token array is BOUND ONCE through a 1-element-array HOF wrapper
    (transform(array(split(..)), ts -> ..)): referencing the raw split
    expression inside the index lambda re-evaluates the split PER
    SHINGLE INDEX (no common-subexpression elimination across the
    lambda boundary), which made shingling O(len^2) splits per document
    — measured 11.4 s vs 2.7 s for the bare sf1 shingle projection
    (round 8); the wrapper keeps this a pure Column function so the
    many call sites stay single-expression."""
    return F.get(
        F.transform(
            F.array(tokens(col)),
            lambda ts: F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.size(ts) - (n - 1), F.lit(1))
                    ),
                    lambda i: F.array_join(F.slice(ts, i, n), " "),
                )
            ),
        ),
        F.lit(0),
    )


def sql_shingle_cte(n: int = 5, table: str = "documents") -> str:
    """DuckDB CTE producing (doc_id, s) distinct shingle rows.

    The index series bound is derived from the observed max token count
    (scalar subquery), not a fixed cap: a constant like 500 would
    silently DROP shingles of longer documents on the oracle side while
    the Spark side has no cap, diverging every dedup oracle."""
    return f"""
tok AS (SELECT doc_id, split(text, ' ') AS ts FROM {table}),
idx AS (
  SELECT unnest(generate_series(1, (SELECT COALESCE(MAX(len(ts)), 1) FROM tok))) AS i
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+{n - 1}], ' ') AS s
  FROM tok, idx
  WHERE i <= greatest(len(ts) - {n - 1}, 1)
)"""


def doc_fingerprint_md5(col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (classic near-dup blocking key)."""
    return F.md5(F.array_join(F.sort_array(F.array_distinct(tokens(col))), " "))


def register_split_tokens_udtf(spark):
    """Python UDTF surface (Spark 3.5+/4): a table function usable in
    the FROM clause / LATERAL position. Registered for API parity —
    the engine's own plans use native explode/posexplode (JVM-side,
    codegen) for this exact job; a Python UDTF pays a Python-worker
    round trip per partition and belongs only where logic genuinely
    can't be expressed natively. tests/test_extras.py pins UDTF output
    == posexplode(split(...)) so the two surfaces stay semantically
    interchangeable."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield i, t

    spark.udtf.register("split_tokens", SplitTokens)
    return SplitTokens
