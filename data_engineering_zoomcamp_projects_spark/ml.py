"""ML feature/serving slot (SURVEY.md §2 B5).

The reference declared a FastAPI+sklearn serving container with an
EMPTY app.py (reference citibike_project/ml_service/app.py — 0 bytes,
ml_service/requirements.txt:1-6); the engine-scope semantics we define
for that slot: distributed feature aggregation + model scoring via an
Arrow-batched pandas UDF (model serving itself stays out of engine
scope).

The scorer is a fixed linear model so the pipeline is oracle-checkable:
pandas evaluates the same IEEE double expression DuckDB does, so scores
hash-match. Swap `_WEIGHTS`/the UDF body for a joblib model at deploy
time — the plumbing (broadcast weights, vectorized batches) is
identical."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.parity import DEC

#: fixed linear-model weights (deploy-time: broadcast joblib model).
#: All powers of two: a decimal weight like 1e-5 shifts avg_value's
#: 6-dp digits exactly onto the score's 6-dp rounding boundary, putting
#: ~15% of rows on an exact .5 tie where Spark and DuckDB rounding can
#: disagree (observed at sf0.1). Power-of-two weights are exact in
#: binary, so the score's decimal tail is noise-like and tie-free.
_WEIGHTS = {
    "intercept": 0.5,
    "n_orders": 0.125,
    "avg_value": 2.0 ** -17,
    "urgent_ratio": 2.0,
}


def customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature aggregation: per-customer order behavior (one shuffle,
    partial aggregation map-side)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            (
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
                / F.count("o_totalprice")
            ).cast(DEC),
            6,
        )
        .cast("double")
        .alias("avg_value"),
        F.round(
            (
                F.sum(
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).cast(DEC),
            6,
        )
        .cast("double")
        .alias("urgent_ratio"),
    )


def ml_customer_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature frame -> pandas_udf linear scorer (Arrow-vectorized; the
    UDF is a closure so executors need no package imports)."""
    w = dict(_WEIGHTS)

    @F.pandas_udf("double")
    def score(n_orders: pd.Series, avg_value: pd.Series, urgent_ratio: pd.Series) -> pd.Series:
        return (
            w["intercept"]
            + w["n_orders"] * n_orders
            + w["avg_value"] * avg_value
            + w["urgent_ratio"] * urgent_ratio
        )

    feats = customer_features(spark, sf_dir)
    return feats.select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        "avg_value",
        "urgent_ratio",
        # tie-safe rounding: decimal-cast first (plain ROUND(double, 6)
        # hit a binary near-tie on 1 row in 15k at sf0.1 where the
        # engines' rounding implementations disagree)
        F.round(score("n_orders", "avg_value", "urgent_ratio").cast(DEC), 6)
        .cast("double")
        .alias("score"),
    )


ML_SCORES_SQL = f"""
WITH feats AS (
  SELECT o_custkey AS custkey,
    COUNT(*) AS n_orders,
    CAST(ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
          / COUNT(o_totalprice) AS DECIMAL(38,10)), 6) AS DOUBLE) AS avg_value,
    CAST(ROUND(CAST(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*) AS DECIMAL(38,10)), 6) AS DOUBLE) AS urgent_ratio
  FROM orders GROUP BY o_custkey
)
SELECT custkey, n_orders, avg_value, urgent_ratio,
  CAST(ROUND(CAST({_WEIGHTS['intercept']}
        + {_WEIGHTS['n_orders']} * n_orders
        + {_WEIGHTS['avg_value']} * avg_value
        + {_WEIGHTS['urgent_ratio']} * urgent_ratio AS DECIMAL(38,10)), 6)
    AS DOUBLE) AS score
FROM feats
"""


QUERIES = {"ml_customer_scores": ml_customer_scores}
ORACLES = {"ml_customer_scores": ML_SCORES_SQL}


def ml_segment_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score normalization of order values
    within each (customer-segment) group — the per-group pandas path for
    logic that genuinely needs a whole group in memory (fit/transform
    per group). Rows-only driver check; pytest pins equivalence to the
    native window formulation within float tolerance.

    Scale note: each group must fit one executor's memory — groups here
    are segments; at 100 TB you'd sub-bucket (segment, hash(custkey)%k).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        pdf["z"] = (pdf["o_totalprice"] - mu) / sd
        return pdf

    return joined.groupBy("c_mktsegment").applyInPandas(
        zscore,
        schema="c_mktsegment string, o_orderkey long, o_totalprice double, z double",
    )


QUERIES["ml_segment_zscores"] = ml_segment_zscores
# rows-only: pandas mean/std accumulate in a different order than any
# SQL engine; equivalence to the native window form is pinned in pytest
