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

#: fixed linear-model weights (deploy-time: broadcast joblib model)
_WEIGHTS = {"intercept": 0.5, "n_orders": 0.1, "avg_value": 0.00001, "urgent_ratio": 2.0}


def customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature aggregation: per-customer order behavior (one shuffle,
    partial aggregation map-side)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
            / F.count("o_totalprice"),
            6,
        ).alias("avg_value"),
        F.round(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("urgent_ratio"),
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
        F.round(score("n_orders", "avg_value", "urgent_ratio"), 6).alias("score"),
    )


ML_SCORES_SQL = f"""
WITH feats AS (
  SELECT o_custkey AS custkey,
    COUNT(*) AS n_orders,
    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
          / COUNT(o_totalprice), 6) AS avg_value,
    ROUND(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS urgent_ratio
  FROM orders GROUP BY o_custkey
)
SELECT custkey, n_orders, avg_value, urgent_ratio,
  ROUND({_WEIGHTS['intercept']}
        + {_WEIGHTS['n_orders']} * n_orders
        + {_WEIGHTS['avg_value']} * avg_value
        + {_WEIGHTS['urgent_ratio']} * urgent_ratio, 6) AS score
FROM feats
"""


QUERIES = {"ml_customer_scores": ml_customer_scores}
ORACLES = {"ml_customer_scores": ML_SCORES_SQL}
