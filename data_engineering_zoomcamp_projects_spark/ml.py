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


def _det3(a: list[str]) -> str:
    """3x3 determinant expression text (first-column cofactor
    expansion) over 9 column names, rows (a0,a1,a2),(a3,a4,a5),
    (a6,a7,a8). The SAME string feeds Spark selectExpr and DuckDB, so
    both engines execute the identical IEEE-double operation tree —
    determinism by shared formula text, the fn_math_suite convention."""
    return (
        f"({a[0]}*({a[4]}*{a[8]} - {a[5]}*{a[7]})"
        f" - {a[3]}*({a[1]}*{a[8]} - {a[2]}*{a[7]})"
        f" + {a[6]}*({a[1]}*{a[5]} - {a[2]}*{a[4]}))"
    )


#: shared Cramer formulas for y ~ b0 + b1*q + b2*d normal equations
#: A = [[n,Sq,Sd],[Sq,Sqq,Sqd],[Sd,Sqd,Sdd]], rhs = [Sy,Sqy,Sdy]
_LR_DET = _det3(["sn", "sq", "sd", "sq", "sqq", "sqd", "sd", "sqd", "sdd"])
_LR_D0 = _det3(["sy", "sq", "sd", "sqy", "sqq", "sqd", "sdy", "sqd", "sdd"])
_LR_D1 = _det3(["sn", "sy", "sd", "sq", "sqy", "sqd", "sd", "sdy", "sdd"])
_LR_D2 = _det3(["sn", "sq", "sy", "sq", "sqq", "sqy", "sd", "sqd", "sdy"])
_LR_COEFS = [
    f"round(({_LR_D0})/({_LR_DET}), 8) AS b_intercept",
    f"round(({_LR_D1})/({_LR_DET}), 8) AS b_quantity",
    f"round(({_LR_D2})/({_LR_DET}), 8) AS b_discount",
]


def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS fit of l_extendedprice ~ quantity + discount,
    entirely in the plan: ONE full-scan aggregation accumulates the
    normal-equation moment sums in exact DECIMAL(18,4)-based
    arithmetic (inputs are 2-dp/integer-valued, so every product fits
    DECIMAL(37,8) exactly — order-independent, no float drift), then
    Cramer's rule solves the 3x3 system as a projection over the
    one-row sums frame. No collect, no iteration, no UDF: distributed
    model FITTING as a DataFrame program (the training-side complement
    of the pandas_udf scorer above). The moments-then-solve shape is
    exactly how MLlib's normal-equation solver distributes; at 100 TB
    the scan is the cost and it is one pass.

    The DuckDB oracle runs the same decimal moments and the SAME
    determinant formula text, so coefficients hash-match bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    D = "decimal(18,4)"
    q = F.col("l_quantity").cast(D)
    d = F.col("l_discount").cast(D)
    y = F.col("l_extendedprice").cast(D)
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("sn"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(q * y).cast("double").alias("sqy"),
        F.sum(d * y).cast("double").alias("sdy"),
    )
    return sums.selectExpr("n", *_LR_COEFS)


_LR_SUMS_SQL = """
  SELECT COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS sn,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sd,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sqq,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sqd,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sdd,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sqy,
    CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sdy
  FROM lineitem
"""

ML_LINREG_SQL = f"""
WITH s AS ({_LR_SUMS_SQL})
SELECT n,
       ROUND(({_LR_D0})/({_LR_DET}), 8) AS b_intercept,
       ROUND(({_LR_D1})/({_LR_DET}), 8) AS b_quantity,
       ROUND(({_LR_D2})/({_LR_DET}), 8) AS b_discount
FROM s
"""

QUERIES["ml_linreg_normal_eq"] = ml_linreg_normal_eq
ORACLES["ml_linreg_normal_eq"] = ML_LINREG_SQL


#: k-means configuration: corpus-derived k (see kmeans_k_for) with a
#: fixed floor, fixed iteration count, deterministic seed (the k
#: lowest vec_ids). Fixed-iteration training keeps the oracle
#: expressible (3 unrolled assignment/update rounds in SQL);
#: convergence-exit training belongs to the iterative-algorithm family
#: (see llm/dedup.min_label_components for that pattern).
KMEANS_K = 8
KMEANS_ITERS = 3
#: SemDeDup's scale rule (Abbas et al. 2023 run k=50,000 over LAION
#: precisely to hold cells join-friendly): derive k so the EXPECTED
#: CELL SIZE n/k stays ~KMEANS_CELL_TARGET as the corpus grows — the
#: within-cell pair volume per row is then bounded by the target, not
#: by n/8, which is what made the fixed k=8 plan quadratic-at-scale
#: (r15 verdict: ~30+ min at sf10 with 200k vectors in 8 cells).
#: KMEANS_K stays the floor so every certification SF (sf0.001-0.1,
#: n <= 2000) keeps its exact literal-centroid plan, cached model,
#: and import-time-rendered k=8 oracle SQL.
KMEANS_CELL_TARGET = 1024


def kmeans_k_for(n: int) -> int:
    """Corpus-derived cluster count: hold expected cell size n/k near
    KMEANS_CELL_TARGET, never below the KMEANS_K floor. 500-2000-row
    certification corpora -> 8 (unchanged plans + oracles); sf1
    (20k) -> 19; sf10 (200k) -> 195."""
    return max(KMEANS_K, int(n) // KMEANS_CELL_TARGET)
#: fixed-point lattice: coordinates quantize to floor(x * 1e7) BEFORE
#: training, so every distance, comparison, and centroid update is
#: EXACT integer arithmetic. This is what makes distributed training
#: bit-reproducible: float formulations differ between engines at the
#: double->decimal boundary (Spark casts via the shortest decimal
#: repr + HALF_UP, DuckDB rounds the exact binary value — measured
#: 1-ulp-at-1e-10 disagreements), while floor() is computed on the
#: binary value identically everywhere. Squared diffs fit a long
#: (<= (8e7)^2 * 64 ~ 4e17); only the final inertia sum needs
#: DECIMAL(38,0).
KMEANS_SCALE = 10_000_000


#: single-entry memo, (application id, sf_dir) -> trained centroid
#: list [(cent_id, [int lattice coords])]. The Lloyd loop is
#: KMEANS_ITERS-1 collect rounds; `dedup_semantic_semdedup` (the
#: SemDeDup pruner) reuses the same trained model as
#: `ml_kmeans_embeddings`, so train once per (session, sf_dir) — the
#: _CODEBOOK_MEMO / _BPE_MEMO bounded-memo discipline (cleared on any
#: key miss; a new session or dir always retrains).
_KMEANS_MEMO: dict[tuple[str, str], list] = {}


def kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1e-7 fixed-point lattice view of the embeddings corpus:
    (vec_id, vq). Plain projection over the parquet scan — callers
    that iterate (the training loop) add their own checkpoint."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * KMEANS_SCALE).cast("long"),
        ).alias("vq"),
    )


def kmeans_cells_expr(cents: list) -> "F.Column":
    """The trained centroid table as a LITERAL array<struct<cent_id,
    cq>> column. k x d integers (8 x 64 here) inline fine as plan
    literals — and unlike the one-row-frame crossJoin form this keeps
    cell assignment a pure map-side projection, so parquet size
    statistics survive to downstream join planning (the one-row BNL
    node made every frame above it stats-blind, which silently forced
    the SemDeDup self-join into a sort-merge join on the 8-value cell
    key — 150 s at sf1 vs 16 s with stats intact)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cent_id"),
                F.array(*[F.lit(int(x)).cast("long") for x in cq]).alias("cq"),
            )
            for cid, cq in sorted(cents)
        ]
    )


def _kmeans_assign_udf(cents: list):
    """Arrow-batched exact-integer nearest-centroid assignment — the
    DERIVED-k twin of the literal-HOF path (kmeans_assign_frame picks
    per model size). At the KMEANS_K floor the k x d literal argmin is
    the right plan (pure projection, stats survive, whole-stage
    codegen); at a corpus-derived k (195 at sf10 with the shipped
    1024-row cell target) the same expression is k x d = ~12k inlined
    literals whose folds evaluate INTERPRETED per row — measured
    minutes per pass (A/B taken at an earlier 2048-row target, k=97;
    the literal count only grew since). Here the centroid matrix
    ships once inside the UDF closure and each Arrow batch does three
    int64 matrix ops: ||v||^2 + ||c||^2 - 2 v.c^T. Everything stays
    on the integer lattice (|coord| <= 8e7, so the dot term is
    <= 64 * 6.4e15 ~ 4.1e17 and the distance < 2e18 — inside int64),
    so the result is BIT-IDENTICAL to the HOF fold and to the DuckDB
    chain at any k: numpy int64 arithmetic is exact, and ties break to
    the lowest cent_id because the matrix rows are cent_id-ascending
    and argmin returns the first minimum (pytest-pinned equal to the
    driver-side exact-python argmin)."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    ordered = sorted(cents)
    ids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    C = np.array([cq for _, cq in ordered], dtype=np.int64)
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf(
        StructType(
            [
                StructField("dist", LongType()),
                StructField("cent_id", LongType()),
            ]
        )
    )
    def _assign(vq: pd.Series) -> pd.DataFrame:
        import numpy as np

        V = np.stack(vq.to_numpy()).astype(np.int64, copy=False)
        d = (V * V).sum(axis=1)[:, None] + c2[None, :] - 2 * (V @ C.T)
        first = d.argmin(axis=1)  # ties -> first = lowest cent_id
        rows = np.arange(len(first))
        return pd.DataFrame(
            {"dist": d[rows, first], "cent_id": ids[first]}
        )

    return _assign


def kmeans_assign_frame(
    e: DataFrame, cents: list, carry: tuple = ()
) -> DataFrame:
    """Nearest-centroid assignment over a (vec_id, vq, *carry) frame:
    adds (cell, dist) via array_min over struct(dist, cent_id) — exact
    integer distances, deterministic argmin. `carry` columns ride
    through untouched (dedup_semantic_semdedup carries v/vnorm so its
    corpus frame stays ONE projection chain — the stats-preserving
    shape its self-join needs). The argmin array is STAGED as its own
    projection so the 8 x 64 HOF distance folds evaluate once per row,
    not once per consumer (the CollapseProject discipline). Models
    wider than the KMEANS_K floor (corpus-derived k, r16) assign via
    the Arrow-batched exact-int64 twin instead — see
    _kmeans_assign_udf for why the literal plan stops being the right
    one there; both paths are pinned bit-identical."""
    if len(cents) > KMEANS_K:
        best = _kmeans_assign_udf(cents)(F.col("vq"))
    else:
        dist = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(F.col("vq"), c["cq"], lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        scored = F.transform(
            kmeans_cells_expr(cents),
            lambda c: F.struct(
                dist(c).alias("dist"), c["cent_id"].alias("cent_id")
            ),
        )
        best = F.array_min(scored)  # (dist asc, cent_id asc) head
    staged = e.select("vec_id", "vq", *carry, best.alias("_best"))
    return staged.select(
        "vec_id",
        "vq",
        *carry,
        F.col("_best")["cent_id"].alias("cell"),
        F.col("_best")["dist"].alias("dist"),
    )


#: bump when the Lloyd training loop's BEHAVIOR changes without any
#: hyperparameter moving (quantization, tie-breaks, seeding) — without
#: it a warm cache would silently serve the old model (r12 review)
KMEANS_CACHE_VERSION = 1


def _kmeans_cache_path(sf_dir: str, k: int = KMEANS_K) -> tuple[str, str]:
    """(cache file path, data fingerprint) for persisting the trained
    Lloyd model across sessions — catalog.model_cache_path with every
    training hyperparameter plus the training-code version in the
    fingerprint. Training is bit-deterministic, so an unchanged
    fingerprint means the persisted centroids ARE what retraining
    would produce; a regenerated corpus (or a version bump) misses and
    retrains. `k` is the corpus-derived cluster count (kmeans_k_for) —
    part of the key, so a big-SF model trained at the derived k can
    never be served where the floor applies (at the floor the key
    string is byte-identical to the pre-derivation one, keeping every
    certification-SF cache warm)."""
    from .catalog import model_cache_path

    return model_cache_path(
        sf_dir,
        "kmeans",
        "embeddings",
        f"{k}:{KMEANS_ITERS}:{KMEANS_SCALE}:v{KMEANS_CACHE_VERSION}",
        ext=".json",
    )


def kmeans_trained_centroids(spark: SparkSession, sf_dir: str) -> list:
    """Train (or reuse) the fixed-point Lloyd model; returns the
    centroid list [(cent_id, [d lattice ints])] — bounded model state
    (k x d integers). Reuse is two-level: the in-session _KMEANS_MEMO,
    then a per-(sf_dir, data fingerprint) JSON on local disk (r12,
    verdict item 4) so a FRESH session — the per-round sweep, the
    driver gate — pays one tiny metadata read instead of the ~9 s
    3-round Lloyd loop. Training is exact-integer deterministic, so
    the persisted model is bit-identical to retraining (pinned by
    tests/test_ml.py); any cache trouble falls through to training."""
    import json
    import os

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    hit = _KMEANS_MEMO.get(memo_key)
    if hit is not None:
        return hit
    _KMEANS_MEMO.clear()
    # derive k from the corpus size FIRST (one metadata-cheap count) —
    # it keys both the disk cache and the seed width (r16: the r15
    # verdict's one scale killer was the hardcoded k=8)
    k = kmeans_k_for(load_table(spark, sf_dir, "embeddings").count())
    cache_path = None
    try:
        cache_path, fp = _kmeans_cache_path(sf_dir, k)
        with open(cache_path) as fh:
            payload = json.load(fh)
        if payload.get("fp") == fp:
            cents = [(int(c), [int(x) for x in v]) for c, v in payload["cents"]]
            _KMEANS_MEMO[memo_key] = cents
            return cents
    except (OSError, ValueError, KeyError, TypeError):
        # TypeError: structurally corrupt payload under a matching fp
        # (e.g. "cents": 42) must also degrade to retraining
        pass
    # the training loop re-reads the quantized frame once per round —
    # a lazy localCheckpoint materializes it once (stats-blindness is
    # irrelevant here: every training consumer is a map-side explode
    # or a metadata-grain aggregation, never a planned join)
    e = kmeans_quantized(spark, sf_dir).localCheckpoint(eager=False)
    cents = [
        (int(r["vec_id"]), [int(x) for x in r["vq"]])
        for r in e.orderBy("vec_id").limit(k).collect()
    ]
    for _ in range(KMEANS_ITERS - 1):
        assigned = kmeans_assign_frame(e, cents)
        means = (
            assigned.select("cell", F.posexplode("vq").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                F.floor(F.sum("x").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("val")
            )
            .collect()
        )
        by_cell: dict[int, dict[int, int]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = int(r["val"])
        cents = [
            (
                cid,
                [by_cell[cid][d] for d in range(len(cq))] if cid in by_cell else cq,
            )
            for cid, cq in cents
        ]
    _KMEANS_MEMO[memo_key] = cents
    if cache_path is not None:
        try:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            tmp = f"{cache_path}.tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump({"fp": fp, "cents": cents}, fh)
            os.replace(tmp, cache_path)  # atomic vs concurrent sessions
        except OSError:
            pass
    return cents


def kmeans_final_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared k-means model surface: the final assignment frame
    (vec_id, vq, cell, dist) over the TRAINED model — one row per
    corpus vector, `cell` the seed vec_id of its nearest centroid,
    `dist` the exact integer squared lattice distance. A pure
    projection over the parquet scan (literal centroids, see
    kmeans_cells_expr) so downstream join planning keeps real size
    statistics. Consumers: ml_kmeans_embeddings (aggregates it to the
    cluster grain) and dedup_semantic_semdedup (uses `cell` as the
    cluster-bounded pair space). The DuckDB twin of this frame is
    `kmeans_chain_sql()`'s terminal a{KMEANS_ITERS} CTE."""
    cents = kmeans_trained_centroids(spark, sf_dir)
    return kmeans_assign_frame(kmeans_quantized(spark, sf_dir), cents)


def ml_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means TRAINING over the embeddings table, fully
    oracle-checked: corpus-derived k (kmeans_k_for; the KMEANS_K=8
    floor at every certification SF) seeded from the k lowest
    vec_ids, 3 Lloyd iterations on
    1e-7 fixed-point coordinates (see KMEANS_SCALE — the quantization
    is what makes the whole training run bit-reproducible across
    engines, partition layouts, and replays).

    Per round: every vector picks its nearest centroid MAP-SIDE via
    array_min over struct(dist, cent_id) against the LITERAL centroid
    table (kmeans_cells_expr — k x d integers inline in the plan, so
    assignment is a pure projection and size statistics survive for
    downstream join planning) — dist is an exact integer fold, so the
    argmin is deterministic; the centroid update is a (cell, dim)
    posexplode aggregation whose floor(sum/count) mean stays on the
    lattice. Empty clusters retain their previous centroid.

    Centroids are MODEL STATE: O(k x d) values collected per round and
    re-inlined (the sim_topk_ivf codebook pattern — the corpus never
    shuffles; each Lloyd round is one scan + one metadata-grain
    aggregation). The DuckDB oracle unrolls the same 3 rounds as
    chained CTEs over the same integers, so cluster sizes AND the exact
    integer inertia hash-match. Training loop + final assignment frame
    live in `kmeans_trained_centroids` / `kmeans_final_assignments`
    (shared with the SemDeDup pruner, llm/dedup.py).

    Output: one row per cluster — seed id, member count, exact int64 inertia
    in squared lattice units (divide by 1e14 for float units)."""
    final = kmeans_final_assignments(spark, sf_dir)
    return (
        final.groupBy(F.col("cell").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist").alias("inertia_q"),
        )
        .orderBy("cluster_id")
    )


def kmeans_chain_sql(k: int = KMEANS_K) -> str:
    """The shared DuckDB WITH chain of the fixed-point Lloyd model
    (quant, c0, per-round a{i}/m{i}/c{i}) ending with the terminal
    assignment CTE a{KMEANS_ITERS} (vec_id, vq, cell, dist) — the
    oracle twin of `kmeans_final_assignments`. Used by both the
    ml_kmeans_embeddings oracle (aggregates it) and the
    dedup_semantic_semdedup oracle (pairs within its cells). `k`
    parameterizes the seed width: registered oracles render at the
    KMEANS_K floor (exactly the derived k at every certification SF);
    tests render at a forced larger k to pin that the lattice chain
    stays engine-reproducible at ANY k (the r16 derived-k honesty
    check)."""
    q = (
        "list_transform(embedding::DOUBLE[], "
        f"x -> CAST(FLOOR(x * {KMEANS_SCALE}) AS BIGINT))"
    )
    dist = (
        "CAST(list_sum(list_transform(list_zip(e.vq, c.cq), "
        "s -> (s[1]-s[2])*(s[1]-s[2]))) AS BIGINT)"
    )

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, vq, cell, dist FROM (
    SELECT e.vec_id, e.vq, c.cent_id AS cell, {dist} AS dist,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id ORDER BY {dist} ASC, c.cent_id ASC
           ) AS rk
    FROM quant e CROSS JOIN {cents} c
  ) WHERE rk = 1
)"""

    def update_cte(mname: str, cname: str, assigned: str, prev: str) -> str:
        return f"""{mname} AS (
  SELECT cell AS cent_id, dim,
         CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val
  FROM (
    SELECT cell, g.i - 1 AS dim, vq[g.i] AS x
    FROM {assigned}, (SELECT unnest(generate_series(1, 64)) AS i) g
  ) GROUP BY cell, dim
), {cname} AS (
  SELECT p.cent_id, COALESCE(n.cq, p.cq) AS cq
  FROM {prev} p LEFT JOIN (
    SELECT cent_id, list(val ORDER BY dim) AS cq FROM {mname} GROUP BY cent_id
  ) n USING (cent_id)
)"""

    parts = [
        f"quant AS (SELECT vec_id, {q} AS vq FROM embeddings)",
        f"""c0 AS (
  SELECT vec_id AS cent_id, vq AS cq
  FROM quant ORDER BY vec_id LIMIT {k}
)""",
    ]
    for i in range(1, KMEANS_ITERS):
        parts.append(assign_cte(f"a{i}", f"c{i - 1}"))
        parts.append(update_cte(f"m{i}", f"c{i}", f"a{i}", f"c{i - 1}"))
    parts.append(assign_cte(f"a{KMEANS_ITERS}", f"c{KMEANS_ITERS - 1}"))
    return f"WITH {', '.join(parts)}"


def _kmeans_sql() -> str:
    return f"""
{kmeans_chain_sql()}
SELECT cell AS cluster_id, COUNT(*) AS n_members,
       CAST(SUM(dist) AS BIGINT) AS inertia_q
FROM a{KMEANS_ITERS} GROUP BY cell ORDER BY cluster_id
"""


QUERIES["ml_kmeans_embeddings"] = ml_kmeans_embeddings
ORACLES["ml_kmeans_embeddings"] = _kmeans_sql()


#: logistic-regression GD configuration: 4 features (embedding dims
#: 0-3), binary target label>=5, fixed 3 full-batch iterations,
#: lr=0.5, weights on a 1e-8 integer lattice. The sigmoid is the
#: RATIONAL approximation s(z) = 0.5 + z/(2(1+|z|)) — same monotone
#: S-shape, but pure +,*,/,abs arithmetic, which IEEE-754 fixes
#: bit-for-bit on both engines; exp() carries no such guarantee, so a
#: true-logistic loss could never be hash-checked. Per-row gradient
#: contributions floor-quantize to the lattice BEFORE summing (longs,
#: summed in DECIMAL(38,0)), so the whole optimizer state is exact
#: integer arithmetic between iterations — the k-means discipline
#: applied to gradient descent.
LOGREG_ITERS = 3
LOGREG_FEATS = 4
LOGREG_SCALE = 100_000_000


def _lg_z(n_feats: int = LOGREG_FEATS) -> str:
    """z = w.x as left-associated shared expression text (identical
    parse on Spark SQL and DuckDB, so identical IEEE evaluation).
    Parameterized by feature count since r11 — text_quality_classifier
    reuses the whole lattice-GD machinery at 8 hashed-bigram features."""
    t = f"(CAST(wbq AS DOUBLE) / {LOGREG_SCALE}.0)"
    for j in range(n_feats):
        t = f"({t} + (CAST(w{j}q AS DOUBLE) / {LOGREG_SCALE}.0) * x{j})"
    return t


def _lg_err(n_feats: int = LOGREG_FEATS) -> str:
    z = _lg_z(n_feats)
    return f"((0.5 + {z} / (2.0 * (1.0 + ABS({z})))) - CAST(y AS DOUBLE))"


def _lg_grad_pairs(n_feats: int = LOGREG_FEATS) -> list[tuple[str, str]]:
    """(expression, name) for each lattice-quantized gradient column."""
    err = _lg_err(n_feats)
    pairs = [(f"CAST(FLOOR({err} * {LOGREG_SCALE}.0) AS BIGINT)", "gqb")]
    for j in range(n_feats):
        pairs.append(
            (f"CAST(FLOOR({err} * x{j} * {LOGREG_SCALE}.0) AS BIGINT)", f"gq{j}")
        )
    return pairs


def _lg_update_pairs(n_feats: int = LOGREG_FEATS) -> list[tuple[str, str]]:
    """(expression, weight column) for each lattice weight update."""

    def upd(w, g):
        return (
            f"CAST({w} - FLOOR((0.5 * CAST({g} AS DOUBLE)) / CAST(n AS DOUBLE))"
            f" AS BIGINT)"
        )

    return [(upd("wbq", "sgqb"), "wbq")] + [
        (upd(f"w{j}q", f"sgq{j}"), f"w{j}q") for j in range(n_feats)
    ]


def _lg_update_cols(n_feats: int = LOGREG_FEATS) -> list[str]:
    return [f"{e} AS {w}" for e, w in _lg_update_pairs(n_feats)]


def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING by full-batch gradient
    descent, fully oracle-checked: predict (label >= 5) from embedding
    dims 0-3, 3 unrolled iterations. Each iteration is the canonical
    distributed-GD shape — the one-row weight frame broadcast-joins the
    feature scan, per-row lattice-quantized gradient contributions
    reduce in ONE map-side-combinable aggregation, and the weight
    update is a projection over the one-row sums. No collect (the
    optimizer state never leaves the plan), no UDF; at 100 TB each
    iteration costs one feature-scan + a 5-long reduce.

    Every z/sigmoid/gradient/update expression is built from the SAME
    text on the Spark and DuckDB sides (rational sigmoid, floor-lattice
    gradients — see LOGREG_* constants), so the trained weights and the
    training-set confusion counts hash-match bit-for-bit. Output: n,
    n_pos, n_correct and the quantized weights."""
    e = load_table(spark, sf_dir, "embeddings")
    feats = e.select(
        (F.col("label") >= 5).cast("int").alias("y"),
        *[
            F.element_at(F.col("embedding").cast("array<double>"), j + 1).alias(
                f"x{j}"
            )
            for j in range(LOGREG_FEATS)
        ],
    )
    return _lg_train_score(spark, feats, LOGREG_FEATS)


#: (applicationId, n_feats) -> the full set of name-parameterized
#: Column lists the lattice-GD loop uses. The loop's expressions are
#: identical across iterations AND across query calls (they reference
#: only fixed column names), but the old selectExpr form re-parsed
#: ~900-char strings once per iteration per call, and a naive
#: per-Column rebuild is worse still: cProfile showed 3,813 py4j
#: round trips = 1.7 s per classifier construction, nearly all of it
#: Column creation. Unresolved Columns are immutable trees the
#: analyzer resolves per plan, so whole LISTS of them are reusable —
#: one build per session (the similarity._memo_col discipline, guide
#: §7.3 driver-side latency), keyed by applicationId so a new session
#: rebuilds.
_LG_COLS_MEMO: dict[tuple[str | None, int], dict] = {}


def _lg_cols(n_feats: int) -> dict:
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    app = s.sparkContext.applicationId if s is not None else None
    k = (app, n_feats)
    hit = _LG_COLS_MEMO.get(k)
    if hit is None:
        if len(_LG_COLS_MEMO) >= 64:
            _LG_COLS_MEMO.clear()  # bound stale-session entries
        wcols = ["wbq"] + [f"w{j}q" for j in range(n_feats)]
        z = _lg_z(n_feats)
        grad_pairs = _lg_grad_pairs(n_feats)
        hit = _LG_COLS_MEMO[k] = {
            "w": [F.col(c) for c in wcols],
            "zero_w": [F.lit(0).cast("long").alias(c) for c in wcols],
            "grad": [F.expr(e).alias(nm) for e, nm in grad_pairs],
            "agg": [
                F.count(F.lit(1)).cast("long").alias("n"),
                *[
                    F.sum(F.col(nm).cast("decimal(38,0)")).alias(f"s{nm}")
                    for _, nm in grad_pairs
                ],
                *[F.min(c).alias(c) for c in wcols],
            ],
            "upd": [
                F.col("n"),
                *[F.expr(e).alias(c) for e, c in _lg_update_pairs(n_feats)],
            ],
            "score": [
                F.col("y"),
                *[F.col(c) for c in wcols],
                F.expr(
                    f"CASE WHEN ({z} > 0.0) = (y = 1) THEN 1 ELSE 0 END"
                ).alias("ok"),
            ],
            "score_agg": [
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("y").cast("long").alias("n_pos"),
                F.sum("ok").cast("long").alias("n_correct"),
                *[F.min(c).alias(c) for c in wcols],
            ],
            "filter_out": [
                F.col("doc_id"),
                F.col("y"),
                F.expr(
                    f"ROUND((0.5 + {z} / (2.0 * (1.0 + ABS({z})))), 6)"
                ).alias("quality_score"),
                F.expr(f"CAST(({z}) > 0.0 AS INT)").alias("keep"),
            ],
        }
    return hit


def _lg_train(
    spark: SparkSession, feats: DataFrame, n_feats: int, iters: int = LOGREG_ITERS
) -> tuple[DataFrame, DataFrame]:
    """The shared lattice-GD training loop over a (y, x0..x{n-1})
    frame: each iteration broadcast-joins the one-row weight frame to
    the (lazily checkpointed, so computed once) feature scan, reduces
    lattice-quantized gradient longs map-side-combinably, and projects
    the weight update. Returns (checkpointed feats, one-row trained
    weight frame). No collect — optimizer state never leaves the
    plan.

    r18: iteration 1's weight frame is all zeros BY CONSTRUCTION, so
    it rides as literal columns instead of a broadcast one-row frame —
    one less BroadcastExchange + nested-loop join per entry, and the
    optimizer constant-folds the zero terms out of the first
    iteration's gradient (identical arithmetic: the expressions read
    the same zero longs either way)."""
    feats = feats.localCheckpoint(eager=False)  # shared by all iterations
    cols = _lg_cols(n_feats)
    w: DataFrame | None = None  # None = the all-zero init, as literals
    for _ in range(iters):
        if w is None:
            base = feats.select("*", *cols["zero_w"])
        else:
            base = feats.crossJoin(F.broadcast(w))
        g = base.select(*cols["w"], *cols["grad"]).agg(*cols["agg"])
        w = g.select(*cols["upd"])
    return feats, w


def _lg_train_score(
    spark: SparkSession, feats: DataFrame, n_feats: int, iters: int = LOGREG_ITERS
) -> DataFrame:
    """`_lg_train` plus the final training-set scoring pass."""
    feats, w = _lg_train(spark, feats, n_feats, iters)
    cols = _lg_cols(n_feats)
    score = (
        feats.crossJoin(F.broadcast(w))
        .select(*cols["score"])
        .agg(*cols["score_agg"])
    )
    return score


def _lg_chain_parts(
    feats_ctes: str, n_feats: int, iters: int = LOGREG_ITERS
) -> list[str]:
    """DuckDB mirror of `_lg_train` over any CTE chain whose last CTE
    is `feats AS (... y, x0..x{n-1} ...)` — iteration CTEs are unrolled
    with the SAME expression text as the Spark side; the trained
    weights end in `w{iters}`. `MATERIALIZED` on feats per the repo's
    recursive-reference rule (each of the {iters}+1 stages
    re-references it; naive inlining re-evaluates the chain per
    stage)."""
    wcols = ["wbq"] + [f"w{j}q" for j in range(n_feats)]
    parts = [
        feats_ctes,
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS {c}" for c in wcols)
        + ")",
    ]
    for it in range(1, iters + 1):
        gsel = ", ".join(
            f"SUM(CAST({expr} AS DECIMAL(38,0))) AS s{name}"
            for expr, name in _lg_grad_pairs(n_feats)
        )
        wmin = ", ".join(f"MIN({c}) AS {c}" for c in wcols)
        parts.append(
            f"g{it} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, {gsel}, {wmin} "
            f"FROM feats CROSS JOIN w{it - 1})"
        )
        parts.append(
            f"w{it} AS (SELECT n, "
            + ", ".join(_lg_update_cols(n_feats))
            + f" FROM g{it})"
        )
    return parts


def _lg_chain_sql(
    feats_ctes: str, n_feats: int, iters: int = LOGREG_ITERS
) -> str:
    """`_lg_chain_parts` + the training-set scoring tail (the
    `_lg_train_score` mirror)."""
    wcols = ["wbq"] + [f"w{j}q" for j in range(n_feats)]
    parts = _lg_chain_parts(feats_ctes, n_feats, iters)
    return f"""
WITH {', '.join(parts)}
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN ({_lg_z(n_feats)} > 0.0) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       {', '.join(f'MIN({c}) AS {c}' for c in wcols)}
FROM feats CROSS JOIN w{iters}
"""


def _logreg_sql() -> str:
    feat_cols = ", ".join(
        f"CAST(embedding[{j + 1}] AS DOUBLE) AS x{j}" for j in range(LOGREG_FEATS)
    )
    feats = (
        "feats AS MATERIALIZED (SELECT CAST(label >= 5 AS INT) AS y, "
        f"{feat_cols} FROM embeddings)"
    )
    return _lg_chain_sql(feats, LOGREG_FEATS)


QUERIES["ml_logreg_gd"] = ml_logreg_gd
ORACLES["ml_logreg_gd"] = _logreg_sql()


# ---------------------------------------------------------------------------
# Trained text-quality classifier: hashed-bigram features -> lattice GD
# (the fastText/DCLM-style linear quality filter — CCNet gates on a
# trained LM, DCLM/RefinedWeb on a linear classifier over hashed
# n-grams; this is that verb on the repo's exact-arithmetic GD)

#: hashed-bigram classifier configuration: token bigrams hashed into
#: TQC_BUCKETS buckets (the fastText hashing trick — the bucket count
#: is the model-width knob: production uses 2^20, the oracle-unrolled
#: twin 8; the plan shape is identical, the weight row is always a
#: one-row broadcast). The training label is the DISTILLATION shape
#: DCLM/CCNet actually use — a teacher signal computed in-plan, here
#: the stopword-ratio heuristic (stopword tokens >= 1/TQC_STOP_DEN of
#: all tokens; ~48% positive on the synthetic corpus, so the prior is
#: uninformative): the classifier learns to mimic a quality signal
#: from content features alone, which is what lets production score
#: documents the teacher never saw.
TQC_BUCKETS = 8
TQC_STOP_DEN = 16
TQC_STOPWORDS = ("a", "the")


def _tqc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x0..x7) training frame via ONE Arrow pass (the
    text_entropy_scores precedent, A/B'd in BASELINE §21): each
    documents row holds its whole document, so bigram bucket counts,
    the stopword label, and the L1 normalization come out map-side
    COMPLETE — zero shuffle, no bigram explode. Python's hashlib md5
    is bit-identical to JVM/DuckDB md5 over the same UTF-8 bytes and
    int(hex[:15], 16) % D == conv(substr(md5, 1, 15), 16, 10) % D, so
    the buckets match the oracle exactly (dedup_simhash convention; a
    production run swaps xxhash64 back in for throughput). The
    all-native explode twin (`_tqc_features_native` — bigram explode ->
    md5-bucket -> doc-grain pivot groupBy, measured 5.4x slower at sf1)
    is pytest-pinned row-equal. Docs with fewer than two tokens carry
    no bigram evidence and are excluded from training on both engines;
    the narrow (doc_id, text) frame is repartitioned to default
    parallelism first (the decode_resize lesson: the bench parquet
    opens as 2 splits)."""
    from .catalog import widen_if_narrow

    # min_bytes=0: a Python md5 per bigram is heavy per input byte
    d = widen_if_narrow(
        spark,
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        min_bytes=0,
    )

    def batches(it):
        # closure, not a module function (executor sys.path rule)
        import hashlib

        import pandas as _pd

        D = TQC_BUCKETS
        DEN = TQC_STOP_DEN
        STOP = set(TQC_STOPWORDS)

        for pdf in it:
            out_doc: list = []
            out_y: list = []
            cols: list = [[] for _ in range(D)]
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL/empty text drops the row, matching the native
                # explode twin and the DuckDB oracle (textstats
                # count_batches convention; r11 ADVICE)
                if not text:
                    continue
                ts = text.split(" ")
                if len(ts) < 2:
                    continue
                stop = sum(1 for t in ts if t in STOP)
                cnt = [0] * D
                prev = ts[0]
                for k in range(1, len(ts)):
                    b = prev + " " + ts[k]
                    cnt[
                        int(hashlib.md5(b.encode()).hexdigest()[:15], 16) % D
                    ] += 1
                    prev = ts[k]
                nb = len(ts) - 1
                out_doc.append(doc_id)
                out_y.append(1 if stop * DEN >= len(ts) else 0)
                for j in range(D):
                    cols[j].append(cnt[j] / nb)
            data = {
                "doc_id": _pd.Series(out_doc, dtype="int64"),
                "y": _pd.Series(out_y, dtype="int32"),
            }
            for j in range(D):
                data[f"x{j}"] = _pd.Series(cols[j], dtype="float64")
            yield _pd.DataFrame(data)

    schema = "doc_id long, y int, " + ", ".join(
        f"x{j} double" for j in range(TQC_BUCKETS)
    )
    return d.mapInPandas(batches, schema=schema)


def _tqc_features_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-native explode twin of `_tqc_features`: bigram explode
    -> md5-bucket -> per-doc bucket-count pivot (ONE doc_id-grain
    groupBy with map-side combine) -> L1-normalized bucket frequencies.
    Kept unregistered as the zero-Python reference implementation
    (image_resize_native convention) and pytest-pinned row-equal to
    the Arrow pass; 5.4x slower at sf1 (6.0 vs 1.1 s), which is why it is not the
    registered path."""
    from .functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    stop_set = list(TQC_STOPWORDS)
    toked = (
        d.select("doc_id", tokens(F.col("text")).alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            (
                F.size(F.filter(F.col("ts"), lambda t: t.isin(stop_set)))
                * TQC_STOP_DEN
                >= F.size("ts")
            )
            .cast("int")
            .alias("y"),
            "ts",
        )
    )
    # bind the token array ONCE through the 1-element-array HOF wrapper
    # (the shingles() lesson: a raw split referenced inside the index
    # lambda re-evaluates per bigram index)
    bg = toked.select(
        "doc_id",
        "y",
        F.explode(
            F.get(
                F.transform(
                    F.array(F.col("ts")),
                    lambda ts: F.transform(
                        F.sequence(F.lit(1), F.size(ts) - 1),
                        lambda i: F.array_join(F.slice(ts, i, 2), " "),
                    ),
                ),
                F.lit(0),
            )
        ).alias("b"),
    )
    bk = bg.select(
        "doc_id",
        "y",
        F.pmod(
            F.conv(F.substring(F.md5("b"), 1, 15), 16, 10).cast("long"),
            F.lit(TQC_BUCKETS),
        ).alias("j"),
    )
    cnt = bk.groupBy("doc_id", "y").agg(
        F.count(F.lit(1)).alias("nb"),
        *[
            F.sum((F.col("j") == j).cast("int")).alias(f"c{j}")
            for j in range(TQC_BUCKETS)
        ],
    )
    return cnt.select(
        "doc_id",
        "y",
        *[
            (F.col(f"c{j}").cast("double") / F.col("nb").cast("double")).alias(
                f"x{j}"
            )
            for j in range(TQC_BUCKETS)
        ],
    )


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED model-based quality filter (r10 verdict item 2 — the one
    missing LLM-curation verb): hashed token-bigram bag features, L1
    normalized, through the shared exact-lattice logistic-GD loop
    (`_lg_train_score`: rational sigmoid, floor-quantized gradient
    longs, identical expression text on both engines), trained to mimic
    the in-plan stopword-ratio teacher label (the DCLM/CCNet
    distillation shape). Output: training-set size, positives, correct
    count, and the quantized weights — all hash-checked bit-for-bit
    against the fully unrolled DuckDB chain.

    Honest learnability note: the synthetic corpus draws every token
    i.i.d. from one ~30-word vocabulary, so the 8-bucket hashed
    features carry only a weak trace of the teacher signal (measured
    OLS ceiling 62% vs 52% majority at sf0.01) and 3 lattice-GD
    iterations converge near the prior — what this entry certifies is
    the exact distributed TRAINING loop;
    tests/test_ml.py::test_quality_classifier_learns_separable_corpus
    proves the same machinery trains to >=95% on a corpus where the
    classes actually separate.

    Scale design: feature extraction is one scan + one doc-grain
    combinable groupBy; each GD iteration re-reads the lazily
    checkpointed feature frame (computed once), broadcast-joins the
    one-row weight frame, and reduces ~(TQC_BUCKETS+2) longs. At 100 TB
    nothing grows but the scan: no collect, no window, no pair space.
    Map-side scoring of a production corpus is the final-pass
    projection with the trained weight row broadcast. Reference parity:
    none — driver-contract Part C LLM-curation family."""
    return _lg_train_score(spark, _tqc_features(spark, sf_dir), TQC_BUCKETS)


def _tqc_feats_ctes() -> str:
    """The tok/bg/bk/cnt/feats CTE chain shared by the classifier
    (training) and filter (scoring) oracles."""
    bucket = f"CAST(('0x' || substr(md5(b), 1, 15)) AS BIGINT) % {TQC_BUCKETS}"
    csel = ", ".join(
        f"SUM(CASE WHEN j = {j} THEN 1 ELSE 0 END) AS c{j}"
        for j in range(TQC_BUCKETS)
    )
    xsel = ", ".join(
        f"CAST(c{j} AS DOUBLE) / CAST(nb AS DOUBLE) AS x{j}"
        for j in range(TQC_BUCKETS)
    )
    stop_in = ", ".join(f"'{s}'" for s in TQC_STOPWORDS)
    feats = f"""tok AS (
  SELECT doc_id,
         CAST(len(list_filter(ts, t -> t IN ({stop_in}))) * {TQC_STOP_DEN}
              >= len(ts) AS INT) AS y,
         ts
  FROM (SELECT doc_id, split(text, ' ') AS ts FROM documents)
  WHERE len(ts) >= 2
), bg AS (
  SELECT doc_id, y, array_to_string(ts[i:i+1], ' ') AS b
  FROM tok, (
    SELECT unnest(generate_series(1, (SELECT COALESCE(MAX(len(ts)), 1) FROM tok))) AS i
  ) g
  WHERE len(ts) >= 2 AND i <= len(ts) - 1
), bk AS (
  SELECT doc_id, y, {bucket} AS j FROM bg
), cnt AS (
  SELECT doc_id, y, COUNT(*) AS nb, {csel} FROM bk GROUP BY doc_id, y
), feats AS MATERIALIZED (
  SELECT doc_id, y, {xsel} FROM cnt
)"""
    return feats


def _tqc_sql() -> str:
    return _lg_chain_sql(_tqc_feats_ctes(), TQC_BUCKETS)


QUERIES["text_quality_classifier"] = text_quality_classifier
ORACLES["text_quality_classifier"] = _tqc_sql()


def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCORING half of the trained quality gate (train -> score ->
    filter is how DCLM/RefinedWeb corpora are actually built): run the
    same in-plan training as text_quality_classifier, then broadcast
    the one-row trained weight frame onto the per-doc feature stream
    and emit every document's rational-sigmoid quality score plus its
    keep decision (z > 0). Map-side scoring — the weight row is model
    state in-plan, never collected; at 100 TB scoring is one pass over
    the feature frame (itself one scan + one doc-grain groupBy).
    z and the sigmoid are the SAME expression text both engines, so
    the per-doc scores hash-match bit-for-bit (positive scores:
    Spark HALF_UP round == DuckDB half-away-from-zero).
    Reference parity: none — driver-contract Part C curation family."""
    feats, w = _lg_train(spark, _tqc_features(spark, sf_dir), TQC_BUCKETS)
    return feats.crossJoin(F.broadcast(w)).select(
        *_lg_cols(TQC_BUCKETS)["filter_out"]
    )


def _tqc_filter_sql() -> str:
    z = _lg_z(TQC_BUCKETS)
    parts = _lg_chain_parts(_tqc_feats_ctes(), TQC_BUCKETS)
    return f"""
WITH {', '.join(parts)}
SELECT doc_id, y,
       ROUND((0.5 + {z} / (2.0 * (1.0 + ABS({z})))), 6) AS quality_score,
       CAST(({z}) > 0.0 AS INT) AS keep
FROM feats CROSS JOIN w{LOGREG_ITERS}
"""


QUERIES["text_quality_filter"] = text_quality_filter
ORACLES["text_quality_filter"] = _tqc_filter_sql()


# ---------------------------------------------------------------------------
# PCA over the embedding corpus: distributed covariance, driver eigh


def _embedding_covariance(spark: SparkSession, sf_dir: str):
    """Distributed covariance of the (64-dim) embedding corpus: one
    Arrow `mapInPandas` pass emits float BLAS partial sums (sum x,
    X^T X, n) per batch — d + d^2 + 1 numbers each — and the driver
    folds the partials (at 100 TB the collect carries
    O(batches x d^2) model state, never rows; the IVF-codebook
    discipline). Float partials mean the eigh inputs are reproducible
    only up to partition layout (~1e-12 — the downstream projection
    rounds at 1e-6, far above it), not bitwise order-independent; the
    earlier exact-decimal explode + position-grain groupBy form had
    that property but measured 12.5 s vs 0.5 s at sf0.1, and the entry
    is rows-only-by-design either way. Returns (mean, cov, n) as
    numpy."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x")
    )
    d = 64

    def partials(batches):
        # X^T X per Arrow batch via BLAS — the treeAggregate-of-outer-
        # products shape every distributed PCA uses. One partial row
        # per batch: d + d^2 + 1 numbers, so the driver collects
        # O(batches x d^2) model state, never rows. (A first cut
        # exploded the 4096-element outer product per ROW into a
        # position-grain groupBy: exact but measured 12.5 s at sf0.1
        # vs 0.5 s for this shape — same eigh inputs to ~1e-12.)
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            X = _np.vstack(pdf["x"].to_numpy())
            yield _pd.DataFrame(
                {
                    "sx": [X.sum(axis=0).tolist()],
                    "sxx": [(X.T @ X).ravel().tolist()],
                    "n": [len(X)],
                }
            )

    rows = e.mapInPandas(
        partials, "sx array<double>, sxx array<double>, n long"
    ).collect()
    n = sum(r["n"] for r in rows)
    sx = np.sum([np.array(r["sx"]) for r in rows], axis=0)
    sxx = np.sum([np.array(r["sxx"]).reshape(d, d) for r in rows], axis=0)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    return mean, cov, n


PCA_COMPONENTS = 2


def ml_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dimensionality reduction over the embedding corpus — the
    missing piece between quantization and ANN in the vector toolkit
    (visualization, whitening, cheap pre-ANN reduction). Covariance is
    computed distributed (see _embedding_covariance); the 64x64 eigh
    runs driver-side on model-state-sized input and the top-k
    components broadcast back as literals; projection is a map-side
    higher-order dot product per component. Scores are rounded for
    stability; component sign is fixed (largest-|loading| coordinate
    made positive) so the output is deterministic — eigenvectors are
    only defined up to sign.

    No SQL oracle (eigendecomposition is not SQL-expressible): driver
    records rows-only; tests/test_ml-side pins variance ordering,
    numpy-projection equality, and reconstruction-error bounds."""
    import numpy as np

    mean, cov, _ = _embedding_covariance(spark, sf_dir)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:PCA_COMPONENTS]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        j = int(np.argmax(np.abs(c)))
        comps.append(c if c[j] >= 0 else -c)
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    marr = F.array(*[F.lit(float(x)) for x in mean])
    # STAGE the mean-centered vector once: inlining the centering
    # zip_with into each component's dot re-evaluates it per component
    # (the CollapseProject pathology — caught by the round-10
    # re-inlining guard); a named column is single-evaluation because
    # CollapseProject won't inline a non-cheap producer into multiple
    # consumers
    staged = e.select(
        "vec_id",
        "label",
        F.zip_with(v, marr, lambda x, m: x - m).alias("_cv"),
    )
    cols = [F.col("vec_id"), F.col("label")]
    for k, c in enumerate(comps):
        carr = F.array(*[F.lit(float(x)) for x in c])
        centered_dot = F.aggregate(
            F.zip_with(F.col("_cv"), carr, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        cols.append(F.round(centered_dot, 6).alias(f"pc{k + 1}"))
    return staged.select(*cols)


QUERIES["ml_pca_embeddings"] = ml_pca_embeddings
# no ORACLES entry: eigendecomposition is not SQL-expressible (driver
# records rows-only; pytest pins the numpy twin exactly)
