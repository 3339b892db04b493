"""Similarity search over embedding columns (driver-contract extension).

Two paths:
- brute-force top-k: broadcast the (bounded) query set against the full
  corpus — correct baseline, O(queries x corpus); used as the oracle.
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; the
  search only scans the query's bucket — the 100 TB path (recall < 1,
  so rows-only checked; pytest measures recall against brute force).

Cosine is the decimal-exact formulation from functions/vector.py, so
brute-force results hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import as_double_array, cosine, sql_cosine

TOP_K = 10
#: bucket count must track corpus density: 2^6 = 64 buckets keeps
#: dozens of candidates per bucket at test scale; at 100 TB you raise
#: this (and/or use multi-probe) so buckets stay ~constant-sized
N_HYPERPLANES = 6


def _queries_and_corpus(spark, sf_dir):
    """Corpus + query set with PRE-COMPUTED norms: one norm per vector
    instead of two per scored pair (3x fewer decimal aggregates in the
    pair loop — measured 6.5s -> ~2s at sf0.1)."""
    from ..functions.vector import norm

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("vnorm", norm(F.col("v")))
    queries = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vnorm").alias("qnorm"),
    )
    return queries, corpus


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for every 100th vector.

    The query set is 1% of the corpus — broadcast it; the scan over the
    corpus stays partition-parallel with no shuffle until the final
    per-query top-k (window over query_id).

    Two-phase scoring: all pairs are ranked by the cheap IEEE-double
    cosine first and only the fast top (K + 20) per query pay the
    order-independent decimal cosine the oracle needs, then re-rank
    exactly. Fast and exact scores differ by ~1e-13 relative, so a true
    top-10 member could be excluded only if 20+ rivals sat within that
    sliver above it — far beyond the corpus's score spacing (and the
    oracle gate would catch it)."""
    from ..functions.vector import dot_dec, dot_double

    queries, corpus = _queries_and_corpus(spark, sf_dir)
    denom = F.col("qnorm") * F.col("vnorm")
    scored_fast = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_fast", dot_double(F.col("qv"), F.col("v")) / denom)
    )
    w_fast = Window.partitionBy("query_id").orderBy(
        F.col("cos_fast").desc(), F.col("vec_id").asc()
    )
    cand = (
        scored_fast.withColumn("rk_fast", F.row_number().over(w_fast))
        .filter(F.col("rk_fast") <= TOP_K + 20)
    )
    exact = cand.withColumn(
        "cos_sim", dot_dec(F.col("qv"), F.col("v")).cast("double") / denom
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


SIM_TOPK_SQL = f"""
SELECT query_id, rank, neighbor_id, cos_sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({sql_cosine('q.embedding', 'c.embedding')}, 6) AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {sql_cosine('q.embedding', 'c.embedding')} DESC, c.vec_id ASC
         ) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id % 100 = 0
) WHERE rank <= {TOP_K}
"""


def _hyperplanes(n_planes: int = N_HYPERPLANES) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed, ±1 entries) — the
    same matrix on every executor via literal folding, no broadcast var
    needed at this size. Rows are seed-stable prefixes: asking for more
    planes extends the matrix without changing the first rows."""
    rng = np.random.RandomState(42)
    return (rng.randint(0, 2, size=(n_planes, 64)) * 2 - 1).tolist()


def band_signature(vec_col: Column, n_bands: int, bits_per_band: int) -> Column:
    """array<long> of ``n_bands`` packed band buckets built from the
    sign bits of random-hyperplane projections (native exprs, no UDF).

    Band ``i`` packs bits ``[i*bits_per_band, (i+1)*bits_per_band)``
    MSB-first — with ``n_bands=1`` this is exactly the single-bucket id
    `sim_topk_lsh` hashes on. Callers calibrate (n_bands,
    bits_per_band) to their similarity threshold: the probability two
    vectors at angle θ agree on one bit is 1 - θ/π, on one band that
    to the bits_per_band power, and a pair survives candidate
    generation unless it misses ALL bands."""
    planes = _hyperplanes(n_bands * bits_per_band)
    bits = []
    for plane in planes:
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)))
    keys = []
    for i in range(n_bands):
        key = F.lit(0).cast("long")
        for j in range(bits_per_band):
            key = key * 2 + bits[i * bits_per_band + j]
        keys.append(key)
    return F.array(*keys)


def _bucket_expr(vec_col: Column) -> Column:
    """Pack sign(v . h_j) bits into an int bucket id (native exprs)."""
    return F.element_at(band_signature(vec_col, 1, N_HYPERPLANES), 1)


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH: score only same-bucket
    candidates. Sub-linear scan at scale; recall measured in tests
    against brute force (rows-only driver check)."""
    queries, corpus = _queries_and_corpus(spark, sf_dir)
    corpus_b = corpus.withColumn("bucket", _bucket_expr(F.col("v")))
    queries_b = queries.withColumn("qbucket", _bucket_expr(F.col("qv")))
    from ..functions.vector import dot_dec

    scored = (
        corpus_b.join(
            F.broadcast(queries_b),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cos_sim",
            dot_dec(F.col("qv"), F.col("v")).cast("double")
            / (F.col("qnorm") * F.col("vnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norms — aggregation over array columns via
    elementwise decimal sums (posexplode + groupBy: the distributed
    reduction that IVF-style indexes build on)."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode(as_double_array(F.col("embedding"))).alias("dim", "x")
    )
    return (
        comp.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("x").cast("decimal(38,10)")), 6)
            .cast("double")
            .alias("dim_sum"),
        )
        .groupBy("label")
        .agg(
            F.max("n").alias("n_vectors"),
            F.round(F.sum(F.abs(F.col("dim_sum")).cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("l1_of_sums"),
        )
        .orderBy("label")
    )


SIM_CENTROID_SQL = """
WITH comp AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
), sums AS (
  SELECT label, dim, COUNT(*) AS n,
         CAST(ROUND(SUM(CAST(x AS DECIMAL(38,10))), 6) AS DOUBLE) AS dim_sum
  FROM comp GROUP BY label, dim
)
SELECT label, MAX(n) AS n_vectors,
       CAST(ROUND(SUM(CAST(ABS(dim_sum) AS DECIMAL(38,10))), 4) AS DOUBLE) AS l1_of_sums
FROM sums GROUP BY label ORDER BY label
"""


def _sql_bucket_expr(vec: str) -> str:
    """DuckDB twin of `_bucket_expr`: the 6 hyperplane sign bits packed
    MSB-first. The plane matrix is fixed-seed MODEL STATE, so the
    oracle can inline it as literals; each projection is an explicit
    left-associated sum matching Spark's HOF fold order bit for bit
    (the products are exact: weights are ±1.0)."""
    bits = []
    for plane in _hyperplanes():
        terms = " + ".join(
            f"(({vec})[{i + 1}]::DOUBLE * {w:.1f})" for i, w in enumerate(plane)
        )
        bits.append(f"(CASE WHEN ({terms}) > 0 THEN 1 ELSE 0 END)")
    expr = "0"
    for b in bits:
        expr = f"(({expr}) * 2 + {b})"
    return expr


def _sim_lsh_sql() -> str:
    """Full oracle for sim_topk_lsh: DuckDB recomputes the hyperplane
    buckets itself (deterministic model state, see `_sql_bucket_expr`),
    restricts the pair space to same-bucket exactly as the Spark plan
    does, and ranks by the same decimal-exact cosine — converting the
    former rows-only entry into a rows+schema+hash check of the entire
    index semantics (bucketing + candidate restriction + scoring)."""
    cos = sql_cosine("q.embedding", "c.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_sql_bucket_expr('embedding')} AS bucket
  FROM embeddings
)
SELECT query_id, rank, neighbor_id, cos_sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id ASC
         ) AS rank
  FROM bucketed q JOIN bucketed c
    ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id % 100 = 0
) WHERE rank <= {TOP_K}
"""


def _sim_ivf_sql() -> str:
    """Full oracle for sim_topk_ivf: the coarse codebook is the
    deterministic every-53rd-vector sample, so DuckDB rebuilds it,
    assigns every vector to its argmax-dot cell and every query to its
    top-2 cells (same double arithmetic, same (dot DESC, cent_id ASC)
    tie-break as the Spark plan), then ranks same-cell candidates by
    the decimal-exact cosine."""
    from ..functions.vector import sql_dot_double

    dot = sql_dot_double("e.embedding", "c.cv")
    cos = sql_cosine("q.embedding", "c.embedding")
    return f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id % 53 = 0
),
corpus_cells AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id ORDER BY {dot} DESC, c.cent_id ASC
           ) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
query_cells AS (
  SELECT vec_id, embedding, cent_id AS qcell FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id ORDER BY {dot} DESC, c.cent_id ASC
           ) AS rk
    FROM embeddings e CROSS JOIN cents c
    WHERE e.vec_id % 100 = 0
  ) WHERE rk <= 2
)
SELECT query_id, rank, neighbor_id, cos_sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id ASC
         ) AS rank
  FROM query_cells q JOIN corpus_cells c
    ON c.cell = q.qcell AND c.vec_id <> q.vec_id
) WHERE rank <= {TOP_K}
"""


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_topk_lsh": sim_topk_lsh,
    "sim_label_centroids": sim_label_centroids,
}

ORACLES = {
    "sim_topk_bruteforce": SIM_TOPK_SQL,
    # deterministic model state (fixed-seed planes / every-53rd-vector
    # codebook) lets the oracle replicate BOTH index structures exactly
    # — former rows-only entries, now fully hash-checked
    "sim_topk_lsh": _sim_lsh_sql(),
    "sim_topk_ivf": _sim_ivf_sql(),
    "sim_label_centroids": SIM_CENTROID_SQL,
}


def _dot_double(a: Column, b: Column) -> Column:
    """Plain double dot product — used for IVF cell ASSIGNMENT, where
    only the argmax matters (no cross-engine parity needed). Stays the
    zip_with/aggregate HOF: inside a transform lambda the unrolled
    fixed-dim tree re-evaluates its element_at(codebook, i) operand per
    term and measured 4.5x SLOWER — the unrolled form only wins at
    top-level projection/filter context (see dedup_embedding_cosine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


#: single-entry memo: (application id, sf_dir) -> (codebook frame, k).
#: The codebook is MODEL STATE, not data — O(k x d) floats
#: trained/derived once — so both the driver-side collect and the
#: per-session memo are the correct pattern (the same role as a
#: broadcast k-means model in any IVF index; re-collecting it per query
#: run is a spurious job). The dict holds at most ONE entry and is
#: replaced wholesale on miss, so cycling SparkSessions in a long-lived
#: process never accumulates frames bound to stopped sessions (last
#: app+dir only, stale on switch).
_CODEBOOK_MEMO: dict[tuple[str, str], tuple[DataFrame, int]] = {}


def _ivf_codebook(spark, sf_dir, corpus):
    """One-row (cent_ids, cent_vecs) frame for the deterministic coarse
    codebook (every 53rd vector — k-means at deploy time; the
    deterministic sample keeps tests stable).

    The codebook rides as a ONE-ROW broadcast frame cross-joined onto
    the scan, so cell assignment runs MAP-SIDE: the corpus never
    shuffles for assignment (an early formulation re-exchanged the full
    corpus keyed on the 64-dim vector column). A broadcast row beats
    inlining the k x d values as literal arrays: the literal form
    re-pays ~1.5s of plan analysis/codegen on EVERY invocation
    (measured at bench scale), while the broadcast keeps the plan tree
    model-size-independent — the pattern that still works when the
    codebook is 65536 x 1024."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CODEBOOK_MEMO.get(key)
    if hit is not None:
        return hit
    codebook = [
        (r["cent_id"], r["cv"])
        for r in corpus.filter(F.col("vec_id") % 53 == 0)
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))
        .collect()
    ]
    cb = spark.createDataFrame(
        [
            (
                [int(cid) for cid, _ in codebook],
                [[float(x) for x in cv] for _, cv in codebook],
            )
        ],
        "cent_ids array<bigint>, cent_vecs array<array<double>>",
    )
    _CODEBOOK_MEMO.clear()  # single-entry memo: evict any prior app/dir
    _CODEBOOK_MEMO[key] = (cb, len(codebook))
    return cb, len(codebook)


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a deterministic coarse codebook (every 53rd
    vector) partitions the corpus into cells by nearest centroid;
    queries probe only their nearest `nprobe=2` cells.

    This is the inverted-file index pattern (train k-means centroids at
    deploy time; the deterministic sample here keeps tests stable).
    Rows-only check: recall < 1 by design, measured in pytest against
    brute force."""
    queries, corpus = _queries_and_corpus(spark, sf_dir)
    from ..functions.vector import dot_dec

    cb, k = _ivf_codebook(spark, sf_dir, corpus)
    cent_ids_lit = F.col("cent_ids")
    cent_vecs_lit = F.col("cent_vecs")
    idx = F.sequence(F.lit(1), F.lit(k))

    def nearest_cells(df, vec_col, out_col, n_keep):
        """Per-row top-n centroid ids, computed with native HOFs over
        the folded codebook: dot each centroid (zip_with + aggregate),
        then pick n by (sim desc, cent_id asc) — no join, no shuffle,
        no Python.

        n_keep == 1 (the corpus side — every vector, every batch) takes
        a single-pass array_max over struct(sim, -cent_id): struct
        ordering is lexicographic, so the max is exactly the (sim desc,
        cent_id asc) head without the comparator-lambda sort, whose
        ~k log k interpreted comparator calls per row cost 1.6x more
        (measured, and pinned equal). n_probe > 1 (the tiny query side)
        keeps the sort."""
        df = df.crossJoin(F.broadcast(cb))
        if n_keep == 1:
            scored_arr = F.transform(
                idx,
                lambda i: F.struct(
                    _dot_double(
                        F.col(vec_col), F.element_at(cent_vecs_lit, i)
                    ).alias("sim"),
                    (-F.element_at(cent_ids_lit, i)).alias("neg_id"),
                ),
            )
            return df.withColumn(
                out_col, -F.array_max(scored_arr)["neg_id"]
            ).drop("cent_ids", "cent_vecs")
        scored_arr = F.transform(
            idx,
            lambda i: F.struct(
                _dot_double(
                    F.col(vec_col), F.element_at(cent_vecs_lit, i)
                ).alias("sim"),
                F.element_at(cent_ids_lit, i).alias("cent_id"),
            ),
        )
        ranked = F.array_sort(
            scored_arr,
            lambda l, r: F.when(l["sim"] > r["sim"], F.lit(-1))
            .when(l["sim"] < r["sim"], F.lit(1))
            .when(l["cent_id"] < r["cent_id"], F.lit(-1))
            .when(l["cent_id"] > r["cent_id"], F.lit(1))
            .otherwise(F.lit(0)),
        )
        top_ids = F.transform(F.slice(ranked, 1, n_keep), lambda s: s["cent_id"])
        return df.withColumn(out_col, F.explode(top_ids)).drop(
            "cent_ids", "cent_vecs"
        )

    corpus_cells = nearest_cells(corpus, "v", "cell", 1)
    query_cells = nearest_cells(queries, "qv", "qcell", 2)  # nprobe=2

    scored = (
        corpus_cells.join(
            F.broadcast(query_cells),
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cos_sim",
            dot_dec(F.col("qv"), F.col("v")).cast("double")
            / (F.col("qnorm") * F.col("vnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


QUERIES["sim_topk_ivf"] = sim_topk_ivf
