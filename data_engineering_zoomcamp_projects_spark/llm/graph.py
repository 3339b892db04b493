"""Graph analytics over the near-dup document graph (round-5
widening): damped PageRank, joining the connected-components operator
(llm/dedup.min_label_components) in the iterative-graph family.

The rank runs in FIXED-POINT integer arithmetic (the ml_kmeans lattice
discipline): rank mass is scaled by 1e12, per-edge contributions are
floor(pr/deg), damping is the exact rational 17/20, and every floor()
is computed on the binary double value — identical in Spark, Python,
and DuckDB — so three unrolled iterations are bit-reproducible and the
oracle hash-checks the whole training loop. (A float formulation
diverges at the engines' double->decimal boundaries; see the k-means
docstring for the measured failure.)

Scale: each iteration is one edges-to-ranks equi-join + one groupBy
sum — the same shuffle shape as one min-label flood round; edges come
from the banded MinHash-LSH path (candidate-bounded, the 100 TB
design), and rank state is one long per vertex.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import sql_shingle_cte

#: rank mass scale (1e12) and fixed iteration count. Damping 0.85 is
#: applied as the exact rational 17/20; 17*inflow <= 1.7e13 stays far
#: inside double-exact integer range (2^53), so floor() is exact.
PR_SCALE = 1_000_000_000_000
PR_ITERS = 3
#: 0.15 * PR_SCALE, exactly
PR_BASE_MASS = 150_000_000_000


def graph_pagerank_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 3 iterations, dangling mass not
    redistributed — the standard simplification for ordinal use) over
    the undirected near-dup graph: vertices = documents, edges =
    Jaccard>=0.8 pairs from the MinHash-LSH path (pair-identical to
    the exact shingle join at these banding parameters — the same
    sharing argument as dedup_cluster_components).

    Per iteration: contributions floor(pr/deg) flow along edges (one
    equi-join), inflows aggregate per target (one groupBy), and
    pr' = floor(0.15*S/n) + floor(17*inflow/20) — all exact integer
    arithmetic on the 1e12 lattice, so the DuckDB oracle's unrolled
    iterations hash-match bit-for-bit. Rank state is checkpointed
    lazily per round (iterative-plan hygiene)."""
    from .dedup import near_dup_pairs

    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)

    base = math.floor(PR_BASE_MASS / n)
    pr = docs.withColumn("pr", F.lit(math.floor(PR_SCALE / n)).cast("long"))
    for _ in range(PR_ITERS):
        inflow = (
            edges_deg.join(pr, edges_deg["src"] == pr["doc_id"])
            .select(
                F.col("dst"),
                F.floor(F.col("pr").cast("double") / F.col("deg"))
                .cast("long")
                .alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        pr = (
            docs.join(inflow, docs["doc_id"] == inflow["dst"], "left")
            .select(
                "doc_id",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(17.0) * F.coalesce(F.col("inflow"), F.lit(0)) / F.lit(20.0)
                    )
                )
                .cast("long")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr.select("doc_id", F.col("pr").alias("pagerank_q")).orderBy("doc_id")


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup graph (degree -> #documents),
    including the degree-0 mass of isolated documents — the first
    diagnostic run on any corpus-scale similarity graph (a fat tail
    here predicts LSH bucket skew downstream).

    Scale: two shuffles past the pair path — per-vertex degree count,
    then the histogram groupBy over #vertices rows. The degree-0 row
    comes from a left join of the full vertex set, not a subtract."""
    from .dedup import near_dup_pairs

    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(deg, "doc_id", "left")
        .select(F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("degree")
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the near-dup graph — the
    clustering signal that separates a dup *chain* (transitive LSH
    matches, zero triangles) from a dup *clique* (boilerplate family,
    maximal triangles). Output: (doc_id, n_triangles) for vertices in
    at least one triangle.

    Scale: the canonical a<b pair orientation makes this the standard
    two-join triangle enumeration — each triangle a<b<c is produced
    exactly once from (a,b)x(b,c) checked against (a,c); wedge count
    is bounded by the LSH candidate generation, never all-pairs."""
    from .dedup import near_dup_pairs

    pairs = (
        near_dup_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    tri = (
        pairs.alias("e1")
        .join(pairs.alias("e2"), F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            pairs.alias("e3"),
            (F.col("e1.doc_a") == F.col("e3.doc_a"))
            & (F.col("e2.doc_b") == F.col("e3.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy("doc_id")
    )


#: bounded-BFS horizon for graph_reachability_recursive. Recursion is
#: UNION ALL (Spark 4 supports no recursive UNION-distinct yet), so
#: path multiplicity grows with clique size ^ depth — the depth bound
#: plus the final min-dist aggregation keep the result exact while
#: bounding work. At 100 TB scale, unbounded reachability runs through
#: the iterative min-label flood (dedup_cluster_components), which
#: dedupes its frontier every round; this entry is the DECLARATIVE
#: Spark-4 recursive-CTE surface for bounded-horizon queries.
REACH_MAX_DEPTH = 3
#: deterministic seed predicate: every 97th document
REACH_SEED_MOD = 97


def graph_reachability_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS over the near-dup graph via Spark 4's WITH RECURSIVE:
    hop distance (<= REACH_MAX_DEPTH) from the deterministic seed set
    (doc_id % 97 == 0), reported as docs-reached per distance. The
    recursive member joins the frontier to the undirected edge list;
    the final SELECT collapses path multiplicity with a min-dist
    per-vertex aggregate. DuckDB runs the IDENTICAL recursive SQL over
    the exact-Jaccard pair CTE, so the whole recursion is hash-checked."""
    from .dedup import near_dup_pairs

    # the memoized pair frame is already an eager localCheckpoint, so
    # each unrolled recursion level scans materialized rows (an
    # un-materialized view re-executed the whole LSH pipeline per
    # level — measured 15 s -> ~4 s at sf0.1 from this barrier)
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    pairs.createOrReplaceTempView("near_pairs_rcte")
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(f"""
      WITH RECURSIVE edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM near_pairs_rcte
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM near_pairs_rcte
      ),
      reach(doc_id, dist) AS (
        SELECT doc_id, 0 AS dist FROM documents
        WHERE doc_id % {REACH_SEED_MOD} = 0
        UNION ALL
        SELECT e.dst AS doc_id, r.dist + 1 AS dist
        FROM reach r JOIN edges e ON e.src = r.doc_id
        WHERE r.dist < {REACH_MAX_DEPTH}
      ),
      best AS (
        SELECT doc_id, MIN(dist) AS dist FROM reach GROUP BY doc_id
      )
      SELECT dist, COUNT(*) AS n_docs
      FROM best GROUP BY dist ORDER BY dist
    """)


def _reachability_sql() -> str:
    return f"""
WITH RECURSIVE {', '.join(_near_pair_ctes())},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM near
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM near
),
reach(doc_id, dist) AS (
  SELECT doc_id, 0 AS dist FROM documents
  WHERE doc_id % {REACH_SEED_MOD} = 0
  UNION ALL
  SELECT e.dst AS doc_id, r.dist + 1 AS dist
  FROM reach r JOIN edges e ON e.src = r.doc_id
  WHERE r.dist < {REACH_MAX_DEPTH}
),
best AS (
  SELECT doc_id, MIN(dist) AS dist FROM reach GROUP BY doc_id
)
SELECT CAST(dist AS INT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM best GROUP BY dist ORDER BY dist
"""


def _near_pair_ctes() -> list[str]:
    """Shared oracle CTE chain: exact shingle-Jaccard near-dup pairs
    (pair-identical to the banded MinHash-LSH path at these parameters
    — the sharing argument proven by tests/test_llm.py)."""
    from .dedup import JACCARD_THRESHOLD

    return [
        sql_shingle_cte(5),
        "cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)",
        """pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)""",
        f"""near AS (
  SELECT doc_a, doc_b FROM pair
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - common AS DOUBLE)
        >= {JACCARD_THRESHOLD}
)""",
    ]


def _degree_dist_sql() -> str:
    return f"""
WITH {', '.join(_near_pair_ctes())},
ends AS (SELECT doc_a AS doc_id FROM near UNION ALL SELECT doc_b FROM near),
deg AS (SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY doc_id)
SELECT CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d LEFT JOIN deg ON deg.doc_id = d.doc_id
GROUP BY 1 ORDER BY degree
"""


def _triangle_sql() -> str:
    return f"""
WITH {', '.join(_near_pair_ctes())},
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM near e1
  JOIN near e2 ON e2.doc_a = e1.doc_b
  JOIN near e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
verts AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM verts GROUP BY doc_id ORDER BY doc_id
"""


def _pagerank_sql() -> str:
    from .dedup import JACCARD_THRESHOLD

    def iter_cte(name: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT d.doc_id,
         CAST(FLOOR({PR_BASE_MASS}.0 / s.n) AS BIGINT)
         + CAST(FLOOR(17.0 * COALESCE(f.inflow, 0) / 20.0) AS BIGINT) AS pr
  FROM documents d CROSS JOIN stats s LEFT JOIN (
    SELECT e.dst,
           SUM(CAST(FLOOR(CAST(p.pr AS DOUBLE) / g.deg) AS BIGINT)) AS inflow
    FROM edges e JOIN {prev} p ON p.doc_id = e.src JOIN deg g ON g.src = e.src
    GROUP BY e.dst
  ) f ON f.dst = d.doc_id
)"""

    parts = [
        sql_shingle_cte(5),
        "cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)",
        """pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)""",
        f"""near AS (
  SELECT doc_a, doc_b FROM pair
  JOIN cnt ca ON ca.doc_id = doc_a
  JOIN cnt cb ON cb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - common AS DOUBLE)
        >= {JACCARD_THRESHOLD}
)""",
        """edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM near
  UNION ALL SELECT doc_b, doc_a FROM near
)""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "stats AS (SELECT COUNT(*) AS n FROM documents)",
        f"""p0 AS (
  SELECT doc_id, CAST(FLOOR({PR_SCALE}.0 / s.n) AS BIGINT) AS pr
  FROM documents CROSS JOIN stats s
)""",
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(iter_cte(f"p{i}", f"p{i - 1}"))
    return f"""
WITH {', '.join(parts)}
SELECT doc_id, pr AS pagerank_q FROM p{PR_ITERS} ORDER BY doc_id
"""


QUERIES = {
    "graph_pagerank_near_dups": graph_pagerank_near_dups,
    "graph_degree_distribution": graph_degree_distribution,
    "graph_triangle_count": graph_triangle_count,
    "graph_reachability_recursive": graph_reachability_recursive,
}
ORACLES = {
    "graph_pagerank_near_dups": _pagerank_sql(),
    "graph_degree_distribution": _degree_dist_sql(),
    "graph_triangle_count": _triangle_sql(),
    "graph_reachability_recursive": _reachability_sql(),
}
