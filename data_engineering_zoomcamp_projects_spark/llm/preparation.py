"""Training-data preparation operators — the steps between a curated
corpus and a training run: deterministic splitting, sequence packing,
benchmark decontamination, and embedding quantization.

All are pure integer/deterministic arithmetic so every one is
oracle-checked (splitting deliberately uses an arithmetic hash rather
than an engine hash function so both engines compute the same buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import sql_shingle_cte

#: Knuth multiplicative-hash constant; bucket space kept prime
_SPLIT_MULT = 2654435761
_SPLIT_MOD = 97
CONTEXT_TOKENS = 2048

#: the module's ONE corpus token-count definition (whitespace tokens),
#: with its DuckDB twin — packing, sharding and any future token
#: accounting must share these so the Spark and SQL sides can never
#: drift independently
N_TOKENS_SQL = "len(split(text, ' '))"


def n_tokens_expr():
    """Spark twin of N_TOKENS_SQL."""
    return F.size(F.split("text", " "))


def prep_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based split (78/10/12-ish over 97 buckets):
    the id -> bucket mapping is pure integer arithmetic, so the split is
    reproducible across engines, runs, and cluster sizes — the property
    a training pipeline must have (no sampling RNG)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_SPLIT_MULT)) % _SPLIT_MOD
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 78, "train")
        .when(bucket < 88, "valid")
        .otherwise("test")
        .alias("split"),
    )


PREP_SPLIT_SQL = f"""
SELECT doc_id, lang,
  (doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD} AS bucket,
  CASE WHEN (doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD} < 78 THEN 'train'
       WHEN (doc_id * {_SPLIT_MULT}) % {_SPLIT_MOD} < 88 THEN 'valid'
       ELSE 'test' END AS split
FROM documents
"""


def prep_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: documents (ordered by id within
    language) are assigned to fixed-size context bins by cumulative
    token count — the packing plan a pretraining dataloader consumes.
    bin id = floor(token_prefix_sum / context).

    Scale plan (round-3 verdict item 1): a window partitioned only by
    `lang` funnels ~|corpus|/|langs| rows through ONE task — the same
    single-task pathology as a global sort, sharded by a
    low-cardinality key. Instead: range-shard on (lang, doc_id) — the
    shard count scales with the cluster, not the language count — take
    per-(shard, lang) token prefix sums with a window on the
    high-cardinality (_pid, lang) grain, and recover each row's global
    per-lang prefix by adding the broadcast cumulative token totals of
    earlier shards of the same lang (a metadata-sized array: at most
    shards x |langs| entries). The prefix sum is associative integer
    arithmetic, so the result is bit-identical to the one-window form
    the DuckDB oracle keeps. The lazy localCheckpoint barriers the
    range shuffle so both consumers (rows + shard totals) read the
    same RDD — identical range bounds by construction."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = n_tokens_expr()
    shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
        .repartitionByRange(shards, F.col("lang").asc(), F.col("doc_id").asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    toks = (
        ranged.groupBy("_pid", "lang")
        .agg(F.sum("n_tokens").alias("_tok"))
        .agg(
            F.sort_array(F.collect_list(F.struct("lang", "_pid", "_tok"))).alias(
                "_shard_toks"
            )
        )
    )
    w = Window.partitionBy("_pid", "lang").orderBy("doc_id")
    cum_in_shard = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = F.aggregate(
        F.filter(
            F.col("_shard_toks"),
            lambda s: (s["lang"] == F.col("lang")) & (s["_pid"] < F.col("_pid")),
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["_tok"],
    )
    prefix = off + cum_in_shard
    return (
        ranged.crossJoin(F.broadcast(toks))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor((prefix - F.col("n_tokens")) / CONTEXT_TOKENS)
            .cast("long")
            .alias("bin_id"),
        )
    )


PREP_PACKING_SQL = f"""
SELECT doc_id, lang,
  {N_TOKENS_SQL} AS n_tokens,
  CAST(FLOOR((SUM({N_TOKENS_SQL}) OVER w - {N_TOKENS_SQL})
       / {CONTEXT_TOKENS}) AS BIGINT) AS bin_id
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def prep_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 8-gram with
    the held-out benchmark set (source = 'src0' stands in for the eval
    suite). The canonical n-gram-overlap contamination check — a
    shingle equi-join between the two sets, counting shared shingles."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.text import shingles

    sh = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(shingles(F.col("text"), 8)).alias("s")
    )
    bench = sh(d.filter(F.col("source") == "src0")).select(
        F.col("doc_id").alias("bench_doc"), "s"
    )
    train = sh(d.filter(F.col("source") != "src0"))
    return (
        train.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bench_doc").alias("n_bench_docs_hit"),
        )
    )


PREP_DECONTAM_SQL = f"""
WITH {sql_shingle_cte(8)},
bench AS (SELECT sh.doc_id AS bench_doc, s FROM sh
          JOIN documents USING (doc_id) WHERE source = 'src0'),
train AS (SELECT sh.doc_id, s FROM sh
          JOIN documents USING (doc_id) WHERE source <> 'src0')
SELECT doc_id,
       COUNT(DISTINCT s) AS n_shared_shingles,
       COUNT(DISTINCT bench_doc) AS n_bench_docs_hit
FROM train JOIN bench USING (s)
GROUP BY doc_id
"""


#: Bloom sizing for prep_decontaminate_bloom: 2^23 bits / 3 hashes keeps
#: the false-positive rate under ~1e-3 up to ~1M bench shingles; FPs
#: only cost verify-join work, never correctness.
BLOOM_BITS = 1 << 23
BLOOM_HASHES = 3


def _bloom_positions(col):
    """The BLOOM_HASHES bit positions for shingle `col`, all derived
    from ONE md5 call: disjoint 7-hex-digit (28-bit) slices of the
    digest, each mod the bit space — independent-enough hashes at a
    third of the hashing cost, pure column arithmetic, replayable on
    any engine (unlike a JVM-seeded hash)."""
    digest = F.md5(col)
    return [
        F.conv(F.substring(digest, 1 + 7 * i, 7), 16, 10).cast("long") % BLOOM_BITS
        for i in range(BLOOM_HASHES)
    ]


#: single-entry bitset memo (cleared on every miss, so at most one
#: bitset is retained and a changed session/dir always rebuilds — the
#: bounded-memo discipline from llm/similarity._CODEBOOK_MEMO)
_BLOOM_MEMO: dict[tuple[str, str], object] = {}


def _bench_bloom_broadcast(spark: SparkSession, sf_dir: str, bench: DataFrame):
    """Build (or reuse) the broadcast Bloom bitset over the benchmark
    shingle set — DISTRIBUTED (round-9 rewrite): each partition of the
    deduped bench-shingle stream ORs its positions into a local numpy
    bitset inside mapInPandas and emits the ~1 MB partial as ONE binary
    row; the driver ORs the partials. The driver-side cost is now
    O(n_partitions x BLOOM_BITS/8) — independent of eval-suite size —
    where the previous formulation collected every distinct bit
    position (rows proportional to suite shingle count, the one
    driver-side step that scaled with suite size; r8 verdict item 6).
    Model state like the IVF codebook: built once per (session,
    sf_dir), broadcast to every executor."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BLOOM_MEMO.get(key)
    if hit is not None:
        return hit
    _BLOOM_MEMO.clear()
    nbytes = BLOOM_BITS >> 3
    pos_df = (
        bench.select("s")
        .distinct()
        .select(
            *[p.alias(f"p{i}") for i, p in enumerate(_bloom_positions(F.col("s")))]
        )
    )

    def build(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            for col in pdf.columns:
                pos = pdf[col].to_numpy()
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:  # empty partitions contribute nothing
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    bits = np.zeros(nbytes, dtype=np.uint8)
    for row in pos_df.mapInPandas(build, "bits binary").collect():
        bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    bc = spark.sparkContext.broadcast(bits)
    _BLOOM_MEMO[key] = bc
    return bc


def prep_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination — the runtime-filter
    formulation of `prep_decontaminate` for the 100 TB corpus / small
    eval-suite shape: build a Bloom filter over the benchmark's 8-gram
    shingles (model state, like the IVF codebook: collected once,
    broadcast to every executor), drop the overwhelming majority of
    train shingles map-side with zero shuffle, then exact-verify ONLY
    the survivors with the equi-join. False positives cost verify-join
    work; the exact join removes them, so the result — and the oracle —
    is identical to the exact path.

    The probe stays JVM-side: bit positions are md5 column arithmetic;
    Python only does the vectorized bit-array lookup (Arrow-batched
    pandas_udf over a numpy bitset, ~3 indexed loads per value)."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.text import shingles

    sh = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(shingles(F.col("text"), 8)).alias("s")
    )
    bench = sh(d.filter(F.col("source") == "src0")).select(
        F.col("doc_id").alias("bench_doc"), "s"
    )
    train = sh(d.filter(F.col("source") != "src0"))

    bits_bc = _bench_bloom_broadcast(spark, sf_dir, bench)

    @F.pandas_udf("boolean")
    def might_contain(p0: pd.Series, p1: pd.Series, p2: pd.Series) -> pd.Series:
        b = bits_bc.value
        hit = None
        for c in (p0, p1, p2):
            idx = c.to_numpy()
            h = (b[idx >> 3] >> (idx & 7)) & 1
            hit = h if hit is None else (hit & h)
        return pd.Series(hit.astype(bool))

    probe_cols = [
        p.alias(f"_p{i}") for i, p in enumerate(_bloom_positions(F.col("s")))
    ]
    candidates = (
        train.select("doc_id", "s", *probe_cols)
        .filter(might_contain(*[F.col(f"_p{i}") for i in range(BLOOM_HASHES)]))
        .select("doc_id", "s")
    )
    return (
        candidates.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("bench_doc").alias("n_bench_docs_hit"),
        )
    )


def prep_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings (the 4x storage cut a
    100 TB vector corpus takes): per-vector absmax scale, rounded int8
    codes. Output is an integer checksum of the codes plus the scale —
    both engine-exact."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # staged projections (the shingles()/CollapseProject discipline):
    # `scale` is referenced once per element inside the codes lambda —
    # inlining its absmax sub-expression there re-evaluates the
    # array_max PER ELEMENT (O(dim^2) per row), and `codes` feeds
    # three consumers. Materializing each as a column of its own
    # projection makes both single-evaluation (CollapseProject will
    # not inline a non-cheap producer into multiple consumers); the
    # lambda then reads `scale` as a per-row attribute. Measured
    # 11.1 s -> ~0.6 s at sf1.
    staged = e.select("vec_id", v.alias("v")).select(
        "vec_id",
        "v",
        (F.array_max(F.transform("v", lambda x: F.abs(x))) / 127.0).alias(
            "scale"
        ),
    )
    coded = staged.select(
        "vec_id",
        "scale",
        F.transform(
            "v", lambda x: F.round(x / F.col("scale")).cast("long")
        ).alias("codes"),
    )
    return coded.select(
        "vec_id",
        F.round("scale", 8).alias("scale"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("code_checksum"),
        F.array_max("codes").alias("max_code"),
        F.array_min("codes").alias("min_code"),
    )


PREP_QUANTIZE_SQL = """
WITH q AS (
  SELECT vec_id,
    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale,
    list_transform(embedding::DOUBLE[],
      x -> CAST(round(x / (list_max(list_transform(embedding::DOUBLE[], y -> abs(y))) / 127.0)) AS BIGINT)) AS codes
  FROM embeddings
)
SELECT vec_id, ROUND(scale, 8) AS scale,
  CAST(list_sum(codes) AS BIGINT) AS code_checksum,
  list_max(codes) AS max_code,
  list_min(codes) AS min_code
FROM q
"""


def prep_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (alpha = 0.5): the data-
    mixing step of a multilingual pretraining pipeline, where dominant
    languages are downweighted toward a sqrt-share mix instead of
    either natural (alpha=1) or uniform (alpha=0) sampling. (The
    corpus's `source` dimension is uniform by construction, so the
    skewed `lang` dimension is the one worth rebalancing — en carries
    ~3.4x the mass of the rarest language here.)

    Per-language keep rate = min(1, sqrt(n_min / n_lang)) expressed in
    per-mille: rates derive FROM the data (one map-side count agg over
    a tiny 4-row source dimension), membership is the same md5-keyed
    layout-invariant uniform as sample_hash_reproducible. All rate
    arithmetic is a fixed IEEE tree (bigint->double casts, one divide,
    one sqrt, one floor — each correctly rounded in both engines), so
    the oracle replicates rates AND membership exactly and the driver
    hash-checks both.

    Scale: counts are partial+final over |sources| groups; the rate
    frame is broadcast (a few rows); the filter is map-side. No global
    sort, no per-stratum funnel — the same no-shuffle shape as the
    stratified sampler, but with data-derived rates."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    min_n = counts.agg(F.min("n_lang").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang",
        F.least(
            F.lit(1000).cast("long"),
            F.floor(
                F.lit(1000.0)
                * F.sqrt(
                    F.col("n_min").cast("double") / F.col("n_lang").cast("double")
                )
            ),
        ).alias("rate_permille"),
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(u % 1000 < F.col("rate_permille"))
        .select("doc_id", "lang", "source", "rate_permille")
    )


PREP_TEMPERATURE_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
), rates AS (
  SELECT lang,
         LEAST(1000, CAST(FLOOR(1000.0 * sqrt(
             CAST((SELECT MIN(n_lang) FROM counts) AS DOUBLE)
             / CAST(n_lang AS DOUBLE))) AS BIGINT)) AS rate_permille
  FROM counts
)
SELECT d.doc_id, d.lang, d.source, r.rate_permille
FROM documents d JOIN rates r USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1000 < r.rate_permille
"""


def prep_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: assign each document a training PHASE
    by content quality (easy/typical/hard via fixed type-token-ratio
    thresholds) and a deterministic intra-phase shuffle key — the
    ordered-dataloader contract (train on cleaner text first, shuffle
    stably within each phase so every run and every worker sees the
    same order).

    Scale: entirely map-side — the phase is a fixed threshold on a
    per-row rational score (no global sort, no ntile; rank-based
    bucketing would need the distributed-rank machinery and gains
    nothing when thresholds are part of the recipe), and the shuffle
    key is the same md5 uniform as the samplers. A dataloader reads
    ORDER BY (phase, shuffle_key) off the sorted-layout sink."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )
    phase = (
        F.when(ttr >= 0.75, F.lit(0))
        .when(ttr >= 0.5, F.lit(1))
        .otherwise(F.lit(2))
    )
    return d.select(
        "doc_id",
        "lang",
        F.round(ttr, 6).alias("ttr"),
        phase.alias("phase"),
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )


PREP_CURRICULUM_SQL = """
SELECT doc_id, lang,
       ROUND(CAST(len(list_distinct(split(text, ' '))) AS DOUBLE)
             / CAST(len(split(text, ' ')) AS DOUBLE), 6) AS ttr,
       CASE WHEN CAST(len(list_distinct(split(text, ' '))) AS DOUBLE)
                 / CAST(len(split(text, ' ')) AS DOUBLE) >= 0.75 THEN 0
            WHEN CAST(len(list_distinct(split(text, ' '))) AS DOUBLE)
                 / CAST(len(split(text, ' ')) AS DOUBLE) >= 0.5 THEN 1
            ELSE 2 END AS phase,
       md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
"""


#: fixed shard count for prep_shard_balanced; at deploy this is the
#: number of training output files/workers
_N_SHARDS = 8


def prep_shard_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced output sharding: assign every document to one of
    _N_SHARDS training shards so per-shard token totals come out nearly
    equal — the write-the-training-files step after curation. The
    assignment is sorted round-robin (longest-processing-time style):
    rank documents by token count descending (doc_id tiebreak) and take
    shard = (rank - 1) % K, which interleaves big and small documents
    across shards instead of clustering them the way contiguous ntile
    buckets would. Deterministic — no RNG — so shards are reproducible
    across engines, runs, and cluster sizes (the prep_train_test_split
    property).

    The global rank comes from `distrank.ranked` with empty partition
    cols: range-sharded, no task ever holds more than ~|docs|/shards
    rows — a plain ROW_NUMBER() over the whole corpus would funnel
    everything through one task at 100 TB. Balance is pinned by pytest
    (max/min shard token totals within 3% at both SFs; measured 1.026).
    Reference parity: none — driver-contract C-LLM-data prep row."""
    from ..operators.distrank import ranked

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", n_tokens_expr().alias("n_tokens"))
    r = ranked(
        toks,
        [],
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        out="rn",
    )
    return r.select(
        "doc_id",
        "n_tokens",
        ((F.col("rn") - 1) % _N_SHARDS).cast("int").alias("shard_id"),
    )


PREP_SHARD_SQL = f"""
WITH ranked AS (
  SELECT doc_id, {N_TOKENS_SQL} AS n_tokens,
         ROW_NUMBER() OVER (
           ORDER BY {N_TOKENS_SQL} DESC, doc_id
         ) AS rn
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST((rn - 1) % {_N_SHARDS} AS INTEGER) AS shard_id
FROM ranked
"""


QUERIES = {
    "prep_train_test_split": prep_train_test_split,
    "prep_shard_balanced": prep_shard_balanced,
    "prep_curriculum_order": prep_curriculum_order,
    "prep_temperature_resample": prep_temperature_resample,
    "prep_sequence_packing": prep_sequence_packing,
    "prep_decontaminate": prep_decontaminate,
    "prep_decontaminate_bloom": prep_decontaminate_bloom,
    "prep_quantize_int8": prep_quantize_int8,
}

ORACLES = {
    # bloom prefilter + exact verify == exact join, so both entries
    # share the exact oracle (the sharing pattern of dedup_minhash_lsh)
    "prep_decontaminate_bloom": PREP_DECONTAM_SQL,
    "prep_train_test_split": PREP_SPLIT_SQL,
    "prep_shard_balanced": PREP_SHARD_SQL,
    "prep_temperature_resample": PREP_TEMPERATURE_SQL,
    "prep_curriculum_order": PREP_CURRICULUM_SQL,
    "prep_sequence_packing": PREP_PACKING_SQL,
    "prep_decontaminate": PREP_DECONTAM_SQL,
    "prep_quantize_int8": PREP_QUANTIZE_SQL,
}


#: token-budget head: keep documents, biggest first, until this
#: fraction of the corpus's tokens is filled (exact integer arithmetic:
#: budget = total * NUM // DEN)
BUDGET_NUM = 3
BUDGET_DEN = 10


def prep_token_budget_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection — the "fill the training budget in
    priority order" primitive: order documents by a quality key
    (n_chars DESC here; any deterministic score works), take documents
    while the INCLUSIVE cumulative token count stays within
    budget = 3/10 of the corpus's total tokens.

    Scale design: the cumulative sum is NOT a global
    SUM() OVER (ORDER BY ...) window (single-task funnel) but
    operators/distrank.cum_weighted — range-shard on the priority
    order, within-shard running sums, one broadcast metadata array of
    shard totals. The budget scalar is a one-row broadcast; the budget
    uses TRUE integer division (Spark `div`, DuckDB `//`), exact while
    3*total < 2^63 (Spark's non-ANSI long multiply wraps past that;
    DuckDB widens to HUGEINT) — the earlier double-divide + FLOOR form
    lost exactness already at 2^53 (ADVICE r10).
    Reference parity: none — driver-contract Part C prep family."""
    from ..operators.distrank import cum_weighted

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", n_tokens_expr().cast("long").alias("n_tokens")
    )
    total = d.agg(
        F.expr(f"sum(n_tokens) * {BUDGET_NUM} div {BUDGET_DEN}")
        .cast("long")
        .alias("budget")
    )
    cum = cum_weighted(
        d,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_tokens",
        out="cum_tokens",
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         CAST({N_TOKENS_SQL} AS BIGINT) AS n_tokens
  FROM documents
), b AS (
  SELECT CAST(SUM(n_tokens) * {BUDGET_NUM} // {BUDGET_DEN} AS BIGINT)
         AS budget
  FROM t
), c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY n_chars DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
  FROM t
)
SELECT doc_id, lang, n_tokens, cum_tokens FROM c, b
WHERE cum_tokens <= budget
"""

QUERIES["prep_token_budget_head"] = prep_token_budget_head
ORACLES["prep_token_budget_head"] = TOKEN_BUDGET_SQL
