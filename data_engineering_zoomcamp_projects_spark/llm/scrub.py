"""Corpus scrubbing + repetition analysis (round-2 additions to the
LLM-data surface; registered past the certified driver windows).

- sensitive-term redaction: the PII-scrubbing slot of a training-data
  pipeline. Production swaps the term lexicon for email/phone/SSN
  regexes (same regexp_replace plumbing, both engines support RE2-style
  classes and word boundaries); this corpus has no digit-bearing tokens
  (verified), so the demonstration lexicon is drawn from the corpus
  vocabulary to give the operator a real, checkable effect.
- repetition scoring: duplicate-bigram ratios and hot-bigram counts,
  the standard cheap detector for degenerate/boilerplate documents
  before training (a doc that repeats one phrase shows dup_ratio -> 1).

All native expressions, one scan per query; ratios are int/int double
divisions (exact on both engines)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.parity import DEC

#: stand-in sensitive terms (see module docstring); word-boundary
#: anchored so substrings inside longer tokens survive
SENSITIVE_TERMS = ("key", "hash")
_PATTERN = r"\b(" + "|".join(SENSITIVE_TERMS) + r")\b"
_MASK = "<REDACTED>"


def text_redact_sensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact sensitive terms and report per-document counts — emits
    (doc_id, n_redactions, redacted_text). The full-text output column
    is the point: downstream stages train on the scrubbed text."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PATTERN)).alias("n_redactions"),
        F.regexp_replace(F.col("text"), _PATTERN, _MASK).alias("redacted_text"),
    )


REDACT_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PATTERN}')) AS n_redactions,
       regexp_replace(text, '{_PATTERN}', '{_MASK}', 'g') AS redacted_text
FROM documents
"""


def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals from token bigrams: total and
    distinct bigram counts, the duplicate-bigram ratio, and the hottest
    bigram's frequency.

    ZERO-shuffle plan: all the stats are doc-local, so the statistics
    never leave the row — a pure scan, map-side everything (the
    round-8 rewrite eliminated the two corpus-sized aggregation
    exchanges of the explode-groupBy form; at 100 TB those moved
    ~|corpus tokens| rows through the exchange twice).

    The doc-local pass itself is an Arrow pandas_udf (round-9 A/B):
    the round-8 native form — per-doc array_sort + an aggregate()
    run-length fold — runs entirely on the INTERPRETED lambda
    evaluator (HOFs never enter whole-stage codegen), measured
    15-16.6 s at sf1; one Counter pass per document in an Arrow batch
    does the same integer counting in 1.5-3.3 s (~10x, the symspell
    generator lesson again). Only exact integers cross the Python
    boundary; the ratio arithmetic and rounding stay JVM-side so
    oracle parity is untouched. The udf body is a nested closure
    (cloudpickle by-value — executors don't have the repo on
    sys.path under the driver contract)."""
    d = load_table(spark, sf_dir, "documents")

    @F.pandas_udf("struct<n_bigrams:bigint,n_distinct:bigint,max_freq:bigint>")
    def rep_stats(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        n_b, n_d, mx = [], [], []
        for s in texts:
            if s is None:
                # NULL text propagates NULL stats (the native
                # expression plan's null semantics; current corpora
                # have no nulls — this keeps a data issue per-row
                # instead of failing the whole query)
                n_b.append(None)
                n_d.append(None)
                mx.append(None)
                continue
            ts = s.split(" ")
            # mirror the oracle's edge rule: a 1-token doc contributes
            # one "bigram" (the token itself) via the greatest(.., 1)
            m = max(len(ts) - 1, 1)
            c = Counter(" ".join(ts[i : i + 2]) for i in range(m))
            n_b.append(m)
            n_d.append(len(c))
            mx.append(max(c.values()))
        return pd.DataFrame(
            {"n_bigrams": n_b, "n_distinct": n_d, "max_freq": mx}
        )

    staged = d.select("doc_id", rep_stats("text").alias("stats"))
    dup_ratio = F.round(
        1
        - F.col("n_distinct_bigrams").cast("double")
        / F.col("n_bigrams").cast("double"),
        6,
    )
    return (
        staged.select(
            "doc_id",
            F.col("stats")["n_bigrams"].alias("n_bigrams"),
            F.col("stats")["n_distinct"].alias("n_distinct_bigrams"),
            F.col("stats")["max_freq"].alias("max_bigram_freq"),
        )
        .withColumn("dup_ratio", dup_ratio)
        .withColumn("is_repetitive", (F.col("dup_ratio") > 0.5).cast("int"))
    )


REPETITION_SQL = """
WITH bg AS (
  SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS bigram
  FROM (SELECT doc_id, split(text, ' ') AS ts FROM documents) tok,
       (SELECT unnest(generate_series(1,
           (SELECT COALESCE(MAX(len(split(text, ' '))), 1) FROM documents))) AS i) g
  WHERE i <= greatest(len(ts) - 1, 1)
), per_bigram AS (
  SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       COUNT(*) AS n_distinct_bigrams,
       CAST(MAX(cnt) AS BIGINT) AS max_bigram_freq,
       ROUND(1 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_ratio,
       CAST(ROUND(1 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) > 0.5 AS INT) AS is_repetitive
FROM per_bigram
GROUP BY doc_id
"""


def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching: customer-name pairs within an
    edit distance of 2, blocked by nation. Per-block quadratic BY
    DESIGN — this is the small-SF oracle twin (the role
    dedup_shingle_jaccard plays for the text path); measured ~100x at
    10x data since blocks grow linearly (>10 min at sf1, BASELINE.md
    §10). The SHIPPED scale path is dedup_fuzzy_names_symspell
    (deletion-neighborhood candidate join, lossless for ed<=2), pinned
    equal to this form by pytest and sharing this oracle. levenshtein
    is JVM-native on the Spark side and identical classic edit
    distance on both engines.

    Guarded: refuses to build the quadratic plan above the oracle
    scale (_FUZZY_GUARD_ROWS, covers sf<=0.1) so a full-registry sweep
    at a big SF fails fast with a pointer to the symspell path instead
    of hanging for 10+ minutes (round-5 sweep exclusion, now
    mechanical)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = c.count()  # bounded: one scalar, the same selector-count pattern
    if n > _FUZZY_GUARD_ROWS:
        raise ValueError(
            f"dedup_fuzzy_names is the deliberately-quadratic small-SF "
            f"oracle twin; {n} customers exceeds the {_FUZZY_GUARD_ROWS}-row "
            f"guard — run dedup_fuzzy_names_symspell (same result set, "
            f"deletion-neighborhood candidates) at this scale"
        )
    # the block key alone has ~25 distinct values — a bare equi-join
    # leaves most cores idle. Salt SYMMETRICALLY: the left side gets a
    # deterministic salt, the right side is replicated once per salt
    # value, so every within-block pair still matches exactly once but
    # the shuffle key (nation, salt) spreads over 25 x SALTS reducers.
    SALTS = 8
    a = c.withColumn("_salt", (F.col("c_custkey") % SALTS).cast("int"))
    b = c.select(
        F.col("c_custkey").alias("b_custkey"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("b_nationkey"),
    ).withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(SALTS)])))
    # thresholded levenshtein: O(threshold x len) early-exit DP instead
    # of the full quadratic table; returns -1 above the threshold
    dist = F.levenshtein(F.col("c_name"), F.col("b_name"), 2)
    return (
        a.join(
            b,
            (F.col("c_nationkey") == F.col("b_nationkey"))
            & (a["_salt"] == b["_salt"])
            & (F.col("c_custkey") < F.col("b_custkey")),
        )
        .withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select(
            F.col("c_custkey").alias("cust_a"),
            F.col("b_custkey").alias("cust_b"),
            F.col("c_nationkey").alias("nation_key"),
            F.col("edit_distance").cast("int").alias("edit_distance"),
        )
    )


#: quadratic-twin execution guard: 20k rows admits every driver/bench
#: SF (sf0.1 customer = 15k) and rejects sf1+ (150k), where the blocked
#: quadratic ran >10 min in the round-5 sweep
_FUZZY_GUARD_ROWS = 20_000


FUZZY_NAMES_SQL = """
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       a.c_nationkey AS nation_key,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


#: all strings within <=2 deletions of the name (the SymSpell / FastSS
#: deletion neighborhood): the original, every 1-deletion, and every
#: 2-deletion variant. ed(a,b) <= 2 implies a and b share at least one
#: common variant (delete the edited positions from each side), so
#: joining on the variant hash is a LOSSLESS candidate generator for
#: edit distance <= 2 — and the buckets are near-dup clusters, not
#: blocks, so the join never goes quadratic in a block size.
#:
#: Generator implementation (round-9 A/B, sf1, local[32], 150k names
#: x ~134 distinct variants each): the nested-HOF native expression
#: (transform/flatten of substring concats) runs on the INTERPRETED
#: expression walker — per-element virtual-call overhead on ~20M
#: string builds — at 36-39 s per materialization; this Arrow-batched
#: pandas_udf producing the same distinct-variant arrays runs 19.0-
#: 19.2 s (~1.9x). Hashing stays JVM-side (xxhash64 after the explode,
#: codegen) so Python only slices strings. Output pinned identical:
#: same 20,168,500 variant rows, same hash checksum, and the
#: end-to-end pair set stays pytest-pinned to the quadratic oracle
#: (test_symspell_equals_quadratic_fuzzy_match).


def _deletion_variants_udf():
    """Arrow pandas_udf producing each name's distinct <=2-deletion
    variant array. Built per call, with the row generator NESTED so
    cloudpickle serializes it BY VALUE: a module-level function is
    pickled by reference and the executor-side Python worker would
    have to `import data_engineering_zoomcamp_projects_spark` — which fails under the
    driver contract, where only the DRIVER process has the repo on
    sys.path (the ml_customer_scores closure convention). Module-level
    decoration is separately impossible: a string-typed pandas_udf
    parses its DDL return type eagerly and needs an active
    SparkContext, so a sessionless registry import would crash."""

    def gen(s: str) -> list:
        out = {s}
        add = out.add
        length = len(s)
        for i in range(length):
            add(s[:i] + s[i + 1 :])
        for i in range(length):
            pre = s[:i]
            for j in range(i + 1, length):
                add(pre + s[i + 1 : j] + s[j + 1 :])
        return list(out)

    @F.pandas_udf("array<string>")
    def dv(names: pd.Series) -> pd.Series:
        return names.map(gen)

    return dv


def dedup_fuzzy_names_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for dedup_fuzzy_names: SymSpell-style deletion-
    neighborhood blocking. Each name emits its <=2-deletion variants
    (~1 + L + L(L-1)/2 rows, hashed to 8 bytes); candidate pairs are
    names sharing any variant hash — an equi-join whose buckets are the
    near-dup clusters themselves — then exact levenshtein verification
    keeps precision at 1. Same result set as the per-block quadratic
    formulation (candidate generation is lossless for ed <= 2), so it
    shares that query's oracle; equality is also pinned by pytest.

    Shuffle discipline (round-8 rewrite, 235 s -> 85 s at sf1): only
    (custkey, nationkey, vh) rides the variant self-join and the
    candidate-dedup exchange — the name strings stay OUT of the
    ~100M-row candidate stream (they multiplied the distinct's shuffle
    bytes ~4x) and are joined back onto the deduped id pairs (output-
    sized, ~60x smaller) for verification. The variant frame is
    localCheckpointed once so the per-name variant generation is not
    re-executed for each side of the self-join. Round 9 swapped the
    generator itself from the interpreted nested-HOF expression to the
    Arrow pandas_udf over `_gen_deletion_variants` (A/B at sf1:
    36-39 s -> 19 s for the variant-frame materialization, output
    bit-identical — see the comment block above the generator);
    hashing stays JVM-side xxhash64.

    Cost model: variant generation is linear (~172 rows/name at L=18)
    and join output is proportional to SHARED-variant multiplicity of
    true matches. The win over the salted quadratic grows with block
    size: a 10^6-name block is 5x10^11 quadratic pairs vs ~1.7x10^8
    variant rows. Both paths stay registered, mirroring the
    exact-Jaccard / MinHash-LSH pairing."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    # widen BEFORE variant generation: the sf1 customer parquet opens
    # as ONE split, so the Arrow variant generator (the ~19 s stage of
    # the round-9 A/B) otherwise runs single-threaded on a 32-core
    # session (the decode_resize lesson, r11; measured 52 -> 26 s
    # end-to-end — the remainder is the candidate-stream exchange, the
    # documented dominant cost). The exchange carries the 150k
    # (key, name, nation) rows — ~6 MB; a real corpus has
    # maxPartitionBytes-sized splits and skips this.
    from ..catalog import widen_if_narrow

    # min_bytes=0: per-row Python variant generation is seconds of
    # work on a frame the optimizer prices under 1 MB after pruning —
    # spread it whenever the scan is narrow
    wide = widen_if_narrow(spark, c, min_bytes=0)
    vh = (
        wide.select(
            "c_custkey",
            "c_nationkey",
            F.explode(_deletion_variants_udf()(F.col("c_name"))).alias("variant"),
        )
        .select("c_custkey", "c_nationkey", F.xxhash64("variant").alias("vh"))
        .localCheckpoint(eager=False)
    )
    # Join strategy pinned to sort-merge (r17, guide §3.1): the
    # checkpointed variant frame is a stats-less ExistingRDD whose
    # size estimate carries over from the PRE-explode plan (~6 MB at
    # sf1), so the planner auto-broadcast what is really a ~20M-row /
    # ~500 MB frame — a hash relation that costs more to build than
    # the shuffle it saves (interleaved A/B at sf1: BHJ 16-30 s vs
    # SMJ/SHJ 6-7 s for the candidate phase) and that scales WITH the
    # corpus, i.e. would blow the 8 GB broadcast cap at deploy scale.
    # SMJ over shuffle-hash: equal measured cost, but the merge side
    # spills gracefully where a per-partition hash build of a
    # corpus-sized side can OOM.
    a, b = vh.alias("a"), vh.alias("b").hint("merge")
    ids = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.vh") == F.col("b.vh"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.col("a.c_nationkey").alias("nation_key"),
        )
        .distinct()
    )
    na = c.select(F.col("c_custkey").alias("cust_a"), F.col("c_name").alias("name_a"))
    nb = c.select(F.col("c_custkey").alias("cust_b"), F.col("c_name").alias("name_b"))
    return (
        ids.join(na, "cust_a")
        .join(nb, "cust_b")
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b", 2))
        .filter(F.col("edit_distance") >= 0)
        .select(
            "cust_a",
            "cust_b",
            "nation_key",
            F.col("edit_distance").cast("int").alias("edit_distance"),
        )
    )


def prep_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary build: top-100 tokens by corpus
    frequency with each prefix's cumulative coverage share — the
    greedy-frequency vocab selection every BPE/unigram trainer starts
    from. Token counts shuffle once on the token; the top-100 head is
    selected with sort+LIMIT (TakeOrderedAndProject — per-partition
    partial top-k, never a global row_number over the full vocabulary);
    the rank and running-coverage windows then run on the bounded
    100-row head only."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    head = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(100)
    return (
        head.withColumn("rank", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "cum_cnt", F.sum("cnt").over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
        )
        .select(
            "rank",
            "token",
            "cnt",
            F.round(
                (F.col("cum_cnt").cast("double") / F.col("total").cast("double")).cast(
                    DEC
                ),
                6,
            )
            .cast("double")
            .alias("coverage"),
        )
        .orderBy("rank")
    )


VOCAB_SQL = """
WITH counts AS (
  SELECT t AS token, COUNT(*) AS cnt
  FROM (SELECT unnest(split(text, ' ')) AS t FROM documents)
  GROUP BY t
), ranked AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                        ROWS UNBOUNDED PRECEDING) AS cum_cnt
  FROM counts
)
SELECT rank, token, CAST(cnt AS BIGINT) AS cnt,
       CAST(ROUND(CAST(CAST(cum_cnt AS DOUBLE)
            / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM counts) AS DECIMAL(38,10)), 6)
            AS DOUBLE) AS coverage
FROM ranked WHERE rank <= 100 ORDER BY rank
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (bucket width 50): the
    one-pass distribution profile run before choosing quantization /
    outlier thresholds. Single scan, one narrow-key shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.floor(F.col("value") / 50).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("sum_value"),
        )
        .orderBy("bucket")
    )


HISTOGRAM_SQL = """
SELECT CAST(FLOOR(value / 50) AS INT) AS bucket,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 1 ORDER BY bucket
"""


CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def prep_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (size 32 tokens, stride 24 —
    8-token overlap): the windowing step before embedding/pretraining
    tokenization. Chunk starts are 1, 1+stride, ... while start <=
    n_tokens - 1 (every token appears in at least one chunk; the last
    chunk may be short). Pure per-row array expressions — embarrassingly
    parallel, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - CHUNK_SIZE).cast("double") / CHUNK_STRIDE).cast("int") + 1,
        F.lit(1),
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * CHUNK_STRIDE + 1
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.array_join(F.slice(toks, s, CHUNK_SIZE), " ").alias("chunk_text"),
            F.least(n - s + 1, F.lit(CHUNK_SIZE)).alias("chunk_tokens"),
        ),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("c.start").alias("start_token"),
            F.col("c.chunk_tokens").cast("int").alias("chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


CHUNK_SQL = f"""
WITH tok AS (SELECT doc_id, split(text, ' ') AS ts FROM documents),
n_chunks AS (
  SELECT doc_id, ts,
         GREATEST(CAST(CEIL(CAST(len(ts) - {CHUNK_SIZE} AS DOUBLE)
                            / {CHUNK_STRIDE}) AS INT) + 1, 1) AS nc
  FROM tok
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {CHUNK_STRIDE} + 1 AS INT) AS start_token,
       CAST(LEAST(len(ts) - (i * {CHUNK_STRIDE} + 1) + 1, {CHUNK_SIZE}) AS INT)
         AS chunk_tokens,
       array_to_string(ts[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_SIZE})], ' ')
         AS chunk_text
FROM n_chunks,
     (SELECT unnest(generate_series(0,
        (SELECT MAX(nc) - 1 FROM n_chunks))) AS i) g
WHERE i < nc
"""


#: target mixing weights per source (the data-mixing recipe; sources
#: not listed get weight 0 and are excluded from the mix)
MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
MIX_BUDGET_FRACTION = 0.1  # total docs selected = 10% of corpus


def prep_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing selection: pick a per-source quota of documents so
    the selected corpus matches target source weights under a total
    budget. Quota_s = round(corpus_size x budget_fraction x weight_s),
    capped implicitly by the source's size; selection within a source
    is deterministic (lowest doc_id first — at deploy, rank by quality
    score or stable hash). Returns the per-source census of the mix.

    The quota arithmetic runs IN-ENGINE on both sides with the same
    left-associated multiply order (count x fraction x weight), so the
    rounded quotas agree bit-for-bit with the oracle at any corpus
    size — a driver-side int(round(...)) would round differently."""
    from ..operators.distrank import ranked

    d = load_table(spark, sf_dir, "documents")
    weight = F.create_map(
        *[
            x
            for s, w in sorted(MIX_WEIGHTS.items())
            for x in (F.lit(s), F.lit(float(w)))
        ]
    )
    total = d.agg(F.count(F.lit(1)).alias("_total"))
    # per-source row_number via the distributed rank toolkit — a window
    # partitioned by `source` (a handful of values) would funnel
    # |corpus|/|sources| rows through one task. Token counts are
    # computed BEFORE the range shuffle so the text payload never
    # travels through it.
    sized = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("_ntok")
    )
    picked = (
        ranked(sized, ["source"], [F.col("doc_id").asc()], out="rn")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "q",
            F.round(
                F.col("_total") * MIX_BUDGET_FRACTION
                * F.coalesce(weight[F.col("source")], F.lit(0.0))
            ),
        )
        .filter(F.col("rn") <= F.col("q"))
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("_ntok").cast("long").alias("sel_tokens"),
            F.max("rn").cast("long").alias("quota_used"),
        )
        .orderBy("source")
    )


def _mix_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN CAST({w} AS DOUBLE)" for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
WITH ranked AS (
  SELECT source, doc_id, text,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
  FROM documents
)
SELECT source, COUNT(*) AS n_selected,
       CAST(SUM(len(split(text, ' '))) AS BIGINT) AS sel_tokens,
       CAST(MAX(rn) AS BIGINT) AS quota_used
FROM ranked
WHERE rn <= ROUND((SELECT COUNT(*) FROM documents) * {MIX_BUDGET_FRACTION}
                  * (CASE source {cases} ELSE CAST(0 AS DOUBLE) END))
GROUP BY source ORDER BY source
"""


MIX_SQL = _mix_sql()


QUERIES = {
    "prep_source_mixing": prep_source_mixing,
    "prep_chunk_documents": prep_chunk_documents,
    "text_redact_sensitive": text_redact_sensitive,
    "text_repetition_scores": text_repetition_scores,
    "dedup_fuzzy_names": dedup_fuzzy_names,
    "dedup_fuzzy_names_symspell": dedup_fuzzy_names_symspell,
    "prep_vocab_topk": prep_vocab_topk,
    "events_value_histogram": events_value_histogram,
}

ORACLES = {
    "prep_source_mixing": MIX_SQL,
    "prep_chunk_documents": CHUNK_SQL,
    "text_redact_sensitive": REDACT_SQL,
    "text_repetition_scores": REPETITION_SQL,
    "dedup_fuzzy_names": FUZZY_NAMES_SQL,
    # symspell shares the quadratic path's oracle (lossless candidates)
    "dedup_fuzzy_names_symspell": FUZZY_NAMES_SQL,
    "prep_vocab_topk": VOCAB_SQL,
    "events_value_histogram": HISTOGRAM_SQL,
}
