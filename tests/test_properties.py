"""Property-based spot checks (SURVEY.md §5 strategy #5) — invariants
that must hold for ANY data, exercised via hypothesis on small inline
frames (few examples: each example pays Spark job latency)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # group key
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=_rows)
@_SETTINGS
def test_topk_subset_of_group(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("k"))
    topk = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    all_rows = {tuple(r) for r in df.collect()}
    for r in topk.drop("rn").collect():
        assert tuple(r) in all_rows
    # at most 2 per group
    counts = topk.groupBy("k").count().collect()
    assert all(r["count"] <= 2 for r in counts)


@given(a=_rows, b=_rows)
@_SETTINGS
def test_union_counts_add(spark, a, b):
    da = spark.createDataFrame(a, "k int, v int")
    db = spark.createDataFrame(b, "k int, v int")
    assert da.unionByName(db).count() == len(a) + len(b)


@given(rows=_rows)
@_SETTINGS
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert once.count() == twice.count()
    assert once.count() == len({k for k, _ in rows})


@given(rows=_rows)
@_SETTINGS
def test_decimal_sum_invariant_under_repartition(spark, rows):
    """The parity canonicalization must be partitioning-invariant —
    this is the property the whole oracle gate rests on."""
    df = spark.createDataFrame(rows, "k int, v int")
    dec = F.sum((F.col("v") / 7.0).cast("decimal(38,10)")).alias("s")
    one = sorted(map(tuple, df.coalesce(1).groupBy("k").agg(dec).collect()))
    many = sorted(map(tuple, df.repartition(7).groupBy("k").agg(dec).collect()))
    assert one == many


@given(rows=_rows)
@_SETTINGS
def test_upsert_idempotent(spark, rows):
    from data_engineering_zoomcamp_projects_spark.ingest.upsert import upsert

    target = spark.createDataFrame(rows, "k int, v int")
    updates = spark.createDataFrame([(k, v + 1) for k, v in rows[:5]], "k int, v int")
    once = upsert(target.dropDuplicates(["k"]), updates.dropDuplicates(["k"]), "k")
    twice = upsert(once, updates.dropDuplicates(["k"]), "k")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
