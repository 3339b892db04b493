"""ML-operator behavior tests beyond the registry differential
(test_oracle_parity covers every registered entry's oracle parity;
these pin properties the differential can't see)."""

from __future__ import annotations

import duckdb


def test_tqc_features_arrow_equals_native(spark):
    """The registered Arrow feature pass must emit row-identical
    (doc_id, y, x0..x7) to the all-native explode twin — md5 buckets,
    stopword label, and the float division all bit-equal."""
    from data_engineering_zoomcamp_projects_spark.ml import (
        _tqc_features,
        _tqc_features_native,
    )

    sf = "/root/testdata/sf0.01"
    arrow = {r["doc_id"]: tuple(r) for r in _tqc_features(spark, sf).collect()}
    native = {
        r["doc_id"]: tuple(r) for r in _tqc_features_native(spark, sf).collect()
    }
    assert len(arrow) > 0
    assert arrow == native


def test_quality_classifier_learns_separable_corpus(spark, tmp_path):
    """text_quality_classifier's honest-learnability contract: on the
    synthetic corpus the teacher label is nearly independent of the
    8-bucket hashed features (the registered entry certifies the exact
    TRAINING loop, docstring note), so THIS test proves the same
    machinery actually learns when the classes separate — a corpus
    where stopword-rich and stopword-free documents have disjoint
    bigram sets trains to >=95% in the same 3 lattice-GD iterations,
    and the DuckDB oracle chain agrees bit-for-bit on the constructed
    corpus too (not just the shipped test SFs)."""
    from data_engineering_zoomcamp_projects_spark.ml import (
        _tqc_sql,
        text_quality_classifier,
    )

    from .oracle import compare

    docs = []
    for k in range(50):
        # 50% stopword tokens -> y=1; bigrams {"the cat", "cat the"}
        docs.append((2 * k, ("the cat " * 20).strip(), "en", "s1", 159))
        # 0% stopwords -> y=0; bigrams {"dog cat", "cat dog"}
        docs.append((2 * k + 1, ("dog cat " * 20).strip(), "en", "s1", 159))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    row = text_quality_classifier(spark, str(tmp_path)).collect()[0]
    assert row["n"] == 100
    assert row["n_pos"] == 50
    # majority-class would score 50; separable classes must train out
    assert row["n_correct"] >= 95

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    problems = compare(
        text_quality_classifier(spark, str(tmp_path)),
        con.execute(_tqc_sql()).fetchdf(),
        "tqc-separable",
    )
    con.close()
    assert not problems, "\n".join(problems)


def test_kmeans_centroid_disk_cache_roundtrip(spark, sf_dir):
    """r12 (verdict item 4): the trained Lloyd centroids persist to a
    per-(sf_dir, data-fingerprint) JSON so fresh sessions skip the
    3-round training loop. Pins: (a) the reloaded model is
    bit-identical to the trained one, (b) a corrupted cache falls
    through to retraining and produces the same model, (c) the
    fingerprint includes the hyperparameters."""
    import json
    import os

    from data_engineering_zoomcamp_projects_spark import ml

    trained = ml.kmeans_trained_centroids(spark, sf_dir)
    path, fp = ml._kmeans_cache_path(sf_dir)
    assert os.path.exists(path)
    assert f":{ml.KMEANS_K}:{ml.KMEANS_ITERS}:{ml.KMEANS_SCALE}" in fp

    # fresh-session shape: memo cleared -> must come back from disk,
    # bit-identical (no Spark job needed, but equality is the pin)
    ml._KMEANS_MEMO.clear()
    reloaded = ml.kmeans_trained_centroids(spark, sf_dir)
    assert reloaded == trained

    # corrupted cache degrades to retraining, same deterministic model
    with open(path, "w") as fh:
        fh.write("{not json")
    ml._KMEANS_MEMO.clear()
    retrained = ml.kmeans_trained_centroids(spark, sf_dir)
    assert retrained == trained
    # and the retrain re-persisted a valid cache
    with open(path) as fh:
        assert json.load(fh)["fp"] == fp


def test_kmeans_k_for_scale_rule():
    """kmeans_k_for holds expected cell size ~KMEANS_CELL_TARGET with
    KMEANS_K as the floor: every certification SF (<= 2000 embeddings)
    derives exactly the floor — so their plans, cached models, and the
    import-time k=8 oracle SQL are untouched — while the big local SFs
    derive paper-faithful larger k (the r15 verdict's one scale
    killer: fixed k=8 made within-cell pair volume quadratic in n)."""
    from data_engineering_zoomcamp_projects_spark import ml

    assert ml.kmeans_k_for(500) == ml.KMEANS_K  # sf0.001 / sf0.01
    assert ml.kmeans_k_for(2000) == ml.KMEANS_K  # sf0.1
    assert ml.kmeans_k_for(20000) == 20000 // ml.KMEANS_CELL_TARGET
    assert ml.kmeans_k_for(200000) == 200000 // ml.KMEANS_CELL_TARGET
    # cell size stays bounded by ~the target as n grows 100x (floor
    # division overshoots by at most target/k)
    for n in (2_000_000, 20_000_000):
        assert n / ml.kmeans_k_for(n) <= ml.KMEANS_CELL_TARGET * 1.01


def test_kmeans_assign_udf_bit_identical_to_hof_and_python(spark, sf_dir):
    """The Arrow-batched int64 assignment (the derived-k path) is
    BIT-IDENTICAL to (a) the literal-HOF argmin on the same 8-centroid
    model and (b) a driver-side exact-python argmin on a forced
    17-centroid model — distances and tie-breaks included. This is
    what licenses serving either path interchangeably: everything
    stays on the integer lattice where numpy int64 is exact."""
    from data_engineering_zoomcamp_projects_spark import ml

    e = ml.kmeans_quantized(spark, sf_dir).localCheckpoint(eager=False)
    rows = {int(r["vec_id"]): [int(x) for x in r["vq"]] for r in e.collect()}
    assert len(rows) > 100

    # (a) same trained 8-centroid model through both implementations
    cents8 = ml.kmeans_trained_centroids(spark, sf_dir)
    assert len(cents8) == ml.KMEANS_K
    hof = {
        int(r["vec_id"]): (int(r["cell"]), int(r["dist"]))
        for r in ml.kmeans_assign_frame(e, cents8).collect()
    }
    staged = e.select(
        "vec_id", ml._kmeans_assign_udf(cents8)(ml.F.col("vq")).alias("b")
    )
    udf8 = {
        int(r["vec_id"]): (int(r["b"]["cent_id"]), int(r["b"]["dist"]))
        for r in staged.collect()
    }
    assert udf8 == hof

    # (b) forced 17-centroid model (> floor, so kmeans_assign_frame
    # itself routes to the UDF) vs exact python
    seed_ids = sorted(rows)[:17]
    cents17 = [(i, rows[i]) for i in seed_ids]
    got = {
        int(r["vec_id"]): (int(r["cell"]), int(r["dist"]))
        for r in ml.kmeans_assign_frame(e, cents17).collect()
    }
    for vid, vq in rows.items():
        best = min(
            (
                (sum((x - y) * (x - y) for x, y in zip(vq, cq)), cid)
                for cid, cq in cents17
            )
        )
        assert got[vid] == (best[1], best[0]), vid


def test_semdedup_and_kmeans_oracle_parity_at_derived_k(spark, sf_dir):
    """The r16 derived-k honesty check: force the derivation ABOVE the
    floor (cell target 50 -> k=10 on the 500-row corpus) and prove the
    WHOLE chain — numpy-assigned training rounds, final assignments,
    SemDeDup's within-cell pruning — still hash-matches the DuckDB
    oracle rendered at the same k. This is the claim the registered
    floor-k oracle can't test: the lattice Lloyd loop is
    engine-reproducible at ANY k, so big-SF runs at derived k compute
    exactly what the oracle semantics say."""
    import duckdb

    from data_engineering_zoomcamp_projects_spark import ml
    from data_engineering_zoomcamp_projects_spark.llm.dedup import (
        _semdedup_sql,
        dedup_semantic_semdedup,
    )

    from .oracle import compare

    old_target = ml.KMEANS_CELL_TARGET
    ml.KMEANS_CELL_TARGET = 50
    ml._KMEANS_MEMO.clear()
    try:
        k = ml.kmeans_k_for(500)
        assert k == 10
        cents = ml.kmeans_trained_centroids(spark, sf_dir)
        assert len(cents) == 10

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        problems = compare(
            dedup_semantic_semdedup(spark, sf_dir),
            con.execute(_semdedup_sql(k)).fetchdf(),
            "semdedup-k10",
        )
        # the shared model surface too: cluster sizes + exact inertia
        problems += compare(
            ml.ml_kmeans_embeddings(spark, sf_dir),
            con.execute(
                f"""
{ml.kmeans_chain_sql(k)}
SELECT cell AS cluster_id, COUNT(*) AS n_members,
       CAST(SUM(dist) AS BIGINT) AS inertia_q
FROM a{ml.KMEANS_ITERS} GROUP BY cell ORDER BY cluster_id
"""
            ).fetchdf(),
            "kmeans-k10",
        )
        con.close()
        assert not problems, "\n".join(problems)
    finally:
        ml.KMEANS_CELL_TARGET = old_target
        ml._KMEANS_MEMO.clear()
