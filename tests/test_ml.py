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
