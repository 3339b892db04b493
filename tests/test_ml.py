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
