"""Determinism checks for rows-only extras (sampling, approx sketches)."""

from __future__ import annotations

from data_engineering_zoomcamp_projects_spark.operators import extras


def test_seeded_sample_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, extras.sample_fraction(spark, sf_dir).collect()))
    b = sorted(map(tuple, extras.sample_fraction(spark, sf_dir).collect()))
    assert a == b
    assert len(a) > 0


def test_approx_percentile_close_to_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: r["median"]
        for r in extras.agg_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_median"]
        for r in extras.agg_percentile_approx(spark, sf_dir).collect()
    }
    for flag, med in exact.items():
        assert abs(approx[flag] - med) / med < 0.05
