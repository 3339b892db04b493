"""Oracle-differential test over every registered query (driver-gate twin).

Runs at sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to reproduce the exact driver gate."""

from __future__ import annotations

import pytest

from data_engineering_zoomcamp_projects_spark.registry import all_oracles, all_queries

from .oracle import compare, run_oracle

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    qdf = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        # rows-only check, mirroring the driver's weaker path
        assert qdf.count() >= 0
        return
    opdf = run_oracle(_ORACLES[name], sf_dir)
    problems = compare(qdf, opdf, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
