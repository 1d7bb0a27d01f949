"""Differential test: every workload query vs its DuckDB oracle.

This is a local replica of the driver's correctness gate
(CORRECTNESS_r{N}.json): row count + column set + order-insensitive
value comparison at sf0.001. Queries without an oracle get a
rows-run smoke check.
"""

from __future__ import annotations

import pytest

from python_openetl_spark.workload import all_oracles, all_queries
from python_openetl_spark.testing import assert_frames_match
from tests.conftest import SF_DIR

QUERIES = all_queries()
ORACLE = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    # scale lint: no workload plan may contain an unpruned cartesian
    # product (broadcast-nested-loop with a 1-row/stats build side is
    # fine; CartesianProduct is the O(n*m) shuffle one)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in ORACLE:
        assert df.count() >= 0  # rows-only smoke (non-SQL-expressible op)
        return
    spark_pdf = df.toPandas()
    oracle_pdf = duck.execute(ORACLE[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_every_oracle_has_query():
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"
