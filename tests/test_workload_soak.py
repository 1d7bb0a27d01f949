"""Opt-in full-scale differential soak: every workload query vs its
DuckDB oracle at sf0.1 (10x the regular oracle fixture).

Value divergences that only materialize with more rows — float-tie
rank flips, range-frame ties between closely-spaced timestamps,
approximate-operator recall floors — surface here first: the round-4
soak caught four (q50's seconds-truncated RANGE key, x04/d14's LSH
recall dropping below 1.0, x09's PQ recall floor). Run with

    SPARK_GRAFT_SOAK=1 python -m pytest tests/test_workload_soak.py

(~15 min single-machine; skipped by default so the regular suite stays
fast).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from python_openetl_spark.testing import assert_frames_match
from python_openetl_spark.workload import all_oracles, all_queries
from tests.conftest import TABLE_NAMES

SOAK_DIR = os.environ.get("SPARK_GRAFT_SOAK_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SOAK"),
    reason="full-scale soak is opt-in: set SPARK_GRAFT_SOAK=1",
)

QUERIES = all_queries()
ORACLE = all_oracles()


@pytest.fixture(scope="module")
def soak_duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{SOAK_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_at_scale(name, spark, soak_duck):
    df = QUERIES[name](spark, SOAK_DIR)
    if name not in ORACLE:
        assert df.count() >= 0
        return
    assert_frames_match(
        df.toPandas(), soak_duck.execute(ORACLE[name]).df(), f"soak:{name}"
    )
