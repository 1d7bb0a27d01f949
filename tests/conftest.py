"""Shared Spark session + fixture-table helpers for the test suite."""

from __future__ import annotations

import duckdb
import pytest

from python_openetl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _slow_ids() -> frozenset[str]:
    import os

    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as fh:
            return frozenset(
                line.strip() for line in fh if line.strip() and not line.startswith("#")
            )
    except OSError:
        return frozenset()


def pytest_collection_modifyitems(config, items):
    """Fast-tier gate: tests measured > ~4s of call time (tests/slow_tests.txt,
    regenerated from a full --durations=0 run) are marked ``slow`` so the
    default ``-m "not slow"`` run finishes inside a verification budget.
    Marking is data-driven rather than decorator-by-decorator so the list can
    be refreshed wholesale when timings drift."""
    slow = _slow_ids()
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("python_openetl_spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle connection with fixture views registered (sf0.001)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
