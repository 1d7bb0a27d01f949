"""Physical-plan assertions: the optimizer behaviors COVERAGE.md claims
(filter pushdown to the scan, column pruning, broadcast dims) hold on
the real workload plans — not just by construction."""

from __future__ import annotations

from python_openetl_spark.workload.relational import (
    q00_full_scan,
    q01_pricing_summary,
    q04_revenue_by_nation,
    q14_in_list,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = _plan(q01_pricing_summary(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_in_list_pushdown(spark):
    plan = _plan(q14_in_list(spark, SF_DIR))
    assert "In(l_orderkey" in plan, plan


def test_column_pruning(spark):
    plan = _plan(q00_full_scan(spark, SF_DIR))
    # scan must read only the 3 projected columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert cols == ["n_nationkey", "n_name", "n_regionkey"], plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(q04_revenue_by_nation(spark, SF_DIR))
    # customer, nation, region all broadcast; only the fact-fact join shuffles
    assert plan.count("BroadcastHashJoin") >= 3, plan
