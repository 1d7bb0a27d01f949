"""operators/ranking.py — distributed global rank/NTILE parity.

The operator must reproduce the exact integers of the partitionless
windows it replaces (row_number / NTILE over a global ORDER BY), and
the plans that use it must contain no partitionless Window node.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from python_openetl_spark.operators.ranking import global_ntile, global_row_number
from tests.conftest import SF_DIR


def assert_no_partitionless_window(df) -> None:
    """Every Window node in the executed plan must carry a partition
    spec (format: ``Window [exprs], [partition], [order]`` — a
    partitionless node prints only two bracket groups)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        seps = len(re.findall(r"\], \[", line))
        assert seps >= 2, f"partitionless Window in plan: {line.strip()}"


def _rand_df(spark, n: int, seed: int):
    rng = random.Random(seed)
    # deliberate heavy ties: values drawn from a small domain
    rows = [(i, float(rng.choice([1.0, 2.5, 2.5, 7.0, 7.0, 9.75]))) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v double")


@pytest.mark.parametrize("n,desc", [(103, True), (103, False), (3, True)])
def test_global_row_number_matches_window(spark, n, desc):
    df = _rand_df(spark, n, seed=n)
    got, total = global_row_number(
        df, "v", ["id"], descending=desc, bands=7, out_col="rn"
    )
    assert total == n
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id").asc()]
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert {(r.id, r.rn) for r in got.collect()} == {
        (r.id, r.rn) for r in want.collect()
    }
    assert_no_partitionless_window(got)


@pytest.mark.parametrize("n,k", [(103, 7), (103, 10), (9, 10), (200, 10)])
def test_global_ntile_matches_window(spark, n, k):
    df = _rand_df(spark, n, seed=n * 31 + k)
    got = global_ntile(df, "v", ["id"], k=k, bands=5, out_col="b")
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    want = df.withColumn("b", F.ntile(k).over(w))
    assert {(r.id, r.b) for r in got.collect()} == {
        (r.id, r.b) for r in want.collect()
    }
    assert_no_partitionless_window(got)


def test_empty_frame(spark):
    df = spark.createDataFrame([], "id long, v double")
    got, total = global_row_number(df, "v", ["id"])
    assert total == 0 and got.count() == 0


def test_q66_plan_is_window_free_at_fact_scale(spark):
    """The verdict's task: q66's decile assignment must not funnel the
    per-customer rollup through a single-partition window."""
    from python_openetl_spark.workload.relational5 import q66_customer_value_deciles

    df = q66_customer_value_deciles(spark, SF_DIR)
    assert_no_partitionless_window(df)
    assert df.count() == 10


@pytest.mark.parametrize("desc", [True, False])
def test_null_values_band_with_their_sort_position(spark, desc):
    """NULLs must rank where Spark's sort puts them (LAST for DESC,
    FIRST for ASC) — the hostile-fixture regression: a NULL banded
    first in a DESC ranking shifts every rank after it."""
    rows = [(1, 5.0), (2, None), (3, 1.0), (4, None), (5, 9.0), (6, 5.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    got, total = global_row_number(df, "v", ["id"], descending=desc, bands=3, out_col="rn")
    assert total == 6
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id").asc()]
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert {(r.id, r.rn) for r in got.collect()} == {
        (r.id, r.rn) for r in want.collect()
    }


def test_all_null_values_still_rank_by_tiebreaker(spark):
    df = spark.createDataFrame([(3, None), (1, None), (2, None)], "id long, v double")
    got, total = global_row_number(df, "v", ["id"], out_col="rn")
    assert total == 3
    assert {(r.id, r.rn) for r in got.collect()} == {(1, 1), (2, 2), (3, 3)}


@pytest.mark.parametrize(
    "module,qname",
    [
        ("relational", "q05_top_order_per_customer"),
        ("llm", "x01_cosine_topk"),
        ("llm10", "x14_filtered_topk"),
    ],
)
def test_topk_plans_use_window_group_limit(spark, module, qname):
    """rank()<=k filters must push INTO the window sort
    (WindowGroupLimit, Spark 3.5+): each partition keeps a k-sized heap
    instead of fully sorting — the difference between top-k and a full
    per-group sort at 100x the rows. A plan that loses this (e.g. a
    column rename between the window and the filter) silently reverts
    to full sorts."""
    import importlib

    m = importlib.import_module(f"python_openetl_spark.workload.{module}")
    df = m.QUERIES[qname](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, f"{qname} lost the group-limit pushdown"
