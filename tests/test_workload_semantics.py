"""Semantic checks for queries without a SQL oracle: approx-aggregate
error bounds vs their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.io import load_table
from python_openetl_spark.workload.relational import q28_approx_aggs
from tests.conftest import SF_DIR


def test_approx_aggs_within_error_bounds(spark):
    approx = {r["o_orderstatus"]: r for r in q28_approx_aggs(spark, SF_DIR).collect()}
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderstatus"]: r
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("nd"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for status, row in approx.items():
        nd = exact[status]["nd"]
        assert abs(row["approx_customers"] - nd) <= max(3, 0.05 * nd)
        # approx median within 2% relative of the exact interpolated one
        assert abs(row["approx_pcts"][1] - exact[status]["p50"]) <= 0.02 * exact[status]["p50"]
