"""Semantic checks for queries without a SQL oracle: approx-aggregate
error bounds vs their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.io import load_table
from python_openetl_spark.workload.relational import q28_approx_aggs
from tests.conftest import SF_DIR


def test_train_test_split_disjoint_and_stable(spark):
    from python_openetl_spark.operators.sampling import train_test_split

    d = load_table(spark, SF_DIR, "documents").select("doc_id")
    train, test = train_test_split(d, "doc_id", test_fraction=0.2)
    n, ntr, nte = d.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.join(test, "doc_id").count() == 0  # hash-disjoint
    assert 0.1 * n <= nte <= 0.3 * n
    # growth stability: membership of existing keys never flips
    grown = d.unionByName(d.select((F.col("doc_id") + 10_000_000).alias("doc_id")))
    _, test2 = train_test_split(grown, "doc_id", test_fraction=0.2)
    old_test2 = test2.filter(F.col("doc_id") < 10_000_000)
    assert sorted(r["doc_id"] for r in old_test2.collect()) == sorted(
        r["doc_id"] for r in test.collect()
    )


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
        assert abs(row["p50"] - exact[status]["p50"]) <= 0.02 * exact[status]["p50"]
        assert row["p25"] <= row["p50"] <= row["p75"]
