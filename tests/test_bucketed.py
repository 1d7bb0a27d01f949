"""Bucketed tables: the co-located join must plan with no Exchange
below the join (the write-time shuffle replaces every join-time one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.io import load_table
from python_openetl_spark.plans.bucketed import colocated_join, seed_bucketed
from tests.conftest import SF_DIR


@pytest.fixture()
def bucketed_tables(spark, tmp_path_factory):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # the sf0.001 tables are broadcast-sized, which would sidestep the
    # bucketed sort-merge path entirely — force SMJ for the plan checks
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    seed_bucketed(o, "b_orders", bucket_by="o_orderkey", num_buckets=8, sort_by="o_orderkey")
    seed_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        bucket_by="o_orderkey",
        num_buckets=8,
        sort_by="o_orderkey",
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    joined = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it is still a correct join
    want = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .count()
    )
    assert joined.count() == want


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
