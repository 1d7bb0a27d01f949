"""Skew operators: salted join/distinct-count equivalence to their
plain counterparts on a deliberately skewed dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.operators.skew import (
    key_skew_stats,
    salted_distinct_count,
    salted_join,
)


def _skewed(spark):
    # 10k rows on key 1 (hot), 100 spread over keys 2..11
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") % 10 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_key_skew_stats(spark):
    stats = key_skew_stats(_skewed(spark), "k", top=3).collect()
    assert stats[0]["k"] == 1 and stats[0]["n_rows"] == 10_000
    assert stats[0]["share"] > 0.98


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.range(12).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))
    for how in ("inner", "left"):
        plain = left.join(right, "k", how).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        salted = salted_join(left, right, "k", how=how, salt=8).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
        )
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_distinct_count(spark):
    df = _skewed(spark).withColumn("v", F.col("v") % 997)  # repeated values
    want = sorted(
        map(tuple, df.groupBy("k").agg(F.count_distinct("v").alias("n_distinct_v")).collect())
    )
    got = sorted(map(tuple, salted_distinct_count(df, "k", "v", salt=16).collect()))
    assert want == got
