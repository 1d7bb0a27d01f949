"""Round-5 incremental additions, batch 2: bucketed co-located join as
a driver-checked verb.

- m17: the K5 index-replication scale story end-to-end — seed orders
  and customer as SAME-KEY bucketed catalog tables (plans/bucketed.py,
  external location in a temp dir so the process cwd stays clean),
  join them through ``colocated_join``, aggregate. The bucketed write
  is the ingest-time shuffle that every later join on the key skips;
  the zero-Exchange sort-merge plan property is asserted in
  tests/test_bucketed.py (with broadcast disabled — at fixture scale
  AQE correctly prefers a broadcast join, which is also shuffle-free).
  The oracle states the same join + aggregate over the raw tables, so
  a bucketed write that drops/duplicates rows hash-mismatches.

Registered after ``relational5`` in ``_MODULES``; locally oracle-gated
now, rotates into ``_WINDOW_R6``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.workload.util import dsum, t


def m17_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_openetl_spark.plans.bucketed import colocated_join, seed_bucketed

    base = tempfile.mkdtemp(prefix="poe_m17_")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice", "o_orderpriority"
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    seed_bucketed(
        orders, "m17_orders", bucket_by="custkey", num_buckets=8,
        sort_by="custkey", path=base + "/orders",
    )
    seed_bucketed(
        cust, "m17_customer", bucket_by="custkey", num_buckets=8,
        sort_by="custkey", path=base + "/customer",
    )
    joined = colocated_join(spark, "m17_orders", "m17_customer", on="custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


QUERIES = {
    "m17_bucketed_colocated_join": m17_bucketed_colocated_join,
}

ORACLE = {
    "m17_bucketed_colocated_join": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
}
