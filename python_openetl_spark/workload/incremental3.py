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


_CUTOFF = "2000-01-01"


def m18_cdc_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance WITH retractions
    (operators/rollup.py apply_cdc_rollup over
    merge.snapshot_diff(include_old=True)): the per-status order
    rollup is maintained through a planted I/U/D wave where updates
    BOTH change the sum (price doubled) and MIGRATE rows to a new
    group (status flipped to 'X') — the oracle recomputes the rollup
    from the new snapshot, so the maintenance path must equal a full
    recompute bit-for-bit (sums kept in DECIMAL until the final
    cast)."""
    from python_openetl_spark.operators.merge import snapshot_diff
    from python_openetl_spark.operators.rollup import apply_cdc_rollup

    o = t(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ltz")
    old = o.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    kept = (
        old.filter(F.col("o_orderkey") % 3 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    inserted = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = kept.unionByName(inserted)
    cdc = snapshot_diff(old, new, "o_orderkey", include_old=True)
    rollup_old = old.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("sum_o_totalprice"),
    )
    maintained = apply_cdc_rollup(
        rollup_old, cdc, ["o_orderstatus"], ["o_totalprice"]
    )
    return maintained.select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_o_totalprice").cast("double").alias("revenue"),
    )


QUERIES = {
    "m17_bucketed_colocated_join": m17_bucketed_colocated_join,
    "m18_cdc_rollup_maintenance": m18_cdc_rollup_maintenance,
}

ORACLE = {
    "m17_bucketed_colocated_join": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    # full recompute over the planted new snapshot: the maintenance
    # path (retract before-images, apply after-images) must equal it
    "m18_cdc_rollup_maintenance": f"""
        WITH old AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
        ),
        kept AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                 CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
          FROM old WHERE o_orderkey % 3 <> 0
        ),
        ins AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
        ),
        new AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
        SELECT o_orderstatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM new GROUP BY 1
    """,
}
