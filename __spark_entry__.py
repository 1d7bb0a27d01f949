"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual workload lives in ``python_openetl_spark.workload`` — one
module per operator family (relational, incremental maintenance,
LLM-data ops, streaming batch-equivalents), each declaring its Spark
implementation and its DuckDB oracle side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark import workload
from python_openetl_spark.workload.relational import q04_revenue_by_nation


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join over the full fixture schema: lineitem ⋈ orders shuffles
    once on the order key; customer/nation/region dims broadcast; exact
    decimal revenue aggregation.
    """
    return q04_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workload.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted → rows-only check)."""
    return workload.all_oracles()
