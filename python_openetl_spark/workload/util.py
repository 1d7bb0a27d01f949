"""Shared helpers for workload queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.io import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col: Column | str, scale: int = 6, precision: int = 24) -> Column:
    """Exact, order-independent sum of a double column.

    Cast each value to DECIMAL before summing so the aggregate is exact
    decimal arithmetic — reproducible across partitionings and engines —
    then return DOUBLE. (A plain double SUM depends on reduction order,
    which a distributed engine does not guarantee.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(24,{scale})")).cast("double")
        / F.count(c)
    )
