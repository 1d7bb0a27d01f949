"""Fixture / table IO.

Loads the driver's deterministic parquet tables
(``/root/testdata/sf*/{name}.parquet``; see TESTDATA.md) and registers
them as temp views so both the DataFrame API and ``spark.sql`` paths
work. This is the engine's Parquet *source* — the Spark-native
replacement for the reference's chunked full-table scans
(`/root/reference/pyopenetl/operations.py:39-67`): ``spark.read.parquet``
already gives partitioned, column-pruned, predicate-pushed scans, so no
chunk loop exists.

Nanosecond timestamps: the fixture ``events`` table stores parquet
TIMESTAMP(NANOS), which Spark's parquet reader rejects outright. With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by session.tune_session)
the column arrives as epoch-nanos LongType; we convert to TimestampType
by integer division to micros — the same truncation DuckDB applies, so
oracle comparisons agree. The conversion happens executor-side inside
the scan projection (no driver materialization), so it scales to any
table size.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_openetl_spark.session import tune_session

#: The full fixture set (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (from the file footer)."""
    try:
        schema = pq.read_schema(_one_parquet_file(path))
    except Exception:
        return []
    cols = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            cols.append(field.name)
    return cols


def _one_parquet_file(path: str) -> str:
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
    return path


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing nanosecond timestamps."""
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _nano_timestamp_columns(path):
        field = df.schema[col] if col in df.columns else None
        if field is not None and isinstance(field.dataType, T.LongType):
            # epoch nanos → micros. Integer `div`, NOT floor(x/1000): the
            # double division loses precision at epoch-nano magnitude
            # (2^53 < 1.7e18), which showed up as ±1µs vs DuckDB's cast.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view for spark.sql."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
