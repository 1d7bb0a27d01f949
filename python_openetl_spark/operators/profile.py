"""Column profiling: per-column quality stats in one scan.

ETL hygiene the reference leaves to the human (its only schema
introspection is the information_schema read at
/root/reference/pyopenetl/operations.py:233-287): row count, null
count, distinct count, numeric min/max for every column, as *rows* —
(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) — so the
profile of a 1000-column table is queryable like any other table.

Plan shape: ONE aggregation over the data computing all per-column
stats as columns of a single row, then a driver-side-free explode of
that row into the long format (the explode input is one row, so the
"unpivot" costs nothing). Exact COUNT(DISTINCT) over many columns uses
Spark's Expand (rows × columns during the aggregate) — the faithful,
oracle-checkable default; pass ``approx=True`` to switch to
HyperLogLog++ sketches (no Expand, one combined pass) for wide tables
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(df: DataFrame, cols: list[str] | None = None, *, approx: bool = False) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = cols or list(fields)
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = isinstance(fields[c], _NUMERIC)
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            distinct(F.col(c)).alias(f"__dist_{c}"),
            (F.min(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"__min_{c}"),
            (F.max(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
