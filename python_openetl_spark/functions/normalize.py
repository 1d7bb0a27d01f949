"""Type normalization — the reference's only "transform".

Reference semantics (`/root/reference/pyopenetl/operations.py:120-128`):
``convert_column_types`` coerces every column whose name contains the
substring ``"_at"`` with ``pd.to_datetime(errors="coerce")`` (unparseable
→ NULL), then lets pandas infer nullable dtypes. We reproduce the
*intent* — timestamp normalization of designated columns with
NULL-on-failure coercion — using suffix matching by default (the
reference's substring match would also hit e.g. ``flat_attribute``;
callers can opt into the permissive mode).

Also carries the reference's Postgres→engine type map
(`operations.py:243-259`) re-targeted at Spark types, fixing the
reference's tstz→TSTZRANGE bug (`operations.py:256`) by mapping scalar
``timestamp with time zone`` to TimestampType.

All of this is executor-side column expressions — `to_timestamp` is
already NULL-on-failure, identical to the pandas coerce semantics, and
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Postgres type name → Spark type. Reference dict:
#: /root/reference/pyopenetl/operations.py:243-259 (15 entries).
PG_TO_SPARK: dict[str, T.DataType] = {
    "bigint": T.LongType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "double precision": T.DoubleType(),
    "numeric": T.DecimalType(38, 18),
    "boolean": T.BooleanType(),
    "character varying": T.StringType(),
    "text": T.StringType(),
    "date": T.DateType(),
    "timestamp without time zone": T.TimestampNTZType(),
    # reference maps this to TSTZRANGE (a bug); scalar intent is timestamp
    "timestamp with time zone": T.TimestampType(),
    "ARRAY": T.ArrayType(T.StringType()),
    "jsonb": T.StringType(),  # semi-structured; query via from_json/get_json_object
    "inet": T.StringType(),
    "bytea": T.BinaryType(),
}


#: Derby DDL base type → Spark type NAME (simpleString). The Derby
#: dialect twin of PG_TO_SPARK, sized for the types Spark's JDBC writer
#: actually creates on Derby (long→BIGINT, string→CLOB, etc.) plus the
#: common hand-DDL'd ones. Values are names (not DataType objects) so
#: the mapping can run IN-PLAN as a literal map lookup.
DERBY_TO_SPARK_NAME: dict[str, str] = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "DOUBLE": "double",
    "REAL": "float",
    "DECIMAL": "decimal(38,18)",
    "BOOLEAN": "boolean",
    "CLOB": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BLOB": "binary",
    # Derby renders binary as "VARCHAR (n) FOR BIT DATA"; the lookup
    # key is the whitespace-collapsed form the size-strip produces
    "VARCHAR FOR BIT DATA": "binary",
    "CHAR FOR BIT DATA": "binary",
    "LONG VARCHAR FOR BIT DATA": "binary",
}


def spark_type_from_derby(data_type_col: "F.Column") -> "F.Column":
    """Map a Derby catalog type string ("CLOB(2147483647)",
    "BIGINT NOT NULL", ...) to the Spark type name, as an IN-PLAN
    expression: strip the size suffix and nullability, then a literal
    ``create_map`` lookup (unknown types degrade to 'string', the
    schema_from_pg rule). Used by the k16 driver row on the S5 Derby
    catalog scan."""
    # collapse whitespace after the size-strip: "VARCHAR (n) FOR BIT
    # DATA" must key as "VARCHAR FOR BIT DATA", not "VARCHAR  FOR BIT
    # DATA" (double space — an unreachable map entry otherwise)
    base = F.trim(
        F.regexp_replace(
            F.regexp_replace(data_type_col, r"\(.*\)| NOT NULL", ""),
            r"\s+",
            " ",
        )
    )
    m = F.create_map(
        *[F.lit(x) for kv in DERBY_TO_SPARK_NAME.items() for x in kv]
    )
    return F.coalesce(F.element_at(m, base), F.lit("string"))


def timestamp_columns(df: DataFrame, suffix: str = "_at", substring: bool = False) -> list[str]:
    """Columns designated for timestamp coercion by naming convention."""
    if substring:
        return [c for c in df.columns if suffix in c]
    return [c for c in df.columns if c.endswith(suffix)]


def coerce_timestamp(col: Column) -> Column:
    """NULL-on-failure timestamp coercion (pandas ``errors="coerce"`` parity).

    ``try_to_timestamp``, not ``to_timestamp``: under Spark 4's default
    ANSI mode the latter *throws* on malformed input, while the
    reference's ``pd.to_datetime(errors="coerce")`` yields NULL.
    """
    return F.try_to_timestamp(col)


def normalize_timestamps(df: DataFrame, suffix: str = "_at", substring: bool = False) -> DataFrame:
    """Coerce ``*_at`` columns to timestamps, NULL on unparseable values.

    Spark-native restatement of ``BaseWriter.convert_column_types``
    (`/root/reference/pyopenetl/operations.py:120-128`). A single
    projection — no shuffle, fully codegen'd.
    """
    targets = set(timestamp_columns(df, suffix, substring))
    if not targets:
        return df
    return df.select(
        *[
            coerce_timestamp(F.col(c)).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )


def schema_from_pg(columns: dict[str, str]) -> T.StructType:
    """Build a Spark schema from ``{column: postgres_type_name}``.

    Engine-side analogue of ``get_postgres_table_schema``'s type dict
    (`/root/reference/pyopenetl/operations.py:233-287`). Unknown type
    names fall back to StringType (the reference raises KeyError; we
    degrade since Spark can always carry text).
    """
    return T.StructType(
        [T.StructField(name, PG_TO_SPARK.get(pg, T.StringType()), True) for name, pg in columns.items()]
    )


def apply_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast matching columns of ``df`` to the authoritative schema's types."""
    by_name = {f.name: f.dataType for f in schema.fields}
    return df.select(
        *[
            F.col(c).cast(by_name[c]).alias(c) if c in by_name else F.col(c)
            for c in df.columns
        ]
    )
