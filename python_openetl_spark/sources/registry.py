"""Pluggable source registry: one ``read(spark, spec)`` entry point.

A source spec is ``{"format": ..., **options}``; formats registered
here cover the reference's complete source surface (SURVEY §2.1
S1-S8) plus the engine's native parquet tables. BigQuery (S7,
`/root/reference/pyopenetl/connections.py:177-212`) requires the
spark-bigquery-connector jar, which is not shipped in this
environment — the handler is registered but import-gated, raising a
clear error with the production config (parity with how the reference
gates on google-cloud deps).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark.sources import files, jdbc


class SourceError(Exception):
    pass


def _read_parquet(spark: SparkSession, spec: dict) -> DataFrame:
    return files.read_parquet(spark, spec["path"])


def _read_csv(spark: SparkSession, spec: dict) -> DataFrame:
    path = files.fetch_to_local(spec["path"]) if spec.get("remote") else spec["path"]
    return files.read_csv(spark, path, header=spec.get("header", True), infer=spec.get("infer", True))


def _read_json(spark: SparkSession, spec: dict) -> DataFrame:
    return files.read_json(spark, spec["path"], schema=spec.get("schema"))


def _read_jdbc(spark: SparkSession, spec: dict) -> DataFrame:
    source = jdbc.JdbcSource(
        url=spec["url"],
        user=spec.get("user"),
        password=spec.get("password"),
        driver=spec.get("driver", "org.postgresql.Driver"),
    )
    if "query" in spec:
        return jdbc.read_query(spark, source, spec["query"])
    return jdbc.read_table(
        spark,
        source,
        spec["table"],
        partition_column=spec.get("partition_column"),
        lower_bound=spec.get("lower_bound"),
        upper_bound=spec.get("upper_bound"),
        num_partitions=spec.get("num_partitions", jdbc.DEFAULT_NUM_PARTITIONS),
    )


def _read_orc(spark: SparkSession, spec: dict) -> DataFrame:
    return spark.read.orc(spec["path"])


def _is_missing_datasource_error(e: Exception) -> bool:
    """True iff the exception is the missing-classpath signature — the
    ONLY case the format handlers may relabel with a jar hint. Spark
    surfaces an absent data source as DATA_SOURCE_NOT_FOUND /
    ClassNotFoundException / 'Failed to find data source'."""
    msg = str(e)
    return any(
        sig in msg
        for sig in (
            "DATA_SOURCE_NOT_FOUND",
            "Failed to find data source",
            "Failed to find the data source",
            "ClassNotFoundException",
        )
    )


def _read_avro(spark: SparkSession, spec: dict) -> DataFrame:
    try:
        return spark.read.format("avro").load(spec["path"])
    except Exception as e:
        # relabel ONLY the missing-module signature; a path/schema/auth
        # error must surface as itself, not as a classpath hint
        # (r10 review: the bare wrap sent operators down the wrong hole)
        if _is_missing_datasource_error(e):
            raise SourceError(
                "Avro source requires the spark-avro module "
                "(spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark version>); "
                f"underlying error: {e}"
            ) from e
        raise


#: Production classpath for the BigQuery handler (Spark 4 = Scala 2.13):
#: ``spark.jars.packages=com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.42.1``
BIGQUERY_JAR_COORDINATE = (
    "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.42.1"
)


def bigquery_reader_plan(spec: dict) -> tuple[dict, str | None]:
    """The exact ``(options, load_path)`` the gated handler submits to
    ``spark.read.format("bigquery")`` — pure, so tests can pin the
    submitted option dict without the connector jar present."""
    options: dict = {}
    load_path = None
    for k, v in spec.items():
        if k == "format":
            continue
        if k == "table":
            load_path = v
            continue
        options[k] = v if isinstance(v, str) else str(v)
    return options, load_path


def _read_bigquery(spark: SparkSession, spec: dict) -> DataFrame:
    """Executes the option-complete spec built by
    ``sources.connections.bigquery_spec`` (parentProject, table|query,
    materializationDataset, viewsEnabled, credentials[File]) — every
    spec key except ``format`` passes through as a connector option."""
    options, load_path = bigquery_reader_plan(spec)
    reader = spark.read.format("bigquery").options(**options)
    try:
        return reader.load(load_path) if load_path else reader.load()
    except Exception as e:
        if _is_missing_datasource_error(e):  # jar absent (this sandbox)
            raise SourceError(
                "BigQuery source requires the spark-bigquery-connector jar "
                f"(spark.jars.packages={BIGQUERY_JAR_COORDINATE}); "
                f"underlying error: {e}"
            ) from e
        raise  # auth/table/permission errors surface as themselves


READERS: dict[str, Callable[[SparkSession, dict], DataFrame]] = {
    "parquet": _read_parquet,
    "csv": _read_csv,
    "json": _read_json,
    "orc": _read_orc,
    "avro": _read_avro,
    "jdbc": _read_jdbc,
    "bigquery": _read_bigquery,
}


def read(spark: SparkSession, spec: dict) -> DataFrame:
    fmt = spec.get("format")
    if fmt not in READERS:
        raise SourceError(f"unknown source format {fmt!r}; known: {sorted(READERS)}")
    return READERS[fmt](spark, spec)
