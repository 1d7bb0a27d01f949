"""Environment capability report for the engine's gated features.

Several tiers activate only when their runtime dependency exists —
the BigQuery connector jar (S7), a protobuf runtime for
``transformWithStateInPandas``, real image/audio codecs for the
multimodal decode seam, the Cloud SQL / Secret Manager credential
provider, JDBC drivers. Each tier already degrades with a clear
gated error at call time; :func:`doctor` turns those gates into one
user-visible report so "would this work HERE?" is answerable without
triggering each failure. The gate consistency is pinned by
tests/test_doctor.py: every row's ``available`` flag must agree with
the corresponding operator's own skip/raise behavior.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Capability:
    name: str
    available: bool
    detail: str  # what activates it, or what its absence blocks


def _has_module(mod: str) -> bool:
    try:
        importlib.import_module(mod)
        return True
    except Exception:
        return False


def _has_jvm_class(spark: SparkSession | None, cls: str) -> bool | None:
    """None = undetermined (no live session to ask).

    Probes through Spark's own ``Utils.classForName`` (context/Spark
    classloader), NOT ``java.lang.Class.forName`` via py4j: the latter
    resolves against py4j's classloader and cannot see jars added with
    ``spark.jars.packages``/``--jars`` (MutableURLClassLoader) — it
    would report connectors unavailable in exactly the environments
    where they work."""
    if spark is None:
        return None
    try:
        spark.sparkContext._jvm.org.apache.spark.util.Utils.classForName(
            cls, False, False
        )
        return True
    except Exception:
        return False


def doctor(spark: SparkSession | None = None) -> list[Capability]:
    """Report which environment-gated features would activate here.

    Pass a live session to also probe the JVM classpath (connector
    jars, JDBC drivers); without one those rows report
    ``available=False`` with an 'undetermined' note.
    """
    from python_openetl_spark.streaming.stateful_v2 import (
        transform_with_state_available,
    )

    rows: list[Capability] = []

    def jvm_row(name: str, cls: str, detail: str) -> None:
        got = _has_jvm_class(spark, cls)
        rows.append(
            Capability(
                name,
                bool(got),
                detail if got is not None else detail + " (undetermined: no session)",
            )
        )

    jvm_row(
        "bigquery_connector",
        "com.google.cloud.spark.bigquery.BigQueryRelationProvider",
        "S7 BigQuery source; activate with spark.jars.packages="
        "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.42.1",
    )
    jvm_row(
        "jdbc_postgres_driver",
        "org.postgresql.Driver",
        "Postgres JDBC scans/writes (S1/S2/K1); add the postgresql JDBC jar",
    )
    jvm_row(
        "jdbc_derby_embedded",
        "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        "In-process JDBC endpoint (bundled with Spark; used by the live "
        "integration tests)",
    )
    jvm_row(
        "avro_format",
        "org.apache.spark.sql.avro.AvroFileFormat",
        "Avro reads/writes (k15 roundtrip). This distribution bundles "
        "the classes without registering the 'avro' short name, so use "
        "format('org.apache.spark.sql.avro.AvroFileFormat'); elsewhere "
        "activate with spark.jars.packages=org.apache.spark:spark-avro",
    )
    from python_openetl_spark.plans.delta_sink import (
        DELTA_PACKAGE_COORDINATE,
        delta_available,
    )

    rows.append(
        Capability(
            "delta_lake_sink",
            delta_available(spark),
            "transactional MERGE INTO / delete propagation for "
            "upsert_sync(table_format='delta') (plans/delta_sink.py); "
            "activate with pip install delta-spark + spark.jars.packages="
            f"{DELTA_PACKAGE_COORDINATE} + the Delta session extensions",
        )
    )
    rows.append(
        Capability(
            "transform_with_state",
            transform_with_state_available(),
            "streaming.stateful_v2 transformWithStateInPandas kernel; "
            "activates when a protobuf runtime is importable",
        )
    )
    rows.append(
        Capability(
            "image_codecs",
            _has_module("PIL"),
            "real image decode for operators.multimodal (install pillow, "
            "then pass decoder=); the deterministic fake decoder always works",
        )
    )
    rows.append(
        Capability(
            "audio_codecs",
            _has_module("soundfile") or _has_module("av"),
            "real audio/video decode for operators.multimodal (install "
            "soundfile or av, then pass decoder=)",
        )
    )
    rows.append(
        Capability(
            "gcp_secret_manager",
            _has_module("google.cloud.secretmanager"),
            "SecretManagerCredentialProvider resolution for "
            "sources.connections (install google-cloud-secret-manager)",
        )
    )
    return rows
