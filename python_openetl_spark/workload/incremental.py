"""Incremental-maintenance operators as oracle-checkable queries
(SURVEY §2.1 R8/R9/R10/K6, §2.3 "incremental maintenance").

Each query builds a deterministic target/delta pair from the fixture
tables, applies the engine operator (operators.merge), and returns the
result; the oracle states the same semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.operators.merge import (
    conflicting_keys,
    dedupe_latest,
    merge_upsert,
    propagate_deletes,
    temporal_delta,
)
from python_openetl_spark.workload.util import t

# Orders before the cutoff form the "target" snapshot; orders in the
# overlap window re-arrive as a delta with a changed totalprice
# (simulated update) plus genuinely new orders after the cutoff.
_CUTOFF = "2000-01-01"
_OVERLAP = "1999-01-01"


def _target(spark, sf_dir) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp_ntz")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _delta(spark, sf_dir) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit(_OVERLAP).cast("timestamp_ntz")).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )


def m01_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics (R8): matched rows take the delta's values
    (doubled price), unmatched survive, new rows insert."""
    return merge_upsert(_target(spark, sf_dir), _delta(spark, sf_dir), pk="o_orderkey")


def m02_delta_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-pk delta resolution: keep the latest version per pk
    (the ON-CONFLICT statement-order hazard, SURVEY §7)."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "value")
    v2 = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    dup_delta = ev.unionByName(v2)
    out = dedupe_latest(dup_delta, "event_id", "ts")
    # epoch micros instead of a raw timestamp → engine/pandas-bridge-proof
    return out.select("event_id", F.unix_micros("ts").alias("ts_epoch_us"), "value")


def m03_propagate_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete propagation (R9/R10): ids present in dest but gone from
    source — distributed anti-join instead of client-side sets."""
    dest = t(spark, sf_dir, "customer")
    source = dest.filter(F.col("c_acctbal") > 0)
    _kept, deleted = propagate_deletes(dest, source, "c_custkey")
    return deleted


def m04_safe_append_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conflict detection for safe_append (K6): incoming pks already in
    the target (left-semi join)."""
    target = _target(spark, sf_dir)
    incoming = _delta(spark, sf_dir)
    return conflicting_keys(target, incoming, "o_orderkey")


def m05_temporal_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 delta read via the operator itself (pushed-down range scan)."""
    ev = t(spark, sf_dir, "events")
    return temporal_delta(ev, "ts", "2024-01-15 00:00:00", 72).select(
        "event_id", "user_id", "value"
    )


QUERIES = {
    "m01_merge_upsert": m01_merge_upsert,
    "m02_delta_dedup_latest": m02_delta_dedup_latest,
    "m03_propagate_deletes": m03_propagate_deletes,
    "m04_safe_append_conflicts": m04_safe_append_conflicts,
    "m05_temporal_delta": m05_temporal_delta,
}

_TARGET_SQL = f"""
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
"""
_DELTA_SQL = f"""
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_OVERLAP}'
"""

ORACLE = {
    "m01_merge_upsert": f"""
        WITH target AS ({_TARGET_SQL}), delta AS ({_DELTA_SQL})
        SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
        UNION ALL
        SELECT * FROM delta
    """,
    "m02_delta_dedup_latest": """
        WITH dup_delta AS (
          SELECT event_id, ts, value FROM events
          UNION ALL
          SELECT event_id, ts + INTERVAL 1 HOUR AS ts, value + 1000.0 AS value FROM events
        )
        SELECT event_id, epoch_us(ts) AS ts_epoch_us, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts DESC) rn
          FROM dup_delta
        ) WHERE rn = 1
    """,
    "m03_propagate_deletes": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    """,
    "m04_safe_append_conflicts": f"""
        WITH target AS ({_TARGET_SQL}), delta AS ({_DELTA_SQL})
        SELECT DISTINCT o_orderkey FROM delta
        WHERE o_orderkey IN (SELECT o_orderkey FROM target)
    """,
    "m05_temporal_delta": """
        SELECT event_id, user_id, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 72 HOURS
    """,
}
