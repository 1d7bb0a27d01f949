"""Streaming operators, oracle-checked through their batch equivalents
(SURVEY §2.3 "streaming", §5 test strategy #4).

Spark's ``window``/``session_window`` run identically on batch and
stream, so the driver can hash-check the *semantics* against DuckDB
SQL (tumbling = date_trunc, sliding = unnest of shifted starts,
sessions = gaps-and-islands); the genuinely-streaming behaviors
(watermarks, state, foreachBatch exactly-once) are covered by
tests/test_streaming.py with real micro-batch replays.

Window starts are emitted as epoch seconds via integer floor division
(both engines) — immune to float/rounding differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_openetl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from python_openetl_spark.workload.util import t


def s01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_agg(t(spark, sf_dir, "events"), size="1 hour", keys=("event_type",))


def s02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_agg(t(spark, sf_dir, "events"), size="2 hours", slide="1 hour")


def s03_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(t(spark, sf_dir, "events"), gap="30 minutes", keys=("user_id",))


def s04_first_arrival_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of streaming dedup (first arrival per key wins)
    over a stream with planted late duplicates."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "value")
    dups = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    stream = ev.unionByName(dups)
    w = Window.partitionBy("event_id").orderBy("ts")
    return (
        stream.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.unix_micros("ts").alias("ts_epoch_us"), "value")
    )


QUERIES = {
    "s01_tumbling_window": s01_tumbling_window,
    "s02_sliding_window": s02_sliding_window,
    "s03_session_window": s03_session_window,
    "s04_first_arrival_dedup": s04_first_arrival_dedup,
}

ORACLE = {
    "s01_tumbling_window": """
        SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    "s02_sliding_window": """
        WITH starts AS (
          SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w_start,
                 value
          FROM events
        )
        SELECT epoch_us(w_start) // 1000000 AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value
        FROM starts
        GROUP BY 1
    """,
    "s03_session_window": """
        WITH ordered AS (
          -- strict >: Spark's session_window treats an event at EXACTLY
          -- last_ts + gap as part of the same session (the session's
          -- [start, last+gap] range touches it) — hostile-star finding
          SELECT user_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTES
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        islands AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM ordered
        )
        SELECT epoch_us(MIN(ts)) // 1000000 AS session_start,
               user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value
        FROM islands
        GROUP BY user_id, session_id
    """,
    "s04_first_arrival_dedup": """
        WITH stream AS (
          SELECT event_id, ts, value FROM events
          UNION ALL
          SELECT event_id, ts + INTERVAL 10 MINUTES, value + 1000.0 FROM events
        )
        SELECT event_id, epoch_us(ts) AS ts_epoch_us, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) AS rn
          FROM stream
        ) WHERE rn = 1
    """,
}
