"""Event-time window aggregations (tumbling / sliding / session).

These builders return DataFrame transformations that work identically
on a *batch* DataFrame and a *streaming* DataFrame — Spark's
``window()`` / ``session_window()`` are engine-level, so the same
function is used by the oracle-checked batch queries
(workload/streaming_batch.py) and the Structured Streaming tests. On a
stream, pair them with ``with_watermark`` to bound state and define
late-data drop.

The reference has no streaming; its closest primitives are chunked
batch iteration and the hour-window incremental read
(`/root/reference/pyopenetl/operations.py:439,539-540`) — these
generalize both (SURVEY §2.3 "streaming").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 hour") -> DataFrame:
    """Late-data policy: events older than max(event_time) - delay are
    dropped and window state below the watermark is evicted."""
    return df.withWatermark(ts_col, delay)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Fixed, non-overlapping event-time buckets. Output uses epoch
    seconds for the window start (engine-portable)."""
    return (
        df.groupBy(F.window(ts_col, size).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(24,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "2 hours",
    slide: str = "1 hour",
    keys: tuple[str, ...] = (),
    value_col: str = "value",
) -> DataFrame:
    """Overlapping windows: each event lands in size/slide windows."""
    return (
        df.groupBy(F.window(ts_col, size, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(24,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Dynamic-size sessions: a session extends while consecutive events
    arrive within ``gap``; an event at exactly start+gap begins a new
    session (Spark's half-open session window)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(24,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def chained_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    size: str = "1 hour",
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Two CHAINED stateful aggregations in one query: per-(window, key)
    counts, then a per-window distribution over those counts — the
    multiple-stateful-operators pipeline Structured Streaming supports
    since Spark 3.4 (the first agg's ``window`` column feeds the second
    ``groupBy(window)`` directly, so the engine threads event-time
    watermarks through both stages; on batch input the same plan is two
    ordinary hash aggregations).

    Why this shape matters at scale: the first aggregation is keyed by
    (window x user) — high cardinality, map-side partial; the second
    collapses to one row per window. Computing the distribution in one
    pass over raw events would need count-distinct-style state per
    window; chaining keeps each stage's state proportional to its own
    key space.
    """
    per_key = df.groupBy(F.window(ts_col, size).alias("w"), key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(24,2)")).alias("key_value"),
    )
    return (
        per_key.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_active_keys"),
            F.max("n_events").alias("max_events_per_key"),
            F.sum("key_value").cast("double").alias("total_value"),
            (F.sum("n_events") / F.count(F.lit(1))).alias("avg_events_per_key"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_active_keys",
            "max_events_per_key",
            "total_value",
            "avg_events_per_key",
        )
    )
