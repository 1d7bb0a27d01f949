"""Streaming deduplication.

Two state-bounding strategies over the same key-based semantics:

- :func:`stream_dedup` — ``dropDuplicates`` on the key columns with a
  watermark: exact first-arrival-wins for keys whose duplicates arrive
  within the watermark horizon; state evicts below the watermark.
- :func:`stream_dedup_within_watermark` —
  ``dropDuplicatesWithinWatermark``: relaxes the guarantee to
  "duplicates within the watermark delay of each other", which is what
  production dedup at 100 TB actually wants (bounded state, no
  unbounded key registry).

Batch equivalence (first arrival per key) is what
workload/streaming_batch.s04 oracle-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    return df.withWatermark(ts_col, delay).dropDuplicates(list(keys))


def stream_dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
