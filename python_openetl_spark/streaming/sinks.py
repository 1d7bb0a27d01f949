"""Streaming sinks: foreachBatch MERGE-upsert into a ParquetTable.

The streaming generalization of the reference's update pipeline
(`/root/reference/pyopenetl/operations.py:515-609`): every micro-batch
is a delta, merged with the same join-based MERGE used in batch
(operators/merge.py). Exactly-once: foreachBatch can replay a batch
after a failure, so the sink records the last applied ``batch_id`` next
to the table and skips replays — idempotent MERGE by construction
(SURVEY §7 M3 hard part).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from python_openetl_spark.operators.merge import merge_upsert
from python_openetl_spark.plans.pipelines import ParquetTable


class UpsertSink:
    """``writeStream.foreachBatch(UpsertSink(table, pk, order_col))``."""

    def __init__(self, table: ParquetTable, pk: str, order_col: str | None = None):
        self.table = table
        self.pk = pk
        self.order_col = order_col

    @property
    def _marker_path(self) -> str:
        return self.table.path + ".last_batch"

    def _last_batch(self) -> int:
        try:
            with open(self._marker_path) as f:
                return json.load(f)["batch_id"]
        except (OSError, ValueError, KeyError):
            return -1

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_batch():
            return  # replayed micro-batch → already merged, skip
        spark = batch_df.sparkSession
        if self.table.exists():
            target = self.table.read(spark)
            merged = merge_upsert(target, batch_df, self.pk, order_col=self.order_col)
        else:
            merged = batch_df
        self.table.overwrite(merged)
        tmp = self._marker_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, self._marker_path)
