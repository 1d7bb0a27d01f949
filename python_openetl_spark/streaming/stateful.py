"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the engine's escape hatch for streaming semantics the built-in
window/dedup operators can't express: arbitrary per-key state machines
(running aggregates, custom sessionization, anomaly trackers) with
explicit state schema and timeout-based eviction.

Scale properties: state lives in the state store partitioned by key
(one shuffle on the grouping key per micro-batch); each key's state is
a fixed-width tuple, so state size is O(distinct keys), independent of
event volume. At 100 TB/day the knobs that matter are the state-store
provider (RocksDB in production) and a timeout (``GroupStateTimeout``)
so idle keys evict instead of accumulating forever.

The reference has no streaming at all (SURVEY §2.2); this extends its
incremental-maintenance story (upsert-by-window,
`/root/reference/pyopenetl/operations.py:515-609`) to continuous
per-key running state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double, last_ts timestamp"
RUNNING_TOTALS_STATE = "n_events long, total_value double, last_ts_us long"


def running_user_totals(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Per-key running (count, sum, last event time), emitted every
    micro-batch the key appears in — a continuously-maintained
    aggregate the downstream can upsert into a serving table.

    Pass ``timeout=GroupStateTimeout.ProcessingTimeTimeout`` (and call
    ``state.setTimeoutDuration`` in a fork of the kernel) to evict idle
    keys in production.
    """

    def kernel(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_us = state.get
        else:
            n, total, last_us = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf[ts_col].astype("int64").max() // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        stream.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            kernel,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
