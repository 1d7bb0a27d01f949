"""Stateful streaming v2: ``transformWithStateInPandas`` operators.

The Spark 4 successor to ``applyInPandasWithState`` (streaming/
stateful.py keeps the v1 shape): typed state handles (value/list/map)
instead of one opaque tuple, per-key timers instead of a global
timeout mode, and optional TTL per state item. Requires the RocksDB
state-store provider (``transform_with_state_confs``) — which is also
the provider a production 100 TB deployment runs, so the test config
matches the scale config.

Scale properties are the same as v1: one shuffle on the grouping key
per micro-batch, state size O(distinct keys). TTL moves eviction into
the state store itself (per-item timestamps) rather than kernel code.

Activation: the state-server protocol needs the ``protobuf`` runtime
(``pip install protobuf>=4.25``) — pyspark ships only the generated
``StateMessage_pb2`` stubs, which import ``google.protobuf`` at
call time. ``transform_with_state_available()`` detects it; the
protocol round-trip test auto-unskips once installed. The kernel
logic itself is protocol-independent and unit-tested against a fake
state handle (tests/test_streaming.py), so only the wire protocol is
environment-gated, not the operator.

IMPOSSIBILITY NOTE (this container, verified 2026-08): executing the
operator here is not possible by any sanctioned means —
``google.protobuf`` has no wheel or source distribution anywhere on
the system (a full filesystem search finds only jedi/typeshed TYPE
STUBS, which carry no runtime), package installation is unavailable
offline, and pyspark 4.1's worker imports ``google.protobuf`` from
inside its generated ``StateMessage_pb2`` on the first
transformWithState call — there is no protocol-free execution path to
gate on. Vendoring the protobuf runtime (~50k LoC) into this engine
was considered and rejected. The environment consistency is itself
tested (tests/test_streaming.py
``test_transform_with_state_gate_consistent``): if a protobuf runtime
ever appears, the gate flips and the real replay test runs.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

#: Session confs transformWithState needs (RocksDB state store).
TRANSFORM_WITH_STATE_CONFS = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def transform_with_state_available() -> bool:
    """transformWithState's state-server protocol needs the
    ``google.protobuf`` package (pyspark ships only the generated
    stubs). Environment-gated like the multimodal codecs: the operator
    is fully wired, and activates wherever protobuf is installed."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n_events long, total_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) — the v2 twin of
    streaming/stateful.py's kernel, with state in a typed ValueState."""

    def __init__(self, value_col: str = "value", ttl_ms: int | None = None):
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf[self._value_col].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuously-maintained per-key (count, sum), emitted every
    micro-batch the key appears in. ``ttl_ms`` evicts idle keys' state
    store-side (production hygiene at unbounded key cardinality)."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(value_col, ttl_ms),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
