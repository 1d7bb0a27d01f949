"""The engine's declared query workload.

Each submodule exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB-ANSI SQL over the fixture views).
``__spark_entry__`` aggregates them for the driver's correctness gate;
``tests/`` run the same pairs differentially.

Design rule: every aggregate that sums floating-point data is cast to
DECIMAL *before* SUM on both engines (exact, order-independent — the sum
is reproducible no matter how Spark partitions it) and cast back to
DOUBLE after. Averages are computed as decimal-sum / count. Verified
bit-exact against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark.workload import (
    incremental,
    incremental2,
    llm,
    llm2,
    llm3,
    relational,
    scale,
    streaming2,
    streaming_batch,
    udf_surface,
)

# Order is load-bearing: the driver's correctness gate checks the FIRST 50
# entries of the aggregated dict in insertion order. Round 1 spent all 50
# slots on `relational` (q00–q49), leaving the incremental/LLM/streaming/UDF
# families driver-unverified; round 2 rotates them to the front. `relational`
# itself front-loads its round-1 reds (see relational.QUERIES), and the new
# round-2 prep queries (llm2) sit last so they don't displace anything —
# they rotate into the window next round.
_MODULES = (
    incremental,
    llm,
    streaming_batch,
    udf_surface,
    relational,
    llm2,
    incremental2,
    streaming2,
    scale,
    llm3,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
