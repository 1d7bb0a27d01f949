"""Incremental aggregate maintenance: merge delta partials into a rollup.

The pattern that makes 100 TB aggregation tractable: maintain a
materialized rollup table of decomposable aggregates (count/sum/min/max
— and avg as sum÷count) and fold each incoming delta's *partial*
aggregates into it, instead of re-scanning history. Merging is just
re-aggregation of the union of partial states:

    merged = (rollup ∪ partial_aggs(delta)).groupBy(keys).agg(combine)

so the plan is one map-side-combined shuffle on the group keys, the
same shape Spark uses internally for any aggregate — no join, no
full-history scan. Sums over floating data should be pre-cast to
DECIMAL by the caller for order-independent exactness (see
workload/util.dsum); count/min/max are trivially order-independent.

Generalizes the reference's incremental window (its delta read at
/root/reference/pyopenetl/operations.py:539-541 feeds a row-level
upsert; here the same delta feeds aggregate-level maintenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (delta aggregator, partial combiner)
_AGGS = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _out_name(col: str, how: str) -> str:
    return f"{how}_{col}"


def partial_aggs(
    rows: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Aggregate raw rows into partial states: one output column per
    (column, aggregate) pair in ``spec`` ({col: ["sum", "max", ...]}),
    named ``{agg}_{col}``."""
    aggs = [
        _AGGS[how][0](c).alias(_out_name(c, how))
        for c, hows in spec.items()
        for how in hows
    ]
    return rows.groupBy(*keys).agg(*aggs)


def merge_partial_aggs(
    rollup: DataFrame, delta_rollup: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Fold a delta's partial aggregates into the maintained rollup.
    Both inputs carry the ``partial_aggs`` schema; groups present on only
    one side pass through via the union (no outer-join null handling)."""
    combiners = [
        _AGGS[how][1](_out_name(c, how)).alias(_out_name(c, how))
        for c, hows in spec.items()
        for how in hows
    ]
    return (
        rollup.unionByName(delta_rollup.select(*rollup.columns))
        .groupBy(*keys)
        .agg(*combiners)
    )


def incremental_rollup(
    rollup: DataFrame, delta_rows: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Maintain ``rollup`` with raw delta rows: partial-agg the delta,
    then merge. Equivalent to recomputing over history ∪ delta (asserted
    differentially in tests) at the cost of the delta alone."""
    return merge_partial_aggs(rollup, partial_aggs(delta_rows, keys, spec), keys, spec)
